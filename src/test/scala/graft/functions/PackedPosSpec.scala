package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalatest.funsuite.AnyFunSuite

/** The delta-varint flag-position codec behind dupSpans' grouped path:
  * encode-per-group + k-way-merge runStats must equal the flat
  * sort-and-fold over the union, for arbitrary position sets and any
  * group partition — the value-identity that lets the grouped path
  * checkpoint ~1 byte/position instead of 4. */
class PackedPosSpec extends AnyFunSuite {

  private def flatStats(all: Seq[Int]): (Long, Long) = {
    val s = all.sorted
    var prev = -2; var run = 0L; var best = 0L
    s.foreach { x =>
      run = if (x == prev + 1) run + 1 else 1L
      best = math.max(best, run)
      prev = x
    }
    (best, s.size.toLong)
  }

  private def stats(groups: Seq[Seq[Int]]): (Long, Long) = {
    val packs = groups.map(g => PackedPos.encode(ArrayData.toArrayData(g.toArray)))
    PackedPos.runStats(ArrayData.toArrayData(packs.toArray))
  }

  test("grouped encode + merged runStats == flat sort-and-fold (pseudo-random sets, all group counts)") {
    // deterministic pseudo-random position sets: no RNG, replayable
    def posSet(seed: Int, n: Int, span: Int): Seq[Int] =
      (0 until span).filter(p => ((p * 2654435761L + seed * 40503L) % span) < n).distinct
    for (seed <- 1 to 8; g <- Seq(1, 2, 3, 7, 64)) {
      val all = posSet(seed, n = 40 + seed * 13, span = 200 + seed * 37)
      val groups = (0 until g).map(i => all.filter(p => math.floorMod(p * 31 + 7, g) == i))
      assert(groups.flatten.sorted == all.sorted) // the partition covers
      assert(stats(groups) == flatStats(all), s"seed=$seed g=$g")
    }
  }

  test("dense runs (the dupSpans shape) pack near 1 byte/position; codec round-trips exactly") {
    val run = (1000 until 2000) ++ (5000 until 5500) // two dense spans
    val packed = PackedPos.encode(ArrayData.toArrayData(run.toArray))
    // first values cost 2 varint bytes, gaps of 1 cost 1 — well under 4N
    assert(packed.length < run.size + 8, s"${packed.length} bytes for ${run.size} positions")
    assert(stats(Seq(run)) == flatStats(run))
    assert(stats(Seq(run)) == (1000L, 1500L))
  }

  test("edge cases: empty streams, single positions, unsorted input, large positions") {
    assert(stats(Seq(Seq.empty, Seq.empty)) == (0L, 0L))
    assert(stats(Seq(Seq(7))) == (1L, 1L))
    assert(stats(Seq(Seq(5, 3, 4), Seq.empty)) == (3L, 3L)) // encode sorts
    // multi-byte varints: positions past 2^21
    val big = Seq(0, 1, 3000000, 3000001, 3000002)
    assert(stats(Seq(big.take(2), big.drop(2))) == (3L, 5L))
    assert(flatStats(big) == (3L, 5L))
  }

  test("pairwise merge fold == k-way runStats == flat fold (the G-independent retained-artifact lever)") {
    // the sf2000 lever: finished groups fold pairwise via
    // PackedPos.merge into ONE running stream; runStats over the folded
    // stream must equal both the k-way merge over all group streams and
    // the flat sort-and-fold — for every seed, group count and fold order
    def posSet(seed: Int, n: Int, span: Int): Seq[Int] =
      (0 until span).filter(p => ((p * 2654435761L + seed * 40503L) % span) < n).distinct
    for (seed <- 1 to 8; g <- Seq(1, 2, 3, 7, 64)) {
      val all = posSet(seed, n = 40 + seed * 13, span = 200 + seed * 37)
      val groups = (0 until g).map(i => all.filter(p => math.floorMod(p * 31 + 7, g) == i))
      val packs = groups.map(gr => PackedPos.encode(ArrayData.toArrayData(gr.toArray)))
      val foldedLtR = packs.reduce(PackedPos.merge)
      val foldedRtL = packs.reverse.reduce(PackedPos.merge)
      // merged size never exceeds the sum (deltas only shrink on interleave)
      assert(foldedLtR.length <= packs.map(_.length).sum, s"seed=$seed g=$g")
      val viaFold = PackedPos.runStats(ArrayData.toArrayData(Array(foldedLtR)))
      assert(viaFold == flatStats(all), s"seed=$seed g=$g")
      assert(viaFold == stats(groups), s"seed=$seed g=$g (k-way twin)")
      // associative op: fold order is irrelevant
      assert(java.util.Arrays.equals(foldedLtR, foldedRtL), s"seed=$seed g=$g order")
    }
  }

  test("merge edge cases: empty sides, idempotence on equal heads, multi-byte varint interleave") {
    def enc(s: Seq[Int]) = PackedPos.encode(ArrayData.toArrayData(s.toArray))
    val x = enc(Seq(3, 4, 5))
    assert(PackedPos.merge(Array.emptyByteArray, x) sameElements x)
    assert(PackedPos.merge(x, Array.emptyByteArray) sameElements x)
    // defensive idempotence: merging a stream with itself dedups
    assert(PackedPos.runStats(ArrayData.toArrayData(
      Array(PackedPos.merge(x, x)))) == (3L, 3L))
    // interleave across a multi-byte-varint gap
    val m = PackedPos.merge(enc(Seq(0, 3000000)), enc(Seq(1500000, 3000001)))
    assert(PackedPos.runStats(ArrayData.toArrayData(Array(m))) == (2L, 4L))
  }

  test("runs SPANNING groups merge correctly (the no-global-window guarantee)") {
    // consecutive positions alternating between two groups — the case
    // the single-pass window handles trivially and the grouped path
    // must reconstruct via the merge
    val a = Seq(10, 12, 14, 16)
    val b = Seq(11, 13, 15)
    assert(stats(Seq(a, b)) == (7L, 7L))
  }
}
