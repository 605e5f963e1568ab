package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Semantics tests for the dedup operators over crafted documents with
  * known exact answers. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  // d1 ≡ d2 exactly; d3 shares 3 of d1's shingles; d4 disjoint.
  private lazy val docs: DataFrame = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, "the quick brown fox runs over the lazy dog"),
    (4L, "completely different words in this sentence here")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min doc_id") {
    val g = Dedup.exact(docs).collect()
    assert(g.length == 3)
    val dup = g.find(_.getAs[Long]("n_copies") == 2).get
    assert(dup.getAs[Long]("keep_doc_id") == 1L)
  }

  test("jaccard pairs: exact set similarity with threshold") {
    // 9-token docs → 7 distinct 3-gram shingles each.
    // d1 vs d2: identical → J = 1. d1 vs d3: differ in token 5 ("jumps"/
    // "runs") → 3 shingles containing position 5 differ on each side:
    // |A∩B| = 4, |A∪B| = 10 → J = 0.4.
    val strict = Dedup.jaccardPairs(docs, n = 3, threshold = 0.5).collect()
    assert(strict.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(strict.head.getAs[Double]("jaccard") == 1.0)
    val loose = Dedup.jaccardPairs(docs, n = 3, threshold = 0.35).collect()
    assert(loose.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(loose.find(r => r.getLong(0) == 1L && r.getLong(1) == 3L)
      .get.getAs[Double]("jaccard") == 0.4)
  }

  test("jaccard maxDocFreq cap drops only pairs connected through hot shingles") {
    // "the quick brown"-family shingles appear in 3 docs; with cap 2
    // those shingles vanish from the index, but d1/d2 still share
    // their full shingle sets → identical pairs survive via the rest
    val capped = Dedup.jaccardPairs(docs, n = 3, threshold = 0.5, maxDocFreq = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)))
    // n_common shrinks (hot shingles excluded) but the exact-dup pair
    // still clears the threshold through its unique-enough shingles
  }

  test("minhash LSH: identical docs always collide; verified jaccard is exact") {
    val pairs = Dedup.minhashLsh(docs, n = 3, numHashes = 12, bands = 4, threshold = 0.5)
      .collect()
    // identical signature → identical band keys → candidate; J=1 ≥ 0.5
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).contains((1L, 2L)))
    // verification step keeps no false positives below the threshold
    assert(pairs.forall(_.getAs[Double]("jaccard") >= 0.5))
  }

  test("minhash LSH candidates never exceed exact-jaccard matches (no FPs after verify)") {
    val lsh = Dedup.minhashLsh(docs, 3, 12, 4, 0.35)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.jaccardPairs(docs, 3, 0.35)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
  }

  test("simhash: identical docs get identical signatures; near-dup pair found") {
    val sigs = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs.values.forall(s => s >= 0 && s <= 0xFFFFFFFFL))
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.contains((1L, 2L, 0)))
    // pigeonhole blocking guarantee: every emitted pair respects the cap
    assert(pairs.forall(_._3 <= 3))
  }

  test("dupNgramRate: copies rate 1.0, partial overlap in (0,1), unique 0.0") {
    val out = Dedup.dupNgramRate(docs, n = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_sh"), r.getAs[Long]("n_dup"), r.getAs[Double]("dup_rate")))
      .toMap
    // d1 ≡ d2: every shingle shared → rate exactly 1.0
    assert(out(1L)._3 == 1.0 && out(2L)._3 == 1.0)
    // d3 shares some but not all of d1's shingles
    assert(out(3L)._2 > 0 && out(3L)._2 < out(3L)._1)
    assert(out(3L)._3 == out(3L)._2.toDouble / out(3L)._1.toDouble)
    // d4 is disjoint → nothing shared
    assert(out(4L) == ((out(4L)._1, 0L, 0.0)))
  }
}
