package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", expr("CASE WHEN doc_id % 3 = 0 THEN 'en' WHEN doc_id % 3 = 1 THEN 'de' ELSE 'fr' END"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  test("contaminationPairs flags planted leakage, not disjoint docs") {
    val leaked = "the quick brown fox jumps over the lazy dog tonight"
    val docs = mkDocs(Seq(
      17L -> leaked,                                   // test (17 % 17 == 0)
      100L -> s"prefix words here $leaked and a suffix", // train, contains the test text
      101L -> "completely different content with no shared phrases at all",
      34L -> "another test doc that nobody copied from anywhere else"))
    val pairs = CorpusOps.contaminationPairs(docs, col("doc_id") % 17 === 0,
      n = 5, minOverlap = 3L).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((100L, 17L)))
    // overlap = number of shared distinct 5-grams; the leaked sentence
    // has 10 tokens ⇒ 6 five-grams, all present in doc 100
    assert(pairs.head.getLong(2) == 6L)

    val keep = CorpusOps.decontaminatedKeep(docs, col("doc_id") % 17 === 0,
      n = 5, minOverlap = 3L).select("doc_id").as[Long].collect().toSet
    assert(keep == Set(101L)) // 100 contaminated; 17/34 are test side
  }

  test("contaminationPairs plan: no cartesian, test side broadcast") {
    val docs = mkDocs((1L to 60L).map(i => i -> s"word$i filler tokens common phrase number $i here"))
    val plan = CorpusOps.contaminationPairs(docs, col("doc_id") % 17 === 0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("contaminationCoverage: exact per-test-doc gram fractions") {
    val leaked = "the quick brown fox jumps over the lazy dog tonight"
    val docs = mkDocs(Seq(
      17L -> leaked,                                     // test: all 6 grams leaked
      34L -> "some test only material that no train document ever saw", // test: 0 hits
      100L -> s"prefix words here $leaked and a suffix",  // train
      101L -> "unrelated train content"))
    val got = CorpusOps.contaminationCoverage(docs, col("doc_id") % 17 === 0, n = 5)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_hit"), r.getAs[Double]("coverage")))
    assert(got.toSeq == Seq(
      (17L, 6L, 6L, 1.0),
      (34L, 6L, 0L, 0.0)), got.toSeq)
  }

  test("hashSample is deterministic and splits disjointly by hex range") {
    val docs = mkDocs((1L to 400L).map(i => i -> s"doc $i"))
    val a = CorpusOps.hashSample(docs, "19").select("doc_id").as[Long].collect().toSet
    val b = CorpusOps.hashSample(docs, "19").select("doc_id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
    // ~10% of 400 with binomial spread
    assert(a.size > 15 && a.size < 90, s"got ${a.size}")
    // a disjoint later range never overlaps: membership is a pure
    // function of the hash prefix, so ranges partition the corpus
    val c = CorpusOps.hashSample(docs, "ff").select("doc_id").as[Long].collect().toSet
    assert(c.size == 400) // full range = everything
  }

  test("stratifiedSample == brute reference; WindowGroupLimit prunes pre-shuffle") {
    val docs = mkDocs((1L to 300L).map(i => i -> s"doc $i"))
    val got = CorpusOps.stratifiedSample(docs, quota = 7)
    val brute = docs.select(col("doc_id"), col("lang"),
        md5(col("doc_id").cast("string")).as("h"))
      .withColumn("rk", row_number()
        .over(Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))).cast("int"))
      .filter(col("rk") <= 7).select("doc_id", "lang", "rk").orderBy("lang", "rk")
    assert(got.collect().toSeq == brute.collect().toSeq)
    assert(got.groupBy("lang").count().collect().forall(_.getLong(1) == 7L))
    // the rank filter must push a per-partition group limit below the
    // shuffle — without it every stratum sorts its full membership
    assert(got.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      got.queryExecution.executedPlan.toString)
  }

  test("packShards two-phase == global-window reference, with id gaps and odd block size") {
    // sparse non-contiguous ids: blocks of wildly different sizes,
    // including empty ones
    val ids = Seq(1L, 2L, 3L, 50L, 51L, 700L, 701L, 702L, 703L, 9000L)
    val docs = mkDocs(ids.map(i => i -> (s"tok " * (i % 37 + 1).toInt).trim))
    val got = CorpusOps.packShards(docs, budget = 40L, blockSize = 7L).collect()
    val ref = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum_before", coalesce(
        sum("n_tokens").over(Window.orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("doc_id"), col("n_tokens"),
        expr("cum_before div 40").as("shard_id"))
      .orderBy("doc_id").collect()
    assert(got.toSeq == ref.toSeq)
    // shard ids are monotone in doc order and start at 0
    val shards = got.map(_.getLong(2))
    assert(shards.head == 0L && shards.sliding(2).forall(p => p(0) <= p(1)))
  }

  test("qualityGate keeps each source's top floor(n*frac) by score, ties by doc_id") {
    // single-token docs: stopRatio 0, distinctRatio 1 → q ranks by n_chars
    def doc(id: Long, len: Int, src: String) = (id, "w" * len, "en", src, len.toLong)
    val d = Seq(
      doc(1, 10, "a"), doc(2, 50, "a"), doc(3, 100, "a"), doc(4, 200, "a"),
      doc(5, 30, "a"),
      doc(6, 20, "b"), doc(7, 80, "b"), doc(8, 40, "b")
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = CorpusOps.qualityGate(d, keepFrac = 0.4).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rnk"))).toSeq
    // a: k = floor(5·0.4) = 2 → docs 4 (rank 1), 3 (rank 2);
    // b: k = floor(3·0.4) = 1 → doc 7
    assert(kept == Seq((3L, 2L), (4L, 1L), (7L, 1L)))

    val ok = CorpusOps.qualityGateApprox(d, keepFrac = 0.4).collect()
      .map(r => (r.getString(0), r.getAs[Boolean]("within_tol")))
    assert(ok.toSeq == Seq(("a", true), ("b", true)))
  }

  test("epochOrder: deterministic per-epoch permutations, decorrelated across epochs") {
    val d = mkDocs((1L to 40L).map(i => i -> s"doc $i"))
      .withColumn("source", expr("'s'"))
    val a = CorpusOps.epochOrder(d, epochs = 2, head = 10).collect()
      .map(r => (r.getAs[Int]("epoch"), r.getAs[Long]("rk"), r.getAs[Long]("doc_id")))
    val b = CorpusOps.epochOrder(d, epochs = 2, head = 10).collect()
      .map(r => (r.getAs[Int]("epoch"), r.getAs[Long]("rk"), r.getAs[Long]("doc_id")))
    assert(a.toSeq == b.toSeq) // reproducible across runs
    assert(a.count(_._1 == 1) == 10 && a.count(_._1 == 2) == 10)
    // epochs produce different orders (hash keys include the epoch)
    val e1 = a.filter(_._1 == 1).map(_._3).toSeq
    val e2 = a.filter(_._1 == 2).map(_._3).toSeq
    assert(e1 != e2)
  }

  test("mixSchedule: largest-remainder allocations sum exactly to the budget") {
    def doc(id: Long, nTok: Int, src: String) = {
      val text = (1 to nTok).map(i => s"t$i").mkString(" ")
      (id, text, "en", src, text.length.toLong)
    }
    // tokens a=5, b=3, c=2; budget 7: bases 3/2/1 (sum 6), remainders
    // 5/1/4 → the leftover unit goes to a → allocs 4/2/1, sum 7
    val d = Seq(doc(1, 5, "a"), doc(2, 3, "b"), doc(3, 2, "c"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = CorpusOps.mixSchedule(d, budget = 7L).collect()
      .map(r => (r.getString(0), r.getAs[Long]("base"), r.getAs[Long]("extra"),
        r.getAs[Long]("alloc")))
    assert(out.toSeq == Seq(("a", 3L, 1L, 4L), ("b", 2L, 0L, 2L), ("c", 1L, 0L, 1L)))
    assert(out.map(_._4).sum == 7L)
    // tie remainders: equal sources, budget not divisible — ties break
    // by source name, total still exact
    val e = Seq(doc(1, 1, "x"), doc(2, 1, "y"), doc(3, 1, "z"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out2 = CorpusOps.mixSchedule(e, budget = 10L).collect()
      .map(r => (r.getString(0), r.getAs[Long]("alloc")))
    assert(out2.toSeq == Seq(("x", 4L), ("y", 3L), ("z", 3L)))
  }

  test("sourceMix: shares sum to 1, uniform weights equalize token mass") {
    val docs = mkDocs(Seq(
      1L -> "a b c d e f g h",      // 8 tokens
      2L -> "a b c d",              // 4 tokens
      3L -> "a b c d",              // 4 tokens  → src0 has 8, src1 has 8
      4L -> "x y z w"))             // 4 tokens  → src2 has 4
      .withColumn("source", expr("CASE WHEN doc_id = 1 THEN 's0' WHEN doc_id = 4 THEN 's2' ELSE 's1' END"))
    val out = CorpusOps.sourceMix(docs).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("s0", "s1", "s2"))
    assert(out.map(_.getLong(2)).toSeq == Seq(8L, 8L, 4L))
    assert(math.abs(out.map(_.getDouble(3)).sum - 1.0) < 1e-12)
    // weight × n_tokens is the same for every source: total / #sources
    val mass = out.map(r => r.getDouble(4) * r.getLong(2))
    assert(mass.forall(m => math.abs(m - 20.0 / 3) < 1e-9), mass.toSeq)
  }

  test("temperatureMix: sqrt-smoothing compresses the spread, weights sum to 1") {
    val docs = mkDocs(Seq(
      1L -> "a b c d e f g h",      // 8 tokens
      2L -> "a b c d",              // 4 tokens
      3L -> "a b c d",              // 4 tokens  → src0 has 8, src1 has 8
      4L -> "x y z w"))             // 4 tokens  → src2 has 4
      .withColumn("source", expr("CASE WHEN doc_id = 1 THEN 's0' WHEN doc_id = 4 THEN 's2' ELSE 's1' END"))
    val out = CorpusOps.temperatureMix(docs).collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-12)
    // α=1/2 up-samples the tail: the small source's weight exceeds its
    // raw share, the big sources' weights drop below theirs
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId("s2")._4 > byId("s2")._2)
    assert(byId("s0")._4 < byId("s0")._2)
    // scaled_share is exactly sqrt(token_share)
    assert(out.forall { case (_, sh, sc, _) => sc == math.sqrt(sh) })
    // ordering between sources is preserved (monotone transform)
    assert(byId("s0")._4 == byId("s1")._4 && byId("s0")._4 > byId("s2")._4)
  }

  test("corpusDiff: content-hash classification across versions") {
    val old = mkDocs(Seq(1L -> "alpha beta", 2L -> "gamma delta",
      3L -> "epsilon zeta", 4L -> "eta theta"))
    val v2 = mkDocs(Seq(1L -> "alpha beta",       // unchanged
      2L -> "gamma delta CHANGED",                // modified
      5L -> "brand new doc"))                     // added; 3,4 deleted
    val got = CorpusOps.corpusDiff(old, v2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "modified",
      3L -> "deleted", 4L -> "deleted", 5L -> "added"))
    // NULL text is a value, not absence: present-with-null on both
    // sides is unchanged, null→text is modified (md5(NULL) would
    // otherwise read as a missing row and report 'deleted')
    val oldN = Seq((1L, null: String), (2L, null: String))
      .toDF("doc_id", "text")
    val newN = Seq((1L, null: String), (2L, "now present"))
      .toDF("doc_id", "text")
    val gotN = CorpusOps.corpusDiff(oldN, newN).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gotN == Map(1L -> "unchanged", 2L -> "modified"))
  }

  test("packSequences: offsets tile the token stream exactly, straddles flagged") {
    val docs = mkDocs((1L to 100L).map(i => i -> (1 to (1 + (i % 7)).toInt)
      .map(j => s"t$j").mkString(" ")))
    val out = CorpusOps.packSequences(docs, seqLen = 16L, blockSize = 8L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    // reconstruct the naive global prefix sum and check every column
    var cum = 0L
    out.sortBy(_._1).foreach { case (_, n, seqId, start, end, straddles) =>
      assert(seqId == cum / 16 && start == cum % 16 && end == start + n)
      assert(straddles == (start + n > 16))
      cum += n
    }
    // packing is dense: consecutive docs are contiguous in the stream
    assert(out.map(_._2).sum == cum)
  }

  test("packShards: the only unpartitioned window runs over block totals, not documents") {
    val docs = mkDocs((1L to 500L).map(i => i -> s"some tokens for doc $i"))
    val plan = CorpusOps.packShards(docs, budget = 64L, blockSize = 16L)
      .queryExecution.optimizedPlan.toString
    // two windows: the doc-level one partitioned by blk, the offset one
    // over the aggregated block table (input = Aggregate, rows = #blocks)
    val windows = "Window ".r.findAllIn(plan).size
    assert(windows == 2, plan)
    assert(plan.contains("windowspecdefinition(blk"), plan)
  }
}
