package graft.operators

import graft.SparkSpec

class DeltaDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "an entirely different sentence about nothing")
  ).toDF("doc_id", "text")

  private lazy val delta = Seq(
    (10L, "the quick brown fox jumps over the lazy dog"), // dup of corpus 1
    (11L, "fresh unseen words completely new here"),
    (12L, "fresh unseen words completely new here")       // dup within delta
  ).toDF("doc_id", "text")

  test("deltaPairs finds delta-vs-corpus and delta-vs-delta dups without corpus self-join") {
    val idx = Dedup.shingleIndex(corpus, 3)
    val pairs = Dedup.deltaPairs(delta, idx, 3, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard"))).toSet
    assert(pairs == Set((1L, 10L, 1.0), (11L, 12L, 1.0)))
  }

  test("delta dedup equals full-batch jaccard restricted to delta-touching pairs") {
    val all = corpus.unionByName(delta)
    val full = Dedup.jaccardPairs(all, 3, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
      .filter(p => p._1 >= 10 || p._2 >= 10) // pairs touching the delta
    val inc = Dedup.deltaPairs(delta, Dedup.shingleIndex(corpus, 3), 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(inc == full)
  }
}
