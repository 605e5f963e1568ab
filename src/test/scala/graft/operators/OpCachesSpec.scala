package graft.operators

import graft.SparkSpec

/** The cache-hygiene contract: every operator-internal cache() is
  * tracked, and OpCaches.releaseAll() leaves NO persisted RDD behind —
  * a long-lived session (streaming driver, notebook, serving layer)
  * running operators back-to-back must not accumulate dead blocks. */
class OpCachesSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "lorem ipsum dolor sit amet consectetur adipiscing elit"),
    (4L, "the quick brown fox jumps over the lazy dog")
  ).toDF("doc_id", "text")

  private def emb = (0L until 60L).map { i =>
    (i, Array.tabulate(64)(d => ((i * 31 + d * 7) % 13 - 6).toFloat))
  }.toDF("vec_id", "embedding")

  test("releaseAll drops every cache the lazy operator builders pin") {
    // make sure we start clean (other suites share the session)
    OpCaches.releaseAll()
    spark.catalog.clearCache()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)

    // run each cache-holding operator through a terminal action
    Dedup.jaccardPairs(docs, n = 2, threshold = 0.3).count()
    Dedup.jaccardPairs(docs, n = 2, threshold = 0.3, maxDocFreq = Some(2L)).count()
    Dedup.minhashLsh(docs, n = 2, numHashes = 8, bands = 4, threshold = 0.3).count()
    Dedup.simhashPairs(docs).count()
    Similarity.topkLsh(emb, queryMod = 20L, k = 3).count()
    Ivf.topkIvf(emb, queryMod = 20L, k = 3, nCentroids = 4, nProbe = 2).count()

    assert(spark.sparkContext.getPersistentRDDs.nonEmpty) // caches were live
    OpCaches.releaseAll()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"lingering blocks: ${spark.sparkContext.getPersistentRDDs.values.map(_.name)}")
  }

  test("double release and release-after-gc are safe no-ops") {
    Dedup.simhashPairs(docs).count()
    OpCaches.releaseAll()
    OpCaches.releaseAll() // second call: registry empty, nothing to do
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
