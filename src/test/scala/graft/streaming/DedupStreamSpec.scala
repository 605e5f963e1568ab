package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.fs.SnapshotDir

class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  test("continuousDedup: corpus near-dups drop, within-batch clusters keep min id") {
    val staging = Files.createTempDirectory("graft-ddstream-in")
    val state = Files.createTempDirectory("graft-ddstream-state").toString
    val out = Files.createTempDirectory("graft-ddstream-out").toString
    val ckpt = Files.createTempDirectory("graft-ddstream-ckpt").toString

    // batch 1: two distinct docs → both kept
    Seq((1L, "aa bb cc dd ee ff"), (2L, "zz yy xx ww vv uu"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(staging.toString)
    Thread.sleep(1100) // distinct file mtimes → deterministic batch order
    // batch 2: 3 = exact text of 1 (corpus near-dup, dropped);
    //          4 distinct (kept); 5 = exact text of 4 (within-batch, 5 > 4 → dropped)
    Seq((3L, "aa bb cc dd ee ff"), (4L, "mm nn oo pp qq rr"), (5L, "mm nn oo pp qq rr"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(staging.toString)

    // one file per micro-batch, so batch 1 publishes its index BEFORE
    // batch 2 decides — exercising the corpus (cross-batch) drop path
    val q = DedupStream.continuousDedup(spark, staging.toString, state, out, ckpt,
      n = 3, threshold = 0.5,
      trigger = Trigger.AvailableNow(),
      readOptions = Map("maxFilesPerTrigger" -> "1"))
    q.awaitTermination(120000)

    val decisions = spark.read.parquet(out)
      .select("doc_id", "kept").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(decisions(1L) && decisions(2L), decisions.toString)
    assert(!decisions(3L)) // near-dup of doc 1 (kept corpus or same-batch lower id)
    assert(decisions(4L))
    assert(!decisions(5L)) // within-batch cluster keeps min id 4
    // the persisted index holds shingles of exactly the kept docs
    val idx = SnapshotDir.load(spark, state, DedupStream.indexSchema)
    assert(idx.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 4L))
  }

  test("decideBatch is idempotent against a republished index (replay safety)") {
    val docs = Seq((1L, "aa bb cc dd ee"), (2L, "aa bb cc dd ee")).toDF("doc_id", "text")
    val emptyIdx = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], DedupStream.indexSchema)
    val (d1, sh1, c1) = DedupStream.decideBatch(docs, emptyIdx, 3, 0.5)
    val kept1 = d1.filter($"kept").collect().map(_.getLong(0)).toSet
    val idx1 = sh1.collect()
    c1()
    // replaying the same batch against the SAME published index generation
    // recomputes identical decisions and identical index rows
    val (d2, sh2, c2) = DedupStream.decideBatch(docs, emptyIdx, 3, 0.5)
    assert(d2.filter($"kept").collect().map(_.getLong(0)).toSet == kept1)
    assert(sh2.collect().toSet == idx1.toSet)
    c2()
    assert(kept1 == Set(1L)) // exact dup in-batch keeps the min id
  }
}
