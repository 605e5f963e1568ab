package graft.fs

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.IvfIndex

class IndexManifestSpec extends SparkSpec {
  import spark.implicits._

  private def emb = (0L until 60L).map { i =>
    (i, Array.tabulate(16)(d => ((i * 37 + d * 11) % 17 - 8).toFloat / 8f))
  }.toDF("vec_id", "embedding")

  test("manifest unions base+delta state of every family; staleness is one query") {
    // core: plain snapshot root
    val coreRoot = Files.createTempDirectory("graft-mani-core").toString
    SnapshotDir.publish(Seq((1L, "a")).toDF("k", "v"), coreRoot)
    // ivf: base + one live (unfolded) append delta
    val ivfRoot = Files.createTempDirectory("graft-mani-ivf").toString
    IvfIndex.build(emb.filter(col("vec_id") < 40), ivfRoot,
      nCentroids = 4, iters = 1, numBuckets = 2)
    IvfIndex.append(emb.filter(col("vec_id") >= 40), ivfRoot)
    // dedup: base with cap marker + one folded and one live delta
    val ddState = Files.createTempDirectory("graft-mani-dd").toString
    SnapshotDir.publishBucketed(
      Seq((7L, 1L, 3L)).toDF("shingle", "doc_id", "n_sh"),
      s"$ddState/base", bucketCol = "shingle", numBuckets = 2,
      meta = Map("compacted_through" -> "0", "cap" -> "2:15:99"))
    Seq((8L, 1L, 3L)).toDF("shingle", "doc_id", "n_sh")
      .write.parquet(s"$ddState/delta-0") // folded (seq <= watermark)
    Seq((9L, 2L, 3L)).toDF("shingle", "doc_id", "n_sh")
      .write.parquet(s"$ddState/delta-1") // live

    val fams = Seq(IndexManifest.core(coreRoot),
      IndexManifest.ivf(ivfRoot), IndexManifest.dedup(ddState))
    val m = IndexManifest.manifest(spark, fams)

    // every family's pointed base is a live base row
    val bases = m.filter(col("entry") === "base").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(6), r.getLong(5))).toSet
    assert(bases == Set(
      ("core", "index", true, -1L),
      ("ivf", "cells", true, -1L),
      ("dedup", "base", true, 0L)))
    // delta liveness is per-row: ivf delta-0 unfolded (watermark -1),
    // dedup delta-0 folded, delta-1 live
    val deltas = m.filter(col("entry") === "delta").collect()
      .map(r => (r.getString(0), r.getLong(4), r.getBoolean(6))).toSet
    assert(deltas == Set(("ivf", 0L, true), ("dedup", 0L, false), ("dedup", 1L, true)))
    // cap fingerprint rides the dedup base row; other families are ""
    val caps = m.filter(col("entry") === "base")
      .select("kind", "cap").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(caps == Map("core" -> "", "ivf" -> "", "dedup" -> "2:15:99"))
    // family-specific meta is queryable (ivf centroids + bucket layout)
    val ivfMeta = m.filter(col("kind") === "ivf" && col("entry") === "base")
      .select(col("meta")).head().getMap[String, String](0)
    assert(ivfMeta.contains("centroids") && ivfMeta.get("bucket_n").contains("2"))

    // THE point: "anything stale?" is one filter instead of four code
    // paths — and compacting the IVF index flips exactly its row
    assert(m.filter(col("entry") === "delta" && col("live")).count() == 2)
    IvfIndex.compact(spark, ivfRoot)
    val after = IndexManifest.manifest(spark, fams)
    assert(after.filter(col("entry") === "delta" && col("live")).count() == 1)
    assert(after.filter(col("kind") === "ivf" && col("entry") === "base")
      .head().getLong(5) == 0L) // watermark now covers the folded delta
    // an unbuilt index contributes absence, not an error row
    val none = IndexManifest.manifest(spark,
      Seq(IndexManifest.ann(Files.createTempDirectory("graft-mani-ann").toString)))
    assert(none.isEmpty)
    // torn-publish debris surfaces as a live=false base row (pointer
    // exists, directory doesn't) — visible, not an exception
    val torn = Files.createTempDirectory("graft-mani-torn").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$torn/CURRENT"), "snap-000000000000000001")
    val tornRow = IndexManifest.manifest(spark, Seq(IndexManifest.core(torn)))
      .collect()
    assert(tornRow.length == 1 && tornRow(0).getString(2) == "base" &&
      !tornRow(0).getBoolean(6) && tornRow(0).getLong(5) == -1L)
  }
}
