package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted IVF index must return exactly what the per-query IVF
  * operator computes with the same parameters (training is
  * deterministic), and its probe plan must read the inverted lists
  * pre-bucketed. */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private def emb = (0L until 120L).map { i =>
    (i, Array.tabulate(64)(d => ((i * 37 + d * 11) % 17 - 8).toFloat / 8f))
  }.toDF("vec_id", "embedding")

  test("topk over the persisted index == recomputed topkIvf, same parameters") {
    val root = Files.createTempDirectory("graft-ivfidx").toString
    IvfIndex.build(emb, root, nCentroids = 8, iters = 2, numBuckets = 4)
    val queries = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val fromIndex = IvfIndex.topk(spark, root, queries, k = 5, nProbe = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val direct = Ivf.topkIvf(emb, queryMod = 20L, k = 5,
        nCentroids = 8, nProbe = 3, iters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    OpCaches.releaseAll()
    assert(fromIndex == direct, s"index=${fromIndex.size} direct=${direct.size}")
    assert(fromIndex.nonEmpty)
  }

  test("centroids round-trip the snapshot meta bit-identically") {
    val cs = Seq(Array(1.0, -0.25, 3.3e-17), Array(0.0, Double.MinPositiveValue, -42.0))
    val rt = IvfIndex.decode(IvfIndex.encode(cs))
    assert(rt.length == 2 && rt.zip(cs).forall { case (a, b) => a.sameElements(b) })
  }

  test("append + topk == build-everything topk with the same centroids; compact preserves") {
    val rootA = Files.createTempDirectory("graft-ivfapp-a").toString
    val rootB = Files.createTempDirectory("graft-ivfapp-b").toString
    val oldVecs = emb.filter(col("vec_id") < 90)
    val newVecs = emb.filter(col("vec_id") >= 90)
    val queries = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))

    // A: base on old vectors, then the new batch appended as a delta.
    IvfIndex.build(oldVecs, rootA, nCentroids = 8, iters = 2, numBuckets = 4)
    val seq = IvfIndex.append(newVecs, rootA)
    assert(seq == 0L)
    val appended = IvfIndex.topk(spark, rootA, queries, k = 5, nProbe = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet

    // B: the reference — ONE build over everything with the IDENTICAL
    // centroids (copied from A's base meta, so the only difference is
    // base+delta vs monolithic layout).
    import graft.fs.SnapshotDir
    val cs = IvfIndex.decode(
      SnapshotDir.metaAt(SnapshotDir.currentDir(s"$rootA/cells").get)("centroids"))
    SnapshotDir.publishBucketed(
      Similarity.prepared(emb).select(col("vec_id"), col("v"), col("nrm"))
        .withColumn("cell", Ivf.assign(cs)),
      s"$rootB/cells", bucketCol = "cell", numBuckets = 4,
      meta = Map("centroids" -> IvfIndex.encode(cs)))
    val monolithic = IvfIndex.topk(spark, rootB, queries, k = 5, nProbe = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(appended == monolithic, s"appended=${appended.size} mono=${monolithic.size}")
    assert(appended.exists { case (_, cand, _, _) => cand >= 90 },
      "appended vectors never surfaced as candidates")

    // compact folds the delta into a fresh bucketed base: same answers.
    // GC is DEFERRED a generation — the just-folded delta-0 stays on
    // disk for in-flight readers but is retired by the watermark.
    IvfIndex.compact(spark, rootA)
    assert(Files.isDirectory(java.nio.file.Paths.get(s"$rootA/cells/delta-0")))
    val compacted = IvfIndex.topk(spark, rootA, queries, k = 5, nProbe = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(compacted == appended)
    // the NEXT compact sweeps what the previous watermark retired
    IvfIndex.compact(spark, rootA)
    assert(!Files.exists(java.nio.file.Paths.get(s"$rootA/cells/delta-0")))
    assert(IvfIndex.topk(spark, rootA, queries, k = 5, nProbe = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet == appended)
    OpCaches.releaseAll()
  }

  test("append replay by batch id is a no-op; rebuild retires live deltas") {
    val root = Files.createTempDirectory("graft-ivfrep").toString
    val clean = Files.createTempDirectory("graft-ivfcln").toString
    val queries = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    IvfIndex.build(emb.filter(col("vec_id") < 90), root,
      nCentroids = 8, iters = 2, numBuckets = 4)
    val batch = emb.filter(col("vec_id") >= 90)
    assert(IvfIndex.append(batch, root, seq = Some(7L)) == 7L)
    val once = IvfIndex.topk(spark, root, queries, k = 5, nProbe = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    // crash-replay of the SAME batch id publishes nothing new
    assert(IvfIndex.append(batch, root, seq = Some(7L)) == 7L)
    assert(graft.fs.DeltaDirs.list(s"$root/cells").map(_._1) == Seq(7L))
    assert(IvfIndex.topk(spark, root, queries, k = 5, nProbe = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet == once)

    // a full rebuild covers the corpus, so the old delta must be
    // retired (NOT resurrected against the new base): results match a
    // fresh build in a clean root bit-for-bit (training is deterministic)
    IvfIndex.build(emb, root, nCentroids = 8, iters = 2, numBuckets = 4)
    IvfIndex.build(emb, clean, nCentroids = 8, iters = 2, numBuckets = 4)
    val rebuilt = IvfIndex.topk(spark, root, queries, k = 5, nProbe = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val fresh = IvfIndex.topk(spark, clean, queries, k = 5, nProbe = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(rebuilt == fresh)
    // replaying a batch id at-or-below the rebuild's watermark is a no-op
    assert(IvfIndex.append(batch, root, seq = Some(7L)) == 7L)
    assert(graft.fs.DeltaDirs.live(s"$root/cells", 7L).isEmpty)
    OpCaches.releaseAll()
  }

  test("probe reads the inverted lists pre-bucketed (no corpus-side Exchange)") {
    import graft.fs.SnapshotDir
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("graft-ivfidx2").toString
    IvfIndex.build(emb, root, nCentroids = 4, iters = 1, numBuckets = 4)
    val queries = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val plan = IvfIndex.topk(spark, root, queries, k = 3, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"), plan)
    // the quantized layout publishes through the same bucketed path —
    // its probe must read pre-partitioned too
    val rootQ = Files.createTempDirectory("graft-ivfidx2q").toString
    IvfIndex.build(emb, rootQ, nCentroids = 4, iters = 1, numBuckets = 4,
      quantized = true)
    val planQ = IvfIndex.topk(spark, rootQ, queries, k = 3, nProbe = 2)
      .queryExecution.executedPlan.toString
    assert(planQ.contains("Bucketed: true"), planQ)

    // by construction: a broadcast probe against the bucketed cells
    // table must shuffle NOTHING (the corpus side reads pre-partitioned,
    // the probe side broadcasts)
    val cellsDir = SnapshotDir.currentDir(s"$root/cells").get
    val cells = SnapshotDir.readAt(spark, cellsDir, StructType(Seq(
      StructField("vec_id", LongType), StructField("v", ArrayType(DoubleType)),
      StructField("nrm", DoubleType), StructField("cell", IntegerType))))
    val probe = broadcast(Seq((0L, 1)).toDF("query_id", "cell"))
      .join(cells, Seq("cell"))
    assert(!probe.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"),
      probe.queryExecution.executedPlan.toString)

    // rebuild replaces the snapshot atomically; queries keep working
    IvfIndex.build(emb, root, nCentroids = 4, iters = 1, numBuckets = 4)
    assert(IvfIndex.topk(spark, root, queries, k = 3, nProbe = 2).count() > 0)
  }

  test("quantized index: deterministic, ranks like the exact index, survives append+compact") {
    import graft.fs.SnapshotDir
    val root = Files.createTempDirectory("graft-ivfq").toString
    val rootExact = Files.createTempDirectory("graft-ivfq-ref").toString
    IvfIndex.build(emb, root, nCentroids = 8, iters = 2, numBuckets = 4,
      quantized = true)
    val meta = SnapshotDir.metaAt(SnapshotDir.currentDir(s"$root/cells").get)
    assert(meta.get("quant").contains("sq8-pervec"),
      "quantized build must record its layout scheme")
    val queries = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def ids(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val q1 = IvfIndex.topk(spark, root, queries, k = 5, nProbe = 3).collect()
    // deterministic: an identical probe returns identical rows
    val q2 = IvfIndex.topk(spark, root, queries, k = 5, nProbe = 3).collect()
    assert(ids(q1) == ids(q2) && q1.nonEmpty)
    // same training → same cells → same candidate set as the exact
    // index; per-vector int8 ranking may flip near-ties only — top-5
    // agreement must stay high (int8 relative precision ~1/127)
    IvfIndex.build(emb, rootExact, nCentroids = 8, iters = 2, numBuckets = 4)
    val exact = ids(IvfIndex.topk(spark, rootExact, queries, k = 5, nProbe = 3).collect())
    val agree = ids(q1).intersect(exact).size.toDouble / exact.size
    assert(agree >= 0.8, s"quantized/exact top-5 agreement $agree")
    OpCaches.releaseAll()

    // append quantizes arrivals against THEMSELVES (per-vector scales)
    // under the frozen centroids; compact folds and preserves answers
    val rootA = Files.createTempDirectory("graft-ivfq-app").toString
    IvfIndex.build(emb.filter(col("vec_id") < 90), rootA,
      nCentroids = 8, iters = 2, numBuckets = 4, quantized = true)
    IvfIndex.append(emb.filter(col("vec_id") >= 90), rootA)
    val appended = ids(IvfIndex.topk(spark, rootA, queries, k = 5, nProbe = 3).collect())
    assert(appended.exists { case (_, cand) => cand >= 90 },
      "appended vectors never surfaced as candidates")
    IvfIndex.compact(spark, rootA)
    val metaC = SnapshotDir.metaAt(SnapshotDir.currentDir(s"$rootA/cells").get)
    assert(metaC.get("quant").contains("sq8-pervec"),
      "compact must carry the quant layout marker forward")
    val compacted = ids(IvfIndex.topk(spark, rootA, queries, k = 5, nProbe = 3).collect())
    assert(compacted == appended)
    OpCaches.releaseAll()
  }

  test("quantized append of out-of-distribution magnitudes stays well-ranked") {
    val root = Files.createTempDirectory("graft-ivfq-sat").toString
    IvfIndex.build(emb.filter(col("vec_id") < 90), root,
      nCentroids = 4, iters = 1, numBuckets = 4, quantized = true)
    // arrivals 5× the build-time magnitude: per-vector scales quantize
    // them against themselves (the frozen-GLOBAL-scale design saturated
    // every code here and collapsed decade recall to 0.0 — the failure
    // this layout removes); cosine is magnitude-invariant so ranking
    // is unaffected
    val big = emb.filter(col("vec_id") >= 90)
      .withColumn("embedding", transform(col("embedding"), x => x * lit(5.0f)))
    IvfIndex.append(big, root)
    val queries = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val res = IvfIndex.topk(spark, root, queries, k = 5, nProbe = 4).collect()
    assert(res.nonEmpty && res.forall(r => !r.getDouble(2).isNaN))
    OpCaches.releaseAll()
  }

  test("buildIfAbsent distinguishes quantized from full-precision builds") {
    val root = Files.createTempDirectory("graft-ivfq-ifa").toString
    assert(IvfIndex.buildIfAbsent(emb, root, nCentroids = 4, iters = 1,
      numBuckets = 4, quantized = true))
    assert(!IvfIndex.buildIfAbsent(emb, root, nCentroids = 4, iters = 1,
      numBuckets = 4, quantized = true))
    // the SAME corpus requested un-quantized is a different artifact
    assert(IvfIndex.buildIfAbsent(emb, root, nCentroids = 4, iters = 1,
      numBuckets = 4, quantized = false))
  }

  test("buildIfAbsent: trains once per content fingerprint, rebuilds on change") {
    val root = Files.createTempDirectory("graft-ivfifa").toString
    // first call trains; identical second call skips
    assert(IvfIndex.buildIfAbsent(emb, root, nCentroids = 4, iters = 1, numBuckets = 4))
    assert(!IvfIndex.buildIfAbsent(emb, root, nCentroids = 4, iters = 1, numBuckets = 4))
    // changed params → new fingerprint → rebuild
    assert(IvfIndex.buildIfAbsent(emb, root, nCentroids = 8, iters = 1, numBuckets = 4))
    // a RE-BUCKETING request is a layout change → rebuild, then skip
    assert(IvfIndex.buildIfAbsent(emb, root, nCentroids = 8, iters = 1, numBuckets = 8))
    assert(!IvfIndex.buildIfAbsent(emb, root, nCentroids = 8, iters = 1, numBuckets = 8))
    // changed corpus content → rebuild
    assert(IvfIndex.buildIfAbsent(emb.filter(col("vec_id") < 100), root,
      nCentroids = 8, iters = 1, numBuckets = 4))
    // a live delta forces the rebuild path (appends must be retired) —
    // the staleness fact the guard reads is the manifest's live delta row
    IvfIndex.append(emb.filter(col("vec_id") >= 100), root)
    assert(graft.fs.IndexManifest.liveDeltas(graft.fs.IndexManifest.ivf(root)).nonEmpty)
    assert(IvfIndex.buildIfAbsent(emb.filter(col("vec_id") < 100), root,
      nCentroids = 8, iters = 1, numBuckets = 4))
    // skipped build leaves a queryable index behind
    val queries = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    assert(IvfIndex.topk(spark, root, queries, k = 3, nProbe = 2).count() > 0)
  }
}
