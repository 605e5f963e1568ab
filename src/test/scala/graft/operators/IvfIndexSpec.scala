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
}
