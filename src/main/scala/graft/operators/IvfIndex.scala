package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.fs.SnapshotDir
import graft.functions.VectorOps

/** PERSISTED IVF index — the second "index once, query many" ANN
  * family next to [[AnnIndex]]'s hyperplane LSH. [[Ivf.topkIvf]]
  * retrains centroids and reassigns every vector on every call; at
  * corpus scale those are one-time build artifacts:
  *
  *  - `<root>/cells`: (vec_id, v, nrm, cell) — the inverted lists WITH
  *    the exact-rerank payload inline, hash-bucketed BY cell. A
  *    query's probe is an equi-join on cell whose corpus side reads
  *    pre-partitioned (no Exchange); because a vector belongs to
  *    exactly ONE cell (vs ~`tables` LSH buckets), the payload rides
  *    in the same table and candidates never need a second join to
  *    fetch vectors.
  *  - centroids ride the snapshot's atomic meta (k×dims doubles —
  *    ~16 KB at k=16, d=64; `Double.toString` round-trips exactly, so
  *    the decoded planes reproduce cell assignment bit-identically).
  *    A reader resolves the pointer ONCE and derives query cell
  *    scores from EXACTLY the centroids its snapshot was built with.
  *
  * Recall tunes per QUERY with nProbe (no rebuild); cell count and
  * training iterations are build parameters. Results are identical to
  * [[Ivf.topkIvf]] with the same parameters — the training is
  * deterministic (decimal-exact averaging), spec-checked.
  */
object IvfIndex {

  private val cellsSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("v", ArrayType(DoubleType)),
    StructField("nrm", DoubleType),
    StructField("cell", IntegerType)))

  private[operators] def encode(cs: Seq[Array[Double]]): String =
    cs.map(_.mkString(",")).mkString(";")
  private[operators] def decode(s: String): Seq[Array[Double]] =
    s.split(";").toSeq.map(_.split(",").map(_.toDouble))

  /** Train centroids and publish the assigned corpus atomically under
    * `root` (single-writer by contract, like every SnapshotDir root). */
  def build(emb: DataFrame, root: String, nCentroids: Int = 16,
      iters: Int = 2, numBuckets: Int = 16): Unit = {
    val centroids = Ivf.trainCentroids(emb, nCentroids, iters)
    val cells = Similarity.prepared(emb)
      .select(col("vec_id"), col("v"), col("nrm"))
      .withColumn("cell", Ivf.assign(centroids))
    SnapshotDir.publishBucketed(cells, s"$root/cells",
      bucketCol = "cell", numBuckets = numBuckets,
      meta = Map("centroids" -> encode(centroids)))
  }

  /** Approximate top-k neighbors for each row of `queries`
    * ((query_id, embedding)): per query, pick the nProbe best cells by
    * centroid score, probe ONLY those inverted lists (bucketed corpus
    * side — no Exchange), exact cosine re-rank. */
  def topk(spark: SparkSession, root: String, queries: DataFrame,
      k: Int = 5, nProbe: Int = 4): DataFrame = {
    val cellsDir = SnapshotDir.currentDir(s"$root/cells")
      .getOrElse(sys.error(s"no IVF snapshot at $root"))
    val centroids = decode(SnapshotDir.metaAt(cellsDir).getOrElse("centroids",
      sys.error(s"IVF snapshot at $cellsDir lacks centroids meta")))
    val cells = SnapshotDir.readAt(spark, cellsDir, cellsSchema)

    val q = Similarity.prepared(
        queries.select(col("query_id").as("vec_id"), col("embedding")))
      .select(col("vec_id").as("query_id"), col("v"), col("nrm").as("qn"))
    val cellScores = array(centroids.map(c => Ivf.score(col("v"), c)): _*)
    val qCells = q
      .select(col("query_id"), col("v").as("qv"), col("qn"),
        posexplode(cellScores).as(Seq("cell", "cscore")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cscore").desc, col("cell"))))
      .filter(col("rnk") <= nProbe)
      .select("query_id", "qv", "qn", "cell")

    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id"))
    broadcast(qCells)
      .join(cells.select(col("vec_id").as("cand_id"), col("v").as("cv"),
        col("nrm").as("cn"), col("cell")), "cell")
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        (VectorOps.dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cosine"))
      // no distinct needed: the join key is the CANDIDATE's cell and
      // each candidate lives in exactly one, so a (query, candidate)
      // pair can only join once even though the query probes nProbe cells
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .orderBy("query_id", "rnk")
  }
}
