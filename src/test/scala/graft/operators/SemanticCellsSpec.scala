package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SemDeDup cell-blocking semantics: within-cell pairs are EXACTLY the
  * brute pairs whose endpoints share a cell (no extra, no missing),
  * and on clustered data — the regime SemDeDup is built for — cell
  * blocking covers ~all of the true pair set. */
class SemanticCellsSpec extends SparkSpec {
  import spark.implicits._

  // 3 tight clusters of 8 vectors each around orthogonal axes: near-dup
  // pairs exist only inside a cluster, k-means must separate them.
  // Ids INTERLEAVE clusters (vec_id % 3 = cluster) — the trainer seeds
  // from the first k ids, so id-correlated clusters would hand it k
  // seeds from one cluster (the caller's contract: don't feed the
  // seeder id-sorted near-identical rows; interleave or pre-shuffle).
  private lazy val clustered = {
    val rows = for {
      c <- 0 until 3
      i <- 0 until 8
    } yield {
      val base = Array.fill(64)(0.01f)
      base(c * 20) = 1.0f
      base((c * 20 + 1) % 64) = 0.1f + 0.01f * i // slight within-cluster spread
      ((i * 3 + c).toLong, base)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("cell pairs = brute pairs restricted to co-cell endpoints; full coverage on clustered data") {
    val brute = Similarity.cosinePairsBlocked(clustered, threshold = 0.9)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cells = Similarity.semanticPairsCells(clustered, threshold = 0.9, nCentroids = 3)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture must produce near-dup pairs")
    // on well-separated clusters with k = #clusters, nothing is lost
    assert(cells == brute)
    OpCaches.releaseAll()
  }

  test("semanticPairsCells is empty-safe") {
    val emptyEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.semanticPairsCells(emptyEmb, 0.5).count() == 0)
    OpCaches.releaseAll()
  }

  test("labelCentroidCosine flags a planted outlier and scores inliers high") {
    val rows = (0 until 10).map { i =>
      val v = Array.fill(64)(0.01f); v(0) = 1.0f
      (i.toLong, v, 1)
    } :+ {
      val v = Array.fill(64)(0.01f); v(32) = -1.0f // opposed direction, same label
      (10L, v, 1)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val scored = Similarity.labelCentroidCosine(emb, outlierBelow = 0.5)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("cent_cos"), r.getAs[Boolean]("is_outlier"))).toMap
    assert(scored(10L)._2, "opposed vector must be an outlier")
    (0 until 10).foreach(i => assert(!scored(i.toLong)._2, s"inlier $i misflagged"))
    assert(scored(0L)._1 > 0.9)
  }

  test("labelCentroidCosine centroid sums are partitioning-invariant") {
    val emb = clustered.withColumn("label", (col("vec_id") % 3).cast("int"))
    val a = Similarity.labelCentroidCosine(emb).collect().map(_.toSeq).toSeq
    val b = Similarity.labelCentroidCosine(emb.repartition(7)).collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
