package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class IvfSpec extends SparkSpec {
  import spark.implicits._

  /** Three well-separated clusters of 64-dim vectors; queries are the
    * %50==0 ids (0, 50, 100). */
  private lazy val emb: DataFrame = {
    val rnd = new scala.util.Random(11)
    def jitter(base: Int): Array[Float] = {
      val a = Array.fill(64)(rnd.nextFloat() * 0.01f)
      a(base) = 1.0f; a(base + 1) = 1.0f; a
    }
    val rows =
      (Seq(0L) ++ (1L to 40L)).map(id => (id, jitter(0), 0)) ++        // cluster A
      (Seq(50L) ++ (51L to 90L)).map(id => (id, jitter(20), 1)) ++     // cluster B
      (Seq(100L) ++ (101L to 140L)).map(id => (id, jitter(40), 2))     // cluster C
    rows.toDF("vec_id", "embedding", "label")
  }

  test("trainCentroids is deterministic across invocations") {
    val c1 = Ivf.trainCentroids(emb, nCentroids = 6, iters = 2)
    val c2 = Ivf.trainCentroids(emb, nCentroids = 6, iters = 2)
    assert(c1.map(_.toSeq) == c2.map(_.toSeq))
  }

  test("topkIvf achieves full recall vs brute force on separated clusters") {
    val ivf = Ivf.topkIvf(emb, queryMod = 50L, k = 5, nCentroids = 6, nProbe = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    val brute = Similarity.topkBrute(emb, queryMod = 50L, k = 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))).toSet
    // with clear clusters + 3 probes over 6 cells, IVF must find the
    // same neighbors the exact scan finds
    val recall = (ivf intersect brute).size.toDouble / brute.size
    assert(recall >= 0.95, s"recall=$recall ivf=${ivf.size} brute=${brute.size}")
  }

  test("topkIvf output shape: k rows per query, ranked by cosine desc") {
    val out = Ivf.topkIvf(emb, queryMod = 50L, k = 3, nCentroids = 6, nProbe = 6)
    val perQuery = out.collect().groupBy(_.getAs[Long]("query_id"))
    assert(perQuery.keySet == Set(0L, 50L, 100L))
    perQuery.values.foreach { rows =>
      assert(rows.map(_.getAs[Int]("rnk")).sorted.toSeq == Seq(1, 2, 3))
      val cosines = rows.sortBy(_.getAs[Int]("rnk")).map(_.getAs[Double]("cosine"))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
  }
}
