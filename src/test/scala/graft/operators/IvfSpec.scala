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

  test("native nearest-centroid assignment == composed argmax form") {
    import org.apache.spark.sql.functions.col
    val prep = Similarity.prepared(emb).select(col("vec_id"), col("v"))
    // 80 centroids — past the width where the composed form's codegen
    // degrades (the r11 10M-row catch); value identity must hold at
    // exactly the widths the native expression exists for. Derived
    // from corpus rows so ties between equal vectors are exercised.
    val cents = prep.orderBy("vec_id").limit(80)
      .collect().map(_.getSeq[Double](1).toArray).toSeq
    val a = prep.select(col("vec_id"), Ivf.assign(cents).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = prep.select(col("vec_id"), Ivf.assignComposed(cents).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
    assert(a.values.toSet.size > 1) // not vacuous: multiple cells in play
  }

  test("sampled training: deterministic, count-gated, and recall holds") {
    // under the threshold the sample is the identity — centroids are
    // byte-equal to an explicitly unbounded run (gate-SF stability)
    val full = Ivf.trainCentroids(emb, nCentroids = 6, iters = 2)
    try {
      spark.conf.set("graft.ivf.maxTrainRows", s"${Long.MaxValue}")
      assert(Ivf.trainCentroids(emb, nCentroids = 6, iters = 2)
        .map(_.toSeq) == full.map(_.toSeq))
      // forced sampling: deterministic across runs, and the sampled
      // centroids still separate the clusters (full recall on the
      // well-separated fixture — quality, not centroid identity)
      spark.conf.set("graft.ivf.maxTrainRows", "24")
      val s1 = Ivf.trainCentroids(emb, nCentroids = 6, iters = 2)
      val s2 = Ivf.trainCentroids(emb, nCentroids = 6, iters = 2)
      assert(s1.map(_.toSeq) == s2.map(_.toSeq))
      assert(s1.map(_.toSeq) != full.map(_.toSeq)) // the sample really engaged
      val got = Ivf.topkIvf(emb, queryMod = 50L, k = 5, nCentroids = 6, nProbe = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = Similarity.topkBrute(emb, queryMod = 50L, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == brute)
    } finally spark.conf.unset("graft.ivf.maxTrainRows")
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

  test("topkIvfQuantized keeps every neighbor inside the query's cluster") {
    // int8 resolution is 1/127 ≈ 0.8% of the max coordinate — the
    // fixture's 1% intra-cluster jitter sits AT that limit, so exact
    // within-cluster rank order may legitimately shift under codes.
    // What quantization must NOT lose is the coarse structure: with
    // separated clusters, all k neighbors of every query stay
    // cluster-mates (cross-cluster cosine ≈ 0 survives any 0.8% noise).
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Ivf.topkIvfQuantized(emb, queryMod = 50L, k = 5, nCentroids = 6, nProbe = 3)
      .collect()
    assert(rows.length == 15) // 3 queries × k
    rows.foreach { r =>
      val (q, c) = (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"))
      assert(labels(q) == labels(c), s"query $q got cross-cluster neighbor $c")
    }
  }

  test("recallCurve: monotone in nProbe, full probe exactly reproduces brute") {
    val r = Ivf.recallCurve(emb, queryMod = 50L, k = 5, nCentroids = 6,
      probes = Seq(1, 2, 3, 6)).collect().head
    assert(r.getAs[Long]("n_probes_tested") == 4L)
    assert(r.getAs[Boolean]("monotone_ok"))
    assert(r.getAs[Boolean]("full_probe_exact"))
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
