package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: every SparkEntry query on SPARK_GRAFT_SF_DIR, one
  * JSON line on stdout.
  *
  * Measurement rules:
  *  - `queryExecution.toRdd.count()` forces the FULL physical plan
  *    (a bare `df.count()` lets Catalyst collapse scans to metadata
  *    counts and prune projections — flattering and wrong);
  *  - one global warmup + per-query double-run (min reported) so JVM/
  *    codegen warmup lands on no query in particular and the numbers
  *    are stable run-to-run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      // operators cache their reusable artifacts (signature/bucket
      // tables); drop them between queries so no query is timed
      // against another query's warm cache
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // global warmup: spin the JVM + codegen + parquet reader once
    spark.range(1000000L).selectExpr("sum(id)").collect()
    SparkEntry.queries.keys.headOption.foreach(run)

    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { n =>
      val a = run(n); val b = run(n)
      n -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
