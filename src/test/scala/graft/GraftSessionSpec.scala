package graft

import graft.SparkSpec

class GraftSessionSpec extends SparkSpec {
  import spark.implicits._

  test("configure sets the scale knobs and registers graft_* SQL functions") {
    GraftSession.configure(spark)
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(spark.conf.get("spark.sql.parquet.aggregatePushdown") == "true")
    // the SQL surface sees the native expressions
    val d = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    d.createOrReplaceTempView("gs_vecs")
    val dot = spark.sql("SELECT graft_dot(a, b) AS d FROM gs_vecs")
      .collect().head.getDouble(0)
    assert(dot == 11.0)
    // idempotent: configuring twice neither throws nor changes results
    GraftSession.configure(spark)
    assert(spark.sql("SELECT graft_dot(a, b) FROM gs_vecs")
      .collect().head.getDouble(0) == 11.0)
  }

  test("builder carries the runtime confs (smoke, no new context)") {
    // builder() must at minimum be constructible and hold the confs;
    // a second SparkContext can't exist in this JVM, so the full
    // withExtensions path is exercised by cluster deploys and the
    // GraftExtensions SQL-bridge tests instead
    val b = GraftSession.builder()
    assert(b != null)
  }
}
