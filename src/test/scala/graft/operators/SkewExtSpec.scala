package graft.operators

import org.apache.spark.sql.functions._

/** Skew tools + SQL-registered native functions. */
class SkewExtSpec extends graft.SparkSpec {

  test("saltedAgg equals direct groupBy on a skewed distribution") {
    import spark.implicits._
    // hot key 'a' = 10k rows, long tail of 100 keys
    val rows = (1 to 10000).map(i => ("a", i.toLong)) ++
      (1 to 100).flatMap(k => (1 to 10).map(i => (s"k$k", i.toLong)))
    val df = rows.toDF("key", "v")
    val direct = df.groupBy("key").agg(count(lit(1)).as("n"), sum("v").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = SkewTools.saltedAgg(df, col("key"), col("v"), saltBuckets = 16)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("saltedJoinCount equals direct join-count") {
    import spark.implicits._
    val fact = ((1 to 5000).map(_ => "hot") ++ (1 to 50).map(i => s"k${i % 7}"))
      .toDF("key")
    val dim = Seq("hot", "k0", "k3").toDF("key")
    val direct = fact.join(dim, "key").groupBy("key").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = SkewTools.saltedJoinCount(fact, dim, "key", saltBuckets = 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == direct)
  }

  test("native expressions callable from raw SQL after registration") {
    import spark.implicits._
    org.apache.spark.sql.GraftSqlBridge.registerGraftFunctions(spark)
    Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    assert(spark.sql("SELECT graft_dot(a, b) AS d FROM vecs").collect().head.getDouble(0) == 32.0)
    val sh = spark.sql(
      "SELECT graft_simhash(transform(split('the quick fox', ' '), t -> md5(t))) AS s")
      .collect().head.getLong(0)
    assert(sh >= 0 && sh <= 0xFFFFFFFFL)
    val wm = spark.sql("SELECT graft_winnow_min('hello world', 5) AS w")
      .collect().head.getString(0)
    assert(wm.matches("[0-9a-f]{32}"))
    val mh = spark.sql("SELECT graft_minhashes(array('x','y'), 3) AS m")
      .collect().head.getSeq[String](0)
    assert(mh.length == 3 && mh.forall(_.matches("[0-9a-f]{32}")))
  }
}
