package graft.fs

import java.sql.Timestamp

import graft.SparkSpec

/** Proves the co-located-join property: equal bucketing on the join
  * key eliminates the shuffle entirely (no Exchange in the physical
  * plan) — the layout that makes repeated duplicate-detection joins
  * affordable at 100 TB. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-checksum tables join with no shuffle") {
    val t = new Timestamp(1700000000000L)
    def mk(n: Int) = (1 to n).map(i =>
      (s"/d${i % 7}", s"f$i.dat", s"sum${i % 13}", t, i.toLong, t))
      .toDF("path", "filename", "checksum", "modification_datetime", "file_size", "indexed_at")
    for (t <- Seq("bkt_a", "bkt_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc).sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    IndexStore.publishBucketed(mk(200), "bkt_a", "checksum", numBuckets = 8)
    IndexStore.publishBucketed(mk(150), "bkt_b", "checksum", numBuckets = 8)

    // force a shuffle-family join (tiny test tables would broadcast
    // and hide the property we're proving; at 100 TB neither side
    // broadcasts and SMJ is the real strategy)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "checksum")
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"expected shuffle-free co-located join, plan was:\n$physical")
      assert(joined.count() > 0)

      // contrast: the same join on unbucketed data shuffles both sides
      val plain = mk(200).join(mk(150), "checksum")
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
