package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.fs.IndexStore

class IndexStreamSpec extends SparkSpec {
  import spark.implicits._

  private def row(path: String, name: String, sum: String, t: Long) =
    (path, name, sum, new Timestamp(t), 10L, new Timestamp(t))

  test("continuousIndex folds staged scan events into the snapshot with last-wins") {
    val staging = Files.createTempDirectory("graft-staging")
    val idx = Files.createTempDirectory("graft-stream-idx")
    val ckpt = Files.createTempDirectory("graft-ckpt")
    val cols = Seq("path", "filename", "checksum", "modification_datetime",
      "file_size", "indexed_at")

    // batch 1: two files
    Seq(row("/d", "a.txt", "v1", 1000000L), row("/d", "b.txt", "v1", 1000000L))
      .toDF(cols: _*).write.mode("append").parquet(staging.toString)
    val q1 = IndexStream.continuousIndex(spark, staging.toString, idx.toString, ckpt.toString)
    q1.awaitTermination(60000)
    assert(IndexStore.load(spark, idx.toString).count() == 2)

    // batch 2: update a.txt (newer indexed_at), add c.txt
    Seq(row("/d", "a.txt", "v2", 2000000L), row("/d", "c.txt", "v1", 2000000L))
      .toDF(cols: _*).write.mode("append").parquet(staging.toString)
    val q2 = IndexStream.continuousIndex(spark, staging.toString, idx.toString, ckpt.toString)
    q2.awaitTermination(60000)

    val rows = IndexStore.load(spark, idx.toString).collect()
      .map(r => r.getAs[String]("filename") -> r.getAs[String]("checksum")).toMap
    assert(rows == Map("a.txt" -> "v2", "b.txt" -> "v1", "c.txt" -> "v1"))
  }
}
