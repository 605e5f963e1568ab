package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkSpec
import graft.fs.FsScan

class FsMetaSourceSpec extends SparkSpec {

  test("V2 source returns the same rows as FsScan, partitioned by subtree") {
    val root = Files.createTempDirectory("graft-v2src")
    def w(rel: String, content: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    }
    w("top.txt", "root level")
    w("a/one.txt", "1"); w("a/two.txt", "22")
    w("b/deep/three.txt", "333")
    Files.createSymbolicLink(root.resolve("link.txt"), root.resolve("top.txt"))

    val v2 = spark.read.format("graft.sources.FsMetaSource")
      .option("path", root.toString).load()
    assert(v2.rdd.getNumPartitions == 3) // root + a + b
    val v2Rows = v2.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3))).toSet
    val scanRows = FsScan.scanDF(spark, root.toString).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("file_size"))).toSet
    assert(v2Rows == scanRows)
    assert(v2Rows.size == 4) // symlink excluded
  }

  test("V2 source supports column pruning-friendly projection and filters") {
    val root = Files.createTempDirectory("graft-v2src2")
    Files.write(root.resolve("f1.dat"), "abc".getBytes)
    Files.write(root.resolve("f2.dat"), "defgh".getBytes)
    val sizes = spark.read.format("graft.sources.FsMetaSource")
      .option("path", root.toString).load()
      .filter("file_size > 3").select("filename")
      .collect().map(_.getString(0))
    assert(sizes.toSeq == Seq("f2.dat"))
  }
}
