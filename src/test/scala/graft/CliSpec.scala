package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

class CliSpec extends SparkSpec {

  test("parseArgs handles --key value and bare flags") {
    assert(Cli.parseArgs(List("--db", "/x", "--stats")) == Map("db" -> "/x", "stats" -> ""))
    assert(Cli.parseArgs(List("--search", "foo.txt")) == Map("search" -> "foo.txt"))
    assertThrows[RuntimeException](Cli.parseArgs(List("oops")))
  }

  test("scan → stats → search → duplicates end-to-end through the CLI surface") {
    val root = Files.createTempDirectory("graft-cli")
    Files.write(root.resolve("x.txt"), "same".getBytes(StandardCharsets.UTF_8))
    Files.write(root.resolve("y.txt"), "same".getBytes(StandardCharsets.UTF_8))
    Files.write(root.resolve("z.log"), "other".getBytes(StandardCharsets.UTF_8))
    val db = Files.createTempDirectory("graft-cli-db").toString

    Cli.run(spark, db, Map("scan" -> root.toString))
    Cli.run(spark, db, Map("stats" -> ""))           // must not throw
    Cli.run(spark, db, Map("find-duplicates" -> "")) // must not throw
    Cli.run(spark, db, Map("sql" -> "SELECT COUNT(*) AS n FROM files"))
    Cli.run(spark, db, Map("manifest" -> "")) // must not throw
    // the CLI surfaces the same live base row the guards read
    val coreRows = graft.fs.IndexManifest.entries(Seq(graft.fs.IndexManifest.core(db)))
    assert(coreRows.exists(e => e.component == "index" && e.entry == "base" && e.live))

    val dups = graft.queries.FileQueries.duplicates(
      graft.fs.IndexStore.load(spark, db)).collect()
    assert(dups.map(_.getAs[String]("filename")).sorted.toSeq == Seq("x.txt", "y.txt"))
  }

  test("multi-criteria search flags map to searchFiles semantics") {
    val root = Files.createTempDirectory("graft-cli2")
    Files.createDirectories(root.resolve("sub"))
    Files.write(root.resolve("a.txt"), "same".getBytes(StandardCharsets.UTF_8))
    Files.write(root.resolve("sub/b.txt"), "same".getBytes(StandardCharsets.UTF_8))
    Files.write(root.resolve("sub/c.log"), "".getBytes(StandardCharsets.UTF_8)) // empty → NULL checksum
    val db = Files.createTempDirectory("graft-cli2-db").toString
    Cli.run(spark, db, Map("scan" -> root.toString))
    val files = graft.fs.IndexStore.load(spark, db)
    val checksum = files.filter(org.apache.spark.sql.functions.col("filename") === "a.txt")
      .select("checksum").collect().head.getString(0)

    // each flag routes to the same predicate searchFiles applies
    def search(opts: Map[String, String]) = {
      Cli.run(spark, db, opts) // the CLI path itself must not throw
      opts // and the equivalent query gives the expected rows:
    }
    search(Map("search-path" -> s"%sub%"))
    assert(graft.queries.FileQueries.searchFiles(files, pathPattern = Some("%sub%"))
      .collect().map(_.getAs[String]("filename")).sorted.toSeq == Seq("b.txt", "c.log"))
    search(Map("search-checksum" -> checksum))
    assert(graft.queries.FileQueries.searchFiles(files, checksum = Some(checksum))
      .collect().map(_.getAs[String]("filename")).sorted.toSeq == Seq("a.txt", "b.txt"))
    search(Map("search-no-checksum" -> ""))
    assert(graft.queries.FileQueries.searchFiles(files, hasChecksum = Some(false))
      .collect().map(_.getAs[String]("filename")).toSeq == Seq("c.log"))
    search(Map("search-has-checksum" -> "", "search-filename" -> "%.txt"))
    assert(graft.queries.FileQueries.searchFiles(files,
        filenamePattern = Some("%.txt"), hasChecksum = Some(true))
      .collect().map(_.getAs[String]("filename")).sorted.toSeq == Seq("a.txt", "b.txt"))
  }
}
