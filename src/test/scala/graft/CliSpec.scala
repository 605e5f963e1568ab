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

    val dups = graft.queries.FileQueries.duplicates(
      graft.fs.IndexStore.load(spark, db)).collect()
    assert(dups.map(_.getAs[String]("filename")).sorted.toSeq == Seq("x.txt", "y.txt"))
  }
}
