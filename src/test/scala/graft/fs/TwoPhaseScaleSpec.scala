package graft.fs

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import graft.SparkSpec
import graft.queries.FileQueries

/** Scale-shaped pipeline test: 1000 files across 20 directories with a
  * ~5% duplicate-size rate — the population the reference's README
  * quotes its "~95% fewer hashes" number for (README.md:209-213).
  * Verifies the prefilter actually delivers that asymmetry and that
  * the resulting index answers the duplicate queries correctly. */
class TwoPhaseScaleSpec extends SparkSpec {

  private def mkTree(nFiles: Int): Path = {
    val root = Files.createTempDirectory("graft-scale")
    // Unique sizes for 95% of files (size = 100 + i, all distinct);
    // 5% collide: 10 groups of 5 files sharing content (and size).
    var i = 0
    while (i < nFiles * 95 / 100) {
      val d = root.resolve(s"dir${i % 20}")
      Files.createDirectories(d)
      // even sizes only — guaranteed disjoint from the odd dup size
      Files.write(d.resolve(s"u$i.dat"),
        ("x" * (100 + 2 * i)).getBytes(StandardCharsets.UTF_8))
      i += 1
    }
    for (g <- 0 until 10; c <- 0 until 5) {
      val d = root.resolve(s"dir${(g * 5 + c) % 20}")
      Files.createDirectories(d)
      // 211 bytes (odd): all 50 collide on size, 10 distinct contents
      Files.write(d.resolve(s"dup_g${g}_c$c.dat"),
        (s"group$g-" * 30 + "!").getBytes(StandardCharsets.UTF_8))
    }
    root
  }

  test("two-phase on 1000 files hashes only the ~5% size-colliding minority") {
    val root = mkTree(1000)
    val idx = Files.createTempDirectory("graft-scale-idx").toString
    val (p1, hashed) = Indexer.twoPhaseIndex(spark, root.toString, idx)
    assert(p1.scanned == 1000)
    // exactly the 50 duplicate-group files collide on size
    assert(hashed == 50, s"hashed=$hashed")

    val index = IndexStore.load(spark, idx.toString)
    val groups = FileQueries.duplicateGroupSummaries(index, minGroupSize = 2).collect()
    assert(groups.length == 10)
    assert(groups.forall(_.getAs[Long]("file_count") == 5))

    // CLI stats: 50 with checksum, 10 unique sums, 40 "extra" duplicates
    val stats = FileQueries.statsCli(index).collect().head
    assert(stats.getAs[Long]("files_with_checksum") == 50)
    assert(stats.getAs[Long]("unique_checksums") == 10)
    assert(stats.getAs[Long]("duplicate_files") == 40)
  }
}
