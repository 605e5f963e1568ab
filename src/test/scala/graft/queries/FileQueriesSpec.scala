package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Semantics tests for the relational parity surface over a crafted
  * mini-index, pinning the reference behaviors that are easy to get
  * subtly wrong (dual duplicate-count semantics, extension edge cases,
  * histogram buckets). */
class FileQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** 8 rows: checksum c1 ×3, c2 ×2, unique c3, two NULLs (one empty). */
  private lazy val files: DataFrame = Seq(
    ("/a", "one.txt", "c1", ts("2024-01-01 00:00:00"), 100L),
    ("/a", "two.txt", "c1", ts("2024-01-02 00:00:00"), 100L),
    ("/b", "three.TXT", "c1", ts("2024-01-03 00:00:00"), 100L),
    ("/b", "four.tar.gz", "c2", ts("2024-02-01 00:00:00"), 2048L),
    ("/c", "five.tar.gz", "c2", ts("2024-02-02 00:00:00"), 2048L),
    ("/c", "six", "c3", ts("2024-03-01 00:00:00"), 5L),
    ("/d", "seven.log", null.asInstanceOf[String], ts("2024-04-01 00:00:00"), 100L),
    ("/d", "empty.dat", null.asInstanceOf[String], ts("2024-05-01 00:00:00"), 0L)
  ).toDF("path", "filename", "checksum", "modification_datetime", "file_size")

  test("keyset pagination: cursor walk == offset walk, and deletion-safe") {
    val req = SearchRequest(hasChecksum = Some(true)) // 6 rows
    val ordered = FileQueries.searchApiFiltered(files, req)
      .orderBy($"path", $"filename").collect().toSeq
    // walk ALL pages by cursor; concatenation must equal the total order
    var cursor: Option[(String, String)] = None
    var walked = Seq.empty[org.apache.spark.sql.Row]
    var page = FileQueries.searchKeyset(files, req, cursor, pageSize = 2).collect().toSeq
    while (page.nonEmpty) {
      walked ++= page
      cursor = Some((page.last.getAs[String]("path"), page.last.getAs[String]("filename")))
      page = FileQueries.searchKeyset(files, req, cursor, pageSize = 2).collect().toSeq
    }
    assert(walked == ordered)
    // keysetCursor agrees with the page's own last row
    assert(FileQueries.keysetCursor(files, req, None, pageSize = 2) ==
      Some((ordered(1).getAs[String]("path"), ordered(1).getAs[String]("filename"))))
    assert(FileQueries.keysetCursor(files, req, None, pageSize = 100) ==
      Some((ordered.last.getAs[String]("path"), ordered.last.getAs[String]("filename"))))
    // empty filtered set → no cursor
    assert(FileQueries.keysetCursor(files,
      SearchRequest(checksum = Some("nope")), None, 10).isEmpty)
    // DELETION SAFETY (the property offset pagination lacks): after
    // page 1 ([/a one.txt], [/a two.txt]) is processed and its rows
    // deleted, the SAME cursor still returns exactly the old page 2 —
    // while offset page 2 over the shrunk set has shifted.
    val afterP1 = Some((ordered(1).getAs[String]("path"), ordered(1).getAs[String]("filename")))
    val shrunk = files.filter(!($"path" === "/a")) // page-1 rows deleted
    val keysetP2 = FileQueries.searchKeyset(shrunk, req, afterP1, pageSize = 2).collect().toSeq
    assert(keysetP2 == ordered.slice(2, 4))
    val offsetP2 = FileQueries.searchApiFiltered(shrunk, req)
      .orderBy($"path", $"filename").offset(2).limit(2).collect().toSeq
    assert(offsetP2 != ordered.slice(2, 4)) // offset SKIPPED two live rows
  }

  test("duplicates: window form returns every member of >1 groups") {
    val d = FileQueries.duplicates(files).collect()
    assert(d.length == 5) // c1×3 + c2×2
    assert(d.map(_.getAs[Long]("group_size")).toSeq == Seq(3L, 3L, 3L, 2L, 2L))
  }

  test("dual duplicate-count semantics: CLI extras vs API all-members") {
    // CLI (indexer.py:884-887): with_checksum − unique_checksums = 6−3 = 3
    val cli = FileQueries.statsCli(files).collect().head
    assert(cli.getAs[Long]("files_with_checksum") == 6)
    assert(cli.getAs[Long]("unique_checksums") == 3)
    assert(cli.getAs[Long]("duplicate_files") == 3)
    // API (database.py:419-431): SUM of member counts over >1 groups = 3+2 = 5
    val api = FileQueries.duplicateStats(files).collect().head
    assert(api.getAs[Long]("duplicate_groups") == 2)
    assert(api.getAs[Long]("duplicate_files") == 5)
  }

  test("duplicateGroups: wasted_space = size * (count - 1); ordering by count desc") {
    val g = FileQueries.duplicateGroupSummaries(files, minGroupSize = 2).collect()
    assert(g.length == 2)
    assert(g(0).getAs[String]("checksum") == "c1" && g(0).getAs[Long]("wasted_space") == 200L)
    assert(g(1).getAs[String]("checksum") == "c2" && g(1).getAs[Long]("wasted_space") == 2048L)
    val members = FileQueries.duplicateGroups(files, 2, limit = 1, offset = 0)
    assert(members.count() == 3) // page of 1 group → its 3 members
  }

  test("patternDuplicates expands pattern matches to ALL copies database-wide") {
    // '%.tar.gz' matches four/five (c2) → both copies returned even though
    // the pattern itself matched both; '%one%' matches one.txt (c1) → all
    // THREE c1 copies incl. non-matching filenames (database.py:225-292).
    val viaOne = FileQueries.patternDuplicates(files, Some("%one%"), None)
    assert(viaOne.count() == 3)
    assert(viaOne.select("filename").collect().map(_.getString(0)).sorted.toSeq ==
      Seq("one.txt", "three.TXT", "two.txt"))
  }

  test("extension semantics: last-dot lowercased vs Go first-dot") {
    val last = FileQueries.extensionStats(files).collect()
      .map(r => r.getAs[String]("extension") -> r.getAs[Long]("file_count")).toMap
    // four.tar.gz → '.gz' (LAST dot, lowercased; three.TXT → '.txt')
    assert(last(".gz") == 2)
    assert(last(".txt") == 3)
    assert(last("(no extension)") == 1)
    val first = FileQueries.extensionStatsFirstDot(files).collect()
      .map(r => r.getAs[String]("extension") -> r.getAs[Long]("file_count")).toMap
    // Go keeps FIRST dot: '.tar.gz'; dotless → ''; case preserved
    assert(first(".tar.gz") == 2)
    assert(first(".TXT") == 1)
    assert(first("") == 1)
  }

  test("size histogram buckets and order") {
    val h = FileQueries.sizeHistogram(files).collect()
      .map(r => r.getAs[String]("size_range") -> r.getAs[Long]("file_count"))
    assert(h.toSeq == Seq("0 bytes" -> 1L, "< 1KB" -> 5L, "1KB - 1MB" -> 2L))
  }

  test("sizeCollisions: >1 file of same size AND ≥1 null checksum; empty excluded") {
    // size 100: files one/two/three (c1) + seven.log (null) → collision
    // size 2048: two files, no nulls → excluded
    // size 0: excluded by skipEmpty
    val c = FileQueries.sizeCollisions(files, skipEmpty = true).collect()
    assert(c.length == 1)
    assert(c.head.getAs[Long]("file_size") == 100L)
    assert(c.head.getAs[Long]("files_without_checksum") == 1L)
  }

  test("searchApi range + pagination") {
    val page = FileQueries.searchApi(files, SearchRequest(
      minSize = Some(10L), limit = 2, offset = 1)).collect()
    // size ≥ 10 → 6 rows, ordered mtime DESC: seven.log, five, four, three, two, one
    assert(page.map(_.getAs[String]("filename")).toSeq == Seq("five.tar.gz", "four.tar.gz"))
  }

  test("upsert: incoming wins on PK collision, new keys appended") {
    val incoming = Seq(
      ("/a", "one.txt", "NEW", ts("2024-06-01 00:00:00"), 999L),
      ("/z", "fresh.txt", "zz", ts("2024-06-02 00:00:00"), 1L)
    ).toDF("path", "filename", "checksum", "modification_datetime", "file_size")
    val merged = FileQueries.upsert(files, incoming)
    assert(merged.count() == 9)
    val one = merged.filter($"path" === "/a" && $"filename" === "one.txt").collect().head
    assert(one.getAs[String]("checksum") == "NEW")
  }

  test("cleanupCandidates is an exact anti join on the PK") {
    val live = files.filter($"path" =!= "/d")
    val gone = FileQueries.cleanupCandidates(files, live).collect()
    assert(gone.map(_.getAs[String]("filename")).sorted.toSeq == Seq("empty.dat", "seven.log"))
  }

  test("substring search is case-insensitive over filename OR path") {
    val hits = FileQueries.substringSearch(files, "txt")
    assert(hits.count() == 3) // one.txt, two.txt, three.TXT
  }

  test("existingProbeBloom == exact probe (no false negatives survive the verify join)") {
    val batch = files.filter($"filename".like("%.tar.gz") || $"filename" === "six")
    val exact = FileQueries.existingProbe(files, batch).collect().toSeq
    // force the bloom path (bloomMinKeys = 0) — results must be
    // identical to the exact probe regardless of which path runs
    val bloomed = FileQueries.existingProbeBloom(files, batch, bloomMinKeys = 0L)
      .collect().toSeq
    assert(bloomed == exact && exact.length == 3)
    // empty probe set still answers (empty), rather than erroring on a
    // zero-item bloom
    val none = files.filter($"filename" === "no-such-file")
    assert(FileQueries.existingProbeBloom(files, none).count() == 0)
    // the prefilter really is a scan-side Filter on the bloom
    // expression below the verify join (check the ANALYZED plan: over
    // a LocalRelation the optimizer legitimately folds the filter into
    // the local rows; on a parquet scan it stays as a scan filter)
    val plan = FileQueries.existingProbeBloom(files, batch, bloomMinKeys = 0L)
      .queryExecution.analyzed.toString
    assert(plan.contains("graft_bloom_contains"), plan)
  }

  test("existingProbeBloom size dispatch: sub-threshold probe sets take the broadcast path") {
    val batch = files.filter($"filename".like("%.tar.gz") || $"filename" === "six")
    // at the default threshold (2^20 keys) this 3-key probe must NOT
    // pay the bloom build — plan is the plain broadcast semi join
    val small = FileQueries.existingProbeBloom(files, batch)
    assert(!small.queryExecution.analyzed.toString.contains("graft_bloom_contains"))
    assert(small.collect().toSeq == FileQueries.existingProbe(files, batch).collect().toSeq)
    // the boundary is >=: exactly at bloomMinKeys the bloom path runs
    val atBoundary = FileQueries.existingProbeBloom(files, batch, bloomMinKeys = 3L)
    assert(atBoundary.queryExecution.analyzed.toString.contains("graft_bloom_contains"))
    // one key below the boundary falls through
    val below = FileQueries.existingProbeBloom(files, batch, bloomMinKeys = 4L)
    assert(!below.queryExecution.analyzed.toString.contains("graft_bloom_contains"))
  }
}
