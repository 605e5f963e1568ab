package graft.serve

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkSpec
import graft.tables.Tables

/** Endpoint smoke tests for the thin HTTP layer: the query semantics
  * behind every endpoint are oracle-gated elsewhere (fi_search_api,
  * fi_search_page_meta, fi_duplicate_groups, fi_dup_page_meta,
  * fi_stats_api, fi_visualization); these tests check the TRANSPORT —
  * routing, parameter parsing (GET and flat-JSON POST), response
  * assembly, and error mapping. */
class ApiServerSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val server =
    new ApiServer(spark, () => Tables.files(spark, sfDir), sfDir, port = 0).start()
  private lazy val client = HttpClient.newHttpClient()

  private def get(path: String): (Int, String) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${server.boundPort}$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def post(path: String, body: String): (Int, String) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${server.boundPort}$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body))
        .header("Content-Type", "application/json").build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("health reports connected with the corpus size") {
    val (code, body) = get("/health/")
    assert(code == 200)
    assert(body.contains("\"status\": \"healthy\""))
    assert(body.contains("\"database_connected\": true"))
    val n = Tables.files(spark, sfDir).count()
    assert(body.contains(s""""total_files": $n"""))
  }

  test("GET /search/ pages and reports has_more with the gated math") {
    val (code, body) = get("/search/?filename_pattern=%255.txt&limit=3&offset=0")
    assert(code == 200)
    assert(body.contains("\"files\": ["))
    assert(body.contains("\"total_count\":"))
    // 3-row page of a larger result set → more pages exist
    assert("\"filename\":".r.findAllIn(body).size == 3)
    assert(body.contains("\"has_more\": true"))
    // a filter nothing matches → empty page, no more
    val (c2, b2) = get("/search/?filename_pattern=zzz-nope&limit=5")
    assert(c2 == 200 && b2.contains("\"files\": []") && b2.contains("\"has_more\": false"))
  }

  test("keyset /search/: cursor walk covers the offset order, deletion-safe shape") {
    import graft.queries.{FileQueries, SearchRequest}
    // ground truth: the full filtered set in keyset order
    val all = FileQueries.searchApiFiltered(
        Tables.files(spark, sfDir), SearchRequest(filenamePattern = Some("%5.txt")))
      .orderBy(org.apache.spark.sql.functions.col("path"),
        org.apache.spark.sql.functions.col("filename"))
      .select("path", "filename").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(all.size > 6) // multi-page walk, not vacuous
    // walk by cursor; concatenated filenames must equal the total order
    var walked = Seq.empty[String]
    var cursor: Option[(String, String)] = None
    var more = true
    while (more) {
      val q = cursor.map { case (cp, cf) =>
        s"&cursor_path=${java.net.URLEncoder.encode(cp, "UTF-8")}" +
          s"&cursor_filename=${java.net.URLEncoder.encode(cf, "UTF-8")}"
      }.getOrElse("")
      val (code, body) = get(s"/search/?filename_pattern=%255.txt&limit=3&keyset=true$q")
      assert(code == 200)
      assert(!body.contains("total_count")) // no O(corpus) count in keyset mode
      // next_cursor is the page's last row (or null on the empty tail)
      if (body.contains("\"next_cursor\": null")) more = false
      else {
        // files array only — the cursor repeats the last filename
        val filesPart = body.substring(0, body.indexOf("\"next_cursor\""))
        walked ++= """"filename": ?"([^"]+\.txt)"""".r
          .findAllMatchIn(filesPart).map(_.group(1)).toSeq
        val curPath = """"next_cursor": \{"path": "([^"]*)"""".r
          .findFirstMatchIn(body).map(_.group(1)).get
        val curFile = """"next_cursor": \{"path": "[^"]*", "filename": "([^"]*)"""".r
          .findFirstMatchIn(body).map(_.group(1)).get
        cursor = Some((curPath, curFile))
        more = body.contains("\"has_more\": true")
      }
    }
    // page-by-page filenames in order == the total keyset order
    assert(walked == all.map(_._2))
    // one-sided cursor → 400
    val (c400, b400) = get("/search/?keyset=true&cursor_path=/data")
    assert(c400 == 400 && b400.contains("together"))
  }

  test("POST /search/ accepts the reference's flat JSON request model") {
    val (code, body) = post("/search/",
      """{"filename_pattern": "%5.txt", "has_checksum": true, "limit": 2, "offset": 1}""")
    assert(code == 200)
    assert("\"filename\":".r.findAllIn(body).size == 2)
    assert(body.contains("\"has_more\": true"))
  }

  test("GET /duplicates/ returns nested groups with totals") {
    val (code, body) = get("/duplicates/?min_group_size=2&limit=5")
    assert(code == 200)
    assert(body.contains("\"duplicate_groups\": ["))
    assert(body.contains("\"wasted_space\":"))
    assert(body.contains("\"files\":[")) // nested member structs
    assert(body.contains("\"total_groups\":"))
    assert(body.contains("\"total_duplicate_files\":"))
  }

  test("keyset /duplicates/: cursor walk covers the group order, deletion-safe shape") {
    import graft.queries.FileQueries
    // ground truth: every group summary in the group total order
    val all = FileQueries.duplicateGroupSummaries(
        Tables.files(spark, sfDir), minGroupSize = 2)
      .select("checksum").collect().map(_.getString(0)).toSeq
    assert(all.size > 6) // multi-page walk, not vacuous
    var walked = Seq.empty[String]
    var cursor: Option[(Long, Long, String)] = None
    var more = true
    while (more) {
      val q = cursor.map { case (cc, cs, ck) =>
        s"&cursor_count=$cc&cursor_size=$cs" +
          s"&cursor_checksum=${java.net.URLEncoder.encode(ck, "UTF-8")}"
      }.getOrElse("")
      val (code, body) = get(s"/duplicates/?limit=3&keyset=true$q")
      assert(code == 200)
      assert(!body.contains("total_groups")) // no O(corpus) count in keyset mode
      if (body.contains("\"next_cursor\": null")) more = false
      else {
        val groupsPart = body.substring(0, body.indexOf("\"next_cursor\""))
        walked ++= """"checksum":"([0-9a-f]{32})"""".r
          .findAllMatchIn(groupsPart).map(_.group(1)).toSeq
        val m = ("""\"next_cursor\": \{\"file_count\": (\d+), \"file_size\": (\d+),\s*""" +
          """\"checksum\": \"([^\"]+)\"""").r.findFirstMatchIn(body)
        assert(m.isDefined, body.takeRight(400))
        cursor = m.map(g => (g.group(1).toLong, g.group(2).toLong, g.group(3)))
        more = body.contains("\"has_more\": true")
      }
    }
    assert(walked == all)
    // partial cursor triple → 400
    val (c400, b400) = get("/duplicates/?keyset=true&cursor_count=3")
    assert(c400 == 400 && b400.contains("together"))
  }

  test("POST /duplicates/ with a pattern expands to all copies database-wide") {
    val (code, body) = post("/duplicates/",
      """{"filename_pattern": "%5.txt", "min_group_size": 2, "limit": 3}""")
    assert(code == 200)
    assert(body.contains("\"duplicate_groups\": ["))
  }

  test("/stats/ serves the DatabaseStats shape") {
    val (code, body) = get("/stats/")
    assert(code == 200, body)
    for (k <- Seq("total_files", "total_size", "files_with_checksums",
        "files_without_checksums", "duplicate_files", "duplicate_groups",
        "average_file_size", "largest_file_size", "smallest_file_size",
        "most_recent_modification", "oldest_modification", "unique_directories"))
      assert(body.contains(s""""$k":"""), s"missing $k in $body")
  }

  test("/stats/visualization serves all three chart sections") {
    val (code, body) = get("/stats/visualization")
    assert(code == 200)
    assert(body.contains("\"size_distribution\": ["))
    assert(body.contains("\"extension_stats\": ["))
    assert(body.contains("\"modification_timeline\": ["))
    assert(body.contains("\"size_range\":"))
  }

  test("invalid parameters map to 400 with an error body") {
    val (code, body) = get("/search/?limit=0")
    assert(code == 400)
    assert(body.contains("\"error\":"))
    val (c2, _) = get("/duplicates/?min_group_size=1")
    assert(c2 == 400)
    val (c3, b3) = get("/search/?limit=notanumber")
    assert(c3 == 400 && b3.contains("integer"))
    // boolean coercion: FastAPI-style spellings work, garbage is a 400
    // (never a silent false, which would INVERT a has_checksum filter)
    val (c4, b4) = get("/search/?has_checksum=True&limit=1")
    assert(c4 == 200 && !b4.contains("\"checksum\":null"), b4)
    val (c5, _) = get("/search/?has_checksum=maybe")
    assert(c5 == 400)
  }

  test("unknown paths under a context prefix are 404, not mis-served") {
    assert(get("/searchfoo")._1 == 404)      // raw prefix of /search
    assert(get("/statsX")._1 == 404)         // raw prefix of /stats
    assert(get("/search/extra")._1 == 404)
    assert(get("/search")._1 == 200)         // both spellings serve
    assert(get("/stats")._1 == 200)
  }

  test("concurrent requests are served in parallel (pool), all successfully") {
    import java.util.concurrent.Executors
    val pool = Executors.newFixedThreadPool(4)
    try {
      val futures = (1 to 8).map { i =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int =
            if (i % 2 == 0) get("/health/")._1
            else get("/search/?filename_pattern=%255.txt&limit=2")._1
        })
      }
      assert(futures.map(_.get()).forall(_ == 200))
    } finally pool.shutdown()
  }

  test("range and datetime validation happens BEFORE any narrowing") {
    // (4294967396L).toInt == 100 — must 400, not silently serve a page
    val (c1, _) = get("/search/?limit=4294967396")
    assert(c1 == 400)
    val (c2, _) = get("/search/?offset=4294967296")
    assert(c2 == 400)
    val (c3, _) = get("/duplicates/?min_group_size=4294967298")
    assert(c3 == 400)
    // an unparsable datetime must 400, not NULL-filter every row to
    // an empty-but-200 result
    val (c4, b4) = get("/search/?modified_after=not-a-date")
    assert(c4 == 400, b4)
    val (c5, _) = get("/search/?modified_after=2024-01-01%2010:00:00")
    assert(c5 == 200)
  }

  test("flat JSON body parsing: strings, numbers, bools, nulls, escapes") {
    val m = ApiServer.flatJson(
      """{"a": "x\"y", "n": 42, "b": true, "z": null, "u": "A", "e": -1.5e-3}""")
    assert(m("a") == "x\"y")
    assert(m("n") == "42")
    assert(m("b") == "true")
    // JSON null = Optional-not-set (dropped); the STRING "null" is a value
    assert(!m.contains("z"))
    assert(ApiServer.flatJson("""{"s": "null"}""")("s") == "null")
    assert(m("u") == "A")
    assert(m("e") == "-1.5e-3") // exponent signs survive the number token
  }

  test("flat JSON ignores keys nested inside sub-objects and arrays") {
    val m = ApiServer.flatJson(
      """{"limit": 5, "metadata": {"min_size": 999, "deep": {"limit": 7}},
        | "tags": ["min_size", 3], "offset": 1}""".stripMargin)
    assert(m("limit") == "5")
    assert(m("offset") == "1")
    // the nested min_size/limit must NOT leak into the flat params
    assert(!m.contains("min_size"))
    // a string value containing braces is not structure
    assert(ApiServer.flatJson("""{"p": "a{b}c", "q": 1}""") ==
      Map("p" -> "a{b}c", "q" -> "1"))
  }
}
