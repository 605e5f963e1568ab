package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.{FilesCte, Tables}

/** Concrete, parameterized instances of every SURVEY.md §2 operator,
  * paired 1:1 with DuckDB oracle SQL over the same parquet testdata.
  * Every query has a total output ordering (oracle hash compare).
  * Naming convention: `fi_*` = file-indexer parity surface.
  */
object ParityQueries {
  import FileQueries._

  private def files(s: SparkSession, d: String): DataFrame = Tables.files(s, d)

  /** Deterministic anchor replacing the reference's CURRENT_DATE
    * (api_backend database.py:523) — data spans 1995-01..2001-08. */
  private val TimelineAsOf = "2001-08-01 00:00:00"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B1 — multi-criteria search (indexer.py:697-749)
    "fi_search_filename" -> ((s, d) =>
      searchFiles(files(s, d), filenamePattern = Some("%5.txt"),
        pathPattern = Some("/data/d1%"), hasChecksum = Some(true))),
    // B5 — point lookup (filename is unique in the synthesized view)
    "fi_point_lookup" -> ((s, d) =>
      searchFiles(files(s, d), filenamePattern = Some("order_101.log"))),
    // B2 — API search with ranges + pagination (database.py:56-142)
    "fi_search_api" -> ((s, d) =>
      searchApi(files(s, d), SearchRequest(
        minSize = Some(1000000L), maxSize = Some(900000000L),
        modifiedAfter = Some("1996-01-01 00:00:00"),
        modifiedBefore = Some("2000-12-31 23:59:59"),
        limit = 100, offset = 50))),
    // B2 at scale — keyset-cursor pagination (indexer.py:1078-1101):
    // page 2 fetched through the deletion-safe (path, filename) >
    // (cursor) predicate, where the cursor is page 1's last row (a
    // bounded 1-row driver read, the reference's last_path/last_filename
    // state). The oracle re-derives the cursor AND the keyset predicate
    // independently in SQL, so the hash pins the cursor semantics, not
    // just the row set.
    "fi_search_keyset" -> ((s, d) => {
      val req = SearchRequest(
        minSize = Some(1000000L), maxSize = Some(900000000L),
        modifiedAfter = Some("1996-01-01 00:00:00"),
        modifiedBefore = Some("2000-12-31 23:59:59"))
      val f = files(s, d)
      val cursor = keysetCursor(f, req, after = None, pageSize = 50)
      searchKeyset(f, req, cursor, pageSize = 50)
    }),
    // B3/B4 — Go case-insensitive substring search (database.go:116-147)
    "fi_search_substring" -> ((s, d) =>
      substringSearch(files(s, d), "ORDER_11")),
    // B6 — list all (database.go:150-180)
    "fi_list_all" -> ((s, d) => listAll(files(s, d))),
    // B7 — null-checksum scan per size group (indexer.py:1534-1541);
    // 610929 = 33^3 * 17 (bucket 33)
    "fi_null_checksum_by_size" -> ((s, d) =>
      nullChecksumBySize(files(s, d), 610929L)),
    // B8 — bulk existence probe as broadcast semi join (indexer.py:228-266)
    "fi_existing_probe" -> ((s, d) => {
      val f = files(s, d)
      existingProbe(f, f.filter(col("filename").like("%.log")))
    }),
    // B8 at scale — bloom-prefiltered probe: distributed bloom build,
    // scan-side membership filter, exact verify join over survivors.
    // Identical rows to fi_existing_probe (no false negatives), so it
    // shares that oracle.
    "fi_existing_probe_bloom" -> ((s, d) => {
      val f = files(s, d)
      existingProbeBloom(f, f.filter(col("filename").like("%.log")))
    }),
    // C1 — duplicate finder, window form (indexer.py:751-794)
    "fi_duplicates" -> ((s, d) => duplicates(files(s, d))),
    // C2/D11 — duplicate groups + members + wasted_space (database.py:294-379)
    "fi_duplicate_groups" -> ((s, d) =>
      duplicateGroups(files(s, d), minGroupSize = 2, limit = 100, offset = 0)),
    // C2 group summaries only
    "fi_duplicate_group_summaries" -> ((s, d) =>
      duplicateGroupSummaries(files(s, d), minGroupSize = 3)),
    // C2 keyset — group page 2 resumed by the page-1 cursor (count
    // DESC, size DESC, checksum): the deep-walk shape that stays
    // O(page) per request where OFFSET re-ranks O(offset + page)
    "fi_dup_keyset" -> ((s, d) => {
      val f = files(s, d)
      val cursor = duplicateGroupsCursor(f, minGroupSize = 2,
        after = None, pageSize = 40)
      duplicateGroupSummariesKeyset(f, minGroupSize = 2, cursor, pageSize = 40)
    }),
    // C3 — pattern → checksum expansion (database.py:225-292)
    "fi_pattern_duplicates" -> ((s, d) =>
      patternDuplicates(files(s, d), Some("%.txt"), None)),
    // C4 — cleanup anti join (indexer.py:1028-1291)
    "fi_cleanup_candidates" -> ((s, d) => {
      val f = files(s, d)
      val live = f.filter(col("path") =!= "/data/d7" && !col("filename").like("%99%"))
      cleanupCandidates(f, live)
    }),
    // F — set operations (engine surface; the reference expresses set
    // semantics only via joins): directories containing .txt files
    // INTERSECT those containing .log files, minus (EXCEPT) those
    // containing files over 1 GiB.
    "fi_setops" -> ((s, d) => {
      val f = files(s, d)
      val txtDirs = f.filter(col("filename").like("%.txt")).select("path").distinct()
      val logDirs = f.filter(col("filename").like("%.log")).select("path").distinct()
      val bigDirs = f.filter(col("file_size") > 1073741824L).select("path").distinct()
      txtDirs.intersect(logDirs).except(bigDirs).orderBy("path")
    }),
    // G3's diff join in oracle-checked form: full-outer on the PK with
    // new/deleted/common classification and per-status counts.
    "fi_diff_classify" -> ((s, d) => {
      val f = files(s, d)
      val index = f.filter(col("filename").like("%.txt") || col("filename").like("%.dat"))
        .select(col("path"), col("filename"), lit(1).as("_idx"))
      val scan = f.filter(col("filename").like("%.dat") || col("filename").like("%.log"))
        .select(col("path"), col("filename"), lit(1).as("_scan"))
      index.join(scan, Seq("path", "filename"), "full_outer")
        .withColumn("status",
          when(col("_idx").isNull, "new")
            .when(col("_scan").isNull, "deleted")
            .otherwise("unchanged"))
        .groupBy("status").agg(count(lit(1)).as("n"))
        .orderBy("status")
    }),
    // Multi-dimensional aggregation (engine extension): ROLLUP over
    // (path, extension) — subtotal rows carry NULL dimensions; the
    // grouping-id column disambiguates "real NULL" from "rolled up"
    // and makes the ordering total. NULLS FIRST pinned explicitly
    // (Spark defaults NULLS FIRST, DuckDB NULLS LAST).
    "fi_rollup" -> ((s, d) =>
      files(s, d).withColumn("extension", FileQueries.extLastDot)
        .rollup(col("path"), col("extension"))
        .agg(count(lit(1)).as("file_count"),
          coalesce(sum(col("file_size")), lit(0L)).as("total_size"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), col("path").asc_nulls_first,
          col("extension").asc_nulls_first)),
    // Pivot (engine extension): per-user event-type counts as columns.
    // Expressed as conditional aggregation on BOTH engines (identical
    // semantics; Spark's pivot() compiles to the same plan shape).
    "ev_pivot" -> ((s, d) => {
      val ev = Tables.events(s, d)
      ev.groupBy(col("user_id"))
        .agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_click"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("n_view"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchase"),
          sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("n_signup"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_error"))
        .orderBy("user_id")
    }),
    // Quantiles of the size distribution (engine extension): Spark's
    // exact `percentile` and DuckDB's `quantile_cont` share linear
    // interpolation — bit-identical on integer inputs. Scalar DOUBLE
    // columns (not an array) — the driver's compare can't sort arrays.
    "fi_size_percentiles" -> ((s, d) =>
      files(s, d).agg(
        expr("percentile(file_size, 0.25D)").as("p25"),
        expr("percentile(file_size, 0.5D)").as("p50"),
        expr("percentile(file_size, 0.75D)").as("p75"),
        expr("percentile(file_size, 0.9D)").as("p90"),
        expr("percentile(file_size, 0.37D)").as("size_p37"))),
    // Approximate percentiles — the 100 TB path for the quantile
    // surface: exact `percentile` buffers every value per group (a
    // full sort's worth of memory), while `approx_percentile` is a
    // one-pass mergeable quantile summary with a rated rank error of
    // 1/accuracy. Contract row (same pattern as fi_stats_approx):
    // exact values hash-compare against DuckDB's quantile_cont, and
    // booleans assert the sketch landed within 10% relative value
    // error — far above accuracy 10000's rank error on this data, so
    // the row fails only if the sketch genuinely breaks.
    "fi_size_percentiles_approx" -> ((s, d) => {
      val withinPct = 0.10
      def within(a: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) =
        when(e === 0, a === 0)
          .otherwise(abs(a.cast("double") / e.cast("double") - 1.0) <= withinPct)
      files(s, d).agg(
          expr("percentile(file_size, 0.5D)").as("exact_p50"),
          expr("percentile(file_size, 0.9D)").as("exact_p90"),
          expr("percentile(file_size, 0.99D)").as("exact_p99"),
          expr("approx_percentile(file_size, 0.5D, 10000)").as("a50"),
          expr("approx_percentile(file_size, 0.9D, 10000)").as("a90"),
          expr("approx_percentile(file_size, 0.99D, 10000)").as("a99"))
        .select(col("exact_p50"), col("exact_p90"), col("exact_p99"),
          within(col("a50"), col("exact_p50")).as("p50_in_bounds"),
          within(col("a90"), col("exact_p90")).as("p90_in_bounds"),
          within(col("a99"), col("exact_p99")).as("p99_in_bounds"))
    }),
    // Approximate distinct counts (HLL) — the 100 TB path for D4-style
    // cardinalities. DuckDB can't reproduce Spark's HLL++ values, but
    // the CONTRACT is checkable: emit the exact distincts plus booleans
    // asserting the sketch landed within 3× its rated 5% rsd. The
    // oracle projects the same exacts and literal TRUEs → hash compare
    // fails iff the sketch breaks its error bound.
    "fi_stats_approx" -> ((s, d) => {
      val withinPct = 0.15 // 3 × default rsd 0.05
      // degenerate corpus guard: 0 exact distincts would make the ratio
      // 0/0 = NaN and the predicate false — require approx = 0 instead
      def within(approx: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =
        when(exact === 0, approx === 0)
          .otherwise(abs(approx.cast("double") / exact.cast("double") - 1.0) <= withinPct)
      files(s, d).agg(
          approx_count_distinct(col("checksum")).as("ac"),
          countDistinct(col("checksum")).as("exact_checksums"),
          approx_count_distinct(col("path")).as("ad"),
          countDistinct(col("path")).as("exact_dirs"))
        .select(col("exact_checksums"), col("exact_dirs"),
          within(col("ac"), col("exact_checksums")).as("checksums_in_bounds"),
          within(col("ad"), col("exact_dirs")).as("dirs_in_bounds"))
    }),
    // Search response assembly (routers.py:73-76): the page plus the
    // endpoint's total_count and `has_more = offset + len(page) <
    // total_count` — the pagination math IS query semantics, so it
    // gets its own oracle row. ONE aggregate pass: the page is plain
    // LIMIT/OFFSET over the filtered set, so its row count is pure
    // arithmetic on total_count — |page| = min(limit, max(0, total −
    // offset)) — and no sort or second scan is needed at all.
    "fi_search_page_meta" -> ((s, d) => {
      val req = SearchRequest(
        minSize = Some(1000000L), maxSize = Some(900000000L),
        modifiedAfter = Some("1996-01-01 00:00:00"),
        modifiedBefore = Some("2000-12-31 23:59:59"),
        limit = 100, offset = 50)
      searchApiFiltered(files(s, d), req)
        .agg(count(lit(1)).as("total_count"))
        .withColumn("files_in_page",
          least(lit(req.limit.toLong),
            greatest(col("total_count") - req.offset.toLong, lit(0L))))
        .select(col("total_count"), col("files_in_page"),
          (lit(req.offset.toLong) + col("files_in_page") < col("total_count"))
            .as("has_more"))
    }),
    // Duplicates response assembly (routers.py:132-141): total_groups,
    // per-page file/wasted-space sums, and the has_more page math.
    // ONE pass over the group summaries: rank rows by the page order
    // (row_number over the summaries — a bounded post-aggregate frame,
    // never the raw files), then every output — the global total AND
    // the page sums — comes out of a single conditional aggregate.
    // (The previous crossJoin-of-two-aggregates shape recomputed the
    // whole summaries pipeline twice.)
    "fi_dup_page_meta" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val (pageOffset, pageLimit) = (10, 50)
      val ord = Window.orderBy(
        col("file_count").desc, col("file_size").desc, col("checksum"))
      val inPage = col("_rn") > pageOffset && col("_rn") <= pageOffset + pageLimit
      duplicateGroupSummaries(files(s, d), minGroupSize = 2)
        .withColumn("_rn", row_number().over(ord))
        .agg(
          count(lit(1)).as("total_groups"),
          sum(when(inPage, 1L).otherwise(0L)).as("groups_in_page"),
          coalesce(sum(when(inPage, col("file_count"))), lit(0L))
            .as("total_duplicate_files"),
          coalesce(sum(when(inPage, col("wasted_space"))), lit(0L))
            .as("total_wasted_space"))
        .select(col("total_groups"), col("groups_in_page"),
          col("total_duplicate_files"), col("total_wasted_space"),
          (lit(pageOffset.toLong) + col("groups_in_page") < col("total_groups"))
            .as("has_more"))
    }),
    // Combined visualization response (database.py:459-520
    // get_visualization_data): size histogram + extension stats +
    // monthly timeline in ONE call, as a tall (section, pos, label,
    // counts) relation — one job, three section scans, total ordering.
    "fi_visualization" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val f = files(s, d)
      val hist = sizeHistogram(f).select(
        lit("1_size").as("section"), col("sort_order").cast("long").as("pos"),
        col("size_range").as("label"), col("file_count"), col("total_size"))
      val ext = extensionStats(f).withColumn("pos",
          row_number().over(Window.orderBy(col("file_count").desc, col("extension")))
            .cast("long"))
        .select(lit("2_ext").as("section"), col("pos"),
          col("extension").as("label"), col("file_count"), col("total_size"))
      val tl = timeline(f, TimelineAsOf).withColumn("pos",
          row_number().over(Window.orderBy(col("month"))).cast("long"))
        .select(lit("3_time").as("section"), col("pos"),
          col("month").as("label"), col("file_count"), col("total_size"))
      hist.unionByName(ext).unionByName(tl).orderBy("section", "pos")
    }),
    // D12 — response-level totals over the returned page only
    // (routers.py:132-134): group rows of ONE page, then count/sum.
    "fi_page_totals" -> ((s, d) => {
      val page = duplicateGroupSummaries(files(s, d), minGroupSize = 2)
        .limit(50)
      page.agg(
        count(lit(1)).as("groups_in_page"),
        coalesce(sum(col("file_count")), lit(0L)).as("files_in_page"),
        coalesce(sum(col("wasted_space")), lit(0L)).as("wasted_in_page"))
    }),
    // D1 — CLI stats (indexer.py:847-913)
    "fi_stats_cli" -> ((s, d) => statsCli(files(s, d))),
    // D2/D4 — API stats (database.py:395-457)
    "fi_stats_api" -> ((s, d) => statsApi(files(s, d))),
    // D3 — duplicate-group stats, API semantics (database.py:419-431)
    "fi_duplicate_stats" -> ((s, d) => duplicateStats(files(s, d))),
    // D5 — size-collision prefilter (indexer.py:1487-1510)
    "fi_size_collisions" -> ((s, d) => sizeCollisions(files(s, d), skipEmpty = true)),
    // D6 — size histogram (database.py:465-491)
    "fi_size_histogram" -> ((s, d) => sizeHistogram(files(s, d))),
    // D7 — extension stats, last-dot + top-20 (database.py:494-514)
    "fi_extensions" -> ((s, d) => extensionStats(files(s, d))),
    // D9 — Go extension distribution, first-dot (database.go:235-263)
    "fi_extensions_first_dot" -> ((s, d) => extensionStatsFirstDot(files(s, d))),
    // D8/B9 — monthly timeline, trailing 12 months (database.py:517-526)
    "fi_timeline" -> ((s, d) => timeline(files(s, d), TimelineAsOf)),
    // A9 — upsert (union + last-writer-wins dedup; database.go:98-113)
    "fi_upsert" -> ((s, d) => {
      val f = files(s, d)
      val incoming = f.filter(col("filename").like("%7.dat")).select(
        col("path"), col("filename"),
        lit(null).cast("string").as("checksum"),
        (col("file_size") + 1000L).as("file_size"),
        col("modification_datetime"))
      upsert(f, incoming)
        .select("path", "filename", "checksum", "file_size", "modification_datetime")
        .orderBy(col("path"), col("filename"))
    })
  )

  private def w(select: String): String = FilesCte.wrap(select)

  val oracle: Map[String, String] = Map(
    "fi_search_filename" -> w(
      """SELECT * FROM files
        |WHERE filename LIKE '%5.txt' AND path LIKE '/data/d1%' AND checksum IS NOT NULL
        |ORDER BY path, filename""".stripMargin),
    "fi_point_lookup" -> w(
      """SELECT * FROM files WHERE filename LIKE 'order_101.log'
        |ORDER BY path, filename""".stripMargin),
    "fi_search_api" -> w(
      """SELECT * FROM files
        |WHERE file_size >= 1000000 AND file_size <= 900000000
        |  AND modification_datetime >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND modification_datetime <= TIMESTAMP '2000-12-31 23:59:59'
        |ORDER BY modification_datetime DESC, path, filename
        |LIMIT 100 OFFSET 50""".stripMargin),
    "fi_search_keyset" -> w(
      """, f AS (
        |  SELECT * FROM files
        |  WHERE file_size >= 1000000 AND file_size <= 900000000
        |    AND modification_datetime >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND modification_datetime <= TIMESTAMP '2000-12-31 23:59:59'),
        |c AS (
        |  SELECT path, filename FROM (
        |    SELECT path, filename FROM f ORDER BY path, filename LIMIT 50)
        |  ORDER BY path DESC, filename DESC LIMIT 1)
        |SELECT f.* FROM f, c
        |WHERE f.path > c.path OR (f.path = c.path AND f.filename > c.filename)
        |ORDER BY f.path, f.filename LIMIT 50""".stripMargin),
    "fi_search_substring" -> w(
      """SELECT * FROM files
        |WHERE filename ILIKE '%ORDER_11%' OR path ILIKE '%ORDER_11%'
        |ORDER BY filename, path""".stripMargin),
    "fi_list_all" -> w(
      "SELECT * FROM files ORDER BY filename, path"),
    "fi_null_checksum_by_size" -> w(
      """SELECT * FROM files WHERE file_size = 610929 AND checksum IS NULL
        |ORDER BY path, filename""".stripMargin),
    "fi_existing_probe" -> w(
      """SELECT f.* FROM files f
        |WHERE EXISTS (SELECT 1 FROM files b
        |  WHERE b.filename LIKE '%.log' AND b.path = f.path AND b.filename = f.filename)
        |ORDER BY f.path, f.filename""".stripMargin),
    // bloom prefilter + exact verify ⇒ same rows as the exact probe
    "fi_existing_probe_bloom" -> w(
      """SELECT f.* FROM files f
        |WHERE EXISTS (SELECT 1 FROM files b
        |  WHERE b.filename LIKE '%.log' AND b.path = f.path AND b.filename = f.filename)
        |ORDER BY f.path, f.filename""".stripMargin),
    "fi_duplicates" -> w(
      """SELECT path, filename, checksum, file_size, modification_datetime, group_size
        |FROM (SELECT *, COUNT(*) OVER (PARTITION BY checksum) AS group_size
        |      FROM files WHERE checksum IS NOT NULL) t
        |WHERE group_size > 1
        |ORDER BY checksum, path, filename""".stripMargin),
    "fi_duplicate_groups" -> w(
      """, g AS (
        |  SELECT checksum, file_size, COUNT(*) AS file_count
        |  FROM files WHERE checksum IS NOT NULL
        |  GROUP BY checksum, file_size
        |  HAVING COUNT(*) >= 2
        |  ORDER BY file_count DESC, file_size DESC, checksum
        |  LIMIT 100 OFFSET 0)
        |SELECT f.checksum, f.file_size, f.path, f.filename, f.modification_datetime,
        |       g.file_count, f.file_size * (g.file_count - 1) AS wasted_space
        |FROM files f JOIN g ON f.checksum = g.checksum AND f.file_size = g.file_size
        |ORDER BY g.file_count DESC, f.file_size DESC, f.checksum, f.path, f.filename""".stripMargin),
    "fi_duplicate_group_summaries" -> w(
      """SELECT checksum, file_size, COUNT(*) AS file_count,
        |       file_size * (COUNT(*) - 1) AS wasted_space
        |FROM files WHERE checksum IS NOT NULL
        |GROUP BY checksum, file_size
        |HAVING COUNT(*) >= 3
        |ORDER BY file_count DESC, file_size DESC, checksum""".stripMargin),
    // page-1 cursor (last key under the group order) feeds the keyset
    // predicate for page 2 — same two-step walk the Spark side runs
    "fi_dup_keyset" -> w(
      """, g AS (
        |  SELECT checksum, file_size, COUNT(*) AS file_count,
        |         file_size * (COUNT(*) - 1) AS wasted_space
        |  FROM files WHERE checksum IS NOT NULL
        |  GROUP BY checksum, file_size
        |  HAVING COUNT(*) >= 2),
        |c AS (
        |  SELECT checksum, file_size, file_count FROM (
        |    SELECT checksum, file_size, file_count FROM g
        |    ORDER BY file_count DESC, file_size DESC, checksum LIMIT 40)
        |  ORDER BY file_count ASC, file_size ASC, checksum DESC LIMIT 1)
        |SELECT g.checksum, g.file_size, g.file_count, g.wasted_space
        |FROM g, c
        |WHERE g.file_count < c.file_count
        |   OR (g.file_count = c.file_count AND (g.file_size < c.file_size
        |       OR (g.file_size = c.file_size AND g.checksum > c.checksum)))
        |ORDER BY g.file_count DESC, g.file_size DESC, g.checksum
        |LIMIT 40""".stripMargin),
    "fi_pattern_duplicates" -> w(
      """, e AS (
        |  SELECT f.* FROM files f
        |  WHERE f.checksum IN (SELECT DISTINCT checksum FROM files
        |                       WHERE checksum IS NOT NULL AND filename LIKE '%.txt')),
        |g AS (
        |  SELECT checksum, file_size, COUNT(*) AS file_count
        |  FROM e GROUP BY checksum, file_size
        |  HAVING COUNT(*) >= 2
        |  ORDER BY file_count DESC, file_size DESC, checksum
        |  LIMIT 1000 OFFSET 0)
        |SELECT e.checksum, e.file_size, e.path, e.filename, e.modification_datetime,
        |       g.file_count, e.file_size * (g.file_count - 1) AS wasted_space
        |FROM e JOIN g ON e.checksum = g.checksum AND e.file_size = g.file_size
        |ORDER BY g.file_count DESC, e.file_size DESC, e.checksum, e.path, e.filename""".stripMargin),
    "fi_cleanup_candidates" -> w(
      """SELECT f.* FROM files f
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM files l
        |  WHERE l.path <> '/data/d7' AND NOT (l.filename LIKE '%99%')
        |    AND l.path = f.path AND l.filename = f.filename)
        |ORDER BY f.path, f.filename""".stripMargin),
    "fi_setops" -> w(
      """SELECT path FROM (
        |  SELECT DISTINCT path FROM files WHERE filename LIKE '%.txt'
        |  INTERSECT
        |  SELECT DISTINCT path FROM files WHERE filename LIKE '%.log'
        |  EXCEPT
        |  SELECT DISTINCT path FROM files WHERE file_size > 1073741824)
        |ORDER BY path""".stripMargin),
    "fi_diff_classify" -> w(
      """, idx AS (SELECT path, filename FROM files
        |    WHERE filename LIKE '%.txt' OR filename LIKE '%.dat'),
        |scn AS (SELECT path, filename FROM files
        |    WHERE filename LIKE '%.dat' OR filename LIKE '%.log')
        |SELECT CASE WHEN idx.path IS NULL THEN 'new'
        |            WHEN scn.path IS NULL THEN 'deleted'
        |            ELSE 'unchanged' END AS status,
        |  COUNT(*) AS n
        |FROM idx FULL OUTER JOIN scn
        |  ON idx.path = scn.path AND idx.filename = scn.filename
        |GROUP BY 1 ORDER BY status""".stripMargin),
    "fi_rollup" -> w(
      """, x AS (
        |  SELECT path,
        |    CASE WHEN filename LIKE '%.%'
        |         THEN lower('.' || split_part(filename, '.', -1))
        |         ELSE '(no extension)' END AS extension,
        |    file_size
        |  FROM files)
        |SELECT path, extension,
        |  COUNT(*) AS file_count,
        |  CAST(COALESCE(SUM(file_size), 0) AS BIGINT) AS total_size,
        |  GROUPING(path, extension) AS gid
        |FROM x
        |GROUP BY ROLLUP(path, extension)
        |ORDER BY gid, path ASC NULLS FIRST, extension ASC NULLS FIRST""".stripMargin),
    "ev_pivot" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "fi_size_percentiles" -> w(
      """SELECT quantile_cont(file_size, 0.25) AS p25,
        |  quantile_cont(file_size, 0.5) AS p50,
        |  quantile_cont(file_size, 0.75) AS p75,
        |  quantile_cont(file_size, 0.9) AS p90,
        |  quantile_cont(file_size, 0.37) AS size_p37
        |FROM files""".stripMargin),
    "fi_size_percentiles_approx" -> w(
      """SELECT quantile_cont(file_size, 0.5) AS exact_p50,
        |  quantile_cont(file_size, 0.9) AS exact_p90,
        |  quantile_cont(file_size, 0.99) AS exact_p99,
        |  TRUE AS p50_in_bounds,
        |  TRUE AS p90_in_bounds,
        |  TRUE AS p99_in_bounds
        |FROM files""".stripMargin),
    "fi_stats_approx" -> w(
      """SELECT COUNT(DISTINCT checksum) AS exact_checksums,
        |  COUNT(DISTINCT path) AS exact_dirs,
        |  TRUE AS checksums_in_bounds,
        |  TRUE AS dirs_in_bounds
        |FROM files""".stripMargin),
    "fi_search_page_meta" -> w(
      """, f AS (
        |  SELECT * FROM files
        |  WHERE file_size >= 1000000 AND file_size <= 900000000
        |    AND modification_datetime >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND modification_datetime <= TIMESTAMP '2000-12-31 23:59:59'),
        |p AS (
        |  SELECT * FROM f
        |  ORDER BY modification_datetime DESC, path, filename
        |  LIMIT 100 OFFSET 50)
        |SELECT (SELECT COUNT(*) FROM f) AS total_count,
        |  (SELECT COUNT(*) FROM p) AS files_in_page,
        |  50 + (SELECT COUNT(*) FROM p) < (SELECT COUNT(*) FROM f) AS has_more""".stripMargin),
    "fi_dup_page_meta" -> w(
      """, g AS (
        |  SELECT checksum, file_size, COUNT(*) AS file_count,
        |         file_size * (COUNT(*) - 1) AS wasted_space
        |  FROM files WHERE checksum IS NOT NULL
        |  GROUP BY checksum, file_size
        |  HAVING COUNT(*) >= 2),
        |p AS (
        |  SELECT * FROM g
        |  ORDER BY file_count DESC, file_size DESC, checksum
        |  LIMIT 50 OFFSET 10)
        |SELECT (SELECT COUNT(*) FROM g) AS total_groups,
        |  (SELECT COUNT(*) FROM p) AS groups_in_page,
        |  (SELECT CAST(COALESCE(SUM(file_count), 0) AS BIGINT) FROM p) AS total_duplicate_files,
        |  (SELECT CAST(COALESCE(SUM(wasted_space), 0) AS BIGINT) FROM p) AS total_wasted_space,
        |  10 + (SELECT COUNT(*) FROM p) < (SELECT COUNT(*) FROM g) AS has_more""".stripMargin),
    "fi_visualization" -> w(
      """, h AS (
        |  SELECT '1_size' AS section,
        |    CAST(CASE WHEN file_size = 0 THEN 0
        |         WHEN file_size < 1024 THEN 1
        |         WHEN file_size < 1048576 THEN 2
        |         WHEN file_size < 1073741824 THEN 3
        |         ELSE 4 END AS BIGINT) AS pos,
        |    CASE WHEN file_size = 0 THEN '0 bytes'
        |         WHEN file_size < 1024 THEN '< 1KB'
        |         WHEN file_size < 1048576 THEN '1KB - 1MB'
        |         WHEN file_size < 1073741824 THEN '1MB - 1GB'
        |         ELSE '> 1GB' END AS label,
        |    COUNT(*) AS file_count,
        |    CAST(COALESCE(SUM(file_size), 0) AS BIGINT) AS total_size
        |  FROM files GROUP BY 1, 2, 3),
        |eg AS (
        |  SELECT CASE WHEN filename LIKE '%.%'
        |           THEN lower('.' || split_part(filename, '.', -1))
        |           ELSE '(no extension)' END AS extension,
        |    COUNT(*) AS file_count,
        |    CAST(COALESCE(SUM(file_size), 0) AS BIGINT) AS total_size
        |  FROM files GROUP BY 1
        |  ORDER BY file_count DESC, extension LIMIT 20),
        |e AS (
        |  SELECT '2_ext' AS section,
        |    CAST(row_number() OVER (ORDER BY file_count DESC, extension) AS BIGINT) AS pos,
        |    extension AS label, file_count, total_size
        |  FROM eg),
        |t AS (
        |  SELECT '3_time' AS section,
        |    CAST(row_number() OVER (ORDER BY month) AS BIGINT) AS pos,
        |    month AS label, file_count, total_size
        |  FROM (
        |    SELECT CAST(CAST(date_trunc('month', modification_datetime) AS DATE) AS VARCHAR) AS month,
        |      COUNT(*) AS file_count,
        |      CAST(COALESCE(SUM(file_size), 0) AS BIGINT) AS total_size
        |    FROM files
        |    WHERE modification_datetime >= TIMESTAMP '2001-08-01 00:00:00' - INTERVAL 12 MONTH
        |    GROUP BY 1))
        |SELECT section, pos, label, file_count, total_size
        |FROM (SELECT * FROM h UNION ALL SELECT * FROM e UNION ALL SELECT * FROM t)
        |ORDER BY section, pos""".stripMargin),
    "fi_page_totals" -> w(
      """, g AS (
        |  SELECT checksum, file_size, COUNT(*) AS file_count,
        |         file_size * (COUNT(*) - 1) AS wasted_space
        |  FROM files WHERE checksum IS NOT NULL
        |  GROUP BY checksum, file_size
        |  HAVING COUNT(*) >= 2
        |  ORDER BY file_count DESC, file_size DESC, checksum
        |  LIMIT 50)
        |SELECT COUNT(*) AS groups_in_page,
        |  CAST(COALESCE(SUM(file_count), 0) AS BIGINT) AS files_in_page,
        |  CAST(COALESCE(SUM(wasted_space), 0) AS BIGINT) AS wasted_in_page
        |FROM g""".stripMargin),
    "fi_stats_cli" -> w(
      """SELECT COUNT(*) AS total_files,
        |  CAST(COALESCE(SUM(file_size), 0) AS BIGINT) AS total_size,
        |  COUNT(checksum) AS files_with_checksum,
        |  COUNT(*) - COUNT(checksum) AS files_without_checksum,
        |  COUNT(DISTINCT checksum) AS unique_checksums,
        |  COUNT(checksum) - COUNT(DISTINCT checksum) AS duplicate_files
        |FROM files""".stripMargin),
    "fi_stats_api" -> w(
      """SELECT COUNT(*) AS total_files,
        |  CAST(COALESCE(SUM(file_size), 0) AS BIGINT) AS total_size,
        |  COUNT(checksum) AS files_with_checksum,
        |  COUNT(*) - COUNT(checksum) AS files_without_checksum,
        |  CAST(COALESCE(SUM(file_size), 0) AS DOUBLE) / COUNT(*) AS avg_file_size,
        |  MAX(file_size) AS max_file_size,
        |  MIN(file_size) AS min_file_size,
        |  MAX(modification_datetime) AS newest_file,
        |  MIN(modification_datetime) AS oldest_file,
        |  COUNT(DISTINCT path) AS total_directories
        |FROM files""".stripMargin),
    "fi_duplicate_stats" -> w(
      """, g AS (
        |  SELECT checksum, COUNT(*) AS file_count
        |  FROM files WHERE checksum IS NOT NULL
        |  GROUP BY checksum HAVING COUNT(*) > 1)
        |SELECT COUNT(*) AS duplicate_groups,
        |       CAST(COALESCE(SUM(file_count), 0) AS BIGINT) AS duplicate_files
        |FROM g""".stripMargin),
    "fi_size_collisions" -> w(
      """SELECT file_size, COUNT(*) AS file_count,
        |  CAST(SUM(CASE WHEN checksum IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS files_without_checksum
        |FROM files WHERE file_size > 0
        |GROUP BY file_size
        |HAVING COUNT(*) > 1 AND SUM(CASE WHEN checksum IS NULL THEN 1 ELSE 0 END) > 0
        |ORDER BY file_size""".stripMargin),
    "fi_size_histogram" -> w(
      """SELECT
        |  CASE WHEN file_size = 0 THEN '0 bytes'
        |       WHEN file_size < 1024 THEN '< 1KB'
        |       WHEN file_size < 1048576 THEN '1KB - 1MB'
        |       WHEN file_size < 1073741824 THEN '1MB - 1GB'
        |       ELSE '> 1GB' END AS size_range,
        |  CASE WHEN file_size = 0 THEN 0
        |       WHEN file_size < 1024 THEN 1
        |       WHEN file_size < 1048576 THEN 2
        |       WHEN file_size < 1073741824 THEN 3
        |       ELSE 4 END AS sort_order,
        |  COUNT(*) AS file_count,
        |  CAST(COALESCE(SUM(file_size), 0) AS BIGINT) AS total_size
        |FROM files GROUP BY 1, 2 ORDER BY sort_order""".stripMargin),
    "fi_extensions" -> w(
      """SELECT
        |  CASE WHEN filename LIKE '%.%'
        |       THEN lower('.' || split_part(filename, '.', -1))
        |       ELSE '(no extension)' END AS extension,
        |  COUNT(*) AS file_count,
        |  CAST(COALESCE(SUM(file_size), 0) AS BIGINT) AS total_size,
        |  CAST(COALESCE(SUM(file_size), 0) AS DOUBLE) / COUNT(*) AS avg_size
        |FROM files GROUP BY 1
        |ORDER BY file_count DESC, extension
        |LIMIT 20""".stripMargin),
    "fi_extensions_first_dot" -> w(
      """SELECT
        |  CASE WHEN filename LIKE '%.%'
        |       THEN substring(filename, strpos(filename, '.'))
        |       ELSE '' END AS extension,
        |  COUNT(*) AS file_count
        |FROM files GROUP BY 1
        |ORDER BY file_count DESC, extension""".stripMargin),
    "fi_timeline" -> w(
      s"""SELECT CAST(CAST(date_trunc('month', modification_datetime) AS DATE) AS VARCHAR) AS month,
        |  COUNT(*) AS file_count,
        |  CAST(COALESCE(SUM(file_size), 0) AS BIGINT) AS total_size
        |FROM files
        |WHERE modification_datetime >= TIMESTAMP '$TimelineAsOf' - INTERVAL 12 MONTH
        |GROUP BY 1 ORDER BY month""".stripMargin),
    "fi_upsert" -> w(
      """, inc AS (
        |  SELECT path, filename, CAST(NULL AS VARCHAR) AS checksum,
        |         file_size + 1000 AS file_size, modification_datetime
        |  FROM files WHERE filename LIKE '%7.dat'),
        |u AS (
        |  SELECT path, filename, checksum, file_size, modification_datetime, 0 AS _src FROM files
        |  UNION ALL
        |  SELECT path, filename, checksum, file_size, modification_datetime, 1 AS _src FROM inc),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY path, filename ORDER BY _src DESC) AS _rn
        |  FROM u)
        |SELECT path, filename, checksum, file_size, modification_datetime
        |FROM r WHERE _rn = 1
        |ORDER BY path, filename""".stripMargin)
  )
}
