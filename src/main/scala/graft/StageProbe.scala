package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-cost attribution for the sf1 constant-factor tail: times the
  * PREFIXES of each slow text operator's plan (tokenize+explode only →
  * + first aggregate → full operator), so "fix what's fixable, name
  * the floor" decisions rest on measured stage costs, not totals.
  * Each prefix is forced with `queryExecution.toRdd.count()` (the
  * Bench rule — a bare count() lets Catalyst collapse the plan).
  *
  * Prints one JSON line per (operator, stage, sec). min-of-2 like
  * Bench; caches dropped between stages so no prefix is timed warm.
  *
  * Usage: runMain graft.StageProbe [sfDir]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "target/sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.configure(spark)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    docs.queryExecution.toRdd.count() // warm the scan/page cache once

    def time(op: String, stage: String)(mk: => DataFrame): Unit = {
      var best = Double.MaxValue
      var rows = 0L
      (1 to 2).foreach { _ =>
        graft.operators.OpCaches.releaseAll()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        rows = mk.queryExecution.toRdd.count()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"""{"op":"$op","stage":"$stage","sec":$best%.3f,"rows":$rows}""")
    }

    // ---- ta_bigram_rarity prefixes (in-row HashedNgramFreqsExpr
    // counting since the rarityPostings switch; tf_agg_legacy keeps
    // the removed explode→(doc,term) aggregate measurable so the
    // saving stays on record)
    import org.apache.spark.sql.GraftSqlBridge
    def bigramFreqs = graft.operators.Dedup.spread(docs)
      .select(col("doc_id"), GraftSqlBridge.column(
        graft.functions.HashedNgramFreqsExpr(
          GraftSqlBridge.expression(col("text")), 2)).as("tfs"))
    time("ta_bigram_rarity", "freqs_only")(bigramFreqs)
    time("ta_bigram_rarity", "df_agg")(
      bigramFreqs.select(explode(col("tfs.gram_h")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("df")))
    time("ta_bigram_rarity", "tf_agg_legacy")(
      graft.operators.Dedup.spread(docs)
        .select(col("doc_id"), explode(graft.operators.Dedup.hashedNgrams(
          col("text"), 2, distinct = false)).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    time("ta_bigram_rarity", "full")(
      graft.operators.TextAnalysis.bigramRarity(docs))

    // ---- dd_shingle_df_hist prefixes
    def shingleInv = graft.operators.Dedup.withHashedShingles(docs, 3)
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
    time("dd_shingle_df_hist", "explode_only")(shingleInv)
    time("dd_shingle_df_hist", "df_agg")(
      shingleInv.groupBy("shingle").agg(count(lit(1)).as("df")))
    time("dd_shingle_df_hist", "full")(
      graft.operators.Dedup.shingleDfHistogram(docs, 3))

    // ---- dd_dup_spans prefixes
    def posGrams = graft.operators.Dedup.spread(docs)
      .select(col("doc_id"), posexplode(graft.operators.Dedup.hashedNgrams(
        col("text"), 3, distinct = false)).as(Seq("pos", "shingle")))
    time("dd_dup_spans", "posexplode_only")(posGrams)
    time("dd_dup_spans", "shared_agg")(
      posGrams.groupBy("shingle")
        .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
        .filter(col("mn") =!= col("mx")))
    time("dd_dup_spans", "full")(graft.operators.Dedup.dupSpans(docs, 3))

    // ---- ta_tfidf_top prefixes (in-row TermFreqsExpr since the
    // tfidfTopK switch; tf_agg_legacy keeps the removed explode→
    // (doc,term) aggregate measurable)
    def tfFreqs = graft.operators.Dedup.spread(docs)
      .select(col("doc_id"), GraftSqlBridge.column(
        graft.functions.TermFreqsExpr(
          GraftSqlBridge.expression(col("text")))).as("tfs"))
    time("ta_tfidf_top", "termfreqs_only")(tfFreqs)
    time("ta_tfidf_top", "df_agg")(
      tfFreqs.select(explode(col("tfs.term_h")).as("term_h"))
        .groupBy("term_h").agg(count(lit(1)).as("df")))
    time("ta_tfidf_top", "tf_agg_legacy")(
      graft.operators.Dedup.spread(docs)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    def tfidfScored = {
      val postings = tfFreqs.select(col("doc_id"), explode(col("tfs")).as("p"))
        .select(col("doc_id"), col("p.term_h").as("term_h"),
          col("p.term").as("term"), col("p.tf").as("tf"))
      val dfs = tfFreqs.select(explode(col("tfs.term_h")).as("term_h"))
        .groupBy("term_h").agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      postings.join(dfs, Seq("term_h")).crossJoin(broadcast(nDocs))
        .withColumn("score", col("tf").cast("double") *
          ((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))))
    }
    time("ta_tfidf_top", "score_join")(tfidfScored)
    time("ta_tfidf_top", "window_topk")({
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
      tfidfScored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
    })
    time("ta_tfidf_top", "full")(
      graft.operators.TextAnalysis.tfidfTopK(docs, 5))

    // ---- dd_delta_pairs_capped prefixes (the one-scan form)
    def inv0 = graft.operators.Dedup.withHashedShingles(docs, 3)
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
    time("dd_delta_pairs_capped", "explode_only")(inv0)
    time("dd_delta_pairs_capped", "hot_agg")(
      inv0.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") > 5).select("shingle"))
    time("dd_delta_pairs_capped", "full")(
      graft.operators.Dedup.deltaPairsCappedOneScan(docs,
        isDelta = col("doc_id") % 10 === 0, n = 3, cap = 5L, threshold = 0.5))

    // ---- ta_tfidf_top: the heap aggregate that replaced the window
    // (same scored prefix, different finisher) — keeps the win and the
    // remaining floor both on record
    time("ta_tfidf_top", "heap_topk")({
      val topk = GraftSqlBridge.column(graft.functions.TopKByScoreAgg(
        GraftSqlBridge.expression(col("score")),
        GraftSqlBridge.expression(col("term")),
        GraftSqlBridge.expression(col("tf")),
        GraftSqlBridge.expression(col("df")), 5).toAggregateExpression())
      tfidfScored.groupBy("doc_id").agg(topk.as("top"))
        .select(col("doc_id"), explode(col("top")).as("t"))
    })

    // ---- fi_cleanup_candidates prefixes: two scans + the anti join;
    // smj_anti vs hash_anti isolates the sort cost of the default plan
    val files = graft.tables.Tables.files(spark, sfDir)
    val live = files.filter(col("path") =!= "/data/d7" && !col("filename").like("%99%"))
    time("fi_cleanup_candidates", "scan_both")(
      files.select("path", "filename").unionByName(live.select("path", "filename")))
    time("fi_cleanup_candidates", "smj_anti")(
      files.join(live.select("path", "filename"),
        Seq("path", "filename"), "left_anti"))
    time("fi_cleanup_candidates", "hash_anti")(
      files.join(live.select("path", "filename").hint("shuffle_hash"),
        Seq("path", "filename"), "left_anti"))
    time("fi_cleanup_candidates", "full")(
      graft.queries.FileQueries.cleanupCandidates(files, live))

    // ---- ev_gap_percentiles prefixes: the per-user lag window vs the
    // single-reducer exact percentile buffer
    val events = graft.tables.Tables.events(spark, sfDir)
    def gaps = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("us"), col("event_id"))
      events.select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
        .filter(col("gap_us").isNotNull)
    }
    time("ev_gap_percentiles", "lag_window")(gaps)
    time("ev_gap_percentiles", "full")(
      graft.streaming.Events.gapPercentiles(events))

    // ---- q7_nation_trade prefixes: which join pays?
    time("q7_nation_trade", "lineitem_filter")(
      graft.tables.Tables.lineitem(spark, sfDir)
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00"))))
    time("q7_nation_trade", "orders_cust_join")({
      val nation = graft.tables.Tables.nation(spark, sfDir).select("n_nationkey", "n_name")
      val cust = graft.tables.Tables.customer(spark, sfDir)
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      graft.tables.Tables.orders(spark, sfDir)
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("cust_nation"))
    })
    time("q7_nation_trade", "full")(
      graft.queries.TpchQueries.q7Trade(spark, sfDir))

    // ---- mm_phash_pairs prefixes: is the cost the PNG encode, the
    // ImageIO decode + aHash, or the pigeonhole self-join?
    val docs3 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "source")
    def imgTable = graft.operators.Multimodal.imageTableWithVariants(spark, docs3)
    time("mm_phash_pairs", "png_encode")(imgTable)
    def hashed = graft.operators.Multimodal.imagePHash(spark, imgTable).toDF()
    time("mm_phash_pairs", "decode_ahash")(hashed)
    time("mm_phash_pairs", "full")(
      graft.operators.Multimodal.phashPairs(hashed))

    spark.stop()
  }
}
