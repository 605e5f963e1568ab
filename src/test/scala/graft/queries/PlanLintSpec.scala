package graft.queries

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

import graft.{SparkEntry, SparkSpec}

/** Scale lint over EVERY registered query's physical plan.
  *
  * The per-round plan audit (PLANS.md) checks a handful of plans by
  * hand; this spec makes the two scale-killer classes a tested
  * invariant across the whole `SparkEntry.queries` surface, so a
  * future edit that re-introduces a cartesian join or an unbounded
  * single-partition window fails CI instead of surfacing in a bench
  * regression:
  *
  *  1. pair-blowup nodes — `CartesianProductExec` /
  *     `BroadcastNestedLoopJoinExec` multiply partition sizes; at
  *     100 TB any non-allow-listed occurrence is a job-killer.
  *  2. global windows — `WindowExec` with an empty partitionSpec
  *     moves the ENTIRE input to one task. Over a raw table that is
  *     the single worst plan Spark can emit; it is only acceptable
  *     over a frame already bounded by an aggregation or LIMIT.
  *
  * Allow-lists are explicit and documented per query, so every
  * exception is a reviewed decision rather than an accident.
  */
class PlanLintSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** Queries whose plans legitimately contain a nested-loop/cartesian
    * node, with the reviewed reason. */
  private val allowPairBlowup: Map[String, String] = Map(
    "ss_cosine_pairs" -> ("brute all-pairs cosine IS the declared oracle baseline; " +
      "the scale paths are cosinePairsBlocked (dd_embedding) and cosinePairsLsh " +
      "(dd_embedding_lsh), both equi-join plans"),
    "ss_topk_brute" -> ("exact top-k baseline: the broadcast side is the bounded " +
      "query set, the corpus streams through it exactly once — the intended " +
      "brute-force plan, not an accident"),
    "ss_topk_ivf_recall" -> ("the recall CONTRACT compares IVF against the brute " +
      "exact scan, so it inherits ss_topk_brute's reviewed nested loop"),
    "ss_knn_label" -> ("the label vote runs over ss_topk_brute's neighbor sets, " +
      "so it inherits the same reviewed brute-scan nested loop; production swaps " +
      "in the LSH/IVF top-k, which are equi-join plans"),
    "ss_topk_ivf_index_recall" -> ("same contract as ss_topk_ivf_recall for the " +
      "persisted-index path"),
    "ss_recall_curve" -> ("the curve's baseline is the reviewed " +
      "ss_topk_brute scan (one brute pass shared by all probe points)"),
    "ss_topk_ivfq_recall" -> ("the recall CONTRACT compares the IVF+int8 " +
      "composition against the brute exact scan, inheriting " +
      "ss_topk_brute's reviewed nested loop"),
    "ss_quantize_recall" -> ("both sides of the contract are reviewed brute " +
      "scans: the int8 ranking intentionally runs the same " +
      "broadcast-query/stream-corpus shape as ss_topk_brute (that IS the " +
      "quantized deployment's scan), and the recall check compares it against " +
      "the exact brute baseline"),
    "q_acctbal_quartiles_approx" -> ("the broadcast side is ONE scalar-aggregate " +
      "row (the approx-percentile boundaries) — the scalar-subquery execution " +
      "shape, bounded by construction"),
    "ta_bm25" -> ("the broadcast side is the ONE-row corpus-stats frame " +
      "(N, avgdl) joined into the per-posting projection — scalar-subquery " +
      "shape, bounded by construction"),
    "ta_tfidf_top" -> ("same shape as ta_bm25: the broadcast side is the " +
      "ONE-row doc-count frame crossed into the per-posting score " +
      "projection — scalar-subquery shape, bounded by construction"),
    "tp_corpus_health" -> ("the dashboard row is three ONE-row aggregates " +
      "crossed together (base counts × dup totals × pair count) — " +
      "scalar-subquery shape, every side bounded by construction"),
    "ev_daily_anomaly" -> ("the day-spine densification crosses the O(days) " +
      "sequence with the O(types) domain — both sides domain-bounded " +
      "aggregates, never the event stream"),
    "ev_users_7d_sketch" -> ("the trailing-window range joins cross the " +
      "O(days) spine with the per-day sketch table and the distinct " +
      "(user, day) pairs — all domain-bounded aggregates, never the raw " +
      "event stream"))

  /** Queries whose plans legitimately contain a globally-ordered
    * (empty-partition) window, with the reviewed reason. */
  private val allowGlobalWindow: Map[String, String] = Map(
    "ev_type_share" -> ("share-of-total over the per-event-type aggregate — the " +
      "window input is one row per event type (domain-bounded), never the corpus"),
    "tp_source_mix" -> ("mixture weights over the per-source aggregate — one row " +
      "per corpus source, domain-bounded"),
    "tp_temperature_mix" -> ("same frame as tp_source_mix: the global windows " +
      "(token total, decimal normalizer) run over the one-row-per-source " +
      "aggregate, never the corpus"),
    "tp_mix_schedule" -> ("largest-remainder apportionment: every window " +
      "(token total, leftover budget, remainder rank) runs over the " +
      "one-row-per-source aggregate — domain-bounded, never the corpus"),
    "fi_visualization" -> ("section position ranks run over the top-20 extension " +
      "page and the 12-month timeline — both frames bounded by the section's own " +
      "LIMIT/date-domain, never the raw index"),
    "fi_dup_page_meta" -> ("the endpoint's pagination contract IS a global rank " +
      "over duplicate-group summaries (one row per group, post-aggregate); the " +
      "page itself is bounded by the API's limit<=1000"),
    "q_acctbal_quartiles" -> ("exact global ntile is the declared semantics; the " +
      "100 TB twin is approx-percentile bucketing (fi_size_percentiles_approx " +
      "pattern), which needs no global order"),
    "tp_pack_shards" -> ("two-phase prefix sum: the only global window runs over " +
      "the per-block offsets table (one row per blockSize docs), the per-doc " +
      "cumulative sums are partitioned by block — see CorpusOps.packShards"),
    "tp_pack_offsets" -> ("same two-phase prefix sum core as tp_pack_shards " +
      "(CorpusOps.withCumBefore) — the global window sees only per-block totals"),
    "tp_shard_skew" -> ("same two-phase prefix sum core as tp_pack_shards " +
      "(CorpusOps.withCumBefore) — the global window sees only per-block totals; " +
      "everything after it is two shard-keyed aggregates"),
    "tp_training_manifest" -> ("ends in CorpusOps.packShards — same reviewed " +
      "per-block offsets window as tp_pack_shards"),
    "ev_cumulative_users" -> ("running total over the per-DAY aggregate (one row " +
      "per observed day, date-domain-bounded); the per-user and per-day distinct " +
      "work happens in partitioned hash aggregates before the window"))

  /** Physical nodes of the pre-AQE planned tree (AQE never introduces
    * cartesian or window nodes; it only re-picks join strategies that
    * are already equi-joins). */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => nodes(a.inputPlan)
    case other => other +: other.children.flatMap(nodes)
  }

  private def planNodes(name: String): Seq[SparkPlan] =
    nodes(SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan)

  test("no query plan contains a cartesian / nested-loop join unless reviewed") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val bad = planNodes(name).collect {
        case _: CartesianProductExec => "CartesianProduct"
        case _: BroadcastNestedLoopJoinExec => "BroadcastNestedLoopJoin"
      }
      if (bad.nonEmpty && !allowPairBlowup.contains(name)) Some(s"$name: ${bad.distinct.mkString(", ")}")
      else None
    }
    assert(offenders.isEmpty, s"\nun-reviewed pair-blowup nodes:\n  ${offenders.mkString("\n  ")}")
  }

  test("no query plan contains a global (single-partition) window unless reviewed") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val global = planNodes(name).collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      if (global.nonEmpty && !allowGlobalWindow.contains(name)) Some(name) else None
    }
    assert(offenders.isEmpty, s"\nun-reviewed global windows:\n  ${offenders.mkString("\n  ")}")
  }

  test("keyset cursor predicate reaches the parquet scan as a pushed filter") {
    // over a table with NATIVE path/filename columns (the production
    // index layout — the synthesized files VIEW derives them, which
    // legitimately blocks pushdown there), the deletion-safe cursor
    // disjunction must land in PushedFilters so deep pagination prunes
    // row groups at the scan instead of re-filtering the whole set
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-keyset-push").toString
    Seq(("/a", "f1", "c1", new java.sql.Timestamp(0L), 1L),
        ("/b", "f2", "c2", new java.sql.Timestamp(0L), 2L))
      .toDF("path", "filename", "checksum", "modification_datetime", "file_size")
      .write.mode("overwrite").parquet(dir)
    val page = FileQueries.searchKeyset(spark.read.parquet(dir),
      SearchRequest(), after = Some(("/a", "f1")), pageSize = 10)
    val scan = page.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PushedFilters"), scan)
    // the Or((path > a), And(path = a, filename > f)) cursor shape
    assert(scan.contains("Or(GreaterThan(path,/a)"), scan)
  }

  test("allow-lists only name registered queries (no stale entries)") {
    val known = SparkEntry.queries.keySet
    val stale = (allowPairBlowup.keySet ++ allowGlobalWindow.keySet).diff(known)
    assert(stale.isEmpty, s"stale allow-list entries: ${stale.mkString(", ")}")
  }
}
