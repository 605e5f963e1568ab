package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.operators.CorpusOps
import graft.tables.Tables

/** Corpus-curation operators (decontamination, deterministic sampling,
  * shard packing) as oracle-paired query instances over `documents` —
  * the pipeline stages that sit between dedup and training.
  *
  * The train/test split used throughout is `doc_id % 17 = 0` ⇒ test
  * (≈6% of docs), expressed identically in the oracle so both engines
  * see the same benchmark suite.
  */
object CorpusQueries {
  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)

  private val isTest = col("doc_id") % 17 === 0

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Benchmark decontamination: train docs sharing ≥3 distinct word
    // 5-grams with any test doc. Long grams (not dedup's 3-grams):
    // a 5-gram colliding by chance is rare, so overlap is evidence of
    // actual leakage, and the threshold trims coincidences.
    "tp_contamination" -> ((s, d) =>
      CorpusOps.contaminationPairs(docs(s, d), isTest, n = 5, minOverlap = 3L)),
    // The decontaminated keep-list — what a training run consumes.
    "tp_decontam_keep" -> ((s, d) =>
      CorpusOps.decontaminatedKeep(docs(s, d), isTest, n = 5, minOverlap = 3L)),
    // Per-test-doc contamination depth: fraction of each test doc's
    // distinct 5-grams that appear anywhere in the train corpus.
    "tp_contamination_coverage" -> ((s, d) =>
      CorpusOps.contaminationCoverage(docs(s, d), isTest, n = 5)),
    // Deterministic ~10% Bernoulli-by-hash sample (hex prefix ≤ '19').
    "tp_hash_sample" -> ((s, d) => CorpusOps.hashSample(docs(s, d), hexCeil = "19")),
    // 20 docs per language, drawn by hash order within each stratum.
    "tp_stratified_sample" -> ((s, d) =>
      CorpusOps.stratifiedSample(docs(s, d), quota = 20)),
    // Greedy token-budget shard assignment (2048 tokens per shard),
    // two-phase cumulative sum (blockSize 64 ⇒ the testdata exercises
    // MANY blocks, so the offset path is genuinely covered).
    "tp_pack_shards" -> ((s, d) =>
      CorpusOps.packShards(docs(s, d), budget = 2048L, blockSize = 64L)),
    // Sequence packing with per-doc token offsets + straddle flags —
    // the example-packing layout a training dataloader consumes.
    "tp_pack_offsets" -> ((s, d) =>
      CorpusOps.packSequences(docs(s, d), seqLen = 512L, blockSize = 64L)),
    // Mixture-weight table: per-source token shares + equalizing weights.
    "tp_source_mix" -> ((s, d) => CorpusOps.sourceMix(docs(s, d))),
    // Temperature-scaled (α = 1/2) mixture weights — sqrt-smoothed
    // shares with an exact decimal-summed normalizer.
    "tp_temperature_mix" -> ((s, d) => CorpusOps.temperatureMix(docs(s, d))),
    // Per-source quality gate: keep each source's best 40% by the
    // composite quality score (exact per-source rank form).
    "tp_quality_gate" -> ((s, d) =>
      CorpusOps.qualityGate(docs(s, d), keepFrac = 0.4)),
    // The scan-scale twin: approx-percentile cutoffs, no per-source
    // sort; contract row per source asserts the kept count lands
    // within tolerance of the exact quota.
    "tp_quality_gate_approx" -> ((s, d) =>
      CorpusOps.qualityGateApprox(docs(s, d), keepFrac = 0.4, tol = 0.05)),
    // Largest-remainder token-budget apportionment: integer
    // allocations summing EXACTLY to the budget.
    "tp_mix_schedule" -> ((s, d) =>
      CorpusOps.mixSchedule(docs(s, d), budget = 100000L)),
    // Deterministic per-epoch shuffle order (inspectable 20-row prefix
    // per epoch; WindowGroupLimit prunes pre-shuffle).
    "tp_epoch_order" -> ((s, d) =>
      CorpusOps.epochOrder(docs(s, d), epochs = 3, head = 20)),
    // Shard-balance report: did running-sum packing actually come out
    // even? (one row: doc/token min/max per shard)
    "tp_shard_skew" -> ((s, d) =>
      CorpusOps.shardSkew(docs(s, d), budget = 2048L, blockSize = 64L))
  )

  private val T = OracleSql.T
  private def shinglesSql(n: Int): String = OracleSql.shingles(n)

  /** Shared CTE prefix: inverted 5-gram index split train/test. */
  private val invSplitSql: String =
    s"""WITH sh AS (SELECT doc_id, ${shinglesSql(5)} AS shingles FROM documents),
       |inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
       |te AS (SELECT * FROM inv WHERE doc_id % 17 = 0),
       |tr AS (SELECT * FROM inv WHERE doc_id % 17 <> 0)""".stripMargin

  val oracle: Map[String, String] = Map(
    "tp_contamination" ->
      s"""$invSplitSql
         |SELECT tr.doc_id AS train_id, te.doc_id AS test_id, count(*) AS n_overlap
         |FROM tr JOIN te ON tr.shingle = te.shingle
         |GROUP BY 1, 2 HAVING count(*) >= 3
         |ORDER BY train_id, test_id""".stripMargin,
    "tp_decontam_keep" ->
      s"""$invSplitSql,
         |bad AS (SELECT tr.doc_id FROM tr JOIN te ON tr.shingle = te.shingle
         |  GROUP BY tr.doc_id, te.doc_id HAVING count(*) >= 3)
         |SELECT doc_id, lang, n_chars FROM documents d
         |WHERE d.doc_id % 17 <> 0
         |  AND NOT EXISTS (SELECT 1 FROM bad WHERE bad.doc_id = d.doc_id)
         |ORDER BY doc_id""".stripMargin,
    "tp_contamination_coverage" ->
      s"""$invSplitSql,
         |tot AS (SELECT doc_id AS test_id, CAST(count(*) AS BIGINT) AS n_shingles
         |  FROM te GROUP BY doc_id),
         |hit AS (SELECT te.doc_id AS test_id,
         |    CAST(count(DISTINCT te.shingle) AS BIGINT) AS n_hit
         |  FROM te JOIN (SELECT DISTINCT shingle FROM tr) tr ON te.shingle = tr.shingle
         |  GROUP BY te.doc_id)
         |SELECT tot.test_id, tot.n_shingles,
         |  coalesce(hit.n_hit, 0) AS n_hit,
         |  CAST(coalesce(hit.n_hit, 0) AS DOUBLE) / CAST(tot.n_shingles AS DOUBLE)
         |    AS coverage
         |FROM tot LEFT JOIN hit USING (test_id)
         |ORDER BY test_id""".stripMargin,
    "tp_hash_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '19'
        |ORDER BY doc_id""".stripMargin,
    "tp_stratified_sample" ->
      """SELECT doc_id, lang, rk FROM (
        |  SELECT doc_id, lang, CAST(row_number() OVER (
        |      PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rk
        |  FROM documents)
        |WHERE rk <= 20 ORDER BY lang, rk""".stripMargin,
    "tp_shard_skew" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($T) AS BIGINT) AS n_tokens FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |  CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         |  FROM t),
         |per AS (
         |  SELECT cum_before // 2048 AS shard_id, COUNT(*) AS n_docs,
         |    CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
         |  FROM c GROUP BY 1)
         |SELECT COUNT(*) AS n_shards,
         |  MIN(n_docs) AS min_docs, MAX(n_docs) AS max_docs,
         |  MIN(shard_tokens) AS min_tokens, MAX(shard_tokens) AS max_tokens,
         |  CAST(SUM(shard_tokens) AS BIGINT) AS total_tokens
         |FROM per""".stripMargin,
    "tp_pack_shards" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($T) AS BIGINT) AS n_tokens FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |  CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         |  FROM t)
         |SELECT doc_id, n_tokens, cum_before // 2048 AS shard_id
         |FROM c ORDER BY doc_id""".stripMargin,
    "tp_pack_offsets" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($T) AS BIGINT) AS n_tokens FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |  CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         |  FROM t)
         |SELECT doc_id, n_tokens, cum_before // 512 AS seq_id,
         |  cum_before % 512 AS start_tok,
         |  cum_before % 512 + n_tokens AS end_tok,
         |  (cum_before % 512 + n_tokens > 512) AS straddles
         |FROM c ORDER BY doc_id""".stripMargin,
    "tp_source_mix" ->
      s"""WITH a AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(len($T)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source)
         |SELECT source, n_docs, n_tokens,
         |  CAST(n_tokens AS DOUBLE) / CAST(sum(n_tokens) OVER () AS BIGINT) AS token_share,
         |  CAST(CAST(sum(n_tokens) OVER () AS BIGINT) AS DOUBLE)
         |    / (count(*) OVER () * n_tokens) AS uniform_weight
         |FROM a ORDER BY source""".stripMargin,
    // Z = Σ√share summed as DECIMAL(38,18) — exact and therefore
    // order-independent, mirroring the Spark side bit-for-bit.
    "tp_temperature_mix" ->
      s"""WITH a AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(len($T)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         |s AS (SELECT *,
         |    CAST(n_tokens AS DOUBLE) / CAST(sum(n_tokens) OVER () AS BIGINT)
         |      AS token_share
         |  FROM a),
         |t AS (SELECT *, sqrt(token_share) AS scaled_share FROM s),
         |z AS (SELECT *,
         |    CAST(sum(CAST(scaled_share AS DECIMAL(38,18))) OVER () AS DOUBLE) AS zn
         |  FROM t)
         |SELECT source, n_docs, n_tokens, token_share, scaled_share,
         |  scaled_share / zn AS temp_weight
         |FROM z ORDER BY source""".stripMargin,
    // same composite-quality expression as ta_quality's oracle; the
    // rank order (q DESC, doc_id) is deterministic because both
    // engines hold bit-identical q doubles
    "tp_quality_gate" ->
      s"""WITH s AS (SELECT doc_id, source,
         |    least(CAST(n_chars AS DOUBLE) / 400.0, CAST(1.0 AS DOUBLE)) * 0.4
         |    + (CAST(1.0 AS DOUBLE) - CAST(len(list_filter($T, t -> t IN ('the', 'a'))) AS DOUBLE) / len($T)) * 0.3
         |    + CAST(len(list_distinct($T)) AS DOUBLE) / len($T) * 0.3 AS q
         |  FROM documents),
         |c AS (SELECT source, CAST(floor(count(*) * 0.4) AS BIGINT) AS k
         |  FROM s GROUP BY source),
         |r AS (SELECT doc_id, source, q,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY q DESC, doc_id) AS BIGINT) AS rnk
         |  FROM s)
         |SELECT doc_id, source, q, rnk FROM r JOIN c USING (source)
         |WHERE rnk <= k ORDER BY doc_id""".stripMargin,
    // contract row: exact integer counts + the tolerance verdict
    "tp_quality_gate_approx" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS n_docs, TRUE AS within_tol
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // identical 64-bit integer div/mod apportionment
    "tp_mix_schedule" ->
      s"""WITH a AS (SELECT source, CAST(sum(len($T)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         |t AS (SELECT *, CAST(sum(n_tokens) OVER () AS BIGINT) AS total FROM a),
         |b AS (SELECT *, (n_tokens * 100000) // total AS base,
         |    (n_tokens * 100000) % total AS rem FROM t),
         |g AS (SELECT *, CAST(100000 - sum(base) OVER () AS BIGINT) AS give,
         |    CAST(row_number() OVER (ORDER BY rem DESC, source) AS BIGINT) AS rk
         |  FROM b)
         |SELECT source, n_tokens, CAST(base AS BIGINT) AS base,
         |  CAST(CASE WHEN rk <= give THEN 1 ELSE 0 END AS BIGINT) AS extra,
         |  CAST(base + CASE WHEN rk <= give THEN 1 ELSE 0 END AS BIGINT) AS alloc
         |FROM g ORDER BY source""".stripMargin,
    "tp_epoch_order" ->
      """WITH e AS (SELECT doc_id, unnest(generate_series(1, 3)) AS epoch
        |  FROM documents),
        |k AS (SELECT epoch, doc_id,
        |    md5(CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS okey
        |  FROM e),
        |r AS (SELECT *, CAST(row_number() OVER (
        |    PARTITION BY epoch ORDER BY okey, doc_id) AS BIGINT) AS rk FROM k)
        |SELECT CAST(epoch AS INT) AS epoch, rk, doc_id, okey
        |FROM r WHERE rk <= 20 ORDER BY epoch, rk""".stripMargin
  )
}
