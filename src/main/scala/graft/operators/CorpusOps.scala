package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between dedup and training: benchmark decontamination, deterministic
  * sampling, and token-budget shard packing.
  *
  * Scale design:
  *
  *  - [[contaminationPairs]] joins the TRAIN inverted n-gram index
  *    against the TEST one — held-out benchmark suites are tiny by
  *    definition, so the test index broadcasts and the train corpus
  *    never shuffles for the probe; only genuinely-overlapping
  *    (train, test) pairs reach the aggregate.
  *  - [[hashSample]] is stateless — a narrow filter on a hash prefix,
  *    no shuffle, resumable and stable under corpus growth (a doc's
  *    membership never depends on other docs).
  *  - [[stratifiedSample]] is a per-stratum top-k by hash order; the
  *    rank filter compiles to Spark's WindowGroupLimit, which prunes
  *    each map partition to k rows BEFORE the shuffle, so the sort
  *    never sees more than tasks×k rows per stratum.
  *  - [[packShards]] computes a corpus-wide running token total with
  *    the classic two-phase scan: per-block cumulative sums in
  *    parallel, plus a prefix-offset per block computed over the
  *    (tiny, one row per block) block-total table. The only
  *    single-partition window runs over blocks, not documents —
  *    100 TB at blockSize 10^6 is ~10^5 offset rows.
  */
object CorpusOps {

  /** Word n-gram shingles as an inverted index (doc_id, shingle),
    * reusing the dedup shingle definition (distinct n-grams) in
    * HASHED space — the broadcast map and every probe compare 8-byte
    * longs, not n-gram strings (identical overlap counts modulo
    * 64-bit collisions, immaterial at 5-grams). */
  private def inverted(docs: DataFrame, n: Int): DataFrame =
    // the shared shingle core (keyed by plan, so the 5-gram table here
    // never collides with dedup's 3-gram entry): one tokenize+shingle
    // pass serves the contamination/decontamination/coverage rows of a
    // report pass instead of one per row
    Dedup.hashedShingleTable(docs, n)
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))

  /** Benchmark decontamination: (train, test) document pairs sharing
    * at least `minOverlap` distinct word `n`-grams. `isTest` splits
    * the corpus (a real pipeline passes the benchmark suite as the
    * test side; here it is a predicate over one table so the oracle
    * can see the same split).
    *
    * Decontamination wants LONG grams (a 5-gram colliding by chance
    * is rare; a 13-gram practically never) — contrast with the
    * 3-grams dedup uses for recall. */
  def contaminationPairs(docs: DataFrame, isTest: Column, n: Int = 5,
      minOverlap: Long = 3L): DataFrame =
    contaminationPairsRaw(docs, isTest, n, minOverlap).orderBy("train_id", "test_id")

  /** [[contaminationPairs]] without the presentation sort — for
    * [[decontaminatedKeep]], which only distinct-projects train ids. */
  private[graft] def contaminationPairsRaw(docs: DataFrame, isTest: Column,
      n: Int = 5, minOverlap: Long = 3L): DataFrame = {
    val inv = inverted(docs, n)
    val test = broadcast(inv.filter(isTest).select(
      col("doc_id").as("test_id"), col("shingle")))
    inv.filter(!isTest).select(col("doc_id").as("train_id"), col("shingle"))
      .join(test, Seq("shingle"))
      .groupBy("train_id", "test_id")
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
  }

  /** The decontaminated keep-list: train documents with NO flagged
    * overlap against the test side — the end product a training run
    * actually consumes. Anti join against the (small) flagged set. */
  def decontaminatedKeep(docs: DataFrame, isTest: Column, n: Int = 5,
      minOverlap: Long = 3L): DataFrame = {
    val bad = contaminationPairsRaw(docs, isTest, n, minOverlap)
      .select(col("train_id").as("doc_id")).distinct()
    docs.filter(!isTest)
      .join(broadcast(bad), Seq("doc_id"), "left_anti")
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")
  }

  /** Corpus-release diff: classify every doc_id across two corpus
    * versions as added / deleted / modified / unchanged by CONTENT
    * hash — the version-management primitive behind incremental
    * re-processing (only `added`+`modified` re-enter the dedup/
    * curation pipeline; `deleted` retires index entries). The
    * documents twin of the file-index diff (reference
    * `file_indexer/indexer.py:294-309`'s mtime/size diff, with
    * content hashes instead of stat fields).
    *
    * Scale shape: each side is reduced to (doc_id, md5) AT THE SCAN —
    * the full-outer join shuffles 8+16-byte rows, never text. A NULL
    * text fingerprints to the non-hex sentinel "<null>" (md5 of NULL
    * is NULL, which the presence checks would misread as "row
    * absent" and report a live doc as deleted). */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    def fp(c: Column): Column = coalesce(md5(c), lit("<null>"))
    val o = oldDocs.select(col("doc_id"), fp(col("text")).as("old_fp"))
    val n = newDocs.select(col("doc_id"), fp(col("text")).as("new_fp"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("new_fp").isNull, "deleted")
          .when(col("old_fp").isNull, "added")
          .when(col("old_fp") =!= col("new_fp"), "modified")
          .otherwise("unchanged").as("status"))
      .orderBy("doc_id")
  }

  /** The test-side inverted shingle index as a standalone table —
    * what a CONTINUOUS decontamination pipeline builds once per
    * benchmark release and probes on every ingest batch
    * ([[graft.streaming.DecontamStream]]). Columns (test_id, shingle),
    * hashed shingle space. */
  def testIndex(testDocs: DataFrame, n: Int = 5): DataFrame =
    inverted(testDocs, n).select(col("doc_id").as("test_id"), col("shingle"))

  /** [[decontaminatedKeep]] against a PREBUILT test index: the train
    * rows (full width) surviving the overlap check. Each document's
    * verdict depends only on its own shingles and the static index —
    * the property that makes the streaming form batch-identical
    * regardless of how ingest is batched. The test index broadcasts
    * (benchmarks are tiny by definition); the train side never
    * shuffles for the probe. */
  def decontaminatedKeepAgainstIndex(train: DataFrame, testInv: DataFrame,
      n: Int = 5, minOverlap: Long = 3L): DataFrame = {
    val bad = inverted(train, n)
      .select(col("doc_id").as("train_id"), col("shingle"))
      .join(broadcast(testInv), Seq("shingle"))
      .groupBy("train_id", "test_id").agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
      .select(col("train_id").as("doc_id")).distinct()
    train.join(broadcast(bad), Seq("doc_id"), "left_anti")
  }

  /** Per-test-document contamination COVERAGE: what fraction of each
    * test document's distinct `n`-grams appears anywhere in the train
    * corpus — the diagnostic that tells you whether a benchmark is
    * mildly referenced or wholesale memorizable from training data
    * (pairwise overlap in [[contaminationPairs]] flags documents;
    * this measures depth).
    *
    * Scale shape: the test side is tiny by definition, so its
    * inverted index BROADCASTS and the train corpus is probed without
    * ever shuffling; only matched (test_id, shingle) pairs — bounded
    * by |test shingles| × their train document frequency — reach the
    * distinct-count aggregate. Hashed shingle space as everywhere
    * ([[Dedup.withHashedShingles]]). */
  def contaminationCoverage(docs: DataFrame, isTest: Column,
      n: Int = 5): DataFrame = {
    val inv = inverted(docs, n)
    val testInv = inv.filter(isTest)
      .select(col("doc_id").as("test_id"), col("shingle"))
    val totals = testInv.groupBy("test_id")
      .agg(count(lit(1)).as("n_shingles")) // inverted() emits distinct grams
    val hits = inv.filter(!isTest).select("shingle")
      .join(broadcast(testInv), Seq("shingle"))
      .groupBy("test_id")
      .agg(countDistinct(col("shingle")).as("n_hit"))
    totals.join(hits, Seq("test_id"), "left")
      .select(col("test_id"), col("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("n_shingles").cast("double")).as("coverage"))
      .orderBy("test_id")
  }

  /** Deterministic Bernoulli-by-hash sample: keep a document iff the
    * first two hex digits of md5(doc_id) fall at or below `hexCeil`
    * ("19" ⇒ 26/256 ≈ 10.2%). Membership is a pure function of the
    * doc id — stable across runs, machines, and corpus growth, and
    * train/eval splits can be carved from disjoint hash ranges. */
  def hashSample(docs: DataFrame, hexCeil: String = "19"): DataFrame =
    docs.filter(substring(md5(col("doc_id").cast("string")), 1, 2) <= hexCeil)
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")

  /** Stratified sample: the `quota` documents per stratum (language)
    * that sort first by md5(doc_id) — i.e. a deterministic uniform
    * draw within each stratum, the standard way to rebalance a
    * multilingual corpus. The rank-filter shape lets Spark insert
    * WindowGroupLimit: each map task keeps only its local top-`quota`
    * per stratum before the shuffle. */
  def stratifiedSample(docs: DataFrame, quota: Int = 20): DataFrame = {
    val h = md5(col("doc_id").cast("string"))
    docs.select(col("doc_id"), col("lang"), h.as("h"))
      .withColumn("rk", row_number()
        .over(Window.partitionBy("lang").orderBy(col("h"), col("doc_id")))
        .cast("int"))
      .filter(col("rk") <= quota)
      .select("doc_id", "lang", "rk")
      .orderBy("lang", "rk")
  }

  /** Token-budget shard packing: documents in doc_id order fill shard
    * 0 until `budget` whitespace tokens are consumed, then shard 1,
    * and so on — `shard_id = tokens_before_this_doc div budget` (greedy
    * fill; a doc straddling a boundary belongs to the shard it started
    * in). This is how a corpus becomes fixed-size training shards with
    * a deterministic, order-preserving layout.
    *
    * Two-phase cumulative sum (a global `sum() over (order by ...)`
    * window would drag the whole corpus through ONE partition):
    * documents cumulate inside blocks of `blockSize` ids in parallel,
    * and each block adds a starting offset computed from the per-block
    * totals — a table with one row per block, small enough that its
    * own prefix window is driver-trivial and broadcastable. */
  def packShards(docs: DataFrame, budget: Long = 2048L,
      blockSize: Long = 64L): DataFrame =
    withCumBefore(docs, blockSize)
      .select(col("doc_id"), col("n_tokens"),
        expr(s"cum_before div $budget").as("shard_id"))
      .orderBy("doc_id")

  /** Shard-BALANCE report over [[packShards]]' assignment: per-corpus
    * one-row summary of how even the shards came out (doc counts and
    * token totals per shard, min/max aggregated). Running-sum packing
    * guarantees every full shard holds ≥ budget − max_doc_tokens and
    * ≤ budget + max_doc_tokens tokens; this row is the operational
    * check that the guarantee held (a skewed row here means the
    * token counter or the prefix sum broke, not the data). All exact
    * integers.
    *
    * Scale shape: [[packShards]]' own two-phase prefix sum plus two
    * tiny aggregates (shard-sized, then one row). */
  def shardSkew(docs: DataFrame, budget: Long = 2048L,
      blockSize: Long = 64L): DataFrame =
    // the raw prefix-sum core, NOT packShards: its presentation
    // orderBy would range-exchange rows the aggregate immediately
    // destroys (the sorted-wrapper-vs-raw-core rule, PLANS.md)
    withCumBefore(docs, blockSize)
      .select(expr(s"cum_before div $budget").as("shard_id"), col("n_tokens"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("shard_tokens"))
      .agg(count(lit(1)).as("n_shards"),
        min(col("n_docs")).as("min_docs"), max(col("n_docs")).as("max_docs"),
        min(col("shard_tokens")).as("min_tokens"),
        max(col("shard_tokens")).as("max_tokens"),
        sum(col("shard_tokens")).as("total_tokens"))

  /** (doc_id, n_tokens, cum_before) — corpus-wide running token total
    * BEFORE each doc in id order, via the two-phase prefix sum shared
    * by [[packShards]] and [[packSequences]]. */
  private def withCumBefore(docs: DataFrame, blockSize: Long): DataFrame = {
    val toks = docs.select(
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      expr(s"doc_id div $blockSize").as("blk"))
    val offsets = toks.groupBy("blk").agg(sum("n_tokens").as("blk_tokens"))
      .withColumn("offset", coalesce(
        sum("blk_tokens").over(
          Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("blk", "offset")
    toks.join(broadcast(offsets), Seq("blk"))
      .withColumn("cum_before", col("offset") + coalesce(
        sum("n_tokens").over(Window.partitionBy("blk").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
  }

  /** Sequence PACKING — the tensor-building refinement of
    * [[packShards]]: every document gets its training-sequence id AND
    * its token offsets within that sequence (the layout an example-
    * packing dataloader consumes, with document boundaries kept for
    * attention masking, cf. the packed-sequence preprocessing of GPT/
    * T5-style training). Deterministic greedy stream-packing in
    * doc_id order: a doc starting at corpus token position p lands in
    * sequence p div seqLen at offset p mod seqLen; `straddles` marks
    * docs that cross their sequence's end (the dataloader's
    * truncate-or-wrap decision, surfaced rather than hidden).
    *
    * Same two-phase prefix sum as [[packShards]] — the only
    * unpartitioned window runs over the one-row-per-block offsets
    * table; all per-doc arithmetic is exact integers. */
  def packSequences(docs: DataFrame, seqLen: Long = 2048L,
      blockSize: Long = 64L): DataFrame =
    withCumBefore(docs, blockSize)
      .select(col("doc_id"), col("n_tokens"),
        expr(s"cum_before div $seqLen").as("seq_id"),
        expr(s"cum_before % $seqLen").as("start_tok"),
        (expr(s"cum_before % $seqLen") + col("n_tokens")).as("end_tok"),
        (expr(s"cum_before % $seqLen") + col("n_tokens") > seqLen).as("straddles"))
      .orderBy("doc_id")

  /** Corpus mixing table: per-source document/token totals, each
    * source's share of all tokens, and the repeat factor that would
    * equalize token share across sources (the mixture-weight table a
    * training run consumes, cf. the published per-source weights of
    * The Pile and Dolma).
    *
    * One partial+final hash aggregate over the corpus; the window
    * functions that turn totals into shares run over the AGGREGATED
    * frame — one row per source — so the single-partition window is
    * O(#sources), never O(corpus). */
  /** Per-source quality gate: keep each source's best `keepFrac` of
    * documents by the composite quality score (ties broken by doc_id)
    * — the FineWeb-style curation step that filters every provider to
    * its own bar instead of one global threshold that would empty the
    * noisiest source and keep all of the cleanest.
    *
    * EXACT form: per-source quota k_s = floor(n_s · keepFrac) from a
    * tiny count aggregate (broadcast back), then a row_number window
    * partitioned by source. The window is the honest cost: at 100 TB
    * a hot source is one giant sort partition, so this form is for
    * moderate per-source volumes / backfill audits — the production
    * scan-scale twin is [[qualityGateApprox]], which replaces the
    * rank with an approx-percentile threshold filter (no sort at
    * all) and is contract-checked against this form's quotas. */
  def qualityGate(docs: DataFrame, keepFrac: Double = 0.4): DataFrame = {
    val scored = Dedup.spread(docs).select(col("doc_id"), col("source"),
      graft.operators.TextAnalysis.qualityCol.as("q"))
    val quotas = scored.groupBy("source")
      .agg(floor(count(lit(1)) * keepFrac).cast("long").as("k"))
    val w = Window.partitionBy("source").orderBy(col("q").desc, col("doc_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .join(broadcast(quotas), Seq("source"))
      .filter(col("rnk") <= col("k"))
      .select(col("doc_id"), col("source"), col("q"), col("rnk"))
      .orderBy("doc_id")
  }

  /** The scan-scale quality gate: per-source cutoff from
    * approx_percentile (one pass, mergeable sketch, NO per-source
    * sort), filter q above it. Loses exactness at the boundary — the
    * contract row asserts each source's ACHIEVABLE kept count brackets
    * the exact quota within `tol`, so sketch drift is a red row, not a
    * silent corpus shift. Ties at the cut are counted separately: any
    * kept count in [strictly-above, strictly-above + tied] is
    * realizable by tie-breaking at the boundary, so a duplicate-heavy
    * source with a score atom straddling the percentile (the corpus
    * shape dedup suites model on purpose) widens the bracket instead
    * of false-reding the contract. Output: one row per source with
    * the exact integer counts and the verdict (oracle emits counts +
    * TRUE). */
  def qualityGateApprox(docs: DataFrame, keepFrac: Double = 0.4,
      tol: Double = 0.05): DataFrame = {
    val scored = Dedup.spread(docs).select(col("doc_id"), col("source"),
      graft.operators.TextAnalysis.qualityCol.as("q"))
    val cuts = scored.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      percentile_approx(col("q"), lit(1.0 - keepFrac), lit(10000)).as("cut"))
    val band = greatest(ceil(col("n_docs") * tol), lit(2.0))
    val quota = floor(col("n_docs") * keepFrac)
    scored.join(broadcast(cuts), Seq("source"))
      .groupBy(col("source"), col("n_docs"))
      .agg(sum(when(col("q") > col("cut"), 1L).otherwise(0L)).as("n_above"),
        sum(when(col("q") === col("cut"), 1L).otherwise(0L)).as("n_tied"))
      .select(col("source"), col("n_docs"),
        (quota >= col("n_above") - band &&
          quota <= col("n_above") + col("n_tied") + band).as("within_tol"))
      .orderBy("source")
  }

  /** Deterministic per-epoch data order: each epoch gets its own
    * pseudo-random permutation from a content-independent hash key
    * md5(epoch ":" doc_id) — rerunning a crashed epoch reproduces the
    * identical order on any cluster, and epochs are decorrelated
    * without storing a permutation anywhere. This query form emits
    * each epoch's first `head` positions (the inspectable prefix); the
    * full-scale layout is the same key fed to `repartitionByRange` +
    * `sortWithinPartitions` at write time — a range-sorted epoch
    * directory, NO global window over the corpus (the rank here
    * compiles to WindowGroupLimit: each map partition prunes to
    * `head` rows per epoch before the shuffle). */
  def epochOrder(docs: DataFrame, epochs: Int = 3, head: Int = 20): DataFrame = {
    val w = Window.partitionBy("epoch").orderBy(col("okey"), col("doc_id"))
    docs.select(col("doc_id"))
      .withColumn("epoch", explode(array((1 to epochs).map(lit(_)): _*)))
      .withColumn("okey", md5(concat(col("epoch").cast("string"), lit(":"),
        col("doc_id").cast("string"))))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= head)
      .select(col("epoch"), col("rk"), col("doc_id"), col("okey"))
      .orderBy("epoch", "rk")
  }

  /** Epoch token-budget allocation: split an integer token budget
    * across sources exactly proportionally to their token mass, by
    * largest-remainder apportionment — base_s = ⌊budget·tokens_s /
    * total⌋, then the leftover budget − Σbase goes to the sources with
    * the largest division remainders (ties by source name). The
    * allocations are INTEGERS that sum to the budget exactly — the
    * contract a dataloader schedule needs (float shares never sum
    * clean, and per-engine rounding of shares would drift).
    *
    * All arithmetic is 64-bit integer (div/mod), so the result is
    * bit-identical on any engine and any partitioning. budget·tokens
    * must fit a long — at 10¹³ corpus tokens that bounds budget at
    * ~10⁵; lift to decimal(38,0) if a bigger product is ever needed.
    *
    * Scale shape: one corpus aggregate; every window (total, leftover,
    * remainder rank) runs over the one-row-per-source frame. */
  def mixSchedule(docs: DataFrame, budget: Long = 100000L): DataFrame = {
    val byAll = Window.partitionBy()
    val a = docs.groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      .withColumn("total", sum(col("n_tokens")).over(byAll))
      .withColumn("base", expr(s"(n_tokens * ${budget}L) div total"))
      .withColumn("rem", expr(s"(n_tokens * ${budget}L) % total"))
    a.withColumn("give", lit(budget) - sum(col("base")).over(byAll))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("source"))).cast("long"))
      .select(col("source"), col("n_tokens"), col("base"),
        when(col("rk") <= col("give"), 1L).otherwise(0L).as("extra"),
        (col("base") + when(col("rk") <= col("give"), 1L).otherwise(0L)).as("alloc"))
      .orderBy("source")
  }

  def sourceMix(docs: DataFrame): DataFrame = {
    val agg = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    val all = Window.partitionBy()
    agg.select(
      col("source"), col("n_docs"), col("n_tokens"),
      (col("n_tokens").cast("double") / sum("n_tokens").over(all))
        .as("token_share"),
      (sum("n_tokens").over(all).cast("double") /
        (count(lit(1)).over(all) * col("n_tokens"))).as("uniform_weight"))
      .orderBy("source")
  }

  /** Temperature-scaled mixture weights at α = 1/2 — the standard
    * up-sample-the-tail scheme of multilingual/multi-source training
    * mixtures (cf. the exponent-smoothed sampling of mC4/mT5 and the
    * DoReMi baseline): w_i ∝ share_i^α, here α = 0.5 so the per-row
    * transform is IEEE-correctly-rounded `sqrt`, never libm `pow`.
    *
    * Determinism note — the one subtle step is the normalizer
    * Z = Σ√share_i: a plain double sum's value depends on addition
    * order (partitioning!), so each √share is cast to DECIMAL(38,18)
    * first and summed EXACTLY (order-independent), then the total is
    * cast back to double. Ties in the 18th decimal digit cannot occur
    * for sqrt outputs, so the double→decimal rounding is also
    * engine-agnostic. Same aggregate shape as [[sourceMix]]: the
    * global windows run over the one-row-per-source frame, never the
    * corpus. */
  def temperatureMix(docs: DataFrame): DataFrame = {
    val agg = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    val all = Window.partitionBy()
    val share = col("n_tokens").cast("double") / sum("n_tokens").over(all)
    val scaled = sqrt(share)
    val z = sum(scaled.cast(org.apache.spark.sql.types.DecimalType(38, 18)))
      .over(all).cast("double")
    agg.select(
      col("source"), col("n_docs"), col("n_tokens"),
      share.as("token_share"),
      scaled.as("scaled_share"),
      (scaled / z).as("temp_weight"))
      .orderBy("source")
  }
}
