package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{CorpusOps, Dedup, LshPlanes, Pii, Similarity, TextAnalysis}
import graft.tables.Tables

/** Training-data-pipeline operators (text analysis, dedup, similarity
  * search) as concrete query instances over the `documents` /
  * `embeddings` testdata tables, each paired with a DuckDB oracle.
  *
  * Naming convention: `ta_*` text analysis, `dd_*` deduplication,
  * `ss_*` similarity search, `mm_*` multimodal.
  *
  * Oracle-parity ground rules used throughout:
  *  - doubles are emitted UNrounded and built from the identical
  *    left-associative expression on both engines → bit-identical;
  *  - all hashing is md5 hex STRINGS (lexicographically comparable,
  *    identical in every engine) — never engine-native numeric hashes;
  *  - every query orders by a unique key (doc_id / vec_id / pair).
  */
object PipelineQueries {
  private def docs(s: SparkSession, d: String): DataFrame = Tables.documents(s, d)
  private def emb(s: SparkSession, d: String): DataFrame = Tables.embeddings(s, d)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup — one hash-aggregate on the content hash.
    "dd_exact" -> ((s, d) => Dedup.exact(docs(s, d))),
    // Exact 3-gram Jaccard pairs via inverted shingle index (no O(n²)).
    "dd_ngram_jaccard" -> ((s, d) => Dedup.jaccardPairs(docs(s, d), n = 3, threshold = 0.5)),
    // The PRODUCTION jaccard path: hot shingles (document frequency >
    // maxDocFreq) are dropped from the inverted index before the
    // self-join — the lever that bounds the join's f² fan-out when a
    // corpus has viral boilerplate. The cap is deterministic, so the
    // oracle applies the identical DF filter: this row pins the capped
    // semantics (similarity measured IN the capped shingle space), not
    // just the exact default. maxDocFreq=5 genuinely triggers on the
    // testdata at both gate SFs (max shingle DF is 7 at sf0.01, 25 at
    // sf0.1).
    "dd_ngram_jaccard_capped" -> ((s, d) =>
      Dedup.jaccardPairs(docs(s, d), n = 3, threshold = 0.5, maxDocFreq = Some(5L))),
    // Cross-source near-duplication matrix: the jaccard pair set
    // rolled up by normalized (source, source) — which "independent"
    // sources are actually feeding each other content (the overlap a
    // mixture designer must subtract before weighting).
    "dd_source_overlap" -> ((s, d) =>
      Dedup.sourceOverlap(docs(s, d), n = 3, threshold = 0.5)),
    // Jaccard-band histogram over candidate pairs: one inverted-index
    // pass prices every dedup threshold ≥ 0.2 (the text twin of
    // ss_sim_hist).
    "dd_jaccard_hist" -> ((s, d) =>
      Dedup.jaccardHistogram(docs(s, d), n = 3, lo = 0.2, step = 0.1)),
    // Asymmetric containment pairs (|A∩B|/min side): the subset-copy
    // detector Jaccard is blind to — a short doc quoted whole inside
    // a long host scores J→0 but containment 1.0.
    "dd_containment" -> ((s, d) =>
      Dedup.containmentPairs(docs(s, d), n = 3, minContainment = 0.6)),
    // Shingle document-frequency histogram: the table that sets the
    // maxDocFreq cap (how heavy is the boilerplate tail?).
    "dd_shingle_df_hist" -> ((s, d) =>
      Dedup.shingleDfHistogram(docs(s, d), n = 3)),
    // MinHash + banded LSH candidates, exact-Jaccard verified.
    "dd_minhash_lsh" -> ((s, d) =>
      Dedup.minhashLsh(docs(s, d), n = 3, numHashes = 12, bands = 4, threshold = 0.5)),
    // MinHash estimator-quality contract: signature-agreement Ĵ vs
    // exact Jaccard over the verified pair set; mean |Ĵ−J| ≤ 0.2
    // (oracle = exact pair count + TRUE; matches iff the bound held).
    "dd_minhash_est" -> ((s, d) =>
      Dedup.minhashEstQuality(docs(s, d), n = 3, numHashes = 24, threshold = 0.5)),
    // Per-doc 32-bit SimHash signatures.
    "dd_simhash" -> ((s, d) => Dedup.simhash(docs(s, d))),
    // Near-dup clusters: connected components over the jaccard pairs
    // (min-label propagation; oracle = DuckDB recursive CTE).
    "dd_clusters" -> ((s, d) =>
      Dedup.clusters(Dedup.jaccardPairsRaw(docs(s, d), n = 3, threshold = 0.5))),
    // Cluster-SIZE distribution: how much of the near-dup mass sits in
    // a few mega-clusters vs long-tail pairs — the number that decides
    // whether cluster-collapse dedup is worth running at all.
    "dd_cluster_stats" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      Dedup.clusters(Dedup.jaccardPairsRaw(docs(s, d), n = 3, threshold = 0.5))
        .groupBy("cluster").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
        .select(col("cluster_size"), col("n_clusters"),
          (col("cluster_size") * col("n_clusters")).as("n_docs"))
        .orderBy("cluster_size")
    }),
    // The corpus keep-list after exact + near-dup dedup.
    "dd_keep_list" -> ((s, d) => Dedup.keepList(docs(s, d))),
    // Capstone: the full training-corpus funnel with per-stage counts —
    // raw → predicted-English → quality ≥ 0.6 → dedup survivors.
    // SINGLE PASS: the lang/quality predicates are flag columns on one
    // scan, the keep-list joins in as a third flag, and all four stage
    // counts come out of ONE conditional aggregate — no intersects
    // (each was a full-width shuffle) and no recomputed branches.
    "tp_corpus_funnel" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val all = docs(s, d)
      val kept = Dedup.keepListRaw(all).select(col("doc_id"), lit(true).as("is_kept"))
      all.select(col("doc_id"),
          TextAnalysis.isEnglishCol.as("is_en"),
          (TextAnalysis.qualityCol >= 0.6).as("is_good"))
        .join(kept, Seq("doc_id"), "left")
        .agg(
          count(lit(1)).as("n_raw"),
          sum(when(col("is_en"), 1L).otherwise(0L)).as("n_english"),
          sum(when(col("is_en") && col("is_good"), 1L).otherwise(0L)).as("n_quality"),
          sum(when(col("is_en") && col("is_good") && coalesce(col("is_kept"), lit(false)),
            1L).otherwise(0L)).as("n_final"))
    }),
    // Capstone END PRODUCT: the training manifest itself — every doc
    // surviving language → quality → dedup keep-list → benchmark
    // decontamination, packed into token-budget shards. This is the
    // table a training run actually reads; each stage is the
    // individually-oracle-proven operator, composed. Stage ORDER is
    // the 100 TB shape: the cheap narrow predicates (lang, quality,
    // test-split) run FIRST on one scan, and the expensive pair
    // operators — keep-list dedup and decontamination — see only the
    // filtered candidates (the test side of decontamination stays
    // unfiltered: a benchmark doc must flag a train doc regardless of
    // the benchmark's own quality). Dedup representatives are
    // therefore chosen AMONG candidates — if a cluster's min-id copy
    // failed quality, the next copy represents it, exactly as a real
    // filter-then-dedup pipeline behaves.
    "tp_training_manifest" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      import graft.operators.OpCaches
      val all = docs(s, d)
      val isTest = col("doc_id") % 17 === 0
      // cached: the ~2%-of-corpus candidate set feeds THREE branches
      // (keep-list, decontamination train side, survivors base) — one
      // filtered scan instead of three re-tokenizing predicate passes
      val candidates = OpCaches.track(all
        .filter(TextAnalysis.isEnglishCol && TextAnalysis.qualityCol >= 0.6 &&
          !isTest))
      val kept = Dedup.keepListRaw(candidates)
        .select(col("doc_id"), lit(true).as("is_kept"))
      val clean = CorpusOps.decontaminatedKeep(
          candidates.unionByName(all.filter(isTest)), isTest,
          n = 5, minOverlap = 3L)
        .select(col("doc_id"), lit(true).as("is_clean"))
      val survivors = candidates.select("doc_id", "text")
        .join(kept, Seq("doc_id"), "left")
        .join(clean, Seq("doc_id"), "left")
        .filter(coalesce(col("is_kept"), lit(false)) &&
          coalesce(col("is_clean"), lit(false)))
        .select("doc_id", "text")
      CorpusOps.packShards(survivors, budget = 2048L, blockSize = 64L)
    }),
    // SimHash near-dup pairs, hamming ≤ 3, 8-bit-chunk blocked.
    "dd_simhash_pairs" -> ((s, d) => Dedup.simhashPairs(docs(s, d), maxHamming = 3)),
    // Embedding-cosine near-dup pairs (exact brute-force baseline).
    "ss_cosine_pairs" -> ((s, d) => Similarity.cosinePairs(emb(s, d), threshold = 0.4)),
    // Threshold-sweep histogram: exact pair counts per 0.05 cosine
    // band from 0.3 — pays the block-pair comparison once, reads every
    // candidate dedup cutoff off the bands.
    "ss_sim_hist" -> ((s, d) =>
      Similarity.cosineHistogram(emb(s, d), lo = 0.3, step = 0.05)),
    // Embedding-cosine near-duplicate DOCUMENT pairs: docs joined to
    // their embedding rows, then cosine pairing — the "semantic dedup"
    // stage of a training-data pipeline. Runs the block-pair equi-join
    // form (cosinePairsBlocked): identical pairs to the brute oracle,
    // but the O(n²) work is distributed across block-pair keys with no
    // cartesian/nested-loop node in the plan. (See cosinePairsLsh for
    // the sub-quadratic high-threshold candidate path.)
    "dd_embedding" -> ((s, d) => {
      val e = emb(s, d).join(docs(s, d).select(org.apache.spark.sql.functions.col("doc_id")),
        org.apache.spark.sql.functions.col("vec_id") === org.apache.spark.sql.functions.col("doc_id"))
        .select("vec_id", "embedding")
      Similarity.cosinePairsBlocked(e, threshold = 0.3)
        .toDF("doc_a", "doc_b", "cosine")
    }),
    // The INCREMENTAL dedup path, oracle-checked: documents split into a
    // persisted "corpus" (doc_id % 10 != 0) and a "delta" of new arrivals
    // (doc_id % 10 = 0); deltaPairs joins the delta against the corpus
    // shingle index plus itself — never corpus × corpus. Ground truth is
    // the full jaccard pair set restricted to pairs touching the delta
    // (per-doc shingle sets are corpus-independent, so the restriction
    // is exact). This is the daily-ingest shape at 100 TB: cost
    // O(delta ⋈ index).
    "dd_delta_pairs" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val all = docs(s, d)
      // both index slices come from the ONE shared shingle core
      // (per-doc shingling commutes with the doc_id split) instead of
      // two separate tokenize+shingle passes over the filtered scans
      val sh = Dedup.hashedShingleTable(all, n = 3)
      Dedup.deltaPairsFromIndex(
        Dedup.shingleIndexFrom(sh.filter(col("doc_id") % 10 === 0)),
        Dedup.shingleIndexFrom(sh.filter(col("doc_id") % 10 =!= 0)),
        threshold = 0.5)
    }),
    // The 100 TB shape of the same probe: both sides shingled into ONE
    // capped space (hot set at df > 5, published alongside the index),
    // bounding a viral shingle's delta fan-out at cap × occurrences.
    // The oracle re-derives the capped space independently, so a hash
    // match pins both WHICH pairs drop (boilerplate-only links) and
    // the capped-denominator jaccard values.
    "dd_delta_pairs_capped" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      // one-scan bootstrap: the hot set, capped index, and probe all
      // derive from a single cached shingle pass (the composed
      // hotShingles + shingleIndexCapped form re-shingled the corpus
      // ~2.2× and was the slowest dd row at sf1)
      Dedup.deltaPairsCappedOneScan(docs(s, d),
        isDelta = col("doc_id") % 10 === 0, n = 3, cap = 5L, threshold = 0.5)
    }),
    // Semantic dedup oracle-checked against the brute-force ground
    // truth: the emitted set must BE the exact ≥ 0.45 pair set.
    // Threshold 0.45 is the highest operating point with a non-trivial
    // pair set on the near-isotropic testdata (max pair cosine is 0.51
    // at sf0.01 / 0.60 at sf0.1 — no ≥0.8 pairs exist). That threshold
    // is OUTSIDE hyperplane-LSH's domain: completeness at 0.45 needs
    // tables ≥ 2^bits (the r6 answer was 64 tables × 4 bits), at which
    // point a random pair collides in an expected 4 tables — LSH
    // degenerates to brute force with a 64× scoring multiplier, and
    // the sf1 gate measured exactly that (the candidate join spilled
    // past 79 GB and died). cosinePairsLsh now cost-dispatches: at
    // tables/2^bits ≥ 1 it runs the blocked-exact equi-join (identical
    // pair set, balanced O(n²) work, no candidate blowup); real LSH
    // still runs where the ratio is < 1 (ss_topk_lsh, the ANN index).
    "dd_embedding_lsh" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val e = emb(s, d).join(docs(s, d).select(col("doc_id")),
        col("vec_id") === col("doc_id"))
        .select("vec_id", "embedding")
      Similarity.cosinePairsLsh(e, threshold = 0.45, tables = 64, bits = 4)
        .toDF("doc_a", "doc_b", "cosine")
    }),
    // Brute-force cosine top-10 for the fixed query set
    // {vec_id % 50 = 0 AND vec_id < 2000} (Similarity.QueryCap).
    "ss_topk_brute" -> ((s, d) => Similarity.topkBrute(emb(s, d), queryMod = 50L, k = 10)),
    // Metadata-FILTERED search: top-5 among corpus vectors sharing the
    // query's label — the label equi-join IS the filter pushdown
    // (search-within-a-slice, the production filtered-ANN shape).
    "ss_topk_filtered" -> ((s, d) =>
      Similarity.topkFiltered(emb(s, d), queryMod = 50L, k = 5)),
    // k-NN majority-label vote over the same query set (semantic
    // auto-labeling + its leave-one-out correctness flag).
    "ss_knn_label" -> ((s, d) => Similarity.knnLabel(emb(s, d), queryMod = 50L, k = 10)),
    // LSH-bucketed approximate top-5 (same query set).
    "ss_topk_lsh" -> ((s, d) => Similarity.topkLsh(emb(s, d), queryMod = 50L, k = 5)),
    // The PERSISTED-index form of the same search: build the LSH index
    // through the atomic snapshot protocol (bucketed corpus artifacts),
    // then answer the identical query set from it — oracle-checked
    // end-to-end (build → publish → bucketed read → probe → re-rank)
    // against the same ground truth as ss_topk_lsh (identical plane
    // family ⇒ identical candidates and exact re-rank scores). This is
    // the "index once, query many" path a 100 TB deployment actually
    // runs; the per-query operator recomputes what this one persists.
    "ss_topk_ann_index" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      // deterministic per-sf root, NOT a fresh temp dir: the snapshot
      // protocol retires the previous build on every publish, so
      // repeated runs (bench double-runs, verify rounds) keep disk
      // bounded at one index copy instead of accumulating orphans
      val root = s"${sys.props("java.io.tmpdir")}/graft-annq-${math.abs(d.hashCode)}"
      val e = emb(s, d)
      graft.operators.AnnIndex.build(e, root,
        tables = LshPlanes.numTables, bits = LshPlanes.bitsPerTable, seed = 42L)
      val queries = e.filter(graft.operators.Similarity.isQuery(50L))
        .select(col("vec_id").as("query_id"), col("embedding"))
      graft.operators.AnnIndex.topk(s, root, queries, k = 5)
    }),
    // The IVF probe path (k-means cells, nProbe=4 of 16) is registered
    // ONLY through its oracle-checked contract row below — a raw
    // rows-only entry would sit permanently un-oracled (centroid
    // training isn't SQL) and one never-green row each round is noise
    // that hides real regressions. ss_topk_ivf_recall executes the
    // exact same topkIvf operator; IvfSpec covers its behavior.
    // The IVF CONTRACT, oracle-checked (same pattern as fi_stats_approx):
    // mean recall@5 vs the exact scan must clear a bound. The testdata
    // embeddings are near-isotropic — ANN's worst case (measured mean
    // recall ≈ 0.6 at nProbe 4/16; clustered data gives ≈ 1.0, IvfSpec) —
    // so the asserted bound is 0.4. The oracle projects the exact query
    // count and a literal TRUE; the hash fails iff recall degrades.
    "ss_topk_ivf_recall" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val e = emb(s, d)
      recallContract(e, graft.operators.Ivf.topkIvf(e, queryMod = 50L, k = 5)
        .select(col("query_id"), col("cand_id")))
    }),
    // Recall-vs-nProbe tuning curve under EXACT contracts: recall is
    // provably non-decreasing in nProbe, and the full probe must equal
    // the brute ranking bit-for-bit (recall exactly 1) — violations
    // are bugs, not unlucky data.
    "ss_recall_curve" -> ((s, d) =>
      graft.operators.Ivf.recallCurve(emb(s, d), queryMod = 50L, k = 5,
        nCentroids = 16, probes = Seq(1, 2, 4, 8, 16))),
    // The composed production shape — IVF cell pruning + int8 scoring
    // (FAISS IVF+SQ8) — under the IVF bound: the coarse quantizer is
    // the recall-limiting stage, the int8 ranking loss is noise next
    // to it (ss_quantize_recall pins that stage alone at 0.8).
    "ss_topk_ivfq_recall" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val e = emb(s, d)
      recallContract(e, graft.operators.Ivf.topkIvfQuantized(e, queryMod = 50L, k = 5)
        .select(col("query_id"), col("cand_id")))
    }),
    // Int8 scalar quantization under the same contract, at a HIGH
    // bound: quantization is near-lossless ranking (unlike the lossy
    // cell/bucket pruning above), so mean recall@5 of the pure-int8
    // scan must clear 0.8 — measured ≈ 0.95+ on the testdata; a
    // regression in the quantizer (wrong scale, overflow, truncation
    // instead of round) lands far below it.
    "ss_quantize_recall" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val e = emb(s, d)
      recallContract(e, Similarity.topkQuantized(e, queryMod = 50L, k = 5)
        .select(col("query_id"), col("cand_id")), bound = 0.8)
    }),
    // The PERSISTED-IVF path under the same contract: build the index
    // through the snapshot protocol (inverted lists bucketed by cell,
    // centroids in atomic meta), answer the identical query set from
    // it. Training is deterministic (decimal-exact averaging), so this
    // is bit-identical to ss_topk_ivf — spec-checked in IvfIndexSpec;
    // the oracle row pins the recall CONTRACT of the production
    // "train once, probe many" deployment shape.
    "ss_topk_ivf_index_recall" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      // deterministic per-sf root: repeated runs re-publish through the
      // snapshot protocol (one index copy on disk) instead of
      // accumulating orphan temp dirs
      val root = s"${sys.props("java.io.tmpdir")}/graft-ivfq-${math.abs(d.hashCode)}"
      val e = emb(s, d)
      // idempotent ingest: retrains only when the corpus fingerprint
      // changed — the production train-once/probe-many shape
      graft.operators.IvfIndex.buildIfAbsent(e, root, nCentroids = 16, iters = 2)
      val queries = e.filter(graft.operators.Similarity.isQuery(50L))
        .select(col("vec_id").as("query_id"), col("embedding"))
      recallContract(e, graft.operators.IvfIndex.topk(s, root, queries, k = 5, nProbe = 4)
        .select(col("query_id"), col("cand_id")))
    }),
    // The QUANTIZED persisted index (int8 cells payload, scale in
    // snapshot meta — the FAISS IVF+SQ8 deployment at ~1/6 the index
    // bytes) under the same contract: cell selection is unchanged (the
    // recall-limiting stage sees full precision), ranking runs on the
    // stored codes, integer-exact. Same bound as ss_topk_ivfq_recall —
    // the persisted path composes the identical stages.
    "ss_topk_ivfq_index_recall" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val root = s"${sys.props("java.io.tmpdir")}/graft-ivfq8-${math.abs(d.hashCode)}"
      val e = emb(s, d)
      graft.operators.IvfIndex.buildIfAbsent(e, root, nCentroids = 16, iters = 2,
        quantized = true)
      val queries = e.filter(graft.operators.Similarity.isQuery(50L))
        .select(col("vec_id").as("query_id"), col("embedding"))
      recallContract(e, graft.operators.IvfIndex.topk(s, root, queries, k = 5, nProbe = 4)
        .select(col("query_id"), col("cand_id")))
    }),
    // Embedding-quality outlier scoring: cosine to the label's
    // QUANTIZED centroid direction (integer sums — exact, order-
    // independent, so the distributed aggregate hash-matches the
    // oracle bit-for-bit; a double mean would be neither).
    "ss_outliers" -> ((s, d) =>
      Similarity.labelCentroidCosine(emb(s, d), outlierBelow = 0.05)),
    // SemDeDup contract: cell-blocked semantic pairs must cover the
    // contracted fraction of the EXACT pair set (cosinePairsBlocked —
    // equi-join ground truth, no nested loop). Cross-cell pairs are
    // missed by design; the bound pins how much. The near-isotropic
    // testdata at threshold 0.3 is cell-blocking's WORST case (pairs
    // barely above the median cosine carry no cluster signal):
    // measured coverage ≈ 0.34 (sf0.01) / 0.27 (sf0.1) at k=8 —
    // bound 0.15 (~2× margin). Clustered corpora — the regime SemDeDup
    // is built for — sit at 1.0 (SemanticCellsSpec).
    "dd_semantic_coverage" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val e = emb(s, d)
      val brute = Similarity.cosinePairsBlocked(e, threshold = 0.3)
        .select("vec_a", "vec_b")
      val cells = Similarity.semanticPairsCells(e, threshold = 0.3, nCentroids = 8)
        .select(col("vec_a"), col("vec_b"), lit(1L).as("hit"))
      brute.join(cells, Seq("vec_a", "vec_b"), "left")
        .agg(count(lit(1)).as("n_pairs"),
          coalesce(sum(col("hit")), lit(0L)).as("n_cocell"))
        // empty pair set (tiny sf) → trivially covered, never 0/0
        .select(col("n_pairs"),
          when(col("n_pairs") === 0, lit(true))
            .otherwise(col("n_cocell").cast("double") / col("n_pairs") >= 0.15)
            .as("coverage_ok"))
    }),
    // Token counting — whitespace tokens, distinct tokens, mean length.
    "ta_token_stats" -> ((s, d) => TextAnalysis.tokenStats(docs(s, d))),
    // BPE-ish regex pre-tokenization counts.
    "ta_regex_tokens" -> ((s, d) => TextAnalysis.regexTokenStats(docs(s, d))),
    // Corpus vocabulary: top-20 tokens with document frequency.
    "ta_vocab_top" -> ((s, d) => TextAnalysis.vocabTop(docs(s, d), k = 20)),
    // BM25 retrieval for a fixed query ("spark join dup" spans the
    // idf range: two stop-word-common terms + one rare term), top-20.
    "ta_bm25" -> ((s, d) =>
      TextAnalysis.bm25TopK(docs(s, d), Seq("spark", "join", "dup"), k = 20)),
    // Gopher rule battery (Rae et al. 2021 §A1.1): per-doc lexical
    // stats + each published rule's pass flag + the filter conjunction.
    "ta_gopher_rules" -> ((s, d) => TextAnalysis.gopherRules(docs(s, d))),
    // Per-doc top-5 TF-IDF keywords (rational log-free idf, same
    // Robertson surrogate as ta_bm25).
    "ta_tfidf_top" -> ((s, d) => TextAnalysis.tfidfTopK(docs(s, d), k = 5)),
    // Token-rarity stats vs the corpus's own dfs (log-free
    // self-perplexity surrogate; exact-integer micro-average).
    "ta_rarity" -> ((s, d) => TextAnalysis.rarityStats(docs(s, d))),
    // Bigram-order rarity: mean bigram df + corpus-unique-bigram share
    // (novel-phrasing signal; exact integers, one final division).
    "ta_bigram_rarity" -> ((s, d) => TextAnalysis.bigramRarity(docs(s, d))),
    // Lee et al. 2022 duplicate-text rate: share of each doc's distinct
    // 3-gram shingles that occur in ≥ 1 other document.
    "dd_dup_ngram_rate" -> ((s, d) => Dedup.dupNgramRate(docs(s, d), n = 3)),
    // The positional refinement: longest CONSECUTIVE duplicated-gram
    // run per doc (one copied block vs scattered idioms) + flagged
    // position count — gaps-and-islands over the shared-gram set.
    "dd_dup_spans" -> ((s, d) => Dedup.dupSpans(docs(s, d), n = 3)),
    // Corpus-release diff against a synthetic v2 (deterministic:
    // %7==0 deleted, %5==0 modified, %11==0 re-added under +100000) —
    // added/modified re-enter the pipeline, deleted retires indexes.
    "dd_corpus_diff" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val all = docs(s, d)
      val v2 = all.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .unionByName(all.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      CorpusOps.corpusDiff(all, v2)
    }),
    // Single-row corpus HEALTH dashboard: doc counts, Gopher-pass /
    // PII-free / English shares, the micro-averaged duplicate-ngram
    // rate (exact integer totals → one division, no float averaging),
    // and the near-dup pair count — the one table a pipeline operator
    // checks before green-lighting a crawl snapshot.
    "tp_corpus_health" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val all = docs(s, d)
      val base = all.select(col("doc_id"), col("lang"),
          TextAnalysis.gopherPassCol.as("gp"), Pii.piiFreeCol.as("pf"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("gp"), 1L).otherwise(0L)).as("n_gopher_pass"),
          sum(when(col("pf"), 1L).otherwise(0L)).as("n_pii_free"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))
      val dupAgg = Dedup.dupNgramRateRaw(all, n = 3)
        .agg(sum("n_dup").as("t_dup"), sum("n_sh").as("t_sh"))
      val pairAgg = Dedup.jaccardPairsRaw(all, n = 3, threshold = 0.5)
        .agg(count(lit(1)).as("n_near_dup_pairs"))
      base.crossJoin(broadcast(dupAgg)).crossJoin(broadcast(pairAgg))
        .select(col("n_docs"), col("n_gopher_pass"), col("n_pii_free"), col("n_en"),
          (col("n_gopher_pass").cast("double") / col("n_docs")).as("pct_gopher_pass"),
          (col("n_pii_free").cast("double") / col("n_docs")).as("pct_pii_free"),
          (col("n_en").cast("double") / col("n_docs")).as("pct_en"),
          (col("t_dup").cast("double") / col("t_sh")).as("dup_ngram_rate"),
          col("n_near_dup_pairs"))
    }),
    // tp_corpus_health per SOURCE — which crawl/provider is dragging
    // quality down. Same exact-integer discipline; the dup totals are
    // joined back to sources on doc_id (8-byte keys) and aggregated
    // per source.
    "tp_source_health" -> ((s, d) => {
      import org.apache.spark.sql.functions._
      val all = docs(s, d)
      val base = all.select(col("source"), col("lang"),
          TextAnalysis.gopherPassCol.as("gp"), Pii.piiFreeCol.as("pf"))
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("gp"), 1L).otherwise(0L)).as("n_gopher_pass"),
          sum(when(col("pf"), 1L).otherwise(0L)).as("n_pii_free"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))
      val dup = Dedup.dupNgramRateRaw(all, n = 3)
        .join(all.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy("source").agg(sum("n_dup").as("t_dup"), sum("n_sh").as("t_sh"))
      base.join(dup, Seq("source"))
        .select(col("source"), col("n_docs"),
          (col("n_gopher_pass").cast("double") / col("n_docs")).as("pct_gopher_pass"),
          (col("n_pii_free").cast("double") / col("n_docs")).as("pct_pii_free"),
          (col("n_en").cast("double") / col("n_docs")).as("pct_en"),
          (col("t_dup").cast("double") / col("t_sh")).as("dup_ngram_rate"))
        .orderBy("source")
    }),
    // Per-source exact-duplication scorecard: duplicate docs/chars a
    // dedup pass would delete from each source (keeper = global min
    // doc_id per content hash, credited to its own source).
    "tp_dedup_by_source" -> ((s, d) => Dedup.dedupStatsBySource(docs(s, d))),
    // Count-min-sketch heavy hitters: exact top-10 + the CMS ε-bound
    // verdict (oracle = exact + TRUE; matches iff the bound held).
    "ta_heavy_hitters" -> ((s, d) =>
      TextAnalysis.cmsHeavyHitters(docs(s, d), k = 10)),
    // Quality scoring — length / stopword / vocabulary-diversity signals.
    "ta_quality" -> ((s, d) => TextAnalysis.qualityScore(docs(s, d))),
    // Gopher-style repetition cuts — top-token / top-bigram shares.
    "ta_repetition" -> ((s, d) => TextAnalysis.repetitionStats(docs(s, d))),
    // PII scrub — typed masks + per-category counts, cascade order.
    "ta_pii" -> ((s, d) => Pii.redact(docs(s, d))),
    // Language-ID n-gram heuristic — argmax of char-bigram profiles.
    "ta_lang_id" -> ((s, d) => TextAnalysis.langId(docs(s, d))),
    // The classifier's EVALUATION: labeled-vs-predicted confusion
    // matrix with per-true-language recall shares.
    "ta_langid_eval" -> ((s, d) => TextAnalysis.langIdConfusion(docs(s, d))),
    // Document fingerprinting — full / prefix / winnowing-min hashes.
    "ta_fingerprints" -> ((s, d) => TextAnalysis.fingerprints(docs(s, d))),
    // Sliding-window chunking — 64-token windows every 48 tokens
    // (overlap 16): the corpus → context-window packing step. Oracle
    // re-derives the same windows with list_slice over generate_series.
    "ta_chunks" -> ((s, d) =>
      TextAnalysis.chunk(docs(s, d), chunkSize = 64, stride = 48))
  )

  /** The ANN recall contract shared by the recomputed and persisted
    * IVF paths: mean recall@5 vs the exact scan must clear 0.4 (the
    * near-isotropic-testdata bound — see ss_topk_ivf_recall's comment).
    * `ann` = (query_id, cand_id) for the fixed query set
    * (Similarity.isQuery: vec_id % 50 == 0 AND vec_id < QueryCap, so
    * the brute side stays O(n·const) at any corpus size). */
  private def recallContract(corpus: DataFrame, ann: DataFrame,
      bound: Double = 0.4): DataFrame = {
    import org.apache.spark.sql.functions._
    // the exact ground truth is one artifact per (corpus, query set),
    // consumed by every recall row AND by two plan branches below —
    // share it under the same key/plan as Ivf.recallCurve's baseline
    // so the five contract rows and the curve ride ONE brute pass
    // (value-neutral: sameResult-guarded; isolated mode degrades to a
    // per-query cache released after the row's action)
    val brute = graft.operators.OpCaches.shared("ivf.brute")(
      Similarity.topkBrute(corpus, queryMod = 50L, k = 5)
        .select(col("query_id"), col("cand_id")))
    val hits = brute.join(ann, Seq("query_id", "cand_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
    brute.groupBy("query_id").agg(count(lit(1)).as("n_brute"))
      .join(hits, Seq("query_id"), "left")
      .select((coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_brute"))
        .as("recall"))
      .agg(count(lit(1)).as("n_queries"),
        (avg(col("recall")) >= bound).as("mean_recall_ok"))
  }

  private val T = OracleSql.T
  private def shinglesSql(n: Int): String = OracleSql.shingles(n)

  /** Shared pair-count CTE prefix (ends with relations
    * `common(doc_a, doc_b, n_common)` and `sizes(doc_id, n_sh)`) —
    * the oracle twin of `Dedup.pairCounts`: ONE copy feeds every
    * set-similarity oracle (overlap, histogram, containment) so the
    * pair semantics can never drift between them. */
  private lazy val pairCountsCteSql: String =
    s"""WITH sh AS (SELECT doc_id, ${shinglesSql(3)} AS shingles FROM documents),
       |sizes AS (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_sh FROM sh),
       |inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
       |common AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
       |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)""".stripMargin

  /** [[pairCountsCteSql]] plus the thresholded jaccard step (ends
    * with relation `pairs(doc_a, doc_b, jaccard)`). */
  private def pairsCteSql(threshold: Double): String =
    s"""$pairCountsCteSql,
       |pairs AS (
       |  SELECT doc_a, doc_b,
       |    CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
       |  FROM common JOIN sizes sa ON common.doc_a = sa.doc_id
       |              JOIN sizes sb ON common.doc_b = sb.doc_id
       |  WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= $threshold)""".stripMargin

  /** Shared recursive-CTE cluster labeling (ends with relation
    * `cl(doc_id, cluster)`) — one copy feeds dd_clusters and
    * dd_cluster_stats so the two can never drift. */
  private lazy val clustersCteSql: String =
    s"""WITH RECURSIVE sh AS (SELECT doc_id, ${shinglesSql(3)} AS shingles FROM documents),
       |sizes AS (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_sh FROM sh),
       |inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
       |common AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
       |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |p AS (
       |  SELECT doc_a, doc_b FROM common
       |  JOIN sizes sa ON common.doc_a = sa.doc_id
       |  JOIN sizes sb ON common.doc_b = sb.doc_id
       |  WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.5),
       |e AS (SELECT doc_a AS v, doc_b AS u FROM p
       |      UNION ALL SELECT doc_b AS v, doc_a AS u FROM p),
       |r(v, u) AS (
       |  SELECT DISTINCT v, v AS u FROM e
       |  UNION
       |  SELECT r.v, e.u FROM r JOIN e ON r.u = e.v),
       |cl AS (SELECT v AS doc_id, min(u) AS cluster FROM r GROUP BY v)""".stripMargin

  /** DuckDB twin of Dedup.withSimhash's 32-bit signature sum. */
  private val simhashSql: String = (0 until 32).map { j =>
    s"CASE WHEN len(list_filter(tokmd5, h -> substr(h, ${j + 1}, 1) >= '8')) * 2 " +
      s">= len(tokmd5) THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
  }.mkString(" + ")

  /** DuckDB twins of the langId bigram scores and quality formula
    * (shared by ta_lang_id / ta_quality / tp_corpus_funnel). */
  private def bgSql(b: String) =
    s"(length(text) - length(replace(text, '$b', ''))) / 2"
  private val (sEnSql, sDeSql, sFrSql) = (
    s"${bgSql("th")} + ${bgSql("he")}",
    s"${bgSql("er")} + ${bgSql("in")}",
    s"${bgSql("le")} + ${bgSql("ta")}")
  private val qualitySql: String =
    s"least(CAST(n_chars AS DOUBLE) / 400.0, CAST(1.0 AS DOUBLE)) * 0.4 " +
      s"+ (CAST(1.0 AS DOUBLE) - CAST(len(list_filter($T, t -> t IN ('the', 'a'))) AS DOUBLE) / len($T)) * 0.3 " +
      s"+ CAST(len(list_distinct($T)) AS DOUBLE) / len($T) * 0.3"

  /** DuckDB twin of VectorOps.dot: 64-term left-associative sum
    * (1-based array indexing). */
  private def dotSql(a: String, b: String): String =
    (1 to 64).map(i => s"CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE)").mkString(" + ")

  /** DuckDB twin of VectorOps.norm. */
  private def normSql(v: String): String = s"sqrt(${dotSql(v, v)})"

  /** DuckDB ground truth shared by ss_topk_lsh (per-query operator) and
    * ss_topk_ann_index (persisted-index path): same plane family, same
    * candidates, same exact re-rank. */
  private lazy val topkLshSql: String = {
    import LshPlanes._
    val bucketSelects = (0 until numTables).map(t =>
      s"SELECT vec_id, $t AS tbl, ${keySql("embedding", t, base = 1, duckConcat)} AS bkey FROM embeddings")
      .mkString("\n  UNION ALL ")
    s"""WITH e AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
       |buckets AS (
       |  $bucketSelects),
       |cand AS (SELECT DISTINCT q.vec_id AS query_id, b.vec_id AS cand_id
       |  FROM buckets q JOIN buckets b ON q.tbl = b.tbl AND q.bkey = b.bkey
       |  WHERE q.vec_id % 50 = 0 AND q.vec_id < 2000 AND q.vec_id <> b.vec_id),
       |scored AS (SELECT query_id, cand_id,
       |    (${dotSql("ea.embedding", "eb.embedding")}) / (ea.nrm * eb.nrm) AS cosine
       |  FROM cand JOIN e ea ON cand.query_id = ea.vec_id
       |            JOIN e eb ON cand.cand_id = eb.vec_id),
       |r AS (SELECT query_id, cand_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS INT) AS rnk
       |  FROM scored)
       |SELECT query_id, cand_id, cosine, rnk FROM r WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "dd_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_doc_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin,
    "dd_ngram_jaccard" ->
      s"""WITH sh AS (SELECT doc_id, ${shinglesSql(3)} AS shingles FROM documents),
         |sizes AS (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_sh FROM sh),
         |inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
         |common AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
         |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, n_common,
         |  CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
         |FROM common JOIN sizes sa ON common.doc_a = sa.doc_id
         |            JOIN sizes sb ON common.doc_b = sb.doc_id
         |WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    "dd_source_overlap" ->
      s"""${pairsCteSql(0.5)}
         |SELECT least(da.source, db.source) AS src_a,
         |  greatest(da.source, db.source) AS src_b,
         |  count(*) AS n_pairs,
         |  min(jaccard) AS min_jaccard, max(jaccard) AS max_jaccard
         |FROM pairs JOIN documents da ON pairs.doc_a = da.doc_id
         |           JOIN documents db ON pairs.doc_b = db.doc_id
         |GROUP BY 1, 2
         |ORDER BY src_a, src_b""".stripMargin,
    "dd_shingle_df_hist" ->
      s"""WITH sh AS (SELECT doc_id, ${shinglesSql(3)} AS shingles FROM documents),
         |inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
         |dfs AS (SELECT shingle, count(*) AS df FROM inv GROUP BY shingle)
         |SELECT df, count(*) AS n_shingles FROM dfs
         |GROUP BY df ORDER BY df""".stripMargin,
    "dd_containment" ->
      s"""$pairCountsCteSql
         |SELECT doc_a, doc_b, n_common,
         |  CAST(n_common AS DOUBLE) / sa.n_sh AS cont_a,
         |  CAST(n_common AS DOUBLE) / sb.n_sh AS cont_b
         |FROM common JOIN sizes sa ON common.doc_a = sa.doc_id
         |            JOIN sizes sb ON common.doc_b = sb.doc_id
         |WHERE greatest(CAST(n_common AS DOUBLE) / sa.n_sh,
         |               CAST(n_common AS DOUBLE) / sb.n_sh) >= 0.6
         |ORDER BY doc_a, doc_b""".stripMargin,
    "dd_jaccard_hist" ->
      s"""${pairsCteSql(0.2)},
         |b AS (SELECT least(CAST(floor((jaccard - 0.2) / 0.1) AS INT), 7) AS band
         |  FROM pairs)
         |SELECT band,
         |  0.2 + CAST(band AS DOUBLE) * 0.1 AS band_lo,
         |  0.2 + CAST(band + 1 AS DOUBLE) * 0.1 AS band_hi,
         |  count(*) AS n_pairs
         |FROM b GROUP BY band ORDER BY band""".stripMargin,
    "dd_ngram_jaccard_capped" ->
      s"""WITH sh AS (SELECT doc_id, ${shinglesSql(3)} AS shingles FROM documents),
         |inv0 AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
         |hot AS (SELECT shingle FROM inv0 GROUP BY shingle HAVING count(*) > 5),
         |inv AS (SELECT doc_id, shingle FROM inv0
         |  WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.shingle = inv0.shingle)),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM inv GROUP BY doc_id),
         |common AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
         |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, n_common,
         |  CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
         |FROM common JOIN sizes sa ON common.doc_a = sa.doc_id
         |            JOIN sizes sb ON common.doc_b = sb.doc_id
         |WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    // ground truth for the incremental path = the full pair set
    // restricted to pairs that touch the delta (doc_id % 10 = 0)
    "dd_delta_pairs" ->
      s"""WITH sh AS (SELECT doc_id, ${shinglesSql(3)} AS shingles FROM documents),
         |sizes AS (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_sh FROM sh),
         |inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
         |common AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
         |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
         |FROM common JOIN sizes sa ON common.doc_a = sa.doc_id
         |            JOIN sizes sb ON common.doc_b = sb.doc_id
         |WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.5
         |  AND (doc_a % 10 = 0 OR doc_b % 10 = 0)
         |ORDER BY doc_a, doc_b""".stripMargin,
    // the capped incremental path: same restriction to delta-touching
    // pairs, but the shingle space drops df > 5 shingles FIRST and the
    // sizes come from the capped space (the sizes-after-filter rule)
    "dd_delta_pairs_capped" ->
      s"""WITH sh AS (SELECT doc_id, ${shinglesSql(3)} AS shingles FROM documents),
         |inv0 AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
         |hot AS (SELECT shingle FROM inv0 GROUP BY shingle HAVING count(*) > 5),
         |inv AS (SELECT doc_id, shingle FROM inv0
         |  WHERE NOT EXISTS (SELECT 1 FROM hot WHERE hot.shingle = inv0.shingle)),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM inv GROUP BY doc_id),
         |common AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
         |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
         |FROM common JOIN sizes sa ON common.doc_a = sa.doc_id
         |            JOIN sizes sb ON common.doc_b = sb.doc_id
         |WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.5
         |  AND (doc_a % 10 = 0 OR doc_b % 10 = 0)
         |ORDER BY doc_a, doc_b""".stripMargin,
    // ground truth for the LSH path = the exact brute pair set: a hash
    // match means the candidate scheme missed NOTHING (see the query's
    // comment; precision is exact by the cosine re-rank)
    "dd_embedding_lsh" ->
      s"""WITH j AS (SELECT vec_id, embedding FROM embeddings
         |  JOIN documents ON vec_id = doc_id),
         |e AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM j)
         |SELECT * FROM (
         |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
         |    (${dotSql("a.embedding", "b.embedding")}) / (a.nrm * b.nrm) AS cosine
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
         |WHERE cosine >= 0.45 ORDER BY doc_a, doc_b""".stripMargin,
    // contract row: the pair COUNT is the exact-Jaccard pair count
    // (the same set dd_ngram_jaccard verifies member-by-member), the
    // boolean is the estimator bound's verdict
    "dd_minhash_est" ->
      s"""WITH sh AS (SELECT doc_id, ${shinglesSql(3)} AS shingles FROM documents),
         |sizes AS (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_sh FROM sh),
         |inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
         |common AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
         |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT CAST(count(*) AS BIGINT) AS n_pairs, TRUE AS mean_err_ok
         |FROM common JOIN sizes sa ON common.doc_a = sa.doc_id
         |            JOIN sizes sb ON common.doc_b = sb.doc_id
         |WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.5""".stripMargin,
    "dd_minhash_lsh" -> {
      val mhs = (0 until 12).map(i =>
        s"list_min(list_transform(shingles, s -> md5('$i|' || s))) AS mh$i").mkString(",\n  ")
      val bandSelects = (0 until 4).map { b =>
        val cols = (b * 3 until b * 3 + 3).map(i => s"mh$i").mkString(", ")
        s"SELECT doc_id, $b AS band, md5(concat_ws('|', $cols)) AS bkey FROM sig"
      }.mkString("\n  UNION ALL ")
      s"""WITH sh AS (SELECT doc_id, ${shinglesSql(3)} AS shingles FROM documents),
         |sig AS (SELECT doc_id,
         |  $mhs
         |FROM sh),
         |buckets AS (
         |  $bandSelects),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM buckets a JOIN buckets b
         |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         |v AS (SELECT doc_a, doc_b,
         |    CAST(len(list_filter(sa.shingles, x -> list_contains(sb.shingles, x))) AS BIGINT) AS n_common,
         |    len(sa.shingles) AS la, len(sb.shingles) AS lb
         |  FROM cand JOIN sh sa ON cand.doc_a = sa.doc_id
         |            JOIN sh sb ON cand.doc_b = sb.doc_id)
         |SELECT doc_a, doc_b,
         |  CAST(n_common AS DOUBLE) / (la + lb - n_common) AS jaccard
         |FROM v WHERE CAST(n_common AS DOUBLE) / (la + lb - n_common) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    // string-shingle twin of the hashed-space Spark plan: counts agree
    // positional (non-distinct) grams; islands via pos − row_number
    // (1-based vs Spark's 0-based pos — a constant shift, so runs and
    // counts are identical); shared set = distinct-doc df ≥ 2
    "dd_dup_spans" ->
      s"""WITH base AS (SELECT doc_id, $T AS T FROM documents),
         |pg AS (SELECT doc_id, T,
         |    unnest(generate_series(1, greatest(len(T) - 2, 1))) AS pos FROM base),
         |g AS (SELECT doc_id, pos,
         |    array_to_string(list_slice(T, pos, pos + 2), ' ') AS gram FROM pg),
         |shared AS (SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM g)
         |  GROUP BY gram HAVING count(*) >= 2),
         |f AS (SELECT doc_id, pos FROM g JOIN shared USING (gram)),
         |runs AS (SELECT doc_id,
         |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM f),
         |r AS (SELECT doc_id, count(*) AS run FROM runs GROUP BY doc_id, grp),
         |agg AS (SELECT doc_id, CAST(sum(run) AS BIGINT) AS n_dup_grams,
         |    CAST(max(run) AS BIGINT) AS max_run FROM r GROUP BY doc_id),
         |sz AS (SELECT doc_id,
         |    CAST(greatest(len($T) - 2, 1) AS BIGINT) AS n_grams FROM documents)
         |SELECT sz.doc_id, n_grams,
         |  coalesce(n_dup_grams, 0) AS n_dup_grams,
         |  coalesce(max_run, 0) AS max_run
         |FROM sz LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,
    // modulo 64-bit shingle-hash collisions (~|sh|²/2⁶⁵ — immaterial),
    // same convention as the dd_ngram_jaccard family.
    "dd_dup_ngram_rate" ->
      s"""WITH sh AS (SELECT doc_id, ${shinglesSql(3)} AS shingles FROM documents),
         |sizes AS (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_sh FROM sh),
         |inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
         |shared AS (SELECT shingle FROM inv GROUP BY shingle HAVING count(*) >= 2),
         |dup AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup
         |  FROM inv JOIN shared USING (shingle) GROUP BY doc_id)
         |SELECT s.doc_id, s.n_sh,
         |  CAST(coalesce(d.n_dup, 0) AS BIGINT) AS n_dup,
         |  CAST(coalesce(d.n_dup, 0) AS DOUBLE) / CAST(s.n_sh AS DOUBLE) AS dup_rate
         |FROM sizes s LEFT JOIN dup d USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "tp_source_health" ->
      s"""WITH f AS (SELECT doc_id, source, lang,
         |    (len($T) >= 50 AND len($T) <= 100000
         |     AND (CAST(length(text) AS DOUBLE) - CAST(len($T) - 1 AS DOUBLE))
         |       / CAST(len($T) AS DOUBLE) >= 3.0
         |     AND (CAST(length(text) AS DOUBLE) - CAST(len($T) - 1 AS DOUBLE))
         |       / CAST(len($T) AS DOUBLE) <= 10.0
         |     AND len(list_filter($T, t -> t IN ('the', 'a'))) >= 2
         |     AND CAST(len(list_filter($T, t -> regexp_matches(t, '^[a-z]+$$'))) AS DOUBLE)
         |       / CAST(len($T) AS DOUBLE) >= 0.8) AS gp,
         |    (len(regexp_extract_all(text, '${Pii.EmailRe}')) = 0
         |     AND len(regexp_extract_all(text, '${Pii.CardRe}')) = 0
         |     AND len(regexp_extract_all(text, '${Pii.PhoneRe}')) = 0
         |     AND len(regexp_extract_all(text, '${Pii.Ipv4Re}')) = 0) AS pf
         |  FROM documents),
         |base AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(CASE WHEN gp THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher_pass,
         |    CAST(sum(CASE WHEN pf THEN 1 ELSE 0 END) AS BIGINT) AS n_pii_free,
         |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
         |  FROM f GROUP BY source),
         |sh AS (SELECT doc_id, ${shinglesSql(3)} AS shingles FROM documents),
         |sizes AS (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_sh FROM sh),
         |inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
         |shared AS (SELECT shingle FROM inv GROUP BY shingle HAVING count(*) >= 2),
         |dup AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup
         |  FROM inv JOIN shared USING (shingle) GROUP BY doc_id),
         |dupsrc AS (SELECT d.source,
         |    CAST(sum(coalesce(p.n_dup, 0)) AS BIGINT) AS t_dup,
         |    CAST(sum(s.n_sh) AS BIGINT) AS t_sh
         |  FROM sizes s LEFT JOIN dup p USING (doc_id)
         |  JOIN documents d USING (doc_id)
         |  GROUP BY d.source)
         |SELECT source, n_docs,
         |  CAST(n_gopher_pass AS DOUBLE) / n_docs AS pct_gopher_pass,
         |  CAST(n_pii_free AS DOUBLE) / n_docs AS pct_pii_free,
         |  CAST(n_en AS DOUBLE) / n_docs AS pct_en,
         |  CAST(t_dup AS DOUBLE) / t_sh AS dup_ngram_rate
         |FROM base JOIN dupsrc USING (source)
         |ORDER BY source""".stripMargin,
    "tp_dedup_by_source" ->
      """WITH g AS (
        |  SELECT md5(text) AS fp, source, COUNT(*) AS n,
        |    MIN(doc_id) AS src_min, MIN(n_chars) AS n_chars
        |  FROM documents GROUP BY 1, 2),
        |k AS (SELECT fp, MIN(src_min) AS keeper FROM g GROUP BY fp)
        |SELECT source,
        |  CAST(SUM(n) AS BIGINT) AS n_docs,
        |  CAST(SUM(n - CASE WHEN src_min = keeper THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_docs,
        |  CAST(SUM(n - CASE WHEN src_min = keeper THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(SUM(n) AS DOUBLE) AS dup_rate,
        |  CAST(SUM((n - CASE WHEN src_min = keeper THEN 1 ELSE 0 END) * n_chars)
        |    AS BIGINT) AS chars_dup
        |FROM g JOIN k USING (fp)
        |GROUP BY source ORDER BY source""".stripMargin,
    "dd_corpus_diff" ->
      """WITH oldv AS (SELECT doc_id, md5(text) AS old_fp FROM documents),
        |newv AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END) AS new_fp
        |  FROM documents WHERE doc_id % 7 <> 0
        |  UNION ALL
        |  SELECT doc_id + 100000, md5(text) FROM documents WHERE doc_id % 11 = 0)
        |SELECT doc_id,
        |  CASE WHEN new_fp IS NULL THEN 'deleted'
        |       WHEN old_fp IS NULL THEN 'added'
        |       WHEN old_fp <> new_fp THEN 'modified'
        |       ELSE 'unchanged' END AS status
        |FROM oldv FULL OUTER JOIN newv USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // health dashboard: every share from exact integer counts; the
    // dup-ngram rate is micro-averaged (Σn_dup / Σn_sh) so no float
    // accumulates across rows
    "tp_corpus_health" ->
      s"""WITH f AS (SELECT doc_id, lang,
         |    (len($T) >= 50 AND len($T) <= 100000
         |     AND (CAST(length(text) AS DOUBLE) - CAST(len($T) - 1 AS DOUBLE))
         |       / CAST(len($T) AS DOUBLE) >= 3.0
         |     AND (CAST(length(text) AS DOUBLE) - CAST(len($T) - 1 AS DOUBLE))
         |       / CAST(len($T) AS DOUBLE) <= 10.0
         |     AND len(list_filter($T, t -> t IN ('the', 'a'))) >= 2
         |     AND CAST(len(list_filter($T, t -> regexp_matches(t, '^[a-z]+$$'))) AS DOUBLE)
         |       / CAST(len($T) AS DOUBLE) >= 0.8) AS gp,
         |    (len(regexp_extract_all(text, '${Pii.EmailRe}')) = 0
         |     AND len(regexp_extract_all(text, '${Pii.CardRe}')) = 0
         |     AND len(regexp_extract_all(text, '${Pii.PhoneRe}')) = 0
         |     AND len(regexp_extract_all(text, '${Pii.Ipv4Re}')) = 0) AS pf
         |  FROM documents),
         |base AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(CASE WHEN gp THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher_pass,
         |    CAST(sum(CASE WHEN pf THEN 1 ELSE 0 END) AS BIGINT) AS n_pii_free,
         |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en
         |  FROM f),
         |sh AS (SELECT doc_id, ${shinglesSql(3)} AS shingles FROM documents),
         |sizes AS (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_sh FROM sh),
         |inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
         |shared AS (SELECT shingle FROM inv GROUP BY shingle HAVING count(*) >= 2),
         |dup AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup
         |  FROM inv JOIN shared USING (shingle) GROUP BY doc_id),
         |dupagg AS (SELECT
         |    CAST(sum(coalesce(d.n_dup, 0)) AS BIGINT) AS t_dup,
         |    CAST(sum(s.n_sh) AS BIGINT) AS t_sh
         |  FROM sizes s LEFT JOIN dup d USING (doc_id)),
         |common AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
         |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (SELECT CAST(count(*) AS BIGINT) AS n_near_dup_pairs
         |  FROM common JOIN sizes sa ON common.doc_a = sa.doc_id
         |              JOIN sizes sb ON common.doc_b = sb.doc_id
         |  WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.5)
         |SELECT n_docs, n_gopher_pass, n_pii_free, n_en,
         |  CAST(n_gopher_pass AS DOUBLE) / n_docs AS pct_gopher_pass,
         |  CAST(n_pii_free AS DOUBLE) / n_docs AS pct_pii_free,
         |  CAST(n_en AS DOUBLE) / n_docs AS pct_en,
         |  CAST(t_dup AS DOUBLE) / t_sh AS dup_ngram_rate,
         |  n_near_dup_pairs
         |FROM base, dupagg, pairs""".stripMargin,
    "dd_clusters" ->
      s"""$clustersCteSql
         |SELECT doc_id, cluster FROM cl ORDER BY doc_id""".stripMargin,
    "dd_cluster_stats" ->
      s"""$clustersCteSql,
         |sz AS (SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n FROM cl GROUP BY cluster)
         |SELECT n AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
         |  CAST(n * COUNT(*) AS BIGINT) AS n_docs
         |FROM sz GROUP BY n ORDER BY cluster_size""".stripMargin,
    "dd_keep_list" ->
      s"""WITH RECURSIVE ek AS (
         |  SELECT doc_id, text FROM (
         |    SELECT doc_id, text, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
         |    FROM documents)
         |  WHERE doc_id = keep_id),
         |sh AS (SELECT doc_id, ${shinglesSql(3)} AS shingles FROM ek),
         |sizes AS (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_sh FROM sh),
         |inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
         |common AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
         |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |p AS (
         |  SELECT doc_a, doc_b FROM common
         |  JOIN sizes sa ON common.doc_a = sa.doc_id
         |  JOIN sizes sb ON common.doc_b = sb.doc_id
         |  WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.5),
         |e AS (SELECT doc_a AS v, doc_b AS u FROM p
         |      UNION ALL SELECT doc_b AS v, doc_a AS u FROM p),
         |r(v, u) AS (
         |  SELECT DISTINCT v, v AS u FROM e
         |  UNION
         |  SELECT r.v, e.u FROM r JOIN e ON r.u = e.v),
         |lab AS (SELECT v, min(u) AS cluster FROM r GROUP BY v)
         |SELECT ek.doc_id FROM ek
         |WHERE NOT EXISTS (SELECT 1 FROM lab
         |  WHERE lab.v = ek.doc_id AND lab.cluster <> ek.doc_id)
         |ORDER BY ek.doc_id""".stripMargin,
    "dd_simhash" ->
      s"""WITH tm AS (SELECT doc_id, list_transform($T, t -> md5(t)) AS tokmd5 FROM documents)
         |SELECT doc_id, $simhashSql AS simhash
         |FROM tm ORDER BY doc_id""".stripMargin,
    "dd_simhash_pairs" -> {
      val chunkSelects = (0 until 4).map(c =>
        s"SELECT doc_id, simhash, $c AS chunk, (simhash >> ${8 * c}) & 255 AS cval FROM s")
        .mkString("\n  UNION ALL ")
      s"""WITH tm AS (SELECT doc_id, list_transform($T, t -> md5(t)) AS tokmd5 FROM documents),
         |s AS (SELECT doc_id, $simhashSql AS simhash FROM tm),
         |chunks AS (
         |  $chunkSelects),
         |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         |  FROM chunks a JOIN chunks b
         |    ON a.chunk = b.chunk AND a.cval = b.cval AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, hamming FROM p WHERE hamming <= 3
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    "ss_cosine_pairs" ->
      s"""WITH e AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings)
         |SELECT * FROM (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |    (${dotSql("a.embedding", "b.embedding")}) / (a.nrm * b.nrm) AS cosine
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
         |WHERE cosine >= 0.4 ORDER BY vec_a, vec_b""".stripMargin,
    // same pair stream as ss_cosine_pairs' oracle; identical IEEE
    // banding arithmetic (floor((c - lo)/step), clamp at the top band)
    "ss_sim_hist" ->
      s"""WITH e AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
         |p AS (
         |  SELECT (${dotSql("a.embedding", "b.embedding")}) / (a.nrm * b.nrm) AS cosine
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id),
         |f AS (SELECT LEAST(CAST(FLOOR((cosine - 0.3) / 0.05) AS INT), 13) AS band
         |  FROM p WHERE cosine >= 0.3)
         |SELECT band,
         |  0.3 + CAST(band AS DOUBLE) * 0.05 AS band_lo,
         |  0.3 + CAST(band + 1 AS DOUBLE) * 0.05 AS band_hi,
         |  CAST(COUNT(*) AS BIGINT) AS n_pairs
         |FROM f GROUP BY band ORDER BY band""".stripMargin,
    "dd_embedding" ->
      s"""WITH j AS (SELECT vec_id, embedding FROM embeddings
         |  JOIN documents ON vec_id = doc_id),
         |e AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM j)
         |SELECT * FROM (
         |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
         |    (${dotSql("a.embedding", "b.embedding")}) / (a.nrm * b.nrm) AS cosine
         |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
         |WHERE cosine >= 0.3 ORDER BY doc_a, doc_b""".stripMargin,
    // the oracle recomputes the quantized-integer centroid sums in SQL
    // — the exact arithmetic twin of labelCentroidCosine, independent
    // formulation of the same integers
    "ss_outliers" -> {
      val sums = (1 to 64).map(i =>
        s"SUM(CAST(round(CAST(embedding[$i] AS DOUBLE) * 1000, 0) AS BIGINT)) AS s${i - 1}")
        .mkString(", ")
      val dotVC = (1 to 64).map(i =>
        s"CAST(q.embedding[$i] AS DOUBLE) * CAST(c.s${i - 1} AS DOUBLE)").mkString(" + ")
      val dotCC = (1 to 64).map(i =>
        s"CAST(c.s${i - 1} AS DOUBLE) * CAST(c.s${i - 1} AS DOUBLE)").mkString(" + ")
      s"""WITH c AS (SELECT label, $sums FROM embeddings GROUP BY label),
         |scored AS (
         |  SELECT q.vec_id, q.label,
         |    round(($dotVC) / (${normSql("q.embedding")} * sqrt($dotCC)), 6) + 0.0 AS cent_cos
         |  FROM embeddings q JOIN c ON q.label = c.label)
         |SELECT vec_id, label, cent_cos, cent_cos < 0.05 AS is_outlier
         |FROM scored ORDER BY vec_id""".stripMargin
    },
    // exact pair count from SQL; the co-cell coverage bound is the
    // Spark-side boolean (k-means cells are not SQL-expressible)
    "dd_semantic_coverage" ->
      s"""WITH e AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
         |p AS (
         |  SELECT a.vec_id FROM e a JOIN e b ON a.vec_id < b.vec_id
         |  WHERE (${dotSql("a.embedding", "b.embedding")}) / (a.nrm * b.nrm) >= 0.3)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs, TRUE AS coverage_ok FROM p""".stripMargin,
    "ss_topk_filtered" ->
      s"""WITH e AS (SELECT vec_id, label, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS query_id, q.label AS label, c.vec_id AS cand_id,
         |    (${dotSql("q.embedding", "c.embedding")}) / (q.nrm * c.nrm) AS cosine
         |  FROM e q JOIN e c ON q.label = c.label
         |  WHERE q.vec_id % 50 = 0 AND q.vec_id < 2000 AND q.vec_id <> c.vec_id),
         |r AS (SELECT query_id, label, cand_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS INT) AS rnk
         |  FROM scored)
         |SELECT query_id, label, cand_id, cosine, rnk FROM r WHERE rnk <= 5
         |ORDER BY query_id, rnk""".stripMargin,
    "ss_topk_brute" ->
      s"""WITH e AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |    (${dotSql("q.embedding", "c.embedding")}) / (q.nrm * c.nrm) AS cosine
         |  FROM e q JOIN e c ON q.vec_id % 50 = 0 AND q.vec_id < 2000 AND q.vec_id <> c.vec_id),
         |r AS (SELECT query_id, cand_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS INT) AS rnk
         |  FROM scored)
         |SELECT query_id, cand_id, cosine, rnk FROM r WHERE rnk <= 10
         |ORDER BY query_id, rnk""".stripMargin,
    // identical top-k ground truth -> majority vote; tie-break
    // (votes desc, label asc) mirrored exactly
    "ss_knn_label" ->
      s"""WITH e AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |    (${dotSql("q.embedding", "c.embedding")}) / (q.nrm * c.nrm) AS cosine
         |  FROM e q JOIN e c ON q.vec_id % 50 = 0 AND q.vec_id < 2000 AND q.vec_id <> c.vec_id),
         |r AS (SELECT query_id, cand_id,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS INT) AS rnk
         |  FROM scored),
         |v AS (SELECT r.query_id, emb.label, CAST(count(*) AS BIGINT) AS votes
         |  FROM r JOIN embeddings emb ON r.cand_id = emb.vec_id
         |  WHERE r.rnk <= 10 GROUP BY 1, 2),
         |w AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY votes DESC, label) AS INT) AS rk FROM v)
         |SELECT w.query_id, w.label AS predicted_label, w.votes,
         |  t.label AS true_label, w.label = t.label AS correct
         |FROM w JOIN embeddings t ON w.query_id = t.vec_id
         |WHERE w.rk = 1 ORDER BY w.query_id""".stripMargin,
    "ss_topk_lsh" -> topkLshSql,
    // the persisted-index run answers the IDENTICAL query with the
    // identical plane family — one ground truth, two execution paths
    "ss_topk_ann_index" -> topkLshSql,
    "ss_topk_ivf_recall" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS mean_recall_ok
        |FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 2000)""".stripMargin,
    // exact-property contract row (see the query comment)
    "ss_recall_curve" ->
      """SELECT CAST(5 AS BIGINT) AS n_probes_tested,
        |  TRUE AS monotone_ok, TRUE AS full_probe_exact""".stripMargin,
    // identical contract for the IVF+int8 composition
    "ss_topk_ivfq_recall" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS mean_recall_ok
        |FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 2000)""".stripMargin,
    // identical contract shape at the int8-quantization bound (0.8)
    "ss_quantize_recall" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS mean_recall_ok
        |FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 2000)""".stripMargin,
    // identical contract for the persisted-index path
    "ss_topk_ivf_index_recall" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS mean_recall_ok
        |FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 2000)""".stripMargin,
    // identical contract for the QUANTIZED persisted-index path
    "ss_topk_ivfq_index_recall" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_queries, TRUE AS mean_recall_ok
        |FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 2000)""".stripMargin,
    "ta_token_stats" ->
      s"""SELECT doc_id,
         |  CAST(len($T) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct($T)) AS BIGINT) AS n_distinct_tokens,
         |  CAST(n_chars - len($T) + 1 AS DOUBLE) / len($T) AS avg_token_len
         |FROM documents ORDER BY doc_id""".stripMargin,
    // mean_word_len = (chars − (n−1) single-space separators) / n —
    // identical left-associative double expression as the Spark side.
    "ta_gopher_rules" ->
      s"""WITH g AS (SELECT doc_id,
         |    CAST(len($T) AS BIGINT) AS n_words,
         |    (CAST(length(text) AS DOUBLE) - CAST(len($T) - 1 AS DOUBLE))
         |      / CAST(len($T) AS DOUBLE) AS mean_word_len,
         |    CAST(len(list_filter($T, t -> t IN ('the', 'a'))) AS BIGINT) AS n_stop,
         |    CAST(len(list_filter($T, t -> regexp_matches(t, '^[a-z]+$$'))) AS DOUBLE)
         |      / CAST(len($T) AS DOUBLE) AS frac_alpha
         |  FROM documents)
         |SELECT doc_id, n_words, mean_word_len, n_stop, frac_alpha,
         |  (n_words >= 50 AND n_words <= 100000) AS pass_words,
         |  (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS pass_mean_len,
         |  (n_stop >= 2) AS pass_stop,
         |  (frac_alpha >= 0.8) AS pass_alpha,
         |  ((n_words >= 50 AND n_words <= 100000)
         |    AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
         |    AND n_stop >= 2 AND frac_alpha >= 0.8) AS pass_all
         |FROM g ORDER BY doc_id""".stripMargin,
    // every aggregate is an exact integer; mean_df is one division
    "ta_rarity" ->
      s"""WITH tk AS (SELECT doc_id, unnest($T) AS term FROM documents),
         |postings AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM tk GROUP BY 1, 2),
         |dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM postings GROUP BY 1)
         |SELECT doc_id,
         |  CAST(sum(tf) AS BIGINT) AS n_tokens,
         |  CAST(sum(tf * df) AS BIGINT) AS sum_df,
         |  CAST(min(df) AS BIGINT) AS min_df,
         |  CAST(sum(tf * df) AS DOUBLE) / CAST(sum(tf) AS DOUBLE) AS mean_df
         |FROM postings JOIN dfs USING (term)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // bigram multiset = adjacent token pairs (short docs clamp to one
    // truncated gram, same greatest(...,1) convention as the shingle
    // helper); stats are exact ints + two final divisions
    "ta_bigram_rarity" ->
      s"""WITH bg AS (SELECT doc_id,
         |    unnest(list_transform(generate_series(1, greatest(len($T) - 1, 1)),
         |      i -> array_to_string(list_slice($T, i, i + 1), ' '))) AS term
         |  FROM documents),
         |postings AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM bg GROUP BY 1, 2),
         |dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM postings GROUP BY 1)
         |SELECT doc_id,
         |  CAST(sum(tf) AS BIGINT) AS n_bigrams,
         |  CAST(sum(tf * df) AS BIGINT) AS sum_df,
         |  CAST(min(df) AS BIGINT) AS min_df,
         |  CAST(sum(tf * df) AS DOUBLE) / CAST(sum(tf) AS DOUBLE) AS mean_df,
         |  CAST(sum(CASE WHEN df = 1 THEN tf ELSE 0 END) AS DOUBLE)
         |    / CAST(sum(tf) AS DOUBLE) AS uniq_frac
         |FROM postings JOIN dfs USING (term)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // score = tf · (N − df + 0.5)/(df + 0.5), the same rational
    // log-free idf as ta_bm25, composed left-associatively on both
    // engines; row_number ties broken by term.
    "ta_tfidf_top" ->
      s"""WITH tk AS (SELECT doc_id, unnest($T) AS term FROM documents),
         |postings AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM tk GROUP BY 1, 2),
         |dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM postings GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |scored AS (SELECT doc_id, term, tf, df,
         |    CAST(tf AS DOUBLE) * ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
         |      / (CAST(df AS DOUBLE) + 0.5)) AS score
         |  FROM postings JOIN dfs USING (term) CROSS JOIN n),
         |ranked AS (SELECT *, row_number() OVER
         |    (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
         |  FROM scored)
         |SELECT doc_id, term, tf, df, score FROM ranked WHERE rk <= 5
         |ORDER BY doc_id, score DESC, term""".stripMargin,
    "ta_regex_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_alpha_runs,
        |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_digit_runs,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_pieces
        |FROM documents ORDER BY doc_id""".stripMargin,
    "ta_vocab_top" ->
      s"""SELECT token, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
         |FROM (SELECT doc_id, unnest($T) AS token FROM documents)
         |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,
    // the oracle asserts the CONTRACT (exact top-k, bound held)
    "ta_heavy_hitters" ->
      s"""SELECT token, CAST(count(*) AS BIGINT) AS n, TRUE AS within_bound
         |FROM (SELECT unnest($T) AS token FROM documents)
         |GROUP BY token ORDER BY n DESC, token LIMIT 10""".stripMargin,
    // BM25 mirror: identical rational idf, identical left-associative
    // double expressions, fixed per-term summation order (see
    // TextAnalysis.bm25TopK's determinism notes; 2.2 == 1.2 + 1.0 and
    // 0.25 == 1.0 - 0.75 exactly in binary64, so literals are safe)
    "ta_bm25" ->
      s"""WITH lens AS (SELECT doc_id, CAST(len($T) AS BIGINT) AS dl FROM documents),
         |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM lens),
         |p AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, CAST(len($T) AS BIGINT) AS dl, unnest($T) AS term
         |        FROM documents)
         |  WHERE term IN ('spark', 'join', 'dup') GROUP BY doc_id, dl, term),
         |d AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY term),
         |sc AS (SELECT p.doc_id, p.term,
         |  ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
         |    * (CAST(tf AS DOUBLE) * 2.2)
         |    / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl)) AS part
         |  FROM p CROSS JOIN stats JOIN d USING (term)),
         |g AS (SELECT doc_id,
         |  coalesce(max(CASE WHEN term = 'spark' THEN part END), 0.0) AS part_spark,
         |  coalesce(max(CASE WHEN term = 'join' THEN part END), 0.0) AS part_join,
         |  coalesce(max(CASE WHEN term = 'dup' THEN part END), 0.0) AS part_dup
         |  FROM sc GROUP BY doc_id)
         |SELECT doc_id, part_spark + part_join + part_dup AS score FROM g
         |WHERE part_spark + part_join + part_dup > 0.0
         |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "ta_quality" ->
      s"""SELECT doc_id,
         |  least(CAST(n_chars AS DOUBLE) / 400.0, CAST(1.0 AS DOUBLE)) AS len_score,
         |  CAST(len(list_filter($T, t -> t IN ('the', 'a'))) AS DOUBLE) / len($T) AS stopword_ratio,
         |  CAST(len(list_distinct($T)) AS DOUBLE) / len($T) AS distinct_ratio,
         |  least(CAST(n_chars AS DOUBLE) / 400.0, CAST(1.0 AS DOUBLE)) * 0.4
         |    + (CAST(1.0 AS DOUBLE) - CAST(len(list_filter($T, t -> t IN ('the', 'a'))) AS DOUBLE) / len($T)) * 0.3
         |    + CAST(len(list_distinct($T)) AS DOUBLE) / len($T) * 0.3 AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,
    "ta_repetition" ->
      s"""WITH b AS (
         |  SELECT doc_id, $T AS T, len($T) AS n,
         |    list_transform(generate_series(1, len($T) - 1),
         |                   i -> $T[i] || ' ' || $T[i + 1]) AS BG
         |  FROM documents),
         |ta AS (
         |  SELECT doc_id, max(c) AS top_tok, count(*) AS u
         |  FROM (SELECT doc_id, t, count(*) AS c
         |        FROM (SELECT doc_id, unnest(T) AS t FROM b) GROUP BY doc_id, t)
         |  GROUP BY doc_id),
         |ba AS (
         |  SELECT doc_id, max(c) AS top_bg
         |  FROM (SELECT doc_id, g, count(*) AS c
         |        FROM (SELECT doc_id, unnest(BG) AS g FROM b) GROUP BY doc_id, g)
         |  GROUP BY doc_id)
         |SELECT b.doc_id,
         |  CAST(ta.top_tok AS DOUBLE) / b.n AS top_token_frac,
         |  CAST(b.n - ta.u AS DOUBLE) / b.n AS dup_token_frac,
         |  CAST(coalesce(ba.top_bg, 0) AS DOUBLE) / greatest(b.n - 1, 1) AS top_bigram_frac,
         |  (CAST(ta.top_tok AS DOUBLE) / b.n >= 0.125
         |   OR CAST(coalesce(ba.top_bg, 0) AS DOUBLE) / greatest(b.n - 1, 1) >= 0.05) AS repetitive
         |FROM b JOIN ta USING (doc_id) LEFT JOIN ba USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "ta_pii" ->
      s"""WITH r AS (
         |  SELECT doc_id, text AS t0,
         |         regexp_replace(text, '${Pii.EmailRe}', '<EMAIL>', 'g') AS t1
         |  FROM documents),
         |r2 AS (SELECT *, regexp_replace(t1, '${Pii.CardRe}', '<CARD>', 'g') AS t2 FROM r),
         |r3 AS (SELECT *, regexp_replace(t2, '${Pii.PhoneRe}', '<PHONE>', 'g') AS t3 FROM r2)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t0, '${Pii.EmailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(t1, '${Pii.CardRe}')) AS BIGINT) AS n_cards,
         |  CAST(len(regexp_extract_all(t2, '${Pii.PhoneRe}')) AS BIGINT) AS n_phones,
         |  CAST(len(regexp_extract_all(t3, '${Pii.Ipv4Re}')) AS BIGINT) AS n_ips,
         |  (len(regexp_extract_all(t0, '${Pii.EmailRe}'))
         |   + len(regexp_extract_all(t1, '${Pii.CardRe}'))
         |   + len(regexp_extract_all(t2, '${Pii.PhoneRe}'))
         |   + len(regexp_extract_all(t3, '${Pii.Ipv4Re}')) = 0) AS pii_free,
         |  regexp_replace(t3, '${Pii.Ipv4Re}', '<IP>', 'g') AS redacted
         |FROM r3 ORDER BY doc_id""".stripMargin,
    "ta_langid_eval" ->
      s"""WITH p AS (SELECT lang,
         |    CASE WHEN $sEnSql >= $sDeSql AND $sEnSql >= $sFrSql THEN 'en'
         |         WHEN $sDeSql >= $sFrSql THEN 'de' ELSE 'fr' END AS predicted_lang
         |  FROM documents),
         |c AS (SELECT lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM p GROUP BY 1, 2)
         |SELECT lang, predicted_lang, n,
         |  CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY lang) AS DOUBLE)
         |    AS recall_share
         |FROM c ORDER BY lang, predicted_lang""".stripMargin,
    "ta_lang_id" ->
      s"""SELECT doc_id, lang,
         |  $sEnSql AS score_en, $sDeSql AS score_de, $sFrSql AS score_fr,
         |  CASE WHEN $sEnSql >= $sDeSql AND $sEnSql >= $sFrSql THEN 'en'
         |       WHEN $sDeSql >= $sFrSql THEN 'de' ELSE 'fr' END AS predicted_lang
         |FROM documents ORDER BY doc_id""".stripMargin,
    "tp_training_manifest" ->
      s"""WITH RECURSIVE cand AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE $sEnSql >= $sDeSql AND $sEnSql >= $sFrSql
         |    AND $qualitySql >= 0.6 AND doc_id % 17 <> 0),
         |ek AS (
         |  SELECT doc_id, text FROM (
         |    SELECT doc_id, text, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
         |    FROM cand)
         |  WHERE doc_id = keep_id),
         |sh AS (SELECT doc_id, ${shinglesSql(3)} AS shingles FROM ek),
         |sizes AS (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_sh FROM sh),
         |inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
         |common AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
         |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |p AS (
         |  SELECT doc_a, doc_b FROM common
         |  JOIN sizes sa ON common.doc_a = sa.doc_id
         |  JOIN sizes sb ON common.doc_b = sb.doc_id
         |  WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.5),
         |e AS (SELECT doc_a AS v, doc_b AS u FROM p
         |      UNION ALL SELECT doc_b AS v, doc_a AS u FROM p),
         |r(v, u) AS (
         |  SELECT DISTINCT v, v AS u FROM e
         |  UNION
         |  SELECT r.v, e.u FROM r JOIN e ON r.u = e.v),
         |lab AS (SELECT v, min(u) AS cluster FROM r GROUP BY v),
         |keep AS (SELECT ek.doc_id FROM ek
         |  WHERE NOT EXISTS (SELECT 1 FROM lab
         |    WHERE lab.v = ek.doc_id AND lab.cluster <> ek.doc_id)),
         |te5 AS (
         |  SELECT doc_id, unnest(${shinglesSql(5)}) AS shingle
         |  FROM documents WHERE doc_id % 17 = 0),
         |tr5 AS (SELECT doc_id, unnest(${shinglesSql(5)}) AS shingle FROM cand),
         |bad AS (SELECT tr5.doc_id FROM tr5 JOIN te5 ON tr5.shingle = te5.shingle
         |  GROUP BY tr5.doc_id, te5.doc_id HAVING count(*) >= 3),
         |surv AS (
         |  SELECT d.doc_id, CAST(len($T) AS BIGINT) AS n_tokens
         |  FROM cand d
         |  JOIN keep ON keep.doc_id = d.doc_id
         |  WHERE NOT EXISTS (SELECT 1 FROM bad WHERE bad.doc_id = d.doc_id)),
         |c AS (SELECT doc_id, n_tokens,
         |  CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         |  FROM surv)
         |SELECT doc_id, n_tokens, cum_before // 2048 AS shard_id
         |FROM c ORDER BY doc_id""".stripMargin,
    "tp_corpus_funnel" ->
      s"""WITH RECURSIVE ek AS (
         |  SELECT doc_id, text FROM (
         |    SELECT doc_id, text, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
         |    FROM documents)
         |  WHERE doc_id = keep_id),
         |sh AS (SELECT doc_id, ${shinglesSql(3)} AS shingles FROM ek),
         |sizes AS (SELECT doc_id, CAST(len(shingles) AS BIGINT) AS n_sh FROM sh),
         |inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
         |common AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
         |  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |p AS (
         |  SELECT doc_a, doc_b FROM common
         |  JOIN sizes sa ON common.doc_a = sa.doc_id
         |  JOIN sizes sb ON common.doc_b = sb.doc_id
         |  WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.5),
         |e AS (SELECT doc_a AS v, doc_b AS u FROM p
         |      UNION ALL SELECT doc_b AS v, doc_a AS u FROM p),
         |r(v, u) AS (
         |  SELECT DISTINCT v, v AS u FROM e
         |  UNION
         |  SELECT r.v, e.u FROM r JOIN e ON r.u = e.v),
         |lab AS (SELECT v, min(u) AS cluster FROM r GROUP BY v),
         |keep AS (SELECT ek.doc_id FROM ek
         |  WHERE NOT EXISTS (SELECT 1 FROM lab
         |    WHERE lab.v = ek.doc_id AND lab.cluster <> ek.doc_id)),
         |en AS (SELECT doc_id FROM documents
         |  WHERE $sEnSql >= $sDeSql AND $sEnSql >= $sFrSql),
         |good AS (SELECT doc_id FROM documents WHERE $qualitySql >= 0.6),
         |enq AS (SELECT en.doc_id FROM en JOIN good ON en.doc_id = good.doc_id)
         |SELECT
         |  (SELECT count(*) FROM documents) AS n_raw,
         |  (SELECT count(*) FROM en) AS n_english,
         |  (SELECT count(*) FROM enq) AS n_quality,
         |  (SELECT count(*) FROM enq JOIN keep ON enq.doc_id = keep.doc_id) AS n_final""".stripMargin,
    "ta_fingerprints" ->
      s"""SELECT doc_id,
         |  md5(text) AS fp_full,
         |  md5(array_to_string(list_slice($T, 1, 8), ' ')) AS fp_prefix,
         |  list_min(list_transform(generate_series(1, greatest(length(text) - 4, 1)),
         |                          i -> md5(substr(text, i, 5)))) AS fp_winnow
         |FROM documents ORDER BY doc_id""".stripMargin,
    "ta_chunks" ->
      s"""WITH t AS (SELECT doc_id, $T AS toks, len($T) AS n FROM documents),
         |c AS (SELECT doc_id, toks,
         |    CASE WHEN n <= 64 THEN CAST(1 AS BIGINT)
         |         ELSE CAST(ceil(CAST(n - 64 AS DOUBLE) / 48) AS BIGINT) + 1 END AS n_chunks
         |  FROM t),
         |x AS (SELECT doc_id, toks,
         |    unnest(generate_series(CAST(0 AS BIGINT), n_chunks - 1)) AS chunk_id
         |  FROM c)
         |SELECT doc_id, chunk_id,
         |  CAST(len(list_slice(toks, chunk_id * 48 + 1, chunk_id * 48 + 64)) AS BIGINT)
         |    AS n_chunk_tokens,
         |  array_to_string(list_slice(toks, chunk_id * 48 + 1, chunk_id * 48 + 64), ' ')
         |    AS chunk_text
         |FROM x ORDER BY doc_id, chunk_id""".stripMargin
  )
}
