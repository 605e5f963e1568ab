package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def mk(rows: (Long, String, String)*): DataFrame =
    rows.map { case (id, text, lang) => (id, text, lang, "src", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("tokenStats: exact token counts and mean length") {
    val df = mk((1L, "aa bb aa", "en")) // 3 tokens, 2 distinct, 8 chars
    val r = TextAnalysis.tokenStats(df).collect().head
    assert(r.getAs[Long]("n_tokens") == 3)
    assert(r.getAs[Long]("n_distinct_tokens") == 2)
    // (8 - 3 + 1) / 3 = 2.0 — exact mean token length
    assert(r.getAs[Double]("avg_token_len") == 2.0)
  }

  test("qualityScore components are exact ratios") {
    val df = mk((1L, "the cat sat on the mat", "en")) // 6 toks, 'the'×2, 5 distinct
    val r = TextAnalysis.qualityScore(df).collect().head
    assert(r.getAs[Double]("stopword_ratio") == 2.0 / 6.0)
    assert(r.getAs[Double]("distinct_ratio") == 5.0 / 6.0)
    assert(r.getAs[Double]("len_score") == 22.0 / 400.0)
    val q = r.getAs[Double]("quality")
    assert(math.abs(q - (22.0 / 400.0 * 0.4 + (1 - 2.0 / 6.0) * 0.3 + 5.0 / 6.0 * 0.3)) < 1e-15)
  }

  test("langId scores bigram profiles with fixed tie-break") {
    val df = mk(
      (1L, "the weather thesis", "en"),   // 'th'/'he' heavy
      (2L, "einer interner termin", "de") // 'er'/'in' heavy
    )
    val out = TextAnalysis.langId(df).collect()
    assert(out(0).getAs[String]("predicted_lang") == "en")
    assert(out(1).getAs[String]("predicted_lang") == "de")
  }

  test("repetitionStats: exact fractions, single-token doc safe") {
    val df = mk(
      (1L, "a a a b c d e f", "en"), // 8 toks: top 'a'×3; bigram 'a a'×2 of 7
      (2L, "solo", "en"),            // 1 token: no bigrams, no division by 0
      (3L, "x y x y x y", "en"))     // top 'x'×3 of 6; 'x y'×3 of 5
    val out = TextAnalysis.repetitionStats(df).collect()
    assert(out(0).getAs[Double]("top_token_frac") == 3.0 / 8.0)
    assert(out(0).getAs[Double]("dup_token_frac") == 2.0 / 8.0)
    assert(out(0).getAs[Double]("top_bigram_frac") == 2.0 / 7.0)
    assert(out(0).getAs[Boolean]("repetitive")) // 0.375 >= 0.125
    assert(out(1).getAs[Double]("top_token_frac") == 1.0)
    assert(out(1).getAs[Double]("dup_token_frac") == 0.0)
    assert(out(1).getAs[Double]("top_bigram_frac") == 0.0)
    assert(out(2).getAs[Double]("top_bigram_frac") == 3.0 / 5.0)
  }

  test("fingerprints: identical texts share all three fingerprints") {
    val df = mk((1L, "some shared text body", "en"), (2L, "some shared text body", "en"),
      (3L, "another body", "en"))
    val f = TextAnalysis.fingerprints(df).collect()
    assert(f(0).getString(1) == f(1).getString(1)) // fp_full
    assert(f(0).getString(2) == f(1).getString(2)) // fp_prefix
    assert(f(0).getString(3) == f(1).getString(3)) // fp_winnow
    assert(f(0).getString(1) != f(2).getString(1))
    // md5 hex shape
    assert(f(0).getString(1).matches("[0-9a-f]{32}"))
  }

  test("chunk: overlapping windows, short docs, exact boundaries") {
    def words(n: Int, tag: String) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val df = mk(
      (1L, words(3, "a"), "en"),    // shorter than one window -> 1 chunk
      (2L, words(10, "b"), "en"),   // 10 tokens, size 4 stride 3 -> starts 0,3,6 (last covers to 10)
      (3L, words(11, "c"), "en"))   // 11 tokens -> starts 0,3,6,9; last chunk short (2 tokens)
    val got = TextAnalysis.chunk(df, chunkSize = 4, stride = 3).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("n_chunk_tokens"), r.getAs[String]("chunk_text")))
    assert(got.count(_._1 == 1L) == 1 && got.head._4 == "a1 a2 a3")
    val d2 = got.filter(_._1 == 2L)
    assert(d2.map(t => (t._2, t._4)).toSeq == Seq(
      (0L, "b1 b2 b3 b4"), (1L, "b4 b5 b6 b7"), (2L, "b7 b8 b9 b10")))
    val d3 = got.filter(_._1 == 3L)
    assert(d3.map(_._3).toSeq == Seq(4L, 4L, 4L, 2L), d3.toSeq)
    assert(d3.last._4 == "c10 c11")
    // overlap: consecutive chunks share chunkSize - stride tokens
    assert(d2(0)._4.split(" ").last == d2(1)._4.split(" ").head)
  }

  test("bm25TopK: rare terms outrank common ones, tf saturates, non-matches drop") {
    val df = mk(
      (1L, "rare common common filler filler", "en"),  // one rare + common
      (2L, "common filler filler filler filler", "en"), // common only
      (3L, "filler filler filler filler filler", "en"), // no query terms
      (4L, "rare rare rare rare filler", "en"))         // rare-stuffed
    val got = TextAnalysis.bm25TopK(df, Seq("rare", "common"), k = 10).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    // doc 3 has no query term -> absent
    assert(!got.exists(_._1 == 3L))
    val score = got.toMap
    // tf saturation makes the two-term match (doc 1) beat the
    // term-stuffed single-term doc 4 — the anti-spam property BM25's
    // saturating tf term exists for
    assert(score(1L) > score(4L))
    // the stuffed doc still beats a single common hit
    assert(score(4L) > score(2L))
    // doc 1 (rare + common) beats doc 2 (common only)
    assert(score(1L) > score(2L))
    // ordered by score desc then doc_id
    assert(got.map(_._2).toSeq == got.map(_._2).sorted(Ordering[Double].reverse).toSeq)
    // tf saturation: 4x rare is NOT 4x the single-hit score
    assert(score(4L) < 4.0 * score(1L))
  }

  test("cmsHeavyHitters: exact top-k ranking with the sketch bound held") {
    val df = mk(
      (1L, "hot hot hot warm warm cold", "en"),
      (2L, "hot hot warm unique1 unique2 unique3", "en"))
    val got = TextAnalysis.cmsHeavyHitters(df, k = 3).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"), r.getAs[Boolean]("within_bound")))
    // exact ranking: hot x5, warm x3, cold/unique* x1 (tie -> 'cold' first)
    assert(got.map(t => (t._1, t._2)).toSeq == Seq(("hot", 5L), ("warm", 3L), ("cold", 1L)))
    // 12 tokens, eps 0.001 -> slack ceil(0.012) = 1; CMS never
    // undercounts and a tiny stream can't collide past the slack
    assert(got.forall(_._3), got.toSeq)
  }

  test("gopherRules: each rule flips on its own violation") {
    val longText = (Seq("the", "a") ++ (1 to 60).map(_ => "word")).mkString(" ")
    val df = mk(
      (1L, longText, "en"),                           // passes everything
      (2L, "the a short doc only", "en"),             // fails word count
      (3L, (1 to 60).map(_ => "word").mkString(" "), "en")) // no stop words
    val out = TextAnalysis.gopherRules(df).collect()
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Boolean]("pass_all"))
    assert(byId(1L).getAs[Long]("n_words") == 62L)
    assert(byId(1L).getAs[Double]("frac_alpha") == 1.0)
    assert(!byId(2L).getAs[Boolean]("pass_words") &&
      byId(2L).getAs[Boolean]("pass_stop"))
    assert(!byId(3L).getAs[Boolean]("pass_stop") &&
      byId(3L).getAs[Boolean]("pass_words"))
    assert(!byId(2L).getAs[Boolean]("pass_all") && !byId(3L).getAs[Boolean]("pass_all"))
    // exact mean word length: doc 3 = 60 'word's → 4.0
    assert(byId(3L).getAs[Double]("mean_word_len") == 4.0)
  }

  test("gopherPassCol equals gopherRules' pass_all on every row") {
    val df = mk(
      (1L, (Seq("the", "a") ++ (1 to 60).map(_ => "word")).mkString(" "), "en"),
      (2L, "the a short", "en"),
      (3L, (1 to 60).map(_ => "word").mkString(" "), "en"))
    val fromCol = df.select(org.apache.spark.sql.functions.col("doc_id"),
        TextAnalysis.gopherPassCol.as("p")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val fromTable = TextAnalysis.gopherRules(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("pass_all")).toMap
    assert(fromCol == fromTable)
  }

  test("rarityStats: exact df sums, repeated tokens weighted by tf") {
    val df = mk(
      (1L, "common common rare", "en"),   // common df=2, rare df=1
      (2L, "common other", "en"))
    val out = TextAnalysis.rarityStats(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("sum_df"),
          r.getAs[Long]("min_df"), r.getAs[Double]("mean_df"))).toMap
    // doc 1: 3 occurrences; sum_df = 2*2 (common twice) + 1 (rare) = 5
    assert(out(1L) == ((3L, 5L, 1L, 5.0 / 3.0)))
    // doc 2: common(df 2) + other(df 1) = 3 over 2 tokens
    assert(out(2L) == ((2L, 3L, 1L, 3.0 / 2.0)))
  }

  test("langIdConfusion: diagonal cells for clean profiles, shares per true lang") {
    val df = mk(
      (1L, "the weather thesis", "en"),
      (2L, "the other thesis", "en"),
      (3L, "einer interner termin", "de"))
    val m = TextAnalysis.langIdConfusion(df).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Double]("recall_share"))).toMap
    assert(m(("en", "en")) == ((2L, 1.0)))
    assert(m(("de", "de")) == ((1L, 1.0)))
    assert(m.keySet == Set(("en", "en"), ("de", "de")))
  }

  test("bigramRarity: occurrence-weighted bigram dfs and unique share") {
    val df = mk(
      (1L, "a b a b c", "en"),  // bigrams: "a b","b a","a b","b c" → tf("a b")=2
      (2L, "a b x", "en"),      // bigrams: "a b","b x"
      (3L, "solo", "en"))       // 1 token → clamped single gram "solo"
    val out = TextAnalysis.bigramRarity(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_df"),
          r.getAs[Long]("min_df"), r.getAs[Double]("uniq_frac"))).toMap
    // doc 1: "a b" df=2 (docs 1,2), "b a" df=1, "b c" df=1 →
    // sum_df = 2*2 + 1 + 1 = 6 over 4 occurrences; unique occ = 2/4
    assert(out(1L) == ((4L, 6L, 1L, 0.5)))
    // doc 2: "a b" df=2, "b x" df=1 → sum 3; unique 1/2
    assert(out(2L) == ((2L, 3L, 1L, 0.5)))
    // doc 3: the clamped gram "solo" occurs only here → df=1, all unique
    assert(out(3L) == ((1L, 1L, 1L, 1.0)))
  }

  test("bigramRarity: scratch-grouped path is value-identical to the single pass") {
    val df = mk(
      (1L, "a b a b c", "en"),
      (2L, "a b x", "en"),
      (3L, "x c a b", "en"),
      (4L, "solo", "en"))
    val single = TextAnalysis.bigramRarity(df).collect().toSeq
    // 1-byte budget forces the max group count; per-group df is exact
    // (a bigram's postings never cross pmod groups) and per-doc
    // partials must merge back to the single-pass rows bit-for-bit
    spark.conf.set("graft.vocab.scratchBudgetBytes", "1")
    try {
      val grouped = TextAnalysis.bigramRarity(df).collect().toSeq
      assert(grouped == single)
      assert(single.nonEmpty)
    } finally spark.conf.unset("graft.vocab.scratchBudgetBytes")
  }

  test("tfidfTopK: scratch-grouped heap-of-heaps merge is value-identical") {
    val df = mk(
      (1L, "shared shared rare1 rare1 rare1 zz", "en"),
      (2L, "shared other other zz aa", "en"),
      (3L, "shared alone bb aa", "en"))
    val single = TextAnalysis.tfidfTopK(df, k = 2).collect().toSeq
    // forced max groups: per-group dfs are exact (term domains are
    // disjoint) and the merged per-doc top-k must be the single-pass
    // rows bit-for-bit, including score ties broken by term
    spark.conf.set("graft.vocab.scratchBudgetBytes", "1")
    try {
      val grouped = TextAnalysis.tfidfTopK(df, k = 2).collect().toSeq
      assert(grouped == single)
      assert(single.nonEmpty)
    } finally spark.conf.unset("graft.vocab.scratchBudgetBytes")
  }

  test("tfidfTopK: rare terms outrank common ones, k bound, ties by term") {
    val df = mk(
      (1L, "shared shared rare1 rare1 rare1", "en"),
      (2L, "shared other other", "en"),
      (3L, "shared alone", "en"))
    val out = TextAnalysis.tfidfTopK(df, k = 2).collect()
    // every doc contributes at most k rows
    assert(out.groupBy(_.getAs[Long]("doc_id")).forall(_._2.length <= 2))
    val d1 = out.filter(_.getAs[Long]("doc_id") == 1L).map(_.getAs[String]("term"))
    // rare1 (tf 3, df 1) beats shared (tf 2, df 3) for doc 1
    assert(d1.head == "rare1")
    // score formula exact: tf * (N - df + 0.5)/(df + 0.5), N = 3
    val r1 = out.find(r => r.getAs[Long]("doc_id") == 1L &&
      r.getAs[String]("term") == "rare1").get
    assert(r1.getAs[Double]("score") == 3.0 * ((3.0 - 1.0 + 0.5) / (1.0 + 0.5)))
    assert(r1.getAs[Long]("tf") == 3L && r1.getAs[Long]("df") == 1L)
  }

  test("tfidfTopK heap aggregate == window form row-for-row (incl. ties, <k docs)") {
    // repartition(7) forces multi-partition partial buffers + a real
    // merge; tie rows ("tie_a tie_b" — equal tf, equal df → equal
    // score) pin the term-asc tie-break across both forms
    val df = mk(
      (1L, "shared shared rare1 rare1 rare1 tie_a tie_b", "en"),
      (2L, "shared other other tie_a tie_b", "en"),
      (3L, "shared alone", "en"),
      (4L, "solo", "en"), // fewer terms than k
      (5L, "x y z w v u t s r q p o n m", "en")
    ).repartition(7)
    for (k <- Seq(1, 3, 5)) {
      val heap = TextAnalysis.tfidfTopK(df, k).collect().toSeq
      val win = TextAnalysis.tfidfTopKWindow(df, k).collect().toSeq
      assert(heap == win, s"k=$k: heap and window top-k diverge")
    }
  }
}
