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
}
