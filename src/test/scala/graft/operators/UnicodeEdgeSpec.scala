package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Edge-content robustness: the text operators must survive (and stay
  * internally consistent on) content a 100 TB crawl actually
  * contains — emoji (surrogate pairs), CJK with no spaces, RTL
  * scripts, zero-width joiners, repeated separators, and very long
  * single tokens. These are NOT semantic-accuracy tests (langId on
  * CJK is out of profile by design); they pin that nothing crashes,
  * no operator silently drops rows, and cross-field invariants hold
  * on degenerate tokenizations. */
class UnicodeEdgeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val edgy: DataFrame = Seq(
    (1L, "hello 😀 world 🌍🌍", "en", "s"), // emoji surrogates
    (2L, "日本語のテキスト", "ja", "s"),  // CJK, no spaces
    (3L, "مرحبا بالعالم", "ar", "s"), // RTL Arabic
    (4L, "zero‍width‍joiner text here", "en", "s"),             // ZWJ inside a token
    (5L, "double  space   runs", "en", "s"),                              // empty split tokens
    (6L, "x" * 5000, "en", "s")                                           // one huge token
  ).toDF("doc_id", "text", "lang", "source")
    .withColumn("n_chars", length(col("text")).cast("long"))

  test("token and quality stats: one row per doc, finite ratios") {
    val ts = TextAnalysis.tokenStats(edgy).collect()
    assert(ts.length == 6)
    ts.foreach { r =>
      assert(r.getAs[Long]("n_tokens") >= 1)
      assert(!r.getAs[Double]("avg_token_len").isNaN)
    }
    val q = TextAnalysis.qualityScore(edgy).collect()
    assert(q.length == 6)
    q.foreach(r => assert(!r.getAs[Double]("quality").isNaN))
  }

  test("langId scores every row (accuracy out of profile, totality in)") {
    val out = TextAnalysis.langId(edgy).collect()
    assert(out.length == 6)
    assert(out.forall(r => Set("en", "de", "fr")(r.getAs[String]("predicted_lang"))))
  }

  test("pii scrub, fingerprints, and chunking are total on edge content") {
    assert(Pii.redact(edgy).count() == 6)
    assert(TextAnalysis.fingerprints(edgy).count() == 6)
    // every chunk's token count is within the window size
    val ch = TextAnalysis.chunk(edgy, chunkSize = 8, stride = 4).collect()
    assert(ch.nonEmpty)
    assert(ch.forall(_.getAs[Long]("n_chunk_tokens") <= 8))
    graft.operators.OpCaches.releaseAll()
  }

  test("dedup paths handle surrogate pairs and empty split tokens") {
    // identical emoji docs must collapse to one group like any text
    val dup = edgy.unionByName(
      edgy.filter(col("doc_id") === 1L).withColumn("doc_id", lit(100L)))
    val g = Dedup.exact(dup).filter(col("n_copies") > 1).collect()
    assert(g.length == 1 && g.head.getAs[Long]("keep_doc_id") == 1L)
    val pairs = Dedup.jaccardPairs(dup, n = 2, threshold = 0.9).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 100L))
    assert(Dedup.dupSpans(dup, n = 2).count() == 7)
    graft.operators.OpCaches.releaseAll()
  }

  test("multimodal payload round-trip preserves exact UTF-8 bytes") {
    val m = Multimodal.mediaTable(edgy).filter(col("doc_id") === 1L).collect().head
    val expected = "hello 😀 world 🌍🌍"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    assert(m.getAs[Array[Byte]]("payload").sameElements(expected))
  }
}
