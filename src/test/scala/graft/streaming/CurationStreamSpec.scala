package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.Pii

/** The stateless curation stages are pure per-row projections, so the
  * SAME operator code runs unchanged under Structured Streaming (no
  * watermark, no state): the continuous-ingest shape where documents
  * are scrubbed and scored as they land, before the stateful dedup
  * stage ([[DedupStream]]) sees them. [[Pii.scrub]] is the exemplar;
  * the text-analysis scores stream identically (same projection
  * shape, ordering only in their batch/oracle wrappers). */
class CurationStreamSpec extends SparkSpec {
  import spark.implicits._

  test("PII scrub runs per-batch on a document stream, matching batch") {
    val docs = Seq(
      (1L, "contact a@b.co or 1.2.3.4 now", "en", "s0", 29L),
      (2L, "x y x y x y", "en", "s0", 11L),
      (3L, "the quick brown fox the lazy dog", "en", "s1", 32L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-curstream")
    docs.write.mode("overwrite").parquet(dir.toString)

    val stream = spark.readStream.schema(docs.schema).parquet(dir.toString)
    val q = Pii.scrub(stream)
      .writeStream.format("memory").queryName("curation_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val streamed = spark.table("curation_test")
      .select("doc_id", "pii_free", "redacted").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).toSet
    val batch = Pii.redact(docs)
      .select("doc_id", "pii_free", "redacted").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getString(2))).toSet
    assert(streamed == batch)
    assert(streamed.exists { case (id, free, red) =>
      id == 1L && !free && red == "contact <EMAIL> or <IP> now" })
  }
}
