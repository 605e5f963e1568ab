package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.fs.{Indexer, IndexStore}

/** Empty-relation semantics: the reference COALESCEs empty aggregates
  * to zeros (database.py:404) and tolerates empty/missing indexes —
  * so must every operator here. */
class EmptyInputSpec extends SparkSpec {

  private lazy val empty: DataFrame = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(
      StructField("path", StringType), StructField("filename", StringType),
      StructField("checksum", StringType),
      StructField("modification_datetime", TimestampType),
      StructField("file_size", LongType))))

  test("stats on an empty index: zeros, not nulls") {
    val cli = FileQueries.statsCli(empty).collect().head
    assert(cli.getAs[Long]("total_files") == 0L)
    assert(cli.getAs[Long]("total_size") == 0L)
    assert(cli.getAs[Long]("duplicate_files") == 0L)
    val dup = FileQueries.duplicateStats(empty).collect().head
    assert(dup.getAs[Long]("duplicate_groups") == 0L)
    assert(dup.getAs[Long]("duplicate_files") == 0L)
  }

  test("queries on an empty index return empty, not errors") {
    assert(FileQueries.duplicates(empty).count() == 0)
    assert(FileQueries.duplicateGroups(empty).count() == 0)
    assert(FileQueries.sizeHistogram(empty).count() == 0)
    assert(FileQueries.extensionStats(empty).count() == 0)
    assert(FileQueries.searchFiles(empty, Some("%x%")).count() == 0)
  }

  test("round-2 operators tolerate empty inputs") {
    import spark.implicits._
    val emptyEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(graft.operators.Similarity.cosinePairsBlocked(emptyEmb, 0.3).count() == 0)
    assert(graft.operators.Similarity.cosinePairsLsh(emptyEmb, 0.9).count() == 0)
    val oneVec = Seq((1L, Array.fill(64)(1.0f))).toDF("vec_id", "embedding")
    assert(graft.operators.Similarity.cosinePairsBlocked(oneVec, 0.3).count() == 0)
    val emptyDocs = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // single-pass funnel: all four counts zero on an empty corpus
    val funnel = emptyDocs.select(org.apache.spark.sql.functions.col("doc_id"),
        graft.operators.TextAnalysis.isEnglishCol.as("is_en"),
        (graft.operators.TextAnalysis.qualityCol >= 0.6).as("is_good"))
      .join(graft.operators.Dedup.keepList(emptyDocs)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.lit(true).as("is_kept")), Seq("doc_id"), "left")
    assert(funnel.count() == 0)
  }

  test("round-3 operators tolerate empty and degenerate docs") {
    import spark.implicits._
    val emptyDocs = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(graft.operators.TextAnalysis.repetitionStats(emptyDocs).count() == 0)
    assert(graft.operators.Pii.redact(emptyDocs).count() == 0)
    assert(graft.operators.CorpusOps.sourceMix(emptyDocs).count() == 0)
    assert(graft.operators.CorpusOps.packShards(emptyDocs).count() == 0)
    // empty-STRING text: split(" ") yields one empty token, not a crash
    val degenerate = Seq((1L, "", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rep = graft.operators.TextAnalysis.repetitionStats(degenerate).collect()
    assert(rep.length == 1 && rep(0).getAs[Double]("top_token_frac") == 1.0)
    val pii = graft.operators.Pii.redact(degenerate).collect()
    assert(pii.length == 1 && pii(0).getAs[Boolean]("pii_free"))
  }

  test("round-4 operators tolerate empty and degenerate docs") {
    import spark.implicits._
    val emptyDocs = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(graft.operators.TextAnalysis.gopherRules(emptyDocs).count() == 0)
    assert(graft.operators.TextAnalysis.tfidfTopK(emptyDocs).count() == 0)
    assert(graft.operators.Dedup.dupNgramRate(emptyDocs).count() == 0)
    assert(graft.operators.CorpusOps.temperatureMix(emptyDocs).count() == 0)
    assert(graft.operators.CorpusOps.packSequences(emptyDocs).count() == 0)
    graft.operators.OpCaches.releaseAll()
    // empty-STRING text: one empty token, sane values instead of crashes
    val degenerate = Seq((1L, "", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val g = graft.operators.TextAnalysis.gopherRules(degenerate).collect()
    assert(g.length == 1 && g(0).getAs[Long]("n_words") == 1L &&
      !g(0).getAs[Boolean]("pass_all"))
    // a single empty token is its own (degenerate) top term
    val tf = graft.operators.TextAnalysis.tfidfTopK(degenerate).collect()
    assert(tf.length == 1 && tf(0).getAs[Long]("tf") == 1L)
    // one clamped shingle, shared with nobody → rate 0.0
    val dr = graft.operators.Dedup.dupNgramRate(degenerate).collect()
    assert(dr.length == 1 && dr(0).getAs[Double]("dup_rate") == 0.0)
    graft.operators.OpCaches.releaseAll()
    val sq = graft.operators.CorpusOps.packSequences(degenerate).collect()
    assert(sq.length == 1 && sq(0).getAs[Long]("start_tok") == 0L)
  }

  test("round-4 operators tolerate empty and degenerate inputs") {
    import spark.implicits._
    val emptyDocs = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val emptyEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val emptyEv = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(graft.streaming.Events.transitionMatrix(emptyEv).count() == 0)
    assert(graft.operators.Dedup.dedupStatsBySource(emptyDocs).count() == 0)
    assert(graft.operators.Dedup.dupSpans(emptyDocs).count() == 0)
    assert(graft.operators.TextAnalysis.bigramRarity(emptyDocs).count() == 0)
    assert(graft.operators.CorpusOps.qualityGate(emptyDocs).count() == 0)
    assert(graft.operators.CorpusOps.qualityGateApprox(emptyDocs).count() == 0)
    assert(graft.operators.CorpusOps.mixSchedule(emptyDocs).count() == 0)
    // quantization on an empty corpus: the scale aggregate yields one
    // null-scale row, but there are no vectors to quantize — empty out
    assert(graft.operators.Similarity.quantized(emptyEmb).count() == 0)
    assert(graft.operators.Similarity.topkQuantized(emptyEmb).count() == 0)
    assert(graft.operators.Similarity.cosineHistogram(emptyEmb).count() == 0)
    graft.operators.OpCaches.releaseAll()
    // single-event user: no adjacency → empty matrix, not a null row
    val oneEv = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
      1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(graft.streaming.Events.transitionMatrix(oneEv).count() == 0)
    // single tiny doc: one clamped gram shared with nobody → zero spans
    val degenerate = Seq((1L, "x", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val sp = graft.operators.Dedup.dupSpans(degenerate).collect()
    assert(sp.length == 1 && sp(0).getAs[Long]("max_run") == 0L)
    // one source, one doc: the whole budget lands on it exactly
    val ms = graft.operators.CorpusOps.mixSchedule(degenerate, budget = 13L).collect()
    assert(ms.length == 1 && ms(0).getAs[Long]("alloc") == 13L)
    graft.operators.OpCaches.releaseAll()
  }

  test("wave-3 operators tolerate empty and degenerate inputs") {
    import spark.implicits._
    val emptyDocs = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(graft.operators.Dedup.sourceOverlap(emptyDocs).count() == 0)
    assert(graft.operators.Dedup.jaccardHistogram(emptyDocs).count() == 0)
    assert(graft.operators.Dedup.containmentPairs(emptyDocs).count() == 0)
    graft.operators.OpCaches.releaseAll()
    val emptyEv = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    assert(graft.streaming.Events.interEventGaps(emptyEv).count() == 0)
    // empty stream: zero sessions, null percentiles — one row, no NPE
    val gp = graft.streaming.Events.gapPercentiles(emptyEv).collect()
    assert(gp.length == 1 && gp(0).getAs[Long]("n_gaps") == 0L &&
      gp(0).isNullAt(gp(0).fieldIndex("p50")))
    val sp = graft.streaming.Events.sessionPercentiles(emptyEv).collect()
    assert(sp.length == 1 && sp(0).getAs[Long]("n_sessions") == 0L &&
      sp(0).isNullAt(sp(0).fieldIndex("dur_p50")))
    // single-user single-event stream: a 1-event session of duration 0
    val oneEv = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
      1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val one = graft.streaming.Events.sessionPercentiles(oneEv).collect().head
    assert(one.getAs[Long]("n_sessions") == 1L &&
      one.getAs[Double]("dur_p50") == 0.0)
    // a doc with ONE clamped gram duplicated in another source still
    // produces a well-formed overlap row (cont/jaccard = 1 on both)
    val tiny = Seq((1L, "x", "en", "a", 1L), (2L, "x", "en", "b", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val ov = graft.operators.Dedup.sourceOverlap(tiny).collect()
    assert(ov.length == 1 && ov(0).getAs[Long]("n_pairs") == 1L &&
      ov(0).getAs[Double]("max_jaccard") == 1.0)
    graft.operators.OpCaches.releaseAll()
  }

  test("incremental index against a missing snapshot behaves as first full index") {
    val root = Files.createTempDirectory("graft-empty-inc")
    Files.write(root.resolve("only.txt"), "content".getBytes)
    val idx = Files.createTempDirectory("graft-empty-idx").toString
    // no prior snapshot: everything is an insert
    val st = Indexer.incrementalIndex(spark, root.toString, idx)
    assert(st.inserted == 1 && st.updated == 0 && st.unchanged == 0)
    assert(IndexStore.load(spark, idx).count() == 1)
  }

  test("cleanup on an empty snapshot is a no-op") {
    val idx = Files.createTempDirectory("graft-empty-clean").toString
    IndexStore.publish(empty.withColumn("indexed_at",
      org.apache.spark.sql.functions.current_timestamp()), idx)
    val st = Indexer.cleanupDeletedFiles(spark, idx)
    assert(st.totalChecked == 0 && st.deletedFiles == 0)
  }
}
