package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.fs.SnapshotDir
import graft.operators.Dedup

/** Continuous near-duplicate deduplication: the streaming form of the
  * batch keep-list (Dedup.keepList), for the 100 TB/day ingest shape
  * where re-running corpus×corpus dedup per day is impossible.
  *
  * Per micro-batch of new documents:
  *  1. load the persisted shingle index of all PREVIOUSLY KEPT docs;
  *  2. [[Dedup.deltaPairs]] — jaccard pairs delta↔corpus and
  *     delta↔delta, cost O(delta shingles ⋈ index), never O(n²);
  *  3. decide: a new doc is DROPPED if it pairs with any already-kept
  *     corpus doc (kept-wins — decisions are append-only, a published
  *     keep is never revoked), or if it isn't the min-id survivor of
  *     its within-batch near-dup cluster;
  *  4. append (doc_id, kept, batch_id) decisions to the output;
  *  5. fold the KEPT docs' shingles into the index via an atomic
  *     snapshot swap ([[graft.fs.SnapshotDir]]).
  *
  * Crash-replay semantics: the index publish is IDEMPOTENT (the union
  * dedups on (shingle, doc_id), so replaying a batch republishes the
  * same index), and a replayed batch recomputes identical decisions
  * against it; the decisions parquet itself is at-least-once on
  * replay — downstream consumers dedupe on (doc_id, batch_id), the
  * standard contract for foreachBatch file appends. Exact duplicates
  * across batches are covered by near-dup pairing (identical text ⇒
  * jaccard 1.0 ≥ threshold).
  */
object DedupStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  val indexSchema: StructType = StructType(Seq(
    StructField("shingle", StringType), StructField("doc_id", LongType),
    StructField("n_sh", LongType)))

  /** Unbounded stream of (doc_id, text) rows from parquet drops.
    * `readOptions` pass through to the file source (e.g.
    * maxFilesPerTrigger to bound per-batch work). */
  def readDocs(spark: SparkSession, stagingDir: String,
      readOptions: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.options(readOptions).schema(docSchema).parquet(stagingDir)

  /** One micro-batch's keep/drop decisions against the current index
    * (exposed for testing; [[continuousDedup]] drives it). Returns
    * (decisions(doc_id, kept), keptShingleRows, cleanup) — call
    * cleanup() after consuming both DFs to drop the per-batch caches
    * (foreachBatch runs unboundedly; leaked cache blocks accumulate). */
  private[streaming] def decideBatch(batch: DataFrame, index: DataFrame,
      n: Int, threshold: Double): (DataFrame, DataFrame, () => Unit) = {
    val newDocs = batch.select(col("doc_id"), col("text"))
      .dropDuplicates("doc_id").cache()
    val corpusIds = index.select(col("doc_id")).distinct()
    val pairs = Dedup.deltaPairs(newDocs, index, n, threshold)
      .select("doc_a", "doc_b").cache()
    // pairs are (min, max); a corpus doc can sit on either side
    val pairedWithCorpus = pairs.join(broadcast(corpusIds),
        col("doc_a") === col("doc_id")).select(col("doc_b").as("doc_id"))
      .unionByName(pairs.join(broadcast(corpusIds),
        col("doc_b") === col("doc_id")).select(col("doc_a").as("doc_id")))
      .distinct()
    // within-batch near-dup clusters keep their min-id member
    val newIds = newDocs.select("doc_id")
    val withinPairs = pairs
      .join(newIds.toDF("doc_a"), "doc_a").join(newIds.toDF("doc_b"), "doc_b")
      .select("doc_a", "doc_b")
    val clusterDrops = Dedup.clusters(withinPairs)
      .filter(col("doc_id") =!= col("cluster")).select("doc_id")
    val drops = pairedWithCorpus.unionByName(clusterDrops).distinct()
      .withColumn("_drop", lit(true))
    val decisions = newDocs.join(drops, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(!col("_drop"), lit(true)).as("kept"))
    val keptShingles = Dedup.shingleIndex(
      newDocs.join(decisions.filter(col("kept")).select("doc_id"), "doc_id"), n)
    (decisions, keptShingles, () => { newDocs.unpersist(); pairs.unpersist(); () })
  }

  /** Start continuously deduplicating a document stream. Decisions
    * land as parquet appends in `outDir`; the kept-corpus shingle
    * index lives under `stateRoot` with snapshot-swap publishes. */
  def continuousDedup(spark: SparkSession, stagingDir: String, stateRoot: String,
      outDir: String, checkpointDir: String, n: Int = 3, threshold: Double = 0.5,
      trigger: Trigger = Trigger.AvailableNow(),
      readOptions: Map[String, String] = Map.empty): StreamingQuery =
    readDocs(spark, stagingDir, readOptions).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val index = SnapshotDir.load(s, stateRoot, indexSchema)
        val (decisions, keptShingles, cleanup) = decideBatch(batch, index, n, threshold)
        try {
          decisions.withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(outDir)
          SnapshotDir.publish(
            index.unionByName(keptShingles).dropDuplicates("shingle", "doc_id"),
            stateRoot)
        } finally cleanup()
      }
      .start()
}
