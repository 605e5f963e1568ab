package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.fs.IndexStore

/** Continuous indexing: the streaming extension the reference's batch
  * re-index loop naturally becomes (SURVEY.md §2-I names the directory
  * watcher as the natural extension; the reference itself has no
  * streaming).
  *
  * Scan events (file metadata rows, same shape as FsScan output +
  * checksum) land as files in a staging directory; an unbounded
  * `readStream` picks up each new file and `foreachBatch` upserts the
  * micro-batch into the snapshot store with the same last-writer-wins
  * PK semantics as the batch pipeline. Exactly-once per batch comes
  * from the sink's atomic snapshot swap + the stream's checkpointed
  * source offsets.
  */
object IndexStream {

  /** Unbounded stream of scan-event rows from a staging directory of
    * parquet drops (schema = IndexStore.schema). */
  def readScanEvents(spark: SparkSession, stagingDir: String): DataFrame =
    spark.readStream.schema(IndexStore.schema).parquet(stagingDir)

  /** Start continuously folding scan events into the index snapshot.
    * Each micro-batch is one atomic snapshot upsert. */
  def continuousIndex(spark: SparkSession, stagingDir: String, indexRoot: String,
      checkpointDir: String, trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    readScanEvents(spark, stagingDir).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // upsert's publish already applies last-writer-wins over the
        // union, which covers intra-batch PK repeats too
        IndexStore.upsert(batch.sparkSession, indexRoot, batch)
      }
      .start()
}
