package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.CorpusOps

/** Continuous benchmark decontamination: train documents arrive as a
  * stream and are checked against a STATIC benchmark (test) corpus —
  * the ingest-time twin of [[graft.operators.CorpusOps.decontaminatedKeep]],
  * for the pipeline shape where the benchmark suite changes rarely
  * (per release) but training data lands continuously.
  *
  * Unlike [[DedupStream]], decontamination is STATELESS across
  * batches: a document's verdict depends only on its own n-grams and
  * the fixed test index, so the streamed keep-set is row-identical to
  * running the batch operator over the union of all batches, no
  * matter how ingest is batched (spec-checked with randomized
  * splits). That means no state store, no watermark, no compaction —
  * just the batch core inside foreachBatch.
  *
  * Scale shape per micro-batch: the test index (tiny by definition)
  * is broadcast; the batch is shingled and probed in place — cost
  * O(batch shingles), the train side never shuffles. Kept rows land
  * as hive-style `batch_id=<id>` partition directories written with
  * OVERWRITE, so a crash-replayed batch rewrites its own partition
  * instead of duplicating it (exactly-once output under the file
  * sink's replay contract), and a plain `spark.read.parquet(outDir)`
  * reassembles the corpus with `batch_id` as a partition column.
  */
object DecontamStream {

  /** Documents-table schema for the parquet staging source. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Unbounded stream of document rows from parquet drops.
    * `readOptions` pass through (e.g. maxFilesPerTrigger to bound
    * per-batch work). */
  def readDocs(spark: SparkSession, stagingDir: String,
      readOptions: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.options(readOptions).schema(docSchema).parquet(stagingDir)

  /** Start the decontamination stream: per batch, survivors of the
    * overlap check against `testInv` (see
    * [[graft.operators.CorpusOps.testIndex]]) are written to
    * `outDir/batch_id=<id>/`. */
  def start(trainStream: DataFrame, testInv: DataFrame, outDir: String,
      checkpointDir: String, n: Int = 5, minOverlap: Long = 3L,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    trainStream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        CorpusOps.decontaminatedKeepAgainstIndex(batch, testInv, n, minOverlap)
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
