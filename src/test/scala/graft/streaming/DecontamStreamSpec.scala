package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.operators.CorpusOps

/** Streaming decontamination must equal the batch operator over the
  * union of all batches for ANY batching of the input — the property
  * the operator's statelessness claims. Checked with a seeded random
  * corpus split into single-file micro-batches. */
class DecontamStreamSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260814L)

  /** A corpus where some train docs embed a verbatim 5-gram run from a
    * test doc (contaminated) and the rest are noise. */
  private def corpus(): (DataFrame, DataFrame) = {
    val testDocs = (900L until 903L).map { i =>
      (i, s"benchmark question $i alpha beta gamma delta epsilon zeta", "en", "bench",
        0L)
    }
    val trainDocs = (0L until 40L).map { i =>
      val contaminated = i % 5 == 0
      val text =
        if (contaminated) {
          val t = 900L + (i % 3)
          // ≥ 3 overlapping distinct 5-grams: a 7-word verbatim run
          s"noise${rnd.nextInt(1000)} question $t alpha beta gamma delta epsilon tail$i"
        } else {
          (1 to 12).map(_ => s"w${rnd.nextInt(30)}").mkString(" ")
        }
      (i, text, "en", "web", text.length.toLong)
    }
    (trainDocs.toDF("doc_id", "text", "lang", "source", "n_chars"),
      testDocs.toDF("doc_id", "text", "lang", "source", "n_chars"))
  }

  test("streamed keep-set == batch keep-set under random single-file batching") {
    val (train, test) = corpus()
    val testInv = CorpusOps.testIndex(test, n = 5).cache()

    val staging = Files.createTempDirectory("graft-decontam-in").toString
    val outDir = Files.createTempDirectory("graft-decontam-out").toString
    val ckpt = Files.createTempDirectory("graft-decontam-ckpt").toString

    // random split into 1-row..k-row files; maxFilesPerTrigger=1 makes
    // each file its own micro-batch
    val rows = train.collect()
    val shuffled = rnd.shuffle(rows.toSeq)
    val slices = Iterator.unfold(shuffled) { rest =>
      if (rest.isEmpty) None
      else Some(rest.splitAt(1 + rnd.nextInt(7)))
    }.toSeq
    slices.foreach { slice =>
      // mode=append drops each slice as one more part-file directly in
      // the staging dir (the file stream source lists leaf files, not
      // nested directories)
      spark.createDataFrame(
          spark.sparkContext.parallelize(slice, 1), train.schema)
        .write.mode("append").parquet(staging)
    }

    val q = DecontamStream.start(
      DecontamStream.readDocs(spark, staging, Map("maxFilesPerTrigger" -> "1")),
      testInv, outDir, ckpt, n = 5, minOverlap = 3L)
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(outDir)
    val streamedIds = streamed.select("doc_id").collect().map(_.getLong(0)).toSet
    val batchIds = CorpusOps.decontaminatedKeepAgainstIndex(train, testInv, 5, 3L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamedIds == batchIds)
    // contamination genuinely dropped something and kept the noise
    assert((0L until 40L).filter(_ % 5 == 0).forall(i => !streamedIds.contains(i)))
    assert(streamedIds.nonEmpty)
    // multiple micro-batches actually ran (batch_id is the partition col)
    assert(streamed.select("batch_id").distinct().count() > 1)
    testInv.unpersist()
  }
}
