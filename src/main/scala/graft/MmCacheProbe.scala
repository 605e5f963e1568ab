package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{MediaSigStore, Multimodal}

/** Decade probe for the persisted media-signature store
  * ([[MediaSigStore]]): measures what [[Multimodal.videoDedupCached]]
  * buys over [[Multimodal.videoDedup]] on REPEATED and INCREMENTAL
  * corpus passes at scale — the r12 finding was that decode CPU is
  * linear and partition-local (1294.7 s for one full video pass at 5M
  * media docs) and the uncached operator re-pays it every run.
  *
  * Protocol (one JSONL row per step, all timed on materialized media
  * parquet — the repeated-pass scenario reads media from storage, not
  * from a regenerated plan):
  *   1. encode the video table for `docs`, write to parquet (untimed);
  *   2. `plain`   — uncached videoDedup over the parquet (the baseline
  *      every pass pays today), with a decision fingerprint;
  *   3. `cold`    — cached pass against an empty store: populates it,
  *      decodes everything once;
  *   4. `warm`    — cached pass, unchanged corpus: expect decoded = 0
  *      and the verdict's ≥10× over `plain`;
  *   5. append ~10% more docs to the parquet (untimed), then
  *      `incr`    — cached pass: expect decoded ≈ the delta's payload
  *      count only, fingerprint equal to a fresh uncached pass.
  *
  * Usage: runMain graft.MmCacheProbe <sfDir> [workDir]
  *        (sfDir must hold documents.parquet; GRAFT_MM_DOCS caps the
  *        doc count, default all)
  */
object MmCacheProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val workDir = new java.io.File(
      if (args.length > 1) args(1) else "target/streams/mmcache").getAbsolutePath
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = GraftSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_PROBE_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.fs.SnapshotDir.deleteRecursively(java.nio.file.Paths.get(workDir))

    val mediaDir = s"$workDir/video.parquet"
    val storeRoot = s"$workDir/sigstore"
    def emit(s: String): Unit = { println(s); System.out.flush() }

    val allDocs = spark.read.parquet(s"$sfDir/documents.parquet")
    val docsCap = sys.env.get("GRAFT_MM_DOCS").flatMap(_.toLongOption)
    val docs = docsCap.map(c => allDocs.filter(col("doc_id") < c)).getOrElse(allDocs)

    // order-independent decision fingerprint: the dedup rows hashed and
    // summed — equal ⟺ identical decision sets
    def fpr(df: DataFrame): Long =
      df.agg(sum(hash(col("width"), col("height"), col("n_frames"),
        col("keep_doc_id"), col("n_copies")).cast("long"))).head().getLong(0)

    def step(name: String, decoded: => Long)(body: => DataFrame): (Long, Double) = {
      graft.operators.OpCaches.releaseAll()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val f = fpr(body)
      val sec = (System.nanoTime() - t0) / 1e9
      emit(f"""{"step":"$name","sec":$sec%.3f,"fpr":$f,"decoded":$decoded}""")
      (f, sec)
    }

    // 1. materialize the media table (the stored-corpus scenario)
    Multimodal.videoTableWithContainerVariants(spark, docs)
      .write.mode("overwrite").parquet(mediaDir)
    val media = spark.read.parquet(mediaDir)
    val nMedia = media.count()
    emit(s"""{"step":"encode","media_rows":$nMedia,"dir":"$sfDir"}""")

    // 2-4. plain / cold / warm
    val (fPlain, secPlain) = step("plain", -1L)(Multimodal.videoDedup(spark, media))
    val (fCold, _) = step("cold", MediaSigStore.lastDecoded)(
      Multimodal.videoDedupCached(spark, media, storeRoot))
    val (fWarm, secWarm) = step("warm", MediaSigStore.lastDecoded)(
      Multimodal.videoDedupCached(spark, media, storeRoot))
    require(fCold == fPlain && fWarm == fPlain,
      s"cached decisions diverged: plain=$fPlain cold=$fCold warm=$fWarm")

    // 5. ~10% append (fresh doc ids past the existing ceiling so their
    // payloads are genuinely new), then the incremental pass
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val nAppend = math.max(1L, docs.count() / 10)
    // appended ids must land on the video residue (doc_id % 3 == 2,
    // Multimodal.scala:207) or the append writes ZERO media rows and
    // the incremental pass is vacuously "fast" — the first run of this
    // probe did exactly that (media_rows_after == media_rows,
    // decoded == 0). Align the base to the next id > maxId with
    // residue 2, then stride by 3 so EVERY appended doc is a video doc.
    val base = maxId + 1 + ((2 - (maxId + 1) % 3) + 3) % 3
    val appended = spark.range(nAppend)
      .select((col("id") * 3 + base).as("doc_id"),
        concat(lit("appended media doc "),
          col("id").cast("string"),
          lit(" with deterministic padding text for encode params")).as("text"),
        lit("en").as("lang"), lit("probe").as("source"), lit(0L).as("n_chars"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    Multimodal.videoTableWithContainerVariants(spark, appended)
      .write.mode("append").parquet(mediaDir)
    val media2 = spark.read.parquet(mediaDir)
    val nMedia2 = media2.count()
    require(nMedia2 > nMedia,
      s"append produced no new media rows ($nMedia -> $nMedia2); the incremental step would be vacuous")
    val (fIncr, secIncr) = step("incr", MediaSigStore.lastDecoded)(
      Multimodal.videoDedupCached(spark, media2, storeRoot))
    val decodedIncr = MediaSigStore.lastDecoded
    // delta-only: more than zero (the append is real), at most the new
    // rows plus bloom-FP slack (FPs over-decode already-cached payloads)
    require(decodedIncr > 0 && decodedIncr <= (nMedia2 - nMedia) * 2,
      s"incremental pass decoded $decodedIncr of ${nMedia2 - nMedia} new rows — not delta-only")
    val (fPlain2, secPlain2) = step("plain_after_append", -1L)(
      Multimodal.videoDedup(spark, media2))
    require(fIncr == fPlain2,
      s"incremental decisions diverged: cached=$fIncr plain=$fPlain2")

    emit(f"""{"summary":true,"media_rows":$nMedia,"media_rows_after":$nMedia2,""" +
      f""""plain_sec":$secPlain%.3f,"warm_sec":$secWarm%.3f,""" +
      f""""speedup_warm":${secPlain / math.max(secWarm, 1e-9)}%.2f,""" +
      f""""incr_sec":$secIncr%.3f,"plain_after_sec":$secPlain2%.3f}""")
    spark.stop()
  }
}
