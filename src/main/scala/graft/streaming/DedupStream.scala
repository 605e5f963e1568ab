package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.fs.{DeltaDirs, SnapshotDir}
import graft.operators.Dedup

/** Continuous near-duplicate deduplication: the streaming form of the
  * batch keep-list (Dedup.keepList), for the 100 TB/day ingest shape
  * where re-running corpus×corpus dedup per day is impossible.
  *
  * Per micro-batch of new documents:
  *  1. load the shingle index of all PREVIOUSLY KEPT docs = compacted
  *     base snapshot ∪ per-batch delta directories (see "index layout");
  *  2. [[Dedup.deltaPairsFromIndex]] — jaccard pairs delta↔corpus and
  *     delta↔delta over ONE cached shingle pass, cost O(delta ⋈ index);
  *  3. decide: a new doc is DROPPED if it pairs with any already-kept
  *     corpus doc (kept-wins — decisions are append-only, a published
  *     keep is never revoked), or if it isn't the min-id survivor of
  *     its within-batch near-dup cluster;
  *  4. append (doc_id, kept, batch_id) decisions to the output;
  *  5. write the KEPT docs' shingles as `delta-<batchId>` (overwrite →
  *     replay-idempotent), compacting all deltas into the base snapshot
  *     every `compactEvery` batches.
  *
  * Index layout — per-batch cost must be O(batch), not O(corpus):
  * a full base rewrite per batch would grow without bound, so deltas
  * append and only the periodic compaction touches the whole index.
  * The compaction watermark (last batch id folded into the base) is
  * published ATOMICALLY with the base snapshot itself (SnapshotDir
  * meta, inside the snap dir the pointer names): loads ignore delta
  * dirs ≤ the watermark OF THE BASE THEY READ, so no crash point —
  * before the flip, after the flip, before delta removal — can
  * double-count or lose shingles.
  *
  * Crash-replay semantics: a replayed batch rewrites the same delta
  * dir and recomputes decisions that are IDENTICAL even against the
  * already-updated index — self-pairs (a replayed kept doc matching
  * its own published shingles) are filtered, and a doc already in the
  * kept corpus is never flipped to dropped. The decisions parquet
  * itself is at-least-once on replay — downstream consumers dedupe on
  * (doc_id, batch_id), the standard contract for foreachBatch file
  * appends. Exact duplicates across batches are covered by near-dup
  * pairing (identical text ⇒ jaccard 1.0 ≥ threshold).
  */
object DedupStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  val indexSchema: StructType = StructType(Seq(
    StructField("shingle", LongType), StructField("doc_id", LongType),
    StructField("n_sh", LongType)))

  /** Unbounded stream of (doc_id, text) rows from parquet drops.
    * `readOptions` pass through to the file source (e.g.
    * maxFilesPerTrigger to bound per-batch work). */
  def readDocs(spark: SparkSession, stagingDir: String,
      readOptions: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.options(readOptions).schema(docSchema).parquet(stagingDir)

  // ------------------------------------------------- index store (base+delta)

  /** The batch id through which deltas are folded into the CURRENT
    * base snapshot (corrupt meta fails loudly — a silent -1 would
    * double-count folded deltas). Testing/introspection only; the
    * load path reads the watermark from its OWN resolved snapshot. */
  private[streaming] def compactedThrough(stateRoot: String): Long =
    DeltaDirs.watermark(SnapshotDir.loadMeta(s"$stateRoot/base"))

  /** Deterministic fingerprint of the capped shingle space: the
    * hot-shingle drop list reduced to `count:bitxor:bitxor(xxhash64)`
    * — the third field xors the RE-HASHED shingles (order-free, so any
    * partitioning of the same set agrees; and it breaks the count+xor
    * degeneracy where two distinct equal-size sets xor to the same raw
    * value — e.g. {a,b} vs {a^b^c, c}, which the plain pair collides
    * on but an independent second mix does not, short of an engineered
    * simultaneous 128-bit collision). `"uncapped"` when no
    * cap is in force. Published in the base snapshot meta at every
    * compaction and asserted at stream start — a base built in one
    * shingle space must never be probed or extended in another (mixed
    * capped/uncapped `n_sh` silently skews every jaccard denominator).
    *
    * Compatibility caveat: bases compacted BEFORE the marker existed
    * carry no `cap` entry and read back as legacy-uncapped. A legacy
    * base that was in fact built WITH a cap therefore passes the guard
    * when resumed with `hot = None` — the guard cannot detect it;
    * such bases must be rebuilt (or re-compacted once under the
    * current code, which stamps the marker). Bases stamped with the
    * older `count:xor` two-field form fail the equality check against
    * the three-field form and surface as a loud mismatch, which is
    * the safe direction. */
  private[streaming] def capFingerprint(hot: Option[DataFrame]): String =
    hot match {
      case None => "uncapped"
      case Some(h) =>
        val row = h.agg(count(lit(1)).as("n"),
          expr("bit_xor(shingle)").as("x"),
          expr("bit_xor(xxhash64(shingle))").as("s")).head()
        val n = row.getLong(0)
        val x = if (row.isNullAt(1)) 0L else row.getLong(1)
        val s = if (row.isNullAt(2)) 0L else row.getLong(2)
        s"$n:$x:$s"
    }

  /** Assert the persisted base (if any) was built in the SAME capped
    * shingle space as the cap now being supplied. A base with no
    * marker is legacy-uncapped: compatible only with `hot = None`.
    * Reads the [[graft.fs.IndexManifest]] row — the refusal quotes the
    * exact base entry a `--manifest` listing would show. */
  private[streaming] def requireCapCompatible(stateRoot: String,
      fingerprint: String): Unit =
    graft.fs.IndexManifest.liveBase(
        graft.fs.IndexManifest.dedup(stateRoot), "base")
      .foreach { e =>
        val stored = e.meta.getOrElse("cap", "uncapped")
        if (stored != fingerprint)
          throw new IllegalStateException(
            s"shingle-space mismatch at $stateRoot: base snapshot cap marker " +
              s"'$stored' != supplied '$fingerprint' (manifest row: " +
              s"kind=${e.kind} component=${e.component} path=${e.path} " +
              s"watermark=${e.watermark}) — a base built in one capped " +
              "space cannot be probed/extended in another; rebuild " +
              "the index or supply the matching hotShingles set")
      }

  // delta listing (lookalike skipping, overflow guards) is the shared
  // [[graft.fs.DeltaDirs]] protocol, also used by the persisted IVF index

  /** The kept-corpus shingle index in PARTS — head is the compacted
    * base snapshot (read through [[SnapshotDir.readAt]], so a bucketed
    * base keeps its HashPartitioning and the per-batch delta⋈base join
    * never shuffles the corpus side), tail is the live delta dirs.
    * The base pointer is resolved ONCE and both the data and the
    * watermark come from that same resolved snapshot — re-resolving
    * for the watermark could pair an old base with a newer mark (and
    * wrongly retire deltas the old base never folded) if a concurrent
    * compaction flips the pointer mid-load. */
  /** Fail loudly on a pre-hashed-shingle (string-keyed) state dir: the
    * index format changed from `shingle: string` to `shingle: long`
    * (xxhash64), and force-reading old parquet through the new schema
    * would either throw deep in a batch or — worse — null-coerce the
    * join key and silently keep every duplicate. */
  private def requireCurrentFormat(dir: String): Unit = {
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty).filter(_.getName.endsWith(".parquet"))
    // cheap footer sniff via a throwaway schema inference on ONE file
    files.headOption.foreach { f =>
      val session = org.apache.spark.sql.SparkSession.active
      val dt = session.read.parquet(f.getPath).schema
        .find(_.name == "shingle").map(_.dataType)
      if (dt.contains(StringType))
        throw new IllegalStateException(
          s"shingle index at $dir uses the old string-keyed format; " +
            "rebuild the index (hashed int64 shingles) before resuming")
    }
  }

  private[streaming] def loadIndexParts(spark: SparkSession,
      stateRoot: String): Seq[DataFrame] = {
    val baseRoot = s"$stateRoot/base"
    val resolved = SnapshotDir.currentDir(baseRoot)
      .filter(d => Files.exists(Paths.get(d)))
    resolved.foreach(requireCurrentFormat)
    val (base, mark) = resolved match {
      case Some(d) =>
        (SnapshotDir.readAt(spark, d, indexSchema),
          DeltaDirs.watermark(SnapshotDir.metaAt(d)))
      case None =>
        (spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], indexSchema), -1L)
    }
    val deltas = DeltaDirs.live(stateRoot, mark)
    if (deltas.isEmpty) Seq(base)
    else Seq(base, spark.read.schema(indexSchema).parquet(deltas: _*))
  }

  /** The whole index as one frame (parts unioned) — for consumers that
    * don't join (counts, compaction rewrite). Joins should use the
    * parts form; a pre-join union erases the base's bucketing. */
  private[streaming] def loadIndex(spark: SparkSession, stateRoot: String): DataFrame =
    loadIndexParts(spark, stateRoot).reduce(_ unionByName _)

  // ------------------------------------------------------------ per-batch step

  /** One micro-batch's keep/drop decisions against the current index
    * (exposed for testing; [[continuousDedup]] drives it). Returns
    * (decisions(doc_id, kept), keptShingleRows, cleanup) — call
    * cleanup() after consuming both DFs to drop the per-batch caches
    * (foreachBatch runs unboundedly; leaked cache blocks accumulate). */
  private[streaming] def decideBatch(batch: DataFrame, index: DataFrame,
      n: Int, threshold: Double,
      hotShingles: Option[DataFrame] = None): (DataFrame, DataFrame, () => Unit) =
    decideBatchParts(batch, Seq(index), n, threshold, hotShingles)

  /** [[decideBatch]] with the index in parts (bucketed base + deltas) —
    * the corpus join runs per part (Dedup.deltaPairsFromParts) so the
    * base side's bucketing is not erased by a pre-join union.
    *
    * `hotShingles`: the optional df-capped shingle drop list
    * ([[Dedup.hotShingles]], published once per corpus era). Every
    * batch shingles into the capped space, and because the published
    * index is built from THESE batch rows, base + deltas + probe all
    * stay in one consistent capped space automatically — the streaming
    * twin of [[Dedup.deltaPairsCapped]], bounding a viral shingle's
    * per-batch join fan-out. */
  private[streaming] def decideBatchParts(batch: DataFrame, indexParts: Seq[DataFrame],
      n: Int, threshold: Double,
      hotShingles: Option[DataFrame] = None): (DataFrame, DataFrame, () => Unit) = {
    val newDocs = batch.select(col("doc_id"), col("text"))
      .filter(col("doc_id").isNotNull) // a null id can't be deduplicated or keyed
      // deterministic pick when a batch carries the same doc_id with
      // different text (dropDuplicates picks an arbitrary row — a crash
      // replay could pick a DIFFERENT one and break the "replay
      // decisions are identical" contract): keep the max text
      .groupBy("doc_id").agg(max(col("text")).as("text"))
      .cache()
    val newIds = newDocs.select("doc_id")
    // ONE tokenize+shingle pass feeds both the pair join and the kept-
    // shingle fold-in (capped-space when a hot list is published)
    val newIdx = hotShingles
      .map(h => Dedup.shingleIndexCapped(newDocs, n, h))
      .getOrElse(Dedup.shingleIndex(newDocs, n))
      .cache()
    // pairs feed aggregation below — the unsorted core skips the
    // presentation exchange deltaPairsFromParts adds for query output
    val pairs = Dedup.deltaPairsFromPartsRaw(newIdx, indexParts, threshold)
      // replay guard: after a successful index publish, a replayed kept
      // doc matches its OWN corpus entry at jaccard 1.0 — not a dup
      .filter(col("doc_a") =!= col("doc_b"))
      .select("doc_a", "doc_b").cache()
    // classify pair sides by tagging against the SMALL, bounded batch id
    // set (broadcasting the ever-growing corpus id set would eventually
    // exceed any broadcast limit)
    val tagged = pairs
      .join(broadcast(newIds.toDF("doc_a").withColumn("_a_new", lit(true))),
        Seq("doc_a"), "left")
      .join(broadcast(newIds.toDF("doc_b").withColumn("_b_new", lit(true))),
        Seq("doc_b"), "left")
    val pairedWithCorpus = tagged.filter(col("_a_new").isNull && col("_b_new").isNotNull)
      .select(col("doc_b").as("doc_id"))
      .unionByName(tagged.filter(col("_b_new").isNull && col("_a_new").isNotNull)
        .select(col("doc_a").as("doc_id")))
      .distinct()
    // within-batch near-dup clusters keep their min-id member
    val withinPairs = tagged.filter(col("_a_new").isNotNull && col("_b_new").isNotNull)
      .select("doc_a", "doc_b")
    val clusterDrops = Dedup.clusters(withinPairs)
      .filter(col("doc_id") =!= col("cluster")).select("doc_id")
    val drops = pairedWithCorpus.unionByName(clusterDrops).distinct()
      // kept-wins invariant: a doc already in the kept corpus (replay of
      // a published batch) is never flipped to dropped
      .join(indexParts.map(_.select("doc_id")).reduce(_ unionByName _).distinct(),
        Seq("doc_id"), "left_anti")
      .withColumn("_drop", lit(true))
    val decisions = newDocs.join(drops, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(!col("_drop"), lit(true)).as("kept"))
      .cache() // consumed by the decisions write AND the kept-shingle filter
    val keptShingles = newIdx.join(
      decisions.filter(col("kept")).select("doc_id"), "doc_id")
      .select("shingle", "doc_id", "n_sh")
    (decisions, keptShingles, () => {
      newDocs.unpersist(); newIdx.unpersist(); pairs.unpersist()
      decisions.unpersist(); ()
    })
  }

  /** Start continuously deduplicating a document stream. Decisions
    * land as parquet appends in `outDir`; the kept-corpus shingle
    * index lives under `stateRoot` as base snapshot + per-batch deltas,
    * compacted every `compactEvery` batches. Compaction publishes the
    * base BUCKETED by shingle into `numBuckets` buckets, so the
    * dominant per-batch cost — delta ⋈ base — never shuffles the
    * corpus side (on a cluster, size numBuckets to executors × cores;
    * re-bucketing happens only at compaction, which already rewrites
    * the base). */
  /** Production COLD START: publish the compacted bucketed base
    * directly from a raw already-kept corpus, so the very first
    * streaming batch probes a bucketed snapshot instead of paying the
    * one-scan bootstrap cache per batch ([[Dedup
    * .deltaPairsCappedOneScan]]'s shape is for the ad-hoc batch job;
    * a STREAM against a big corpus derives the index once, here).
    * The base carries watermark -1 (no deltas folded) and the cap
    * fingerprint of `hotShingles`, so [[continuousDedup]]'s
    * compatibility guard accepts exactly the same capped space it
    * was built in. One posting-volume shuffle (the bucket write);
    * afterwards every batch bucket-joins the base without shuffling
    * the corpus side — the O(delta) per-batch contract. */
  def bootstrapBase(spark: SparkSession, keptDocs: DataFrame, stateRoot: String,
      n: Int = 3, numBuckets: Int = 16,
      hotShingles: Option[DataFrame] = None): Unit = {
    Files.createDirectories(Paths.get(stateRoot))
    val idx = hotShingles match {
      case Some(hot) => Dedup.shingleIndexCapped(keptDocs, n, hot)
      case None => Dedup.shingleIndex(keptDocs, n)
    }
    SnapshotDir.publishBucketed(
      idx.dropDuplicates("shingle", "doc_id"), s"$stateRoot/base",
      bucketCol = "shingle", numBuckets = numBuckets,
      meta = Map("compacted_through" -> "-1",
        "cap" -> capFingerprint(hotShingles)))
  }

  def continuousDedup(spark: SparkSession, stagingDir: String, stateRoot: String,
      outDir: String, checkpointDir: String, n: Int = 3, threshold: Double = 0.5,
      trigger: Trigger = Trigger.AvailableNow(), compactEvery: Long = 16L,
      numBuckets: Int = 16, readOptions: Map[String, String] = Map.empty,
      hotShingles: Option[DataFrame] = None): StreamingQuery = {
    // one fingerprint per stream start: asserts the existing base (if
    // any) matches the supplied cap, and stamps every compaction below
    val capMark = capFingerprint(hotShingles)
    requireCapCompatible(stateRoot, capMark)
    readDocs(spark, stagingDir, readOptions).writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        Files.createDirectories(Paths.get(stateRoot))
        val indexParts = loadIndexParts(s, stateRoot)
        val (decisions, keptShingles, cleanup) =
          decideBatchParts(batch, indexParts, n, threshold, hotShingles)
        try {
          decisions.withColumn("batch_id", lit(batchId))
            .write.mode("append").parquet(outDir)
          // O(batch) per-batch write; replay overwrites the same dir
          keptShingles.write.mode("overwrite")
            .parquet(s"$stateRoot/delta-$batchId")
          if (compactEvery > 0 && batchId % compactEvery == compactEvery - 1) {
            // periodic O(corpus) fold: deltas ≤ batchId into the base,
            // with the watermark published atomically WITH the base
            // (crash before the flip → old base + old watermark, deltas
            // still live; after → new base whose watermark retires them).
            // Delta removal afterwards is best-effort cleanup only.
            SnapshotDir.publishBucketed(
              loadIndex(s, stateRoot).dropDuplicates("shingle", "doc_id"),
              s"$stateRoot/base", bucketCol = "shingle", numBuckets = numBuckets,
              meta = Map("compacted_through" -> batchId.toString,
                "cap" -> capMark))
            // best-effort cleanup: the new watermark already retires
            // these deltas, so even a failed LISTING only costs disk
            val retired =
              try DeltaDirs.list(stateRoot)
              catch { case scala.util.control.NonFatal(_) => Seq.empty }
            retired.foreach { case (id, p) =>
              // per-entry guard: a single undeletable delta must not
              // abort the batch (it is retired by the watermark anyway)
              if (id <= batchId)
                try graft.fs.SnapshotDir.deleteRecursively(Paths.get(p))
                catch { case scala.util.control.NonFatal(_) => () }
            }
          }
        } finally cleanup()
      }
      .start()
  }
}
