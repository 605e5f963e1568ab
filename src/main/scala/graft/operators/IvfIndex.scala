package graft.operators

import java.nio.file.StandardCopyOption

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.fs.{DeltaDirs, SnapshotDir}
import graft.functions.VectorOps

/** PERSISTED IVF index — the second "index once, query many" ANN
  * family next to [[AnnIndex]]'s hyperplane LSH. [[Ivf.topkIvf]]
  * retrains centroids and reassigns every vector on every call; at
  * corpus scale those are one-time build artifacts:
  *
  *  - `<root>/cells`: (vec_id, v, nrm, cell) — the inverted lists WITH
  *    the exact-rerank payload inline, hash-bucketed BY cell. A
  *    query's probe is an equi-join on cell whose corpus side reads
  *    pre-partitioned (no Exchange); because a vector belongs to
  *    exactly ONE cell (vs ~`tables` LSH buckets), the payload rides
  *    in the same table and candidates never need a second join to
  *    fetch vectors.
  *  - centroids ride the snapshot's atomic meta (k×dims doubles —
  *    ~16 KB at k=16, d=64; `Double.toString` round-trips exactly, so
  *    the decoded planes reproduce cell assignment bit-identically).
  *    A reader resolves the pointer ONCE and derives query cell
  *    scores from EXACTLY the centroids its snapshot was built with.
  *
  * Recall tunes per QUERY with nProbe (no rebuild); cell count and
  * training iterations are build parameters. Results are identical to
  * [[Ivf.topkIvf]] with the same parameters — the training is
  * deterministic (decimal-exact averaging), spec-checked.
  */
object IvfIndex {

  private val cellsSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("v", ArrayType(DoubleType)),
    StructField("nrm", DoubleType),
    StructField("cell", IntegerType)))

  /** Quantized-payload layout: int8 codes + code norm instead of the
    * double vector — ~64 B/vector of payload vs 512 (the FAISS IVF+SQ8
    * trade). The scale is PER VECTOR (each vector's own max |coord|):
    * cosine is scale-invariant per side, so a per-vector scale cancels
    * exactly in the ranking — every vector uses the full int8 range
    * (a corpus-global scale leaves small vectors ~5 effective bits),
    * and there is NO frozen-scale drift class: the first 100M-vector
    * soak froze the seed corpus's global max (0.577) and the appended
    * distribution (±1.0) saturated every code, collapsing recall to
    * 0.0 — with per-vector scales an appended batch can never be
    * mis-scaled by history. The scale itself is not stored: only the
    * codes and their norm ever enter the cosine. At 100 TB this is
    * the difference between an index that fits the cluster's disks
    * and one that doesn't. */
  private val cellsSchemaQ = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("q", ArrayType(ByteType)),
    StructField("qn", DoubleType),
    StructField("cell", IntegerType)))

  /** Meta marker for the quantized layout (value records the scheme). */
  private val QuantKey = "quant"
  private val QuantScheme = "sq8-pervec"

  private def isQuantized(meta: Map[String, String]): Boolean =
    meta.contains(QuantKey)
  private def schemaOf(meta: Map[String, String]): StructType =
    if (isQuantized(meta)) cellsSchemaQ else cellsSchema

  /** A vector's own quantization scale: max |coordinate|, floored so an
    * all-zero vector quantizes to zeros instead of NaN. */
  private def perVecScale(v: Column): Column =
    greatest(aggregate(v, lit(0.0d), (acc, x) => greatest(acc, abs(x))),
      lit(Double.MinPositiveValue))

  /** The quantized cells projection: per-vector codes + code norm,
    * cell from the FULL-precision vector (assignment quality is the
    * recall-limiting stage — it gets the exact coordinates; only the
    * stored payload is quantized). */
  private def quantCells(emb: DataFrame, centroids: Seq[Array[Double]]): DataFrame =
    Similarity.prepared(emb)
      .select(col("vec_id"), col("v"))
      .withColumn("cell", Ivf.assign(centroids))
      .withColumn("q", Similarity.quantCodes(col("v"), perVecScale(col("v"))))
      .withColumn("qn", graft.functions.VectorOps.norm(
        graft.functions.VectorOps.toDouble(col("q"))))
      .select("vec_id", "q", "qn", "cell")

  private[operators] def encode(cs: Seq[Array[Double]]): String =
    cs.map(_.mkString(",")).mkString(";")
  private[operators] def decode(s: String): Seq[Array[Double]] =
    s.split(";").toSeq.map(_.split(",").map(_.toDouble))

  /** Train centroids and publish the assigned corpus atomically under
    * `root` (single-writer by contract, like every SnapshotDir root).
    *
    * `emb` is the FULL corpus by contract, so a rebuild over an index
    * that has live appends retires every existing delta: the published
    * watermark covers them (they'd otherwise resurface as live against
    * the new base, cell-assigned with the OLD centroids and duplicating
    * every re-built vector), and the next [[compact]] sweeps the
    * directories. */
  def build(emb: DataFrame, root: String, nCentroids: Int = 16,
      iters: Int = 2, numBuckets: Int = 16,
      extraMeta: Map[String, String] = Map.empty,
      quantized: Boolean = false): Unit = {
    val prevMark = SnapshotDir.currentDir(s"$root/cells")
      .map(d => watermark(SnapshotDir.metaAt(d))).getOrElse(-1L)
    val retireThrough =
      (prevMark +: DeltaDirs.list(s"$root/cells").map(_._1)).max
    val centroids = Ivf.trainCentroids(emb, nCentroids, iters)
    val (cells, quantMeta) =
      if (quantized)
        (quantCells(emb, centroids), Map(QuantKey -> QuantScheme))
      else
        (Similarity.prepared(emb)
          .select(col("vec_id"), col("v"), col("nrm"))
          .withColumn("cell", Ivf.assign(centroids)),
          Map.empty[String, String])
    SnapshotDir.publishBucketed(cells, s"$root/cells",
      bucketCol = "cell", numBuckets = numBuckets,
      meta = Map("centroids" -> encode(centroids)) ++ quantMeta ++ extraMeta ++
        (if (retireThrough >= 0L)
           Map("compacted_through" -> retireThrough.toString)
         else Map.empty))
  }

  /** Bumped whenever the build pipeline's OUTPUT could change for the
    * same inputs (training, assignment, snapshot layout) — a persisted
    * index built by older code must not satisfy [[buildIfAbsent]]. */
  private val BuildFormat = "ivf-v2" // v2: quantized layout switched to per-vector SQ8

  /** Content fingerprint of a build request: corpus row count, an
    * order-independent XOR over (vec_id, embedding) row hashes
    * (overflow-free under ANSI mode, unlike a hash SUM; rows are
    * unique by vec_id so XOR self-cancellation needs a count match
    * AND a 64-bit collision), every build parameter (including
    * numBuckets — a re-bucketing request must rebuild), and the
    * build-format version. One narrow aggregate — far cheaper than
    * the `iters` full k-means passes + republish it can save. */
  private def buildFingerprint(emb: DataFrame, nCentroids: Int, iters: Int,
      numBuckets: Int, quantized: Boolean): String = {
    val r = emb.agg(count(lit(1)),
      expr("bit_xor(xxhash64(vec_id, embedding))")).head()
    s"$BuildFormat:${r.getLong(0)}:${if (r.isNullAt(1)) 0L else r.getLong(1)}:" +
      s"$nCentroids:$iters:$numBuckets:q=$quantized"
  }

  /** Idempotent [[build]] — the "train once, probe many" production
    * shape: re-running an ingest pipeline over an UNCHANGED corpus
    * publishes nothing. Skips the retrain iff the current snapshot
    * records the same fingerprint (build-format version + params +
    * row count + order-independent content hash) AND no LIVE deltas
    * exist (appends change the index content, so a rebuild must
    * retire them; retired-but-unswept dirs from a prior [[compact]]
    * don't count). [[compact]] deliberately drops `build_fp` from the
    * meta it republishes: folding deltas changes the index content,
    * so the next buildIfAbsent over ANY corpus must rebuild rather
    * than skip against a stale fingerprint. Returns true iff a build
    * ran. Training is deterministic, so a skipped republish would
    * have been bit-identical to the existing one. */
  def buildIfAbsent(emb: DataFrame, root: String, nCentroids: Int = 16,
      iters: Int = 2, numBuckets: Int = 16, quantized: Boolean = false): Boolean = {
    val fp = buildFingerprint(emb, nCentroids, iters, numBuckets, quantized)
    // staleness is a manifest question: the live cells base must carry
    // this exact build_fp AND no live (unfolded) delta rows may exist —
    // both read from the same IndexManifest walk the operator view shows
    val rows = graft.fs.IndexManifest.entries(Seq(graft.fs.IndexManifest.ivf(root)))
    val unchanged =
      rows.exists(e => e.entry == "base" && e.live &&
        e.meta.get("build_fp").contains(fp)) &&
        !rows.exists(e => e.entry == "delta" && e.live)
    if (!unchanged)
      build(emb, root, nCentroids, iters, numBuckets, Map("build_fp" -> fp),
        quantized)
    !unchanged
  }

  // ------------------------------------------------- incremental appends

  private def watermark(meta: Map[String, String]): Long =
    DeltaDirs.watermark(meta)

  private def centroidsOf(meta: Map[String, String], cellsDir: String): String =
    meta.getOrElse("centroids",
      sys.error(s"IVF snapshot at $cellsDir lacks centroids meta"))

  /** Append NEW vectors without a rebuild: assign them to the EXISTING
    * centroids (from the base snapshot being appended to) and land them
    * as an immutable `delta-<seq>` directory next to the base — O(delta)
    * work, the daily-ingest shape (a retrain + full republish rewrites
    * the whole corpus per arrival batch). [[topk]] probes base ∪ live
    * deltas; [[compact]] periodically folds deltas into a fresh
    * bucketed base, exactly the base+delta+watermark protocol of the
    * streaming dedup index ([[graft.streaming.DedupStream]]).
    *
    * Crash-safe: data lands in a `delta-tmp-*` dir (ignored by every
    * reader) and is atomically renamed into place — a crash leaves only
    * garbage that the next [[compact]] sweeps. Replay: pass the ingest
    * batch id as `seq` (mirroring the dedup stream's `delta-<batchId>`
    * keying) and a retry of an already-published — or already-compacted
    * — sequence is a no-op, making the append exactly-once per batch
    * id. THE ID IS THE IDENTITY: `seq` must come from a monotonically
    * increasing per-root sequence that is never restarted (a streaming
    * checkpoint's batchId qualifies; a RESET checkpoint does not — ids
    * reused for different data are indistinguishable from crash
    * replays and their batches are silently dropped, so a pipeline
    * that re-keys must rebuild the index instead). With `seq` unset
    * the sequence is auto-assigned and a retried crash-after-rename
    * duplicates the batch (at-least-once). Contract: single writer per
    * root (as for every SnapshotDir root) and appended vec_ids are new
    * (append-only corpus). Centroids never move on append, so recall
    * vs a retrained index decays only with corpus drift — watch the
    * recall contract row (`ss_topk_ivf_index_recall`) and rebuild when
    * it sags.
    *
    * @return the sequence number of the published delta */
  def append(emb: DataFrame, root: String, seq: Option[Long] = None): Long = {
    val cellsDir = SnapshotDir.currentDir(s"$root/cells")
      .getOrElse(sys.error(s"no IVF snapshot at $root — build before append"))
    val meta = SnapshotDir.metaAt(cellsDir)
    val centroids = decode(centroidsOf(meta, cellsDir))
    val mark = watermark(meta)
    val existing = DeltaDirs.list(s"$root/cells")
    val chosen = seq.getOrElse((mark +: existing.map(_._1)).max + 1L)
    if (seq.isDefined && (chosen <= mark || existing.exists(_._1 == chosen)))
      return chosen // replay of a published (possibly compacted) batch
    val tmp = java.nio.file.Paths.get(s"$root/cells/delta-tmp-${java.util.UUID.randomUUID()}")
    // the delta inherits the base's layout: per-vector scales mean an
    // appended batch quantizes against ITSELF — unlike the frozen
    // centroids (assignment drift stays a rebuild question watched by
    // the recall contract), quantization fidelity cannot drift
    val rows =
      if (isQuantized(meta))
        quantCells(emb, centroids)
      else
        Similarity.prepared(emb)
          .select(col("vec_id"), col("v"), col("nrm"))
          .withColumn("cell", Ivf.assign(centroids))
    rows.write.mode("overwrite").parquet(tmp.toString)
    java.nio.file.Files.move(tmp, tmp.resolveSibling(s"delta-$chosen"),
      StandardCopyOption.ATOMIC_MOVE)
    chosen
  }

  /** Fold live deltas into a fresh bucketed base (same centroids), with
    * the `compacted_through` watermark published atomically WITH the new
    * base: a crash before the pointer flip leaves old base + live
    * deltas; after it, the new base's watermark retires them.
    *
    * Delta removal is DEFERRED one generation: this call sweeps only
    * deltas the PREVIOUS watermark already retired, and leaves the
    * just-folded ones on disk for in-flight readers that resolved the
    * old base moments before the flip — deleting them immediately would
    * silently TRUNCATE such a reader's results (it would list no live
    * deltas for a base whose watermark doesn't cover them), which is
    * strictly worse than the loud file-not-found the base swap can
    * produce. The stragglers cost disk until the next compact/build.
    * Crash-orphaned `delta-tmp-*` staging dirs are swept here too (no
    * append is in flight under the single-writer contract).
    *
    * The bucket count is read from the base snapshot's own recorded
    * layout — pass `numBuckets` only to deliberately re-bucket (e.g.
    * resizing to a new executors×cores). */
  def compact(spark: SparkSession, root: String,
      numBuckets: Option[Int] = None): Unit = {
    val cellsDir = SnapshotDir.currentDir(s"$root/cells")
      .getOrElse(sys.error(s"no IVF snapshot at $root"))
    val meta = SnapshotDir.metaAt(cellsDir)
    val mark = watermark(meta)
    val buckets = numBuckets.orElse(meta.get("bucket_n").map(_.toInt))
      .getOrElse(sys.error(s"IVF snapshot at $cellsDir lacks bucket_n meta"))
    val (retired, live) = DeltaDirs.list(s"$root/cells").partition(_._1 <= mark)
    (retired.map(_._2) ++ DeltaDirs.orphanedTmp(s"$root/cells")).foreach { p =>
      // per-entry guard: an undeletable retired/orphan dir only costs disk
      try SnapshotDir.deleteRecursively(java.nio.file.Paths.get(p))
      catch { case scala.util.control.NonFatal(_) => () }
    }
    if (live.isEmpty) return
    val schema = schemaOf(meta)
    val all = SnapshotDir.readAt(spark, cellsDir, schema)
      .unionByName(spark.read.schema(schema).parquet(live.map(_._2): _*))
    SnapshotDir.publishBucketed(all, s"$root/cells",
      bucketCol = "cell", numBuckets = buckets,
      meta = Map("centroids" -> centroidsOf(meta, cellsDir),
        "compacted_through" -> live.map(_._1).max.toString) ++
        meta.get(QuantKey).map(QuantKey -> _))
  }

  /** Approximate top-k neighbors for each row of `queries`
    * ((query_id, embedding)): per query, pick the nProbe best cells by
    * centroid score, probe ONLY those inverted lists (bucketed corpus
    * side — no Exchange) plus any live append deltas, exact cosine
    * re-rank. The base and each delta are probed as SEPARATE joins
    * unioned afterwards, so the union never erases the base's bucketed
    * layout; delta sides are small by the append contract and join the
    * broadcast probe without shuffling either. Base, centroids, and
    * watermark all come from ONE resolved snapshot — re-resolving could
    * pair an old base with a newer watermark across a concurrent
    * compaction's pointer flip. */
  def topk(spark: SparkSession, root: String, queries: DataFrame,
      k: Int = 5, nProbe: Int = 4): DataFrame =
    // one stale-pointer retry: the resolve + file-listing phase below
    // can straddle a compaction flip whose GC already reaped the old
    // base (past its grace window); re-resolving once lands on the new
    // snapshot. Within the grace window no retry is needed — retired
    // files stay readable (SnapshotDir retention).
    SnapshotDir.retryingStaleRead { topkOnce(spark, root, queries, k, nProbe) }

  private def topkOnce(spark: SparkSession, root: String, queries: DataFrame,
      k: Int, nProbe: Int): DataFrame = {
    val cellsDir = SnapshotDir.currentDir(s"$root/cells")
      .getOrElse(sys.error(s"no IVF snapshot at $root"))
    val meta = SnapshotDir.metaAt(cellsDir)
    val centroids = decode(centroidsOf(meta, cellsDir))
    val mark = watermark(meta)
    val quant = isQuantized(meta)
    val schema = schemaOf(meta)
    val base = SnapshotDir.readAt(spark, cellsDir, schema)
    val liveDeltas = DeltaDirs.live(s"$root/cells", mark)
    val corpusParts =
      if (liveDeltas.isEmpty) Seq(base)
      else Seq(base, spark.read.schema(schema).parquet(liveDeltas: _*))

    // cell SELECTION always runs on the full-precision query vector
    // (the coarse quantizer is the recall-limiting stage); RANKING runs
    // in whatever space the index stores — per-vector int8 codes for a
    // quantized base (each side's scale cancels in its own norm, so
    // the quantized cosine tracks the exact one at int8 precision),
    // the exact vectors otherwise.
    val q0 = Similarity.prepared(
        queries.select(col("query_id").as("vec_id"), col("embedding")))
      .select(col("vec_id").as("query_id"), col("v"), col("nrm").as("qn"))
    val q =
      if (quant)
        q0.withColumn("rv",
            VectorOps.toDouble(Similarity.quantCodes(col("v"), perVecScale(col("v")))))
          .withColumn("rn", VectorOps.norm(col("rv")))
      else q0.withColumn("rv", col("v")).withColumn("rn", col("qn"))
    val cellScores = array(centroids.map(c => Ivf.score(col("v"), c)): _*)
    val qCells = q
      .select(col("query_id"), col("rv").as("qv"), col("rn").as("qn"),
        posexplode(cellScores).as(Seq("cell", "cscore")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cscore").desc, col("cell"))))
      .filter(col("rnk") <= nProbe)
      .select("query_id", "qv", "qn", "cell")

    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("cand_id"))
    corpusParts.map { part =>
      val cand =
        if (quant)
          part.select(col("vec_id").as("cand_id"),
            VectorOps.toDouble(col("q")).as("cv"), col("qn").as("cn"), col("cell"))
        else
          part.select(col("vec_id").as("cand_id"), col("v").as("cv"),
            col("nrm").as("cn"), col("cell"))
      broadcast(qCells)
        .join(cand, "cell")
        .filter(col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"),
          (VectorOps.dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cosine"))
    }
      // no distinct needed: the join key is the CANDIDATE's cell, each
      // candidate lives in exactly one cell and (by the append contract)
      // in exactly one part, so a (query, candidate) pair joins once
      // even though the query probes nProbe cells
      .reduce(_ unionByName _)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .orderBy("query_id", "rnk")
  }
}
