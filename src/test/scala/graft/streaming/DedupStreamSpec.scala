package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  test("continuousDedup: corpus near-dups drop, within-batch clusters keep min id") {
    val staging = Files.createTempDirectory("graft-ddstream-in")
    val state = Files.createTempDirectory("graft-ddstream-state").toString
    val out = Files.createTempDirectory("graft-ddstream-out").toString
    val ckpt = Files.createTempDirectory("graft-ddstream-ckpt").toString

    def runOnce(): Unit = {
      val q = DedupStream.continuousDedup(spark, staging.toString, state, out, ckpt,
        n = 3, threshold = 0.5, trigger = Trigger.AvailableNow())
      q.awaitTermination(120000)
    }

    // batch 1: two distinct docs → both kept. Running the stream to
    // completion BEFORE writing batch 2 makes the batch split
    // deterministic (no reliance on file mtime ordering).
    Seq((1L, "aa bb cc dd ee ff"), (2L, "zz yy xx ww vv uu"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(staging.toString)
    runOnce()
    // batch 2: 3 = exact text of 1 (cross-batch corpus near-dup, dropped);
    //          4 distinct (kept); 5 = exact text of 4 (within-batch, 5 > 4 → dropped)
    Seq((3L, "aa bb cc dd ee ff"), (4L, "mm nn oo pp qq rr"), (5L, "mm nn oo pp qq rr"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(staging.toString)
    runOnce()

    val decisions = spark.read.parquet(out)
      .select("doc_id", "kept").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(decisions(1L) && decisions(2L), decisions.toString)
    assert(!decisions(3L)) // near-dup of kept corpus doc 1
    assert(decisions(4L))
    assert(!decisions(5L)) // within-batch cluster keeps min id 4
    // the persisted index holds shingles of exactly the kept docs
    val idx = DedupStream.loadIndex(spark, state)
    assert(idx.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 4L))
  }

  test("bootstrapBase: cold-start base accepted by the stream, dedups against it") {
    val staging = Files.createTempDirectory("graft-ddboot-in")
    val state = Files.createTempDirectory("graft-ddboot-state").toString
    val out = Files.createTempDirectory("graft-ddboot-out").toString
    val ckpt = Files.createTempDirectory("graft-ddboot-ckpt").toString
    val kept = Seq((1L, "aa bb cc dd ee ff"), (2L, "zz yy xx ww vv uu"))
      .toDF("doc_id", "text")
    DedupStream.bootstrapBase(spark, kept, state, n = 3, numBuckets = 4)
    // the bootstrap publishes a watermark -1 bucketed base
    assert(DedupStream.compactedThrough(state) == -1L)
    val idx = DedupStream.loadIndex(spark, state)
    assert(idx.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      == Set(1L, 2L))
    // the very first streamed batch dedups against the bootstrap base
    Seq((3L, "aa bb cc dd ee ff"), (4L, "mm nn oo pp qq rr"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(staging.toString)
    DedupStream.continuousDedup(spark, staging.toString, state, out, ckpt,
      n = 3, threshold = 0.5, trigger = Trigger.AvailableNow())
      .awaitTermination(120000)
    val decisions = spark.read.parquet(out)
      .select("doc_id", "kept").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(!decisions(3L)) // near-dup of bootstrap corpus doc 1
    assert(decisions(4L))
    // capped bootstrap + mismatched stream cap must fail loudly
    val state2 = Files.createTempDirectory("graft-ddboot-state2").toString
    val hot = Seq(123456789L).toDF("shingle")
    DedupStream.bootstrapBase(spark, kept, state2, n = 3, numBuckets = 4,
      hotShingles = Some(hot))
    val e = intercept[IllegalStateException] {
      DedupStream.continuousDedup(spark, staging.toString, state2, out,
        Files.createTempDirectory("graft-ddboot-ckpt2").toString,
        n = 3, threshold = 0.5, trigger = Trigger.AvailableNow())
    }
    assert(e.getMessage.toLowerCase.contains("cap"))
  }

  test("compaction folds deltas into the base and loads see one copy") {
    val staging = Files.createTempDirectory("graft-ddcomp-in")
    val state = Files.createTempDirectory("graft-ddcomp-state").toString
    val out = Files.createTempDirectory("graft-ddcomp-out").toString
    val ckpt = Files.createTempDirectory("graft-ddcomp-ckpt").toString
    // compactEvery = 1 → every batch compacts (batchId 0 % 1 == 0)
    Seq((1L, "aa bb cc dd ee"), (2L, "zz yy xx ww vv"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(staging.toString)
    val q = DedupStream.continuousDedup(spark, staging.toString, state, out, ckpt,
      compactEvery = 1L, trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)
    assert(DedupStream.compactedThrough(state) == 0L)
    val idx = DedupStream.loadIndex(spark, state)
    // no double counting: one row per (shingle, doc_id)
    assert(idx.count() == idx.dropDuplicates("shingle", "doc_id").count())
    assert(idx.select("doc_id").distinct().count() == 2)
    // crash window: base published (watermark 0) but the folded delta dir
    // was never removed — loads must ignore it, not double-count
    val n = idx.count()
    idx.write.mode("overwrite").parquet(s"$state/delta-0")
    assert(DedupStream.loadIndex(spark, state).count() == n)
  }

  test("mixed base+delta index: compaction at batch 1, live delta at batch 2") {
    val staging = Files.createTempDirectory("graft-ddmix-in")
    val state = Files.createTempDirectory("graft-ddmix-state").toString
    val out = Files.createTempDirectory("graft-ddmix-out").toString
    val ckpt = Files.createTempDirectory("graft-ddmix-ckpt").toString
    def runOnce(): Unit = {
      // compactEvery=2 → batch 1 compacts (1 % 2 == 1), batches 0 and 2 don't
      val q = DedupStream.continuousDedup(spark, staging.toString, state, out, ckpt,
        compactEvery = 2L, trigger = Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    Seq((1L, "aa bb cc dd ee")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(staging.toString)
    runOnce() // batch 0: delta only
    Seq((2L, "zz yy xx ww vv")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(staging.toString)
    runOnce() // batch 1: compacts 0..1 into the base
    assert(DedupStream.compactedThrough(state) == 1L)
    Seq((3L, "aa bb cc dd ee"), (4L, "qq rr ss tt uu")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(staging.toString)
    runOnce() // batch 2: decided against base(1,2) — 3 must drop via the BASE
    val decisions = spark.read.parquet(out)
      .select("doc_id", "kept").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(decisions == Map(1L -> true, 2L -> true, 3L -> false, 4L -> true), decisions)
    // index view = base(1,2) ∪ live delta(4), no duplicates
    val idx = DedupStream.loadIndex(spark, state)
    assert(idx.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 4L))
    assert(idx.count() == idx.dropDuplicates("shingle", "doc_id").count())
  }

  test("decideBatch replay against the ALREADY-updated index keeps its decisions") {
    val docs = Seq((1L, "aa bb cc dd ee"), (2L, "aa bb cc dd ee")).toDF("doc_id", "text")
    val emptyIdx = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], DedupStream.indexSchema)
    val (d1, sh1, c1) = DedupStream.decideBatch(docs, emptyIdx, 3, 0.5)
    val kept1 = d1.filter($"kept").collect().map(_.getLong(0)).toSet
    val published = sh1.collect()
    assert(kept1 == Set(1L)) // exact dup in-batch keeps the min id
    c1()
    // crash AFTER the index publish but BEFORE the offset commit: the
    // replayed batch sees its own kept shingles in the corpus. Doc 1
    // must NOT self-pair into a drop; doc 2 stays dropped.
    val updatedIdx = published.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.toDF("shingle", "doc_id", "n_sh")
    val (d2, _, c2) = DedupStream.decideBatch(docs, updatedIdx, 3, 0.5)
    val kept2 = d2.filter($"kept").collect().map(_.getLong(0)).toSet
    c2()
    assert(kept2 == kept1, s"replay flipped decisions: $kept2 vs $kept1")
  }

  test("capped batches: boilerplate-only matches stop pairing, real dups still drop") {
    // corpus doc 100 and batch docs share the boilerplate "pp qq rr ss
    // tt"; batch doc 2 is a true near-copy of corpus doc 100 beyond
    // the boilerplate, batch doc 3 shares ONLY the boilerplate
    val corpusDocs = Seq((100L, "pp qq rr ss tt aa bb cc dd ee")).toDF("doc_id", "text")
    val batch = Seq(
      (2L, "pp qq rr ss tt aa bb cc dd ee"),  // verbatim copy → must drop
      (3L, "pp qq rr ss tt vv ww xx yy zz")   // boilerplate only
    ).toDF("doc_id", "text")
    // hot list = the boilerplate's shingles (df > 2 across the era's docs)
    val hot = graft.operators.Dedup.hotShingles(
      corpusDocs.unionByName(batch), n = 3, cap = 2L)
    assert(hot.count() > 0)
    val cappedIdx = graft.operators.Dedup.shingleIndexCapped(corpusDocs, 3, hot)
    // UNCAPPED, doc 3 pairs with the corpus through the shared prefix
    // (3 shared of 13 union shingles → jaccard ≈ 0.23, so a loose 0.2
    // threshold is where the boilerplate link fires)
    val (dU, _, cU) = DedupStream.decideBatch(batch,
      graft.operators.Dedup.shingleIndex(corpusDocs, 3), 3, 0.2)
    val keptU = dU.filter($"kept").collect().map(_.getLong(0)).toSet
    cU()
    assert(keptU == Set.empty[Long]) // both pair with the corpus uncapped
    // CAPPED at the same threshold: the boilerplate link is gone for
    // doc 3; doc 2 still drops through its rare-shingle overlap
    val (dC, shC, cC) = DedupStream.decideBatch(batch, cappedIdx, 3, 0.2,
      hotShingles = Some(hot))
    val keptC = dC.filter($"kept").collect().map(_.getLong(0)).toSet
    // the published shingles are capped-space too (self-consistent index)
    val pubHot = shC.join(hot, Seq("shingle"), "left_semi").count()
    cC()
    assert(keptC == Set(3L), s"capped decisions: $keptC")
    assert(pubHot == 0L)
  }

  test("compacted base is bucketed: the per-batch corpus join has no Exchange on the base side") {
    val staging = Files.createTempDirectory("graft-ddbkt-in")
    val state = Files.createTempDirectory("graft-ddbkt-state").toString
    val out = Files.createTempDirectory("graft-ddbkt-out").toString
    val ckpt = Files.createTempDirectory("graft-ddbkt-ckpt").toString
    Seq((1L, "aa bb cc dd ee"), (2L, "zz yy xx ww vv"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(staging.toString)
    val q = DedupStream.continuousDedup(spark, staging.toString, state, out, ckpt,
      compactEvery = 1L, numBuckets = 4, trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)

    // the base part loads as a bucketed catalog table...
    val base = DedupStream.loadIndexParts(spark, state).head
    val delta = Seq((123456789L, 9L, 3L)).toDF("shingle", "doc_id", "n_sh")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-family join a 100 TB base would take (a tiny
      // test base broadcasts and hides the property under test)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = base.as("a").join(delta.as("b"), $"a.shingle" === $"b.shingle")
      val plan = joined.queryExecution.executedPlan.toString
      // ...whose side of the join reads bucketed with NO Exchange: the
      // only Exchange in the plan is the (bounded) delta side
      assert(plan.contains("Bucketed: true"), s"base scan not bucketed:\n$plan")
      val exchanges = "Exchange".r.findAllIn(plan).size
      assert(exchanges == 1, s"expected only the delta-side Exchange, plan:\n$plan")
      // decisions through the parts path still work against the bucketed base
      val (d, _, c) = DedupStream.decideBatchParts(
        Seq((3L, "aa bb cc dd ee")).toDF("doc_id", "text"),
        DedupStream.loadIndexParts(spark, state), 3, 0.5)
      val kept = d.collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      c()
      assert(kept == Map(3L -> false)) // near-dup of kept corpus doc 1
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("cap marker: a base built in one shingle space refuses a mismatched cap") {
    val staging = Files.createTempDirectory("graft-ddcap-in")
    val state = Files.createTempDirectory("graft-ddcap-state").toString
    val out = Files.createTempDirectory("graft-ddcap-out").toString
    val ckpt = Files.createTempDirectory("graft-ddcap-ckpt").toString
    // era 1: an UNCAPPED stream compacts a base (compactEvery=1)
    Seq((1L, "aa bb cc dd ee"), (2L, "zz yy xx ww vv"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(staging.toString)
    DedupStream.continuousDedup(spark, staging.toString, state, out, ckpt,
      compactEvery = 1L, trigger = Trigger.AvailableNow()).awaitTermination(120000)
    // the compacted base carries the uncapped marker
    import graft.fs.SnapshotDir
    assert(SnapshotDir.loadMeta(s"$state/base").get("cap").contains("uncapped"))

    // era 2: resuming WITH a cap against the uncapped base must fail
    // loudly — mixed capped/uncapped n_sh skews every jaccard
    val hot = Seq(42L).toDF("shingle")
    val e = intercept[IllegalStateException] {
      DedupStream.continuousDedup(spark, staging.toString, state, out,
        Files.createTempDirectory("graft-ddcap-ckpt2").toString,
        compactEvery = 1L, trigger = Trigger.AvailableNow(),
        hotShingles = Some(hot))
    }
    assert(e.getMessage.contains("shingle-space mismatch"))
    // the refusal quotes the SAME row the IndexManifest view shows —
    // the guard and the operator surface share one resolution path
    val viewRow = graft.fs.IndexManifest.manifest(spark,
        Seq(graft.fs.IndexManifest.dedup(state)))
      .filter(org.apache.spark.sql.functions.col("entry") === "base").head()
    assert(viewRow.getString(7) == "uncapped") // cap column
    assert(e.getMessage.contains(s"path=${viewRow.getString(3)}"))
    // resuming uncapped (the matching space) still works
    DedupStream.continuousDedup(spark, staging.toString, state, out,
      Files.createTempDirectory("graft-ddcap-ckpt3").toString,
      compactEvery = 1L, trigger = Trigger.AvailableNow())
      .awaitTermination(120000)
    // fingerprint is deterministic and order-free over the set
    val fpA = DedupStream.capFingerprint(Some(Seq(7L, 9L, 11L).toDF("shingle")))
    val fpB = DedupStream.capFingerprint(
      Some(Seq(11L, 7L, 9L).toDF("shingle").repartition(3)))
    assert(fpA == fpB && fpA != "uncapped")
    // the count+xor degeneracy is broken: {1,2} and {4,7} share size
    // and raw xor (3), but the re-hashed third field separates them
    val fpC = DedupStream.capFingerprint(Some(Seq(1L, 2L).toDF("shingle")))
    val fpD = DedupStream.capFingerprint(Some(Seq(4L, 7L).toDF("shingle")))
    assert(fpC != fpD)
  }

  test("torn base compaction: readers keep base+deltas; next compaction converges") {
    import java.nio.file.Paths
    val staging = Files.createTempDirectory("graft-ddcrash-in")
    val state = Files.createTempDirectory("graft-ddcrash-state").toString
    val out = Files.createTempDirectory("graft-ddcrash-out").toString
    val ckpt = Files.createTempDirectory("graft-ddcrash-ckpt").toString
    // batch 0 with compaction disabled → live delta-0, no base yet
    Seq((1L, "aa bb cc dd ee")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(staging.toString)
    DedupStream.continuousDedup(spark, staging.toString, state, out, ckpt,
      compactEvery = 0L, trigger = Trigger.AvailableNow()).awaitTermination(120000)
    assert(DedupStream.loadIndex(spark, state)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet == Set(1L))

    // inject a compaction torn before the pointer flip: a complete but
    // unpointed base snap dir whose meta claims delta-0 folded (if any
    // reader consulted it, doc 1's shingles would vanish AND delta-0
    // would read as retired), plus a stale temp pointer and a partial
    // snap dir from a mid-write death
    val orphan = s"$state/base/snap-999999999999999999"
    Seq((0L, "ghost")).toDF("k", "v").write.parquet(orphan)
    Files.writeString(Paths.get(s"$orphan/_snapmeta"),
      "bucket_col=shingle\nbucket_n=16\ncap=uncapped\ncompacted_through=0")
    Files.writeString(Paths.get(s"$state/base/.CURRENT-1"),
      "snap-999999999999999999")
    val partial = Paths.get(s"$state/base/snap-777777777777777777")
    Files.createDirectories(partial)
    Files.writeString(partial.resolve("part-00000-torn.parquet"), "torn")

    // readers: no pointer was ever flipped, so the index view is still
    // exactly the live delta — doc 1 present, nothing retired
    assert(DedupStream.loadIndex(spark, state)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet == Set(1L))

    // retry: batch 1 runs WITH compaction (1 % 1 == 0) — its decisions
    // must still see doc 1 (the near-copy drops), and the compaction
    // publishes a real base, retires the deltas, and sweeps the debris
    Seq((2L, "aa bb cc dd ee"), (3L, "qq rr ss tt uu")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(staging.toString)
    DedupStream.continuousDedup(spark, staging.toString, state, out, ckpt,
      compactEvery = 1L, trigger = Trigger.AvailableNow()).awaitTermination(120000)
    val decisions = spark.read.parquet(out)
      .select("doc_id", "kept").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(decisions == Map(1L -> true, 2L -> false, 3L -> true), decisions.toString)
    assert(DedupStream.compactedThrough(state) == 1L)
    assert(DedupStream.loadIndex(spark, state)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    for (p <- Seq(orphan, s"$state/base/.CURRENT-1", partial.toString))
      assert(!Files.exists(Paths.get(p)), s"debris not swept: $p")
  }

  test("null doc_id rows are excluded from decisions") {
    val docs = Seq((Some(7L), "aa bb cc"), (None, "dd ee ff"))
      .toDF("doc_id", "text")
    val emptyIdx = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], DedupStream.indexSchema)
    val (d, _, c) = DedupStream.decideBatch(docs, emptyIdx, 3, 0.5)
    val rows = d.collect()
    c()
    assert(rows.map(_.getLong(0)).toSeq == Seq(7L))
  }
}
