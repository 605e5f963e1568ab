package graft.fs

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Retired-snapshot retention (SnapshotDir's grace ledger): the fix
  * for the ANN-serving compaction race, where an in-flight reader that
  * resolved the old pointer moments before a publish flip used to
  * error on deleted files (reference contract: readers never observe a
  * torn index — /root/reference/file_indexer/indexer.py keeps readers
  * on the committed DB; our multi-file snapshots need the grace window
  * to give the same guarantee to ALREADY-RESOLVED readers).
  *
  * Proven here:
  *  - a reader holding the superseded snapshot's DataFrame still
  *    materializes it after the flip (the soak race, deterministic);
  *  - debris is bounded: the ledger and on-disk retired set never
  *    exceed `maxRetained`, whatever the publish rate;
  *  - grace 0 restores the old delete-at-flip behavior;
  *  - GC self-heals ledger entries whose dir a crash already removed,
  *    and the orphan sweep never reaps a retained (ledgered) snapshot;
  *  - the stale-read retry classifies wrapped missing-file failures
  *    and retries exactly once.
  */
class SnapshotRetentionSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def df(tag: String, n: Int) =
    (0 until n).map(i => (i.toLong, s"$tag-$i")).toDF("k", "v")

  private def snapDirs(root: String): Set[String] = {
    val out = scala.collection.mutable.Set.empty[String]
    val ds = Files.newDirectoryStream(Paths.get(root))
    try ds.forEach { p =>
      if (p.getFileName.toString.startsWith("snap-")) out += p.getFileName.toString
    } finally ds.close()
    out.toSet
  }

  private def withProps(props: (String, String)*)(body: => Unit): Unit = {
    val saved = props.map { case (k, _) => k -> sys.props.get(k) }
    props.foreach { case (k, v) => sys.props(k) = v }
    try body
    finally saved.foreach {
      case (k, Some(v)) => sys.props(k) = v
      case (k, None) => sys.props.remove(k)
    }
  }

  test("a reader that resolved the old snapshot survives a publish flip") {
    val root = Files.createTempDirectory("graft-retain1").toString
    SnapshotDir.publish(df("old", 5), root)
    // reader resolves the pointer and builds its (lazily-read) frame —
    // exactly what a serving probe does moments before a compaction
    val resolved = SnapshotDir.currentDir(root).get
    val reader = spark.read.parquet(resolved)
    SnapshotDir.publish(df("new", 3), root)
    // the flip happened under the reader: within the grace window its
    // files are intact and it materializes the OLD snapshot's rows
    assert(reader.count() == 5)
    assert(reader.select("v").collect().forall(_.getString(0).startsWith("old")))
    // while NEW readers resolve the new snapshot
    assert(SnapshotDir.load(spark, root, schema).count() == 3)
  }

  test("under disk pressure, debris is bounded by maxRetained however many publishes land") {
    // capPressurePct=0 forces the pressured branch deterministically
    withProps("graft.snap.maxRetained" -> "2",
        "graft.snap.capPressurePct" -> "0",
        "graft.snap.retainGraceMs" -> "3600000") {
      val root = Files.createTempDirectory("graft-retain2").toString
      (0 until 6).foreach(i => SnapshotDir.publish(df(s"g$i", 2), root))
      val ledger = SnapshotDir.retiredLedger(root)
      assert(ledger.length <= 2, s"ledger unbounded: $ledger")
      // on disk: current + at most maxRetained retired
      assert(snapDirs(root).size <= 3, snapDirs(root).toString)
      // the retained set is exactly the ledger (+ current)
      val current = Paths.get(SnapshotDir.currentDir(root).get).getFileName.toString
      assert(snapDirs(root) == ledger.map(_._1).toSet + current)
      // and retirement order is honored: the retained two are the
      // most recent predecessors
      assert(ledger.map(_._2) == ledger.map(_._2).sorted)
    }
  }

  test("under normal disk, the cap defers to grace: a publish burst cannot reap a reader's resolved base") {
    // capPressurePct=101 (usedPct ≤ 100) pins the unpressured branch:
    // within the grace window a burst of >maxRetained publishes keeps
    // every retired snapshot readable — the r12 soak race where an
    // already-built frame's base was reaped mid-collect with no retry
    withProps("graft.snap.maxRetained" -> "2",
        "graft.snap.capPressurePct" -> "101",
        "graft.snap.retainGraceMs" -> "3600000") {
      val root = Files.createTempDirectory("graft-retain-burst").toString
      SnapshotDir.publish(df("base", 4), root)
      val resolved = SnapshotDir.currentDir(root).get
      val reader = spark.read.parquet(resolved) // built once, held across the burst
      (0 until 5).foreach(i => SnapshotDir.publish(df(s"burst$i", 2), root))
      assert(SnapshotDir.retiredLedger(root).length == 5, "grace must retain the full burst")
      assert(reader.count() == 4, "resolved base reaped inside grace")
      // grace expiry still reaps them all: rewrite the ledger as if
      // retirement happened 2h ago, then GC
      val aged = SnapshotDir.retiredLedger(root)
        .map { case (n, t) => s"$n=${t - 7200000L}" }.mkString("\n")
      Files.writeString(Paths.get(s"$root/.retired"), aged)
      SnapshotDir.gcRetired(root)
      assert(SnapshotDir.retiredLedger(root).isEmpty, "expired entries must GC")
      assert(snapDirs(root).size == 1, snapDirs(root).toString)
    }
  }

  test("grace 0 + maxRetained 0 restores delete-at-flip") {
    withProps("graft.snap.retainGraceMs" -> "0",
        "graft.snap.maxRetained" -> "0") {
      val root = Files.createTempDirectory("graft-retain3").toString
      SnapshotDir.publish(df("a", 2), root)
      SnapshotDir.publish(df("b", 2), root)
      assert(snapDirs(root).size == 1)
      assert(SnapshotDir.retiredLedger(root).isEmpty)
    }
  }

  test("GC self-heals crash debris: gone dirs drop from the ledger, orphans sweep, retained dirs survive the sweep") {
    withProps("graft.snap.maxRetained" -> "4",
        "graft.snap.retainGraceMs" -> "3600000") {
      val root = Files.createTempDirectory("graft-retain4").toString
      SnapshotDir.publish(df("a", 2), root)
      SnapshotDir.publish(df("b", 2), root) // retires a
      val retainedA = SnapshotDir.retiredLedger(root).head._1
      // crash injection 1: a retained dir vanishes out from under the
      // ledger (operator rm / disk recovery) → entry self-heals away
      SnapshotDir.deleteRecursively(Paths.get(s"$root/$retainedA"))
      // crash injection 2: an unledgered orphan from a torn publish
      val orphan = s"$root/snap-111111111111111111"
      Files.createDirectories(Paths.get(orphan))
      Files.writeString(Paths.get(s"$orphan/part-junk.parquet"), "x")
      // crash injection 3: a junk ledger line must be skipped, not fatal
      Files.writeString(Paths.get(s"$root/.retired"),
        Files.readString(Paths.get(s"$root/.retired")) + "\ngarbage-line-no-equals")
      SnapshotDir.publish(df("c", 2), root) // retires b; GC + sweep run
      val ledger = SnapshotDir.retiredLedger(root).map(_._1).toSet
      assert(!ledger.contains(retainedA), s"gone dir still ledgered: $ledger")
      assert(!Files.exists(Paths.get(orphan)), "unledgered orphan not swept")
      // b stayed: it is ledgered, within grace, within the cap — the
      // orphan sweep must never reap a retained snapshot
      assert(ledger.exists(n => Files.exists(Paths.get(s"$root/$n"))),
        s"retained snapshot reaped: $ledger vs ${snapDirs(root)}")
      assert(SnapshotDir.load(spark, root, schema).count() == 2)
    }
  }

  test("stale-read retry: classifies wrapped missing-file failures, retries exactly once") {
    val fnf = new RuntimeException("stage failed",
      new java.io.FileNotFoundException("/gone/part-0.parquet"))
    assert(SnapshotDir.isStaleSnapshotRead(fnf))
    assert(SnapshotDir.isStaleSnapshotRead(
      new RuntimeException("org.apache.spark.SparkException: " +
        "java.io.FileNotFoundException: File file:/x does not exist")))
    assert(!SnapshotDir.isStaleSnapshotRead(new IllegalStateException("boom")))

    var attempts = 0
    val got = SnapshotDir.retryingStaleRead {
      attempts += 1
      if (attempts == 1) throw fnf else 42
    }
    assert(got == 42 && attempts == 2)

    // a PERSISTENT miss stays loud: one retry, then the error propagates
    attempts = 0
    intercept[RuntimeException] {
      SnapshotDir.retryingStaleRead[Int] { attempts += 1; throw fnf }
    }
    assert(attempts == 2)
    // non-stale failures never retry
    attempts = 0
    intercept[IllegalStateException] {
      SnapshotDir.retryingStaleRead[Int] {
        attempts += 1; throw new IllegalStateException("boom")
      }
    }
    assert(attempts == 1)
  }

  test("IVF probe resolved before a compaction flip materializes after it (the soak race)") {
    import graft.operators.IvfIndex
    val root = Files.createTempDirectory("graft-retain-ivf").toString
    val emb = (0L until 80L).map { i =>
      (i, Array.tabulate(16)(d => ((i * 37 + d * 11) % 17 - 8).toFloat / 8f))
    }.toDF("vec_id", "embedding")
    IvfIndex.build(emb.filter(col("vec_id") < 60), root,
      nCentroids = 4, iters = 1, numBuckets = 2)
    IvfIndex.append(emb.filter(col("vec_id") >= 60), root)
    val queries = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    // the in-flight probe: plan resolved against the PRE-compaction base
    val probe = IvfIndex.topk(spark, root, queries, k = 3, nProbe = 2)
    IvfIndex.compact(spark, root) // flips the cells pointer under it
    val rows = probe.collect() // grace retention keeps the old base readable
    assert(rows.nonEmpty)
    // and a freshly-resolved probe over the compacted base agrees
    val fresh = IvfIndex.topk(spark, root, queries, k = 3, nProbe = 2).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      fresh.map(r => (r.getLong(0), r.getLong(1))).toSet)
    graft.operators.OpCaches.releaseAll()
  }
}
