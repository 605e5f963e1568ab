package graft.fs

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Crash-injection tests for the snapshot swap (SnapshotDir) — the
  * transactional-write guarantee (reference G6,
  * /root/reference/file_indexer/indexer.py's commit-or-rollback DB
  * writes) proven OFF the happy path: a publish torn at every crash
  * point must leave readers on the old snapshot, and a retry must
  * converge and sweep the debris.
  *
  * Crash points exercised, in publish order:
  *  1. data write throws mid-snapshot (partial snap dir, no pointer);
  *  2. crash AFTER the snap dir is fully written but BEFORE the
  *     pointer flip (orphan snap dir) — simulated at the filesystem
  *     level, which is exactly the state a kill at that instant leaves;
  *  3. crash between the temp-pointer write and the atomic move
  *     (stale `.CURRENT-*` file).
  */
class SnapshotCrashSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def df(tag: String, n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"$tag-$i")).toDF("k", "v")
  }

  private def loadedTags(root: String): Set[String] =
    SnapshotDir.load(spark, root, schema)
      .select("v").collect().map(_.getString(0).takeWhile(_ != '-')).toSet

  test("torn publish: data write throws → readers keep old snapshot; retry converges") {
    val root = Files.createTempDirectory("graft-crash1").toString
    SnapshotDir.publish(df("old", 5), root, meta = Map("era" -> "1"))
    val oldDir = SnapshotDir.currentDir(root).get

    // a column that throws on evaluation tears the write mid-snapshot
    val bomb = udf((k: Long) =>
      if (k == 3L) throw new RuntimeException("injected crash") else "boom")
    val exploding = df("new", 5).withColumn("v", bomb(col("k")))
    intercept[Exception] { SnapshotDir.publish(exploding, root) }

    // pointer untouched: readers still resolve the OLD complete snapshot
    assert(SnapshotDir.currentDir(root).contains(oldDir))
    assert(loadedTags(root) == Set("old"))
    assert(SnapshotDir.loadMeta(root) == Map("era" -> "1"))

    // retry with good data converges; the failed attempt's partial snap
    // dir (created before our retry began) is swept by the retry. The
    // OLD snapshot is grace-retained (not an orphan), so exactly two
    // snap dirs remain: the new current and the retired predecessor.
    SnapshotDir.publish(df("new", 4), root, meta = Map("era" -> "2"))
    assert(loadedTags(root) == Set("new"))
    assert(SnapshotDir.loadMeta(root) == Map("era" -> "2"))
    val leftover = Files.list(Paths.get(root)).toArray.map(_.toString)
      .filter(_.contains("snap-")).map(p => Paths.get(p).getFileName.toString).toSet
    val retained = SnapshotDir.retiredLedger(root).map(_._1).toSet
    val current = Paths.get(SnapshotDir.currentDir(root).get).getFileName.toString
    assert(leftover == retained + current, s"orphans not swept: $leftover")
    assert(retained == Set(Paths.get(oldDir).getFileName.toString))
  }

  test("torn publish: complete snap dir but no pointer flip → invisible until retried") {
    val root = Files.createTempDirectory("graft-crash2").toString
    SnapshotDir.publish(df("old", 3), root)
    val oldDir = SnapshotDir.currentDir(root).get

    // simulate a kill between data write and pointer flip: a fully
    // written snapshot dir that CURRENT never came to name
    val orphan = s"$root/snap-999999999999999999"
    df("ghost", 3).write.parquet(orphan)
    Files.writeString(Paths.get(s"$orphan/_snapmeta"), "era=ghost")

    // readers: pointer still resolves the old snapshot; the orphan's
    // data and meta are both invisible
    assert(SnapshotDir.currentDir(root).contains(oldDir))
    assert(loadedTags(root) == Set("old"))
    assert(SnapshotDir.loadMeta(root) == Map.empty)

    // retry publishes fresh data and sweeps the orphan (it pre-existed
    // the retry, so it is a frozen orphan candidate)
    SnapshotDir.publish(df("new", 2), root)
    assert(loadedTags(root) == Set("new"))
    assert(!Files.exists(Paths.get(orphan)), "orphan snap dir not swept")
  }

  test("torn publish: stale temp pointer → atomic move debris never misleads readers") {
    val root = Files.createTempDirectory("graft-crash3").toString
    SnapshotDir.publish(df("old", 3), root)
    val oldDir = SnapshotDir.currentDir(root).get

    // simulate a kill between writing .CURRENT-<nonce> and the atomic
    // move: the temp pointer names a snapshot that WAS fully written
    val orphan = s"$root/snap-888888888888888888"
    df("ghost", 3).write.parquet(orphan)
    Files.writeString(Paths.get(s"$root/.CURRENT-1"), "snap-888888888888888888")

    // readers resolve only the real CURRENT — temp pointers are not
    // consulted, so the half-published snapshot stays invisible
    assert(SnapshotDir.currentDir(root).contains(oldDir))
    assert(loadedTags(root) == Set("old"))

    // retry converges and sweeps both the orphan dir and the temp pointer
    SnapshotDir.publish(df("new", 2), root)
    assert(loadedTags(root) == Set("new"))
    assert(!Files.exists(Paths.get(orphan)), "orphan snap dir not swept")
    assert(!Files.exists(Paths.get(s"$root/.CURRENT-1")), "temp pointer not swept")
  }

  test("bucketed publish crash: torn write keeps old bucketed snapshot readable") {
    val root = Files.createTempDirectory("graft-crash4").toString
    SnapshotDir.publishBucketed(df("old", 8), root, bucketCol = "k", numBuckets = 2)
    val oldDir = SnapshotDir.currentDir(root).get

    val bomb = udf((k: Long) =>
      if (k == 5L) throw new RuntimeException("injected crash") else "boom")
    intercept[Exception] {
      SnapshotDir.publishBucketed(
        df("new", 8).withColumn("v", bomb(col("k"))), root,
        bucketCol = "k", numBuckets = 2)
    }
    assert(SnapshotDir.currentDir(root).contains(oldDir))
    // the old snapshot still reads through the bucketed path (catalog
    // table) with its meta intact
    val meta = SnapshotDir.metaAt(oldDir)
    assert(meta.get("bucket_col").contains("k"))
    val back = SnapshotDir.readAt(spark, oldDir, schema)
    assert(back.count() == 8)

    SnapshotDir.publishBucketed(df("new", 6), root, bucketCol = "k", numBuckets = 2)
    assert(loadedTags(root) == Set("new"))
  }
}
