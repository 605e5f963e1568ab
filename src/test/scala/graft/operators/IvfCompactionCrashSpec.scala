package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.fs.SnapshotDir

/** Crash-injection for the PERSISTED IVF index's compaction — the
  * derived-index twin of [[graft.fs.SnapshotCrashSpec]]. A compaction
  * torn at any crash point must leave readers serving the
  * pre-compaction state (old base + live deltas: the one state the
  * core snapshot spec doesn't model, because only the derived indexes
  * layer deltas over the snapshot protocol), and a retried compaction
  * must converge and sweep the debris.
  *
  * Crash points injected, all simultaneously (a real crash leaves any
  * subset; the union is the hardest state):
  *  - a PARTIAL base snap dir (compact died mid-parquet-write);
  *  - a COMPLETE but unpointed base snap dir whose meta claims the
  *    delta folded — if any reader consulted it, the appended vectors
  *    would both vanish from the base AND be retired as a delta;
  *  - a stale `.CURRENT-*` temp pointer naming that orphan;
  *  - an orphaned `delta-tmp-*` staging dir (torn append).
  */
class IvfCompactionCrashSpec extends SparkSpec {
  import spark.implicits._

  private def emb = (0L until 120L).map { i =>
    (i, Array.tabulate(64)(d => ((i * 37 + d * 11) % 17 - 8).toFloat / 8f))
  }.toDF("vec_id", "embedding")

  test("torn IVF compaction: readers keep base+delta; retry converges and sweeps") {
    val root = Files.createTempDirectory("graft-ivfcrash").toString
    IvfIndex.build(emb.filter(col("vec_id") < 90), root,
      nCentroids = 8, iters = 2, numBuckets = 4)
    IvfIndex.append(emb.filter(col("vec_id") >= 90), root)
    val queries = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def answers(): Set[(Long, Long, Double, Int)] = {
      val r = IvfIndex.topk(spark, root, queries, k = 5, nProbe = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      OpCaches.releaseAll()
      r
    }
    val baseline = answers()
    assert(baseline.exists(_._2 >= 90), "delta vectors must be probe-visible")
    val oldBase = SnapshotDir.currentDir(s"$root/cells").get

    // ---- inject the torn-compaction debris ----
    val partial = Paths.get(s"$root/cells/snap-777777777777777777")
    Files.createDirectories(partial)
    Files.writeString(partial.resolve("part-00000-torn.parquet"), "torn mid-write")
    val orphan = s"$root/cells/snap-888888888888888888"
    Seq((0L, "ghost")).toDF("k", "v").write.parquet(orphan)
    // meta that would WRONGLY retire delta-0 if anything consulted it
    Files.writeString(Paths.get(s"$orphan/_snapmeta"),
      "bucket_col=cell\nbucket_n=4\ncentroids=0.0\ncompacted_through=0")
    Files.writeString(Paths.get(s"$root/cells/.CURRENT-1"),
      "snap-888888888888888888")
    val tornTmp = Paths.get(s"$root/cells/delta-tmp-torn-append")
    Files.createDirectories(tornTmp)
    Files.writeString(tornTmp.resolve("part-00000.parquet"), "torn append")

    // readers: pointer still resolves the OLD base; delta-0 still live;
    // answers identical — none of the debris is consulted
    assert(SnapshotDir.currentDir(s"$root/cells").contains(oldBase))
    assert(answers() == baseline)

    // ---- retry converges ----
    IvfIndex.compact(spark, root)
    assert(answers() == baseline)
    val newBase = SnapshotDir.currentDir(s"$root/cells").get
    assert(newBase != oldBase)
    assert(SnapshotDir.metaAt(newBase).get("compacted_through").contains("0"))
    // every injected debris path is swept (partial + orphan + temp
    // pointer by the publish, the torn append staging by compact)
    for (p <- Seq(partial.toString, orphan, s"$root/cells/.CURRENT-1", tornTmp.toString))
      assert(!Files.exists(Paths.get(p)), s"debris not swept: $p")
    // deferred delta GC: the just-folded delta-0 survives this compact
    // for in-flight readers, and the NEXT compact sweeps it
    assert(Files.isDirectory(Paths.get(s"$root/cells/delta-0")))
    IvfIndex.compact(spark, root)
    assert(!Files.exists(Paths.get(s"$root/cells/delta-0")))
    assert(answers() == baseline)
  }
}
