package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted decode-signature store ([[MediaSigStore]]): warm
  * passes decode nothing, incremental passes decode only unseen
  * payloads, decisions stay identical to the uncached operators, and
  * corrupt payloads are cached as invalid instead of re-decoded every
  * pass. */
class MediaSigStoreSpec extends SparkSpec {
  import spark.implicits._

  private def videoDocs(ids: Long*) = ids.map(i =>
      (i, ("t" * (30 + (i % 41)).toInt), "en", "s", 30L + (i % 41)))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def decisions(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("video: cold pass decodes all, warm pass decodes 0, decisions == videoDedup") {
    val root = Files.createTempDirectory("graft-sigstore-v").toString
    // %3==2 docs are video; include variant carriers (%15==2)
    val docs = videoDocs(2L, 5L, 8L, 17L, 32L, 47L)
    val table = Multimodal.videoTableWithContainerVariants(spark, docs)
      .localCheckpoint() // freeze payloads: one deterministic media table
    val nMedia = table.count()
    val plain = decisions(Multimodal.videoDedup(spark, table))

    val cold = decisions(Multimodal.videoDedupCached(spark, table, root))
    assert(cold == plain, "cold cached decisions diverge from videoDedup")
    assert(MediaSigStore.lastDecoded == nMedia,
      s"cold pass must decode every payload: ${MediaSigStore.lastDecoded} vs $nMedia")

    val warm = decisions(Multimodal.videoDedupCached(spark, table, root))
    assert(warm == plain, "warm cached decisions diverge from videoDedup")
    assert(MediaSigStore.lastDecoded == 0L,
      s"warm pass must decode nothing, decoded ${MediaSigStore.lastDecoded}")
  }

  test("video: incremental append decodes only the unseen payloads") {
    val root = Files.createTempDirectory("graft-sigstore-vi").toString
    val base = Multimodal.videoTableWithContainerVariants(
      spark, videoDocs(2L, 5L, 8L)).localCheckpoint()
    Multimodal.videoDedupCached(spark, base, root).collect()

    val appended = Multimodal.videoTableWithContainerVariants(
      spark, videoDocs(2L, 5L, 8L, 11L, 14L)).localCheckpoint()
    val nNew = appended.count() - base.count()
    val got = decisions(Multimodal.videoDedupCached(spark, appended, root))
    // Bloom fpp can over-decode a known payload, never under-decode;
    // at this scale FPs are ~0 so the bound is tight
    assert(MediaSigStore.lastDecoded >= nNew &&
        MediaSigStore.lastDecoded <= nNew + 1,
      s"append must decode ~$nNew new payloads, decoded ${MediaSigStore.lastDecoded}")
    assert(got == decisions(Multimodal.videoDedup(spark, appended)))
  }

  test("audio: warm identity + corrupt payloads cached as invalid, not re-decoded") {
    val root = Files.createTempDirectory("graft-sigstore-a").toString
    val audioDocs = Seq(
      (1L, "x" * 50, "en", "s", 50L),
      (4L, "y" * 99, "en", "s", 99L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val good = Multimodal.audioTableWithContainerVariants(spark, audioDocs)
    // one corrupt payload: truncated garbage AudioSystem cannot parse
    val corrupt = Seq((999L, Array[Byte](1, 2, 3, 4))).toDF("doc_id", "payload")
    val table = good.unionByName(corrupt).localCheckpoint()
    val plain = decisions(Multimodal.audioDedup(spark, table))

    val cold = decisions(Multimodal.audioDedupCached(spark, table, root))
    assert(cold == plain)
    assert(MediaSigStore.lastDecoded == table.count())
    // the corrupt payload entered the store as valid=false...
    val warm = decisions(Multimodal.audioDedupCached(spark, table, root))
    assert(warm == plain)
    assert(MediaSigStore.lastDecoded == 0L,
      "corrupt payload was re-decoded on the warm pass — invalid rows must persist")
  }

  test("duplicate payloads store once; the assembly join fans the signature back out") {
    val root = Files.createTempDirectory("graft-sigstore-d").toString
    // two docs with IDENTICAL payload bytes (same pkey)
    val payload = Multimodal.VideoCodec.encodeAvi(2L, 16, 9, 3, 100000)
    val table = Seq((10L, payload), (20L, payload)).toDF("doc_id", "payload")
      .localCheckpoint()
    val got = decisions(Multimodal.videoDedupCached(spark, table, root))
    assert(got.map(r => (r(3), r(4))) == Seq((10L, 2L))) // keep=min, copies=2
    val store = graft.fs.SnapshotDir.load(spark,
      root, MediaSigStore.videoStoreSchema)
    assert(store.count() == 1L, "identical payloads must share one store row")
  }
}
