package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs: DataFrame = Seq(
    (0L, "a" * 40, "en", "s", 40L),
    (1L, "short", "en", "s", 5L),
    (2L, "b" * 33, "en", "s", 33L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("mediaTable: payload is exact UTF-8 bytes; media_type cycles") {
    val rows = Multimodal.mediaTable(docs).orderBy("doc_id").collect()
    assert(rows.map(_.getAs[String]("media_type")).toSeq == Seq("image", "audio", "video"))
    assert(rows(0).getAs[Array[Byte]]("payload").sameElements(
      ("a" * 40).getBytes(StandardCharsets.UTF_8)))
  }

  test("decodeMetadata: stub codec dims are a pure function of byte length") {
    val m = Multimodal.decodeMetadata(spark, Multimodal.mediaTable(docs))
      .collect().map(r => r.doc_id -> r).toMap
    assert(m(0L).n_bytes == 40 && m(0L).width == 64 + 40 % 193)
    assert(m(0L).n_frames == 2) // 40 / 16
    assert(m(1L).n_frames == 1) // max(5/16, 1)
    assert(m(0L).magic.matches("[0-9a-f]{8}"))
  }

  test("sampleFrames: every 4th 16-byte frame, lazy explosion, md5 per slice") {
    val f = Multimodal.sampleFrames(spark, Multimodal.mediaTable(docs), step = 4)
      .collect().groupBy(_.doc_id)
    // doc 0: 2 frames → sampled idx 0 only (step 4)
    assert(f(0L).map(_.frame_idx).toSeq == Seq(0))
    assert(f(0L).head.frame_bytes == 16)
    val expected = Multimodal.StubCodec.md5hex(("a" * 16).getBytes)
    assert(f(0L).head.frame_md5 == expected)
    // doc 1 (5 bytes): one short frame
    assert(f(1L).head.frame_bytes == 5)
    // doc 2 (33 bytes): 2 full frames → idx 0
    assert(f(2L).map(_.frame_idx).toSeq == Seq(0))
  }

  test("ImageCodec: PNG round-trip reproduces exact dims for random sizes") {
    val rnd = new scala.util.Random(42)
    (1 to 25).foreach { _ =>
      val w = 1 + rnd.nextInt(200); val h = 1 + rnd.nextInt(200)
      val png = Multimodal.ImageCodec.encodePng(rnd.nextLong(), w, h)
      // PNG magic: the payload is a genuine PNG stream, not a fake
      assert((png(0) & 0xFF) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
      assert(Multimodal.ImageCodec.decodeDims(png).contains((w, h)))
    }
  }

  test("ImageCodec: corrupt bytes decode as invalid, not an exception") {
    assert(Multimodal.ImageCodec.decodeDims("not a png".getBytes).isEmpty)
    assert(Multimodal.ImageCodec.decodeDims(Array.emptyByteArray).isEmpty)
  }

  test("decodeImages: real imageio decode matches the generator dims end-to-end") {
    val out = Multimodal.decodeImages(spark, Multimodal.imageTable(spark, docs))
      .collect().map(r => r.doc_id -> r).toMap
    assert(out.keySet == Set(0L)) // only doc_id % 3 == 0
    val (w, h) = Multimodal.ImageCodec.dimsFor(40)
    assert(out(0L).format == "png" && out(0L).valid)
    assert(out(0L).width == w && out(0L).height == h)
    assert(out(0L).n_pixels == w.toLong * h)
  }

  test("ahash: deterministic from pixels; perturbed variant is near, not equal") {
    val (w, h) = (57, 43)
    def hashOf(perturb: Boolean): (Long, Long) = {
      val png = Multimodal.ImageCodec.encodePng(12345L, w, h, perturb)
      Multimodal.ImageCodec.ahash(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png)))
    }
    val base = hashOf(perturb = false)
    assert(base == hashOf(perturb = false)) // byte-for-byte reproducible
    val variant = hashOf(perturb = true)
    val hamming = java.lang.Long.bitCount(base._1 ^ variant._1) +
      java.lang.Long.bitCount(base._2 ^ variant._2)
    assert(hamming > 0 && hamming <= 8, s"hamming=$hamming")
    // halves are unsigned 32-bit
    assert(base._1 >= 0 && base._1 <= 0xFFFFFFFFL && base._2 >= 0 && base._2 <= 0xFFFFFFFFL)
  }

  test("imagePHash + phashPairs: variant pairs with its base, unrelated images don't") {
    // doc_ids 0, 30, 33: all % 3 == 0 → images; 0 and 30 also get
    // perturbed variants (| Multimodal.VariantIdTag)
    val d = Seq(
      (0L, "x" * 40, "en", "s", 40L),
      (30L, "y" * 61, "en", "s", 61L),
      (33L, "z" * 95, "en", "s", 95L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val hashes = Multimodal.imagePHash(
      spark, Multimodal.imageTableWithVariants(spark, d)).toDF()
    assert(hashes.count() == 5) // 3 bases + 2 variants
    val pairs = Multimodal.phashPairs(hashes, maxHamming = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, Multimodal.VariantIdTag)))
    assert(pairs.contains((30L, Multimodal.VariantIdTag + 30L)))
  }

  test("resizeMeta caps the long side at maxSide, preserving aspect ratio") {
    val r = Multimodal.resizeMeta(
      Multimodal.decodeMetadata(spark, Multimodal.mediaTable(docs)), maxSide = 128)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    r.values.foreach { row =>
      assert(row.getAs[Long]("out_width") <= 128 && row.getAs[Long]("out_height") <= 128)
    }
    // doc 0: w=104, h=64+280%129=64+22=86 → max 104 ≤ 128 → unscaled
    assert(r(0L).getAs[Long]("out_width") == 104)
  }

  test("AudioCodec: real WAV round-trip recovers rate and exact samples") {
    val (rate, n) = Multimodal.AudioCodec.paramsFor(7L, 123)
    assert(rate == 8000 + (7 % 5) * 2000 && n == 256 + 123 % 200)
    val wav = Multimodal.AudioCodec.encodeWav(7L, rate, n)
    // a genuine RIFF container, decoded by the JDK, not our own parser
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    val Some((decodedRate, samples)) = Multimodal.AudioCodec.decode(wav)
    assert(decodedRate == rate && samples.length == n)
    // every decoded sample equals the wave formula — bit-exact codec
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(s == Multimodal.AudioCodec.sample(7L, i), s"sample $i")
    }
    // corrupt payload: valid=false path, not an exception
    assert(Multimodal.AudioCodec.decode("not a wav".getBytes).isEmpty)
  }

  test("audioMeta features are exact integers over decoded samples") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x" * 50, "en", "s", 50L),   // doc_id % 3 == 1 → audio
      (4L, "y" * 99, "en", "s", 99L),
      (3L, "skipped", "en", "s", 7L)    // not audio-assigned
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Multimodal.audioMeta(spark, Multimodal.audioTable(spark, docs))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got.keySet == Set(1L, 4L))
    val r1 = got(1L)
    val (rate, n) = Multimodal.AudioCodec.paramsFor(1L, 50)
    assert(r1.getAs[Long]("sample_rate") == rate)
    assert(r1.getAs[Long]("n_samples") == n)
    assert(r1.getAs[Long]("duration_ms") == n.toLong * 1000L / rate)
    val amps = (0 until n).map(i => math.abs(Multimodal.AudioCodec.sample(1L, i).toLong))
    assert(r1.getAs[Long]("peak_amp") == amps.max)
    assert(r1.getAs[Long]("mean_abs") == amps.sum / n)
    assert(r1.getAs[Boolean]("valid"))
  }

  test("audioDedup groups byte-different containers with identical PCM") {
    import spark.implicits._
    // doc 1 gets a container variant (1 % 30 == 1): extra LIST/INFO
    // chunk → different bytes, identical samples
    val docs = Seq(
      (1L, "x" * 50, "en", "s", 50L),
      (4L, "y" * 99, "en", "s", 99L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val table = Multimodal.audioTableWithContainerVariants(spark, docs)
    val payloads = table.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("payload")).toMap
    assert(payloads.keySet == Set(1L, 4L, Multimodal.VariantIdTag + 1L))
    // the container variant is genuinely byte-different...
    assert(!java.util.Arrays.equals(payloads(1L), payloads(Multimodal.VariantIdTag + 1L)))
    // ...and the JDK decoder sees identical PCM through both containers
    val Some((r1, s1)) = Multimodal.AudioCodec.decode(payloads(1L))
    val Some((r2, s2)) = Multimodal.AudioCodec.decode(payloads(Multimodal.VariantIdTag + 1L))
    assert(r1 == r2 && s1.toSeq == s2.toSeq)
    val groups = Multimodal.audioDedup(spark, table).collect()
      .map(r => r.getAs[Long]("keep_doc_id") -> r.getAs[Long]("n_copies")).toMap
    assert(groups == Map(1L -> 2L, 4L -> 1L))
  }

  test("dedupPayloads: identical bytes collapse per modality, min id kept") {
    import spark.implicits._
    // docs 0 and 3 share text but differ in media_type (0->image,
    // 3->image too: 3 % 3 == 0) — both image, same payload -> 1 group.
    // doc 1 (audio) shares the text but is a different modality.
    val docs = Seq(
      (0L, "same bytes", "en", "s", 10L),
      (3L, "same bytes", "en", "s", 10L),
      (1L, "same bytes", "en", "s", 10L),
      (6L, "other bytes", "en", "s", 11L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Multimodal.dedupPayloads(Multimodal.mediaTable(docs)).collect()
      .map(r => (r.getString(1), r.getAs[Long]("keep_doc_id"), r.getAs[Long]("n_copies")))
    assert(got.toSet == Set(
      ("image", 0L, 2L),  // docs 0 and 3 collapse
      ("audio", 1L, 1L),  // same bytes, different modality: own group
      ("image", 6L, 1L)))
  }
}
