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

  test("VideoCodec: real AVI round-trip recovers avih params and frame bytes") {
    val (w, h, nf, us) = Multimodal.VideoCodec.paramsFor(2L, 33)
    assert((w, h, nf, us) == (16, 9, 11, 100000)) // 2 % 5 == 2 → 10 fps
    val avi = Multimodal.VideoCodec.encodeAvi(2L, w, h, nf, us)
    // a genuine RIFF/AVI container
    assert(new String(avi.take(4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    val Some(v) = Multimodal.VideoCodec.decode(avi)
    assert(v.width == w && v.height == h)
    assert(v.nFrames == nf && v.usPerFrame == us)
    assert(v.frameChunks.length == nf)
    // every sampled frame byte equals the generator formula — the
    // movi walk found the true chunk payloads, not header noise
    v.frameChunks.zipWithIndex.foreach { case ((off, len), f) =>
      assert(len == w * h * 3)
      (0 until len by 97).foreach { i =>
        assert((avi(off + i) & 0xFF) == Multimodal.VideoCodec.frameByte(2L, f, i))
      }
    }
  }

  test("VideoCodec: odd frame size takes the RIFF pad-byte path") {
    // w=21, h=21 → frameSize 1323 (odd): every chunk needs alignment
    val avi = Multimodal.VideoCodec.encodeAvi(5L, 21, 21, 3, 40000)
    val Some(v) = Multimodal.VideoCodec.decode(avi)
    assert(v.frameChunks.length == 3 && v.frameChunks.forall(_._2 == 1323))
    val (off, _) = v.frameChunks(2)
    assert((avi(off) & 0xFF) == Multimodal.VideoCodec.frameByte(5L, 2, 0))
  }

  test("VideoCodec: corrupt/truncated payloads decode as None, not an exception") {
    val avi = Multimodal.VideoCodec.encodeAvi(7L, 10, 8, 4, 50000)
    assert(Multimodal.VideoCodec.decode(avi.take(30)).isEmpty) // truncated mid-header
    assert(Multimodal.VideoCodec.decode(avi.take(avi.length / 2)).isEmpty) // mid-movi
    assert(Multimodal.VideoCodec.decode("not an avi at all".getBytes).isEmpty)
    assert(Multimodal.VideoCodec.decode(Array.emptyByteArray).isEmpty)
  }

  test("VideoCodec: hdrl sub-chunk overrunning its LIST is rejected, not read past") {
    // malformed-but-in-bounds: the avih chunk's declared size escapes
    // the enclosing LIST(hdrl) while staying inside the RIFF — the
    // strict-parser contract demands None, not garbage header fields
    val avi = Multimodal.VideoCodec.encodeAvi(9L, 10, 8, 4, 50000)
    def findFourcc(tag: String): Int = {
      val t = tag.getBytes("US-ASCII")
      (0 until avi.length - 4).find(i =>
        avi(i) == t(0) && avi(i + 1) == t(1) &&
          avi(i + 2) == t(2) && avi(i + 3) == t(3)).get
    }
    val avihOff = findFourcc("avih")
    val corrupt = avi.clone()
    // declared size = whole remaining file (≫ the hdrl LIST end)
    val huge = avi.length - avihOff - 8
    java.nio.ByteBuffer.wrap(corrupt)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(avihOff + 4, huge)
    assert(Multimodal.VideoCodec.decode(corrupt).isEmpty)
    // the honest encode still decodes (the guard is not over-strict)
    assert(Multimodal.VideoCodec.decode(avi).isDefined)
  }

  test("decodeMetadata: sniffs all three REAL containers from bytes alone") {
    val m = Multimodal.decodeMetadata(spark, Multimodal.codecTable(spark, docs))
      .collect().map(r => r.doc_id -> r).toMap
    assert(m.keySet == Set(0L, 1L, 2L))
    val (iw, ih) = Multimodal.ImageCodec.dimsFor(40)
    assert(m(0L) == MediaMeta(0L, "image", "png", iw, ih, 1L, 0L, valid = true))
    val (rate, n) = Multimodal.AudioCodec.paramsFor(1L, 5)
    assert(m(1L) == MediaMeta(1L, "audio", "wav", 0, 0, n.toLong, rate.toLong, valid = true))
    // video doc 2: avih fields, fps = 1e6 / usPerFrame
    assert(m(2L) == MediaMeta(2L, "video", "avi", 16, 9, 11L, 10L, valid = true))
  }

  test("decodeMetadata: undecodable payloads degrade to valid=false rows") {
    val junk = Seq(
      (9L, "garbage payload".getBytes),
      (12L, Multimodal.VideoCodec.encodeAvi(12L, 10, 8, 4, 50000).take(40))
    ).toDF("doc_id", "payload")
    val m = Multimodal.decodeMetadata(spark, junk)
      .collect().map(r => r.doc_id -> r).toMap
    assert(!m(9L).valid && m(9L).container == "unknown")
    assert(!m(12L).valid && m(12L).container == "avi") // sniffed, then failed decode
  }

  test("sampleFrames: every 4th movi chunk, features match the byte formula") {
    val f = Multimodal.sampleFrames(
        spark, Multimodal.videoTable(spark, docs), step = 4)
      .collect().groupBy(_.doc_id)
    assert(f.keySet == Set(2L)) // only doc_id % 3 == 2
    // doc 2: 11 frames → sampled idx 0, 4, 8
    assert(f(2L).map(_.frame_idx).sorted.toSeq == Seq(0, 4, 8))
    val fs = 16 * 9 * 3
    f(2L).foreach { fr =>
      assert(fr.frame_bytes == fs)
      val bytes = (0 until fs).map(i =>
        Multimodal.VideoCodec.frameByte(2L, fr.frame_idx, i).toLong)
      assert(fr.sum_b == bytes.sum)
      assert(fr.weighted_b == bytes.zipWithIndex.map { case (b, i) => (i + 1) * b }.sum)
    }
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

  test("phash clusters + keep: CC over the hamming graph; keep drops non-representatives") {
    val d = Seq(
      (0L, "x" * 40, "en", "s", 40L),
      (30L, "y" * 61, "en", "s", 61L),
      (33L, "z" * 95, "en", "s", 95L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val hashes = Multimodal.imagePHash(
      spark, Multimodal.imageTableWithVariants(spark, d)).toDF()
    val pairs = Multimodal.phashPairs(hashes).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // independent union-find over the emitted pair set (attach the
    // larger root under the smaller, so a component's root IS its min
    // id — the cluster-label contract)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(x => x -> find(x)).toMap
    val got = Dedup.clusters(Multimodal.phashPairs(hashes).select("doc_a", "doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
    // the fixture's intended structure is really present: two
    // two-member cliques (base 0 + variant, base 30 + variant)
    assert(got(Multimodal.VariantIdTag) == 0L)
    assert(got(Multimodal.VariantIdTag + 30L) == 30L)
    // keep list = all images minus non-representative clique members
    val cl = Dedup.clusters(Multimodal.phashPairs(hashes).select("doc_a", "doc_b"))
    val keep = hashes.select(col("doc_id"))
      .join(cl.filter(col("doc_id") =!= col("cluster")).select("doc_id"),
        Seq("doc_id"), "left_anti")
      .collect().map(_.getLong(0)).toSet
    val allIds = hashes.collect().map(_.getAs[Long]("doc_id")).toSet
    val dropped = expected.collect { case (id, root) if id != root => id }.toSet
    assert(keep == allIds -- dropped)
  }

  test("phashSpanningEdges: identical CC to the full pair set, clique-LINEAR edges") {
    // hand-built hash table: a 6-member hamming-0 clique (identical
    // hashes — the viral-image shape), one near variant (hamming 2 from
    // the clique), and two far singletons
    val cliqueHi = 0x0F0F0F0FL
    val cliqueLo = 0x33CC33CCL
    val nearLo = cliqueLo ^ 3L // flips 2 bits → hamming 2
    val rows =
      (1L to 6L).map(id => (id, cliqueHi, cliqueLo)) ++ Seq(
        (7L, cliqueHi, nearLo),
        (100L, 0xFFFFFFFFL, 0x00000000L),
        (200L, 0x12345678L, 0x9ABCDEF0L))
    val hashes = rows.toDF("doc_id", "ahash_hi", "ahash_lo")
    val full = Multimodal.phashPairs(hashes).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val span = Multimodal.phashSpanningEdges(hashes)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every spanning edge is a genuine ≤-threshold pair (subset, never
    // a bucket-star artifact merging far images)
    assert(span.subsetOf(full), s"spanning edges not ⊆ pair set: ${span -- full}")
    // clique-linear: 6-clique + near variant = 7 nodes, 2 distinct
    // hashes → 5 star edges + 1 rep–rep edge, vs C(6,2)+6 = 21 full
    assert(full.size == 21, s"full pair set ${full.size}")
    assert(span.size == 6, s"spanning set ${span.size}")
    // identical connected components (the consumer contract)
    val clFull = Dedup.clusters(Multimodal.phashPairs(hashes).select("doc_a", "doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val clSpan = Dedup.clusters(Multimodal.phashSpanningEdges(hashes))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(clFull == clSpan)
    assert(clSpan(7L) == 1L) // near variant joins the clique's component
    assert(!clSpan.contains(100L) && !clSpan.contains(200L)) // singletons never pair
  }

  test("resizeMeta caps the long side at maxSide, preserving aspect ratio") {
    val r = Multimodal.resizeMeta(
      Multimodal.decodeMetadata(spark, Multimodal.codecTable(spark, docs))
        .filter(col("width") > 0), maxSide = 24)
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r.keySet == Set(0L, 2L)) // visual rows only (audio has no dims)
    r.values.foreach { row =>
      assert(row.getAs[Long]("out_width") <= 24 && row.getAs[Long]("out_height") <= 24)
    }
    // image doc 0: real decoded 48×42 → downscaled to 24×21
    assert(r(0L).getAs[Long]("out_width") == 24 && r(0L).getAs[Long]("out_height") == 21)
    // video doc 2: real decoded 16×9 ≤ 24 → passthrough
    assert(r(2L).getAs[Long]("out_width") == 16 && r(2L).getAs[Long]("out_height") == 9)
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

  test("videoDedup groups re-muxed containers with identical decoded frames") {
    import spark.implicits._
    // video docs (%3==2): 2 raw with variant (%15==2), 17 MJPEG with
    // variant (17%6==5, 17%15==2), 5 MJPEG no variant, 8 raw no variant
    val docs = Seq(
      (2L, "a" * 40, "en", "s", 40L),
      (17L, "b" * 40, "en", "s", 40L),
      (5L, "c" * 55, "en", "s", 55L),
      (8L, "d" * 70, "en", "s", 70L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val table = Multimodal.videoTableWithContainerVariants(spark, docs)
    val payloads = table.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("payload")).toMap
    assert(payloads.keySet == Set(2L, 17L, 5L, 8L,
      Multimodal.VariantIdTag | 2L, Multimodal.VariantIdTag | 17L))
    // the re-muxed variants are genuinely byte-different containers...
    assert(!java.util.Arrays.equals(payloads(2L), payloads(Multimodal.VariantIdTag | 2L)))
    assert(!java.util.Arrays.equals(payloads(17L), payloads(Multimodal.VariantIdTag | 17L)))
    // ...and for MJPEG even the frame CHUNK bytes differ (COM splice),
    // so a chunk-byte hash could NOT collapse them — only pixel decode
    val Some(iBase) = Multimodal.VideoCodec.decode(payloads(17L))
    val Some(iVar) = Multimodal.VideoCodec.decode(payloads(Multimodal.VariantIdTag | 17L))
    assert(iBase.frameChunks.length == iVar.frameChunks.length)
    val (ob, lb) = iBase.frameChunks.head
    val (ov, lv) = iVar.frameChunks.head
    assert(!java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(payloads(17L), ob, ob + lb),
      java.util.Arrays.copyOfRange(payloads(Multimodal.VariantIdTag | 17L), ov, ov + lv)))
    // the DECODED pixels are bit-identical through both containers
    val pxBase = Multimodal.VideoCodec.decodeFrameChunk(payloads(17L), ob, lb).get
    val pxVar = Multimodal.VideoCodec
      .decodeFrameChunk(payloads(Multimodal.VariantIdTag | 17L), ov, lv).get
    assert(pxBase.toSeq == pxVar.toSeq)
    // dedup: each base with a variant collapses to n_copies = 2
    val groups = Multimodal.videoDedup(spark, table).collect()
      .map(r => r.getAs[Long]("keep_doc_id") -> r.getAs[Long]("n_copies")).toMap
    assert(groups == Map(2L -> 2L, 17L -> 2L, 5L -> 1L, 8L -> 1L))
    // raw and MJPEG frames decode to the expected pixel layout: raw
    // chunks ARE the pixel bytes, JPEG chunks decode to w*h*3
    val Some(iRaw) = Multimodal.VideoCodec.decode(payloads(2L))
    val (or2, lr2) = iRaw.frameChunks.head
    assert(Multimodal.VideoCodec.decodeFrameChunk(payloads(2L), or2, lr2).get.length ==
      iRaw.width * iRaw.height * 3)
    assert(pxBase.length == iBase.width * iBase.height * 3)
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
