package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media row: an opaque binary payload + typed metadata. */
case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

/** REAL decoded media metadata, one schema across all three container
  * codecs: `container` is sniffed from the BYTES (png/wav/avi), dims
  * come from IHDR / avih, frame count from the stream length, and
  * sample_rate carries Hz for audio and fps for video. Zero-valued
  * fields are the ones the modality doesn't have (audio has no dims;
  * stills have one frame). */
case class MediaMeta(doc_id: Long, media_type: String, container: String,
    width: Int, height: Int, n_frames: Long, sample_rate: Long, valid: Boolean)

/** One sampled video frame with exact integer features over the frame's
  * DECODED bytes (the movi chunk payload): Σb and Σ(i+1)·b — the same
  * oracle-re-derivable shape as the audio signature. */
case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Int,
    sum_b: Long, weighted_b: Long)

/** One REALLY-decoded image: dims read back by javax.imageio from
  * actual PNG bytes (not derived from the payload length). */
case class ImageDecoded(doc_id: Long, format: String, width: Int,
    height: Int, n_pixels: Long, valid: Boolean)

/** One 64-bit perceptual average-hash, split into two unsigned 32-bit
  * halves so both engines carry it in a plain non-negative BIGINT
  * (bit 63 of a single packed long would wrap negative on one side
  * and overflow a DuckDB HUGEINT→BIGINT cast on the other). */
case class PHash(doc_id: Long, ahash_hi: Long, ahash_lo: Long)

/** Multimodal-column operators for a training-data pipeline: treat
  * image/audio/video as opaque `binary` columns with typed metadata,
  * processed by batch-shaped `mapPartitions` stages (the JVM analogue
  * of an Arrow-batched Python UDF: one iterator in, one iterator out,
  * vectorizable per partition, no per-row UDF dispatch).
  *
  * REAL here: the Spark-side plumbing — binary column handling, typed
  * Datasets + Encoders, partition-batch iteration, schema, and the
  * frame-explosion shape (one input row → many output rows without
  * materializing all frames in memory).
  *
  * ALL THREE codecs are real binary round-trips, JDK-only:
  *  - image: [[ImageCodec]] — `javax.imageio` PNG encode/decode, true
  *    IHDR dimensions read back from the bytes;
  *  - audio: [[AudioCodec]] — RIFF/WAVE writer + `javax.sound.sampled`
  *    decode, true sample rate/width/count from the fmt chunk;
  *  - video: [[VideoCodec]] — a RIFF/AVI container writer and a
  *    hand-rolled chunk-walking parser (the JDK has no AVI reader):
  *    dims and frame count come from the `avih` main header, frames
  *    from walking the `movi` LIST's `00db` chunks.
  * A corrupt or truncated payload fails each codec's structural checks
  * and degrades to a valid=false row / no frames, never a task failure.
  */
object Multimodal {

  /** Variant-id tag: container/perturbation variants of doc N ship
    * under `N | VariantIdTag` (bit 40 set) — a TRUE bitwise OR in both
    * engines (Spark `bitwiseOR`, DuckDB `|`), recovered with
    * `id & ~VariantIdTag`, never `+`/`-` arithmetic: an addition would
    * CARRY for any doc_id with bit 40 already set and silently recover
    * the wrong pattern id on both sides of the oracle at once. With the
    * OR, ids at or above 2^40 degrade to an idempotent tag (variant id
    * collides with the base id) rather than corrupting a THIRD doc's
    * id — and the corpus bound below turns that case into a loud error
    * instead. A corpus below 2^40 documents (a trillion — far past
    * 100 TB of docs) never collides at all; the old `+1000000`
    * convention broke silently at 1M docs, and because both engines
    * replicated it, the oracle gate could not catch the duplicate-key
    * rows. */
  val VariantIdTag: Long = 1L << 40

  /** REAL video codec — the last stub is gone: AVI is a pure RIFF
    * container (the WAV pattern one LIST deeper), so the encoder
    * writes a genuine `RIFF('AVI ')` tree — `LIST('hdrl')` holding the
    * 56-byte `avih` main header and a `LIST('strl')` with a `strh`
    * stream header + `strf` BITMAPINFOHEADER, a `LIST('movi')` of
    * uncompressed `00db` frame chunks (word-aligned, as RIFF requires),
    * and a trailing `idx1` index — and the decoder is a strict
    * chunk-walking parser that recovers width/height/frame count/
    * frame timing from the avih fields and the true frame bytes from
    * the movi walk. Reference AVI structure: the public RIFF/AVI spec
    * (msdn AVIMAINHEADER/AVISTREAMHEADER layouts); the in-repo
    * template is [[AudioCodec]]'s RIFF/WAVE writer.
    *
    * Frame pixels are a deterministic integer function of
    * (docId, frame, byte index), so the oracle re-derives every frame
    * feature from the formula — a row can only match if the encode →
    * chunk-walk → feature path is bit-exact end to end. */
  object VideoCodec {
    /** Deterministic (width, height, nFrames, usPerFrame) per doc —
      * mirrored by the oracle; the AVI round-trip must reproduce them
      * from the container bytes alone. usPerFrame values are exact
      * divisors of 1e6 so fps = 1e6/usPerFrame is an exact integer in
      * both engines. */
    def paramsFor(docId: Long, textLen: Int): (Int, Int, Int, Int) = {
      val w = 8 + textLen % 25
      val h = 6 + (textLen.toLong * 7 % 19).toInt
      val nFrames = 4 + textLen % 13
      val usPerFrame = (docId % 5).toInt match {
        case 0 => 40000  // 25 fps
        case 1 => 50000  // 20 fps
        case 2 => 100000 // 10 fps
        case 3 => 20000  // 50 fps
        case _ => 25000  // 40 fps
      }
      (w, h, nFrames, usPerFrame)
    }

    /** The deterministic frame byte: b(doc, frame, i) ∈ [0, 256). */
    def frameByte(docId: Long, frame: Int, i: Int): Int =
      ((docId * 31 + frame.toLong * 17 + i.toLong * 7) % 256).toInt

    private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

    /** Bounds-checked fourcc read — "" when the payload is too short.
      * The ONE sniffing primitive shared by [[decode]] and
      * [[decodeMetadata]]'s container dispatch, so every RIFF-family
      * codec sniffs identically. */
    def fourccAt(bytes: Array[Byte], off: Int): String =
      if (off >= 0 && bytes.length >= off + 4)
        new String(bytes, off, 4, "US-ASCII")
      else ""

    /** A real AVI file: RIFF/AVI header tree + raw 24bpp frame chunks.
      * Odd-sized chunks get the RIFF pad byte (not counted in the
      * chunk's size field) — real parsers require the alignment, and
      * w·h·3 is odd whenever w and h both are. */
    def encodeAvi(docId: Long, w: Int, h: Int, nFrames: Int,
        usPerFrame: Int): Array[Byte] = {
      val frameSize = w * h * 3
      val framePad = frameSize & 1
      val moviBody = 4 + nFrames * (8 + frameSize + framePad)
      val hdrlBody = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
      val idx1Body = 16 * nFrames
      val riffBody = 4 + (8 + hdrlBody) + (8 + moviBody) + (8 + idx1Body)
      val bb = java.nio.ByteBuffer.allocate(8 + riffBody)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(fourcc("RIFF")).putInt(riffBody).put(fourcc("AVI "))
      // LIST hdrl { avih, LIST strl { strh, strf } }
      bb.put(fourcc("LIST")).putInt(hdrlBody).put(fourcc("hdrl"))
      bb.put(fourcc("avih")).putInt(56)
        .putInt(usPerFrame)               // dwMicroSecPerFrame
        // Long arithmetic: frameSize × 1e6 overflows Int past 2147
        // bytes/frame, and an external spec-conformant reader would
        // see a negative byte rate (our own walker ignores the field,
        // so the oracle gate could never catch it)
        .putInt((frameSize.toLong * 1000000L / usPerFrame).toInt) // dwMaxBytesPerSec
        .putInt(0)                        // dwPaddingGranularity
        .putInt(0x10)                     // dwFlags = AVIF_HASINDEX
        .putInt(nFrames)                  // dwTotalFrames
        .putInt(0)                        // dwInitialFrames
        .putInt(1)                        // dwStreams
        .putInt(frameSize)                // dwSuggestedBufferSize
        .putInt(w).putInt(h)              // dwWidth, dwHeight
        .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
      bb.put(fourcc("LIST")).putInt(4 + (8 + 56) + (8 + 40)).put(fourcc("strl"))
      bb.put(fourcc("strh")).putInt(56)
        .put(fourcc("vids")).put(fourcc("DIB "))
        .putInt(0)                        // dwFlags
        .putShort(0).putShort(0)          // wPriority, wLanguage
        .putInt(0)                        // dwInitialFrames
        .putInt(usPerFrame).putInt(1000000) // dwScale/dwRate = s per frame
        .putInt(0)                        // dwStart
        .putInt(nFrames)                  // dwLength (frames)
        .putInt(frameSize)                // dwSuggestedBufferSize
        .putInt(-1)                       // dwQuality (default)
        .putInt(0)                        // dwSampleSize
        .putShort(0).putShort(0)          // rcFrame left, top
        .putShort(w.toShort).putShort(h.toShort)
      bb.put(fourcc("strf")).putInt(40)
        .putInt(40)                       // biSize
        .putInt(w).putInt(h)              // biWidth, biHeight
        .putShort(1).putShort(24)         // biPlanes, biBitCount
        .putInt(0)                        // biCompression = BI_RGB
        .putInt(frameSize)                // biSizeImage
        .putInt(0).putInt(0).putInt(0).putInt(0)
      // LIST movi { 00db × nFrames }
      bb.put(fourcc("LIST")).putInt(moviBody).put(fourcc("movi"))
      var f = 0
      while (f < nFrames) {
        bb.put(fourcc("00db")).putInt(frameSize)
        var i = 0
        while (i < frameSize) {
          bb.put(frameByte(docId, f, i).toByte)
          i += 1
        }
        if (framePad == 1) bb.put(0.toByte)
        f += 1
      }
      // idx1: one entry per frame, offsets relative to the movi list
      bb.put(fourcc("idx1")).putInt(idx1Body)
      f = 0
      while (f < nFrames) {
        bb.put(fourcc("00db")).putInt(0x10) // AVIIF_KEYFRAME
          .putInt(4 + f * (8 + frameSize + framePad)) // chunk offset in movi
          .putInt(frameSize)
        f += 1
      }
      bb.array()
    }

    /** Whether a video doc carries MJPEG (JPEG-compressed) frames
      * instead of raw 24bpp ones. Video docs are `doc_id % 3 == 2`,
      * so `% 6` splits them {2 → raw, 5 → MJPEG}. Within the video
      * set, ids equal mod 256 differ by multiples of 768 (256 ≡ 1
      * mod 3 forces the step to 3·256), and 768 ≡ 0 mod 6 — so two
      * docs whose frame patterns coincide (same id mod 256, the
      * [[frameByte]] congruence) ALWAYS share a codec, and the
      * cross-doc collapse rule of [[videoDedup]] is codec-uniform. */
    def isMjpeg(docId: Long): Boolean = docId % 6 == 5

    /** One MJPEG frame as a real JPEG: the SAME [[frameByte]] pattern
      * raw frames use, laid out as packed RGB and compressed by the
      * JDK's ImageIO JPEG writer. Deterministic: fixed pixel input +
      * fixed encoder settings → fixed bytes. With `comment`, a JFIF
      * COM segment is spliced in directly after SOI — byte-DIFFERENT
      * JPEG, bit-IDENTICAL decoded pixels (decoders skip COM): the
      * video twin of the audio INFO-chunk variant, and the case a
      * chunk-byte hash cannot collapse — only a true pixel decode can. */
    def encodeJpegFrame(docId: Long, w: Int, h: Int, frame: Int,
        comment: Boolean = false): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val i = 3 * (y * w + x)
          img.setRGB(x, y, (frameByte(docId, frame, i) << 16) |
            (frameByte(docId, frame, i + 1) << 8) | frameByte(docId, frame, i + 2))
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      val jpeg = out.toByteArray
      if (!comment) jpeg
      else {
        // splice COM (FF FE, big-endian length incl. the 2 length
        // bytes) right after SOI (FF D8)
        val note = "remuxed".getBytes("US-ASCII")
        val com = Array[Byte](0xFF.toByte, 0xFE.toByte,
          ((note.length + 2) >> 8).toByte, ((note.length + 2) & 0xFF).toByte)
        jpeg.take(2) ++ com ++ note ++ jpeg.drop(2)
      }
    }

    /** General AVI writer behind the MJPEG and re-mux paths: same
      * RIFF tree as [[encodeAvi]] but with caller-supplied frame
      * chunks (`chunkId` 00db raw / 00dc compressed, `codec` DIB /
      * MJPG), an optional JUNK filler chunk after hdrl, and an
      * optional idx1 — the knobs a re-muxer turns without touching a
      * single frame byte. */
    def encodeAviContainer(w: Int, h: Int, usPerFrame: Int,
        frames: IndexedSeq[Array[Byte]], codec: String, chunkId: String,
        junk: Boolean = false, withIdx1: Boolean = true): Array[Byte] = {
      val nFrames = frames.length
      val maxFrame = frames.map(_.length).max
      val pads = frames.map(_.length & 1)
      val moviBody = 4 + frames.indices.map(f => 8 + frames(f).length + pads(f)).sum
      val hdrlBody = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
      val junkBody = if (junk) 64 else 0
      val idx1Body = if (withIdx1) 16 * nFrames else 0
      val riffBody = 4 + (8 + hdrlBody) + (if (junk) 8 + junkBody else 0) +
        (8 + moviBody) + (if (withIdx1) 8 + idx1Body else 0)
      val bb = java.nio.ByteBuffer.allocate(8 + riffBody)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(fourcc("RIFF")).putInt(riffBody).put(fourcc("AVI "))
      bb.put(fourcc("LIST")).putInt(hdrlBody).put(fourcc("hdrl"))
      bb.put(fourcc("avih")).putInt(56)
        .putInt(usPerFrame)
        .putInt((maxFrame.toLong * 1000000L / usPerFrame).toInt)
        .putInt(0)
        .putInt(if (withIdx1) 0x10 else 0)  // AVIF_HASINDEX iff idx1
        .putInt(nFrames)
        .putInt(0)
        .putInt(1)
        .putInt(maxFrame)
        .putInt(w).putInt(h)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      bb.put(fourcc("LIST")).putInt(4 + (8 + 56) + (8 + 40)).put(fourcc("strl"))
      bb.put(fourcc("strh")).putInt(56)
        .put(fourcc("vids")).put(fourcc(codec))
        .putInt(0)
        .putShort(0).putShort(0)
        .putInt(0)
        .putInt(usPerFrame).putInt(1000000)
        .putInt(0)
        .putInt(nFrames)
        .putInt(maxFrame)
        .putInt(-1)
        .putInt(0)
        .putShort(0).putShort(0)
        .putShort(w.toShort).putShort(h.toShort)
      bb.put(fourcc("strf")).putInt(40)
        .putInt(40)
        .putInt(w).putInt(h)
        .putShort(1).putShort(24)
        // biCompression: 0 = BI_RGB for raw DIB frames, else the
        // codec fourcc bytes (little-endian int = the ASCII fourcc)
        .putInt(if (codec == "DIB ") 0
          else java.nio.ByteBuffer.wrap(fourcc(codec))
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt)
        .putInt(maxFrame)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      if (junk) {
        bb.put(fourcc("JUNK")).putInt(junkBody)
        var i = 0
        while (i < junkBody) { bb.put('x'.toByte); i += 1 }
      }
      bb.put(fourcc("LIST")).putInt(moviBody).put(fourcc("movi"))
      var off = 4
      val offsets = new Array[Int](nFrames)
      var f = 0
      while (f < nFrames) {
        offsets(f) = off
        bb.put(fourcc(chunkId)).putInt(frames(f).length).put(frames(f))
        if (pads(f) == 1) bb.put(0.toByte)
        off += 8 + frames(f).length + pads(f)
        f += 1
      }
      if (withIdx1) {
        bb.put(fourcc("idx1")).putInt(idx1Body)
        f = 0
        while (f < nFrames) {
          bb.put(fourcc(chunkId)).putInt(0x10)
            .putInt(offsets(f)).putInt(frames(f).length)
          f += 1
        }
      }
      bb.array()
    }

    /** An MJPEG AVI: real JPEG frame chunks (00dc) under the MJPG
      * stream codec. `remux` produces the container-variant twin —
      * COM-spliced (byte-different, pixel-identical) JPEG frames, a
      * JUNK chunk, and no idx1. */
    def encodeAviMjpeg(docId: Long, w: Int, h: Int, nFrames: Int,
        usPerFrame: Int, remux: Boolean = false): Array[Byte] =
      encodeAviContainer(w, h, usPerFrame,
        IndexedSeq.tabulate(nFrames)(f =>
          encodeJpegFrame(docId, w, h, f, comment = remux)),
        codec = "MJPG", chunkId = "00dc", junk = remux, withIdx1 = !remux)

    /** The raw-frame re-mux twin of [[encodeAvi]]: identical 00db
      * frame bytes inside a byte-different container (JUNK chunk, no
      * idx1, no HASINDEX flag). */
    def encodeAviRemuxed(docId: Long, w: Int, h: Int, nFrames: Int,
        usPerFrame: Int): Array[Byte] = {
      val frameSize = w * h * 3
      encodeAviContainer(w, h, usPerFrame,
        IndexedSeq.tabulate(nFrames) { f =>
          val a = new Array[Byte](frameSize)
          var i = 0
          while (i < frameSize) { a(i) = frameByte(docId, f, i).toByte; i += 1 }
          a
        },
        codec = "DIB ", chunkId = "00db", junk = true, withIdx1 = false)
    }

    /** DECODED pixel bytes of one frame chunk: a JPEG chunk (SOI
      * sniff — trust the bytes, not the header) is decoded through
      * ImageIO and unpacked to packed RGB; a raw 24bpp chunk IS its
      * pixel array. None on a chunk that claims JPEG but fails to
      * decode. */
    def decodeFrameChunk(payload: Array[Byte], off: Int, len: Int): Option[Array[Byte]] =
      if (len >= 2 && payload(off) == 0xFF.toByte && payload(off + 1) == 0xD8.toByte) {
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload, off, len))
          if (img == null) None
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val out = new Array[Byte](w * h * 3)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val i = 3 * (y * w + x)
                out(i) = ((rgb >> 16) & 0xFF).toByte
                out(i + 1) = ((rgb >> 8) & 0xFF).toByte
                out(i + 2) = (rgb & 0xFF).toByte
                x += 1
              }
              y += 1
            }
            Some(out)
          }
        } catch { case _: Exception => None }
      } else Some(java.util.Arrays.copyOfRange(payload, off, off + len))

    /** Parsed AVI: the avih fields plus the (offset, length) of every
      * frame chunk found by walking the movi list — frame BYTES are
      * sliced lazily by the caller so sampling never materializes the
      * unsampled frames. */
    final case class AviInfo(width: Int, height: Int, nFrames: Int,
        usPerFrame: Int, frameChunks: IndexedSeq[(Int, Int)])

    /** Strict chunk-walking decode: RIFF signature, AVI form type,
      * avih inside LIST(hdrl), frame chunks inside LIST(movi). Any
      * structural violation (truncation, bad fourcc, chunk overrun)
      * → None — the corrupt-payload contract. */
    def decode(payload: Array[Byte]): Option[AviInfo] =
      try {
        if (payload.length < 12) return None
        val bb = java.nio.ByteBuffer.wrap(payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def fcc(off: Int): String = fourccAt(payload, off)
        if (fcc(0) != "RIFF" || fcc(8) != "AVI ") return None
        val riffEnd = math.min(8L + bb.getInt(4), payload.length.toLong).toInt
        var avih: Option[(Int, Int, Int, Int)] = None
        val frames = IndexedSeq.newBuilder[(Int, Int)]
        var pos = 12
        while (pos + 8 <= riffEnd) {
          val id = fcc(pos)
          val size = bb.getInt(pos + 4)
          if (size < 0 || pos + 8 + size > riffEnd) return None
          if (id == "LIST" && size >= 4) {
            val listType = fcc(pos + 8)
            if (listType == "hdrl") {
              // walk the hdrl sub-chunks for avih
              var p = pos + 12
              val end = pos + 8 + size
              while (p + 8 <= end) {
                val s = bb.getInt(p + 4)
                // Same overrun contract as the movi walk: a declared
                // size that escapes the enclosing LIST is a structural
                // violation, not a skippable chunk.
                if (s < 0 || p + 8 + s > end) return None
                if (fcc(p) == "avih" && s >= 40 && p + 48 <= end) {
                  avih = Some((bb.getInt(p + 40), bb.getInt(p + 44),
                    bb.getInt(p + 24), bb.getInt(p + 8)))
                }
                p += 8 + s + (s & 1)
              }
            } else if (listType == "movi") {
              var p = pos + 12
              val end = pos + 8 + size
              while (p + 8 <= end) {
                val cid = fcc(p)
                val s = bb.getInt(p + 4)
                if (s < 0 || p + 8 + s > end) return None
                // ##db/##dc = uncompressed/compressed video frame
                if (cid.endsWith("db") || cid.endsWith("dc"))
                  frames += ((p + 8, s))
                p += 8 + s + (s & 1)
              }
            }
          }
          pos += 8 + size + (size & 1)
        }
        avih.collect { case (w, hgt, n, us)
            if w > 0 && hgt > 0 && n > 0 && us > 0 =>
          AviInfo(w, hgt, n, us, frames.result())
        }
      } catch { case _: Exception => None }
  }

  /** REAL image codec — no stub: the JDK ships a PNG encoder/decoder
    * (`javax.imageio.ImageIO`), so the image leg of the multimodal
    * pipeline runs an actual binary codec end-to-end. Encoding is
    * deterministic (fixed pixel function of (doc_id, x, y), PNG is
    * lossless), decoding reads the true IHDR dimensions back from the
    * bytes — if the payload were corrupt or the codec fake, the dims
    * would not match the generator's and `valid` would be false.
    *
    * At scale this is the exact plumbing a real pipeline needs: the
    * codec object is partition-scoped, payloads stay in one narrow
    * `mapPartitions` stage, and only small typed metadata crosses any
    * shuffle. */
  object ImageCodec {
    /** Deterministic dims as a pure function of the doc text length —
      * mirrored by the oracle SQL; the PNG round-trip must reproduce
      * them from the bytes alone. */
    def dimsFor(textLen: Int): (Int, Int) =
      (8 + textLen % 57, 8 + (textLen.toLong * 7 % 41).toInt)

    /** Encode a real PNG with a fixed pixel pattern. With `perturb`,
      * pixels on the sparse (x+y) % 19 == 0 diagonal grid get a
      * half-intensity offset BEFORE the modulus — a deterministic
      * "small visual edit" that leaves most of the image (and so most
      * aHash cells) untouched, giving the perceptual-dedup operators a
      * corpus with genuine near-duplicate image pairs. */
    def encodePng(docId: Long, w: Int, h: Int, perturb: Boolean = false): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val bump = if (perturb && (x + y) % 19 == 0) 8388608L else 0L
          img.setRGB(x, y, ((docId * 31 + x * 7 + y * 13 + bump) % 0xFFFFFF).toInt)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** 64-bit average-hash from REAL decoded pixels: nearest-neighbor
      * 8×8 downsample, integer BT.601 grayscale, threshold at the
      * integer mean — all integer arithmetic, so the hash is exactly
      * reproducible from the pixel-generation formula (the oracle's
      * independent derivation). Returns (hi 32 bits, lo 32 bits). */
    def ahash(img: java.awt.image.BufferedImage): (Long, Long) = {
      val w = img.getWidth; val h = img.getHeight
      val gray = new Array[Int](64)
      var j = 0
      while (j < 8) {
        var i = 0
        while (i < 8) {
          val v = img.getRGB(i * w / 8, j * h / 8) & 0xFFFFFF
          gray(j * 8 + i) =
            ((v >> 16) * 299 + ((v >> 8) & 255) * 587 + (v & 255) * 114) / 1000
          i += 1
        }
        j += 1
      }
      val mean = gray.sum / 64
      var hi = 0L; var lo = 0L
      var c = 0
      while (c < 64) {
        if (gray(c) > mean) {
          if (c < 32) lo |= 1L << c else hi |= 1L << (c - 32)
        }
        c += 1
      }
      (hi, lo)
    }

    /** Decode: true dimensions from the bytes, or None if not an image. */
    def decodeDims(payload: Array[Byte]): Option[(Int, Int)] =
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        Option(img).map(i => (i.getWidth, i.getHeight))
      } catch { case _: Exception => None }
  }

  /** Image-only media table: REAL PNG payloads (every third document,
    * matching [[mediaTable]]'s image assignment), generated in a
    * partition-local stage — payload bytes never shuffle. */
  def imageTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    // SORT the narrow (id, len) rows BEFORE the encode stage
    // (Dedup.orderedSpread): the PNG codec is the expensive part, and
    // a downstream orderBy would re-run it in the range partitioner's
    // sampling pass and shuffle the payload bytes; range-spread first,
    // the codec runs exactly once, in parallel, and emits rows already
    // in doc_id order (map stages preserve it).
    graft.operators.Dedup.orderedSpread(
        docs.filter(col("doc_id") % 3 === 0)
          .select(col("doc_id"), length(col("text")).cast("int").as("text_len")),
        "doc_id")
      .as[(Long, Int)]
      .mapPartitions { batch =>
        batch.map { case (docId, textLen) =>
          val (w, h) = ImageCodec.dimsFor(textLen)
          (docId, ImageCodec.encodePng(docId, w, h))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** [[imageTable]] plus near-duplicate VARIANTS: every tenth image
    * (base doc_id % 30 == 0) also ships a perturbed copy under
    * doc_id | [[VariantIdTag]] — the corpus shape perceptual dedup
    * exists for (re-encodes/small edits of the same picture). Same
    * sort-first spread and partition-local encode as the base table. */
  def imageTableWithVariants(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val base = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), length(col("text")).cast("int").as("text_len"),
        lit(false).as("perturb"))
    val variants = docs.filter(col("doc_id") % 30 === 0)
      .select(col("doc_id").bitwiseOR(VariantIdTag).as("doc_id"),
        length(col("text")).cast("int").as("text_len"), lit(true).as("perturb"))
    graft.operators.Dedup.orderedSpread(base.unionByName(variants), "doc_id")
      .as[(Long, Int, Boolean)]
      .mapPartitions { batch =>
        batch.map { case (docId, textLen, perturb) =>
          val (w, h) = ImageCodec.dimsFor(textLen)
          // variants render the BASE doc's pattern (+ the perturbation)
          val patternId = if (perturb) docId & ~VariantIdTag else docId
          (docId, ImageCodec.encodePng(patternId, w, h, perturb))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** Perceptual-hash extraction: decode each PNG (real codec) and
    * aHash its pixels. Payloads never leave the partition; only the
    * 24-byte (id, hi, lo) rows continue downstream. Undecodable
    * payloads (truncated bytes, non-image modalities — ImageIO.read
    * returns null or throws on those) are dropped rather than killing
    * the task, mirroring [[decodeDims]]' valid=false contract. */
  def imagePHash(spark: SparkSession, images: DataFrame): Dataset[PHash] = {
    import spark.implicits._
    images.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (docId, payload) =>
          scala.util.Try(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload)))
            .toOption.flatMap(Option(_))
            .map { img =>
              val (hi, lo) = ImageCodec.ahash(img)
              PHash(docId, hi, lo)
            }
        }
      }
  }

  /** Near-duplicate IMAGE pairs by aHash hamming distance ≤
    * `maxHamming`, pigeonhole-blocked: the 64 hash bits split into 9
    * chunks (eight 7-bit + one 8-bit), so any pair within hamming 8
    * agrees on at least one chunk and only chunk-bucket-mates are ever
    * compared — the [[graft.operators.Dedup.simhashPairs]] recipe one
    * level up in hash width. Random unrelated hashes agree on a 7-bit
    * chunk with p ≈ 2⁻⁷, so candidate fan-out stays near-linear while
    * recall at ≤ 8 is exact, not probabilistic. */
  def phashPairs(hashes: DataFrame, maxHamming: Int = 8): DataFrame = {
    // the hash table feeds BOTH sides of the self-join; untracked, a
    // non-trivial upstream (the PNG decode pipeline) would run twice.
    // 24 bytes/row, so the cache is negligible at any image count
    // (tracked: OpCaches.releaseAll() drops it after the caller's
    // terminal action)
    val h = OpCaches.shared("mm.fullHash")(withFullHash(hashes))
    phashPairsCore(h, maxHamming).orderBy("doc_a", "doc_b")
  }

  /** doc_id + the 64 aHash bits packed into one `full` long. */
  private def withFullHash(hashes: DataFrame): DataFrame =
    hashes.withColumn("full",
        shiftleft(col("ahash_hi"), 32).bitwiseOR(col("ahash_lo")))
      .select(col("doc_id"), col("full"))

  /** The pigeonhole-blocked hamming join over a (doc_id, full) frame —
    * the core shared by [[phashPairs]] (all images) and
    * [[phashSpanningEdges]] (distinct hashes only). Unsorted. */
  private def phashPairsCore(h: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming <= 8, "9-chunk blocking only guarantees recall for hamming <= 8")
    val chunkDefs = (0 until 9).map { c =>
      val width = if (c == 8) 8 else 7
      struct(lit(c).as("chunk"),
        expr(s"shiftrightunsigned(full, ${7 * c}) & ${(1 << width) - 1}").as("cval"))
    }
    val chunks = h
      .select(col("doc_id"), col("full"), explode(array(chunkDefs: _*)).as("ck"))
      .select(col("doc_id"), col("full"),
        col("ck.chunk").as("chunk"), col("ck.cval").as("cval"))
    // each near pair agrees on up to 9 chunks, so the raw join emits it
    // up to 9 times. Dedup WITHOUT a distinct shuffle: keep a candidate
    // row only when its chunk is the FIRST agreeing chunk — "no chunk
    // below mine agrees", decidable per row from the xor of the two
    // full hashes. agree_mask packs "is 7-bit block j of xor zero" into
    // bit j (chunk 8 can never be an earlier chunk, so 8 blocks
    // suffice); all shifts/ands/CASEs are codegen'd integer ops, so the
    // only exchanges left are the join itself and the final sort.
    val xorv = col("a.full").bitwiseXOR(col("b.full"))
    val agreeMask = (0 until 8).map { j =>
      when(xorv.bitwiseAND(lit(127L << (7 * j))) === 0, lit(1 << j))
        .otherwise(lit(0))
    }.reduce(_.bitwiseOR(_))
    chunks.as("a").join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.cval") === col("b.cval") &&
          col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming", expr("bit_count(a.full ^ b.full)").cast("int"))
      // hamming filter FIRST: bit_count is cheap and most chunk
      // collisions are far pairs; the first-agreement check then
      // uniquifies the survivors
      .filter(col("hamming") <= maxHamming &&
        agreeMask.bitwiseAND(expr("shiftleft(1, a.chunk) - 1")) === 0)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("hamming"))
  }

  /** A SPANNING edge set of the hamming ≤ `maxHamming` graph with the
    * SAME connected components as [[phashPairs]]' full output but
    * clique-LINEAR size — the edge relation the CC consumers
    * (mm_phash_clusters / mm_phash_keep) should feed on at scale. A
    * viral image duplicated c times is a hamming-0 clique: the full
    * pair contract emits c·(c−1)/2 edges from it (sf10 measured 113M
    * edges / 600k images, wall 399 s — edge-bound), while CC only
    * needs c−1 of them.
    *
    * Construction: quotient by IDENTICAL full hash. (1) Equal-hash
    * groups collapse to their min-doc_id representative via STAR edges
    * rep→member (each a genuine hamming-0 pair, so ⊆ the full edge
    * set). (2) The pairwise chunk-blocked join then runs over DISTINCT
    * hash values only (one row per group), emitting one rep–rep edge
    * per near hash-value pair instead of c_a·c_b member edges. CC
    * identity: both edge families are subsets of the true ≤-threshold
    * graph, and every true edge (a,b) is spanned — equal hashes share
    * a representative's star; unequal hashes contribute the rep(a)–
    * rep(b) edge (same hamming, hashes equal by group). NOT the naive
    * "star per blocking bucket": chunk-bucket mates are candidates,
    * not matches — wiring a bucket to its min id would merge images
    * at hamming > threshold into one component.
    *
    * Scale shape: star edges are one hash-partitioned groupBy + a
    * join-back (linear, shuffle on `full`); the quadratic-prone join
    * now sees one row per distinct hash, so clique growth (the thing
    * that DOES grow with a web-scale corpus) no longer touches it. */
  def phashSpanningEdges(hashes: DataFrame, maxHamming: Int = 8): DataFrame = {
    val h = OpCaches.shared("mm.fullHash")(withFullHash(hashes))
    val groups = OpCaches.shared("mm.hashGroups")(
      h.groupBy("full").agg(min("doc_id").as("rep")))
    val stars = h.join(groups, Seq("full"))
      .filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("doc_a"), col("doc_id").as("doc_b"))
    val repPairs = phashPairsCore(
        groups.select(col("rep").as("doc_id"), col("full")), maxHamming)
      .select("doc_a", "doc_b")
    stars.unionByName(repPairs)
  }

  /** REAL decode stage: javax.imageio reads each PNG's true dimensions
    * back from the binary column. Output is small typed metadata only. */
  def decodeImages(spark: SparkSession, images: DataFrame): Dataset[ImageDecoded] = {
    import spark.implicits._
    images.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (docId, payload) =>
          ImageCodec.decodeDims(payload) match {
            case Some((w, h)) =>
              ImageDecoded(docId, "png", w, h, w.toLong * h, valid = true)
            case None => ImageDecoded(docId, "invalid", -1, -1, 0L, valid = false)
          }
        }
      }
  }

  /** REAL audio codec — no stub: WAV/PCM is a pure container format
    * the JDK reads natively (`javax.sound.sampled.AudioSystem`), so
    * the audio leg runs an actual binary codec end-to-end like the
    * image leg's ImageIO. Encoding writes a genuine 44-byte RIFF
    * header + 16-bit little-endian mono PCM from a deterministic
    * integer wave; decoding recovers the TRUE sample rate, width and
    * frames from the bytes — a corrupt payload or fake codec would
    * not reproduce the generator's parameters. All features are
    * integers (peak, floor-div mean |amplitude|), so the oracle can
    * re-derive them from the wave formula exactly. The video leg's
    * [[VideoCodec]] extends the same RIFF machinery to AVI. */
  object AudioCodec {
    /** Deterministic (sampleRate, nSamples) per doc — mirrored by the
      * oracle; the WAV round-trip must reproduce them from bytes. */
    def paramsFor(docId: Long, textLen: Int): (Int, Int) =
      (8000 + (docId % 5).toInt * 2000, 256 + textLen % 200)

    /** The integer wave: a pure function of (doc, i) in 16-bit range. */
    def sample(docId: Long, i: Int): Int =
      (((docId * 31 + i.toLong * 7) % 2048).toInt - 1024) * 16

    /** A real WAV file: RIFF/WAVE header + PCM16LE mono samples. With
      * `infoChunk`, a LIST/INFO metadata chunk is inserted before the
      * data chunk — a BYTE-different container carrying the IDENTICAL
      * audio (the shape that defeats payload-hash dedup but not
      * decode-level dedup). */
    def encodeWav(docId: Long, rate: Int, n: Int,
        infoChunk: Boolean = false): Array[Byte] = {
      val data = new Array[Byte](n * 2)
      var i = 0
      while (i < n) {
        val s = sample(docId, i)
        data(2 * i) = (s & 0xFF).toByte
        data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
        i += 1
      }
      val extra = if (infoChunk) 12 else 0
      val bb = java.nio.ByteBuffer.allocate(44 + extra + data.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + extra + data.length)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      if (infoChunk)
        bb.put("LIST".getBytes("US-ASCII")).putInt(4)
          .put("INFO".getBytes("US-ASCII"))
      bb.put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
      bb.array()
    }

    /** Decode via the JDK: true (rate, samples) from the bytes, or
      * None for anything that is not 16-bit mono PCM. */
    def decode(payload: Array[Byte]): Option[(Int, Array[Int])] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val f = in.getFormat
        if (f.getSampleSizeInBits != 16 || f.getChannels != 1 || f.isBigEndian) None
        else {
          val bytes = in.readAllBytes()
          val n = bytes.length / 2
          val samples = new Array[Int](n)
          var i = 0
          while (i < n) {
            samples(i) = (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF)
            i += 1
          }
          Some((f.getSampleRate.toInt, samples))
        }
      } catch { case _: Exception => None }
  }

  /** Audio-only media table: REAL WAV payloads (every `doc_id % 3 == 1`
    * document, matching [[mediaTable]]'s audio assignment). Same
    * sort-first spread and partition-local encode as [[imageTable]] —
    * payload bytes never shuffle. */
  def audioTable(spark: SparkSession, docs: DataFrame): DataFrame =
    audioTableImpl(spark, docs, withVariants = false)

  /** [[audioTable]] plus CONTAINER variants: every `doc_id % 30 == 1`
    * clip also ships under doc_id | [[VariantIdTag]] with an extra
    * LIST/INFO chunk — different payload BYTES (payload-hash dedup
    * misses it), identical decoded PCM (decode-level dedup must catch
    * it). */
  def audioTableWithContainerVariants(spark: SparkSession, docs: DataFrame): DataFrame =
    audioTableImpl(spark, docs, withVariants = true)

  /** The ONE audio-table scaffold both public forms share: filter the
    * audio-assigned docs, optionally add the container-variant rows,
    * sort-first spread, and encode partition-locally — payload bytes
    * never shuffle. */
  private def audioTableImpl(spark: SparkSession, docs: DataFrame,
      withVariants: Boolean): DataFrame = {
    import spark.implicits._
    val base = docs.filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), length(col("text")).cast("int").as("text_len"),
        lit(false).as("info"))
    val rows = if (!withVariants) base else base.unionByName(
      docs.filter(col("doc_id") % 30 === 1)
        .select(col("doc_id").bitwiseOR(VariantIdTag).as("doc_id"),
          length(col("text")).cast("int").as("text_len"), lit(true).as("info")))
    graft.operators.Dedup.orderedSpread(rows, "doc_id")
      .as[(Long, Int, Boolean)]
      .mapPartitions { batch =>
        batch.map { case (docId, textLen, info) =>
          val patternId = if (info) docId & ~VariantIdTag else docId
          val (rate, n) = AudioCodec.paramsFor(patternId, textLen)
          (docId, AudioCodec.encodeWav(patternId, rate, n, infoChunk = info))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** DECODE-level audio dedup: clips group by an exact integer
    * signature of their DECODED samples (count, Σ|s|, max|s|, and the
    * position-weighted Σ(i+1)·|s|), not by payload bytes — so the
    * same audio in a re-tagged/re-chunked container (different md5,
    * identical PCM) still collapses, which is precisely the case
    * [[dedupPayloads]]' payload hash cannot see. The signature is
    * pure integer arithmetic over decoded samples, so the oracle can
    * re-derive it from the wave formula — a matching row proves the
    * JDK decode path ignored the container difference.
    *
    * Scale shape: decode is partition-local (payload bytes never
    * shuffle); only the 5-long signature row enters the group-by,
    * which partial-combines map-side like any exact-dedup aggregate. */
  /** Exact PCM signature of one WAV payload: (n_samples, Σ|s|,
    * max|s|, Σ(i+1)·|s|); None for corrupt/empty payloads. The
    * per-payload core shared by [[audioDedup]] and the persisted
    * signature store ([[audioDedupCached]]). */
  private[graft] def audioSig(payload: Array[Byte]): Option[(Long, Long, Long, Long)] =
    AudioCodec.decode(payload).collect { case (_, ss) if ss.nonEmpty =>
      var sumAbs = 0L; var peak = 0L; var weighted = 0L
      var i = 0
      while (i < ss.length) {
        val a = math.abs(ss(i).toLong)
        sumAbs += a; weighted += (i + 1) * a
        if (a > peak) peak = a
        i += 1
      }
      (ss.length.toLong, sumAbs, peak, weighted)
    }

  private def groupAudioSigs(sigs: DataFrame): DataFrame =
    sigs
      .groupBy("n_samples", "sum_abs", "peak_amp", "weighted")
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_doc_id")

  def audioDedup(spark: SparkSession, audio: DataFrame): DataFrame = {
    import spark.implicits._
    groupAudioSigs(audio.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (docId, payload) =>
          audioSig(payload).map { case (n, sumAbs, peak, weighted) =>
            (docId, n, sumAbs, peak, weighted)
          }
        }
      }
      .toDF("doc_id", "n_samples", "sum_abs", "peak_amp", "weighted"))
  }

  /** [[audioDedup]] with a persisted decode cache: per-payload PCM
    * signatures live in a [[graft.fs.SnapshotDir]] store keyed by
    * payload md5, and only UNSEEN payloads are decoded — see
    * [[MediaSigStore]]. Decisions are identical to [[audioDedup]] by
    * construction (same signature, same grouping). */
  def audioDedupCached(spark: SparkSession, audio: DataFrame,
      storeRoot: String): DataFrame = {
    import spark.implicits._
    val sigs = MediaSigStore.cachedSigRows(spark, audio, storeRoot,
      MediaSigStore.audioStoreSchema) { (toDecode, acc) =>
      toDecode.select("pkey", "payload").as[(String, Array[Byte])]
        .mapPartitions { batch =>
          batch.map { case (pkey, payload) =>
            acc.add(1)
            audioSig(payload) match {
              case Some((n, sumAbs, peak, weighted)) =>
                (pkey, n, sumAbs, peak, weighted, true)
              case None => (pkey, 0L, 0L, 0L, 0L, false)
            }
          }
        }
        .toDF("pkey", "n_samples", "sum_abs", "peak_amp", "weighted", "valid")
    }
    groupAudioSigs(sigs.filter(col("valid"))
      .select("doc_id", "n_samples", "sum_abs", "peak_amp", "weighted"))
  }

  /** REAL audio decode + feature stage: AudioSystem reads each WAV's
    * true format back from the binary column; features are exact
    * integers over the decoded samples (floor-div mean |amplitude|,
    * peak, integer duration). Payloads stay inside the partition;
    * only the metadata row continues. */
  def audioMeta(spark: SparkSession, audio: DataFrame): DataFrame = {
    import spark.implicits._
    audio.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (docId, payload) =>
          AudioCodec.decode(payload) match {
            case Some((rate, ss)) if ss.nonEmpty =>
              var sumAbs = 0L; var peak = 0L
              var i = 0
              while (i < ss.length) {
                val a = math.abs(ss(i).toLong)
                sumAbs += a; if (a > peak) peak = a
                i += 1
              }
              (docId, rate.toLong, ss.length.toLong,
                ss.length.toLong * 1000L / rate, peak, sumAbs / ss.length, true)
            case _ => (docId, 0L, 0L, 0L, 0L, 0L, false)
          }
        }
      }
      .toDF("doc_id", "sample_rate", "n_samples", "duration_ms",
        "peak_amp", "mean_abs", "valid")
      .orderBy("doc_id")
  }

  /** Video-only media table: REAL AVI payloads (every `doc_id % 3 == 2`
    * document, completing [[codecTable]]'s three-way modality split).
    * Same sort-first spread and partition-local encode as
    * [[imageTable]]/[[audioTable]] — payload bytes never shuffle. */
  def videoTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    graft.operators.Dedup.orderedSpread(
        docs.filter(col("doc_id") % 3 === 2)
          .select(col("doc_id"), length(col("text")).cast("int").as("text_len")),
        "doc_id")
      .as[(Long, Int)]
      .mapPartitions { batch =>
        batch.map { case (docId, textLen) =>
          val (w, h, n, us) = VideoCodec.paramsFor(docId, textLen)
          (docId, VideoCodec.encodeAvi(docId, w, h, n, us))
        }
      }
      .toDF("doc_id", "payload")
  }

  /** [[videoTable]] in MIXED codecs plus CONTAINER variants — the
    * input of [[videoDedup]]. Half the videos ([[VideoCodec.isMjpeg]])
    * carry real JPEG frame chunks instead of raw 24bpp; every
    * `doc_id % 15 == 2` video also ships under doc_id |
    * [[VariantIdTag]] as a RE-MUX: identical frame pixels in a
    * byte-different container (JUNK chunk, no idx1 — and for MJPEG,
    * COM-spliced frame chunks, so even the frame chunk BYTES differ
    * while the decoded pixels are bit-identical). Payload-hash dedup
    * sees none of these as copies; only a true frame-pixel decode
    * collapses them. Same sort-first spread, partition-local encode. */
  def videoTableWithContainerVariants(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val base = docs.filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), length(col("text")).cast("int").as("text_len"),
        lit(false).as("remux"))
    val rows = base.unionByName(
      docs.filter(col("doc_id") % 15 === 2)
        .select(col("doc_id").bitwiseOR(VariantIdTag).as("doc_id"),
          length(col("text")).cast("int").as("text_len"), lit(true).as("remux")))
    graft.operators.Dedup.orderedSpread(rows, "doc_id")
      .as[(Long, Int, Boolean)]
      .mapPartitions { batch =>
        batch.map { case (docId, textLen, remux) =>
          val patternId = if (remux) docId & ~VariantIdTag else docId
          val (w, h, n, us) = VideoCodec.paramsFor(patternId, textLen)
          val payload =
            if (VideoCodec.isMjpeg(patternId))
              VideoCodec.encodeAviMjpeg(patternId, w, h, n, us, remux = remux)
            else if (remux) VideoCodec.encodeAviRemuxed(patternId, w, h, n, us)
            else VideoCodec.encodeAvi(patternId, w, h, n, us)
          (docId, payload)
        }
      }
      .toDF("doc_id", "payload")
  }

  /** DECODE-level video dedup — the frame-pixel twin of
    * [[audioDedup]]: containers group by an exact signature of their
    * DECODED frame pixels (dims, frame count, byte count, and a
    * position-sensitive 64-bit polynomial hash of the full pixel
    * stream — equality ⟺ pixel identity up to ~2⁻⁶⁴; see the inline
    * note for why integer SUMS were not enough), never by payload or
    * chunk bytes. A re-muxed container — different idx1,
    * JUNK chunks, even COM-respliced JPEG frames — decodes to the
    * same pixels and collapses; a chunk-byte hash would MISS the
    * COM-spliced MJPEG variants, which is exactly what makes this
    * decode-level. Output is (dims, keep_doc_id, n_copies): the
    * dedup decisions plus the decoded dims the oracle re-derives
    * from the generator formulas (the pixel sums of a JPEG decode
    * are not SQL-re-derivable, so the oracle pins the DECISIONS —
    * a broken codec surfaces as dropped rows, un-collapsed variants,
    * or over-collapsed distinct docs).
    *
    * Scale shape: decode is partition-local (payload bytes never
    * shuffle); only the 6-long signature row enters the group-by,
    * which partial-combines map-side like any exact-dedup aggregate. */
  /** Exact frame-pixel signature of one AVI payload: (width, height,
    * n_frames, pix_hash, n_bytes) where pix_hash is a
    * position-sensitive 64-bit polynomial hash over the full decoded
    * pixel stream (frame boundaries folded in). The first cut used
    * integer SUMS — and the sf1 gate caught 5 cross-doc collisions:
    * the generator's pixel pattern is LINEAR mod 256, and over full
    * 256-byte cycles Σ((c + 7i) mod 256) is independent of c, so sums
    * are systematically shift-invariant, not content-invariant. A
    * polynomial hash keys on every byte AND its position; equality ⟺
    * pixel-stream identity up to ~2^-64. None for corrupt payloads.
    * The per-payload core shared by [[videoDedup]] and the persisted
    * signature store ([[videoDedupCached]]). */
  private[graft] def videoSig(payload: Array[Byte]): Option[(Int, Int, Long, Long, Long)] =
    VideoCodec.decode(payload).flatMap { info =>
      var h = 1469598103934665603L // FNV offset basis
      var nBytes = 0L; var ok = true
      var f = 0
      while (ok && f < info.frameChunks.length) {
        val (off, len) = info.frameChunks(f)
        VideoCodec.decodeFrameChunk(payload, off, len) match {
          case Some(px) =>
            h = h * 1099511628211L + px.length // frame boundary
            var i = 0
            while (i < px.length) {
              h = (h ^ (px(i) & 0xFF).toLong) * 1099511628211L
              i += 1
            }
            nBytes += px.length
          case None => ok = false
        }
        f += 1
      }
      if (ok && info.frameChunks.nonEmpty)
        Some((info.width, info.height, info.frameChunks.length.toLong, h, nBytes))
      else None
    }

  private def groupVideoSigs(sigs: DataFrame): DataFrame =
    sigs
      .groupBy("width", "height", "n_frames", "pix_hash", "n_bytes")
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .select(col("width"), col("height"), col("n_frames"),
        col("keep_doc_id"), col("n_copies"))
      .orderBy("keep_doc_id")

  def videoDedup(spark: SparkSession, video: DataFrame): DataFrame = {
    import spark.implicits._
    groupVideoSigs(video.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (docId, payload) =>
          videoSig(payload).map { case (w, hh, nf, ph, nb) =>
            (docId, w, hh, nf, ph, nb)
          }
        }
      }
      .toDF("doc_id", "width", "height", "n_frames", "pix_hash", "n_bytes"))
  }

  /** [[videoDedup]] with a persisted decode cache — the decade lever:
    * at 5M media docs one full MJPEG decode pass costs ~22 min on 32
    * threads and [[videoDedup]] re-pays it EVERY run; with per-payload
    * signatures persisted in a [[graft.fs.SnapshotDir]] store keyed by
    * payload md5 (same snapshot protocol as the IVF index), a repeat
    * pass decodes nothing and an incremental pass decodes only unseen
    * payloads. Decisions are identical to [[videoDedup]] by
    * construction (same signature, same grouping). */
  def videoDedupCached(spark: SparkSession, video: DataFrame,
      storeRoot: String): DataFrame = {
    import spark.implicits._
    val sigs = MediaSigStore.cachedSigRows(spark, video, storeRoot,
      MediaSigStore.videoStoreSchema) { (toDecode, acc) =>
      toDecode.select("pkey", "payload").as[(String, Array[Byte])]
        .mapPartitions { batch =>
          batch.map { case (pkey, payload) =>
            acc.add(1)
            videoSig(payload) match {
              case Some((w, hh, nf, ph, nb)) => (pkey, w, hh, nf, ph, nb, true)
              case None => (pkey, 0, 0, 0L, 0L, 0L, false)
            }
          }
        }
        .toDF("pkey", "width", "height", "n_frames", "pix_hash", "n_bytes", "valid")
    }
    groupVideoSigs(sigs.filter(col("valid"))
      .select("doc_id", "width", "height", "n_frames", "pix_hash", "n_bytes"))
  }

  /** The REAL multimodal corpus: every document carries an actual
    * binary container — PNG, WAV or AVI by `doc_id % 3` — built by the
    * three partition-local encode tables. The union is the input shape
    * a mixed-media ingest has: one opaque payload column, modality
    * only discoverable by sniffing the bytes ([[decodeMetadata]]). */
  def codecTable(spark: SparkSession, docs: DataFrame): DataFrame =
    imageTable(spark, docs)
      .unionByName(audioTable(spark, docs))
      .unionByName(videoTable(spark, docs))

  /** Synthesize the opaque media table from `documents`: payload =
    * UTF-8 bytes of the text, media_type cycles image/audio/video.
    * This is the PAYLOAD-level table: [[dedupPayloads]]' semantics
    * (hash the bytes you were handed, before any decode) are
    * modality-agnostic, so its gate keeps the oracle-friendly payload
    * whose md5 DuckDB can recompute (`md5(text)`); the decode-level
    * operators run on [[codecTable]]'s real containers instead. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      encode(col("text"), "UTF-8").cast("binary").as("payload"))

  /** Exact media dedup by content hash, per modality: the binary
    * payload column hashed once at the scan (md5 over bytes), one
    * hash aggregate — the multimodal twin of [[Dedup.exact]]. At
    * 100 TB the shuffle carries (16-byte hash, partial counts), never
    * payload bytes; dedup before decode is the standard ordering (why
    * decode a frame twice?). */
  def dedupPayloads(media: DataFrame): DataFrame =
    media.groupBy(md5(col("payload")).as("fp"), col("media_type"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("fp", "media_type")

  /** REAL decode / feature-extract stage: sniff each payload's
    * container from its BYTES (PNG signature / RIFF+WAVE / RIFF+AVI)
    * and decode with the matching codec — ImageIO for stills,
    * AudioSystem for WAV, the [[VideoCodec]] chunk walker for AVI.
    * The input is modality-blind (one opaque binary column, the mixed
    * ingest shape); modality comes OUT of the decode, not in with the
    * row. Only small typed metadata survives into the output, so
    * downstream stages shuffle kilobytes, not media bytes. Payloads
    * no codec accepts degrade to a valid=false row, never a task
    * failure. */
  def decodeMetadata(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (docId, p) =>
          def fcc(off: Int): String = VideoCodec.fourccAt(p, off)
          val isPng = p.length >= 8 && (p(0) & 0xFF) == 0x89 && p(1) == 'P' &&
            p(2) == 'N' && p(3) == 'G'
          if (isPng) {
            ImageCodec.decodeDims(p) match {
              case Some((w, h)) =>
                MediaMeta(docId, "image", "png", w, h, 1L, 0L, valid = true)
              case None =>
                MediaMeta(docId, "image", "png", 0, 0, 0L, 0L, valid = false)
            }
          } else if (fcc(0) == "RIFF" && fcc(8) == "WAVE") {
            AudioCodec.decode(p) match {
              case Some((rate, ss)) =>
                MediaMeta(docId, "audio", "wav", 0, 0, ss.length.toLong,
                  rate.toLong, valid = true)
              case None =>
                MediaMeta(docId, "audio", "wav", 0, 0, 0L, 0L, valid = false)
            }
          } else if (fcc(0) == "RIFF" && fcc(8) == "AVI ") {
            VideoCodec.decode(p) match {
              case Some(v) =>
                // sample_rate carries fps for video (µs/frame divides 1e6)
                MediaMeta(docId, "video", "avi", v.width, v.height,
                  v.nFrames.toLong, 1000000L / v.usPerFrame, valid = true)
              case None =>
                MediaMeta(docId, "video", "avi", 0, 0, 0L, 0L, valid = false)
            }
          } else MediaMeta(docId, "unknown", "unknown", 0, 0, 0L, 0L, valid = false)
        }
      }
  }

  /** REAL frame sampling: walk each AVI's movi chunk list and emit
    * every `step`-th frame's exact integer features, lazily (iterator
    * flatMap over the chunk OFFSETS — a 2-hour video's unsampled
    * frames are never even sliced). Non-AVI / corrupt payloads emit
    * no frames. */
  def sampleFrames(spark: SparkSession, media: DataFrame, step: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (docId, p) =>
          VideoCodec.decode(p).iterator.flatMap { v =>
            Iterator.range(0, v.frameChunks.length, step).map { f =>
              val (off, len) = v.frameChunks(f)
              var sum = 0L; var weighted = 0L
              var i = 0
              while (i < len) {
                val b = p(off + i) & 0xFF
                sum += b; weighted += (i + 1).toLong * b
                i += 1
              }
              Frame(docId, f, len, sum, weighted)
            }
          }
        }
      }
  }

  /** Resize planning: pure metadata transform of the REAL decoded dims
    * (the full op would also re-encode payload; the *plan* — narrow map
    * after decode, no shuffle — is identical). Callers feed the visual
    * rows of [[decodeMetadata]] (width > 0). */
  def resizeMeta(meta: Dataset[MediaMeta], maxSide: Int = 128): DataFrame =
    meta.toDF().withColumn("scale_num",
        when(greatest(col("width"), col("height")) > maxSide, lit(maxSide))
          .otherwise(greatest(col("width"), col("height"))))
      .withColumn("out_width",
        floor((col("width") * col("scale_num")) / greatest(col("width"), col("height"))))
      .withColumn("out_height",
        floor((col("height") * col("scale_num")) / greatest(col("width"), col("height"))))
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        col("out_width").cast("long").as("out_width"),
        col("out_height").cast("long").as("out_height"))
}
