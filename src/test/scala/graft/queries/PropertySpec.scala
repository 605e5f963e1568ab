package graft.queries

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.operators.Dedup

/** ScalaCheck-driven invariants over randomized inputs (seeded
  * generators, executed through the shared Spark session). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), p)
    assert(r.passed, r.status.toString)
  }

  private val fileRow = for {
    path <- Gen.oneOf("/a", "/b", "/c")
    name <- Gen.chooseNum(0, 30).map(i => s"f$i.dat")
    sum <- Gen.option(Gen.oneOf("s1", "s2", "s3"))
    size <- Gen.chooseNum(0L, 5000L)
  } yield (path, name, sum.orNull, new Timestamp(1700000000000L + size), size)

  test("property: upsert is idempotent and preserves the PK invariant") {
    check(Prop.forAll(Gen.listOfN(40, fileRow)) { rows =>
      val df = rows.toDF("path", "filename", "checksum", "modification_datetime", "file_size")
      val once = FileQueries.upsert(df, df.limit(10))
      val twice = FileQueries.upsert(once, df.limit(10))
      val pkDistinct = once.select("path", "filename").distinct().count()
      once.count() == pkDistinct && twice.count() == once.count()
    })
  }

  test("property: CLI duplicate_files == with_checksum - unique; API counts all members") {
    check(Prop.forAll(Gen.listOfN(40, fileRow)) { rows =>
      val df = rows.toDF("path", "filename", "checksum", "modification_datetime", "file_size")
      val cli = FileQueries.statsCli(df).collect().head
      val okCli = cli.getAs[Long]("duplicate_files") ==
        cli.getAs[Long]("files_with_checksum") - cli.getAs[Long]("unique_checksums")
      val api = FileQueries.duplicateStats(df).collect().head
      // every member of a >1 group counts; extras = members - groups
      val okRel = api.getAs[Long]("duplicate_files") >= api.getAs[Long]("duplicate_groups") &&
        (api.getAs[Long]("duplicate_files") == 0L || api.getAs[Long]("duplicate_groups") > 0L)
      okCli && okRel
    })
  }

  private val docGen = for {
    n <- Gen.chooseNum(1, 12)
    toks <- Gen.listOfN(n, Gen.oneOf("alpha", "beta", "gamma", "delta", "eps"))
  } yield toks.mkString(" ")

  test("property: jaccard is within (0,1], symmetric pairs a<b, 1.0 iff identical shingle sets") {
    check(Prop.forAll(Gen.listOfN(8, docGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val pairs = Dedup.jaccardPairs(docs, n = 2, threshold = 0.01).collect()
      pairs.forall { r =>
        val (a, b, j) = (r.getLong(0), r.getLong(1), r.getAs[Double]("jaccard"))
        a < b && j > 0.0 && j <= 1.0
      }
    })
  }

  test("property: cosinePairsBlocked == cosinePairs for any block count and id spacing") {
    import graft.operators.Similarity
    val vecGen = for {
      n <- Gen.chooseNum(3, 12)
      // sparse ids (not 0..n-1) exercise the pmod block assignment
      ids <- Gen.listOfN(n, Gen.chooseNum(0L, 500L)).map(_.distinct)
      seeds <- Gen.listOfN(ids.size, Gen.chooseNum(1, 99))
    } yield ids.zip(seeds)
    check(Prop.forAll(vecGen, Gen.chooseNum(1, 9)) { (rows, blocks) =>
      val emb = rows.map { case (id, seed) =>
        (id, Array.tabulate(64)(i => ((seed * 31 + i * 7) % 13 - 6).toFloat))
      }.toDF("vec_id", "embedding")
      val brute = Similarity.cosinePairs(emb, 0.2).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val blocked = Similarity.cosinePairsBlocked(emb, 0.2, blocks).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      blocked == brute
    })
  }

  test("property: PII scrub is idempotent — scrubbed text is always pii_free") {
    import graft.operators.Pii
    val word = Gen.oneOf("lorem", "ipsum", "data", "x1", "42", "a.b")
    val pii = Gen.oneOf(
      "j.doe+1@mail.example.org", "root@x.io",
      "555-867-5309", "123 456 7890",
      "10.0.0.1", "192.168.255.42",
      "4111 1111 1111 1111", "1234-5678-9012-3456")
    val textGen = Gen.listOfN(12, Gen.frequency(3 -> word, 1 -> pii))
      .map(_.mkString(" "))
    check(Prop.forAll(Gen.listOfN(6, textGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = Pii.redact(docs)
      val again = Pii.redact(once.select($"doc_id", $"redacted".as("text")))
        .collect()
      // every planted pattern was masked the first time: a second scrub
      // finds nothing and changes nothing
      again.forall(r => r.getAs[Boolean]("pii_free")) &&
        again.map(r => (r.getLong(0), r.getAs[String]("redacted"))).toSeq ==
          once.collect().map(r => (r.getLong(0), r.getAs[String]("redacted"))).toSeq
    })
  }

  private val eventGen: Gen[(Long, Long, Int)] = for {
    user <- Gen.chooseNum(1L, 8L)
    dayOff <- Gen.chooseNum(0, 6)
    secs <- Gen.chooseNum(0, 86399)
  } yield (user, dayOff.toLong * 86400L + secs, dayOff)

  test("property: retentionCohorts equals the naive distinct-window formulation") {
    check(Prop.forAll(Gen.listOfN(60, eventGen)) { evs =>
      val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
      val df = evs.zipWithIndex.map { case ((u, s, _), i) =>
        (i.toLong, new Timestamp(base + s * 1000L), u, "view", 0.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val fast = graft.streaming.Events.retentionCohorts(df).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getAs[Long]("n_users"),
          r.getAs[Long]("cohort_size"))).toSet
      // naive reference: per-user day sets on the driver
      val byUser = df.select($"user_id",
          org.apache.spark.sql.functions.expr("CAST(date_trunc('DAY', ts) AS DATE)"))
        .distinct().collect()
        .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val naive = byUser.toSeq.flatMap { case (_, days) =>
        val cohort = days.min
        days.toSeq.map(d =>
          (cohort, java.time.temporal.ChronoUnit.DAYS.between(cohort, d).toInt))
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val naiveSet = naive.map { case ((cohort, off), n) =>
        (cohort.toString, off, n, naive((cohort, 0)))
      }.toSet
      fast == naiveSet
    })
  }

  test("property: funnelSteps stage times are ordered, in-window, and stage-consistent") {
    val typed = for {
      (u, s, _) <- eventGen
      t <- Gen.oneOf("view", "click", "purchase", "error")
    } yield (u, s, t)
    check(Prop.forAll(Gen.listOfN(60, typed)) { evs =>
      val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
      val df = evs.zipWithIndex.map { case ((u, s, t), i) =>
        (i.toLong, new Timestamp(base + s * 1000L), u, t, 0.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val winMin = 120L
      val rows = graft.streaming.Events
        .funnelSteps(df, Seq("view", "click", "purchase"), winMin).collect()
      rows.forall { r =>
        val ts = Seq("ts_view", "ts_click", "ts_purchase")
          .map(c => Option(r.getAs[String](c)).map(Timestamp.valueOf))
        val stage = r.getAs[Int]("stage")
        // stage == count of non-null stage times, prefix-closed
        val defined = ts.map(_.isDefined)
        val prefixClosed = !defined.zip(defined.tail).exists { case (a, b) => b && !a }
        val ordered = ts.flatten.sliding(2).forall {
          case Seq(a, b) => !b.before(a) &&
            b.getTime - a.getTime <= winMin * 60000L
          case _ => true
        }
        stage == defined.count(identity) && prefixClosed && ordered
      }
    })
  }

  test("property: mixSchedule allocations sum to the budget, each within 1 of exact share") {
    val srcTok = for {
      src <- Gen.oneOf("a", "b", "c", "d")
      n <- Gen.chooseNum(1, 30)
    } yield (src, n)
    val budgetGen = Gen.chooseNum(1L, 500L)
    check(Prop.forAll(Gen.nonEmptyListOf(srcTok), budgetGen) { (rows, budget) =>
      val docs = rows.zipWithIndex.map { case ((src, n), i) =>
        val text = (1 to n).map(j => s"w$j").mkString(" ")
        (i.toLong, text, "en", src, text.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      val out = graft.operators.CorpusOps.mixSchedule(docs, budget).collect()
        .map(r => (r.getString(0), r.getAs[Long]("n_tokens"), r.getAs[Long]("alloc")))
      val total = out.map(_._2).sum
      val sumOk = out.map(_._3).sum == budget
      // largest-remainder quota property: every allocation is within 1
      // of the exact (real-valued) proportional share
      val quotaOk = out.forall { case (_, tok, alloc) =>
        val exact = budget.toDouble * tok / total
        alloc >= math.floor(exact) - 1e-9 && alloc <= math.ceil(exact) + 1e-9
      }
      sumOk && quotaOk
    })
  }

  test("property: dupSpans invariants — runs bounded, verbatim copies run full length") {
    check(Prop.forAll(Gen.listOfN(6, docGen)) { texts =>
      // plant one guaranteed verbatim duplicate of the first doc
      val all = (texts :+ texts.head).zipWithIndex
        .map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val out = graft.operators.Dedup.dupSpans(all, n = 2).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_dup_grams"),
            r.getAs[Long]("max_run")))).toMap
      graft.operators.OpCaches.releaseAll()
      val bounds = out.values.forall { case (n, dup, run) =>
        run <= dup && dup <= n && run >= 0
      }
      // the planted copy pair: both docs fully duplicated end-to-end
      val (n0, d0, r0) = out(0L)
      bounds && d0 == n0 && r0 == n0
    })
  }

  test("property: cosineHistogram band counts total the thresholded pair count") {
    check(Prop.forAll(Gen.chooseNum(3, 8), Gen.long) { (nv, seed) =>
      val rnd = new scala.util.Random(seed)
      val vecs = (0 until nv).map { i =>
        val a = Array.tabulate(64)(_ => (rnd.nextInt(11) - 5) / 4f)
        a(0) = 1.0f // avoid all-zero vectors (norm 0 → NaN cosine)
        (i.toLong, a)
      }
      val emb = vecs.toDF("vec_id", "embedding")
      // lo below -1: antipodal pairs can land at -1 − ε in floats; a
      // band floor at exactly -1.0 would drop them from the total
      val hist = graft.operators.Similarity.cosineHistogram(emb, lo = -1.25, step = 0.25)
        .collect()
      val totalPairs = nv.toLong * (nv - 1) / 2
      hist.map(_.getAs[Long]("n_pairs")).sum == totalPairs
    })
  }

  test("property: containment dominates jaccard and bounds it from both sides") {
    check(Prop.forAll(Gen.listOfN(8, docGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      // every candidate pair: union ≥ max side ⇒ jaccard ≤ min(cont)
      // ≤ max(cont), and cont==1 on BOTH sides iff the sets are
      // identical iff jaccard == 1
      val cont = Dedup.containmentPairs(docs, n = 2, minContainment = 0.0).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
          (r.getAs[Double]("cont_a"), r.getAs[Double]("cont_b"))).toMap
      graft.operators.OpCaches.releaseAll()
      val jac = Dedup.jaccardPairs(docs, n = 2, threshold = 0.0).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
          r.getAs[Double]("jaccard")).toMap
      graft.operators.OpCaches.releaseAll()
      cont.keySet == jac.keySet && jac.forall { case (k, j) =>
        val (ca, cb) = cont(k)
        j <= math.min(ca, cb) + 1e-12 && math.min(ca, cb) <= math.max(ca, cb) &&
          ((ca == 1.0 && cb == 1.0) == (j == 1.0))
      }
    })
  }

  test("property: jaccardHistogram totals the pair count at its lo threshold") {
    check(Prop.forAll(Gen.listOfN(8, docGen)) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val hist = Dedup.jaccardHistogram(docs, n = 2, lo = 0.1, step = 0.2).collect()
      graft.operators.OpCaches.releaseAll()
      val pairs = Dedup.jaccardPairs(docs, n = 2, threshold = 0.1).count()
      graft.operators.OpCaches.releaseAll()
      hist.map(_.getAs[Long]("n_pairs")).sum == pairs
    })
  }

  private val gapEventGen = for {
    user <- Gen.chooseNum(1L, 4L)
    offMs <- Gen.chooseNum(0L, 3600L * 1000)
    typ <- Gen.oneOf("view", "click")
  } yield (user, offMs, typ)

  test("property: interEventGaps sums telescope to last-minus-first per user") {
    check(Prop.forAll(Gen.listOfN(30, gapEventGen)) { evs =>
      val rows = evs.zipWithIndex.map { case ((u, off, t), i) =>
        (i.toLong + 1, new Timestamp(1700000000000L + off), u, t, 0.0, "{}")
      }
      val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val got = graft.streaming.Events.interEventGaps(df).collect()
        .map(r => r.getAs[Long]("user_id") ->
          (r.getAs[Long]("n_events"), r.getAs[Long]("n_gaps"),
            Option(r.getAs[Any]("min_gap_us")), Option(r.getAs[Any]("max_gap_us"))))
        .toMap
      val byUser = rows.groupBy(_._3)
      byUser.forall { case (u, rs) =>
        val (n, g, mn, mx) = got(u)
        val span = (rs.map(_._2.getTime).max - rs.map(_._2.getTime).min) * 1000L
        val gapsSumOk = // telescoping: gaps sum = span (total order covers all)
          g == 0L || {
            val mean = graft.streaming.Events.interEventGaps(df)
              .filter(org.apache.spark.sql.functions.col("user_id") === u)
              .collect().head.getAs[Double]("mean_gap_s")
            math.abs(mean * g * 1e6 - span) < 1e-3 * math.max(span, 1L)
          }
        n == rs.size && g == n - 1 &&
          (g > 0L || (mn.isEmpty && mx.isEmpty)) && gapsSumOk
      }
    })
  }

  test("property: AVI round-trip is exact for any params; truncation never throws") {
    import graft.operators.Multimodal.VideoCodec
    val params = for {
      docId <- Gen.chooseNum(0L, 1L << 41) // beyond the variant-tag bit too
      w <- Gen.chooseNum(1, 64)
      h <- Gen.chooseNum(1, 64)
      nf <- Gen.chooseNum(1, 20)
      us <- Gen.oneOf(20000, 25000, 40000, 50000, 100000)
    } yield (docId, w, h, nf, us)
    check(Prop.forAll(params) { case (docId, w, h, nf, us) =>
      val avi = VideoCodec.encodeAvi(docId, w, h, nf, us)
      val v = VideoCodec.decode(avi)
      val roundTrip = v.exists(i => i.width == w && i.height == h &&
        i.nFrames == nf && i.usPerFrame == us && i.frameChunks.length == nf &&
        i.frameChunks.forall(_._2 == w * h * 3) &&
        // spot-check the first frame's first/last bytes against the formula
        (avi(i.frameChunks.head._1) & 0xFF) == VideoCodec.frameByte(docId, 0, 0) &&
        (avi(i.frameChunks.head._1 + w * h * 3 - 1) & 0xFF) ==
          VideoCodec.frameByte(docId, 0, w * h * 3 - 1))
      // EVERY truncation point decodes to None, or to a structurally
      // valid prefix whose frame chunks all lie INSIDE the truncated
      // bytes (a cut inside the trailing idx1 leaves hdrl+movi whole
      // and legitimately decodable). Asserting on the decoded VALUE,
      // not exception-freedom: decode swallows exceptions internally,
      // so a Try-based check would be vacuously true.
      val truncOk = (0 until 12).forall { j =>
        val cut = avi.length * j / 12
        VideoCodec.decode(java.util.Arrays.copyOf(avi, cut)) match {
          case None => true
          case Some(i) =>
            i.width == w && i.height == h && i.nFrames == nf &&
              i.frameChunks.forall { case (off, len) =>
                off >= 0 && len >= 0 && off + len <= cut }
        }
      }
      roundTrip && truncOk
    })
  }
}
