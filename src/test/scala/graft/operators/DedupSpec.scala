package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Semantics tests for the dedup operators over crafted documents with
  * known exact answers. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  // d1 ≡ d2 exactly; d3 shares 3 of d1's shingles; d4 disjoint.
  private lazy val docs: DataFrame = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, "the quick brown fox runs over the lazy dog"),
    (4L, "completely different words in this sentence here")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min doc_id") {
    val g = Dedup.exact(docs).collect()
    assert(g.length == 3)
    val dup = g.find(_.getAs[Long]("n_copies") == 2).get
    assert(dup.getAs[Long]("keep_doc_id") == 1L)
  }

  test("dedupStatsBySource attributes non-keeper copies to their own source") {
    // fp X: docs 1 (src a, keeper), 2 (src b), 3 (src b) — b holds 2 dups
    // fp Y: docs 4 (src b, keeper) — unique
    // fp Z: docs 5 (src a, keeper), 6 (src a) — a holds 1 dup
    val d = Seq(
      (1L, "same text", "a", 9L), (2L, "same text", "b", 9L),
      (3L, "same text", "b", 9L), (4L, "unique b", "b", 8L),
      (5L, "other text", "a", 10L), (6L, "other text", "a", 10L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val r = Dedup.dedupStatsBySource(d).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getDouble(3), x.getLong(4))).toSeq
    assert(r == Seq(
      ("a", 3L, 1L, 1.0 / 3.0, 10L),
      ("b", 3L, 2L, 2.0 / 3.0, 18L)))
  }

  test("jaccard pairs: exact set similarity with threshold") {
    // 9-token docs → 7 distinct 3-gram shingles each.
    // d1 vs d2: identical → J = 1. d1 vs d3: differ in token 5 ("jumps"/
    // "runs") → 3 shingles containing position 5 differ on each side:
    // |A∩B| = 4, |A∪B| = 10 → J = 0.4.
    val strict = Dedup.jaccardPairs(docs, n = 3, threshold = 0.5).collect()
    assert(strict.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(strict.head.getAs[Double]("jaccard") == 1.0)
    val loose = Dedup.jaccardPairs(docs, n = 3, threshold = 0.35).collect()
    assert(loose.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(loose.find(r => r.getLong(0) == 1L && r.getLong(1) == 3L)
      .get.getAs[Double]("jaccard") == 0.4)
  }

  test("dupSpans: longest consecutive duplicated-gram run per doc") {
    val out = Dedup.dupSpans(docs, n = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_dup_grams"),
          r.getAs[Long]("max_run"))).toMap
    // d1 ≡ d2: all 7 grams shared → one run of 7
    assert(out(1L) == ((7L, 7L, 7L)))
    assert(out(2L) == ((7L, 7L, 7L)))
    // d3 differs at token 5: grams 1-2 and 6-7 shared (two runs of 2)
    assert(out(3L) == ((7L, 4L, 2L)))
    // d4 disjoint: 7 tokens → 5 grams, none shared
    assert(out(4L) == ((5L, 0L, 0L)))
  }

  test("minhashEstQuality: identical docs estimate J=1 exactly; bound verdict") {
    val r = Dedup.minhashEstQuality(docs, n = 3, numHashes = 24, threshold = 0.5)
      .collect().head
    // only (1,2) clears 0.5, identical shingle sets → identical
    // signatures → est = 1 = J, zero error
    assert(r.getAs[Long]("n_pairs") == 1L)
    assert(r.getAs[Boolean]("mean_err_ok"))
    // at threshold 0.35 the (1,3)/(2,3) pairs at J=0.4 join the set:
    // a 24-hash estimator must still land within the 0.2 bound
    val loose = Dedup.minhashEstQuality(docs, n = 3, numHashes = 24, threshold = 0.35)
      .collect().head
    assert(loose.getAs[Long]("n_pairs") == 3L)
    assert(loose.getAs[Boolean]("mean_err_ok"))
  }

  test("jaccard maxDocFreq cap drops only pairs connected through hot shingles") {
    // "the quick brown"-family shingles appear in 3 docs; with cap 2
    // those shingles vanish from the index, but d1/d2 still share
    // their full shingle sets → identical pairs survive via the rest
    val capped = Dedup.jaccardPairs(docs, n = 3, threshold = 0.5, maxDocFreq = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)))
    // n_common shrinks (hot shingles excluded) but the exact-dup pair
    // still clears the threshold through its unique-enough shingles
  }

  test("minhash LSH: identical docs always collide; verified jaccard is exact") {
    val pairs = Dedup.minhashLsh(docs, n = 3, numHashes = 12, bands = 4, threshold = 0.5)
      .collect()
    // identical signature → identical band keys → candidate; J=1 ≥ 0.5
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).contains((1L, 2L)))
    // verification step keeps no false positives below the threshold
    assert(pairs.forall(_.getAs[Double]("jaccard") >= 0.5))
  }

  test("minhash LSH candidates never exceed exact-jaccard matches (no FPs after verify)") {
    val lsh = Dedup.minhashLsh(docs, 3, 12, 4, 0.35)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.jaccardPairs(docs, 3, 0.35)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
  }

  test("simhash: identical docs get identical signatures; near-dup pair found") {
    val sigs = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs.values.forall(s => s >= 0 && s <= 0xFFFFFFFFL))
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.contains((1L, 2L, 0)))
    // pigeonhole blocking guarantee: every emitted pair respects the cap
    assert(pairs.forall(_._3 <= 3))
  }

  test("dupNgramRate: copies rate 1.0, partial overlap in (0,1), unique 0.0") {
    val out = Dedup.dupNgramRate(docs, n = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_sh"), r.getAs[Long]("n_dup"), r.getAs[Double]("dup_rate")))
      .toMap
    // d1 ≡ d2: every shingle shared → rate exactly 1.0
    assert(out(1L)._3 == 1.0 && out(2L)._3 == 1.0)
    // d3 shares some but not all of d1's shingles
    assert(out(3L)._2 > 0 && out(3L)._2 < out(3L)._1)
    assert(out(3L)._3 == out(3L)._2.toDouble / out(3L)._1.toDouble)
    // d4 is disjoint → nothing shared
    assert(out(4L) == ((out(4L)._1, 0L, 0.0)))
  }

  test("sourceOverlap rolls pairs up by normalized source pair") {
    // (1,2) j=1.0 crosses a|b; (5,6) j=1.0 within c; d1~d3 share 4 of
    // their 7+7 trigrams (one changed middle word kills 3): j = 4/10 =
    // 0.4, crossing a|c and b|c at threshold 0.4.
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "a"),
      (2L, "the quick brown fox jumps over the lazy dog", "b"),
      (3L, "the quick brown fox runs over the lazy dog", "c"),
      (4L, "completely different words in this sentence here", "a"),
      (5L, "another shared body of text right here now", "c"),
      (6L, "another shared body of text right here now", "c")
    ).toDF("doc_id", "text", "source")
    val r = Dedup.sourceOverlap(d, n = 3, threshold = 0.4).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq
    // pairs: (1,2) a|b, (1,3) a|c, (2,3) b|c, (5,6) c|c
    assert(r == Seq(("a", "b", 1L), ("a", "c", 1L), ("b", "c", 1L), ("c", "c", 1L)))
    val ac = Dedup.sourceOverlap(d, n = 3, threshold = 0.4).collect()
      .find(x => x.getString(0) == "a" && x.getString(1) == "c").get
    assert(ac.getAs[Double]("min_jaccard") == 0.4 &&
      ac.getAs[Double]("max_jaccard") == 0.4)
  }

  test("containmentPairs flags subset copies that jaccard misses") {
    // d2 = d1 quoted whole inside a longer host: every one of d1's 4
    // trigrams appears in d2 → cont_a = 1.0, while J = 4/12 = 1/3 is
    // far below any dedup threshold.
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "intro words here alpha beta gamma delta epsilon zeta and a long tail of extra"),
      (3L, "completely unrelated text with different words")
    ).toDF("doc_id", "text")
    val r = Dedup.containmentPairs(d, n = 3, minContainment = 0.8).collect()
    assert(r.length == 1)
    val p = r.head
    assert(p.getAs[Long]("doc_a") == 1L && p.getAs[Long]("doc_b") == 2L)
    assert(p.getAs[Double]("cont_a") == 1.0)
    assert(p.getAs[Double]("cont_b") < 0.5)
    // and the same pair is invisible to jaccard at the same bar
    assert(Dedup.jaccardPairs(d, n = 3, threshold = 0.8).count() == 0L)
  }

  test("containmentPairs honors the shared maxDocFreq cap") {
    // the "the quick brown..." family shingles have df 3; cap 2 drops
    // them from the shared index, but the identical d1/d2 pair still
    // scores containment 1.0 through its surviving shingles — the
    // same capped-space semantics the jaccard path pins
    val capped = Dedup.containmentPairs(docs, n = 3, minContainment = 0.8,
        maxDocFreq = Some(2L)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L)))
    val full = Dedup.containmentPairs(docs, n = 3, minContainment = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == Set((1L, 2L)))
  }

  test("jaccardHistogram bands partition the candidate pair set") {
    val h = Dedup.jaccardHistogram(docs, n = 3, lo = 0.2, step = 0.1).collect()
    // every band row is well-formed and counts are positive
    h.foreach { r =>
      val band = r.getAs[Int]("band")
      assert(band >= 0 && band <= 7)
      assert(r.getAs[Double]("band_lo") == 0.2 + band * 0.1)
      assert(r.getAs[Long]("n_pairs") > 0L)
    }
    // total mass = the pair count at the histogram's lo threshold
    val total = h.map(_.getAs[Long]("n_pairs")).sum
    val pairs = Dedup.jaccardPairs(docs, n = 3, threshold = 0.2).count()
    assert(total == pairs)
    // the exact d1≡d2 pair lands in the top band (j = 1.0 → band 7)
    assert(h.exists(r => r.getAs[Int]("band") == 7 && r.getAs[Long]("n_pairs") >= 1L))
  }

  test("deltaPairsCapped == capped whole-corpus jaccard restricted to delta pairs") {
    // every doc shares the "shared boilerplate phrase one" prefix
    // (df = 4 > cap = 3 → its shingles are hot and dropped); docs 1/2
    // also share a rare tail, doc 10 (delta) copies doc 1 verbatim,
    // doc 11 (delta) shares ONLY the boilerplate
    val all = Seq(
      (1L, "shared boilerplate phrase one alpha beta gamma delta"),
      (2L, "shared boilerplate phrase one alpha beta gamma delta"),
      (3L, "shared boilerplate phrase one epsilon zeta eta theta"),
      (10L, "shared boilerplate phrase one alpha beta gamma delta"),
      (11L, "shared boilerplate phrase one iota kappa lambda mu")
    ).toDF("doc_id", "text")
    val corpus = all.filter("doc_id < 10")
    val delta = all.filter("doc_id >= 10")
    val hot = Dedup.hotShingles(all, n = 3, cap = 3L)
    assert(hot.count() > 0) // the boilerplate really is hot
    val got = Dedup.deltaPairsCapped(delta,
        Dedup.shingleIndexCapped(corpus, 3, hot), hot, n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // ground truth: whole-corpus capped jaccard, restricted to pairs
    // with at least one delta member (df for the cap computed over the
    // same full doc set the hot list used)
    val truth = Dedup.jaccardPairs(all, n = 3, threshold = 0.5,
        maxDocFreq = Some(3L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      .filter(p => p._1 >= 10L || p._2 >= 10L).toSet
    assert(got == truth)
    // the verbatim copy survives in capped space; the boilerplate-only
    // neighbor does not (its every shared shingle was hot)
    assert(got.exists { case (a, b, _) => (a, b) == (1L, 10L) || (a, b) == (2L, 10L) })
    assert(!got.exists { case (a, b, _) => a == 11L || b == 11L })
  }

  test("vocabGroupedAgg: domain groups are value-identical to the single pass") {
    // force the grouped path with a 1-byte budget (instances * 24 / 1
    // caps at 64 groups), then compare against the untouched single
    // pass — hot list AND histogram must match exactly, since each
    // shingle's postings land wholly in one pmod group
    val single = Dedup.hotShingles(docs, n = 2, cap = 2L)
      .collect().map(_.getLong(0)).sorted.toSeq
    val singleHist = Dedup.shingleDfHistogram(docs, n = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    spark.conf.set("graft.vocab.scratchBudgetBytes", "1")
    try {
      val grouped = Dedup.hotShingles(docs, n = 2, cap = 2L)
        .collect().map(_.getLong(0)).sorted.toSeq
      val groupedHist = Dedup.shingleDfHistogram(docs, n = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(grouped == single)
      assert(groupedHist == singleHist)
      assert(single.nonEmpty || singleHist.nonEmpty) // not vacuous
      // the two-exchange caller: per-doc dup counts must SUM across
      // domain groups back to the single-pass values
      val groupedRate = Dedup.dupNgramRate(docs, n = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      // the positional caller: per-group flag sets are disjoint and
      // must union back to the single-pass spans exactly
      val groupedSpans = Dedup.dupSpans(docs, n = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      // minhashLsh's cache-LEAN dispatch (candidate-only shingle
      // recompute) must emit the cached plan's exact pair set
      val leanPairs = Dedup.minhashLsh(docs, n = 2, threshold = 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      spark.conf.unset("graft.vocab.scratchBudgetBytes")
      val singleRate = Dedup.dupNgramRate(docs, n = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val singleSpans = Dedup.dupSpans(docs, n = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      val cachedPairs = Dedup.minhashLsh(docs, n = 2, threshold = 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(groupedRate == singleRate)
      assert(singleRate.exists(_._3 > 0L)) // not vacuous
      assert(groupedSpans == singleSpans)
      assert(singleSpans.exists(_._4 > 0L)) // a real run, not all zeros
      assert(leanPairs == cachedPairs)
      assert(cachedPairs.nonEmpty) // not vacuous
    } finally spark.conf.unset("graft.vocab.scratchBudgetBytes")
  }

  test("vocabGroupCount: ceiling clamps, is conf-raisable, and sizing " +
      "honors the positional/string posting models") {
    try {
      spark.conf.set("graft.vocab.scratchBudgetBytes", "1")
      // a 1-byte budget needs instances*48 groups — far past the
      // default ceiling of 64: the clamp must engage (and warn), never
      // return an unbounded group count
      assert(Dedup.vocabGroupCount(docs, n = 2) == 64)
      // the ceiling is an explicit operator decision, not a constant
      spark.conf.set("graft.vocab.maxGroups", "128")
      assert(Dedup.vocabGroupCount(docs, n = 2) == 128)
      spark.conf.set("graft.vocab.maxGroups", s"${Long.MaxValue}")
      val unclamped = Dedup.vocabGroupCount(docs, n = 2)
      assert(unclamped > 128)
      // positional (non-distinct) streams count every gram INSTANCE —
      // on repetitive text that exceeds the distinct-set model
      val repetitive = spark.createDataFrame(Seq(
        (1L, Seq.fill(30)("aa bb").mkString(" ")))).toDF("doc_id", "text")
      val distinctGroups = Dedup.vocabGroupCount(repetitive, n = 2)
      val positionalGroups = Dedup.vocabGroupCount(repetitive, n = 2, distinct = false)
      assert(positionalGroups > distinctGroups)
      // string-carrying callers size with a larger bytes-per-posting
      assert(Dedup.vocabGroupCount(docs, n = 2, bytesPerPosting = 96L) >
        Dedup.vocabGroupCount(docs, n = 2))
    } finally {
      spark.conf.unset("graft.vocab.scratchBudgetBytes")
      spark.conf.unset("graft.vocab.maxGroups")
    }
  }

  test("dispatch memo: a corpus OVERWRITTEN at the same path re-measures " +
      "(InMemoryFileIndex.equals compares only rootPaths)") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-memostale").toString
    try {
      spark.conf.set("graft.vocab.scratchBudgetBytes", "1")
      // uncapped so the group count is the raw sizing (both corpora
      // would otherwise clamp to the same ceiling)
      spark.conf.set("graft.vocab.maxGroups", s"${Long.MaxValue}")
      docs.limit(2).write.mode("overwrite").parquet(dir)
      val smallGroups =
        Dedup.vocabGroupCount(spark.read.parquet(dir), n = 2)
      // grow the corpus IN PLACE — same rootPath, so the re-read's
      // canonicalized plan is sameResult with the old one; only the
      // listing fingerprint in the memo key separates them
      docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 1000L))
        .write.mode("overwrite").parquet(dir)
      val grownGroups =
        Dedup.vocabGroupCount(spark.read.parquet(dir), n = 2)
      assert(grownGroups > smallGroups,
        s"stale memo: grown corpus sized at $grownGroups vs small $smallGroups")
    } finally {
      spark.conf.unset("graft.vocab.scratchBudgetBytes")
      spark.conf.unset("graft.vocab.maxGroups")
      graft.fs.SnapshotDir.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }
}
