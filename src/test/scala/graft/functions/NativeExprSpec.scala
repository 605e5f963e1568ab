package graft.functions

import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native expressions must be value-identical to the portable HOF
  * formulations they replace (which are also the DuckDB oracle's
  * formulations) — checked here on adversarial-ish inputs. */
class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  private def nat(c: org.apache.spark.sql.Column) = c
  private def colOf(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    GraftSqlBridge.column(e)

  test("DotProductExpr == aggregate(zip_with(...)) left fold, bit-identical") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((Array.fill(64)(rnd.nextDouble() * 2 - 1),
      Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val native = colOf(DotProductExpr(
      GraftSqlBridge.expression(col("a")), GraftSqlBridge.expression(col("b"))))
    val diffs = df.select((hof === native).as("eq")).collect()
    assert(diffs.forall(_.getBoolean(0)))
  }

  test("DotProductExpr: mismatched lengths and null elements yield NULL like the HOF") {
    val df = Seq((Seq(1.0), Seq(1.0, 2.0))).toDF("a", "b") // length mismatch
    val native = colOf(DotProductExpr(
      GraftSqlBridge.expression(col("a")), GraftSqlBridge.expression(col("b"))))
    val r = df.select(native.as("d")).collect()
    assert(r(0).isNullAt(0)) // mismatch → NULL, not a truncated dot
    // null-element case via SQL literal arrays
    org.apache.spark.sql.GraftSqlBridge.registerGraftFunctions(spark)
    val withNull = spark.sql(
      "SELECT graft_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS d")
      .collect().head
    assert(withNull.isNullAt(0))
  }

  test("SimHashExpr tolerates null and short elements like the HOF") {
    org.apache.spark.sql.GraftSqlBridge.registerGraftFunctions(spark)
    // short string: chars past the end vote 0 (substring → '' < '8')
    val hofShort = spark.sql(
      """SELECT aggregate(sequence(0, 31), 0L, (acc, j) ->
        |  acc + CASE WHEN size(filter(array('abc'), h -> substring(h, j+1, 1) >= '8')) * 2
        |             >= 1 THEN shiftleft(1L, j) ELSE 0L END) AS s""".stripMargin)
      .collect().head.getLong(0)
    val nativeShort = spark.sql("SELECT graft_simhash(array('abc')) AS s")
      .collect().head.getLong(0)
    assert(nativeShort == hofShort)
    // null element: no votes cast, still in the denominator — no NPE
    val r = spark.sql(
      "SELECT graft_simhash(array(md5('x'), CAST(NULL AS STRING))) AS s").collect().head
    assert(!r.isNullAt(0))
    // null shingle in minhashes: skipped like array_min skips nulls
    val mh = spark.sql(
      "SELECT graft_minhashes(array('x', CAST(NULL AS STRING)), 2) AS m").collect().head
    assert(!mh.isNullAt(0))
  }

  test("SimHashExpr == 32 filter/substring passes") {
    val docs = Seq("the quick brown fox", "a", "x y z x y z", "einzelnes wort hier")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .withColumn("tokmd5", expr("transform(split(text, ' '), t -> md5(t))"))
    val hof = (0 until 32).map { j =>
      when(size(expr(s"filter(tokmd5, h -> substring(h, ${j + 1}, 1) >= '8')")) * 2
          >= size(col("tokmd5")), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val native = colOf(SimHashExpr(GraftSqlBridge.expression(col("tokmd5"))))
    assert(docs.select((hof === native).as("eq")).collect().forall(_.getBoolean(0)))
  }

  test("MinHashesExpr == per-i array_min(transform(md5(i| + s)))") {
    val df = Seq(
      Seq("apple pie", "banana", "cherry tart"),
      Seq("solo"),
      Seq("z", "zz", "zzz", "a b c")
    ).zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "shingles")
    val k = 12
    val native = colOf(MinHashesExpr(GraftSqlBridge.expression(col("shingles")), k))
    val hofCols = (0 until k).map(i =>
      array_min(transform(col("shingles"), s => md5(concat(lit(s"$i|"), s)))))
    val eq = (0 until k).map(i => native(i) === hofCols(i)).reduce(_ && _)
    assert(df.select(eq.as("eq")).collect().forall(_.getBoolean(0)))
  }

  test("HyperplaneKeysExpr == per-table keyColOf HOF columns, bit-identical") {
    import graft.operators.LshPlanes
    val rnd = new scala.util.Random(13)
    val rows = Seq.fill(80)(Array.fill(64)(rnd.nextFloat() * 2 - 1)) :+
      Array.fill(64)(0.0f) // all-zero vector: every dot is exactly 0 ⇒ all '1'
    val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "emb")
    for ((tables, bits) <- Seq((4, 5), (7, 3))) {
      val planes = LshPlanes.planesFor(tables, bits, seed = 977L)
      val native = colOf(HyperplaneKeysExpr(
        GraftSqlBridge.expression(col("emb")), planes))
      val hof = (0 until tables).map(t =>
        LshPlanes.keyColOf(VectorOps.toDouble(col("emb")), planes(t)))
      val eq = (0 until tables).map(t => native(t) === hof(t)).reduce(_ && _)
      assert(df.select(eq.as("eq")).collect().forall(_.getBoolean(0)),
        s"key divergence at tables=$tables bits=$bits")
    }
    // null element / wrong length / NULL ARRAY ⇒ every bit '0', like
    // null dots in the HOF (a null array must keep its all-'0' keys,
    // not vanish from bucketing — UnaryExpression's default null
    // propagation would silently drop the row)
    val weird = Seq(
      (1L, Some(Seq[Option[Float]](Some(1f), None))),    // null element
      (2L, Some(Seq[Option[Float]](Some(1f), Some(2f)))),// length 2 ≠ 64
      (3L, None)                                         // null array
    ).toDF("id", "emb")
    val p1 = LshPlanes.planesFor(2, 3, seed = 977L)
    val out = weird.select(colOf(HyperplaneKeysExpr(
      GraftSqlBridge.expression(col("emb")), p1)).as("k")).collect()
    assert(out.length == 3)
    assert(out.forall(r => !r.isNullAt(0) && r.getSeq[String](0).forall(_ == "000")))
  }

  test("WinnowMinExpr == array_min over md5 of all 5-grams, incl. short strings") {
    val df = Seq("abcd", "a", "hello world this is long enough", "ééé unicode ça va")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val hof = expr(
      "array_min(transform(sequence(1, greatest(length(text)-4, 1)), i -> md5(substr(text, i, 5))))")
    val native = colOf(WinnowMinExpr(GraftSqlBridge.expression(col("text")), 5))
    assert(df.select((hof === native).as("eq")).collect().forall(_.getBoolean(0)))
  }

  test("TokenRunStatsExpr == three regexp_extract_all counts") {
    // adversarial shapes: empty, all-space, runs at both ends, digit/
    // alpha adjacency, uppercase + punctuation (each its own piece),
    // BMP multibyte (2–3 UTF-8 bytes), supplementary plane (4 bytes —
    // one codepoint, one piece), plus a seeded fuzz sweep
    val fixed = Seq(
      "", "   ", "abc", "abc def", "a1b2c3", "123 456", "0a0a0",
      "Hello, World!", "..!!..", "a.b,c;d", "ées çava 漢字テスト",
      "emoji 😀😀 pair", "trailing space ",
      " leading", "UPPER lower 123mix", "a", "9", ".", "é")
    val rnd = new scala.util.Random(41)
    val alphabet = "abz019 AZ.,!é漢😀"
    // build from code points so surrogate pairs stay well-formed
    val cps = alphabet.codePoints().toArray
    val fuzzStrs = Seq.fill(120) {
      val sb = new java.lang.StringBuilder
      (0 until rnd.nextInt(60)).foreach(_ => sb.appendCodePoint(cps(rnd.nextInt(cps.length))))
      sb.toString
    }
    val df = (fixed ++ fuzzStrs).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val native = graft.operators.TextAnalysis.regexTokenStats(df)
    val regex = graft.operators.TextAnalysis.regexTokenStatsRegex(df)
    val n = native.collect(); val r = regex.collect()
    assert(n.length == r.length)
    n.zip(r).foreach { case (a, b) => assert(a == b, s"mismatch: native=$a regex=$b") }
    // null text → null struct fields propagate like the regex form
    val nl = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
    val nn = graft.operators.TextAnalysis.regexTokenStats(nl).collect().head
    assert(nn.isNullAt(1) && nn.isNullAt(2) && nn.isNullAt(3))
  }

  test("TermFreqsExpr == explode/groupBy term counting, incl. hashes") {
    // token shapes: empty tokens from space runs, leading/trailing
    // spaces, repeats (tf > 1), unicode, single token, empty string
    val texts = Seq(
      "aa bb aa cc aa bb", "aa  bb   aa", " x y x ", "solo", "",
      "ééé 漢字 ééé", "a a a a a a a a", "tab\ttoken stays whole")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val native = df.select(col("doc_id"), colOf(graft.functions.TermFreqsExpr(
        GraftSqlBridge.expression(col("text")))).as("tfs"))
      .select(col("doc_id"), explode(col("tfs")).as("p"))
      .select(col("doc_id"), col("p.term_h"), col("p.term"), col("p.tf"))
      .orderBy("doc_id", "term")
    val hof = df.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .select(col("doc_id"), xxhash64(col("term")).as("term_h"), col("term"), col("tf"))
      .orderBy("doc_id", "term")
    val n = native.collect(); val h = hof.collect()
    assert(n.length == h.length, s"row counts: native=${n.length} hof=${h.length}")
    n.zip(h).foreach { case (a, b) => assert(a == b, s"mismatch: native=$a hof=$b") }
    // null text → null array (explode drops the doc, like the HOF)
    val nl = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
      .select(colOf(graft.functions.TermFreqsExpr(
        GraftSqlBridge.expression(col("text"))))).collect()
    assert(nl.head.isNullAt(0))
  }

  test("HashedNgramFreqsExpr == posexplode(positional hashes)/groupBy counting") {
    val texts = Seq(
      "aa bb aa cc aa bb", "aa  bb   aa", " x y x ", "solo", "",
      "dup dup dup dup", "ééé 漢字 ééé mixed", "a b")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for (n <- Seq(1, 2, 3)) {
      val native = df.select(col("doc_id"), colOf(graft.functions.HashedNgramFreqsExpr(
          GraftSqlBridge.expression(col("text")), n)).as("tfs"))
        .select(col("doc_id"), explode(col("tfs")).as("p"))
        .select(col("doc_id"), col("p.gram_h").as("term"), col("p.tf"))
        .orderBy("doc_id", "term")
      val hof = df.select(col("doc_id"), explode(colOf(HashedShinglesExpr(
          GraftSqlBridge.expression(col("text")), n, distinct = false))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .orderBy("doc_id", "term")
      val a = native.collect(); val b = hof.collect()
      assert(a.length == b.length, s"n=$n row counts: native=${a.length} hof=${b.length}")
      a.zip(b).foreach { case (x, y) => assert(x == y, s"n=$n mismatch: native=$x hof=$y") }
    }
    // null text → null array
    val nl = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
      .select(colOf(graft.functions.HashedNgramFreqsExpr(
        GraftSqlBridge.expression(col("text")), 2))).collect()
    assert(nl.head.isNullAt(0))
  }

  test("HashedShinglesExpr == split/transform/array_join/xxhash64/array_distinct chain") {
    // adversarial token shapes: runs of spaces (empty tokens), leading/
    // trailing spaces, < n tokens, exactly n, repeated grams (distinct
    // path), unicode multibyte, empty string
    val texts = Seq(
      "aa bb cc dd ee",
      "aa  bb   cc", // empty tokens from space runs
      " leading and trailing ",
      "short",
      "one two three",
      "dup dup dup dup dup dup", // repeated grams → distinct collapses
      "ééé ünï ços デダップ 漢字 mixed",
      "",
      "a b", "tab\tis one token here ok")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    for (n <- Seq(1, 2, 3, 5)) {
      val hof = expr(
        s"array_distinct(transform(sequence(1, greatest(size(split(text, ' ')) - ${n - 1}, 1)), " +
          s"i -> xxhash64(array_join(slice(split(text, ' '), i, $n), ' '))))")
      val native = colOf(HashedShinglesExpr(GraftSqlBridge.expression(col("text")), n))
      val rows = df.select(hof.as("h"), native.as("nv")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"n=$n mismatch: hof=${r.getSeq[Long](0)} native=${r.getSeq[Long](1)}")
      }
    }
    // null text → null array, matching the HOF's null propagation
    val nl = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
      .select(colOf(HashedShinglesExpr(GraftSqlBridge.expression(col("text")), 3)))
      .collect()
    assert(nl.head.isNullAt(0))
    // positional (distinct=false) form == the raw transform array
    // (repeated grams KEPT, one hash per position)
    for (n <- Seq(1, 3)) {
      val hofAll = expr(
        s"transform(sequence(1, greatest(size(split(text, ' ')) - ${n - 1}, 1)), " +
          s"i -> xxhash64(array_join(slice(split(text, ' '), i, $n), ' ')))")
      val nativeAll = colOf(HashedShinglesExpr(
        GraftSqlBridge.expression(col("text")), n, distinct = false))
      val rows = df.select(hofAll.as("h"), nativeAll.as("nv")).collect()
      rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"positional n=$n mismatch"))
    }
  }
}
