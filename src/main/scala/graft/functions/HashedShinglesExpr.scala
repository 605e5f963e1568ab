package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The hot loop behind [[HashedShinglesExpr]], in a plain static-style
  * object so both the interpreted eval and the generated code call the
  * same audited implementation.
  *
  * Key identity that makes this allocation-free: `split(text, ' ')`
  * partitions the text at single-space separators, so joining any n
  * CONSECUTIVE tokens back with single spaces reproduces the original
  * byte span from the first token's start to the last token's end
  * VERBATIM (runs of spaces become empty tokens whose re-join restores
  * every separator). The HOF formulation
  * `array_distinct(transform(sequence(1, greatest(size(toks)-n+1, 1)),
  *   i -> xxhash64(array_join(slice(toks, i, n), ' '))))`
  * therefore equals: xxhash64 over sliding byte SPANS of the raw
  * UTF8String — no token array, no per-gram string assembly, no boxed
  * longs. Seed 42 is Spark's `xxhash64(...)` default, so values are
  * bit-identical to the HOF form (and to the DuckDB oracle's spaces,
  * which mirror the HOF SQL).
  */
object HashedShingles {

  /** xxhash64 values of the n-gram spans of `s` as packed long array
    * data — distinct in first-occurrence order (array_distinct's
    * order) when `distinct`, else one value per gram position (the tf/
    * positional form: posexplode over it yields (pos, gram_hash)
    * exactly like posexplode over the HOF transform array). */
  def compute(s: UTF8String, n: Int, distinct: Boolean): UnsafeArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    // token starts: 0 and every byte-after-a-space (0x20 never occurs
    // inside a UTF-8 multibyte sequence, so a byte scan is exact)
    var numToks = 1
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') numToks += 1
      i += 1
    }
    val starts = new Array[Int](numToks)
    var t = 1
    i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') {
        starts(t) = i + 1; t += 1
      }
      i += 1
    }
    // gram g (0-based) spans [starts(g), end(g+n-1)) where end(j) is
    // the next token's start minus the separator (or len for the last
    // token); when the doc has < n tokens the single gram is the whole
    // text — both exactly the HOF slice/greatest semantics
    val nGrams = math.max(numToks - n + 1, 1)
    // open-addressed distinct set (grams are ~tokens per doc — tiny);
    // unused in the positional form. Target size in Long arithmetic:
    // nGrams*2 overflows Int past 2^30 grams (the probe loop would
    // then spin on a 4-slot table); docs that large already exceed
    // the per-row array ceiling, so clamp the target at 2^30.
    var cap = 4
    val capTarget = math.min(nGrams.toLong * 2, 1L << 30)
    while (cap < capTarget) cap <<= 1
    val table = if (distinct) new Array[Long](cap) else null
    val used = if (distinct) new Array[Boolean](cap) else null
    val out = new Array[Long](nGrams)
    var m = 0
    var g = 0
    while (g < nGrams) {
      val start = starts(g)
      val lastTok = math.min(g + n - 1, numToks - 1)
      val end = if (lastTok + 1 < numToks) starts(lastTok + 1) - 1 else len
      val h = XXH64.hashUnsafeBytes(base, off + start, end - start, 42L)
      if (distinct) {
        var idx = (h ^ (h >>> 32)).toInt & (cap - 1)
        while (used(idx) && table(idx) != h) idx = (idx + 1) & (cap - 1)
        if (!used(idx)) {
          used(idx) = true; table(idx) = h
          out(m) = h; m += 1
        }
      } else {
        out(m) = h; m += 1
      }
      g += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (m == nGrams) out else java.util.Arrays.copyOf(out, m))
  }

  /** Per-document gram-hash FREQUENCIES: the positional form of
    * [[compute]] folded through a count — `(hash, tf)` per distinct
    * gram hash, in first-occurrence order. Counting is BY HASH,
    * exactly like the `groupBy(hashed gram)` aggregate it replaces
    * (same collision caveat), so values are identical to
    * explode(positional) → groupBy → count while the per-document
    * work never leaves the row. */
  def computeFreqs(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    var numToks = 1
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') numToks += 1
      i += 1
    }
    val starts = new Array[Int](numToks)
    var t = 1
    i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') {
        starts(t) = i + 1; t += 1
      }
      i += 1
    }
    val nGrams = math.max(numToks - n + 1, 1)
    var cap = 4
    val capTarget = math.min(nGrams.toLong * 2, 1L << 30) // Long math: see compute()
    while (cap < capTarget) cap <<= 1
    val slot = new Array[Int](cap)
    java.util.Arrays.fill(slot, -1)
    val dHash = new Array[Long](nGrams)
    val dCount = new Array[Long](nGrams)
    var m = 0
    var g = 0
    while (g < nGrams) {
      val start = starts(g)
      val lastTok = math.min(g + n - 1, numToks - 1)
      val end = if (lastTok + 1 < numToks) starts(lastTok + 1) - 1 else len
      val h = XXH64.hashUnsafeBytes(base, off + start, end - start, 42L)
      var idx = (h ^ (h >>> 32)).toInt & (cap - 1)
      var found = -1
      while (found < 0 && slot(idx) >= 0) {
        if (dHash(slot(idx)) == h) found = slot(idx)
        else idx = (idx + 1) & (cap - 1)
      }
      if (found >= 0) dCount(found) += 1
      else {
        slot(idx) = m
        dHash(m) = h; dCount(m) = 1
        m += 1
      }
      g += 1
    }
    val out = new Array[Any](m)
    var d = 0
    while (d < m) {
      out(d) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](dHash(d), dCount(d)))
      d += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `graft_hashed_ngram_freqs(text, n)`: per-document positional
  * gram-hash frequencies as `array<struct<gram_h:long, tf:long>>` —
  * the native form of `posexplode(hashed positional grams) → groupBy
  * (doc_id, gram_h) → count`, computed in-row so the (doc, gram)
  * shuffle disappears (term frequency is a per-document property).
  * The df branch explodes `tfs.gram_h` alone; consumers that need a
  * postings relation explode the array in-stage. */
case class HashedNgramFreqsExpr(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"gram order must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string document, got $t")
  }
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("gram_h", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("tf", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_hashed_ngram_freqs"

  override def nullSafeEval(input: Any): Any =
    HashedShingles.computeFreqs(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.HashedShingles.computeFreqs($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): HashedNgramFreqsExpr =
    copy(child = newChild)
}

/** `graft_hashed_shingles(text, n)`: the distinct xxhash64-hashed
  * word n-gram set of a document as `array<bigint>` — the native
  * form of [[graft.operators.Dedup.withHashedShingles]]'s HOF
  * pipeline (split → transform → array_join → xxhash64 →
  * array_distinct), value-identical (see [[HashedShingles]]) but one
  * allocation-free pass over the raw bytes. The HOF chain is
  * interpreted per-element (higher-order functions don't codegen
  * their lambdas) and measured ~2.6× slower at sf1 — and shingling
  * is the CPU-dominant stage of every inverted-index dedup operator,
  * so this expression is the single biggest constant-factor lever in
  * the dedup family. */
case class HashedShinglesExpr(child: Expression, n: Int,
    distinct: Boolean = true) extends UnaryExpression {

  require(n >= 1, s"shingle order must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string document, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hashed_shingles"

  override def nullSafeEval(input: Any): Any =
    HashedShingles.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.HashedShingles.compute($s, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): HashedShinglesExpr =
    copy(child = newChild)
}
