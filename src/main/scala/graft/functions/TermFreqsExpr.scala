package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The hot loop behind [[TermFreqsExpr]], shared by the interpreted
  * eval and the generated code (the [[HashedShingles]] static-call
  * pattern).
  *
  * Tokens are the byte spans between single-space separators — the
  * exact `split(text, ' ')` partition (runs of spaces yield empty
  * tokens, like the HOF chain every text operator in this repo
  * tokenizes with; ASCII 0x20 never occurs inside a UTF-8 multibyte
  * sequence, so the byte scan is exact). Counting is by TRUE byte
  * equality (an open-addressed map keyed on the span hash with a
  * byte-compare on probe), so colliding xxhash64 values cannot merge
  * two distinct terms — stricter than the groupBy-on-hash form this
  * replaces, and exactly what the string-keyed oracle computes.
  * `term_h` is `xxhash64(term)` (seed 42, Spark's default) so
  * downstream joins stay on 8-byte keys.
  */
object TermFreqs {

  /** Per-document term frequencies of `s` in first-occurrence order
    * as `array<struct<term_h:long, term:string, tf:long>>`. */
  def compute(s: UTF8String): GenericArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    // token starts: 0 and every byte-after-a-space
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
    // open-addressed map: slot -> index into the (start, end, hash,
    // count) parallel arrays of first-seen distinct terms
    var cap = 4
    // Long arithmetic: numToks*2 overflows Int past 2^30 tokens, which
    // would leave the probe loop spinning on a 4-slot table; docs that
    // large already exceed the per-row array ceiling, so clamp at 2^30.
    val capTarget = math.min(numToks.toLong * 2, 1L << 30)
    while (cap < capTarget) cap <<= 1
    val slot = new Array[Int](cap)
    java.util.Arrays.fill(slot, -1)
    val dStart = new Array[Int](numToks)
    val dEnd = new Array[Int](numToks)
    val dHash = new Array[Long](numToks)
    val dCount = new Array[Long](numToks)
    var m = 0
    var g = 0
    while (g < numToks) {
      val start = starts(g)
      val end = if (g + 1 < numToks) starts(g + 1) - 1 else len
      val h = XXH64.hashUnsafeBytes(base, off + start, end - start, 42L)
      var idx = (h ^ (h >>> 32)).toInt & (cap - 1)
      var found = -1
      while (found < 0 && slot(idx) >= 0) {
        val d = slot(idx)
        // hash equality then byte equality: collisions cannot merge terms
        if (dHash(d) == h && dEnd(d) - dStart(d) == end - start) {
          var j = 0
          val n = end - start
          var eq = true
          while (eq && j < n) {
            if (org.apache.spark.unsafe.Platform.getByte(base, off + dStart(d) + j)
                != org.apache.spark.unsafe.Platform.getByte(base, off + start + j)) eq = false
            j += 1
          }
          if (eq) found = d
        }
        if (found < 0) idx = (idx + 1) & (cap - 1)
      }
      if (found >= 0) dCount(found) += 1
      else {
        slot(idx) = m
        dStart(m) = start; dEnd(m) = end; dHash(m) = h; dCount(m) = 1
        m += 1
      }
      g += 1
    }
    val out = new Array[Any](m)
    var d = 0
    while (d < m) {
      val bytes = new Array[Byte](dEnd(d) - dStart(d))
      org.apache.spark.unsafe.Platform.copyMemory(
        base, off + dStart(d), bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        bytes.length)
      out(d) = new GenericInternalRow(
        Array[Any](dHash(d), UTF8String.fromBytes(bytes), dCount(d)))
      d += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_term_freqs(text)`: per-document term frequencies as one
  * array — the native form of `explode(split(text,' ')) → groupBy
  * (doc_id, term) → count`, computed in-row so the (doc, term)
  * SHUFFLE the groupBy needs disappears entirely (tf is a
  * per-document property; nothing about it requires an exchange).
  * Consumers explode the array where they need a postings relation —
  * that explode pipelines inside the same stage — and the df branch
  * can explode `tfs.term_h` alone, so term STRINGS never reach the
  * document-frequency aggregate's exchange. */
case class TermFreqsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string document, got $t")
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term_h", LongType, nullable = false),
      StructField("term", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_term_freqs"

  override def nullSafeEval(input: Any): Any =
    TermFreqs.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TermFreqs.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): TermFreqsExpr =
    copy(child = newChild)
}
