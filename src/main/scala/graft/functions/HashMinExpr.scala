package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared md5 helpers for the min-hash-style native expressions.
  *
  * Key fact both expressions rely on: the lexicographic order of md5
  * HEX strings equals the unsigned lexicographic order of the raw
  * 16-byte digests (each byte maps monotonically to its two hex
  * digits). So "min over hex strings" — the portable, oracle-friendly
  * formulation — can be computed as min over digest bytes, hex-encoding
  * only the winner. That removes ~(k−1)/k of the hex conversions and
  * all intermediate UTF8String allocations.
  */
object Md5Min {
  private val hexChars = "0123456789abcdef".toCharArray

  def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexChars((d(i) & 0xf0) >> 4)
      out(2 * i + 1) = hexChars(d(i) & 0x0f)
      i += 1
    }
    new String(out)
  }

  /** unsigned lexicographic a < b */
  def ltUnsigned(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }
}

/** `graft_minhashes(shingles, k)`: the k MinHash values
  * `mh_i = min over shingles of md5("i|" + shingle)` computed in ONE
  * pass over the shingle array with a reused MessageDigest — identical
  * results to k separate `array_min(transform(shingles, s ->
  * md5(concat('i|', s))))` projections (the DuckDB oracle's
  * formulation), ~k× less expression overhead.
  *
  * Interpreted-eval only (CodegenFallback): the hot loop lives in
  * ordinary JVM code below, codegen would only inline the call. */
case class MinHashesExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhashes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = MessageDigest.getInstance("MD5")
    val mins = new Array[Array[Byte]](numHashes)
    val prefixes = Array.tabulate(numHashes)(i => s"$i|".getBytes("UTF-8"))
    var j = 0
    while (j < n) {
      // null shingle ⇒ no candidate hash, matching the HOF form
      // (md5(concat(i|, null)) is null; array_min skips nulls)
      if (!arr.isNullAt(j)) {
        val sBytes = arr.getUTF8String(j).getBytes
        var i = 0
        while (i < numHashes) {
          md.reset()
          md.update(prefixes(i))
          md.update(sBytes)
          val d = md.digest()
          if (mins(i) == null || Md5Min.ltUnsigned(d, mins(i))) mins(i) = d
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins.map(d =>
      if (d == null) null else UTF8String.fromString(Md5Min.hex(d))))
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashesExpr =
    copy(child = newChild)
}

/** `graft_winnow_min(text, k)`: lexicographic min of md5 over all
  * character k-grams of `text` (the winnowing-style fingerprint) —
  * identical to `array_min(transform(sequence(1, greatest(len-k+1, 1)),
  * i -> md5(substr(text, i, k))))`, one digest instance, no
  * intermediate array. */
case class WinnowMinExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_winnow_min"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    val len = text.numChars()
    val n = math.max(len - (k - 1), 1)
    val md = MessageDigest.getInstance("MD5")
    var min: Array[Byte] = null
    var i = 0
    while (i < n) {
      // UTF8String.substring is char-based like SQL substr — correct
      // beyond ASCII too
      val gram = text.substring(i, math.min(i + k, len))
      md.reset()
      val d = md.digest(gram.getBytes)
      if (min == null || Md5Min.ltUnsigned(d, min)) min = d
      i += 1
    }
    UTF8String.fromString(Md5Min.hex(min))
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowMinExpr =
    copy(child = newChild)
}
