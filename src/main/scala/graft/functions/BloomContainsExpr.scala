package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_contains(key)`: membership probe of a string key
  * against a serialized [[BloomFilter]] carried inside the expression.
  *
  * This is the scan-side half of the bloom existence-probe pattern
  * (see [[graft.queries.FileQueries.existingProbeBloom]]): the probe
  * set is folded DISTRIBUTED into a fixed-size filter (kilobytes for
  * thousands of keys, ~1.2 GB even for 10^9 at 1% fpp), the filter
  * ships to every task once, and the corpus scan drops non-members
  * before any join — no shuffle, no broadcast of raw keys.
  *
  * Guarantees: never a false negative (a true member always passes);
  * false positives at the configured fpp, removed downstream by an
  * exact verify join over the (tiny) surviving fraction.
  *
  * Interpreted-eval only (CodegenFallback): the probe is two xxhash-
  * style block reads inside sketch.BloomFilter — codegen would only
  * inline the call.
  */
case class BloomContainsExpr(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  // one deserialization per task (the expression is serialized to
  // executors with the bytes; the filter itself is immutable and
  // probe-thread-safe)
  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  // mightContainBinary(utf8) == mightContainString for the same text:
  // sketch.BloomFilter.putString hashes the UTF-8 bytes, which is
  // exactly what UTF8String.getBytes yields (no copy through String)
  override def nullSafeEval(input: Any): Any =
    bloom.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildInternal(newChild: Expression): BloomContainsExpr =
    copy(child = newChild)
}
