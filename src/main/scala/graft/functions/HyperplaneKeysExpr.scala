package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_hyperplane_keys(embedding)`: ALL hyperplane-LSH bucket keys
  * of a vector in one pass — element t of the result is table t's key,
  * the concatenated sign bits of the vector's dot products with that
  * table's planes.
  *
  * Value-identical to the HOF formulation
  * (`concat(when(dot(v, plane) >= 0, "1").otherwise("0"), ...)` per
  * table, `LshPlanes.keyColOf`): same left-fold double sums in index
  * order, same null semantics (a null element nulls the dot and a null
  * comparison takes the otherwise-branch, emitting '0').
  *
  * Why a native expression when the arithmetic is trivial: the HOF form
  * inlines tables × bits literal 64-double arrays into the plan — at 32
  * tables × 4 bits that is a 128-dot expression tree whose GENERATED
  * SOURCE differs per plan instantiation (fresh attribute ids), so
  * every fresh DataFrame pays ~3-4 s of janino compilation that the
  * codegen cache can never amortize (measured: candidate stage 4.1 s
  * first run, 0.23 s second). Here the planes are instance data and the
  * loop is ordinary JVM code (CodegenFallback, like MinHashesExpr) —
  * nothing to compile, same keys. */
case class HyperplaneKeysExpr(child: Expression, planes: Seq[Seq[Seq[Int]]])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float> or array<double>, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_keys"

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  // [table][bit][dim] as primitive doubles for the eval loop
  private lazy val p: Array[Array[Array[Double]]] =
    planes.map(_.map(_.map(_.toDouble).toArray).toArray).toArray

  // HOF parity for a NULL input array: each dot is null, each
  // `when(null >= 0, "1").otherwise("0")` is '0' — the row keeps its
  // all-'0' keys instead of dropping out of bucketing (UnaryExpression's
  // default null-propagation would silently remove it from every LSH
  // bucket table, diverging from the oracle's CASE WHEN form).
  override def nullable: Boolean = false
  private lazy val allZeroKeys = new GenericArrayData(
    p.map(table => UTF8String.fromString("0" * table.length): Any))
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) allZeroKeys else nullSafeEval(v)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // one materialization of the vector for all tables × bits dots
    val v = new Array[Double](n)
    var anyNull = false
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) anyNull = true
      else v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val out = new Array[Any](p.length)
    var t = 0
    while (t < p.length) {
      val table = p(t)
      val key = new Array[Char](table.length)
      var b = 0
      while (b < table.length) {
        val w = table(b)
        // graft_dot parity: a length mismatch or ANY null element nulls
        // the dot, and null >= 0 takes the otherwise-branch ⇒ '0'
        var bit = '0'
        if (!anyNull && n == w.length) {
          var s = 0.0
          var d = 0
          while (d < n) { s += v(d) * w(d); d += 1 }
          if (s >= 0.0) bit = '1'
        }
        key(b) = bit
        b += 1
      }
      out(t) = UTF8String.fromString(new String(key))
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneKeysExpr =
    copy(child = newChild)
}
