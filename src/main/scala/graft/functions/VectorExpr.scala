package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * Why a custom expression: the HOF formulation
  * `aggregate(zip_with(a, b, *), 0.0, +)` allocates an intermediate
  * array per row-pair and walks lambda-bound variables per element.
  * In an all-pairs similarity join that expression sits in the
  * innermost loop (|A|·|B| evaluations); this expression compiles to a
  * tight scalar loop in whole-stage-generated Java — no allocation, no
  * lambda dispatch — and benches ~10× faster on the ss_* queries.
  *
  * Determinism: the accumulation is a sequential left-to-right fold,
  * the same order as the HOF version and the oracle's generated
  * 64-term sum — results stay bit-identical.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>), got ($l, $r)")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // Null semantics match the HOF form aggregate(zip_with(a,b,*),0,+):
  // zip_with pads the shorter array with null and a null element
  // nullifies the sum — so mismatched lengths or any null element
  // yield NULL (surfacing malformed embeddings instead of silently
  // computing a plausible-but-wrong truncated dot).
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** Nearest-centroid assignment as ONE native expression: cell id =
  * argmax over a centroid MATRIX of (v·cᵢ − |cᵢ|²/2) — the exact
  * argmin-squared-euclidean ranking [[graft.operators.Ivf.score]]
  * uses, with ties to the LOWER cell id (matching `array_position` of
  * the first max in the composed form).
  *
  * Why a custom expression (the r11 10⁷-vector decade catch): the
  * composed form — `array(64 × (DotProductExpr − lit))` followed by
  * `array_max` + `array_position` — plants 64 independent sub-trees
  * in one projection. At that width the generated method blows past
  * JIT/codegen size limits and the whole projection degrades to
  * interpreted per-sub-tree evaluation with per-row array
  * construction and boxed max/position scans; the 10M-row build's
  * assignment ran for over an hour. This expression holds the
  * centroids as one transient double matrix and scans it in a tight
  * nested loop — one method, no per-row allocation, O(cells × dims)
  * multiplies and nothing else.
  *
  * Null semantics: NULL input array, any NULL element, or a
  * dimension mismatch against the matrix → NULL (malformed
  * embeddings surface, never a plausible-but-wrong cell). */
case class NearestCentroidExpr(child: Expression,
    centroids: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if centroids.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires ≥1 centroid")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got $t")
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_nearest_centroid"
  override def nullable: Boolean = true

  // flattened row-major matrix + per-cell −|c|²/2 bias, built once per
  // executor deserialization, not per row
  @transient private lazy val dims = centroids.head.length
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](centroids.length * dims)
    var c = 0
    while (c < centroids.length) {
      val row = centroids(c)
      var d = 0
      while (d < dims) { a(c * dims + d) = row(d); d += 1 }
      c += 1
    }
    a
  }
  @transient private lazy val bias: Array[Double] =
    centroids.map(c => -c.map(x => x * x).sum / 2.0).toArray

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dims) return null
    var i = 0
    while (i < dims) { if (v.isNullAt(i)) return null; i += 1 }
    val x = v.toDoubleArray()
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      // dot in its own accumulator from 0, bias added LAST — the exact
      // operation order of the composed twin (VectorOps.dot's left fold
      // then `- |c|²/2`), so near-tie scores round identically and the
      // value-identity contract holds in general, not just on fixtures
      var acc = 0.0
      val off = c * dims
      var d = 0
      while (d < dims) { acc += x(d) * flat(off + d); d += 1 }
      acc += bias(c)
      if (acc > bestScore) { bestScore = acc; best = c }
      c += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroidExpr =
    copy(child = newChild)
}
