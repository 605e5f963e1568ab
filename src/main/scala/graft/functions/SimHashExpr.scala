package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 32-bit SimHash signature from an array of per-token md5 hex
  * strings: bit j is set iff at least half the tokens have hex digit j
  * ≥ '8' (the digit's high bit — a ±1 vote per token).
  *
  * Semantically identical to the HOF formulation
  * `sum_j( CASE WHEN 2*size(filter(tokmd5, h -> substr(h,j+1,1) >= '8'))
  *              >= size(tokmd5) THEN 2^j ELSE 0 END )`
  * and to the DuckDB oracle's generated SQL — but one pass over the
  * array computing all 32 vote counters at once, instead of 32
  * filter+substring passes each allocating a filtered array per row.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> of md5 hex digests, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  // HOF-matching edge semantics (the function is on the public SQL
  // surface, so inputs are not guaranteed to be md5 digests): a NULL
  // element casts no votes but still counts in the denominator
  // (filter() drops it, size() keeps it); a string shorter than 32
  // chars casts no vote for digits past its end (substring → "" < '8').
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](32)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val len = math.min(s.numBytes(), 32)
        var j = 0
        while (j < len) {
          // md5 hex is ASCII; byte j is hex digit j. '8'..'f' ⇒ high bit.
          if (s.getByte(j) >= '8') votes(j) += 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 32) { if (2 * votes(j) >= n) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val sig = ctx.freshName("sig")
      val len = ctx.freshName("len")
      s"""
         |int $n = $a.numElements();
         |int[] $votes = new int[32];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |    int $len = java.lang.Math.min($s.numBytes(), 32);
         |    for (int $j = 0; $j < $len; $j++) {
         |      if ($s.getByte($j) >= (byte) '8') $votes[$j]++;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 32; $j++) {
         |  if (2 * $votes[$j] >= $n) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}
