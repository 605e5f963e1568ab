package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The hot loop behind [[TokenRunStatsExpr]], shared by the
  * interpreted eval and the generated code (the
  * [[HashedShingles]] static-call pattern).
  *
  * One byte pass over the raw UTF-8 computing what the regex triple
  *   `[a-z]+` / `[0-9]+` / `[a-z]+|[0-9]+|[^a-z0-9 ]`
  * counts:
  *  - an alpha run starts at every `[a-z]` byte whose predecessor is
  *    not `[a-z]` (same for digit runs) — leftmost-longest regex runs
  *    are exactly the maximal byte runs because `a-z`/`0-9` are
  *    single ASCII bytes and ASCII bytes never occur inside a UTF-8
  *    multibyte sequence;
  *  - the alternation's third branch matches every remaining
  *    non-space CODEPOINT once, so `n_pieces` adds one per UTF-8
  *    start byte (`(b & 0xC0) != 0x80`) outside `[a-z0-9 ]`.
  *    Codepoint counting matches RE2 (the DuckDB oracle); Java's
  *    regex counts UTF-16 units, which only diverges on
  *    supplementary-plane characters where the two engines already
  *    disagree with each other.
  */
object TokenRunStats {
  private val CLS_NONE = 0
  private val CLS_ALPHA = 1
  private val CLS_DIGIT = 2

  def compute(s: UTF8String): InternalRow = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    var alpha = 0L
    var digit = 0L
    var other = 0L
    var prev = CLS_NONE
    var i = 0
    while (i < len) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i)
      if (b >= 'a' && b <= 'z') {
        if (prev != CLS_ALPHA) alpha += 1
        prev = CLS_ALPHA
      } else if (b >= '0' && b <= '9') {
        if (prev != CLS_DIGIT) digit += 1
        prev = CLS_DIGIT
      } else {
        if (b != ' ' && (b & 0xC0) != 0x80) other += 1
        prev = CLS_NONE
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](alpha, digit, alpha + digit + other))
  }
}

/** `graft_token_run_stats(text)`: the BPE-pre-tokenization counts
  * (`n_alpha_runs`, `n_digit_runs`, `n_pieces`) as one struct — the
  * native form of the three `regexp_extract_all` calls in
  * [[graft.operators.TextAnalysis.regexTokenStatsRegex]], value-
  * identical (see [[TokenRunStats]]) but a single allocation-free
  * byte pass instead of three regex engines each materializing an
  * array of every match just to take its size. Counting is the whole
  * contract here, so the match arrays are pure overhead — at sf1 the
  * regex form was 6× DuckDB with the regex stage dominating. */
case class TokenRunStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string document, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_alpha_runs", LongType, nullable = false),
    StructField("n_digit_runs", LongType, nullable = false),
    StructField("n_pieces", LongType, nullable = false)))
  override def prettyName: String = "graft_token_run_stats"

  override def nullSafeEval(input: Any): Any =
    TokenRunStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TokenRunStats.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): TokenRunStatsExpr =
    copy(child = newChild)
}
