package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Delta-varint codec for PACKED FLAG POSITIONS — the scratch format
  * behind [[graft.operators.Dedup.dupSpans]]' grouped path.
  *
  * The grouped dispatch accumulates one localCheckpoint'd artifact PER
  * VOCAB GROUP holding each doc's flagged gram positions, and every
  * group's artifact stays on scratch until the final per-doc merge —
  * at sf1000 (50M docs) the raw `array<int>` form put the r11 decade
  * probe at an 85% disk peak, one data doubling from ENOSPC. Flagged
  * positions are (a) sorted once per doc and (b) DENSE — duplicated
  * text flags consecutive positions, so deltas are overwhelmingly 1 —
  * which makes sorted delta-varint the natural format: ~1 byte per
  * position against 4 raw, shrinking both the retained checkpoints
  * and the final merge shuffle ~4×.
  *
  * Layout: LEB128 varints — the first position, then strictly
  * positive gaps. Positions are unique per (doc, group) by
  * construction (one gram per position; vocab groups partition the
  * gram domain), so gaps are never 0.
  */
object PackedPos {

  /** Sort + delta-varint encode. The input array must be non-null
    * with unique non-negative ints (flag positions). */
  def encode(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val v = a.toIntArray()
    java.util.Arrays.sort(v)
    // worst case 5 bytes per varint
    val out = new Array[Byte](5 * math.max(n, 1))
    var w = 0
    var prev = 0
    var i = 0
    while (i < n) {
      var x = v(i) - prev // first value, then strictly positive gaps
      prev = v(i)
      while ((x & ~0x7F) != 0) {
        out(w) = ((x & 0x7F) | 0x80).toByte; w += 1; x >>>= 7
      }
      out(w) = x.toByte; w += 1
      i += 1
    }
    java.util.Arrays.copyOf(out, w)
  }

  /** K-way merge over sorted packed streams → (max consecutive run,
    * total position count). Streams are disjoint and each internally
    * sorted, so the merge yields the doc's full sorted flag set; the
    * gaps-and-islands fold over it is exactly the single-pass window
    * computation. G is the vocab group count (≤ low hundreds), so a
    * selection merge is O(total · G) with zero allocation beyond the
    * head arrays. */
  def runStats(packs: ArrayData): (Long, Long) = {
    val g = packs.numElements()
    val bufs = new Array[Array[Byte]](g)
    val offs = new Array[Int](g)
    val heads = new Array[Int](g) // current decoded value per stream
    val live = new Array[Boolean](g)
    var i = 0
    while (i < g) {
      bufs(i) = if (packs.isNullAt(i)) Array.emptyByteArray else packs.getBinary(i)
      offs(i) = 0
      live(i) = bufs(i).nonEmpty
      if (live(i)) {
        val (v, o) = readVarint(bufs(i), 0)
        heads(i) = v; offs(i) = o
      }
      i += 1
    }
    var total = 0L
    var run = 0L
    var best = 0L
    var prev = -2
    var anyLive = true
    while (anyLive) {
      // pick the min head among live streams
      var min = Int.MaxValue
      var mi = -1
      var j = 0
      while (j < g) {
        if (live(j) && heads(j) < min) { min = heads(j); mi = j }
        j += 1
      }
      if (mi < 0) anyLive = false
      else {
        total += 1
        run = if (min == prev + 1) run + 1 else 1L
        if (run > best) best = run
        prev = min
        // advance the winning stream (delta from its own last value)
        if (offs(mi) >= bufs(mi).length) live(mi) = false
        else {
          val (d, o) = readVarint(bufs(mi), offs(mi))
          heads(mi) = heads(mi) + d; offs(mi) = o
        }
      }
    }
    (best, total)
  }

  /** Merge two sorted packed streams into one sorted packed stream.
    * The associative op behind the grouped dupSpans FOLD: finished
    * vocab groups merge pairwise into a single running per-doc stream,
    * so the retained checkpoint between groups is O(docs) rows — one
    * binary per doc — instead of the O(docs·G) per-(doc,group) rows
    * that killed the sf2000 budget-halving probe (r12: retained rows
    * grow linearly in G; disk hit 78% and climbing at 50M docs / 64
    * groups). Streams are disjoint across vocab groups by
    * construction; equal heads (defensive only) emit once, making the
    * merge idempotent. Output size ≤ |a| + |b|: every element's delta
    * in the merged stream is ≤ its delta in its source stream (the
    * merged predecessor is the largest smaller flag, ≥ the source
    * predecessor), so varints never grow. */
  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Byte](a.length + b.length)
    var w = 0
    var prev = 0
    var ia = 0; var ib = 0
    var ha = 0; var hb = 0
    var la = true; var lb = true
    locally { val (v, o) = readVarint(a, 0); ha = v; ia = o }
    locally { val (v, o) = readVarint(b, 0); hb = v; ib = o }
    def emit(v: Int): Unit = {
      var x = v - prev
      prev = v
      while ((x & ~0x7F) != 0) {
        out(w) = ((x & 0x7F) | 0x80).toByte; w += 1; x >>>= 7
      }
      out(w) = x.toByte; w += 1
    }
    while (la || lb) {
      val takeA = la && (!lb || ha <= hb)
      val takeB = lb && (!la || hb <= ha)
      val v = if (takeA) ha else hb
      emit(v)
      if (takeA) {
        if (ia >= a.length) la = false
        else { val (d, o) = readVarint(a, ia); ha += d; ia = o }
      }
      if (takeB) {
        if (ib >= b.length) lb = false
        else { val (d, o) = readVarint(b, ib); hb += d; ib = o }
      }
    }
    if (w == out.length) out else java.util.Arrays.copyOf(out, w)
  }

  private def readVarint(b: Array[Byte], off: Int): (Int, Int) = {
    var x = 0
    var shift = 0
    var o = off
    var more = true
    while (more) {
      val byte = b(o); o += 1
      x |= (byte & 0x7F) << shift
      shift += 7
      more = (byte & 0x80) != 0
    }
    (x, o)
  }
}

/** `graft_packed_pos(array<int>)` → binary: sorted delta-varint
  * encoding of a doc's flagged positions within one vocab group (see
  * [[PackedPos]]). NULL array → NULL. */
case class PackedPosExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  // containsNull = true is REJECTED, not tolerated: encode() goes
  // through ArrayData.toIntArray, which for UnsafeArrayData silently
  // reads null slots as 0 — a null element would become flag position
  // 0 and corrupt run stats instead of failing loudly. Internal
  // callers (collect_list) declare containsNull = false.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, false) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int> with containsNull=false " +
        s"(null positions would silently decode as 0), got $t")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_packed_pos"
  override def nullSafeEval(input: Any): Any =
    PackedPos.encode(input.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(newChild: Expression): PackedPosExpr =
    copy(child = newChild)
}

/** `graft_packed_run_stats(array<binary>)` → struct(max_run,
  * n_dup_grams): the per-doc gaps-and-islands fold over the k-way
  * merge of the doc's per-group packed streams (see
  * [[PackedPos.runStats]]) — value-identical to sorting the flattened
  * raw positions and folding, without ever materializing them. NULL
  * array → NULL; NULL elements are treated as empty streams. */
case class PackedRunStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(BinaryType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<binary> packed streams, got $t")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("max_run", LongType, nullable = false),
    StructField("n_dup_grams", LongType, nullable = false)))
  override def prettyName: String = "graft_packed_run_stats"
  override def nullSafeEval(input: Any): Any = {
    val (best, total) = PackedPos.runStats(input.asInstanceOf[ArrayData])
    new GenericInternalRow(Array[Any](best, total))
  }
  override protected def withNewChildInternal(newChild: Expression): PackedRunStatsExpr =
    copy(child = newChild)
}

/** `graft_packed_merge(binary, binary)` → binary: merge two sorted
  * packed streams into one (see [[PackedPos.merge]]). NULL-tolerant by
  * design — the grouped dupSpans fold full-outer-joins the running
  * stream with each finished group's stream, so either side may be
  * absent for a given doc: NULL ⊔ x = x, NULL ⊔ NULL = NULL. */
case class PackedMergeExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, binary) packed streams, got ($l, $r)")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable && right.nullable
  override def prettyName: String = "graft_packed_merge"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null) r
    else if (r == null) l
    else PackedPos.merge(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PackedMergeExpr =
    copy(left = newLeft, right = newRight)
}
