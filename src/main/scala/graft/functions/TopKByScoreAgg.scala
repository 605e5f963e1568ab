package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One kept posting in the bounded top-k buffer. Ordering contract
  * (the keep-preference): higher score wins; equal scores break ties
  * toward the binary-SMALLER term — exactly the
  * `Window.orderBy(score.desc, term.asc)` + `row_number <= k` rule the
  * heap replaces, so the two forms are value-identical. */
private[functions] final class TopKEntry(
    val score: Double, val term: UTF8String, val tf: Long, val df: Long)

object TopKByScoreAgg {
  /** Weakest-first ordering so the heap head is the eviction
    * candidate. A top-level Serializable object: the aggregate (and
    * every field it holds) ships to executors inside the physical
    * plan, and an anonymous comparator would fail task serialization. */
  private[functions] val WeakestFirst: java.util.Comparator[TopKEntry] with Serializable =
    new java.util.Comparator[TopKEntry] with Serializable {
      override def compare(a: TopKEntry, b: TopKEntry): Int = {
        val c = java.lang.Double.compare(a.score, b.score)
        if (c != 0) c else b.term.compareTo(a.term)
      }
    }
}

/** Per-group bounded top-k as a [[TypedImperativeAggregate]] — the
  * sort-free form of "row_number() over (partition by g order by
  * score desc, term) <= k".
  *
  * Why this beats the window at scale: the window form must (1)
  * shuffle EVERY posting to its group's reducer and (2) sort each
  * group's full posting list, even though only k rows per group
  * survive (WindowGroupLimit prunes after a per-partition sort, so the
  * map-side sort of all postings remains). The heap form is an
  * ordinary aggregate: map-side partial aggregation reduces each
  * partition to ≤ k entries per group BEFORE the exchange (a size-k
  * binary heap per group, O(log k) per posting, no sort of the
  * stream), the shuffle then carries at most k·partitions rows per
  * group, and the final merge is k-bounded. At 100 TB the postings
  * sort is the dominant stage of every keyword-extraction query; this
  * deletes it.
  *
  * Determinism: the heap's keep-preference (score desc, term binary
  * asc) totally orders entries whenever terms are unique within a
  * group (true for tf-idf postings — TermFreqsExpr emits each distinct
  * term once per doc), so the kept set and its eval order are unique
  * regardless of input partitioning or merge order.
  *
  * Buffer is a binary min-heap keyed by the keep-preference REVERSED
  * (head = weakest kept entry): update compares a candidate only
  * against the head once the buffer is full — O(1) reject for the
  * overwhelmingly common below-threshold posting. */
case class TopKByScoreAgg(
    score: Expression, term: Expression, tf: Expression, df: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[TopKEntry]] {

  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, term, tf, df)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false),
    StructField("df", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_topk_by_score"

  /** true iff a beats b under the keep-preference. */
  @inline private def better(aScore: Double, aTerm: UTF8String, b: TopKEntry): Boolean = {
    val c = java.lang.Double.compare(aScore, b.score)
    c > 0 || (c == 0 && aTerm.compareTo(b.term) < 0)
  }

  override def createAggregationBuffer(): java.util.PriorityQueue[TopKEntry] =
    new java.util.PriorityQueue[TopKEntry](k + 1, TopKByScoreAgg.WeakestFirst)

  private def offer(buf: java.util.PriorityQueue[TopKEntry],
      sRaw: Double, t: UTF8String, tfv: Long, dfv: Long, owned: Boolean): Unit = {
    // Normalize -0.0 to 0.0 so the heap's java.lang.Double.compare
    // ordering coincides with Spark SQL double ordering (which treats
    // them equal) for EVERY input, not just the strictly-positive
    // tf-idf domain — the documented value-identity with the window
    // twin must hold for the aggregate as a generic building block.
    // NaN needs no special case: both orderings already place NaN
    // greatest and equal to itself.
    val s = if (sRaw == 0.0d) 0.0d else sRaw
    if (buf.size < k) {
      // clone: input UTF8Strings may point into a reused scan buffer
      buf.add(new TopKEntry(s, if (owned) t else t.clone(), tfv, dfv))
    } else if (better(s, t, buf.peek())) {
      buf.poll()
      buf.add(new TopKEntry(s, if (owned) t else t.clone(), tfv, dfv))
    }
  }

  override def update(buf: java.util.PriorityQueue[TopKEntry],
      input: InternalRow): java.util.PriorityQueue[TopKEntry] = {
    val s = score.eval(input)
    val t = term.eval(input)
    val tfv = tf.eval(input)
    val dfv = df.eval(input)
    if (s != null && t != null && tfv != null && dfv != null) {
      offer(buf, s.asInstanceOf[Double], t.asInstanceOf[UTF8String],
        tfv.asInstanceOf[Long], dfv.asInstanceOf[Long], owned = false)
    }
    buf
  }

  override def merge(buf: java.util.PriorityQueue[TopKEntry],
      other: java.util.PriorityQueue[TopKEntry]): java.util.PriorityQueue[TopKEntry] = {
    val it = other.iterator()
    while (it.hasNext) {
      val e = it.next()
      offer(buf, e.score, e.term, e.tf, e.df, owned = true) // already cloned/deserialized
    }
    buf
  }

  override def eval(buf: java.util.PriorityQueue[TopKEntry]): Any = {
    val n = buf.size
    val sorted = new Array[TopKEntry](n)
    // drain weakest-first, fill back-to-front → strongest-first output
    var i = n - 1
    while (i >= 0) { sorted(i) = buf.poll(); i -= 1 }
    // restore the buffer (eval must not destroy it for window-less
    // group-by this doesn't matter, but imperative buffers are reused)
    sorted.foreach(buf.add)
    val rows = new Array[Any](n)
    i = 0
    while (i < n) {
      val e = sorted(i)
      rows(i) = new GenericInternalRow(Array[Any](e.term, e.tf, e.df, e.score))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: java.util.PriorityQueue[TopKEntry]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeDouble(e.score)
      out.writeLong(e.tf)
      out.writeLong(e.df)
      val tb = e.term.getBytes
      out.writeInt(tb.length)
      out.write(tb)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[TopKEntry] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val s = in.readDouble()
      val tfv = in.readLong()
      val dfv = in.readLong()
      val tb = new Array[Byte](in.readInt())
      in.readFully(tb)
      buf.add(new TopKEntry(s, UTF8String.fromBytes(tb), tfv, dfv))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScoreAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScoreAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScoreAgg =
    copy(score = newChildren(0), term = newChildren(1),
      tf = newChildren(2), df = newChildren(3))
}
