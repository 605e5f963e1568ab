package graft.operators

import org.apache.spark.sql.DataFrame

/** Session-lifetime hygiene for operator-internal caches.
  *
  * The lazy operator builders ([[Dedup.jaccardPairs]],
  * [[Dedup.minhashLsh]], [[Dedup.simhashPairs]], [[Similarity.topkLsh]],
  * [[Ivf.topkIvf]]) cache intermediate artifacts that feed 2+ plan
  * branches of the DataFrame they RETURN. They cannot unpersist those
  * blocks themselves — the CALLER runs the terminal action — so every
  * such cache registers here, and [[releaseAll]] drops all blocks the
  * operators have pinned. One-shot drivers (graft.Verify, graft.Bench)
  * call it between queries; long-lived sessions (a notebook, a serving
  * layer, the streaming driver) call it once the returned frames are
  * consumed. (DedupStream manages its per-batch caches with an explicit
  * cleanup thunk instead — its lifecycle is per-micro-batch.)
  *
  * STRONG references, deliberately: Spark's CacheManager pins the
  * cached plan regardless of whether the caller still references the
  * DataFrame object, so a weak registry could lose its handle to a
  * cache that is still occupying memory. The registry is tiny (a few
  * DataFrame objects per query) and is cleared on every release.
  * unpersist() on an already-released frame is a no-op, so double
  * release is safe.
  */
object OpCaches {
  private val reg = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** cache() the frame and register it for [[releaseAll]]. */
  private[graft] def track(df: DataFrame): DataFrame = {
    df.cache()
    reg.synchronized { reg += df }
    df
  }

  /** Unpersist every operator-internal cache registered so far. */
  def releaseAll(): Unit = reg.synchronized {
    reg.foreach { df =>
      try df.unpersist()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    reg.clear()
  }
}
