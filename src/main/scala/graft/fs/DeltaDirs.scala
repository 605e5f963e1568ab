package graft.fs

import java.nio.file.{Files, Paths}

/** The `delta-<seq>` sidecar protocol shared by every base+delta index
  * layout (the streaming dedup shingle index, persisted IVF appends):
  * immutable numbered delta directories living next to an atomically
  * published base snapshot whose `compacted_through` meta watermark
  * retires them. One implementation so the lookalike-entry and
  * overflow handling cannot drift between the two indexes.
  */
object DeltaDirs {
  private val DeltaName = """delta-(\d+)""".r

  /** All delta dirs directly under `dir` as (seq, path), seq-sorted.
    * Entries that merely RESEMBLE a delta (`delta-tmp-*` staging dirs,
    * digit runs that overflow Long) are skipped per-entry — a junk
    * name can never silently truncate the list — while real IO errors
    * PROPAGATE: swallowing them would return a partial list and
    * silently under-read the index. A missing `dir` is the one benign
    * case (no deltas yet). */
  def list(dir: String): Seq[(Long, String)] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val ds = Files.newDirectoryStream(d)
    try ds.forEach { p =>
      p.getFileName.toString match {
        case DeltaName(id) => id.toLongOption.foreach(n => out += ((n, p.toString)))
        case _ => ()
      }
    } finally ds.close()
    out.toSeq.sortBy(_._1)
  }

  /** Paths with seq > `mark` — the deltas a base with watermark `mark`
    * has NOT folded. */
  def live(dir: String, mark: Long): Seq[String] =
    list(dir).collect { case (id, p) if id > mark => p }
}
