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
    * silently under-read the index. A MISSING `dir` is the one benign
    * case (no deltas yet) — detected by the open itself, not a
    * pre-check like `Files.isDirectory`, which returns false on
    * permission/transient IO errors and would turn them into exactly
    * the silent empty list this contract forbids. */
  def list(dir: String): Seq[(Long, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val ds =
      try Files.newDirectoryStream(Paths.get(dir))
      catch { case _: java.nio.file.NoSuchFileException => return Seq.empty }
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

  /** The `compacted_through` watermark of a resolved base snapshot's
    * meta: the seq through which deltas are folded (-1 = none). The
    * ONE decoder for the protocol — IvfIndex and DedupStream both
    * read it from here so the default can't drift. */
  def watermark(meta: Map[String, String]): Long =
    meta.get("compacted_through").map(_.toLong).getOrElse(-1L)

  /** Crash-orphaned `delta-tmp-*` staging dirs under `dir`. Under the
    * single-writer contract no append is in flight while maintenance
    * runs, so every staging dir present then is a crash orphan. */
  def orphanedTmp(dir: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val ds =
      try Files.newDirectoryStream(Paths.get(dir))
      catch { case _: java.nio.file.NoSuchFileException => return Seq.empty }
    try ds.forEach { p =>
      if (p.getFileName.toString.startsWith("delta-tmp-")) out += p.toString
    } finally ds.close()
    out.toSeq
  }
}
