package graft.fs

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The schema-agnostic manifest-pointer snapshot protocol shared by
  * every persistent state directory in the engine (the file index —
  * [[IndexStore]] — and the streaming dedup shingle index): data is
  * written to an immutable `<root>/snap-<nonce>/`, then the single
  * `<root>/CURRENT` pointer file is replaced with one ATOMIC_MOVE.
  * Readers resolve CURRENT → directory, so they always see either the
  * old or the new complete snapshot. Single-WRITER by contract;
  * readers are always safe. Crash-orphaned snapshots that existed
  * before a publish began are swept after its pointer flip (anything
  * created later belongs to an overlapping publish and is never
  * touched).
  */
object SnapshotDir {

  private def pointerFile(root: String) = Paths.get(s"$root/CURRENT")

  /** Resolve the published snapshot directory, if any. */
  def currentDir(root: String): Option[String] = {
    val p = pointerFile(root)
    if (!Files.exists(p)) None
    else Some(s"$root/${Files.readString(p).trim}")
  }

  def exists(root: String): Boolean =
    currentDir(root).exists(d => Files.exists(Paths.get(d)))

  /** Load the published snapshot; empty DF with `schema` when none
    * has been published yet. */
  def load(spark: SparkSession, root: String, schema: StructType): DataFrame =
    currentDir(root).filter(d => Files.exists(Paths.get(d))) match {
      case Some(d) => spark.read.parquet(d)
      case None =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  /** Metadata published ATOMICALLY with a snapshot (it lives inside
    * the snap dir, so the pointer flip switches data and meta as one
    * unit — e.g. the streaming dedup compaction watermark, which must
    * never be observed ahead of or behind the base it describes).
    * An ABSENT meta file → empty map (a snapshot legitimately without
    * meta); an UNREADABLE one throws — meta guards correctness
    * decisions, and state corruption must fail loudly rather than
    * silently degrade. The file is underscore-prefixed so parquet
    * readers treat it as hidden.
    *
    * Readers that also load the snapshot's DATA must resolve the
    * pointer ONCE ([[currentDir]]) and pass the resolved dir to
    * [[metaAt]] — re-resolving for the meta can pair one snapshot's
    * data with a successor's meta if a publish lands in between. */
  def loadMeta(root: String): Map[String, String] =
    currentDir(root).map(metaAt).getOrElse(Map.empty)

  /** [[loadMeta]] for an already-resolved snapshot directory. */
  def metaAt(snapDir: String): Map[String, String] = {
    val p = Paths.get(s"$snapDir/_snapmeta")
    if (!Files.exists(p)) Map.empty
    else Files.readAllLines(p).toArray(Array.empty[String]).toSeq
      .filter(_.contains('=')).map { line =>
        val i = line.indexOf('=')
        line.substring(0, i) -> line.substring(i + 1)
      }.toMap
  }

  /** Publish `df` as the new snapshot: parquet to snap-<nonce>, atomic
    * pointer flip, then best-effort retirement of the previous
    * snapshot and pre-existing crash orphans. `meta` is written inside
    * the snap dir BEFORE the flip (see [[loadMeta]]). */
  def publish(df: DataFrame, root: String, meta: Map[String, String] = Map.empty): Unit = {
    Files.createDirectories(Paths.get(root))
    val prev = currentDir(root)
    // crash-orphan candidates are frozen NOW, before this publish
    // writes anything — see the class doc for why this makes the sweep
    // safe against an overlapping publish
    val preExisting: Set[String] = {
      val out = scala.collection.mutable.Set.empty[String]
      try {
        val ds = Files.newDirectoryStream(Paths.get(root))
        try ds.forEach { p =>
          val n = p.getFileName.toString
          if (n.startsWith("snap-") || n.startsWith(".CURRENT-")) out += n
        } finally ds.close()
      } catch { case scala.util.control.NonFatal(_) => () }
      out.toSet
    }
    val snapName = s"snap-${System.nanoTime()}"
    df.write.mode("overwrite").parquet(s"$root/$snapName")
    if (meta.nonEmpty)
      Files.writeString(Paths.get(s"$root/$snapName/_snapmeta"),
        meta.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("\n"))
    // single atomic pointer flip — readers never observe a missing
    // snapshot (write the new pointer to a temp file, then rename)
    val tmpPtr = Paths.get(s"$root/.CURRENT-${System.nanoTime()}")
    Files.writeString(tmpPtr, snapName)
    Files.move(tmpPtr, pointerFile(root),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    try {
      prev.foreach(d => if (Files.exists(Paths.get(d))) deleteRecursively(Paths.get(d)))
      val nowCurrent = currentDir(root).map(d => Paths.get(d).getFileName.toString)
      val keep = Set(snapName) ++ nowCurrent ++
        prev.map(d => Paths.get(d).getFileName.toString)
      preExisting.filterNot(keep).foreach { n =>
        deleteRecursively(Paths.get(s"$root/$n"))
      }
    } catch { case scala.util.control.NonFatal(_) => () } // best-effort; never
    // fails a publish whose pointer flip already succeeded
  }

  private[graft] def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val ds = Files.newDirectoryStream(p)
      try ds.forEach(deleteRecursively) finally ds.close()
    }
    Files.deleteIfExists(p)
  }
}
