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

  /** Publish `df` as the new snapshot: parquet to snap-<nonce>, atomic
    * pointer flip, then best-effort retirement of the previous
    * snapshot and pre-existing crash orphans. */
  def publish(df: DataFrame, root: String): Unit = {
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
