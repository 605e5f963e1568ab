package graft.sources

import java.util
import java.nio.file.{Files, LinkOption, Paths}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for filesystem *metadata* scans:
  *
  * {{{
  *   spark.read.format("graft.sources.FsMetaSource")
  *     .option("path", "/data/tree").load()
  * }}}
  *
  * The built-in `binaryFile` source reads file CONTENT and
  * `FileStreamSource` needs globs — both the wrong tool for a
  * metadata-only index scan (SURVEY.md §2-A1). This source plans one
  * input partition per top-level subtree (the same seeding strategy as
  * [[graft.fs.FsScan]]), so executors walk disjoint subtrees in
  * parallel and only (path, filename, mtime, size) rows ever exist.
  *
  * Semantics match FsScan: regular files only, symlinks and special
  * files skipped, per-entry errors tolerated (skip, never fail the
  * task).
  */
class FsMetaSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FsMetaSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FsMetaTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object FsMetaSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("filename", StringType, nullable = false),
    StructField("modification_datetime", TimestampType, nullable = false),
    StructField("file_size", LongType, nullable = false)))
}

private class FsMetaTable(root: String) extends Table with SupportsRead {
  require(root != null, "option 'path' is required")
  override def name(): String = s"fsmeta($root)"
  override def schema(): StructType = FsMetaSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FsMetaScanBuilder(root)
}

private class FsMetaScanBuilder(root: String) extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = FsMetaSource.schema
  override def toBatch: Batch = this

  /** One partition per top-level subtree + one for the root's own
    * files — the planner-side analogue of FsScan.seeds. */
  override def planInputPartitions(): Array[InputPartition] = {
    val subdirs = ArrayBuffer.empty[String]
    try {
      val ds = Files.newDirectoryStream(Paths.get(root))
      try ds.forEach { p =>
        if (Files.isDirectory(p, LinkOption.NOFOLLOW_LINKS)) subdirs += p.toString
      } finally ds.close()
    } catch { case _: Exception => () }
    (FsMetaPartition(root, recurse = false) +:
      subdirs.map(d => FsMetaPartition(d, recurse = true))).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new FsMetaReaderFactory
}

private case class FsMetaPartition(dir: String, recurse: Boolean) extends InputPartition

private class FsMetaReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FsMetaReader(partition.asInstanceOf[FsMetaPartition])
}

/** Streams one open DirectoryStream at a time — per-task memory is
  * O(directory stack), never O(entries-in-directory) (a hot directory
  * with tens of millions of dirents would otherwise buffer them all
  * before the first row). Spark calls [[close]] on task end, including
  * failures, so the open stream never outlives its task. */
private class FsMetaReader(part: FsMetaPartition) extends PartitionReader[InternalRow] {
  private val stack = scala.collection.mutable.Stack(Paths.get(part.dir))
  private var stream: java.nio.file.DirectoryStream[java.nio.file.Path] = _
  private var entries: java.util.Iterator[java.nio.file.Path] = _
  private var row: InternalRow = _

  private def closeStream(): Unit = {
    if (stream != null) { try stream.close() catch { case _: Exception => () } }
    stream = null; entries = null
  }

  /** Open directories off the stack until one yields a live stream;
    * false when exhausted. Unopenable dirs are skipped (per-entry
    * error tolerance, matching FsScan). */
  private def openNext(): Boolean = {
    while (stream == null) {
      if (stack.isEmpty) return false
      val dir = stack.pop()
      try { stream = Files.newDirectoryStream(dir); entries = stream.iterator() }
      catch { case _: Exception => closeStream() }
    }
    true
  }

  override def next(): Boolean = {
    while (true) {
      if (!openNext()) return false
      // a mid-iteration IO error drops the remainder of this directory
      val p =
        try { if (entries.hasNext) entries.next() else null }
        catch { case _: Exception => closeStream(); null }
      if (p == null) closeStream()
      else {
        try {
          val attrs = Files.readAttributes(p,
            classOf[java.nio.file.attribute.BasicFileAttributes],
            LinkOption.NOFOLLOW_LINKS)
          if (attrs.isRegularFile) {
            row = InternalRow(
              UTF8String.fromString(Option(p.getParent).map(_.toString).getOrElse("")),
              UTF8String.fromString(p.getFileName.toString),
              attrs.lastModifiedTime.toMillis * 1000L, // micros
              attrs.size)
            return true
          } else if (attrs.isDirectory && !attrs.isSymbolicLink && part.recurse) {
            stack.push(p)
          }
        } catch { case _: Exception => () } // tolerate per-entry errors
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = closeStream()
}
