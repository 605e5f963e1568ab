package graft.fs

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

/** A7 — the Go variant's whole-index JSON storage mode
  * (/root/reference/file_indexer_go/indexer/indexer.go:294-338):
  * snapshot ⇄ JSON round-trip with the explicit index schema. */
class JsonIndexSpec extends SparkSpec {
  import spark.implicits._

  test("index snapshot round-trips through JSON with schema intact") {
    val t = new Timestamp(1700000000000L)
    val rows = Seq(
      ("/a", "x.txt", "abc", t, 10L, t),
      ("/b", "y.txt", null.asInstanceOf[String], t, 0L, t))
    val df = rows.toDF("path", "filename", "checksum",
      "modification_datetime", "file_size", "indexed_at")
    val dir = Files.createTempDirectory("graft-json").toString + "/idx.json"
    df.write.json(dir)
    val back = spark.read.schema(IndexStore.schema).json(dir)
    // JSON sources report every field nullable — names/types must match
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      IndexStore.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.collect().map(r => (r.getString(0), r.getString(1),
      Option(r.getString(2)), r.getTimestamp(3), r.getLong(4))).toSet
    assert(got == Set(
      ("/a", "x.txt", Some("abc"), t, 10L),
      ("/b", "y.txt", None, t, 0L)))
  }
}
