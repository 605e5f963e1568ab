package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.fs.IndexStore

/** Keyset-cursor DELETION-SAFETY under churn — the claim the cursor
  * mode makes (and the reference's own cleanup walk relies on,
  * indexer.py:1078-1101) exercised across a snapshot republish landing
  * MID-WALK: rows are deleted and upserted between cursor pages, each
  * page re-resolves the live snapshot (exactly what the ApiServer's
  * files() thunk does), and the walk must neither skip nor repeat any
  * SURVIVING key. Offset pagination breaks here by construction — a
  * deletion below the cursor shifts every later offset — which is why
  * the cursor mode exists.
  *
  * For /duplicates the sort key includes the group's file_count, so
  * the guarantee is scoped to groups whose KEY survives unchanged
  * (vanished groups drop out silently; a group whose count changes
  * legitimately re-sorts — same contract as any keyset walk over a
  * mutable sort key). The churn here vanishes whole groups and adds a
  * new one, leaving survivors' counts untouched — the cleanup-walk
  * shape.
  */
class KeysetChurnSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = new java.sql.Timestamp(866796400000L)

  private def fileRows(ids: Seq[Int], copies: Int = 1): DataFrame =
    ids.flatMap { i =>
      (0 until copies).map { c =>
        (f"/data/d${i % 7}%02d", f"file_$i%04d_$c.txt",
          f"ck$i%04d", t0, 1000L + i, t0)
      }
    }.toDF("path", "filename", "checksum", "modification_datetime",
      "file_size", "indexed_at")

  test("search keyset walk across a mid-walk republish: no surviving key skipped or repeated") {
    val root = Files.createTempDirectory("graft-churn-search").toString
    IndexStore.publish(fileRows(0 until 60), root)
    val req = SearchRequest(filenamePattern = Some("%.txt"))
    def live() = IndexStore.load(spark, root)
    def keys(df: DataFrame): Seq[(String, String)] =
      df.select("path", "filename").collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq

    // pages 1-2 against snapshot v1
    var walked = Seq.empty[(String, String)]
    var cursor: Option[(String, String)] = None
    (0 until 2).foreach { _ =>
      val page = keys(FileQueries.searchKeyset(live(), req, cursor, 10))
      walked ++= page
      cursor = Some(page.last)
    }

    // CHURN lands mid-walk: delete ids 5,7 (already walked) and 40,41
    // (not yet walked); upsert new ids 100-104 (sort after everything)
    // and id 3's row with a new size (an in-place update)
    val deleted = Set(5, 7, 40, 41)
    val v2 = fileRows((0 until 60).filterNot(deleted contains _))
      .unionByName(fileRows(100 until 105))
      .withColumn("file_size",
        when(col("filename") === "file_0003_0.txt", lit(9999L))
          .otherwise(col("file_size")))
    IndexStore.publish(v2, root)

    // finish the walk against v2
    var more = true
    while (more) {
      val page = keys(FileQueries.searchKeyset(live(), req, cursor, 10))
      walked ++= page
      if (page.size < 10) more = false else cursor = Some(page.last)
    }

    // ground truth: keys of v1 up to the churn cursor (what the walk
    // saw before the republish) ∪ v2 keys after the cursor
    val v1Keys = (0 until 60).map(i => (f"/data/d${i % 7}%02d", f"file_$i%04d_0.txt"))
    val v2Keys = ((0 until 60).filterNot(deleted contains _) ++ (100 until 105))
      .map(i => (f"/data/d${i % 7}%02d", f"file_$i%04d_0.txt"))
    val cut = walked(19) // the key the cursor held when churn landed
    val ord = Ordering.Tuple2(Ordering.String, Ordering.String)
    val expect = v1Keys.sorted.takeWhile(ord.lteq(_, cut)) ++
      v2Keys.sorted.dropWhile(ord.lteq(_, cut))
    assert(walked == expect.sorted,
      s"walk skipped or repeated keys:\n got ${walked.size}: $walked\n exp ${expect.size}: ${expect.sorted}")
    // explicitly: no duplicates, and every SURVIVING v2 key not yet
    // walked at churn time was still visited
    assert(walked.distinct == walked)
    assert(v2Keys.sorted.dropWhile(ord.lteq(_, cut)).forall(walked.contains(_)))
  }

  test("duplicates keyset walk across a republish: surviving groups visited exactly once") {
    val root = Files.createTempDirectory("graft-churn-dup").toString
    // 30 groups of 3 copies each — group key (3, size_i, ck_i); sizes
    // distinct so the group order is size DESC within equal counts
    IndexStore.publish(fileRows(0 until 30, copies = 3), root)
    def live() = IndexStore.load(spark, root)
    def walkPage(after: Option[(Long, Long, String)]) =
      FileQueries.duplicateGroupSummariesKeyset(live(), 2, after, 8)
        .select("file_count", "file_size", "checksum").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq

    var walked = Seq.empty[(Long, Long, String)]
    val page1 = walkPage(None)
    walked ++= page1
    var cursor = Some(page1.last)

    // churn: vanish two walked groups and two unwalked groups ENTIRELY
    // (all copies deleted — counts of survivors untouched), add one
    // new 3-copy group sorting into the unwalked tail
    val walkedIds = page1.map(_._3.drop(2).toInt).toSet
    val goneWalked = walkedIds.take(2)
    val goneUnwalked = (0 until 30).filterNot(walkedIds.contains).take(2).toSet
    val survivors = (0 until 30).filterNot(i =>
      goneWalked.contains(i) || goneUnwalked.contains(i))
    // the new group's size is pinned into the UNWALKED range (below
    // the page-1 cursor's size) so the walk must still reach it — a
    // key sorting before the cursor is legitimately behind the walk
    IndexStore.publish(
      fileRows(survivors, copies = 3)
        .unionByName(fileRows(Seq(200), copies = 3)
          .withColumn("file_size", lit(1001L))), root)

    var more = true
    while (more) {
      val page = walkPage(cursor)
      walked ++= page
      if (page.size < 8) more = false else cursor = Some(page.last)
    }

    // every surviving group appears exactly once; vanished unwalked
    // groups are absent; nothing is repeated
    assert(walked.distinct == walked, "a group was repeated across the republish")
    val expectTail = FileQueries.duplicateGroupSummariesKeyset(
        live(), 2, Some(page1.last), pageSize = 1000)
      .select("file_count", "file_size", "checksum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(walked.drop(page1.size) == expectTail,
      "walk after churn diverged from the surviving-group tail")
    goneUnwalked.foreach(i =>
      assert(!walked.exists(_._3 == f"ck$i%04d"), s"vanished group ck$i visited"))
    assert(walked.exists(_._3 == "ck0200"), "new group sorting after the cursor missed")
  }
}
