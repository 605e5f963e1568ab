package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Randomized batch/stream equivalence for the keyed-state event
  * operators, in the style of DedupStreamSpec's replay tests: generate
  * a random event log, deliver it as multiple time-ordered micro-
  * batches (the operators' documented in-order-per-watermark delivery
  * contract), and require the streamed state to equal the batch
  * backfill — not on a hand-built fixture, but on whatever the seed
  * produces.
  *
  * Timestamps are strictly increasing per user so the equivalence is
  * exercised on ordering structure, not tie-break delivery accidents
  * (exact-tie semantics have their own deterministic fixtures in
  * EventsSpec).
  */
class EventsStreamEquivSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  /** Random log: nUsers users, strictly increasing per-user times,
    * weighted view/click/purchase/other mix. */
  private def randomEvents(seed: Long, n: Int, nUsers: Int): Seq[(Long, Timestamp, Long, String, Double, String)] = {
    val rnd = new scala.util.Random(seed)
    val base = Timestamp.valueOf("2024-03-01 08:00:00").getTime
    val lastMs = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(base)
    (1 to n).map { i =>
      val user = 1L + rnd.nextInt(nUsers)
      // 1s..15min per-user gap: some view→click pairs convert (<=10min),
      // some don't — both funnel branches get random coverage
      val t = lastMs(user) + 1000L + rnd.nextInt(15 * 60 * 1000)
      lastMs(user) = t
      val typ = rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 => "view"
        case 4 | 5 | 6     => "click"
        case 7 | 8         => "purchase"
        case _             => "scroll"
      }
      (i.toLong, new Timestamp(t), user, typ, rnd.nextInt(1000) / 100.0, "{}")
    }
  }

  /** Write the log as `nFiles` time-ordered parquet files and open a
    * one-file-per-trigger stream over them. */
  private def asMicroBatches(events: Seq[(Long, Timestamp, Long, String, Double, String)],
      nFiles: Int): DataFrame = {
    val dir = Files.createTempDirectory("graft-evequiv")
    val sorted = events.sortBy(e => (e._2.getTime, e._1))
    val per = math.max(1, math.ceil(sorted.size.toDouble / nFiles).toInt)
    sorted.grouped(per).foreach { chunk =>
      chunk.toDF(cols: _*).coalesce(1).write.mode("append").parquet(dir.toString)
      Thread.sleep(1100) // distinct mtimes → deterministic batch order
    }
    spark.readStream.schema(Events.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
  }

  test("randomized: streamingFunnel final counts equal the batch funnel") {
    val log = randomEvents(seed = 2024L, n = 160, nUsers = 7)
    val batchDf = log.toDF(cols: _*)
    val q = Events.streamingFunnel(spark, asMicroBatches(log, nFiles = 4),
        withinMinutes = 10)
      .toDF().writeStream.format("memory").queryName("equiv_funnel")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    // counts are monotone → the max per user is the final funnel state
    val streamed = spark.table("equiv_funnel").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).max }
    val batch = Events.funnel(batchDf, withinMinutes = 10).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(batch.nonEmpty, "seed must produce at least one converting user")
    batch.foreach { case (u, counts) =>
      assert(streamed.get(u).contains(counts),
        s"user $u: streamed=${streamed.get(u)} batch=$counts")
    }
    // non-converting users: streamed views must still equal the raw count
    val viewsByUser = log.filter(_._4 == "view").groupBy(_._3).view.mapValues(_.size.toLong)
    viewsByUser.foreach { case (u, nViews) =>
      assert(streamed.get(u).map(_._1).contains(nViews),
        s"user $u views: streamed=${streamed.get(u)} expected=$nViews")
      if (!batch.contains(u))
        assert(streamed(u)._2 == 0L, s"user $u converted in stream but not batch")
    }
  }

  test("randomized: streamingTransitions delta counts equal the batch matrix") {
    val log = randomEvents(seed = 7321L, n = 140, nUsers = 6)
    val q = Events.streamingTransitions(spark, asMicroBatches(log, nFiles = 4))
      .toDF().writeStream.format("memory").queryName("equiv_trans")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.table("equiv_trans").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val batch = Events.transitionMatrix(log.toDF(cols: _*)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n")).toMap
    assert(batch.nonEmpty && batch.values.sum > 50)
    assert(streamed == batch,
      s"streamed=$streamed\nbatch=$batch")
  }

  test("randomized: streamingAsof enrichment equals the batch asofPrior backfill") {
    val log = randomEvents(seed = 77L, n = 160, nUsers = 7)
    val batchDf = log.toDF(cols: _*)
    val q = Events.streamingAsof(spark, asMicroBatches(log, nFiles = 4))
      .toDF().writeStream.format("memory").queryName("equiv_asof")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = spark.table("equiv_asof").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val tsById = log.map(e => e._1 -> e._2.getTime * 1000L).toMap
    val batch = Events.asofPrior(batchDf).collect().map { r =>
      val id = r.getAs[Long]("event_id")
      val prior = Option(r.getAs[Any]("gap_us")).map(g => tsById(id) - g.asInstanceOf[Long])
      id -> prior.getOrElse(-1L)
    }.toMap
    assert(batch.nonEmpty, "seed must produce at least one purchase")
    assert(batch.values.exists(_ == -1L) || batch.size > 1) // mix of shapes
    assert(streamed == batch, s"streamed=$streamed\nbatch=$batch")
  }

  test("randomized: streamingGaps delta feed equals the batch lag-window gaps") {
    val log = randomEvents(seed = 4711L, n = 150, nUsers = 6)
    val q = Events.streamingGaps(spark, asMicroBatches(log, nFiles = 4))
      .toDF().writeStream.format("memory").queryName("equiv_gaps")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    // streamed: one (later-event → gap) row per adjacency
    val streamed = spark.table("equiv_gaps").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    // batch ground truth: the same lag window interEventGaps aggregates
    val sorted = log.sortBy(e => (e._3, e._2.getTime, e._1))
    val batch = sorted.sliding(2).collect {
      case Seq(a, b) if a._3 == b._3 =>
        b._1 -> (b._2.getTime - a._2.getTime) * 1000L
    }.toMap
    assert(batch.size > 100, "seed must produce a dense gap set")
    assert(streamed == batch, s"streamed=${streamed.size} batch=${batch.size}")
    // and the aggregate view agrees: per-user n_gaps from the delta
    // feed equals interEventGaps' n_gaps column
    val streamedPerUser = spark.table("equiv_gaps").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
    val agg = Events.interEventGaps(log.toDF(cols: _*)).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_gaps")).toMap
    agg.foreach { case (u, n) =>
      assert(streamedPerUser.getOrElse(u, 0L) == n, s"user $u n_gaps")
    }
  }
}
