package graft

import org.apache.spark.sql.functions._
import graft.streaming.{EventRow, StreamingOps}

/** Native session_window vs the explicit flatMapGroupsWithState
  * sessionization — same gap semantics, two formulations.
  */
class SessionWindowSpec extends SparkSpec {

  test("batch session_window sessions equal the stateful sessionize partition") {
    import spark.implicits._
    val gapMin = 30
    // batch frame through the same op the stream uses
    val sessions = StreamingOps.sessionWindowAgg(
      Tables.events(spark, sf), s"$gapMin minutes")
      .select($"user_id", $"first_us", $"last_us", $"n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // independent gap-walk: sort each user's event times, split on gaps
    val byUser = Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toList).toMap
    val gapUs = gapMin * 60L * 1000000L
    val want = byUser.flatMap { case (u, ts) =>
      val sessions = scala.collection.mutable.ArrayBuffer.empty[List[Long]]
      var cur = List.empty[Long]
      ts.foreach { t =>
        if (cur.nonEmpty && t - cur.last >= gapUs) { sessions += cur; cur = Nil }
        cur = cur :+ t
      }
      if (cur.nonEmpty) sessions += cur
      sessions.map(sess => (u, sess.head, sess.last, sess.length.toLong))
    }.toSet
    assert(sessions == want)
  }

  test("streaming session_window emits closed sessions consistent with batch") {
    val stream = StreamingOps.eventsStream(spark, sf)
    val q = StreamingOps.sessionWindowAgg(stream, "30 minutes")
      .writeStream.format("memory").queryName("sess_win")
      .outputMode("complete").start()
    q.processAllAvailable()
    val streamed = spark.sql(
      "SELECT user_id, first_us, last_us, n_events FROM sess_win")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    q.stop()
    val batch = StreamingOps.sessionWindowAgg(
      Tables.events(spark, sf), "30 minutes")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("first_us"),
        org.apache.spark.sql.functions.col("last_us"),
        org.apache.spark.sql.functions.col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(streamed == batch)
  }
}
