package graft

import org.apache.spark.sql.functions._

/** The streaming Holt contract: open-bucket accumulation makes a
  * MID-DAY batch split fold the split day exactly once with its full
  * count, the streamed model equals the batch recurrence over every
  * closed day bit-for-bit, and a day arriving at or before a closed
  * day refuses loudly instead of corrupting the model.
  */
class HoltStreamSpec extends SparkSpec {

  import graft.streaming.StreamingOps

  private def dayN = "CAST(datediff(to_date(ts), DATE '1995-01-01') AS BIGINT)"

  test("mid-day 3-batch split equals the batch fold over closed days") {
    val dir = java.nio.file.Files.createTempDirectory("graft_holt").toString
    val ev = Tables.events(spark, sf)
      .select(col("ts"), col("event_type"), col("user_id"), col("event_id"))
    val maxDay = ev.agg(max(expr(dayN))).head().getLong(0)
    // cut 1 severs a DAY MID-STREAM (noon of maxDay-12): that day's
    // counts span b0/b1 and must merge in the open bucket before
    // folding; cut 2 is a clean day boundary
    val d1 = maxDay - 12
    // explicit write-then-processAllAvailable steps (the round-8
    // watermark-spec discipline): maxFilesPerTrigger does NOT reliably
    // split pre-written files into separate triggers, and two files in
    // one trigger would merge b0+b1 — the split day would fold without
    // exercising the open-bucket stitch this spec exists to prove
    ev.filter(expr(s"$dayN < $d1 OR ($dayN = $d1 AND hour(ts) < 12)"))
      .coalesce(1).write.parquet(s"$dir/in/b0")
    val stream = spark.readStream.schema(ev.schema)
      .parquet(s"$dir/in/*")
    val q = StreamingOps.holtMaintained(stream, s"$dir/state", "holt_spec")
    try {
      q.processAllAvailable()
      ev.filter(expr(s"($dayN = $d1 AND hour(ts) >= 12) OR " +
          s"($dayN > $d1 AND $dayN <= ${maxDay - 5})"))
        .coalesce(1).write.parquet(s"$dir/in/b1")
      q.processAllAvailable()
      ev.filter(expr(s"$dayN > ${maxDay - 5}"))
        .coalesce(1).write.parquet(s"$dir/in/b2")
      q.processAllAvailable()
    } finally q.stop()
    val cur = StreamingOps.holtCurrent(
      StreamingOps.latestState(spark, s"$dir/state").get).collect()
      .map(r => r.getString(0) -> r).toMap
    // in-memory truth: the committed recurrence over days < maxDay
    // (the final day never closes), open bucket = the maxDay count
    import spark.implicits._
    val daily = ev
      .groupBy($"event_type", $"ts".cast("date").as("day"))
      .agg(count(lit(1)).cast("double").as("x"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
    daily.groupBy(_._1).foreach { case (t, rows) =>
      val sorted = rows.sortBy(_._2)
      val closed = sorted.dropRight(1).map(_._3)
      var l = closed.head; var b = 0.0
      closed.tail.foreach { x =>
        val nl = 0.5 * x + 0.5 * (l + b)
        val nb = 0.25 * x - 0.25 * l + 0.75 * b
        l = nl; b = nb
      }
      val r = cur(t)
      assert(r.getAs[Double]("level") === l, t)
      assert(r.getAs[Double]("trend") === b, t)
      assert(r.getAs[Double]("forecast_3") === l + 3.0 * b, t)
      assert(r.getAs[java.sql.Date]("last_day").toString ===
        sorted.dropRight(1).last._2, t)
      assert(r.getAs[java.sql.Date]("open_day").toString ===
        sorted.last._2, t)
      assert(r.getAs[Double]("open_x") === sorted.last._3, t)
    }
    GraftSession.release(spark)
  }

  test("a day at or before a closed day refuses instead of corrupting the model") {
    val dir = java.nio.file.Files.createTempDirectory("graft_holt_l").toString
    val ev = Tables.events(spark, sf)
      .select(col("ts"), col("event_type"), col("user_id"), col("event_id"))
    val maxDay = ev.agg(max(expr(dayN))).head().getLong(0)
    ev.filter(expr(s"$dayN <= $maxDay"))
      .coalesce(1).write.parquet(s"$dir/in/b0")
    val stream = spark.readStream.schema(ev.schema)
      .parquet(s"$dir/in/*")
    val q = StreamingOps.holtMaintained(stream, s"$dir/state", "holt_late")
    // explicit stepping: b0 must fold CLEANLY in its own trigger first
    // (one trigger for both files would double-merge the replayed day
    // into the open bucket with no refusal — a silently vacuous test)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try {
        q.processAllAvailable()
        // b1 replays an OLD day after most days have closed
        ev.filter(expr(s"$dayN = ${maxDay - 20}"))
          .coalesce(1).write.parquet(s"$dir/in/b1")
        q.processAllAvailable()
      } finally q.stop()
    }
    assert(e.getMessage.contains("CLOSED day") ||
      Option(e.getCause).exists(_.getMessage.contains("CLOSED day")),
      e.getMessage)
    // the refusal is observable after the fact on the fold counters
    // (the REST progress endpoint's source): the late-bucket reading
    // that killed the query plus the refusal itself
    val ctr = StreamingOps.foldCounters("holt_late")
    assert(ctr.getOrElse("late_buckets", 0L) >= 1L, ctr.toString)
    assert(ctr.getOrElse("refusals", 0L) >= 1L, ctr.toString)
    assert(ctr.getOrElse("batches_folded", 0L) >= 1L, ctr.toString)
    GraftSession.release(spark)
  }
}
