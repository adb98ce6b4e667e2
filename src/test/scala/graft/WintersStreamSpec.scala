package graft

import org.apache.spark.sql.functions._

/** The streaming Holt-Winters contract: pending closed days accumulate
  * until 7 exist and then init exactly like the batch fold, a mid-day
  * batch split merges its partials before folding, the streamed model
  * equals the batch recurrence over every closed day bit-for-bit, and
  * a day at or before a folded day refuses loudly.
  */
class WintersStreamSpec extends SparkSpec {

  import graft.streaming.StreamingOps

  private def dayN = "CAST(datediff(to_date(ts), DATE '1995-01-01') AS BIGINT)"

  test("4-batch split (pending init + mid-day cut) equals the batch fold over closed days") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hw").toString
    val ev = Tables.events(spark, sf)
      .select(col("ts"), col("event_type"), col("user_id"), col("event_id"))
    val (minDay, maxDay) = {
      val r = ev.agg(min(expr(dayN)), max(expr(dayN))).head()
      (r.getLong(0), r.getLong(1))
    }
    // batch 0 closes only 4 days — BELOW the 7-day init threshold, so
    // they must survive as PENDING rows; batch 1 cuts day d1 at noon
    // (its counts straddle b1/b2 and must merge before folding);
    // batch 3 is a clean tail
    val d1 = maxDay - 12
    val cuts = Seq(
      expr(s"$dayN <= ${minDay + 4}"),
      expr(s"$dayN > ${minDay + 4} AND ($dayN < $d1 OR ($dayN = $d1 AND hour(ts) < 12))"),
      expr(s"($dayN = $d1 AND hour(ts) >= 12) OR ($dayN > $d1 AND $dayN <= ${maxDay - 5})"),
      expr(s"$dayN > ${maxDay - 5}"))
    ev.filter(cuts.head).coalesce(1).write.parquet(s"$dir/in/b0")
    val stream = spark.readStream.schema(ev.schema).parquet(s"$dir/in/*")
    val q = StreamingOps.wintersMaintained(stream, s"$dir/state", "hw_spec")
    try {
      q.processAllAvailable()
      // pending phase: 4 closed days, no model row yet
      val mid = StreamingOps.latestState(spark, s"$dir/state").get
      assert(mid.filter(col("st").isNotNull).count() === 0,
        "no model may exist before 7 days close")
      cuts.tail.zipWithIndex.foreach { case (c, i) =>
        ev.filter(c).coalesce(1).write.parquet(s"$dir/in/b${i + 1}")
        q.processAllAvailable()
      }
    } finally q.stop()
    val state = StreamingOps.latestState(spark, s"$dir/state").get
    val models = state.filter(col("st").isNotNull).collect()
      .map(r => r.getString(0) ->
        ((r.getSeq[Double](3), r.getDate(4).toString))).toMap
    val opens = state.filter(col("st").isNull && col("fc").isNull).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
    val resids = state.filter(col("fc").isNotNull).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getDouble(2), r.getDouble(5)))).toMap
    // in-memory truth: the shared recurrence over closed days (all but
    // the final day, which never closes)
    import spark.implicits._
    val daily = ev
      .groupBy($"event_type", $"ts".cast("date").as("day"))
      .agg(count(lit(1)).cast("double").as("x"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
    daily.groupBy(_._1).foreach { case (t, rows) =>
      val sorted = rows.sortBy(_._2)
      val closed = sorted.dropRight(1).map(_._3)
      assert(closed.length >= 7, s"fixture needs >= 7 closed days for $t")
      val l0 = closed.take(7).foldLeft(0.0)(_ + _) / 7.0
      var st = Array(l0, 0.0) ++ closed.take(7).map(_ - l0)
      val expResid = scala.collection.mutable.Map.empty[String, (Double, Double)]
      sorted.dropRight(1).drop(7).foreach { case (_, day, x) =>
        val l = st(0); val bb = st(1); val s1 = st(2)
        expResid(day) = (x, l + bb + s1) // one-step forecast BEFORE folding
        st = Array(
          0.5 * (x - s1) + 0.5 * (l + bb),
          0.25 * (x - s1) - 0.25 * l + 0.75 * bb) ++
          st.slice(3, 9) :+ (0.25 * x + 0.75 * s1 - 0.25 * l - 0.25 * bb)
      }
      // residual rows: one per folded day, (x, fc) bit-equal to the
      // in-memory recurrence's pre-fold forecast
      val gotResid = resids.collect { case ((tt, d), v) if tt == t => d -> v }
      assert(gotResid === expResid.toMap, s"$t residual rows diverged")
      val (gotSt, gotLast) = models(t)
      assert(gotSt.toSeq === st.toSeq, s"$t model diverged")
      assert(gotLast === sorted.dropRight(1).last._2, t)
      // exactly one OPEN row per type: the final day's full count
      val op = opens.filter(_._1 == t)
      assert(op.length === 1 && op.head._2 === sorted.last._2 &&
        op.head._3 === sorted.last._3, s"$t open row wrong: ${op.toSeq}")
      // the reader's forecast tree == q129's over the same state
      val f3 = StreamingOps.wintersCurrent(
        StreamingOps.latestState(spark, s"$dir/state").get)
        .filter(col("event_type") === t && col("h") === 3L)
        .head().getAs[Double]("forecast")
      assert(f3 === st(0) + 3.0 * st(1) + st(4), t)
      // the residual READER applies the rational k·MAD rule over the
      // accumulated fc rows — replay it in memory
      val rr = StreamingOps.wintersResiduals(state)
        .filter(col("event_type") === t).collect()
        .map(r => r.getDate(1).toString ->
          ((r.getDouble(4), r.getLong(6)))).toMap
      val sortedAbs = expResid.values
        .map(v => math.abs(v._1 - v._2)).toArray.sorted
      val mad = sortedAbs((sortedAbs.length + 1) / 2 - 1)
      expResid.foreach { case (d, (x, fc)) =>
        val res = x - fc
        assert(rr(d)._1 === res, s"$t $d resid")
        assert(rr(d)._2 === (if (math.abs(res) > 5.0 * mad) 1L else 0L),
          s"$t $d flag")
      }
    }
    GraftSession.release(spark)
  }

  test("a day at or before a folded day refuses and the counters record it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hw_l").toString
    val ev = Tables.events(spark, sf)
      .select(col("ts"), col("event_type"), col("user_id"), col("event_id"))
    val maxDay = ev.agg(max(expr(dayN))).head().getLong(0)
    ev.filter(expr(s"$dayN <= $maxDay"))
      .coalesce(1).write.parquet(s"$dir/in/b0")
    val stream = spark.readStream.schema(ev.schema).parquet(s"$dir/in/*")
    val q = StreamingOps.wintersMaintained(stream, s"$dir/state", "hw_late")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try {
        q.processAllAvailable()
        ev.filter(expr(s"$dayN = ${maxDay - 20}"))
          .coalesce(1).write.parquet(s"$dir/in/b1")
        q.processAllAvailable()
      } finally q.stop()
    }
    assert(e.getMessage.contains("CLOSED day") ||
      Option(e.getCause).exists(_.getMessage.contains("CLOSED day")),
      e.getMessage)
    val ctr = StreamingOps.foldCounters("hw_late")
    assert(ctr.getOrElse("late_buckets", 0L) >= 1L, ctr.toString)
    assert(ctr.getOrElse("refusals", 0L) >= 1L, ctr.toString)
    GraftSession.release(spark)
  }
}
