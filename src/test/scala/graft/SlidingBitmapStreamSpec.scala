package graft

import org.apache.spark.sql.functions._

/** The streaming trailing-window distinct contract: per-day segment
  * state folds split-invariantly under in-order day arrival, the
  * final window count equals the batch truth, pruning bounds state to
  * the window, and cross-day re-merge counts each user once.
  */
class SlidingBitmapStreamSpec extends SparkSpec {

  import graft.streaming.StreamingOps

  private val WinDays = 7

  test("streamed trailing-window state equals the batch distinct and stays bounded") {
    val dir = java.nio.file.Files.createTempDirectory("graft_slbm").toString
    val ev = Tables.events(spark, sf).select(col("ts"), col("user_id"))
    // batch truth for the final trailing window
    val maxDay = ev.agg(max(expr(
      "CAST(datediff(to_date(ts), DATE '1995-01-01') AS BIGINT)")))
      .head().getLong(0)
    val truth = ev.filter(expr(
        s"CAST(datediff(to_date(ts), DATE '1995-01-01') AS BIGINT) > ${maxDay - WinDays}"))
      .select(col("user_id")).distinct().count()
    // two micro-batches split by DAY (in-order day arrival contract)
    val mid = maxDay - 10
    ev.filter(expr(
        s"CAST(datediff(to_date(ts), DATE '1995-01-01') AS BIGINT) <= $mid"))
      .coalesce(1).write.parquet(s"$dir/in/b0")
    ev.filter(expr(
        s"CAST(datediff(to_date(ts), DATE '1995-01-01') AS BIGINT) > $mid"))
      .coalesce(1).write.parquet(s"$dir/in/b1")
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(s"$dir/in/*")
    val q = StreamingOps.slidingDistinctMaintained(
      stream, "ts", "user_id", WinDays, s"$dir/state", "slbm_spec")
    try q.processAllAvailable() finally q.stop()
    assert(StreamingOps.stateVersions(spark, s"$dir/state").size >= 2)
    val state = StreamingOps.latestState(spark, s"$dir/state").get
    assert(StreamingOps.slidingDistinctCount(state) == truth)
    // pruning bound: no day older than the window survives
    val days = state.select(col("dayn")).distinct().collect().map(_.getLong(0))
    assert(days.forall(_ > maxDay - WinDays), s"stale days in state: ${days.toSeq}")
    assert(days.length <= WinDays)
    GraftSession.release(spark)
  }

  test("cross-day re-merge counts a multi-day user once") {
    import spark.implicits._
    // user 5 active on two days inside the window; user 70 on one
    val state = Seq((100L, 0L, 1L << 5), (101L, 0L, 1L << 5),
      (101L, 2L, 1L << 6)).toDF("dayn", "seg", "bits")
    assert(graft.streaming.StreamingOps.slidingDistinctCount(state) == 2L)
  }

  test("streamed stickinessCurrent equals the batch q121 row of the final day") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stick").toString
    val ev = Tables.events(spark, sf).select(col("ts"), col("user_id"))
    val maxDay = ev.agg(max(expr(
      "CAST(datediff(to_date(ts), DATE '1995-01-01') AS BIGINT)")))
      .head().getLong(0)
    val mid = maxDay - 10
    ev.filter(expr(
        s"CAST(datediff(to_date(ts), DATE '1995-01-01') AS BIGINT) <= $mid"))
      .coalesce(1).write.parquet(s"$dir/in/b0")
    ev.filter(expr(
        s"CAST(datediff(to_date(ts), DATE '1995-01-01') AS BIGINT) > $mid"))
      .coalesce(1).write.parquet(s"$dir/in/b1")
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(s"$dir/in/*")
    // windowDays = 28 is the standard DAU/MAU(28) operating point —
    // the same window the batch q121_stickiness trailing join uses
    val q = StreamingOps.slidingDistinctMaintained(
      stream, "ts", "user_id", 28, s"$dir/state", "stick_spec")
    try q.processAllAvailable() finally q.stop()
    val state = StreamingOps.latestState(spark, s"$dir/state").get
    val (dau, mau, stick) = StreamingOps.stickinessCurrent(state)
    // batch truth: q121's row for the corpus' final day
    val last = SparkEntry.queries("q121_stickiness")(spark, sf)
      .orderBy(col("day").desc).limit(1).head()
    assert(dau === last.getAs[Long]("dau"))
    assert(mau === last.getAs[Long]("mau28"))
    assert(stick === last.getAs[Double]("stickiness"))
    // degenerate contract: empty state reads (0, 0, 0.0), no divide
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Long)].toDF("dayn", "seg", "bits")
    assert(StreamingOps.stickinessCurrent(empty) === ((0L, 0L, 0.0)))
    GraftSession.release(spark)
  }
}
