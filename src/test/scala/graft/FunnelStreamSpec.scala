package graft

import org.apache.spark.sql.functions._

/** The streaming funnel contract: under per-user non-decreasing
  * event-time arrival, the chained stage mins (click strictly after
  * view, purchase strictly after click) fold incrementally to the
  * exact batch q46 funnel — a stage time set in an earlier batch is
  * immutable, a null stage fills from the first qualifying event.
  */
class FunnelStreamSpec extends SparkSpec {

  import graft.streaming.StreamingOps

  test("3-way time split folds to the batch funnel frame") {
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel").toString
    val ev = Tables.events(spark, sf)
      .select(col("ts"), col("user_id"), col("event_type"), col("event_id"))
    val maxDay = ev.agg(max(expr(
      "CAST(datediff(to_date(ts), DATE '1995-01-01') AS BIGINT)")))
      .head().getLong(0)
    // global time cuts => per-user in-order arrival (the contract);
    // uneven cuts so stages regularly straddle batch boundaries
    val dayn = "CAST(datediff(to_date(ts), DATE '1995-01-01') AS BIGINT)"
    val cuts = Seq(maxDay - 22, maxDay - 9)
    // explicit write-then-processAllAvailable steps (the round-8
    // watermark-spec discipline): maxFilesPerTrigger does NOT reliably
    // split pre-written files, and merged triggers would degrade this
    // to not exercising cross-batch stage chaining at all
    ev.filter(expr(s"$dayn <= ${cuts(0)}"))
      .coalesce(1).write.parquet(s"$dir/in/b0")
    val stream = spark.readStream.schema(ev.schema)
      .parquet(s"$dir/in/*")
    val q = StreamingOps.funnelMaintained(stream, s"$dir/state", "funnel_spec")
    try {
      q.processAllAvailable()
      ev.filter(expr(s"$dayn > ${cuts(0)} AND $dayn <= ${cuts(1)}"))
        .coalesce(1).write.parquet(s"$dir/in/b1")
      q.processAllAvailable()
      ev.filter(expr(s"$dayn > ${cuts(1)}"))
        .coalesce(1).write.parquet(s"$dir/in/b2")
      q.processAllAvailable()
    } finally q.stop()
    val state = StreamingOps.latestState(spark, s"$dir/state").get
    def key(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      def opt(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      r.getLong(0) -> ((opt(1), opt(2), opt(3)))
    }.toMap
    val got = key(state.select(col("user_id"), col("t_view"),
      col("t_click"), col("t_purchase")))
    // batch truth on non-null users (the fold's subject-identity
    // contract; the fixture has none regardless)
    val want = key(SparkEntry.queries("q46_funnel")(spark, sf)
      .filter(col("user_id").isNotNull))
    assert(got === want)
    // the split genuinely exercises cross-batch chaining: some user
    // opened the funnel in batch 0 and advanced a stage in a LATER
    // batch (otherwise the test proves nothing about stitching)
    val viewDay = expr("CAST(datediff(to_date(timestamp_micros(t_view)), " +
      "DATE '1995-01-01') AS BIGINT)")
    val lateDay = expr("CAST(datediff(to_date(timestamp_micros(" +
      "coalesce(t_purchase, t_click))), DATE '1995-01-01') AS BIGINT)")
    val crossers = state.filter(col("t_click").isNotNull)
      .filter(viewDay <= cuts(0) && lateDay > cuts(0))
    assert(crossers.count() > 0, "no user straddles the first cut")
    GraftSession.release(spark)
  }
}
