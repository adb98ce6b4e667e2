package graft

import org.apache.spark.sql.functions._

/** The streaming transition-count contract: cross-batch sequence
  * stitching makes an in-order split fold to the exact batch
  * transition matrix, and the stationary consumer settles to the
  * batch q119 occupancy bit-for-bit.
  */
class TransitionStreamSpec extends SparkSpec {

  import graft.streaming.StreamingOps

  test("2-batch day-split fold equals the batch transition counts and stationary ranks") {
    val dir = java.nio.file.Files.createTempDirectory("graft_trans").toString
    val ev = Tables.events(spark, sf)
      .select(col("ts"), col("user_id"), col("event_type"), col("event_id"))
    val maxDay = ev.agg(max(expr(
      "CAST(datediff(to_date(ts), DATE '1995-01-01') AS BIGINT)")))
      .head().getLong(0)
    // THREE day-split batches (uneven cuts): every user's earlier-batch
    // events precede its later-batch events, so arrival is per-user
    // (us, eid)-non-decreasing — the contract. Two interior boundaries
    // sever TWO transitions per user active across all three spans,
    // and a frontier row must survive an intermediate batch untouched
    // for users silent in it — the 3-split exercises both.
    val cuts = Seq(maxDay - 22, maxDay - 9)
    val dayn = "CAST(datediff(to_date(ts), DATE '1995-01-01') AS BIGINT)"
    // explicit write-then-processAllAvailable steps (the round-8
    // watermark-spec discipline): maxFilesPerTrigger does NOT reliably
    // split pre-written files, and merged triggers would degrade this
    // to not exercising cross-batch frontier stitching at all
    ev.filter(expr(s"$dayn <= ${cuts(0)}"))
      .coalesce(1).write.parquet(s"$dir/in/b0")
    val stream = spark.readStream.schema(ev.schema)
      .parquet(s"$dir/in/*")
    val q = StreamingOps.transitionCountsMaintained(
      stream, s"$dir/state", "trans_spec")
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
    // streamed counts == the batch q79 matrix (the split severed one
    // transition per user active on both sides; stitching restores it)
    val streamed = state.filter(col("user_id").isNull)
      .select(col("src"), col("dst"), col("c")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val batchTruth = SparkEntry.queries("q79_transition_matrix")(spark, sf)
      .select(col("cur"), col("nxt"), col("n")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batchTruth)
    // one frontier row per user ever seen
    val users = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(state.filter(col("user_id").isNotNull).count() === users)
    // the stationary consumer == batch q119 bit-for-bit
    val got = StreamingOps.stationaryFrom(state).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val want = SparkEntry.queries("q119_stationary")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === want)
    GraftSession.release(spark)
  }
}
