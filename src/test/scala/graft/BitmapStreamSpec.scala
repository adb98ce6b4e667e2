package graft

import org.apache.spark.sql.functions._

/** The streaming bitmap-distinct contract: segment bit_or state is
  * split-invariant by arithmetic (idempotent + commutative), its
  * cardinality equals the exact batch distinct, and negative keys are
  * quarantined under seg = -1 instead of corrupting segments.
  */
class BitmapStreamSpec extends SparkSpec {

  import graft.streaming.StreamingOps

  test("streamed segment state counts exactly the batch distinct") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bmstream").toString
    val users = Tables.events(spark, sf).select(col("user_id"))
    val exact = users.distinct().count()
    // two overlapping micro-batch files — overlap exercises idempotence
    val mid = users.agg(((min(col("user_id")) + max(col("user_id"))) / 2)
      .cast("long")).head().getLong(0)
    users.filter(col("user_id") <= mid).coalesce(1)
      .write.parquet(s"$dir/in/b0")
    users.filter(col("user_id") >= mid - 5).coalesce(1)
      .write.parquet(s"$dir/in/b1")
    val stream = spark.readStream.schema(users.schema)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .parquet(s"$dir/in/*")
    val q = StreamingOps.bitmapDistinctMaintained(
      stream, "user_id", s"$dir/state", "bm_stream_spec")
    try q.processAllAvailable() finally q.stop()
    val vs = StreamingOps.stateVersions(spark, s"$dir/state")
    assert(vs.size >= 2, s"expected >=2 folded micro-batches, got $vs")
    val state = StreamingOps.latestState(spark, s"$dir/state").get
    assert(StreamingOps.bitmapDistinctCount(state) == exact)
    // state is segment-bounded: no more rows than ceil(keyspace/32)
    val maxSeg = users.agg((max(col("user_id")) / 32).cast("long"))
      .head().getLong(0)
    assert(state.count() <= maxSeg + 2)
    GraftSession.release(spark)
  }

  test("negative keys quarantine under seg = -1 with a running violation count") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bmneg").toString
    Seq(0L, 5L, -3L, 5L, 64L).toDF("k").coalesce(1)
      .write.parquet(s"$dir/in/b0")
    val stream = spark.readStream
      .schema(Seq(0L).toDF("k").schema)
      .parquet(s"$dir/in/*")
    val q = StreamingOps.bitmapDistinctMaintained(
      stream, "k", s"$dir/state", "bm_neg_spec")
    try {
      q.processAllAvailable()
      // a later batch's violations ADD to the quarantine count
      Seq(-7L, -9L, 65L).toDF("k").coalesce(1)
        .write.parquet(s"$dir/in/b1")
      q.processAllAvailable()
    } finally q.stop()
    val state = StreamingOps.latestState(spark, s"$dir/state").get
    assert(StreamingOps.bitmapDistinctCount(state) == 4L) // 0, 5, 64, 65
    // seg = -1 carries the violation-ROW count (-3, -7, -9), not mere presence
    assert(state.filter(col("seg") === -1L)
      .select(col("bits")).head().getLong(0) == 3L)
    GraftSession.release(spark)
  }
}
