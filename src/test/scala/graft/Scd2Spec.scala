package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Scd2

/** The incremental SCD2 contract: folding batches in arrival order
  * produces EXACTLY the dimension a full batch rebuild would — open
  * versions absorb same-type continuations, close on type changes,
  * and version numbers stay dense per user.
  */
class Scd2Spec extends SparkSpec {

  private def canon(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4)))
      .sortBy(t => (t._1, t._3)).toSeq

  private lazy val events = Tables.events(spark, sf)
    .select("user_id", "event_type", "ts", "event_id").persist()
  private lazy val full = canon(Scd2.runs(events))

  test("single fold from empty state equals the batch rebuild") {
    assert(canon(Scd2.mergeFold(None, events)) == full)
  }

  test("two- and three-way time splits fold to the batch rebuild") {
    import spark.implicits._
    val ts = events.select(unix_micros($"ts").as("us"))
      .agg(min($"us"), max($"us")).head()
    val (lo, hi) = (ts.getLong(0), ts.getLong(1))
    for (cuts <- Seq(Seq((lo + hi) / 2), Seq(lo + (hi - lo) / 3, lo + 2 * (hi - lo) / 3))) {
      val bounds = (Seq(Long.MinValue) ++ cuts ++ Seq(Long.MaxValue)).sliding(2).toSeq
      val state = bounds.foldLeft(Option.empty[DataFrame]) { case (prev, Seq(a, b)) =>
        val batch = events.filter(unix_micros($"ts") > a && unix_micros($"ts") <= b)
        Some(Scd2.mergeFold(prev, batch).persist())
      }
      assert(canon(state.get) == full, s"fold over cuts $cuts diverged")
    }
    GraftSession.release(spark)
  }

  test("scd2Maintained streams two files into the batch-identical dimension") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2").toString
    val mid = events.select(unix_micros($"ts").as("us"))
      .agg(((min($"us") + max($"us")) / 2).cast("long")).head().getLong(0)
    events.filter(unix_micros($"ts") <= mid).coalesce(1)
      .write.parquet(s"$dir/in/b0")
    events.filter(unix_micros($"ts") > mid).coalesce(1)
      .write.parquet(s"$dir/in/b1")
    // one file per micro-batch, oldest first: the in-order contract
    val stream = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .parquet(s"$dir/in/*")
    val q = graft.streaming.StreamingOps.scd2Maintained(
      stream, s"$dir/state", "scd2_spec")
    try q.processAllAvailable() finally q.stop()
    val vs = graft.streaming.StreamingOps.stateVersions(spark, s"$dir/state")
    assert(vs.size >= 2, s"expected >=2 folded micro-batches, got $vs")
    val finalState = graft.streaming.StreamingOps
      .latestState(spark, s"$dir/state").get
    assert(canon(finalState) == full)
    GraftSession.release(spark)
  }
}
