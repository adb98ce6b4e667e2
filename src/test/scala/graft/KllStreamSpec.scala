package graft

import org.apache.spark.sql.functions._

/** The streaming quantile contract: per-key KLL state folds
  * split-invariantly (sketch-union algebra — any row partition, any
  * order), and in the exact regime the streamed quantiles equal the
  * batch quantile_disc values bit-for-bit (the q68 INCLUSIVE rule).
  */
class KllStreamSpec extends SparkSpec {

  import graft.streaming.StreamingOps

  private val ranks = Seq(0.25, 0.5, 0.9, 0.99)

  test("streamed per-key quantiles equal batch quantile_disc in the exact regime") {
    val dir = java.nio.file.Files.createTempDirectory("graft_kll").toString
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value"), col("event_id"))
    // three arbitrary row-partitioned batches (NOT time-ordered:
    // sketch-union needs no arrival contract, unlike the dedup folds)
    ev.filter(col("event_id") % 3 === 0)
      .coalesce(1).write.parquet(s"$dir/in/b0")
    ev.filter(col("event_id") % 3 === 1)
      .coalesce(1).write.parquet(s"$dir/in/b1")
    ev.filter(col("event_id") % 3 === 2)
      .coalesce(1).write.parquet(s"$dir/in/b2")
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(s"$dir/in/*")
    // k = 32768 >> rows per key at sf0.001 (the library caps k at
    // 65535 — the q110 ceiling): the sketch retains every value, so
    // INCLUSIVE quantiles are exact (the committed regime)
    val q = StreamingOps.kllMaintained(stream, "event_type", "value",
      s"$dir/state", "kll_spec", k = 32768)
    try q.processAllAvailable() finally q.stop()
    // 3 batches folded; retainVersions = 2 prunes the oldest dir
    assert(StreamingOps.stateVersions(spark, s"$dir/state").size === 2)
    val got = StreamingOps.kllQuantilesFrom(
      StreamingOps.latestState(spark, s"$dir/state").get, ranks)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    // batch truth: ceil(q·n) 1-based discrete quantile per key (the
    // probed quantile_disc rule, q68 discipline)
    val byKey = ev.select(col("event_type"), col("value").cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    byKey.foreach { case (key, vs) =>
      ranks.foreach { r =>
        val want = vs(math.max(math.ceil(r * vs.length).toInt, 1) - 1)
        assert(got((key, r)) === want, s"$key@$r")
      }
    }
    GraftSession.release(spark)
  }
}
