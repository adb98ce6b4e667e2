package graft

import org.apache.spark.sql.functions._

/** The streaming daily-revenue trend contract: per-day exact cent sums
  * fold split-invariantly (sum algebra — ANY row partition, ANY
  * order), and the OLS / changepoint / bootstrap consumers equal the
  * batch q125/q124/q127 rows bit-for-bit (shared operators.Trend
  * kernels — the Survival.kmCurve discipline).
  */
class TrendStreamSpec extends SparkSpec {

  import graft.streaming.StreamingOps

  test("interleaved split folds to the batch trend rows bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("graft_trend").toString
    val ord = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
    // three INTERLEAVED batches (orderkey mod — deliberately NOT
    // day-ordered: sum folds need no arrival contract). Explicit
    // write-then-processAllAvailable steps per the round-8 discipline.
    ord.filter(col("o_orderkey") % 3 === 0)
      .coalesce(1).write.parquet(s"$dir/in/b0")
    val stream = spark.readStream.schema(ord.schema)
      .parquet(s"$dir/in/*")
    val q = StreamingOps.dailyCentsMaintained(stream, s"$dir/state",
      "trend_spec")
    try {
      q.processAllAvailable()
      ord.filter(col("o_orderkey") % 3 === 1)
        .coalesce(1).write.parquet(s"$dir/in/b1")
      q.processAllAvailable()
      ord.filter(col("o_orderkey") % 3 === 2)
        .coalesce(1).write.parquet(s"$dir/in/b2")
      q.processAllAvailable()
    } finally q.stop()
    val state = StreamingOps.latestState(spark, s"$dir/state").get
    // one exact-cents row per order day
    assert(state.count() ===
      ord.select(col("o_orderdate").cast("date")).distinct().count())
    def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.collect().toSeq.map(r => (0 until r.length).map(r.get))
    // doubles bit-equal: same kernel over the same exact daily frame
    assert(rows(StreamingOps.olsTrendFrom(state)) ===
      rows(SparkEntry.queries("q125_ols_trend")(spark, sf)))
    assert(rows(StreamingOps.changepointFrom(state)) ===
      rows(SparkEntry.queries("q124_changepoint")(spark, sf)))
    assert(rows(StreamingOps.bootstrapTrendFrom(state)) ===
      rows(SparkEntry.queries("q127_bootstrap_trend")(spark, sf)))
    GraftSession.release(spark)
  }
}
