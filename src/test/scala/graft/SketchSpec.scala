package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchSpec extends SparkSpec {

  test("partial HLL sketches re-aggregate to any grain without rescans") {
    val ev = Tables.events(spark, sf).withColumn("d", col("ts").cast("date"))
    val daily = Sketches.hllPartial(ev, Seq("d"), "user_id")

    // exact range: merged estimate == exact distinct
    val merged = Sketches.hllMergeEstimate(daily, Seq.empty, "n")
      .head().getLong(0)
    val exact = ev.agg(countDistinct(col("user_id"))).head().getLong(0)
    assert(merged == exact, s"merged=$merged exact=$exact")

    // per-day estimates equal exact per-day distincts
    val perDayEst = Sketches.hllMergeEstimate(daily, Seq("d"), "n")
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val perDayExact = ev.groupBy(col("d"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(perDayEst == perDayExact)

    // coarser re-merge (weekly) from the same partials
    val weekly = Sketches.hllMergeEstimate(
      daily.withColumn("w", weekofyear(col("d"))), Seq("w"), "n")
    assert(weekly.count() > 1)
  }
}
