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

  test("frequent-items sketch: sharded merge == exact counts in exact mode") {
    import graft.functions.GraftFunctions._
    val part = Tables.load(spark, sf, "part")
    val topk = part
      .groupBy(pmod(col("p_partkey"), lit(16)).as("shard"))
      .agg(freq_sketch_agg(col("p_brand"), 128).as("sk"))
      .agg(freq_sketch_merge(col("sk"), 128).as("sk"))
      .select(explode(freq_sketch_topk(col("sk"), 5)).as("t"))
      .select(col("t.item"), col("t.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val exact = part.groupBy(col("p_brand")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("p_brand").asc).limit(5)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(topk.toSeq == exact.toSeq)
  }

  test("frequent-items sketch: over-capacity stream keeps heavy hitters (Misra-Gries bound)") {
    import graft.functions.GraftFunctions._
    import spark.implicits._
    // 2000 distinct light items + one heavy item, map size 64 → far past
    // exact mode; the heavy hitter must survive with est within 3.5·n/64
    val n = 6000
    val df = (0 until n).map(i =>
      if (i % 3 == 0) "HEAVY" else s"item_${i}").toDF("v")
    val Array((item, est)) = df.agg(freq_sketch_agg(col("v"), 64).as("sk"))
      .select(explode(freq_sketch_topk(col("sk"), 1)).as("t"))
      .select(col("t.item"), col("t.est"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val trueCount = n / 3
    assert(item == "HEAVY")
    assert(math.abs(est - trueCount) <= 3.5 * n / 64,
      s"est=$est true=$trueCount")
  }

  test("KLL sketch: exact regime matches sorted-position quantiles; merge == single build") {
    import graft.functions.GraftFunctions._
    val orders = Tables.load(spark, sf, "orders")
    val ranks = Seq(0.1, 0.5, 0.9)
    def quantiles(df: org.apache.spark.sql.DataFrame): Seq[Double] =
      df.select(kll_quantiles(col("sk"), ranks).as("q"))
        .head().getSeq[Double](0)
    // merged per-priority partials
    val merged = quantiles(orders
      .groupBy(col("o_orderpriority"))
      .agg(kll_sketch_agg(col("o_totalprice"), 32768).as("sk"))
      .agg(kll_sketch_merge(col("sk"), 32768).as("sk")))
    // single global build
    val single = quantiles(
      orders.agg(kll_sketch_agg(col("o_totalprice"), 32768).as("sk")))
    assert(merged == single)
    // exact regime: value at 1-based position ceil(r*n) of the sorted col
    val sorted = orders.select(col("o_totalprice")).orderBy(col("o_totalprice"))
      .collect().map(_.getDouble(0))
    val expect = ranks.map(r =>
      sorted(math.ceil(r * sorted.length).toInt - 1))
    assert(merged == expect, s"merged=$merged expect=$expect")
  }

  test("KLL sketch: compacted regime stays within published rank-error bound") {
    import graft.functions.GraftFunctions._
    import spark.implicits._
    val n = 200000
    val df = (1 to n).map(_.toDouble).toDF("x").repartition(8)
    val got = df.agg(kll_sketch_agg(col("x"), 200).as("sk"))
      .select(kll_quantiles(col("sk"), Seq(0.5)).as("q"))
      .head().getSeq[Double](0).head
    // k=200 → ~1.65% normalized rank error at 99% confidence
    assert(math.abs(got - n * 0.5) <= 0.02 * n, s"got=$got")
  }
}
