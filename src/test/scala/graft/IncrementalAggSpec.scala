package graft

import org.apache.spark.sql.functions._
import graft.operators.IncrementalAgg
import graft.operators.IncrementalAgg.Agg

class IncrementalAggSpec extends SparkSpec {

  private def aggs = Seq(
    Agg("n", "count", lit(1)),
    Agg("s", "sum", col("v")),
    Agg("mn", "min", col("v")),
    Agg("mx", "max", col("v")))

  test("day-by-day folds equal the one-shot aggregate (new keys appear mid-stream)") {
    import spark.implicits._
    val rows = Seq(
      (1, "a", 10L), (1, "a", 5L), (1, "b", 7L),
      (2, "a", 1L), (2, "c", 100L), // key c first appears on day 2
      (3, "b", -4L), (3, "c", 2L), (3, "a", 8L))
    val df = rows.toDF("day", "k", "v")
    val keys = Seq("k")
    // fold day by day: state(1..n) = merge(state(1..n-1), partial(day n))
    val folded = (2 to 3).foldLeft(
        IncrementalAgg.partial(df.filter($"day" === 1), keys, aggs)) {
      (state, d) =>
        IncrementalAgg.merge(state,
          IncrementalAgg.partial(df.filter($"day" === d), keys, aggs),
          keys, aggs)
    }
    val oneShot = IncrementalAgg.partial(df, keys, aggs)
    val f = folded.orderBy("k").collect().map(_.toSeq).toSeq
    val o = oneShot.orderBy("k").collect().map(_.toSeq).toSeq
    assert(f == o)
    assert(f.map(_.head) == Seq("a", "b", "c"))
  }

  test("merged state is itself a valid state (composition)") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 7, i.toLong)).toDF("k", "v")
    val keys = Seq("k")
    val half = IncrementalAgg.merge(
      IncrementalAgg.partial(df.filter($"v" <= 50), keys, aggs),
      IncrementalAgg.partial(df.filter($"v" > 50 && $"v" <= 80), keys, aggs),
      keys, aggs)
    val full = IncrementalAgg.merge(half,
      IncrementalAgg.partial(df.filter($"v" > 80), keys, aggs), keys, aggs)
    val oneShot = IncrementalAgg.partial(df, keys, aggs)
    assert(full.orderBy("k").collect().map(_.toSeq).toSeq ==
      oneShot.orderBy("k").collect().map(_.toSeq).toSeq)
  }

  test("non-decomposable aggregate kinds are rejected") {
    intercept[IllegalArgumentException] {
      Agg("bad", "median", col("v"))
    }
  }
}
