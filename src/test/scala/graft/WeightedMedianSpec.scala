package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.WeightedMedian

class WeightedMedianSpec extends SparkSpec {

  test("property: weightedMedian equals the cumulative-weight window idiom") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop}
    val rowsGen = Gen.nonEmptyListOf(for {
      g <- Gen.choose(0, 3)
      v <- Gen.choose(0L, 5L)   // heavy value ties
      w <- Gen.choose(0L, 4L)   // zero weights included
    } yield (g, v, w)).map(_.take(60))
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15),
      Prop.forAll(rowsGen) { rows =>
        val df = rows.zipWithIndex.map { case ((g, v, w), i) => (g, v, w, i.toLong) }
          .toDF("g", "v", "w", "id").repartition(4)
        val byG = Window.partitionBy($"g")
        val ordered = byG.orderBy($"v".asc, $"id".asc)
        val want = df
          .withColumn("cw", sum($"w").over(ordered.rowsBetween(
            Window.unboundedPreceding, Window.currentRow)))
          .withColumn("tw", sum($"w").over(byG))
          .filter($"tw" > 0 && $"cw" * 2 >= $"tw" && ($"cw" - $"w") * 2 < $"tw")
          .select($"g", $"v", $"id", $"tw").collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        val got = WeightedMedian.weightedMedian(df, Seq("g"), "w", "tw",
            $"v".asc, $"id".asc)
          .select($"g", $"v", $"id", $"tw").collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
        got == want
      })
    assert(res.passed, res.status.toString)
  }

  test("cap boundary: 1e6 distinct groups abort from the run-COUNT pre-gate") {
    import spark.implicits._
    // one group per row: a genuinely high-cardinality key, evenly
    // spread so no single partition trips the in-task cap (runs per
    // partition ~ n/partitions < maxGroups) — only the pre-gate can
    // refuse it, and it must do so from run COUNTS alone, before any
    // (partition, group, measure) tuple is collected
    // Derive n and maxGroups from the ACTUAL budget + partition count so
    // the pre-gate condition (parts * (maxGroups+1) > PreGateSkipBudget;
    // floor division makes it hold for any parts) and the abort condition
    // (distinct groups = n > maxGroups) are satisfied by construction: a
    // change to local[k], Parallelism.ensure, or the budget constant must
    // not flip this test to the in-task path (which would fail the
    // message match for an unrelated reason)
    val budget = graft.operators.RangeLadder.PreGateSkipBudget
    val n = 2L * budget
    val df = spark.range(n).select($"id".as("g"), lit(1L).as("w"))
    val parts = df.rdd.getNumPartitions
    val maxGroups = (budget / parts).toInt
    val e = intercept[Exception] {
      WeightedMedian.weightedMedianCapped(df, Seq("g"), "w", "tw",
        maxGroups, $"g".asc)
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(m => m.contains("maxGroups") &&
      m.contains("pre-gate") && m.contains("no tuples collected")),
      chain(e).toString)
  }

  test("zero-total groups emit nothing; singleton group returns its row") {
    import spark.implicits._
    val df = Seq((1, 10L, 0L, 1L), (1, 20L, 0L, 2L), (2, 7L, 3L, 3L))
      .toDF("g", "v", "w", "id")
    val got = WeightedMedian.weightedMedian(df, Seq("g"), "w", "tw",
        $"v".asc, $"id".asc)
      .select($"g", $"v", $"tw").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((2, 7L, 3L)))
  }
}
