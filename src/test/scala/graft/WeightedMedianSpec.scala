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
