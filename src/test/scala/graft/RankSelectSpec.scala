package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.RankSelect

class RankSelectSpec extends SparkSpec {

  test("property: selectRank equals the window idiom on random grouped data") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop}
    val rowsGen = Gen.nonEmptyListOf(for {
      g <- Gen.choose(0, 4)
      v <- Gen.choose(0L, 6L) // narrow range forces heavy ties
    } yield (g, v)).map(_.take(60))
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15),
      Prop.forAll(rowsGen) { rows =>
        val df = rows.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
          .toDF("g", "v", "id").repartition(4)
        val byG = Window.partitionBy($"g")
        val want = df
          .withColumn("rn", row_number().over(byG.orderBy($"v", $"id")))
          .withColumn("n", count(lit(1)).over(byG))
          .filter($"rn" === expr("(n + 1) div 2"))
          .select($"g", $"v", $"id").collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
        val got = RankSelect.discreteMedian(df, Seq("g"), "n", $"v", $"id")
          .select($"g", $"v", $"id").collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
        got == want
      })
    assert(res.passed, res.status.toString)
  }

  // deterministic multi-group data with duplicate values (tie-break
  // must decide) and deliberately unequal group sizes incl. size 1
  private def data = {
    import spark.implicits._
    val rows = for {
      g <- Seq("a", "b", "c")
      i <- 1 to (g match { case "a" => 17; case "b" => 8; case _ => 1 })
    } yield (g, (i * 37 % 11).toLong, i.toLong)
    rows.toDF("g", "v", "id").repartition(5)
  }

  test("selectRank matches the window row_number idiom exactly") {
    import spark.implicits._
    val byG = Window.partitionBy($"g")
    val want = data
      .withColumn("rn", row_number().over(byG.orderBy($"v", $"id")))
      .withColumn("n", count(lit(1)).over(byG))
      .filter($"rn" === expr("(n + 1) div 2"))
      .select($"g", $"v", $"id", $"n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val got = RankSelect
      .discreteMedian(data, Seq("g"), "n", $"v", $"id")
      .select($"g", $"v", $"id", $"n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    assert(got.size == 3) // one median row per group
  }

  test("arbitrary rank functions: min and max of each group") {
    import spark.implicits._
    val first = RankSelect.selectRank(data, Seq("g"), _ => 1L, "n", $"v", $"id")
      .select($"g", $"v").as[(String, Long)].collect().toMap
    val last = RankSelect.selectRank(data, Seq("g"), n => n, "n", $"v", $"id")
      .select($"g", $"v").as[(String, Long)].collect().toMap
    val mn = data.groupBy($"g").agg(min(struct($"v", $"id")).as("s"))
      .select($"g", $"s.v").as[(String, Long)].collect().toMap
    val mx = data.groupBy($"g").agg(max(struct($"v", $"id")).as("s"))
      .select($"g", $"s.v").as[(String, Long)].collect().toMap
    assert(first == mn)
    assert(last == mx)
  }

  test("multi-rank selection matches per-rank window selections, colliding labels both emit") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val byG = Window.partitionBy($"g")
    def windowAt(num: Long, den: Long) = data
      .withColumn("rn", row_number().over(byG.orderBy($"v", $"id")))
      .withColumn("n", count(lit(1)).over(byG))
      .filter($"rn" === greatest(lit(1L),
        expr(s"(n * $num + $den - 1) div $den")))
      .select($"g", $"v", $"id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val got = RankSelect.discreteQuantiles(data, Seq("g"),
        Seq(("p25", 1L, 4L), ("p50", 1L, 2L), ("p75", 3L, 4L)), "q", "n",
        $"v", $"id")
      .collect().map(r => (r.getString(3),
        (r.getString(0), r.getLong(1), r.getLong(2)))).toSet
    val want = Set("p25" -> (1L, 4L), "p50" -> (1L, 2L), "p75" -> (3L, 4L))
      .flatMap { case (l, (nu, de)) => windowAt(nu, de).map(l -> _) }
    assert(got == want)
    // group c has n=1: all three quantile ranks collide on rank 1 and
    // each label must still emit its own row
    assert(got.count(_._2._1 == "c") == 3)
  }

  test("group-count cap aborts with guidance before driver-unsafe collect") {
    import spark.implicits._
    val many = (1 to 5000).map(i => (i, (i * 7 % 101).toLong)).toDF("g", "v")
    val e = intercept[Exception] {
      RankSelect.selectRanksCapped(many, Seq("g"),
        n => Seq("med" -> (n + 1) / 2), null, "n", 50, $"v")
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(m =>
      m.contains("maxGroups") && m.contains("windowRanks")), chain(e).toString)
  }

  test("windowRanks (high-cardinality fallback) selects identically to selectRanks") {
    import spark.implicits._
    val quantiles = Seq(("p25", 1L, 4L), ("p50", 1L, 2L), ("p75", 3L, 4L))
    def ranksOf(n: Long) = quantiles.map { case (l, nu, de) =>
      l -> math.max(1L, (n * nu + de - 1L) / de)
    }
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select($"g", $"v", $"id", $"q", $"n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4))).toSet
    val viaRange = canon(RankSelect.selectRanks(
      data, Seq("g"), ranksOf, "q", "n", $"v", $"id"))
    val viaWindow = canon(RankSelect.windowRanks(
      data, Seq("g"), ranksOf, "q", "n", $"v", $"id"))
    assert(viaWindow == viaRange)
    assert(viaWindow.nonEmpty)
  }

  test("q110 fallback: RankSelect decile cuts == KLL exact-regime cuts") {
    // q110_decile_gain switches from KLL (exact while n <= 65535) to the
    // RankSelect ladder above the sketch's max-k ceiling; both select the
    // value at 1-based rank ceil(q*n) (== DuckDB quantile_disc), so the
    // cuts — and therefore the oracle-gated output — are identical. Pin
    // that identity on real customer data where both paths run.
    import spark.implicits._
    import graft.functions.GraftFunctions._
    val cust = graft.Tables.load(spark, sf, "customer")
    val n = cust.count()
    val viaKll = cust
      .agg(kll_sketch_agg($"c_acctbal", math.max(8L, n).toInt).as("sk"))
      .select(kll_quantiles($"sk", (1 to 9).map(_ / 10.0)).as("q"))
      .head().getSeq[Double](0)
    val viaLadder = RankSelect.discreteQuantilesCapped(
        cust.select($"c_acctbal".cast("double").as("v")).withColumn("g", lit(1)),
        Seq("g"), (1 to 9).map(i => (s"q$i", i.toLong, 10L)), "q", "n", 16, $"v")
      .select($"q", $"v").collect()
      .sortBy(_.getString(0)).map(_.getDouble(1)).toSeq
    assert(viaLadder == viaKll.toSeq)
  }

  test("group sizes are reported and out-of-range ranks emit nothing") {
    import spark.implicits._
    val ns = RankSelect.discreteMedian(data, Seq("g"), "n", $"v", $"id")
      .select($"g", $"n").as[(String, Long)].collect().toMap
    assert(ns == Map("a" -> 17L, "b" -> 8L, "c" -> 1L))
    val none = RankSelect.selectRank(data, Seq("g"), n => n + 1, "n", $"v", $"id")
    assert(none.count() == 0)
  }

  test("property: PrefixSum.exclusive equals the window running sum") {
    // the q131 plan's kernel (round 14): exclusive prefix over a total
    // order at full parallelism == sum() OVER (ORDER BY ... ROWS
    // BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) on unique keys
    import spark.implicits._
    import org.scalacheck.{Gen, Prop}
    val rowsGen = Gen.nonEmptyListOf(Gen.choose(0L, 50L)).map(_.take(80))
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(15),
      Prop.forAll(rowsGen) { ms =>
        val df = ms.zipWithIndex.map { case (m, i) => (i.toLong, m) }
          .toDF("k", "m").repartition(5)
        val want = df
          .withColumn("p", coalesce(sum($"m").over(
            Window.orderBy($"k").rowsBetween(Long.MinValue, -1)), lit(0L)))
          .select($"k", $"p").as[(Long, Long)].collect().toMap
        val got = graft.operators.PrefixSum
          .exclusive(df, "m", "p", $"k".asc)
          .select($"k", $"p").as[(Long, Long)].collect().toMap
        got == want
      })
    assert(res.passed, res.status.toString)
  }
}
