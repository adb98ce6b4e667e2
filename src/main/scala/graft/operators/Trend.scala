package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Daily-series trend analytics over a `(day, y)` frame (exact BIGINT
  * cents per day) — the ONE definition shared by the batch queries
  * (q124_changepoint / q125_ols_trend / q127_bootstrap_trend) and the
  * streaming `StreamingOps.dailyCentsMaintained` consumers (the
  * Survival.kmCurve discipline: a shared kernel makes streamed ==
  * batch impossible to drift). All inputs are exact integers; every
  * double is produced by ONE fixed arithmetic tree (see each query's
  * scaladoc for the cross-engine argument). Everything here runs on
  * the days-bounded frame — callers own the one corpus-scale rollup.
  */
object Trend {

  /** The committed Holt-Winters recurrence (α = β = γ = 1/2, weekly
    * season) over a 9-element [l, b, s1..s7] double-array accumulator
    * — ONE definition shared by batch q129_winters and the streaming
    * `StreamingOps.wintersMaintained` fold. Every slot is an EXPANDED
    * independent tree (the round-12 struct-mutation rule applied to
    * arrays): l′ = 0.5(x−s1)+0.5(l+b); b′ = 0.25(x−s1)−0.25l+0.75b;
    * s′ = 0.25x+0.75s1−0.25l−0.25b; the season queue rotates.
    */
  private val updArray: String = """array(
    0.5D * (x - element_at(acc, 3))
      + 0.5D * (element_at(acc, 1) + element_at(acc, 2)),
    0.25D * (x - element_at(acc, 3))
      - 0.25D * element_at(acc, 1) + 0.75D * element_at(acc, 2),
    element_at(acc, 4), element_at(acc, 5), element_at(acc, 6),
    element_at(acc, 7), element_at(acc, 8), element_at(acc, 9),
    0.25D * x + 0.75D * element_at(acc, 3)
      - 0.25D * element_at(acc, 1) - 0.25D * element_at(acc, 2))"""

  val wintersUpd: String = s"(acc, x) -> $updArray"

  /** [[wintersUpd]] extended with a one-step-ahead FORECAST tail: the
    * accumulator is [l, b, s1..s7] ++ (forecasts so far), and each
    * step appends l + b + s1 — the model's prediction for the incoming
    * day, read BEFORE folding it — so position j of the tail is the
    * one-step forecast for the j-th folded day. Built from the same
    * `updArray` text as [[wintersUpd]], so the 9 state slots cannot
    * drift between the plain and residual folds. All reads come from
    * the incoming `acc` (the round-12 list-accumulator rule).
    */
  val wintersResidUpd: String = s"""(acc, x) -> concat($updArray,
    slice(acc, 10, CAST(size(acc) - 9 AS INT)),
    array(element_at(acc, 1) + element_at(acc, 2) + element_at(acc, 3)))"""

  /** Init + fold of the Winters state over a day-ordered xs double
    * array with ≥ 7 elements: l₀ = strict-fold mean of the first 7,
    * sᵢ = xᵢ − l₀, b₀ = 0, then the recurrence over elements 8..n
    * (none when n = 7 — the init IS the model). Every slot's l₀ is
    * GENERATED from one expression constant so the 8 textual
    * occurrences cannot drift (re-evaluation is immaterial: the fold
    * runs on ≤|types| day-bounded arrays).
    */
  def wintersFoldSql(xs: String): String = {
    val l0 = s"aggregate(slice($xs, 1, 7), CAST(0.0 AS DOUBLE), " +
      "(a, x) -> a + x) / 7.0D"
    val seasons = (1 to 7)
      .map(i => s"element_at($xs, $i) - $l0").mkString(",\n        ")
    s"""aggregate(
      slice($xs, 8, CAST(size($xs) - 7 AS INT)),
      array($l0,
        CAST(0.0 AS DOUBLE),
        $seasons),
      $wintersUpd)"""
  }

  /** [[wintersFoldSql]] with the [[wintersResidUpd]] recurrence: the
    * result is [l, b, s1..s7] ++ one-step forecasts for days 8..n —
    * slice(·, 1, 9) is exactly the plain fold's model, slice(·, 10, …)
    * aligns with xs positions 8..n.
    */
  def wintersResidSql(xs: String): String = {
    val l0 = s"aggregate(slice($xs, 1, 7), CAST(0.0 AS DOUBLE), " +
      "(a, x) -> a + x) / 7.0D"
    val seasons = (1 to 7)
      .map(i => s"element_at($xs, $i) - $l0").mkString(",\n        ")
    s"""aggregate(
      slice($xs, 8, CAST(size($xs) - 7 AS INT)),
      array($l0,
        CAST(0.0 AS DOUBLE),
        $seasons),
      $wintersResidUpd)"""
  }

  /** MAD anomaly flags over a one-step-residual frame
    * (event_type, day, x, fc, resid) — the tail SHARED by batch
    * q134_winters_resid and the streaming
    * `StreamingOps.wintersResiduals` reader. The threshold is the
    * RATIONAL k·MAD rule (k = 5 by default, no 1.4826σ scaling — libm-
    * free, so both engines replay it): MAD is the ceil(m/2)-th
    * smallest |resid| (the q68 quantile_disc rank rule), selected from
    * one sorted double array — bit-stable across engines. mad = 0
    * (over half the residuals exactly zero) flags every nonzero
    * residual; deterministic on both sides.
    */
  def madFlags(resid: DataFrame, k: Double = 5.0): DataFrame = {
    val mads = resid.groupBy(col("event_type"))
      .agg(expr("array_sort(collect_list(abs(resid)))").as("sr"))
      .select(col("event_type"),
        expr("element_at(sr, CAST((size(sr) + 1) DIV 2 AS INT))").as("mad"))
    resid.join(broadcast(mads), "event_type")
      .select(col("event_type"), col("day"), col("x"), col("fc"),
        col("resid"), col("mad"),
        (abs(col("resid")) > lit(k) * col("mad"))
          .cast("long").as("is_anomaly"))
  }

  /** Single mean-shift changepoint: top-1 split by between-segment
    * gain (q124's tail). Input (day, y); one row out.
    */
  def changepoint(daily: DataFrame): DataFrame = {
    val w = Window.orderBy(col("day"))
    val idx = daily
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("s1", sum(col("y"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
    idx.crossJoin(broadcast(tot))
      .filter(col("i") < col("n"))
      .withColumn("n1", col("i"))
      .withColumn("n2", col("n") - col("i"))
      .withColumn("mean_left",
        col("s1").cast("double") / col("n1").cast("double"))
      .withColumn("mean_right",
        (col("s") - col("s1")).cast("double") / col("n2").cast("double"))
      .withColumn("diff", col("mean_left") - col("mean_right"))
      .withColumn("gain",
        (col("n1").cast("double") * col("n2").cast("double")
          / col("n").cast("double")) * (col("diff") * col("diff")))
      .select(col("day").as("split_day"), col("i").as("t"),
        col("n1").as("n_left"), col("n2").as("n_right"),
        col("mean_left"), col("mean_right"), col("gain"))
      .orderBy(col("gain").desc, col("t").asc)
      .limit(1)
  }

  /** Closed-form OLS slope/intercept/R² on the day index (q125's
    * tail). Input (day, y); one row out.
    */
  def olsTrend(daily: DataFrame): DataFrame = {
    val idx = daily
      .withColumn("i", row_number().over(Window.orderBy(col("day"))).cast("long"))
    val m = idx.agg(
      count(lit(1)).as("n"),
      sum(col("i")).as("sx"),
      sum(col("i") * col("i")).as("sx2"),
      sum(col("y")).as("sy"),
      sum(col("i") * col("y")).as("sxy"),
      // y² can exceed 2^63 in cents² at corpus scale: exact decimal
      // sum (== DuckDB HUGEINT), one cast to double at the END
      sum(col("y").cast("decimal(38,0)") * col("y").cast("decimal(38,0)"))
        .as("sy2"))
    m.withColumn("nd", col("n").cast("double"))
      .withColumn("sxd", col("sx").cast("double"))
      .withColumn("syd", col("sy").cast("double"))
      .withColumn("sxx",
        col("nd") * col("sx2").cast("double") - col("sxd") * col("sxd"))
      .withColumn("sxyc",
        col("nd") * col("sxy").cast("double") - col("sxd") * col("syd"))
      .withColumn("syy",
        col("nd") * col("sy2").cast("double") - col("syd") * col("syd"))
      .withColumn("slope",
        when(col("sxx") > 0.0, col("sxyc") / col("sxx")).otherwise(lit(null)))
      .select(
        col("n").as("n_days"),
        col("slope").as("slope_cents_per_day"),
        when(col("sxx") > 0.0,
          (col("syd") - col("slope") * col("sxd")) / col("nd"))
          .otherwise(lit(null)).as("intercept_cents"),
        when(col("sxx") > 0.0 && col("syy") > 0.0,
          (col("sxyc") * col("sxyc")) / (col("sxx") * col("syy")))
          .otherwise(lit(null)).as("r2"))
  }

  /** Deterministic pair-bootstrap CI for the OLS slope (q127's tail):
    * `b` resamples with committed-constant hash draw indices, exact
    * per-resample moment sums, ceil-rank CI. Input (day, y); one row.
    * `persistDays` caches the indexed series for the double consume
    * (draw grid + join side) — right when `daily` is a fact-table
    * rollup (batch q127; released by the between-queries sweep), but
    * a LONG-LIVED caller reading a cheap state frame repeatedly
    * (StreamingOps.bootstrapTrendFrom) passes false: each call would
    * otherwise leak one cached frame into executor storage with no
    * release() between calls (the round-6 old-gen-pressure class).
    */
  def bootstrapTrend(daily: DataFrame, b: Int,
      persistDays: Boolean = true): DataFrame = {
    val idx0 = daily
      .withColumn("i", row_number().over(Window.orderBy(col("day"))).cast("long"))
      .select(col("i"), col("y"))
    val idx = if (persistDays) idx0.persist() else idx0
    val tot = idx.agg(count(lit(1)).as("n"))
    val draws = idx.select(col("i").as("j"))
      .crossJoin(broadcast(tot))
      .select(col("j"), col("n"),
        explode(sequence(lit(1L), lit(b.toLong))).as("b"))
      .select(col("b"),
        ((lit(2654435761L) * col("b") + lit(1013904223L) * col("j"))
          % col("n") + 1L).as("i"))
    val slopes = draws.join(idx, "i")
      .groupBy(col("b"))
      .agg(count(lit(1)).as("m"), sum(col("i")).as("sx"),
        sum(col("i") * col("i")).as("sx2"), sum(col("y")).as("sy"),
        sum(col("i") * col("y")).as("sxy"))
      .withColumn("md", col("m").cast("double"))
      .withColumn("sxd", col("sx").cast("double"))
      .withColumn("sxx",
        col("md") * col("sx2").cast("double") - col("sxd") * col("sxd"))
      .withColumn("slope",
        when(col("sxx") > 0.0,
          (col("md") * col("sxy").cast("double")
            - col("sxd") * col("sy").cast("double")) / col("sxx"))
          .otherwise(lit(null)))
      .filter(col("slope").isNotNull)
    slopes
      .agg(array_sort(collect_list(col("slope"))).as("sl"))
      // empty-resample guard: if EVERY resample is degenerate (all
      // slopes null — e.g. one distinct order day) the array is empty
      // and element_at would throw under ANSI where the oracle yields
      // null — emit null bounds instead (oracle CASE-guards identically)
      .select(size(col("sl")).cast("long").as("n_resamples"),
        when(size(col("sl")) > 0, element_at(col("sl"),
          greatest(ceil(lit(0.025) * size(col("sl"))), lit(1)).cast("int")))
          .as("slope_lo"),
        when(size(col("sl")) > 0,
          element_at(col("sl"), ceil(lit(0.975) * size(col("sl"))).cast("int")))
          .as("slope_hi"))
  }
}
