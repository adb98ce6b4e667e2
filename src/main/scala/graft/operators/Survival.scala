package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kaplan-Meier survival curve — the ONE definition shared by batch
  * `q118_survival` and the streaming `StreamingOps.survivalFrom`
  * consumer (the Markov.stationaryRanks discipline: a shared kernel
  * makes the streamed-equals-batch contract impossible to drift).
  *
  * Input `lt`: one row per subject with `t` (long lifetime) and
  * `is_event` (1 = event at t, 0 = right-censored at t). Output: one
  * row per observed t with the risk set, event/censor counts and the
  * survival product S(t) = Π_{t'≤t} (1 − d_{t'}/n_{t'}).
  *
  * Cross-engine float discipline (see q118's scaladoc): each ratio is
  * ONE IEEE division of exact integers and the product folds strictly
  * left-to-right in t order (Spark init-1.0 aggregate == DuckDB
  * elem-1-init list_reduce because 1.0·x == x exactly). Scale: all
  * work after the caller's subject-level aggregation runs on the
  * ≤(distinct lifetimes) frame — observation-window-bounded.
  */
object Survival {

  def kmCurve(lt: DataFrame): DataFrame = {
    val total = lt.agg(count(lit(1)).as("n_total"))
    val byT = lt.groupBy(col("t"))
      .agg(sum(col("is_event")).as("d"),
        sum(lit(1L) - col("is_event")).as("c"))
      .persist()
    // risk set n_t = total − (left the study strictly before t)
    val rm = byT.as("a").join(byT.as("b"), col("b.t") < col("a.t"), "left")
      .groupBy(col("a.t").as("t"))
      .agg(sum(coalesce(col("b.d") + col("b.c"), lit(0L))).as("removed"))
    // every emitted t has someone leaving AT t, so n_risk ≥ d+c ≥ 1:
    // the ratio's denominator cannot be zero by construction
    val km = byT.join(rm, "t").crossJoin(broadcast(total))
      .select(col("t"), col("d"), col("c"),
        (col("n_total") - col("removed")).as("n_risk"))
      .withColumn("ratio",
        lit(1.0) - col("d").cast("double") / col("n_risk").cast("double"))
      .persist()
    km.as("a").join(km.as("b"), col("b.t") <= col("a.t"))
      .groupBy(col("a.t").as("t"), col("a.n_risk").as("n_risk"),
        col("a.d").as("d"), col("a.c").as("c"))
      .agg(array_sort(collect_list(
        struct(col("b.t").as("tp"), col("b.ratio").as("ratio")))).as("rl"))
      // strict left-to-right fold in t-order == DuckDB list_reduce
      // over list(ratio ORDER BY t): 1.0·x0 == x0 exactly
      .select(col("t"), col("n_risk"), col("d"), col("c"),
        expr("aggregate(rl, CAST(1.0 AS DOUBLE), (acc, x) -> acc * x.ratio)")
          .as("surv"))
  }

  /** STRATIFIED Kaplan-Meier: [[kmCurve]] per `group` value in one
    * pass — every join/rollup gains the group key, the float
    * discipline is unchanged (per-group ratios fold in t order), and
    * a group's curve equals kmCurve over that group's rows alone
    * (SurvivalStreamSpec pins the equality). kmCurve itself stays a
    * separate ungrouped path so q118's committed plan never moves.
    * The per-group totals frame broadcasts (group-cardinality
    * bounded); everything else is (group, t)-keyed partial-agg work.
    */
  def kmCurveBy(lt: DataFrame, group: String): DataFrame = {
    // every group join is NULL-SAFE (<=>): a nullable stratum column
    // must produce the null stratum's full curve, not silently drop
    // its rows (plain equality never matches null = null)
    val total = lt.groupBy(col(group))
      .agg(count(lit(1)).as("n_total"))
    val byT = lt.groupBy(col(group), col("t"))
      .agg(sum(col("is_event")).as("d"),
        sum(lit(1L) - col("is_event")).as("c"))
      .persist()
    val rm = byT.as("a").join(byT.as("b"),
        col(s"b.$group") <=> col(s"a.$group") && col("b.t") < col("a.t"),
        "left")
      .groupBy(col(s"a.$group").as(group), col("a.t").as("t"))
      .agg(sum(coalesce(col("b.d") + col("b.c"), lit(0L))).as("removed"))
    val km = byT.as("x").join(rm.as("r"),
        col(s"r.$group") <=> col(s"x.$group") && col("r.t") === col("x.t"))
      .join(broadcast(total).as("n"),
        col(s"n.$group") <=> col(s"x.$group"))
      .select(col(s"x.$group").as(group), col("x.t").as("t"),
        col("x.d").as("d"), col("x.c").as("c"),
        (col("n.n_total") - col("r.removed")).as("n_risk"))
      .withColumn("ratio",
        lit(1.0) - col("d").cast("double") / col("n_risk").cast("double"))
      .persist()
    km.as("a").join(km.as("b"),
        col(s"b.$group") <=> col(s"a.$group") && col("b.t") <= col("a.t"))
      .groupBy(col(s"a.$group").as(group), col("a.t").as("t"),
        col("a.n_risk").as("n_risk"), col("a.d").as("d"),
        col("a.c").as("c"))
      .agg(array_sort(collect_list(
        struct(col("b.t").as("tp"), col("b.ratio").as("ratio")))).as("rl"))
      .select(col(group), col("t"), col("n_risk"), col("d"), col("c"),
        expr("aggregate(rl, CAST(1.0 AS DOUBLE), (acc, x) -> acc * x.ratio)")
          .as("surv"))
  }
}
