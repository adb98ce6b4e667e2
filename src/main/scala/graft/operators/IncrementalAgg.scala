package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregation maintenance: keep a small partial-aggregate
  * state table and fold new data into it without rescanning history —
  * the aggregation counterpart of [[Backfill]]'s partition diff. At
  * 100 TB the historical scan is the cost; a day's delta is 1/1000 of
  * it, so maintained aggregates turn a full-table pass into a
  * delta-sized one with a tiny state merge.
  *
  * Works for the decomposable aggregates (sum / count / min / max —
  * and anything derivable from them at read time: avg = sum/count).
  * COUNT partials re-merge via SUM; MIN/MAX re-merge idempotently, so
  * re-merging the same delta twice is only safe for min/max — keep
  * deltas idempotent at partition granularity (see Backfill) for the
  * additive ones.
  *
  * The state schema is keys ++ agg columns, identical between
  * [[partial]] and [[merge]] output — a merged state IS a valid state,
  * so maintenance composes: state(day 1..n) = merge(state(day 1..n-1),
  * partial(day n)).
  */
object IncrementalAgg {

  /** One maintained aggregate column: output name, merge kind
    * (sum|count|min|max), and the source expression it aggregates.
    */
  case class Agg(out: String, kind: String, source: Column) {
    require(Set("sum", "count", "min", "max")(kind),
      s"non-decomposable aggregate kind: $kind")
  }

  private def firstAgg(a: Agg): Column = (a.kind match {
    case "sum" => sum(a.source)
    case "count" => count(a.source)
    case "min" => min(a.source)
    case "max" => max(a.source)
  }).as(a.out)

  /** How an existing partial column re-merges: counts ADD, sums ADD,
    * extremes re-apply.
    */
  private def remerge(a: Agg): Column = (a.kind match {
    case "sum" | "count" => sum(col(a.out))
    case "min" => min(col(a.out))
    case "max" => max(col(a.out))
  }).as(a.out)

  /** Cast a partial's agg columns to the types a merge would produce
    * (decimal sums widen: sum(decimal(p,s)) -> decimal(min(38,p+10),s));
    * the widened types are a FIX-POINT (p+10 caps at 38), so aligned
    * partials and merged states share one schema — "a merged state IS
    * a valid state" holds by schema, not just by value, and persisted
    * state versions never drift.
    */
  private def align(p: DataFrame, keys: Seq[String], aggs: Seq[Agg]): DataFrame = {
    val mergedSchema = p.limit(0).unionByName(p.limit(0))
      .groupBy(keys.map(col): _*)
      .agg(remerge(aggs.head), aggs.tail.map(remerge): _*)
      .schema
    p.select(p.schema.map(f =>
      col(f.name).cast(mergedSchema(f.name).dataType).as(f.name)): _*)
  }

  /** Aggregate a batch of raw rows into partial-state form. */
  def partial(df: DataFrame, keys: Seq[String], aggs: Seq[Agg]): DataFrame = {
    require(aggs.nonEmpty, "at least one aggregate column is required")
    align(df.groupBy(keys.map(col): _*)
      .agg(firstAgg(aggs.head), aggs.tail.map(firstAgg): _*), keys, aggs)
  }

  /** Fold a new partial into the state: group sizes are O(keys), so
    * this is a tiny shuffle regardless of how much raw data the state
    * summarizes.
    */
  def merge(state: DataFrame, delta: DataFrame, keys: Seq[String],
      aggs: Seq[Agg]): DataFrame = {
    require(aggs.nonEmpty, "at least one aggregate column is required")
    align(state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(remerge(aggs.head), aggs.tail.map(remerge): _*), keys, aggs)
  }
}
