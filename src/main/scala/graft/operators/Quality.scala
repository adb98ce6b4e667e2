package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the contract check every ingest
  * runs before data is allowed downstream. All rules evaluate in ONE
  * aggregation pass over the table (violation counts are plain agg
  * columns, partial-aggregated map-side), so auditing 100 TB costs one
  * scan regardless of how many rules are attached.
  */
object Quality {

  sealed trait Rule {
    def name: String
    /** Per-row violation predicate for row-local rules (None for
      * Unique — a duplicate is a property of the table, not a row).
      * The audit aggregate derives from it, so the count and the
      * dead-letter routing split can never disagree on what violates.
      */
    def rowViolates: Option[Column]
    /** Aggregate column counting this rule's violations (0 = clean). */
    def agg: Column = count(when(rowViolates.getOrElse(
      throw new IllegalStateException(
        s"rule $name has no row predicate and must override agg")), 1))
    /** Row-local rules have ADDITIVE violation counts — auditing each
      * split and summing equals auditing the whole. That is what lets
      * [[graft.streaming.StreamingOps.qualityAuditMaintained]] fold
      * per-batch audits into a cumulative state. Unique is the
      * exception (needs distinct state across batches).
      */
    def rowLocal: Boolean = true
  }

  /** Column must not contain nulls. */
  case class NotNull(column: String) extends Rule {
    val name = s"null_$column"
    def rowViolates: Option[Column] = Some(col(column).isNull)
  }

  /** String column must not contain empty values. */
  case class NonEmpty(column: String) extends Rule {
    val name = s"empty_$column"
    def rowViolates: Option[Column] = Some(length(col(column)) === 0)
  }

  /** Column values must come from the allowed set (null is a violation). */
  case class InSet(column: String, allowed: Seq[String]) extends Rule {
    val name = s"domain_$column"
    def rowViolates: Option[Column] = Some(
      col(column).isNull || !col(column).isin(allowed.map(lit): _*))
  }

  /** Numeric column must lie in [lo, hi] (null is a violation). */
  case class Bounds(column: String, lo: Double, hi: Double) extends Rule {
    val name = s"bounds_$column"
    def rowViolates: Option[Column] = Some(
      col(column).isNull || col(column) < lo || col(column) > hi)
  }

  /** Column must be unique across the table (violations = extra rows). */
  case class Unique(column: String) extends Rule {
    val name = s"dup_$column"
    def rowViolates: Option[Column] = None
    override def agg: Column = count(col(column)) - count_distinct(col(column))
    override def rowLocal: Boolean = false
  }

  /** One row: total row count + one violation-count column per rule. */
  def audit(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      rules.map(r => r.agg.as(r.name))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Append a `violated_rules` array<string> column naming every
    * row-local rule each row breaks (empty array = clean row) — the
    * single flagging kernel behind dead-letter routing, batch
    * ([[graft.operators.Transforms]] `onViolation: route`) and
    * streaming ([[graft.streaming.StreamingOps.qualityRoutedMaintained]])
    * alike, so the two surfaces can never disagree on what violates.
    * Row-local rules only: a table-level rule (Unique) cannot blame a
    * row.
    */
  def flagRows(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val nonLocal = rules.filterNot(_.rowLocal).map(_.name)
    require(nonLocal.isEmpty,
      s"quality rules [${nonLocal.mkString(", ")}] are not row-local — " +
        "routing cannot blame a row for a table-level rule")
    // reserved output names must not already exist on the input
    // (round 18, ADVICE r17): a user column named `violated_rules`
    // would be silently REPLACED here (and dropped on the clean path
    // by the route stage) — refuse loudly instead
    val clash = df.columns.toSet
      .intersect(Set("violated_rules", "__graft_viol0", "__graft_viol"))
    require(clash.isEmpty,
      s"quality routing reserves column name(s) [${clash.mkString(", ")}] " +
        "for its violation audit — rename the input column(s) first")
    df.withColumn("__graft_viol0",
        array(rules.map(r => when(r.rowViolates.get, lit(r.name))): _*))
      .withColumn("violated_rules",
        expr("filter(__graft_viol0, x -> x IS NOT NULL)"))
      .drop("__graft_viol0")
  }

  /** Pass/fail per rule (true = zero violations), from one audit pass. */
  def check(df: DataFrame, rules: Seq[Rule]): Map[String, Boolean] = {
    val row = audit(df, rules).head()
    rules.map(r => r.name -> (row.getAs[Long](r.name) == 0L)).toMap
  }

  /** Referential-integrity audit — the rule class the single-pass
    * [[audit]] cannot express (it needs a second table). One row:
    * `(fk_name, n_child, n_orphans)` where orphans are child rows whose
    * `fk` value has no match in `parent.pk` (NULL fks count as orphans:
    * a fact row pointing nowhere is broken either way — callers wanting
    * nullable fks filter first).
    *
    * Scale shape: ONE hash join shuffled on the key — the parent side
    * reduces to its distinct keys first (map-side partial), both counts
    * come from the same partial-aggregated pass over the join output.
    * No distinct-vs-anti double scan of the 100 TB child.
    */
  def orphanCount(child: DataFrame, fk: String,
      parent: DataFrame, pk: String, fkName: String): DataFrame =
    child.select(col(fk).as("__k"))
      .join(parent.select(col(pk).as("__k")).distinct()
        .withColumn("__hit", lit(1)), Seq("__k"), "left")
      .agg(count(lit(1)).as("n_child"),
        count(when(col("__hit").isNull, 1)).as("n_orphans"))
      .select(lit(fkName).as("fk_name"), col("n_child"), col("n_orphans"))
}
