package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §5): salted equi-join. A hot join key
  * lands its entire partition on one reducer; salting splits each left
  * key into `saltParts` sub-keys and replicates the (smaller) right side
  * once per sub-key, so the hot key's rows spread over `saltParts`
  * reducers. Result is row-identical to the plain join — verified by the
  * q21 oracle, which IS the plain join.
  *
  * AQE's skew-join handling covers sort-merge cases adaptively; explicit
  * salting remains the tool when the skew is known ahead (a null-heavy
  * foreign key, a celebrity user) or when AQE splitting can't apply
  * (e.g. broadcast-ineligible aggregations over the same key).
  */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      saltParts: Int = 8, joinType: String = "inner"): DataFrame = {
    // right-preserving joins would emit each unmatched right row once per
    // salt copy — row-identity to the plain join only holds for these:
    require(Set("inner", "left", "left_outer", "leftouter").contains(
      joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins only, got $joinType")
    // deterministic spread: hash the whole left row modulo saltParts
    val saltedLeft = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(saltParts)))
    val saltedRight = right.withColumn("__salt",
      explode(expr(s"sequence(0, ${saltParts - 1})")))
    saltedLeft.join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
        saltedLeft("__salt") === saltedRight("__salt"),
        joinType)
      .drop("__salt")
  }
}
