package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim

/** Pins [[Shim.freshStatsCheckpoint]]'s fixed-stats contract — the
  * guard against the iterative-checkpoint stats blowup class (ADVICE
  * r14 / VERDICT r14 task 2): `Dataset.localCheckpoint` rewrites the
  * ORIGIN plan's statistics onto the new LogicalRDD, so a loop whose
  * next round joins its checkpointed frames k times inherits
  * sizeInBytes ≈ prev^k and the PLANNER drowns in BigInteger.multiply
  * after a few rounds (observed live in the round-14/15 survivor fold
  * at 10x). freshStatsCheckpoint must pin the declared constant
  * instead — this spec goes RED if it regresses to a plain
  * localCheckpoint.
  */
class ShimStatsSpec extends SparkSpec {

  private val declared = BigInt(1) << 20

  test("freshStatsCheckpoint pins the declared size; localCheckpoint inherits") {
    import spark.implicits._
    val base = (1L to 2000L).map(i => (i, s"v$i")).toDF("id", "v")
    // a self-joined plan whose estimated size far exceeds the declared
    // constant — the shape whose inherited stats square per round
    val wide = base.as("a").join(base.as("b"),
      col("a.id") % 7 === col("b.id") % 7)
    val inherited = wide.localCheckpoint(true)
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(inherited > declared,
      s"fixture too small to separate the paths (inherited=$inherited)")
    val fresh = Shim.freshStatsCheckpoint(wide)
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(fresh === declared,
      "freshStatsCheckpoint no longer declares fixed stats — the " +
        "iterative-checkpoint stats blowup class is unguarded")
    GraftSession.release(spark)
  }

  test("five chained checkpoints keep stats at the declared constant") {
    import spark.implicits._
    var df = (1L to 500L).map(i => (i, i % 13)).toDF("id", "k")
    for (_ <- 1 to 5) {
      // each round joins the previous checkpoint twice — the growth
      // chain that multiplied inherited estimates round over round
      val j = df.as("x").join(df.as("y"), col("x.k") === col("y.k"))
        .select(col("x.id").as("id"), col("x.k").as("k")).distinct()
      df = Shim.freshStatsCheckpoint(j)
      assert(df.queryExecution.optimizedPlan.stats.sizeInBytes === declared)
    }
    GraftSession.release(spark)
  }
}
