package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column<->Expression conversions
  * (Spark 4 moved these behind the Connect-compatible API). Lives in an
  * `org.apache.spark.sql` subpackage solely to satisfy the access
  * qualifier; everything else of graft stays in its own namespace.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager localCheckpoint that DISCARDS the origin plan's statistics.
    *
    * `Dataset.localCheckpoint` rewrites the ORIGIN plan's stats onto
    * the new LogicalRDD (LogicalRDD.rewriteStatsAndConstraints), so an
    * iterative operator whose round plan joins its own checkpointed
    * frames k times inherits sizeInBytes ≈ prev^k — repeated squaring
    * across rounds. By round 5-6 the BigInt estimates carry MILLIONS
    * of digits and the PLANNER (not the jobs) burns minutes inside
    * BigInteger.multiply while merely checkpointing (observed live in
    * the pre-round-16 promotion-loop form of
    * Dedup.minhashDedupFoldSurvivors at 10x: main thread pinned in
    * Toom-Cook multiplication under SizeInBytesOnlyStatsPlanVisitor;
    * the fold is round-free now, but any future checkpointed loop
    * re-enters this class).
    * This wrapper materializes the checkpoint once, then rebuilds the
    * LogicalRDD with a FIXED declared size, cutting the growth chain.
    * Use it for every checkpoint inside a loop whose next iteration
    * joins the result more than once; the declared size only matters
    * to join-strategy choice (callers there broadcast() explicitly,
    * and AQE re-plans exchanges from runtime sizes anyway).
    * ShimStatsSpec pins the fixed-stats contract (and the inherited
    * blowup it prevents).
    */
  def freshStatsCheckpoint(df: org.apache.spark.sql.DataFrame,
      sizeInBytes: BigInt = BigInt(1) << 20): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.catalyst.plans.logical.Statistics
    val ck = df.localCheckpoint(true)
    ck.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val spark = ck.sparkSession
          .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        val fresh = LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
          lr.outputOrdering, lr.isStreaming, lr.stream)(spark,
          Some(Statistics(sizeInBytes = sizeInBytes)), None)
        org.apache.spark.sql.classic.Dataset.ofRows(spark, fresh)
      case other =>
        // a future Spark may stop planning localCheckpoint as a bare
        // LogicalRDD — falling back silently would quietly re-admit the
        // inherited-stats blowup class, so make the regression loud
        System.err.println(
          s"[graft][WARN] freshStatsCheckpoint: post-checkpoint plan is " +
            s"${other.getClass.getSimpleName}, not LogicalRDD — declared " +
            "stats NOT applied; inherited estimates may grow in loops")
        ck
    }
  }
}
