package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seeded sampling for pipeline-scale data curation. At 100 TB most
  * jobs (k-means fit, quality calibration, eval-set carving) run on a
  * sample; both variants are scan-local (no shuffle) and reproducible
  * under a fixed seed.
  */
object Sampling {

  /** Bernoulli sample at `fraction`, deterministic for a given seed. */
  def uniform(df: DataFrame, fraction: Double, seed: Long = 42L): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** Per-stratum Bernoulli fractions (e.g. downweight a dominant
    * source): unspecified strata are dropped.
    */
  def stratified(df: DataFrame, stratumCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Deterministic priority for weighted top-k sampling: the minimum of
    * `weight` independent integer hash draws of the id. Each draw is
    * equally likely to be the global minimum, so an item wins the top
    * spot with probability weight/totalWeight — exactly — and top-k
    * approximates weighted sampling without replacement. Pure 64-bit
    * integer arithmetic (LCG-style mix, no floats, no RNG state), so
    * the selection is reproducible on ANY engine that can multiply
    * longs — the DuckDB oracle replays it bit-for-bit.
    */
  def weightedPriority(idCol: Column, weightCol: Column,
      seed: Long = 42L): Column =
    array_min(transform(
      sequence(lit(0L), weightCol.cast("long") - 1L),
      j => pmod(
        (idCol.cast("long") + lit(1L + seed)) * lit(2654435761L)
          + j * lit(1013904223L),
        lit(2147483647L))))

  /** Weighted top-k sample: the k rows with the smallest
    * [[weightedPriority]] (ties broken by id — fully deterministic).
    * Scan-local priority + TakeOrdered: no shuffle of the table.
    */
  def weightedTopK(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Long = 42L): DataFrame =
    // weight < 1 means "never sample" — filtered, NOT passed to the
    // priority (sequence(0, w-1) with w=0 would yield [0,-1]: two draws,
    // making excluded rows MORE likely than weight-1 rows)
    df.filter(col(weightCol) >= 1)
      .withColumn("__prio",
        weightedPriority(col(idCol), col(weightCol), seed))
      .orderBy(col("__prio").asc, col(idCol).asc)
      .limit(k)
      .drop("__prio")
}
