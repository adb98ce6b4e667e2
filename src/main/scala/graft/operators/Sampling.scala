package graft.operators

import org.apache.spark.sql.DataFrame

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
}
