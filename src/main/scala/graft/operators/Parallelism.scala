package graft.operators

import org.apache.spark.sql.DataFrame

/** Compute-heavy per-row operators (hashing, LSH, feature extraction)
  * are bottlenecked by input partition count, not data volume: a small
  * single-file parquet table arrives as ONE partition and serializes the
  * whole kernel onto one core. Repartition up to the cluster's
  * parallelism in that case — but never force a shuffle on inputs that
  * are already well-partitioned (at 100 TB that shuffle IS the cost).
  */
object Parallelism {
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
