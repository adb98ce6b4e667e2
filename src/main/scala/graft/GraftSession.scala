package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration:
  * AQE on (runtime re-planning, skew-join splitting), UTC semantics,
  * shuffle partitions sized to the cluster instead of Spark's legacy
  * 200, and graft's SQL functions injected via GraftExtensions.
  */
object GraftSession {

  def builder(master: String = "local[*]",
      shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .withExtensions(new GraftExtensions)
    shufflePartitions.fold(b)(n => b.config("spark.sql.shuffle.partitions", n))
  }

  def local(cores: Int): SparkSession =
    builder(s"local[$cores]", Some(cores))
      .config("spark.ui.enabled", "false")
      .getOrCreate()

  /** Between-query storage sweep shared by Bench/BenchOne/Verify.
    * clearCache drops catalog-cached frames, but localCheckpoint blocks
    * (the CC loop, q70's edge relation) are RDD storage the catalog
    * never tracks — without the explicit unpersist sweep they free only
    * when a driver GC lets the ContextCleaner run, and across a
    * 150+-query suite the accumulated old-gen pressure lands as phantom
    * seconds in whichever query triggers the collection (round 5→6:
    * -8.6s suite-wide from adding this). ReleaseSpec pins the contract.
    */
  def release(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    // blocking: the sweep runs OUTSIDE the timed window (between
    // queries), and an async unpersist lets the previous query's
    // storage linger into the next query's measurement
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }
}
