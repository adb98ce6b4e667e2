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
}
