package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  * One parquet file per table under the sf directory.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` carries parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read ns as long (legacy conf) and truncate to the
    * engine's native microsecond timestamps with exact integer division
    * (ns epoch ~1.7e18 overflows double, so no floating-point division).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** ns-epoch long (from nanosAsLong) -> native microsecond timestamp;
    * leaves real timestamp columns untouched. Shared by batch and
    * streaming event readers.
    */
  def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }

  /** Register every table as a temp view (for spark.sql paths); the
    * events view goes through the nanos-timestamp normalization so SQL
    * over `ts` behaves like the DataFrame path.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
