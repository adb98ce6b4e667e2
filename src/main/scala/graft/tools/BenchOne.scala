package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only single-query timer (warm pass + 3 timed passes). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same cleanup as Bench: catalog cache + checkpoint RDD blocks
    def release(): Unit = graft.GraftSession.release(spark)
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).count(); release()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); fn(spark, sfDir).count()
        release()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[benchone] $name: ${times.min}%.2f min / ${times.sum / 3}%.2f avg")
    }
    spark.stop()
  }
}
