package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only plan dump: prints the formatted physical plan (and the
  * exchange count) for each named query — the .explain feedback loop
  * the plan audits are built from.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val p = df.queryExecution.executedPlan.toString
      println(s"=== $name: ${"Exchange".r.findAllIn(p).length} Exchange, " +
        s"${"SortMergeJoin".r.findAllIn(p).length} SMJ ===")
      df.explain("formatted")
    }
    spark.stop()
  }
}
