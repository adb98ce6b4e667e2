package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch probe for round-4 feature availability. */
object FeatureProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Unit): Unit =
      try { f; println(s"[probe] $name OK") }
      catch { case e: Throwable =>
        println(s"[probe] $name FAIL: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}") }

    t("recursive_cte") {
      val r = spark.sql(
        """WITH RECURSIVE r(node, depth) AS (
          |  SELECT 0, 0
          |  UNION ALL
          |  SELECT r.node + 1, r.depth + 1 FROM r WHERE r.node < 5)
          |SELECT * FROM r""".stripMargin).collect()
      println("  rows=" + r.length)
    }
    t("bit_agg") {
      spark.sql("SELECT bit_and(x), bit_or(x), bit_xor(x) FROM VALUES (1),(3),(7) AS t(x)").show()
    }
    t("listagg") {
      spark.sql("SELECT listagg(x, ',') WITHIN GROUP (ORDER BY x) FROM VALUES ('b'),('a') AS t(x)").show()
    }
    t("fold_aggregate") {
      spark.sql("SELECT aggregate(array(2.0D, 3.0D), 1.0D, (s, x) -> 0.5D * x + 0.5D * s)").show()
    }
    t("xml_read") {
      val tmp = java.nio.file.Files.createTempDirectory("xmlprobe")
      val f = tmp.resolve("a.xml")
      java.nio.file.Files.write(f,
        "<rows><row><id>1</id><name>x</name></row><row><id>2</id><name>y</name></row></rows>".getBytes)
      val df = spark.read.format("xml").option("rowTag", "row").load(f.toString)
      df.show(); df.printSchema()
    }
    t("xml_write") {
      val tmp = java.nio.file.Files.createTempDirectory("xmlw")
      spark.sql("SELECT 1 AS id, 'x' AS name").write.format("xml")
        .option("rowTag", "row").mode("overwrite").save(tmp.toString + "/out")
      println("  wrote " + tmp)
    }
    t("transform_with_state_class") {
      Class.forName("org.apache.spark.sql.streaming.StatefulProcessor")
      println("  StatefulProcessor present")
    }
    t("decimal_mult") {
      spark.sql("SELECT CAST(1.25 AS DECIMAL(15,2)) * CAST(2.50 AS DECIMAL(15,2)) AS p").printSchema()
    }
    spark.stop()
  }
}
