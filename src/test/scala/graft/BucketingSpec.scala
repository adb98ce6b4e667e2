package graft

import org.apache.spark.sql.functions._
import graft.operators.Bucketing

class BucketingSpec extends SparkSpec {

  test("co-located join of bucketed tables plans without a shuffle") {
    val li = Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val ord = Tables.load(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    // fresh in-memory catalog each JVM: drop orphaned locations too
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(ord, "ord_bucketed", "o_orderkey", 8)

    // force sort-merge (the tiny test tables would otherwise broadcast,
    // which at real fact-fact scale is not an option)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark,
        "li_bucketed", "ord_bucketed", "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle; plan:\n$plan")

      // and it is still correct
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
