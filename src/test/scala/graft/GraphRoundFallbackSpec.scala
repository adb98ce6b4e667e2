package graft

import org.apache.spark.sql.functions._
import graft.queries.RelationalQueries11.pagerankRound
import graft.queries.RelationalQueries12.labelPropRound

/** Proves q90/q93's documented broadcast-limit fallback (the
  * KCoreFallbackSpec discipline, extended to the contribution/label
  * round shape): one round with SHUFFLE_HASH sides — the form the
  * queries flip to when |V| outgrows the broadcast budget — must
  * produce exactly the broadcast form's output. Runs the fallback leg
  * under autoBroadcastJoinThreshold=-1 so AQE cannot silently promote
  * the shuffled joins back to broadcasts.
  */
class GraphRoundFallbackSpec extends SparkSpec {

  private def withNoBroadcast[A](body: => A): A = {
    val thrKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(thrKey)
    spark.conf.set(thrKey, "-1")
    try body finally spark.conf.set(thrKey, prev)
  }

  test("pagerank round: SHUFFLE_HASH sides == broadcast sides") {
    import spark.implicits._
    val orders = Tables.load(spark, sf, "orders")
    val lineitem = Tables.load(spark, sf, "lineitem")
    val cs = orders.join(lineitem, $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      .distinct()
    val edges = cs.union(cs.select($"dst".as("src"), $"src".as("dst")))
      .repartition($"dst").persist()
    val nd = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
      .select($"src".as("node"), $"deg").persist()
    val r0 = nd.select($"node", $"deg", lit(1000000L).as("rank"))

    val broadcasted = pagerankRound(edges, nd, r0, broadcastRanks = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val shuffled = withNoBroadcast {
      pagerankRound(edges, nd, r0, broadcastRanks = false)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(broadcasted.nonEmpty, "round produced no ranks — graph empty?")
    assert(shuffled == broadcasted)
    GraftSession.release(spark)
  }

  test("label-prop round: SHUFFLE_HASH side == broadcast side") {
    import spark.implicits._
    val li = Tables.load(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_partkey")
    val ea = li.select($"l_orderkey", $"l_partkey".as("src"))
    val eb = li.select($"l_orderkey", $"l_partkey".as("dst"))
    val edges = ea.hint("SHUFFLE_HASH").join(eb.hint("SHUFFLE_HASH"),
        Seq("l_orderkey"))
      .filter($"src" =!= $"dst")
      .select($"src", $"dst")
      .repartition($"dst")
      .groupBy($"src", $"dst").agg(lit(1))
      .select($"src", $"dst")
      .persist()
    val l0 = edges.select($"dst".as("node")).distinct()
      .select($"node", $"node".as("lbl"))

    val broadcasted = labelPropRound(edges, l0, broadcastLabels = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val shuffled = withNoBroadcast {
      labelPropRound(edges, l0, broadcastLabels = false)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(broadcasted.nonEmpty, "round produced no labels — graph empty?")
    assert(shuffled == broadcasted)
    GraftSession.release(spark)
  }
}
