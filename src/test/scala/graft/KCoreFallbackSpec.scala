package graft

import org.apache.spark.sql.functions._
import graft.queries.RelationalQueries11.kcorePeelRound

/** Proves q92_kcore's documented broadcast-limit fallback instead of
  * asserting it: a peel round with SHUFFLE_HASH survivor sides (the
  * form the query flips to when |V| outgrows the broadcast limit) must
  * produce exactly the surviving edge set of the broadcast form. Runs
  * with autoBroadcastJoinThreshold=-1 so the fallback leg genuinely
  * exercises shuffled semi joins (AQE cannot silently promote them
  * back to broadcasts).
  */
class KCoreFallbackSpec extends SparkSpec {

  test("SHUFFLE_HASH peel round == broadcast peel round (survivor edges identical)") {
    import spark.implicits._
    val li = Tables.load(spark, sf, "lineitem").select($"l_orderkey", $"l_partkey")
    val e0 = li.groupBy($"l_orderkey")
      .agg(collect_set($"l_partkey").as("ps"))
      .select(explode(expr(
        "filter(flatten(transform(ps, x -> transform(ps, y -> " +
          "struct(x AS src, y AS dst)))), p -> p.src != p.dst)")).as("p"))
      .select($"p.src".as("src"), $"p.dst".as("dst"))
      .groupBy($"src", $"dst").agg(lit(1))
      .select($"src", $"dst")
      .persist()
    // threshold chosen mid-cascade at sf0.001 (degree quantiles probed:
    // p50=89, p80=101, max=138) so the round really peels
    val k = 100
    val broadcasted = kcorePeelRound(e0, k, broadcastSurvivors = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val thrKey = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(thrKey)
    spark.conf.set(thrKey, "-1")
    val shuffled =
      try kcorePeelRound(e0, k, broadcastSurvivors = false)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      finally spark.conf.set(thrKey, prev)

    assert(broadcasted.nonEmpty, "peel round removed every edge — lower k")
    assert(broadcasted.size < e0.count(), "k too low: nothing peeled, test is vacuous")
    assert(shuffled == broadcasted)
    GraftSession.release(spark)
  }
}
