package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-9 event additions.
  *
  * `q115_time_to_convert` — CONVERSION LATENCY quantiles: for every
  * user, time from first `signup` to the first `purchase` at or after
  * it, reported as the exact p50/p90/p99 of the latency distribution —
  * the activation-speed number a growth dashboard leads with (q46's
  * funnel says WHO converts; this says HOW FAST). Latencies are exact
  * integer microsecond differences (the no-raw-timestamp rule:
  * unix_micros == epoch_us); the quantiles come from ONE
  * [[graft.operators.RankSelect]] range-shuffle pass with the exact
  * `ceil(q·n)` 1-based rank rule — bit-identical to DuckDB's
  * `quantile_disc` (the q68/feat_robust_scale discipline; a value tie
  * at the cut rank yields the same VALUE under any tie order, so the
  * user_id tiebreak only pins the row, never the answer). Scale shape:
  * two keyed aggregations (first-signup, first-purchase-after) and the
  * single-group rank ladder with the real group-count cap — no global
  * window sort.
  */
object EventQueries3 {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q115_time_to_convert" -> { (s, dir) =>
      import s.implicits._
      import graft.operators.RankSelect
      val ev = Tables.events(s, dir)
        .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
      val su = ev.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"us").as("s_us"))
      val conv = su.join(ev.filter($"event_type" === "purchase")
            .select($"user_id", $"us"), "user_id")
        .filter($"us" >= $"s_us")
        .groupBy($"user_id", $"s_us").agg(min($"us").as("p_us"))
        .select($"user_id", ($"p_us" - $"s_us").as("latency_us"))
        .withColumn("g", lit(1))
      RankSelect.discreteQuantilesCapped(conv, Seq("g"),
          Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L)),
          "q", "n_users", 10, $"latency_us", $"user_id")
        .select($"q", $"latency_us", $"n_users")
    }
  )

  val oracles: Map[String, String] = Map(
    "q115_time_to_convert" ->
      """WITH e AS (SELECT user_id, event_type,
        |    CAST(epoch_us(ts) AS BIGINT) AS us FROM events),
        |su AS (SELECT user_id, min(us) AS s_us FROM e
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |conv AS (SELECT su.user_id, min(p.us) - su.s_us AS latency_us
        |  FROM su JOIN e p ON p.user_id = su.user_id
        |    AND p.event_type = 'purchase' AND p.us >= su.s_us
        |  GROUP BY su.user_id, su.s_us),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM conv)
        |SELECT 'p50' AS q,
        |  CAST(quantile_disc(latency_us, 0.5) AS BIGINT) AS latency_us,
        |  n.n_users FROM conv, n GROUP BY n.n_users
        |UNION ALL
        |SELECT 'p90', CAST(quantile_disc(latency_us, 0.9) AS BIGINT),
        |  n.n_users FROM conv, n GROUP BY n.n_users
        |UNION ALL
        |SELECT 'p99', CAST(quantile_disc(latency_us, 0.99) AS BIGINT),
        |  n.n_users FROM conv, n GROUP BY n.n_users""".stripMargin
  )
}
