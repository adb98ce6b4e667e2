package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Tenth relational wave (SURVEY.md §2.2, round 4): event-sequence
  * transition analysis and the modern conditional-aggregate family.
  */
object RelationalQueries10 {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Markov transition matrix over user event sequences: P(next event
    // type | current) from lead() over each user's time-ordered stream.
    // The window partitions by the HIGH-cardinality user key; counts
    // are exact integers and the row-share is one double division
    // against the broadcast per-type totals.
    "q79_transition_matrix" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id")
        .orderBy($"us".asc, $"event_id".asc)
      val pairs = Tables.events(s, dir)
        .select($"user_id", $"event_type",
          unix_micros($"ts").as("us"), $"event_id")
        .withColumn("next_type", lead($"event_type", 1).over(w))
        .filter($"next_type".isNotNull)
        .groupBy($"event_type".as("cur"), $"next_type".as("nxt"))
        .agg(count(lit(1)).as("n"))
      val totals = pairs.groupBy($"cur").agg(sum($"n").as("row_total"))
      pairs.join(broadcast(totals), "cur")
        .select($"cur", $"nxt", $"n",
          ($"n".cast("double") / $"row_total".cast("double")).as("p"))
    },

    // the modern conditional-aggregate family — count_if / bool_and /
    // bool_or — per order priority, decomposable so the exchange
    // carries one boolean/long per group
    "q80_cond_aggs" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(count_if($"o_orderstatus" === "F").as("n_f"),
          count_if($"o_totalprice".cast("decimal(15,2)") > 100000).as("n_big"),
          bool_and($"o_totalprice" > 0).as("all_positive"),
          bool_or($"o_orderstatus" === "P").as("any_pending"),
          count(lit(1)).as("n"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q79_transition_matrix" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts) ASC, event_id ASC) AS next_type
        |  FROM events),
        |p AS (
        |  SELECT event_type AS cur, next_type AS nxt,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE next_type IS NOT NULL
        |  GROUP BY cur, nxt),
        |t AS (SELECT cur, CAST(sum(n) AS BIGINT) AS row_total
        |  FROM p GROUP BY cur)
        |SELECT p.cur, p.nxt, p.n,
        |  CAST(p.n AS DOUBLE) / CAST(t.row_total AS DOUBLE) AS p
        |FROM p JOIN t ON p.cur = t.cur""".stripMargin,

    "q80_cond_aggs" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_f,
        |  CAST(sum(CASE WHEN CAST(o_totalprice AS DECIMAL(15,2)) > 100000
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
        |  bool_and(o_totalprice > 0) AS all_positive,
        |  bool_or(o_orderstatus = 'P') AS any_pending,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin
  )
}
