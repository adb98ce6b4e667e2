package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.{AsOfJoin, RangeJoin}

/** Event-time operators over the `events` stream table (SURVEY.md §2.2).
  *
  * Timestamp discipline: the raw data is nanosecond-precision; Spark's
  * engine is microsecond. All comparisons and outputs go through
  * `unix_micros` (Spark) / `epoch_us` (DuckDB) — both truncate ns→us the
  * same way — so oracle parity is exact. Raw timestamps are never emitted
  * (us-vs-ns output precision would differ).
  */
object EventQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q15_asof_join" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.events(s, dir)
      AsOfJoin.lastEventAsOf(
        left = ev.filter($"event_type" === "purchase"),
        right = ev.filter($"event_type" === "click"),
        partitionCol = "user_id", tsCol = "ts", idCol = "event_id")
        .select(
          $"event_id".as("purchase_id"), $"user_id",
          unix_micros($"ts").as("purchase_us"),
          $"asof_id".as("last_click_id"),
          $"asof_us".as("click_us"))
    },

    "q16_range_join" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.events(s, dir)
      RangeJoin.countInPrecedingWindow(
        left = ev.filter($"event_type" === "purchase"),
        right = ev.filter($"event_type" === "click"),
        keyCol = "user_id", tsCol = "ts", windowMicros = 3600L * 1000000L)
        .select($"event_id".as("purchase_id"), $"user_id", $"n_in_window".as("n_clicks"))
    },

    "q19_time_window" -> { (s, dir) =>
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"),
          min($"value").as("min_val"), max($"value").as("max_val"))
        .select(unix_timestamp($"window.start").as("win_start"),
          $"event_type", $"n", $"min_val", $"max_val")
    },

    "q20_sessionize" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.events(s, dir)
      val byUser = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("prev_us", lag(unix_micros($"ts"), 1).over(byUser))
        .withColumn("new_sess",
          when($"prev_us".isNull || unix_micros($"ts") - $"prev_us" > 1800L * 1000000L, 1)
            .otherwise(0))
        .withColumn("sess_no", sum($"new_sess").over(run))
        .groupBy($"user_id", $"sess_no")
        .agg(count(lit(1)).as("n_events"),
          min(unix_micros($"ts")).as("start_us"),
          max(unix_micros($"ts")).as("end_us"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q15_asof_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        |  CAST(epoch_us(p.ts) AS BIGINT) AS purchase_us,
        |  c.last_click_id, c.click_us
        |FROM events p
        |LEFT JOIN LATERAL (
        |  SELECT event_id AS last_click_id,
        |    CAST(epoch_us(ts) AS BIGINT) AS click_us
        |  FROM events c
        |  WHERE c.user_id = p.user_id AND c.event_type = 'click'
        |    AND epoch_us(c.ts) <= epoch_us(p.ts)
        |  ORDER BY epoch_us(c.ts) DESC, event_id DESC LIMIT 1) c ON TRUE
        |WHERE p.event_type = 'purchase'""".stripMargin,

    "q16_range_join" ->
      """SELECT p.event_id AS purchase_id, p.user_id,
        |  count(c.event_id) AS n_clicks
        |FROM events p
        |LEFT JOIN events c
        |  ON c.user_id = p.user_id AND c.event_type = 'click'
        |  AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) - 3600000000 AND epoch_us(p.ts)
        |WHERE p.event_type = 'purchase'
        |GROUP BY p.event_id, p.user_id""".stripMargin,

    "q19_time_window" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start,
        |  event_type, count(*) AS n,
        |  min(value) AS min_val, max(value) AS max_val
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q20_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS prev_us
        |  FROM events),
        |g AS (
        |  SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |    THEN 1 ELSE 0 END AS new_sess FROM e),
        |s AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
        |  FROM g)
        |SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
        |  count(*) AS n_events,
        |  CAST(min(us) AS BIGINT) AS start_us,
        |  CAST(max(us) AS BIGINT) AS end_us
        |FROM s GROUP BY user_id, sess_no""".stripMargin
  )
}
