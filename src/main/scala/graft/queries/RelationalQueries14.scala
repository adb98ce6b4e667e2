package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 relational additions, wave 2.
  *
  * `q101_cusum` — CUSUM changepoint detection (Page 1954) over the
  * daily order-count series. The textbook recursion
  * S_t = max(0, S_{t-1} + dev_t) is not window-expressible, but its
  * CLOSED FORM is: S_t = P_t − min(0, min_{j<=t} P_j) where P is the
  * running sum of deviations — two windows over the DAY-DOWNSAMPLED
  * series (the q84/q99 discipline: window length grows with the time
  * span, never with order volume; the orders→days rollup partial-
  * aggregates at full parallelism). Deviations stay INTEGER
  * (dev = N·x_t − T, the mean subtraction cross-multiplied by the day
  * count) so every prefix sum is order-independent and bit-exact —
  * no float mean ever forms. Both one-sided statistics (upward and
  * downward shift) emit per day.
  *
  * `q102_bitmap_distinct` — distinct-count via BITMAP SEGMENTS, the
  * roaring-bitmap rollup OLAP engines use at scale: distinct
  * l_partkey per return flag where each (flag, key DIV 32) segment
  * aggregates `bit_or(1 << key mod 32)` and cardinality is
  * `sum(bit_count(segment))`. Unlike a raw count(distinct), segment
  * bitmaps are ASSOCIATIVELY RE-MERGEABLE — partial aggregation
  * collapses each segment map-side, the second rollup moves one
  * 8-byte word per (flag, segment), and pre-computed segment tables
  * can serve any flag-combination union/intersection without
  * touching the fact table again. 32-bit segments keep `1 << bit`
  * < 2^31 — inside the asserted-invariant bound on both engines
  * (DuckDB throws on BIGINT overflow rather than wrapping).
  */
object RelationalQueries14 {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q101_cusum" -> { (s, dir) =>
      import s.implicits._
      val daily = Tables.load(s, dir, "orders")
        .groupBy($"o_orderdate".cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      val tot = daily.agg(count(lit(1)).as("n_days"), sum($"x").as("total"))
      // dev is exact integer; the two running windows run over the
      // ~2.4k-row day series (single ordered partition — sanctioned
      // by the downsample-then-window rule, see scaladoc)
      val w = Window.orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.crossJoin(broadcast(tot))
        .withColumn("dev", $"n_days" * $"x" - $"total")
        .withColumn("p", sum($"dev").over(w))
        .withColumn("s_pos", $"p" - least(min($"p").over(w), lit(0L)))
        .withColumn("s_neg",
          (-$"p") - least(min(-$"p").over(w), lit(0L)))
        .select($"day", $"x", $"dev", $"s_pos", $"s_neg")
    },

    "q102_bitmap_distinct" -> { (s, dir) =>
      import s.implicits._
      val segs = Tables.load(s, dir, "lineitem")
        .select($"l_returnflag",
          expr("l_partkey DIV 32").as("seg"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(l_partkey % 32 AS INT))")
            .as("bitval"))
        .groupBy($"l_returnflag", $"seg")
        .agg(expr("bit_or(bitval)").as("bits"))
      segs.groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n_segments"),
          sum(expr("bit_count(bits)")).cast("long").as("n_distinct"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q101_cusum" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
        |               CAST(sum(x) AS BIGINT) AS total FROM daily),
        |dev AS (SELECT day, x, n_days * x - total AS dev
        |        FROM daily CROSS JOIN tot),
        |run AS (SELECT day, x, dev,
        |  CAST(sum(dev) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW) AS BIGINT) AS p
        |  FROM dev)
        |SELECT day, x, dev,
        |  p - least(CAST(min(p) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
        |    PRECEDING AND CURRENT ROW) AS BIGINT), 0) AS s_pos,
        |  (-p) - least(CAST(min(-p) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
        |    PRECEDING AND CURRENT ROW) AS BIGINT), 0) AS s_neg
        |FROM run""".stripMargin,

    "q102_bitmap_distinct" ->
      """WITH segs AS (
        |  SELECT l_returnflag, l_partkey // 32 AS seg,
        |         bit_or(CAST(1 AS BIGINT) << CAST(l_partkey % 32 AS INT))
        |           AS bits
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_segments,
        |       CAST(sum(bit_count(bits)) AS BIGINT) AS n_distinct
        |FROM segs GROUP BY 1""".stripMargin
  )
}
