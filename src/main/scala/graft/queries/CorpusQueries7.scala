package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 corpus additions, wave 2.
  *
  * `corpus_temperature_sample` — temperature-scaled mixture
  * allocation (the multilingual-sampling rule of mBERT/XLM-R/mT5,
  * Devlin 2019 / Conneau 2020): per-language sampling weight
  * n_l^T with T = 0.5, i.e. sqrt(n_l) — upweights tail languages
  * against the head without inverting the order. T = 0.5 is chosen
  * deliberately: IEEE sqrt is CORRECTLY ROUNDED everywhere (unlike
  * pow/exp/log, whose libm rounding differs across engines — the
  * repo's no-pow/log rule), so the weight is bit-stable. The
  * denominator is a STRICT lang-ordered fold (Spark `aggregate` from
  * 0.0 == DuckDB `list_reduce` elem-1 init, exact because 0.0 + x
  * == x for positive IEEE doubles — the ann_pq identity). A budget
  * of 1000 documents is allocated by LARGEST-REMAINDER rounding
  * (floor everywhere, leftovers to the largest fractional parts,
  * lang-asc tie-break) so the targets are integers that sum exactly
  * to the budget. Scale shape: one partial-agg lang rollup over the
  * corpus; everything after operates on the 5-row language frame
  * (tiny-frame windows — the downsample-then-window rule).
  */
object CorpusQueries7 {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_temperature_sample" -> { (s, dir) =>
      import s.implicits._
      val counts = Tables.load(s, dir, "documents")
        .groupBy($"lang").agg(count(lit(1)).as("n_docs"))
      val denom = counts
        .agg(sort_array(collect_list(struct($"lang", $"n_docs"))).as("xs"))
        .select(expr(
          "aggregate(xs, CAST(0.0 AS DOUBLE), (a, x) -> a + sqrt(CAST(x.n_docs AS DOUBLE)))")
          .as("s"))
      val scored = counts.crossJoin(broadcast(denom))
        .withColumn("w", sqrt($"n_docs".cast("double")))
        .withColumn("share", $"w" / $"s")
        .withColumn("alloc", $"share" * lit(1000.0))
        .withColumn("base", floor($"alloc").cast("long"))
        .withColumn("rem", $"alloc" - $"base".cast("double"))
      // windows over the 5-row language frame
      val sumw = Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val rkw = Window.orderBy($"rem".desc, $"lang".asc)
      scored
        .withColumn("leftover", lit(1000L) - sum($"base").over(sumw))
        .withColumn("rk", row_number().over(rkw).cast("long"))
        .select($"lang", $"n_docs", $"w", $"share",
          ($"base" + when($"rk" <= $"leftover", 1L).otherwise(0L))
            .as("target"))
    }
  )

  val oracles: Map[String, String] = Map(
    // list_reduce over list(... ORDER BY lang) replays the strict
    // lang-ordered denominator fold; sum() OVER () on BIGINT returns
    // HUGEINT in DuckDB — cast back
    "corpus_temperature_sample" ->
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        |           FROM documents GROUP BY lang),
        |d AS (SELECT list_reduce(
        |        list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY lang),
        |        (a, b) -> a + b) AS s FROM c),
        |t AS (SELECT lang, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS w,
        |             sqrt(CAST(n_docs AS DOUBLE)) / (SELECT s FROM d)
        |               AS share
        |      FROM c),
        |u AS (SELECT lang, n_docs, w, share, share * 1000.0 AS alloc,
        |             CAST(floor(share * 1000.0) AS BIGINT) AS base
        |      FROM t),
        |v AS (SELECT lang, n_docs, w, share, base,
        |             alloc - CAST(base AS DOUBLE) AS rem,
        |             CAST(1000 - sum(base) OVER () AS BIGINT) AS leftover
        |      FROM u),
        |r AS (SELECT lang, n_docs, w, share, base, leftover,
        |             CAST(row_number() OVER (ORDER BY rem DESC, lang)
        |               AS BIGINT) AS rk
        |      FROM v)
        |SELECT lang, n_docs, w, share,
        |       base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS target
        |FROM r""".stripMargin
  )
}
