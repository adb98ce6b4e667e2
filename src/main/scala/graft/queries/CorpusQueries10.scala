package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-12 session-3 corpus addition.
  *
  * `corpus_diversity` — Simpson concentration / effective-category
  * audit over the corpus' source and language axes: HHI = Σ pᵢ² and
  * the effective category count 1/HHI ("this corpus behaves like N
  * equally-sized sources") — the mixture-health number
  * corpus_mixture's raw shares don't summarize, and the log-free
  * diversity index (Shannon needs libm; Simpson is exact rational —
  * the no-pow/log discipline). Per axis: counts are exact integers,
  * Σnᵢ² folds in DECIMAL(38,0) (== DuckDB HUGEINT; category counts
  * square past 2^63 at corpus scale), and hhi/effective are ONE
  * fixed double tree each. Scale: two partial-agg groupBys to
  * category-bounded frames (sources, langs), a two-row union —
  * the corpus is scanned once per axis, nothing else.
  */
object CorpusQueries10 {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_diversity" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.load(s, dir, "documents").persist()
      def axis(colName: String): DataFrame =
        docs.groupBy(col(colName).as("cat"))
          .agg(count(lit(1)).as("ni"))
          .agg(lit(colName).as("axis"),
            count(lit(1)).as("n_cats"),
            sum($"ni").as("n_docs"),
            sum($"ni".cast("decimal(38,0)") * $"ni".cast("decimal(38,0)"))
              .as("s2"))
      axis("source").unionByName(axis("lang"))
        .withColumn("nd", $"n_docs".cast("double"))
        .withColumn("s2d", $"s2".cast("double"))
        .select($"axis", $"n_cats", $"n_docs",
          ($"s2d" / ($"nd" * $"nd")).as("hhi"),
          (($"nd" * $"nd") / $"s2d").as("effective"))
    }
  )

  val oracles: Map[String, String] = Map(
    "corpus_diversity" ->
      """WITH src AS (SELECT source AS cat, CAST(count(*) AS BIGINT) AS ni
        |  FROM documents GROUP BY 1),
        |lng AS (SELECT lang AS cat, CAST(count(*) AS BIGINT) AS ni
        |  FROM documents GROUP BY 1),
        |ax AS (
        |  SELECT 'source' AS axis, CAST(count(*) AS BIGINT) AS n_cats,
        |    CAST(sum(ni) AS BIGINT) AS n_docs,
        |    sum(CAST(ni AS HUGEINT) * CAST(ni AS HUGEINT)) AS s2
        |  FROM src
        |  UNION ALL
        |  SELECT 'lang' AS axis, CAST(count(*) AS BIGINT) AS n_cats,
        |    CAST(sum(ni) AS BIGINT) AS n_docs,
        |    sum(CAST(ni AS HUGEINT) * CAST(ni AS HUGEINT)) AS s2
        |  FROM lng)
        |SELECT axis, n_cats, n_docs,
        |  CAST(s2 AS DOUBLE)
        |    / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)) AS hhi,
        |  (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE))
        |    / CAST(s2 AS DOUBLE) AS effective
        |FROM ax""".stripMargin
  )
}
