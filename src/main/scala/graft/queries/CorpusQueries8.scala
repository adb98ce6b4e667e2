package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** `corpus_token_budget` (round 9) — BUDGETED SELECTION: every training
  * run has a token budget, and the curation question is "which
  * documents fill it best?" Per SOURCE (the natural budget unit — in a
  * real corpus sources are domains/crawls, high-cardinality), rank
  * documents by the `text_quality_clf` model score (best first, doc_id
  * tie-break) and select greedily while the running token total stays
  * within B = 2000. Emits the full per-doc decision trail (score,
  * running total, selected flag) — the auditable form of a selection;
  * the manifest is one rollup away.
  *
  * Parity discipline: the score is the committed rational-weight
  * scorer (integer S over 1000·n, one IEEE division — identical
  * expression both engines, so the ORDER is engine-identical too);
  * the running total is an exact integer prefix sum over that order;
  * the selection compare is integer. Scale shape: ONE hash shuffle on
  * source, per-source window prefix sum (rides the same exchange);
  * zero-token docs are excluded up front (they can neither spend
  * budget nor be ranked).
  */
object CorpusQueries8 {

  // binds on this corpus: sources carry ~1300-1600 tokens at sf0.01,
  // so a 1000-token budget forces real selection (2000 selected all)
  private val Budget = 1000L

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_token_budget" -> { (s, dir) =>
      import s.implicits._
      import graft.functions.GraftFunctions.poly_hash
      val toks = filter(split($"text", " "), t => length(t) > 0)
      val contrib = transform(toks, t => {
        val wNum = (lit(2654435761L) * ((poly_hash(t) % 32) + 1)) % 1999 - 999
        val sgn = when(poly_hash(t, 37) % 2 === 0, lit(1L)).otherwise(lit(-1L))
        sgn * wNum
      })
      val scored = Tables.load(s, dir, "documents")
        .select($"doc_id", $"source", size(toks).cast("long").as("n_toks"),
          aggregate(contrib, lit(0L), (acc, x) => acc + x).as("s_num"))
        .filter($"n_toks" > 0)
        .withColumn("score",
          $"s_num".cast("double") / ($"n_toks".cast("double") * 1000.0))
      val w = Window.partitionBy($"source")
        .orderBy($"score".desc, $"doc_id".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      scored
        .withColumn("cum_toks", sum($"n_toks").over(w))
        .select($"doc_id", $"source", $"n_toks", $"score", $"cum_toks",
          ($"cum_toks" <= Budget).as("selected"))
    }
  )

  private def ph(base: Int) =
    s"""list_reduce(list_transform(range(1, length(gt) + 1),
       | gi -> CAST(ord(substr(gt, CAST(gi AS INT), 1)) AS BIGINT)),
       | (ga, gc) -> (ga * $base + gc) % 1000000007)""".stripMargin

  val oracles: Map[String, String] = Map(
    "corpus_token_budget" ->
      s"""WITH t AS (SELECT doc_id, source,
         |    list_filter(string_split(text, ' '), gt -> gt <> '') AS toks
         |  FROM documents),
         |s AS (SELECT doc_id, source, CAST(len(toks) AS BIGINT) AS n_toks,
         |    CAST(coalesce(list_sum(list_transform(toks, gt ->
         |      (CASE WHEN (${ph(37)}) % 2 = 0 THEN 1 ELSE -1 END)
         |      * ((CAST(2654435761 AS BIGINT) * (((${ph(31)}) % 32) + 1))
         |         % 1999 - 999))), 0) AS BIGINT) AS s_num
         |  FROM t),
         |sc AS (SELECT doc_id, source, n_toks,
         |    CAST(s_num AS DOUBLE) / (CAST(n_toks AS DOUBLE) * 1000.0)
         |      AS score
         |  FROM s WHERE n_toks > 0)
         |SELECT doc_id, source, n_toks, score,
         |  CAST(sum(n_toks) OVER (PARTITION BY source
         |    ORDER BY score DESC, doc_id ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum_toks,
         |  (sum(n_toks) OVER (PARTITION BY source
         |    ORDER BY score DESC, doc_id ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) <= $Budget)
         |    AS selected
         |FROM sc""".stripMargin
  )
}
