package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-8 text additions, wave 2.
  *
  * `text_gopher` — the Gopher quality-rule audit (Rae et al. 2021,
  * Appendix A), the rule set most LLM-corpus pipelines start from.
  * This corpus has no newlines or sentence punctuation, so the
  * line-level rules (bullet/ellipsis ratios) are vacuous here; the
  * five word-level rules are implemented exactly, and every
  * threshold compare is INTEGER (cross-multiplied — `10*sym <= n`
  * instead of `sym/n <= 0.1`) so no float ratio ever forms and the
  * DuckDB oracle replays bit-for-bit:
  *
  *   r_wc     — word count in [50, 100000]
  *   r_mwl    — mean word length in [3, 10]  (3n <= chars <= 10n)
  *   r_sym    — symbol('#','…')-to-word ratio <= 0.1
  *   r_alpha  — >= 80% of words contain an alphabetic character
  *   r_stop   — >= 2 DISTINCT stopwords from the fixed list present
  *
  * Flags emit as 1/0 ints (engine-portable rendering), plus the raw
  * counts an auditor needs to tune thresholds. Row-local at scan
  * parallelism — zero shuffles; at 100 TB this is a pure map over
  * the corpus, exactly what a gate pass should be.
  */
object TextQueries5 {

  private val stopList =
    graft.functions.GraftFunctions.stopwords.map(w => s"'$w'").mkString(", ")
  private def markerList(l: String) =
    graft.functions.GraftFunctions.langMarkers.toMap.apply(l)
      .map(w => s"'$w'").mkString(", ")
  private def sqlCount(set: String) =
    s"len(list_filter(string_split(text, ' '), gw -> gw IN ($set)))"

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // `text_langid_eval` — the CONFUSION MATRIX for the langid
    // classifier (round 8): per (true lang, predicted lang) counts
    // plus each true lang's total and the share — the eval artifact a
    // classifier report leads with (text_langid emits predictions;
    // this closes the loop against the labels, the ann_recall
    // discipline for text). Row-local classify at scan parallelism,
    // ONE partial-agg (lang, pred) rollup; totals/share come from a
    // window over the ≤|langs|² AGGREGATED frame (downsample-then-
    // window); share is one division of exact counts.
    "text_langid_eval" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      import graft.functions.GraftFunctions.{lang_scores, lang_predict}
      val df = Tables.load(s, dir, "documents")
      val scores = lang_scores($"text")
      val scored = scores.foldLeft(df) { case (d, (l, c)) =>
        d.withColumn(s"s_$l", c) }
        .withColumn("pred",
          lang_predict(scores.map { case (l, _) => l -> col(s"s_$l") }))
      val wl = Window.partitionBy($"lang")
      scored.groupBy($"lang", $"pred").agg(count(lit(1)).as("n"))
        .withColumn("n_lang", sum($"n").over(wl))
        .withColumn("share",
          $"n".cast("double") / $"n_lang".cast("double"))
    },

    "text_gopher" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        .withColumn("n_words",
          size(split($"text", " ")).cast("long"))
        .withColumn("n_chars_ns",
          length(regexp_replace($"text", " ", "")).cast("long"))
        .withColumn("n_sym",
          (length($"text") - length(regexp_replace($"text", "[#…]", "")))
            .cast("long"))
        .withColumn("n_alpha_words",
          size(expr("filter(split(text, ' '), gw -> gw rlike '[a-zA-Z]')"))
            .cast("long"))
        .withColumn("n_stop_distinct",
          size(expr(
            s"filter(array_distinct(split(text, ' ')), gw -> gw IN ($stopList))"))
            .cast("long"))
        .select($"doc_id", $"n_words", $"n_chars_ns", $"n_sym",
          $"n_alpha_words", $"n_stop_distinct",
          when($"n_words" >= 50L && $"n_words" <= 100000L, 1).otherwise(0)
            .as("r_wc"),
          when($"n_chars_ns" >= lit(3L) * $"n_words" &&
               $"n_chars_ns" <= lit(10L) * $"n_words", 1).otherwise(0)
            .as("r_mwl"),
          when(lit(10L) * $"n_sym" <= $"n_words", 1).otherwise(0)
            .as("r_sym"),
          when(lit(10L) * $"n_alpha_words" >= lit(8L) * $"n_words", 1)
            .otherwise(0).as("r_alpha"),
          when($"n_stop_distinct" >= 2L, 1).otherwise(0).as("r_stop"))
        .withColumn("keep",
          when($"r_wc" + $"r_mwl" + $"r_sym" + $"r_alpha" + $"r_stop" === 5, 1)
            .otherwise(0))
    }
  )

  val oracles: Map[String, String] = Map(
    // the scoring CTE mirrors text_langid's oracle; the rollup adds
    // the confusion counts + per-true-lang window totals
    "text_langid_eval" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |  ${sqlCount(markerList("de"))} AS s_de,
         |  ${sqlCount(markerList("en"))} AS s_en,
         |  ${sqlCount(markerList("es"))} AS s_es,
         |  ${sqlCount(markerList("fr"))} AS s_fr,
         |  ${sqlCount(markerList("zh"))} AS s_zh
         |  FROM documents),
         |p AS (SELECT lang,
         |  CASE
         |    WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         |    WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         |    WHEN s_es >= s_de AND s_es >= s_en AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
         |    WHEN s_fr >= s_de AND s_fr >= s_en AND s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
         |    WHEN s_zh >= s_de AND s_zh >= s_en AND s_zh >= s_es AND s_zh >= s_fr THEN 'zh'
         |    ELSE 'und' END AS pred
         |  FROM t),
         |c AS (SELECT lang, pred, CAST(count(*) AS BIGINT) AS n
         |      FROM p GROUP BY 1, 2)
         |SELECT lang, pred, n,
         |  CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS n_lang,
         |  CAST(n AS DOUBLE) /
         |    CAST(CAST(sum(n) OVER (PARTITION BY lang) AS BIGINT) AS DOUBLE)
         |    AS share
         |FROM c""".stripMargin,

    // len(string_split) == Spark size(split) on space-separated text;
    // regexp_replace needs the 'g' flag in DuckDB
    "text_gopher" ->
      s"""WITH t AS (SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         |  CAST(length(regexp_replace(text, ' ', '', 'g')) AS BIGINT)
         |    AS n_chars_ns,
         |  CAST(length(text) - length(regexp_replace(text, '[#…]', '', 'g'))
         |    AS BIGINT) AS n_sym,
         |  CAST(len(list_filter(string_split(text, ' '),
         |    gw -> regexp_matches(gw, '[a-zA-Z]'))) AS BIGINT)
         |    AS n_alpha_words,
         |  CAST(len(list_filter(list_distinct(string_split(text, ' ')),
         |    gw -> gw IN ($stopList))) AS BIGINT) AS n_stop_distinct
         |  FROM documents)
         |SELECT doc_id, n_words, n_chars_ns, n_sym, n_alpha_words,
         |  n_stop_distinct,
         |  CASE WHEN n_words >= 50 AND n_words <= 100000 THEN 1 ELSE 0 END
         |    AS r_wc,
         |  CASE WHEN n_chars_ns >= 3*n_words AND n_chars_ns <= 10*n_words
         |    THEN 1 ELSE 0 END AS r_mwl,
         |  CASE WHEN 10*n_sym <= n_words THEN 1 ELSE 0 END AS r_sym,
         |  CASE WHEN 10*n_alpha_words >= 8*n_words THEN 1 ELSE 0 END
         |    AS r_alpha,
         |  CASE WHEN n_stop_distinct >= 2 THEN 1 ELSE 0 END AS r_stop,
         |  CASE WHEN (CASE WHEN n_words >= 50 AND n_words <= 100000 THEN 1 ELSE 0 END)
         |          + (CASE WHEN n_chars_ns >= 3*n_words AND n_chars_ns <= 10*n_words THEN 1 ELSE 0 END)
         |          + (CASE WHEN 10*n_sym <= n_words THEN 1 ELSE 0 END)
         |          + (CASE WHEN 10*n_alpha_words >= 8*n_words THEN 1 ELSE 0 END)
         |          + (CASE WHEN n_stop_distinct >= 2 THEN 1 ELSE 0 END) = 5
         |    THEN 1 ELSE 0 END AS keep
         |FROM t""".stripMargin
  )
}
