package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-7 text additions.
  *
  * `text_readability` — Automated Readability Index (Senter & Smith
  * 1967), the classic no-dictionary readability score: 4.71·(chars/
  * words) + 0.5·(words/sentences) − 21.43. ARI is chosen over
  * Flesch-Kincaid precisely because it needs NO syllable counting —
  * every input is an exact integer (non-space chars, space-split
  * words, sentence enders), and the score is one fixed double
  * expression tree identical on both engines (mul/add/div are IEEE
  * deterministic; the no-log/pow discipline). Row-local, zero
  * shuffles.
  *
  * `dedup_normalized` — canonicalization dedup, the cheap first pass
  * every web-corpus pipeline runs before fuzzy matching (C4's exact
  * dedup is this shape): lowercase, strip sentence punctuation,
  * collapse space runs, then exact-match on the normalized key. One
  * hash shuffle on the high-cardinality key; survivor = min doc_id
  * (the dedup_exact convention).
  */
object TextQueries4 {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_readability" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        .withColumn("n_words",
          (length($"text") - length(regexp_replace($"text", " ", "")) + 1)
            .cast("long"))
        .withColumn("n_chars_ns",
          length(regexp_replace($"text", " ", "")).cast("long"))
        .withColumn("n_sent", greatest(lit(1L),
          (length($"text") - length(regexp_replace($"text", "[.!?]", "")))
            .cast("long")))
        .select($"doc_id", $"n_words", $"n_chars_ns", $"n_sent",
          (lit(4.71) * ($"n_chars_ns".cast("double") / $"n_words") +
            lit(0.5) * ($"n_words".cast("double") / $"n_sent") -
            lit(21.43)).as("ari"))
    },

    "dedup_normalized" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        .withColumn("k", trim(regexp_replace(
          regexp_replace(lower($"text"), "[.,;:!?]", ""), " +", " ")))
        .groupBy($"k")
        .agg(min($"doc_id").as("keep_id"),
          count(lit(1)).as("n_members"))
        .select($"keep_id", $"n_members", length($"k").cast("long").as("key_len"))
    }
  )

  val oracles: Map[String, String] = Map(
    // regexp_replace needs the 'g' flag in DuckDB (Spark replaces all
    // occurrences by default)
    "text_readability" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) + 1
        |    AS BIGINT) AS n_words,
        |  CAST(length(regexp_replace(text, ' ', '', 'g')) AS BIGINT)
        |    AS n_chars_ns,
        |  greatest(CAST(1 AS BIGINT),
        |    CAST(length(text) - length(regexp_replace(text, '[.!?]', '', 'g'))
        |      AS BIGINT)) AS n_sent
        |  FROM documents)
        |SELECT doc_id, n_words, n_chars_ns, n_sent,
        |  4.71 * (CAST(n_chars_ns AS DOUBLE) / n_words)
        |    + 0.5 * (CAST(n_words AS DOUBLE) / n_sent) - 21.43 AS ari
        |FROM t""".stripMargin,

    "dedup_normalized" ->
      """WITH n AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[.,;:!?]', '', 'g'),
        |    ' +', ' ', 'g')) AS k
        |  FROM documents)
        |SELECT CAST(min(doc_id) AS BIGINT) AS keep_id,
        |  CAST(count(*) AS BIGINT) AS n_members,
        |  CAST(length(k) AS BIGINT) AS key_len
        |FROM n GROUP BY k""".stripMargin
  )
}
