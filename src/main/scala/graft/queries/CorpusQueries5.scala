package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Fifth corpus wave (SURVEY.md §2.3, round 6): per-document
  * overlapping token-window chunking — the RAG-indexing / windowed-
  * training primitive `corpus_pack` deliberately is not (packing
  * concatenates documents greedily into fixed budgets; chunking slides
  * a fixed window WITHIN each document with a stride, so every token
  * lands in ≥1 chunk and boundaries overlap for context continuity).
  *
  * Scale shape: strictly row-local — split + arithmetic + explode;
  * zero shuffles, parallelism = scan splits. Chunk count per doc is
  * `1 + ceil(max(0, n-W)/S)`; the last window CLAMPS to the document
  * end (it is shorter than W rather than padded, and never starts past
  * the end), so chunks cover the token range exactly once per stride.
  * All arithmetic is integer (`div`); the DuckDB oracle replays it
  * with `//` guarded positive (DuckDB `//` truncates toward zero, not
  * floor — the round-3 negative-numerator trap — so the <=W case is
  * split out as a literal 1 on both engines).
  */
object CorpusQueries5 {

  /** Window (tokens per chunk) and stride (tokens between chunk
    * starts); overlap = W - S. Values chosen so sf0.01 documents
    * (20-500 tokens) produce 1-10 chunks each.
    */
  private val W = 64
  private val S = 48

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_chunk" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id", split($"text", " ").as("toks"))
        .withColumn("n", size($"toks"))
        // integer chunk count: `div` keeps the whole computation in
        // exact integer arithmetic (DataFrame `/` would be double)
        .withColumn("n_chunks",
          expr(s"1 + (CASE WHEN n <= $W THEN 0 ELSE (n - $W + $S - 1) div $S END)"))
        .select($"doc_id", $"toks", $"n",
          explode(sequence(lit(0), $"n_chunks" - 1)).as("chunk_idx"))
        .select(
          $"doc_id",
          $"chunk_idx".cast("long").as("chunk_idx"),
          least(lit(W), $"n" - $"chunk_idx" * S).cast("long").as("chunk_tokens"),
          array_join(slice($"toks", $"chunk_idx" * S + 1, lit(W)), " ")
            .as("chunk_text"))
    }
  )

  val oracles: Map[String, String] = Map(
    "corpus_chunk" ->
      s"""WITH ws AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |c AS (
        |  SELECT doc_id, w, len(w) AS n,
        |    CASE WHEN len(w) <= $W THEN 1
        |         ELSE (len(w) - $W + $S - 1) // $S + 1 END AS n_chunks
        |  FROM ws),
        |e AS (
        |  SELECT doc_id, w, n, unnest(range(0, n_chunks)) AS chunk_idx
        |  FROM c)
        |SELECT doc_id,
        |  CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(least($W, n - chunk_idx * $S) AS BIGINT) AS chunk_tokens,
        |  array_to_string(list_slice(w, chunk_idx * $S + 1, chunk_idx * $S + $W), ' ')
        |    AS chunk_text
        |FROM e""".stripMargin
  )
}
