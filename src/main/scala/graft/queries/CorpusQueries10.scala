package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-12 session-3 corpus addition (+ the round-17 semantic
  * decontamination screen).
  *
  * `corpus_contamination_sem` — SEMANTIC eval-set decontamination
  * (round 17, VERDICT r16 task 3): corpus_contamination's exact
  * 5-gram screen catches verbatim leakage; a PARAPHRASED benchmark
  * question shares no 5-gram but sits next to the original in
  * embedding space. Eval set = every 97th vector (the
  * corpus_contamination split convention), centroids = the
  * deterministic first-⌈√n⌉ vectors (the ann_knn_graph convention);
  * each side assigns to its argmax-cosine cell (ties to the lowest
  * cid — the dedup_semantic discipline) and a train vector counts an
  * eval hit iff SAME cell and strict-fold cosine ≥ 0.25 (the
  * corpus-probed operating point: 13 of 494 sf0.01 train vectors
  * flagged, max 2 hits — 0.4 flags 1, 0.2 flags 26). Output is TOTAL
  * (every train vector, n_hits = 0 when clean — the screen totality
  * contract). Scale: operators.Contamination.screenSemantic — the
  * tiny eval side broadcasts, the corpus never shuffles, candidates
  * are same-cell only (n·|bench|/k in expectation — the
  * dedup_embedding_cells blocking; cross-cell paraphrase pairs are
  * the documented recall trade, nprobe on the bench side buys them
  * back). ContaminationSpec plants a paraphrase pair and proves the
  * screen flags it.
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
    "corpus_contamination_sem" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val k = math.ceil(math.sqrt(
        Tables.rowCount(s, dir, "embeddings").toDouble)).toLong
      val cen = emb.filter($"vec_id" < k)
        .select($"vec_id".cast("long").as("cid"), $"embedding".as("cv"))
      val bench = emb.filter($"vec_id" % 97 === 0)
      val train = emb.filter($"vec_id" % 97 =!= 0)
      graft.operators.Contamination.screenSemantic(
        train, bench, "vec_id", "embedding", cen, tau = 0.25)
    },

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
    // the fold rule replayed: argmax-cell assignment (cos DESC, cid
    // ASC — the dedup_incremental_sem oracle pattern), same-cell LEFT
    // join (a train vector with no eval cell-mate stays a row with
    // n_hits = 0), strict-fold cosine >= 0.25
    "corpus_contamination_sem" ->
      s"""WITH cen AS MATERIALIZED (
         |  SELECT CAST(vec_id AS BIGINT) AS cid, embedding AS cv
         |  FROM embeddings
         |  WHERE vec_id < (SELECT CAST(ceil(sqrt(count(*))) AS BIGINT)
         |                  FROM embeddings)),
         |asg AS MATERIALIZED (SELECT vec_id, cell, embedding FROM (
         |    SELECT e.vec_id, c.cid AS cell, e.embedding,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${SimilarityQueries6.cos("e.embedding", "c.cv")}
         |          DESC, c.cid ASC) AS rn
         |    FROM embeddings e CROSS JOIN cen c)
         |  WHERE rn = 1),
         |tr AS (SELECT * FROM asg WHERE vec_id % 97 <> 0),
         |ev AS (SELECT * FROM asg WHERE vec_id % 97 = 0)
         |SELECT t.vec_id,
         |  CAST(count(CASE WHEN e.vec_id IS NOT NULL
         |    AND ${SimilarityQueries6.cos("t.embedding", "e.embedding")}
         |      >= CAST(0.25 AS DOUBLE) THEN 1 END) AS BIGINT) AS n_hits
         |FROM tr t LEFT JOIN ev e ON e.cell = t.cell
         |GROUP BY t.vec_id""".stripMargin,

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
