package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.GraftFunctions.cosine_sim

/** ANN EVALUATION (round 7): `ann_recall` — recall@10 of the int8
  * scalar-quantized shortlist (ann_sq8's retrieval stage) against the
  * exact cosine top-10, measured per anchor IN the engine. Every
  * serious ANN deployment ships this harness next to the index: the
  * quantizer/probe settings are tuned against measured recall, not
  * faith.
  *
  * Parity: the exact side ranks by strict-fold cosines (bit-identical
  * per the CosineSim contract), the shortlist side by an
  * order-independent INTEGER dot of floor(x·127) codes, and both
  * rankings tie-break on vec_id — so the hit count is exact on both
  * engines and the one division to a recall fraction is a single IEEE
  * op. Scale shape: anchors broadcast (5 rows), both ranks come from
  * rank<=k windows over the anchor key (map-side partial
  * WindowGroupLimit prunes each to k·partitions rows pre-shuffle),
  * and the hit join runs on ≤ anchors·40 rows.
  */
object SimilarityQueries4 {

  private val NAnchors = 5
  private val ShortlistK = 40
  private val TopK = 10

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_recall" -> { (s, dir) =>
      import s.implicits._
      val qz = expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0D) AS BIGINT))")
      val emb = Tables.load(s, dir, "embeddings").withColumn("qz", qz)
      val anchors = emb.filter($"vec_id" < NAnchors)
        .select($"vec_id".as("q_id"), $"embedding".as("qv"), $"qz".as("qqz"))
      val cand = emb.filter($"vec_id" >= NAnchors)
        .crossJoin(broadcast(anchors))
        .select($"q_id", $"vec_id",
          cosine_sim($"embedding", $"qv").as("cos"),
          expr("aggregate(zip_with(qz, qqz, (a, b) -> a * b), " +
            "CAST(0 AS BIGINT), (acc, x) -> acc + x)").as("dotq"))
        .persist() // feeds both rankings; one kernel pass
      val wE = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id".asc)
      val wS = Window.partitionBy($"q_id").orderBy($"dotq".desc, $"vec_id".asc)
      val exact = cand.withColumn("rk", row_number().over(wE))
        .filter($"rk" <= TopK).select($"q_id", $"vec_id")
      val shortlist = cand.withColumn("rk", row_number().over(wS))
        .filter($"rk" <= ShortlistK).select($"q_id", $"vec_id")
      exact.join(shortlist, Seq("q_id", "vec_id"), "left_semi")
        .groupBy($"q_id").agg(count(lit(1)).as("hits"))
        .select($"q_id", $"hits",
          ($"hits".cast("double") / lit(TopK.toDouble)).as("recall"))
    }
  )

  private def dot(x: String, y: String) =
    s"""list_reduce(list_transform(range(1, len($x) + 1),
       | gi -> CAST($x[CAST(gi AS INT)] AS DOUBLE) * CAST($y[CAST(gi AS INT)] AS DOUBLE)),
       | (gx, gy) -> gx + gy)""".stripMargin
  private def cos(a: String, b: String): String =
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"

  val oracles: Map[String, String] = Map(
    "ann_recall" ->
      s"""WITH z AS (
         |  SELECT vec_id, embedding,
         |    list_transform(embedding,
         |      gx -> CAST(floor(CAST(gx AS DOUBLE) * 127.0) AS BIGINT)) AS qz
         |  FROM embeddings),
         |a AS (SELECT vec_id AS q_id, embedding AS qv, qz AS qqz
         |      FROM z WHERE vec_id < $NAnchors),
         |c AS (
         |  SELECT a.q_id, z.vec_id, ${cos("z.embedding", "a.qv")} AS cos,
         |    CAST(list_reduce(list_transform(range(1, len(z.qz) + 1),
         |      gi -> z.qz[CAST(gi AS INT)] * a.qqz[CAST(gi AS INT)]),
         |      (ga, gx) -> ga + gx) AS BIGINT) AS dotq
         |  FROM z, a WHERE z.vec_id >= $NAnchors),
         |ex AS (SELECT q_id, vec_id FROM c
         |  QUALIFY row_number() OVER (PARTITION BY q_id
         |    ORDER BY cos DESC, vec_id ASC) <= $TopK),
         |sl AS (SELECT q_id, vec_id FROM c
         |  QUALIFY row_number() OVER (PARTITION BY q_id
         |    ORDER BY dotq DESC, vec_id ASC) <= $ShortlistK)
         |SELECT ex.q_id, CAST(count(*) AS BIGINT) AS hits,
         |  CAST(count(*) AS DOUBLE) / ${TopK.toDouble} AS recall
         |FROM ex JOIN sl ON ex.q_id = sl.q_id AND ex.vec_id = sl.vec_id
         |GROUP BY ex.q_id""".stripMargin
  )
}
