package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.Similarity

/** ANN search over `embeddings` (SURVEY.md §2.4). The query vector is
  * vec_id 0 (taken from the table itself so oracle and engine share it
  * exactly). Cosines are bit-identical between engines (strict left
  * folds over identical doubles), so top-k ordering matches exactly.
  */
object SimilarityQueries {

  private def queryDf(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings").filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_bruteforce" -> { (s, dir) =>
      Similarity.bruteForceTopK(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        queryDf(s, dir), k = 10)
        .select(col("vec_id"), col("label"), col("cos"))
    },

    "ann_lsh" -> { (s, dir) =>
      Similarity.lshTopK(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        queryDf(s, dir), k = 10, bands = 32, rowsPerBand = 3)
        .select(col("vec_id"), col("label"), col("cos"))
    },

    // batch k-NN join: every 50th vector is a query; exact top-5 each
    "knn_join" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      Similarity.knnJoin(emb, "vec_id", "embedding", q, k = 5)
    },

    "ann_ivf" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val w = Window.partitionBy(col("label")).orderBy(col("vec_id").asc)
      val centroids = emb.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("label").as("cid"), col("embedding").as("cv"))
      Similarity.ivfTopK(emb, "vec_id", "embedding",
        centroids, queryDf(s, dir), k = 10, nprobe = 3)
        .select(col("vec_id"), col("label"), col("cid"), col("cos"))
    }
  )

  /** cosine as a strict left fold — bit-identical to CosineSim. */
  private def cos(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"""list_reduce(list_transform(range(1, len($x) + 1),
         | gi -> CAST($x[CAST(gi AS INT)] AS DOUBLE) * CAST($y[CAST(gi AS INT)] AS DOUBLE)),
         | (gx, gy) -> gx + gy)""".stripMargin
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }

  /** Sign-LSH bucket list — mirrors SignLshBuckets (32 bands x 3 rows). */
  private def lshBuckets(v: String): String = {
    def planeDot(p: String) =
      s"""list_reduce(list_transform(range(1, len($v) + 1),
         | gi -> CAST(((1000003 * ($p) + 7919 * (gi - 1)) % 97) - 48 AS DOUBLE)
         |   * CAST($v[CAST(gi AS INT)] AS DOUBLE)),
         | (gx, gy) -> gx + gy)""".stripMargin
    def bit(p: String) = s"CASE WHEN ${planeDot(p)} >= 0 THEN 1 ELSE 0 END"
    s"""list_transform(range(0, 32), gb -> gb * 8
       | + 4 * ${bit("3 * gb")}
       | + 2 * ${bit("3 * gb + 1")}
       | + ${bit("3 * gb + 2")})""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "ann_bruteforce" ->
      s"""SELECT e.vec_id, e.label, ${cos("e.embedding", "q.qv")} AS cos
         |FROM embeddings e,
         |  (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q
         |WHERE e.vec_id != 0
         |ORDER BY cos DESC, e.vec_id ASC LIMIT 10""".stripMargin,

    "knn_join" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv
         |  FROM embeddings WHERE vec_id % 50 = 0),
         |p AS (SELECT q.qid, e.vec_id, ${cos("e.embedding", "q.qv")} AS cos
         |  FROM embeddings e, q WHERE e.vec_id != q.qid),
         |r AS (SELECT qid, vec_id, cos, row_number() OVER (PARTITION BY qid
         |    ORDER BY cos DESC, vec_id ASC) AS rnk FROM p)
         |SELECT qid, vec_id, cos, rnk FROM r WHERE rnk <= 5""".stripMargin,

    "ann_lsh" ->
      s"""WITH bk AS (SELECT vec_id, label, embedding,
         |  ${lshBuckets("embedding")} AS bks FROM embeddings),
         |q AS (SELECT embedding AS qv, bks AS qbks FROM bk WHERE vec_id = 0)
         |SELECT vec_id, label, ${cos("embedding", "q.qv")} AS cos
         |FROM bk, q
         |WHERE vec_id != 0 AND len(list_intersect(bks, qbks)) > 0
         |ORDER BY cos DESC, vec_id ASC LIMIT 10""".stripMargin,

    "ann_ivf" ->
      s"""WITH c AS (SELECT e.label AS cid, e.embedding AS cv
         |  FROM embeddings e
         |  JOIN (SELECT min(vec_id) AS mv FROM embeddings GROUP BY label) m
         |    ON e.vec_id = m.mv),
         |asg AS (SELECT vec_id, label, embedding, cid,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cos_vc DESC, cid ASC) AS rn
         |  FROM (SELECT e.vec_id, e.label, e.embedding, c.cid,
         |    ${cos("e.embedding", "c.cv")} AS cos_vc FROM embeddings e, c)),
         |cells AS (SELECT vec_id, label, embedding, cid FROM asg WHERE rn = 1),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |probe AS (SELECT cid FROM (SELECT c.cid,
         |    row_number() OVER (ORDER BY ${cos("q.qv", "c.cv")} DESC, c.cid ASC) AS rn
         |  FROM c, q) WHERE rn <= 3)
         |SELECT x.vec_id, x.label, x.cid, ${cos("x.embedding", "q.qv")} AS cos
         |FROM cells x, probe p, q
         |WHERE x.cid = p.cid AND x.vec_id != 0
         |ORDER BY cos DESC, x.vec_id ASC LIMIT 10""".stripMargin
  )
}
