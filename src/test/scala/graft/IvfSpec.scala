package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class IvfSpec extends SparkSpec {

  test("MLlib-trained IVF quantizer drives ivfTopK") {
    val emb = Tables.load(spark, sf, "embeddings")
    val centroids = Similarity.ivfFit(emb, "embedding", k = 8, maxIter = 10)
    assert(centroids.count() == 8)
    assert(centroids.head().getSeq[Float](1).length == 64)

    // determinism: same seed -> identical centers
    val again = Similarity.ivfFit(emb, "embedding", k = 8, maxIter = 10)
    val a = centroids.orderBy("cid").collect().map(_.getSeq[Float](1).toList)
    val b = again.orderBy("cid").collect().map(_.getSeq[Float](1).toList)
    assert(a.zip(b).forall { case (x, y) => x == y })

    val q = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val top = Similarity.ivfTopK(emb, "vec_id", "embedding",
      centroids, q, k = 5, nprobe = 3)
    val rows = top.select("vec_id", "cos").collect()
    assert(rows.length == 5 && !rows.map(_.getLong(0)).contains(0L))
    val cs = rows.map(_.getDouble(1))
    assert(cs.zip(cs.tail).forall { case (x, y) => x >= y })
  }
}
