package graft

import org.apache.spark.sql.functions._
import graft.operators.Clustering

/** Invariants of the integer fixed-point Lloyd k-means. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def toyPoints = Seq(
    // two tight groups on a line (1-D embedded in 3 dims) + one outlier
    (0L, Seq(0.0, 0.0, 0.0)), (1L, Seq(0.01, 0.0, 0.0)), (2L, Seq(0.02, 0.0, 0.0)),
    (3L, Seq(0.9, 0.0, 0.0)), (4L, Seq(0.91, 0.0, 0.0)), (5L, Seq(0.92, 0.0, 0.0)),
    (6L, Seq(-0.5, 0.4, 0.0))
  ).toDF("id", "v").select($"id", Clustering.quantize($"v").as("qv"))

  test("quantize is non-negative integer micro-units") {
    val vals = toyPoints.select(explode($"qv")).as[Long].collect()
    assert(vals.forall(_ >= 0L))
    // 0.0 -> floor(1.0 * 1e6) = 1000000
    val zero = Seq(Seq(0.0)).toDF("v")
      .select(Clustering.quantize($"v")).as[Seq[Long]].head()
    assert(zero == Seq(1000000L))
  }

  test("sqDist is exact integer squared-L2") {
    val d = Seq((Seq(3L, 0L, 4L), Seq(0L, 0L, 0L))).toDF("a", "b")
      .select(Clustering.sqDist($"a", $"b")).as[Long].head()
    assert(d == 25L)
  }

  test("two Lloyd rounds separate the two groups; assignment partitions ids") {
    val pts = toyPoints.persist()
    val seeds = pts.filter($"id" < 2).orderBy($"id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toSeq
    val res = Clustering.kmeansFixedPoint(pts, "id", "qv", seeds, 2)
    val rows = res.assigned.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.keySet == (0L to 6L).toSet) // every point assigned exactly once
    // the right-hand group ends up in one cluster, distinct from the left group
    assert(Set(rows(3L), rows(4L), rows(5L)).size == 1)
    assert(rows(0L) != rows(3L))
    // centroids stay k-sized with the seeded ids
    assert(res.centroids.map(_._1) == seeds.map(_._1))
    pts.unpersist()
  }

  test("a cluster that loses all members keeps its previous centroid") {
    // seed 1 sits far outside the data; every point is nearer seed 0
    val pts = Seq((0L, Seq(0L, 0L)), (1L, Seq(2L, 0L))).toDF("id", "qv")
    val farAway = Seq(1000000L, 1000000L)
    val res = Clustering.kmeansFixedPoint(pts, "id", "qv",
      Seq(0L -> Seq(0L, 0L), 9L -> farAway), 2)
    assert(res.centroids.toMap.apply(9L) == farAway)
    assert(res.assigned.select($"cid").distinct().as[Long].collect().toSet == Set(0L))
  }
}
