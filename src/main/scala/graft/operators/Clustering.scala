package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Integer fixed-point Lloyd k-means (SURVEY.md §2.4, round 6) — the
  * clustering primitive behind SemDeDup-style semantic curation and
  * IVF index training (reference: query/vector-search surface; cf.
  * `Similarity.ivfFit` which trains throughput-first on floats).
  *
  * Everything is BIGINT: coordinates are quantized to non-negative
  * micro-units (`floor((x + offset) · scale)` — float→double widening
  * is exact, one double add + one double multiply + floor are
  * IEEE-deterministic, so both engines mint identical integers),
  * distances are integer squared-L2 (order-independent sums → the
  * per-cluster reduction commutes, unlike float k-means where the
  * contribution order changes the centroid bits), and the centroid
  * update is `sum div count` truncating division on non-negative
  * operands — identical to DuckDB `//` (the round-3 negative-trap is
  * dodged by the offset making every coordinate non-negative).
  * Result: every assignment, every centroid coordinate, and the final
  * inertia are bit-exact replayable in ANSI SQL.
  *
  * Scale shape (the MLlib-KMeans shape): centroids live on the driver
  * between rounds — k·dim longs, O(k·d) driver state, the documented
  * eager-ladder contract (cf. PQ's 64-row codebook collect,
  * Similarity.scala). Each round is ONE distributed job: assignment
  * is a row-local argmin against a broadcast centroid literal (zero
  * shuffle), and the update is posexplode → groupBy(cid, pos) whose
  * map-side partial aggregation bounds the exchange at
  * partitions·k·dim pre-combined rows — never n·dim. At 100 TB the
  * only growing cost is the scan; the shuffle and driver state stay
  * k·dim-bounded.
  */
object Clustering {

  /** Quantize a float/double array column to non-negative BIGINT
    * micro-units: `floor((x + offset) * scale)` per element. Offset
    * must exceed `-min(x)` so every output is non-negative (squared
    * distances are offset-invariant; truncating division then matches
    * DuckDB `//` with no negative-truncation guard).
    */
  def quantize(vec: Column, offset: Double = 1.0, scale: Double = 1e6): Column =
    transform(vec, x => floor((x.cast("double") + lit(offset)) * lit(scale)))

  /** Integer squared-L2 distance of two equal-length BIGINT arrays —
    * the native codegen'd expression (round 16: the zip_with+aggregate
    * HOF form runs interpreted with a per-row intermediate array and
    * dominated the n×⌈√n⌉ assignment cross joins at 100×; arithmetic
    * identical).
    */
  def sqDist(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.sq_dist(a, b)

  /** Final assignment plus the centroids that produced it. */
  final case class KMeansResult(
      assigned: DataFrame,               // (id, cid, d2)
      centroids: Seq[(Long, Seq[Long])]) // driver-side, k·dim longs

  private def centsLit(cs: Seq[(Long, Seq[Long])]): Column =
    array(cs.map { case (cid, cv) =>
      struct(lit(cid).as("cid"), array(cv.map(lit(_)): _*).as("cv"))
    }: _*)

  /** Row-local argmin assignment against a centroid literal: min over
    * struct(d2, cid) = lowest distance, ties to the lowest cid.
    */
  private def assign(points: DataFrame, idCol: String, vecCol: String,
                     cs: Seq[(Long, Seq[Long])]): DataFrame = {
    val best = array_min(transform(centsLit(cs), c =>
      struct(sqDist(col(vecCol), c.getField("cv")).as("d2"),
        c.getField("cid").as("cid"))))
    points.select(col(idCol).as("id"), col(vecCol).as("qv"),
        best.getField("cid").as("cid"), best.getField("d2").as("d2"))
  }

  /** `iters` Lloyd rounds from the given seeds, then a final
    * assignment against the settled centroids. A cluster that loses
    * every member keeps its previous centroid (both engines LEFT-JOIN
    * the update onto the prior round). `points` should be persisted by
    * the caller — each round scans it once.
    */
  def kmeansFixedPoint(points: DataFrame, idCol: String, vecCol: String,
                       seeds: Seq[(Long, Seq[Long])], iters: Int): KMeansResult = {
    require(seeds.nonEmpty, "kmeansFixedPoint: empty seed set")
    val dim = seeds.head._2.length
    val cents = (1 to iters).foldLeft(seeds) { (cs, _) =>
      // one job per round: sum/count per (cid, pos), partial-aggregated
      // map-side, k·dim-row result collected to the driver
      val upd = assign(points, idCol, vecCol, cs)
        .select(col("cid"), posexplode(col("qv")).as(Seq("pos", "q")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("q")).as("sq"), count(lit(1)).as("cnt"))
        .select(col("cid"), col("pos"), expr("sq div cnt").as("nq"))
        .collect()
      val byCid: Map[Long, Seq[Long]] = upd.groupBy(_.getLong(0)).map {
        case (cid, rows) =>
          val cv = rows.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
          require(cv.length == dim, s"kmeansFixedPoint: centroid $cid has ${cv.length} dims, expected $dim")
          cid -> cv
      }
      cs.map { case (cid, old) => cid -> byCid.getOrElse(cid, old) }
    }
    KMeansResult(
      assign(points, idCol, vecCol, cents).drop("qv"),
      cents)
  }
}
