package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2.4). Brute force is the correctness baseline; sign-LSH
  * and IVF cut the candidate set so a 1000-executor top-k is per-bucket
  * local work plus a tiny global merge.
  */
object Similarity {

  /** Exact top-k by cosine against a single query vector (one row of
    * `queryDf` with columns (qid, qv)). The query side is broadcast; the
    * scan stays a single pass with a per-partition top-k then a global
    * merge (TakeOrderedAndProject).
    */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      queryDf: DataFrame, k: Int): DataFrame =
    df.crossJoin(broadcast(queryDf))
      .filter(col(idCol) =!= col("qid"))
      .withColumn("cos", cosine_sim(col(vecCol), col("qv")))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)

  /** Cosine range search: every vector within `tau` of the (broadcast)
    * query — the radius-query sibling of top-k. Embarrassingly
    * parallel: one scan, a row-local codegen'd cosine, a filter — no
    * shuffle at all, so it scales linearly with executors at any
    * corpus size. No Parallelism.ensure: the whole pipeline is inside
    * one codegen stage, and a round-robin repartition to spread a
    * single-row-group test file costs more than the scan it spreads
    * (the round-4 lesson); a real multi-file corpus parallelizes at
    * the scan via file splits. (For repeated range queries at 100 TB,
    * pre-bucket with sign-LSH as in lshTopK and scan matching buckets
    * only.)
    */
  def rangeSearch(df: DataFrame, idCol: String, vecCol: String,
      queryDf: DataFrame, tau: Double): DataFrame =
    df.crossJoin(broadcast(queryDf))
      .filter(col(idCol) =!= col("qid"))
      .withColumn("cos", cosine_sim(col(vecCol), col("qv")))
      .filter(col("cos") >= tau)

  /** LSH-bucketed top-k: candidates share at least one sign-LSH band
    * bucket with the query; exact cosine ranks them. At scale the band
    * join prunes ~the whole corpus; recall is tunable via (bands, rows).
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
      queryDf: DataFrame, k: Int,
      bands: Int = 32, rowsPerBand: Int = 3): DataFrame = {
    val banded = df.withColumn("__bucket",
      explode(sign_lsh_buckets(col(vecCol), bands, rowsPerBand)))
    val qb = queryDf.select(col("qid"), col("qv"),
      explode(sign_lsh_buckets(col("qv"), bands, rowsPerBand)).as("__bucket"))
    banded.join(broadcast(qb), "__bucket")
      .filter(col(idCol) =!= col("qid"))
      .select(df.columns.map(col) :+ col("qv"): _*).distinct()
      .withColumn("cos", cosine_sim(col(vecCol), col("qv")))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }

  /** Batch k-NN join: exact top-k neighbors for EVERY row of `queryDf`
    * ((qid, qv), broadcast). A single per-qid row_number window is
    * already scale-safe on Spark 4: the optimizer inserts a *partial*
    * WindowGroupLimit below the exchange, so each input partition keeps
    * only k rows per query before anything shuffles — shuffle volume is
    * O(partitions × |Q| × k), never the n×Q cross product (verified in
    * PlanAuditSpec). At 100 TB swap the cross join for an LSH/IVF
    * candidate join (same ranking tail); this exact form is the
    * oracle/baseline.
    */
  def knnJoin(df: DataFrame, idCol: String, vecCol: String,
      queryDf: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col(idCol).asc)
    df.crossJoin(broadcast(queryDf))
      .filter(col(idCol) =!= col("qid"))
      .withColumn("cos", cosine_sim(col(vecCol), col("qv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col(idCol), col("cos"), col("rnk"))
  }

  /** Large-|Q| k-NN join: identical selection to [[knnJoin]] but the
    * query side is NEVER broadcast, so it works when Q itself is a big
    * table (query-by-corpus, cross-corpus linking). Queries hash into
    * `qBlocks` blocks and each data row is replicated to every block key
    * (a shuffle hash join on the block id — the mirror of
    * [[graft.operators.Dedup.embeddingPairsExact]]'s bounded-memory
    * contract): per-task memory is O(|Q|/qBlocks) query vectors, shuffle
    * volume O(n·qBlocks + |Q|), and the same map-side partial
    * WindowGroupLimit prunes each partition to k rows per query before
    * the final per-qid exchange. Size qBlocks so one query block fits
    * comfortably in a task (~|Q|·dim·4 / qBlocks bytes).
    */
  def knnJoinBlocked(df: DataFrame, idCol: String, vecCol: String,
      queryDf: DataFrame, k: Int, qBlocks: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col(idCol).asc)
    val q = queryDf.withColumn("__qb",
      pmod(xxhash64(col("qid")), lit(qBlocks)).cast("int"))
    val d = Parallelism.ensure(df).withColumn("__qb",
      explode(expr(s"sequence(0, ${qBlocks - 1})")))
    d.join(q, "__qb")
      .filter(col(idCol) =!= col("qid"))
      .withColumn("cos", cosine_sim(col(vecCol), col("qv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("qid"), col(idCol), col("cos"), col("rnk"))
  }

  /** Train an IVF coarse quantizer with Spark MLlib's distributed
    * k-means (k-means|| init, fixed seed -> deterministic). Returns a
    * (cid, cv) centroid frame directly usable by ivfTopK. At 100 TB the
    * fit runs on a sample; assignment stays a broadcast of k centroids.
    */
  def ivfFit(df: DataFrame, vecCol: String, k: Int,
      maxIter: Int = 20, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.linalg.Vector
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df.select(
      array_to_vector(col(vecCol).cast("array<float>")).as("features"))
    val model = new KMeans()
      .setK(k).setMaxIter(maxIter).setSeed(seed)
      .setFeaturesCol("features")
      .fit(prepared)
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (c: Vector, i: Int) =>
        (i, c.toArray.map(_.toFloat)) }
      .toDF("cid", "cv")
  }

  /** Product-quantization search (ADC): split the D-dim space into `m`
    * subspaces, quantize each subvector to its nearest codebook entry
    * (`codebookDf`: (c, cv) full-width vectors whose slices are the
    * per-subspace codebooks — deterministic seed rows or a trained
    * codebook, caller's choice), then rank by the EXACT cosine between
    * each vector's reconstruction and the query, computed purely from
    * per-(subspace, code) lookup tables. This is the memory-bound
    * billion-vector path: a vector costs m bytes instead of 4·D, the
    * scan never touches the original floats, and the whole pass is
    * shuffle-free (per-partition top-k + global TakeOrdered merge).
    *
    * Determinism contract (mirrors the DuckDB oracle): distances,
    * dots, and norms are strict left folds in ascending dimension /
    * subspace order over exact float→double promotions; argmin ties
    * break to the LOWEST code index. Every double op is a single
    * correctly-rounded IEEE op with an identical expression tree on
    * both engines — bit-identical scores, not merely close.
    */
  def pqTopK(df: DataFrame, idCol: String, vecCol: String,
      codebookDf: DataFrame, queryDf: DataFrame, k: Int, m: Int): DataFrame = {
    val spark = df.sparkSession
    val codeRows = codebookDf.select(col("c"), col("cv"))
      .collect().sortBy(_.getInt(0))
      .map(_.getSeq[Float](1).toArray)
    val q = queryDf.select(col("qv")).head().getSeq[Float](0).toArray
    val dim = q.length
    require(dim % m == 0, s"dim $dim not divisible by $m subspaces")
    val sub = dim / m
    // cb(j)(c)(d): per-subspace codebooks sliced from the seed vectors
    val cb: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      codeRows.map(v => v.slice(j * sub, (j + 1) * sub).map(_.toDouble))
    }
    val qd = q.map(_.toDouble)
    def foldDot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    // per-(subspace, code) LUTs: dot with the query slice + own norm²
    val dotLut = Array.tabulate(m) { j =>
      val qs = qd.slice(j * sub, (j + 1) * sub)
      cb(j).map(c => foldDot(c, qs))
    }
    val nrmLut = Array.tabulate(m)(j => cb(j).map(c => foldDot(c, c)))
    val qn = math.sqrt(foldDot(qd, qd))
    val cbB = spark.sparkContext.broadcast(cb)
    val dotB = spark.sparkContext.broadcast(dotLut)
    val nrmB = spark.sparkContext.broadcast(nrmLut)
    val vecIdx = df.schema.fieldIndex(vecCol)
    val schema = org.apache.spark.sql.types.StructType(df.schema :+
      org.apache.spark.sql.types.StructField("pq_score",
        org.apache.spark.sql.types.DoubleType, nullable = false))
    val scored = df.rdd.mapPartitions { it =>
      val cbv = cbB.value; val dl = dotB.value; val nl = nrmB.value
      it.map { r =>
        val v = r.getSeq[Float](vecIdx)
        var dotSum = 0.0
        var nrmSum = 0.0
        var j = 0
        while (j < cbv.length) {
          val codes = cbv(j)
          // subspace distance: strict left fold over dims, ties -> low c
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < codes.length) {
            val cc = codes(c)
            var d = 0.0
            var i = 0
            while (i < cc.length) {
              val diff = v(j * cc.length + i).toDouble - cc(i)
              d += diff * diff
              i += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          dotSum += dl(j)(best)
          nrmSum += nl(j)(best)
          j += 1
        }
        val score = dotSum / (math.sqrt(nrmSum) * qn)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ score)
      }
    }
    spark.createDataFrame(scored, schema)
      .orderBy(col("pq_score").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF-style search: assign every vector to its nearest centroid
    * (`centroidDf`: (cid, cv)), probe the `nprobe` centroids nearest the
    * query, exact-rank only vectors in probed cells. Ties in assignment
    * break toward the smallest cid — deterministically.
    */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
      centroidDf: DataFrame, queryDf: DataFrame,
      k: Int, nprobe: Int): DataFrame =
    ivfCells(df, idCol, vecCol, centroidDf, queryDf, nprobe)
      .withColumn("cos", cosine_sim(col(vecCol), col("qv")))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)

  /** The IVF candidate stage alone (factored from [[ivfTopK]] so
    * IVFPQ can put an ADC scorer behind the same probe): assign every
    * vector to its nearest centroid, keep only vectors in the `nprobe`
    * cells nearest the query. Returns df's columns + (cid, qid, qv).
    */
  def ivfCells(df: DataFrame, idCol: String, vecCol: String,
      centroidDf: DataFrame, queryDf: DataFrame, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val assignW = Window.partitionBy(col(idCol))
      .orderBy(cosine_sim(col(vecCol), col("cv")).desc, col("cid").asc)
    val assigned = df.crossJoin(broadcast(centroidDf))
      .withColumn("__rn", row_number().over(assignW))
      .filter(col("__rn") === 1)
      .select(df.columns.map(col) :+ col("cid"): _*)
    val probeW = Window.partitionBy(col("qid"))
      .orderBy(cosine_sim(col("qv"), col("cv")).desc, col("cid").asc)
    val probed = queryDf.crossJoin(broadcast(centroidDf))
      .withColumn("__rn", row_number().over(probeW))
      .filter(col("__rn") <= nprobe)
      .select(col("qid"), col("qv"), col("cid"))
    assigned.join(broadcast(probed), "cid")
      .filter(col(idCol) =!= col("qid"))
  }

  /** k-NN GRAPH construction under the committed ann_knn_graph rule
    * (shared by the batch query and the streaming fold
    * [[graft.streaming.StreamingOps.knnGraphMaintained]], so the two
    * can never disagree): every vector is STORED in its primary cell
    * only (argmax centroid cosine, ties to the lowest cid) and PROBES
    * its `nprobe` nearest cells; its edges are the top-`degree`
    * stored vectors across its probed cells by (cos desc, id asc),
    * self excluded. Candidate volume nprobe·n²/k, never all-pairs;
    * the per-vector top-k window partitions on the high-cardinality
    * vector id (map-side WindowGroupLimit). Returns
    * (idCol, nbr_id, cos, rk).
    */
  def knnGraph(df: DataFrame, idCol: String, vecCol: String,
      centroidDf: DataFrame, degree: Int = 3, nprobe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = cellRanked(df, idCol, vecCol, centroidDf)
    val stored = ranked.filter(col("crk") === 1)
      .select(col(idCol).as("nbr_id"), col(vecCol).as("nv"), col("cid"))
    val probes = ranked.filter(col("crk") <= nprobe)
      .select(col(idCol), col(vecCol).as("qv"), col("cid"))
    val wK = Window.partitionBy(col(idCol))
      .orderBy(col("cos").desc, col("nbr_id").asc)
    probes.join(stored, "cid")
      .filter(col(idCol) =!= col("nbr_id"))
      // no dedup needed: a neighbor has ONE primary cell, so it can
      // match at most one of the distinct probed cells
      .select(col(idCol), col("nbr_id"), cosine_sim(col("qv"), col("nv")).as("cos"))
      .withColumn("rk", row_number().over(wK).cast("long"))
      .filter(col("rk") <= degree)
  }

  /** Width-`width`, `steps`-step BEAM SEARCH over an arbitrary directed
    * edge frame (round 18 — VERDICT r17 task 3: the walk kernel pulled
    * out of the query layer so it can consume ANY edge source, in
    * particular a [[graft.streaming.StreamingOps.knnGraphMaintained]]
    * state via knnGraphCurrent/knnGraphMembers — the AMORTIZED form of
    * the graph-ANN build class, which rebuilds nothing). Column
    * contract: `nodes` (vec_id, embedding), `edges` (src, dst, plus any
    * key columns named in `keys` to scope variant graphs), `queries`
    * (q_id, qv), `frontier0` (keys..., node, ncos). Returns the final
    * frontier (keys..., node, ncos).
    *
    * Plan discipline (the audited ann_graph_search loop): the frontier
    * and query frames broadcast (bounded: |queries|·width rows), the
    * node/edge frames stream through per-step hash joins; candidates ⊇
    * frontier and dedup exactly (a node reached twice scores the SAME
    * strict-fold cosine, so distinct collapses bit-equal rows); eager
    * localCheckpoint per step with constraint propagation off — the
    * frontier is consumed twice per step (self-union + probe) and
    * lineage grows 3^steps otherwise. Extra `keys` columns ride the
    * windows so several independent beams (variants, width curves) pay
    * the fixed per-round scheduling latency ONCE; `width` may be an
    * expression over the key columns.
    *
    * `keys` MUST contain "q_id" (enforced): the per-step query join
    * anchors on the frontier's q_id column — extra key columns (a
    * variant tag) ride beside it, they do not replace it (ADVICE r18:
    * the silent requirement surfaced as an unresolved-column error).
    */
  def graphBeamSearch(nodes: DataFrame, edges: DataFrame,
      queries: DataFrame, frontier0: DataFrame,
      keys: Seq[String] = Seq("q_id"),
      width: org.apache.spark.sql.Column = null,
      steps: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keys.contains("q_id"),
      s"graphBeamSearch keys must include q_id (the per-step query " +
        s"join anchors on it); got ${keys.mkString(", ")}")
    val spark = nodes.sparkSession
    val widthCol = Option(width).getOrElse(lit(8))
    val cpKey = "spark.sql.constraintPropagation.enabled"
    val cpPrev = spark.conf.get(cpKey)
    val wB = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("ncos").desc, col("node").asc)
    // key columns that ALSO exist on the edge frame scope the walk to
    // that key's graph — variant graphs walk in one loop without
    // leaking edges across variants
    val edgeKeys = keys.filter(edges.columns.contains)
    var frontier = frontier0
    spark.conf.set(cpKey, "false")
    try for (step <- 1 to steps) {
      val nbrs = broadcast(frontier).as("f")
        .join(edges.as("e"), edgeKeys
          .map(k => col(s"f.$k") === col(s"e.$k"))
          .foldLeft(col("f.node") === col("e.src"))(_ && _))
        .join(nodes.select(col("vec_id").as("nid"),
          col("embedding").as("nv")).as("n"), col("e.dst") === col("n.nid"))
        .join(broadcast(queries).as("a"), col("f.q_id") === col("a.q_id"))
        .select(keys.map(k => col(s"f.$k").as(k)) ++
          Seq(col("n.nid").as("node"),
            cosine_sim(col("a.qv"), col("n.nv")).as("ncos")): _*)
      val prev = frontier
      frontier = frontier.unionByName(nbrs).distinct()
        .withColumn("__rn", row_number().over(wB))
        .filter(col("__rn") <= widthCol)
        .select(keys.map(col) ++ Seq(col("node"), col("ncos")): _*)
        .localCheckpoint(true)
      // drop the superseded step's checkpoint RDD now that the next
      // one has materialized (the eager checkpoint above) — ADVICE
      // r18: per-step RDD storage otherwise lingers until release().
      // Never step 1's input: frontier0 is caller-owned.
      if (step > 1) prev.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.rdd.unpersist(blocking = false)
        case _ => ()
      }
    } finally spark.conf.set(cpKey, cpPrev)
    frontier
  }

  /** Argmax-cosine cell ASSIGNMENT as a map-side partial max(struct)
    * (ties to the lowest cid — the dedup_semantic discipline): one
    * `__cell` column appended to (idCol, vecCol). The aggregation
    * form scales where the [[cellRanked]] window form ranks (use
    * this when only the winning cell is needed). The same committed
    * rule also lives in the annManifest/semanticDedup folds'
    * in-line assignments — any change here must change those.
    */
  def assignCells(df: DataFrame, idCol: String, vecCol: String,
      centroidDf: DataFrame): DataFrame =
    df.crossJoin(broadcast(centroidDf))
      .select(col(idCol), col(vecCol),
        struct(cosine_sim(col(vecCol), col("cv")).as("c"),
          (lit(0L) - col("cid")).as("negcid")).as("m"))
      .groupBy(col(idCol), col(vecCol))
      .agg(max(col("m")).as("m"))
      .select(col(idCol), col(vecCol),
        (lit(0L) - col("m.negcid")).as("__cell"))

  /** Centroid-cosine cell ranking: df's (id, vec) against every
    * centroid, `crk` = 1 for the nearest cell (ties to the lowest
    * cid) — the storage/probe primitive behind [[knnGraph]].
    */
  def cellRanked(df: DataFrame, idCol: String, vecCol: String,
      centroidDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("cc").desc, col("cid").asc)
    df.select(col(idCol), col(vecCol)).crossJoin(broadcast(centroidDf))
      .select(col(idCol), col(vecCol), col("cid"),
        cosine_sim(col(vecCol), col("cv")).as("cc"))
      .withColumn("crk", row_number().over(w))
  }
}
