package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-17 relational addition (VERDICT r16 task 8): the graph
  * family's missing centrality axis beside q90 (PageRank), q91
  * (distance), q92 (k-core), q93 (communities), q126 (closeness).
  *
  * `q135_betweenness` — seed-pair STRESS centrality (Shimbel's
  * unnormalized betweenness — the float-free member of the
  * betweenness family): over the q91/q126 co-trade bipartite graph,
  * for every unordered pair (s < t) of the fixed 6-customer seed set,
  * each node v ∉ {s, t} accumulates σ_s(v)·σ_t(v) when
  * d_s(v) + d_t(v) = d(s, t) — the NUMBER of shortest s–t paths
  * passing through v (Brandes' pair dependency without the σ_st
  * division, which would leave the integer lattice; ranking by
  * stress is the same "who brokers the anchor accounts" question).
  * σ comes from LEVEL-SYNCHRONOUS BFS: round k relaxes ONLY the
  * dist = k−1 frontier, so each path is counted exactly once
  * (re-relaxing the full table every round — the q126 min-fold shape
  * — is idempotent for min but would double-count sums); σ_s(v) =
  * Σ σ_s(u) over dist-(k−1) neighbors is an exact integer fold,
  * order-independent. d(s, t) itself derives as min over v of
  * d_s(v) + d_t(v) — any midpoint of a ≤8-hop shortest path sits
  * within the 4-hop horizon of both ends, so pairs up to distance 8
  * resolve from the two 4-hop tables.
  *
  * Scale shape = q126's: the edge relation builds once (partial-agg
  * distinct pairs, never a row² self-join), repartition(dst) +
  * persist; each BFS round joins the |seeds|·frontier-bounded rows
  * (broadcast) against co-partitioned edges, one (seed, node)
  * partial-agg sum and one broadcast anti-join; 4 rounds is the
  * fixed-depth contract. The pair stage self-joins the ≤|seeds|·|V|
  * settled table on node (string aliases — the round-2 self-join
  * rule) into 15 seed pairs, then one partial-agg sum per node.
  * Top-100 via orderBy+limit (TakeOrderedAndProject). Integer
  * discipline: σ products stay in BIGINT (path counts within 4 hops
  * of THIS graph; both engines throw loudly on overflow rather than
  * wrap — the χ²/minhash bound-as-invariant rule). Replica scaling
  * note: the co-trade graph is IDENTICAL across the 10×/100× replica
  * corpora (replication shifts order keys only), so scale probes
  * measure the edge-build scan, as for q126.
  */
object RelationalQueries22 {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q135_betweenness" -> { (s, dir) =>
      import s.implicits._
      val orders = Tables.load(s, dir, "orders")
      val lineitem = Tables.load(s, dir, "lineitem")
      val cs = orders.join(lineitem, $"o_orderkey" === $"l_orderkey")
        .groupBy(($"o_custkey" * 2).as("src"),
          ($"l_suppkey" * 2 + 1).as("dst"))
        .agg(count(lit(1)).as("cnt"))
        .select($"src", $"dst")
      val edges = cs.union(cs.select($"dst".as("src"), $"src".as("dst")))
        .repartition($"dst")
        .persist()
      val seeds = Seq(2L, 4L, 6L, 8L, 10L, 12L).toDF("seed")
      val s0 = seeds.select($"seed", $"seed".as("node"),
        lit(0L).as("dist"), lit(1L).as("sigma"))
      val sF = (1 to 4).foldLeft(s0) { (settled, k) =>
        val st = settled.persist() // three consumers per round
        val contrib = edges
          .join(broadcast(st.filter($"dist" === (k - 1).toLong)
            .select($"node".as("src"), $"seed", $"sigma")), "src")
          .groupBy($"seed", $"dst".as("node"))
          .agg(sum($"sigma").as("sigma"))
        val newly = contrib
          .join(broadcast(st.select($"seed", $"node")),
            Seq("seed", "node"), "left_anti")
          .select($"seed", $"node", lit(k.toLong).as("dist"), $"sigma")
        st.unionByName(newly)
      }.persist() // the pair stage consumes it twice (a and b sides)
      val pj = sF.as("a").join(sF.as("b"),
          col("a.node") === col("b.node") && col("a.seed") < col("b.seed"))
        .select(col("a.seed").as("s"), col("b.seed").as("t"),
          col("a.node").as("node"),
          (col("a.dist") + col("b.dist")).as("dsum"),
          (col("a.sigma") * col("b.sigma")).as("prod"))
        .persist() // consumed twice: pair-distance derivation + the sum
      val dstT = pj.groupBy($"s", $"t").agg(min($"dsum").as("d"))
      pj.join(broadcast(dstT), Seq("s", "t"))
        .filter($"dsum" === $"d" && $"node" =!= $"s" && $"node" =!= $"t")
        .groupBy($"node").agg(sum($"prod").as("stress"))
        .select($"node", ($"node" % 2).as("ntype"), $"stress")
        .orderBy($"stress".desc, $"node".asc).limit(100)
    }
  )

  /** One unrolled level-synchronous BFS round: relax the dist = k−1
    * frontier only, keep strictly new (seed, node) rows at dist k.
    */
  private def roundSql(k: Int): String = {
    val prev = s"s${k - 1}"
    s"""c$k AS (SELECT d.seed, e.dst AS node,
       |    CAST(sum(d.sigma) AS BIGINT) AS sigma
       |  FROM $prev d JOIN e ON e.src = d.node
       |  WHERE d.dist = ${k - 1}
       |  GROUP BY d.seed, e.dst),
       |n$k AS (SELECT c$k.seed, c$k.node, CAST($k AS BIGINT) AS dist,
       |    c$k.sigma
       |  FROM c$k LEFT JOIN $prev p
       |    ON p.seed = c$k.seed AND p.node = c$k.node
       |  WHERE p.node IS NULL),
       |s$k AS (SELECT * FROM $prev UNION ALL SELECT * FROM n$k)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q135_betweenness" -> {
      val rounds = (1 to 4).map(roundSql).mkString(",\n")
      s"""WITH cs AS (SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
         |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |e AS MATERIALIZED (SELECT src, dst FROM cs
         |  UNION ALL SELECT dst AS src, src AS dst FROM cs),
         |sd AS (SELECT CAST(unnest([2, 4, 6, 8, 10, 12]) AS BIGINT)
         |    AS seed),
         |s0 AS (SELECT seed, seed AS node, CAST(0 AS BIGINT) AS dist,
         |    CAST(1 AS BIGINT) AS sigma FROM sd),
         |$rounds,
         |pj AS (SELECT a.seed AS s, b.seed AS t, a.node,
         |    a.dist + b.dist AS dsum, a.sigma * b.sigma AS prod
         |  FROM s4 a JOIN s4 b ON a.node = b.node AND a.seed < b.seed),
         |dst AS (SELECT s, t, min(dsum) AS d FROM pj GROUP BY s, t)
         |SELECT p.node, p.node % 2 AS ntype,
         |  CAST(sum(p.prod) AS BIGINT) AS stress
         |FROM pj p JOIN dst ON dst.s = p.s AND dst.t = p.t
         |  AND p.dsum = dst.d
         |WHERE p.node <> p.s AND p.node <> p.t
         |GROUP BY p.node
         |ORDER BY stress DESC, node ASC LIMIT 100""".stripMargin
    }
  )
}
