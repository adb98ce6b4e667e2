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
  * σ comes from pure per-level WALK counts — the stage-minimal form
  * (round 17 second cut; the first cut kept a settled table with a
  * per-round anti-join and broadcast pair, ~4 jobs/round, and read
  * 8 s at sf0.001 — a pure scheduling floor): R_k(s, v) = number of
  * length-k walks s→v, folded as R_k = Σ over edges of R_{k−1} —
  * ONE broadcast relax join + one partial-agg sum per round, the
  * exact q126 per-round shape, no settled union, no anti-join. The
  * walk table over-counts only at non-minimal dists: a walk of
  * length d(s, v) cannot revisit or detour, so R_{d(s,v)}(s, v) IS
  * σ_s(v) — keeping each (seed, node)'s min-dist row (one
  * min(struct) groupBy at the end) recovers exact shortest-path
  * counts. d(s, t) derives as min over v of
  * d_s(v) + d_t(v), and the stress sum is taken over seed pairs
  * with d(s, t) <= 4 ONLY: within that horizon every interior node
  * of every shortest path sits within 4 hops of both ends, so the
  * count is COMPLETE — a pair at distance 6 or 8 would silently
  * drop on-path nodes more than 4 hops from one endpoint (partial
  * credit, an inconsistent definition — round-17 self-review), so
  * such pairs are excluded outright rather than miscounted.
  *
  * USER-FACING CONTRACT (round 20 — VERDICT r19 task 7): this query
  * computes stress over seed pairs with d(s, t) <= 4 and REPORTS
  * `n_pairs_in_horizon` beside `n_seed_pairs` so an excluded pair is
  * visible, never silent. On a graph whose seed pairs sit wider than
  * the horizon the right moves are (a) raise the walk depth — the
  * loop bound and the horizon predicate are the SAME constant, and
  * the overflow envelope widens to "length-k walk counts < 2^63"
  * (both engines throw loudly rather than wrap if it breaks), paying
  * one extra broadcast-relax round per added hop; or (b) Brandes-
  * style sampled betweenness (sample sources, full BFS each) — a
  * different estimator, deliberately NOT silently substituted here.
  * Partial credit (counting only near-endpoint interior nodes of a
  * wider pair) is never an option; that inconsistent definition is
  * what the horizon exclusion exists to prevent.
  *
  * Scale shape = q126's: the edge relation builds once (partial-agg
  * distinct pairs, never a row² self-join), repartition(dst) +
  * persist; each round broadcasts the ≤|seeds|·|V| frontier against
  * the co-partitioned edges; 4 rounds is the fixed-depth contract.
  * The pair stage self-joins the min-dist table on node (string
  * aliases — the round-2 self-join rule) into 15 seed pairs, then
  * one partial-agg sum per node. Top-100 via orderBy+limit
  * (TakeOrderedAndProject). Integer discipline: σ values and
  * products stay in BIGINT — walk counts at NON-minimal dists can
  * grow like degree^4 and are discarded, but they are materialized
  * before the discard, so the committed envelope is "length-4 walk
  * counts < 2^63" (true of this graph family at every probed scale;
  * both engines throw loudly on overflow rather than wrap — the
  * χ²/minhash bound-as-invariant rule). Replica scaling note: the
  * co-trade graph is IDENTICAL across the 10×/100× replica corpora
  * (replication shifts order keys only), so scale probes measure
  * the edge-build scan, as for q126.
  */
object RelationalQueries22 {

  /** The walk depth AND the pair-distance horizon — one constant, so
    * raising the depth widens the horizon consistently (the contract
    * paragraph above; overflow envelope: length-Horizon walk counts
    * must stay < 2^63, loudly enforced by both engines).
    */
  private val Horizon = 4

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q135_betweenness" -> { (s, dir) =>
      import s.implicits._
      // edge scan shared across the graph family (round 19 — VERDICT
      // r18 task 5): GraphEdges.cotradePairs builds once per session
      val cs = GraphEdges.cotradePairs(s, dir).select($"src", $"dst")
      val edges = cs.union(cs.select($"dst".as("src"), $"src".as("dst")))
        .repartition($"dst")
        .persist()
      val seedIds = Seq(2L, 4L, 6L, 8L, 10L, 12L)
      val seeds = seedIds.toDF("seed")
      val r0 = seeds.select($"seed", $"seed".as("node"),
        lit(0L).as("dist"), lit(1L).as("sigma"))
      // per-level walk counts: R_k = one broadcast relax of R_{k-1}
      // against the co-partitioned edges + one partial-agg sum —
      // the q126 per-round shape. Each R_k is consumed twice (next
      // round's relax + the final union), hence the per-round persist
      // (the q91 Bellman-Ford structural fact).
      val parts = scala.collection.mutable.ArrayBuffer(r0)
      var fr = r0
      for (k <- 1 to Horizon) {
        val f = fr.persist()
        val next = edges
          .join(broadcast(f.select($"node".as("src"), $"seed", $"sigma")),
            "src")
          .groupBy($"seed", $"dst".as("node"))
          .agg(sum($"sigma").as("sigma"))
          .select($"seed", $"node", lit(k.toLong).as("dist"), $"sigma")
        parts += next
        fr = next
      }
      // min-dist row per (seed, node) = (distance, shortest-path
      // count): dists are distinct within a group, so min(struct)
      // picks exactly the first-reached level's pre-summed row
      val sF = parts.reduce(_ unionByName _)
        .groupBy($"seed", $"node")
        .agg(min(struct($"dist", $"sigma")).as("m"))
        .select($"seed", $"node", $"m.dist".as("dist"),
          $"m.sigma".as("sigma"))
        .persist() // the pair stage consumes it twice (a and b sides)
      val pj = sF.as("a").join(sF.as("b"),
          col("a.node") === col("b.node") && col("a.seed") < col("b.seed"))
        .select(col("a.seed").as("s"), col("b.seed").as("t"),
          col("a.node").as("node"),
          (col("a.dist") + col("b.dist")).as("dsum"),
          (col("a.sigma") * col("b.sigma")).as("prod"))
        .persist() // consumed twice: pair-distance derivation + the sum
      val dstT = pj.groupBy($"s", $"t").agg(min($"dsum").as("d"))
        .persist() // consumed twice: the horizon audit + the pair join
      // the horizon CONTRACT columns (round 20 — VERDICT r19 task 7):
      // pairs beyond d<=4 are EXCLUDED, never miscounted — the output
      // carries how many seed pairs exist vs how many the horizon
      // covers, so an excluded pair is visible in the report itself.
      // n_seed_pairs counts from the SEED SET (C(|seeds|,2)), never
      // from dstT: a pair whose Horizon-hop balls do not even
      // intersect has no dstT row at all, and deriving the total from
      // dstT would hide exactly the pairs the contract exists to
      // surface (round-20 self-review)
      // C(|seeds|, 2) over the LITERAL seed set — a driver-side
      // constant (round 20): the old form ran a full Spark job
      // (toDF self-join + count) to compute 15
      val nSeedPairs = {
        val n = seedIds.distinct.size.toLong
        n * (n - 1) / 2
      }
      val hz = dstT.agg(lit(nSeedPairs).as("n_seed_pairs"),
        sum(when($"d" <= Horizon.toLong, 1L).otherwise(0L))
          .as("n_pairs_in_horizon"))
      pj.join(broadcast(dstT), Seq("s", "t"))
        .filter($"d" <= Horizon.toLong && $"dsum" === $"d" &&
          $"node" =!= $"s" && $"node" =!= $"t")
        .groupBy($"node").agg(sum($"prod").as("stress"))
        .crossJoin(broadcast(hz))
        .select($"node", ($"node" % 2).as("ntype"), $"stress",
          $"n_seed_pairs", $"n_pairs_in_horizon")
        .orderBy($"stress".desc, $"node".asc).limit(100)
    }
  )

  /** One unrolled walk-count round: R_k = relax of R_{k−1}. */
  private def roundSql(k: Int): String =
    s"""r$k AS (SELECT d.seed, e.dst AS node, CAST($k AS BIGINT) AS dist,
       |    CAST(sum(d.sigma) AS BIGINT) AS sigma
       |  FROM r${k - 1} d JOIN e ON e.src = d.node
       |  GROUP BY d.seed, e.dst)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q135_betweenness" -> {
      val rounds = (1 to Horizon).map(roundSql).mkString(",\n")
      s"""WITH cs AS (SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
         |    CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |e AS MATERIALIZED (SELECT src, dst FROM cs
         |  UNION ALL SELECT dst AS src, src AS dst FROM cs),
         |sd AS (SELECT CAST(unnest([2, 4, 6, 8, 10, 12]) AS BIGINT)
         |    AS seed),
         |r0 AS (SELECT seed, seed AS node, CAST(0 AS BIGINT) AS dist,
         |    CAST(1 AS BIGINT) AS sigma FROM sd),
         |$rounds,
         |u AS (SELECT * FROM r0 UNION ALL SELECT * FROM r1
         |  UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
         |  UNION ALL SELECT * FROM r4),
         |md AS (SELECT seed, node, min(dist) AS dist FROM u
         |  GROUP BY seed, node),
         |sf AS (SELECT u.seed, u.node, u.dist, u.sigma
         |  FROM u JOIN md ON md.seed = u.seed AND md.node = u.node
         |    AND md.dist = u.dist),
         |pj AS (SELECT a.seed AS s, b.seed AS t, a.node,
         |    a.dist + b.dist AS dsum, a.sigma * b.sigma AS prod
         |  FROM sf a JOIN sf b ON a.node = b.node AND a.seed < b.seed),
         |dst AS (SELECT s, t, min(dsum) AS d FROM pj GROUP BY s, t),
         |hz AS (SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM sd a JOIN sd b
         |    ON a.seed < b.seed) AS n_seed_pairs,
         |  CAST(sum(CASE WHEN d <= $Horizon THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_pairs_in_horizon FROM dst)
         |SELECT p.node, p.node % 2 AS ntype,
         |  CAST(sum(p.prod) AS BIGINT) AS stress,
         |  any_value(hz.n_seed_pairs) AS n_seed_pairs,
         |  any_value(hz.n_pairs_in_horizon) AS n_pairs_in_horizon
         |FROM pj p JOIN dst ON dst.s = p.s AND dst.t = p.t
         |  AND p.dsum = dst.d
         |CROSS JOIN hz
         |WHERE dst.d <= $Horizon AND p.node <> p.s AND p.node <> p.t
         |GROUP BY p.node
         |ORDER BY stress DESC, node ASC LIMIT 100""".stripMargin
    }
  )
}
