package graft

/** Physical-plan audit (SURVEY.md §5/§6): locks in the plan shapes that
  * make the headline queries survive a 100× scale-up. A regression that
  * silently drops a pushdown, a partial aggregate, a broadcast, or a
  * map-side window group limit fails here long before it shows up as a
  * cluster bill.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q4 pushes predicate and projection into the parquet scan") {
    val p = plan("q4_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull") && p.contains("GreaterThan"),
      "predicate must reach the scan")
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint," +
      "l_quantity:double,l_returnflag:string>"),
      "scan must read only referenced columns")
  }

  test("window rank queries prune to k per partition before the shuffle") {
    for (q <- Seq("q8_window_rank", "knn_join")) {
      val p = plan(q)
      assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
        s"$q must carry a map-side (Partial) WindowGroupLimit")
    }
  }

  test("explode aggregation combines map-side before the exchange") {
    val p = plan("q42_explode")
    assert(p.contains("partial_count"),
      "token counting must partial-aggregate below the exchange")
  }

  test("multiway join broadcasts every dimension side") {
    val p = plan("q2_join_agg")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3,
      "orders/customer/nation must all broadcast against lineitem")
    assert(!p.contains("SortMergeJoin"),
      "no fact-fact shuffle join should appear in this query")
  }

  test("top-k ordering uses TakeOrderedAndProject, not a global sort") {
    val p = plan("q3_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("set operations plan as broadcast semi/anti joins over partial-agg distincts") {
    // r2->r3 showed a 0.2s wobble on q39; pin the shape so a real plan
    // regression (e.g. losing the broadcast to a shuffle join) fails
    // loudly while timing noise stays invisible
    for ((q, join) <- Seq("q38_intersect" -> "LeftSemi", "q39_except" -> "LeftAnti")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin") && p.contains(join),
        s"$q must broadcast the supplier side of the $join join")
      assert(!p.contains("SortMergeJoin"),
        s"$q must not shuffle-join the nationkey sets")
      // keyed distinct prints as two HashAggregate levels around its
      // exchange (map-side combine, no named functions so no partial_)
      assert("HashAggregate".r.findAllIn(p).length >= 2,
        s"$q's distinct must map-side combine below its exchange")
    }
  }

  test("row-local text/multimodal kernels are entirely shuffle-free") {
    for (q <- Seq("text_repetition", "text_pii", "text_quality",
        "text_tokens", "text_langid", "text_fingerprint", "mm_extract",
        "corpus_gini")) {
      val p = plan(q)
      assert(!p.contains("Exchange"),
        s"$q must not shuffle — per-document kernels scale linearly only " +
          "if they stay inside the scan stage")
    }
  }

  test("sketch aggregates partial-aggregate below the exchange (sketches move, rows don't)") {
    for (q <- Seq("sketch_freq_topk", "sketch_kll_quantiles", "sketch_theta_setops")) {
      val p = plan(q)
      assert(p.contains("ObjectHashAggregate"),
        s"$q must aggregate sketch buffers via ObjectHashAggregate")
      assert(p.contains("partial_"),
        s"$q must build per-task partial sketches before the exchange — " +
          "shipping raw rows to one reducer would not survive scale")
    }
  }

  test("bloom-pruned join probes the filter below the join") {
    val p = plan("q52_bloom_join")
    assert(p.contains("might_contain"),
      "probe-side scan stage must carry the bloom might_contain predicate")
    val joinPos = p.indexOf("Join")
    val probePos = p.indexOf("might_contain")
    assert(joinPos >= 0 && probePos > joinPos,
      "might_contain must sit below the join in the plan tree")
  }

  test("global row numbering avoids the single-task no-partition window") {
    val p = plan("q53_global_index")
    assert(!p.contains("Window"),
      "q53 must not plan a Window — row_number() OVER (ORDER BY) with no " +
        "partition keys funnels 100 TB through one task")
    // the range exchange lives in the operator's internal pass; the
    // final plan is a parallel ExistingRDD scan, not a window
    assert(p.contains("Scan ExistingRDD"))
  }

  test("q58 MAD computes both medians without a per-group window") {
    val p = plan("q58_mad")
    assert(!p.contains("Window"),
      "q58 must not plan a Window — PARTITION BY a 5-value key " +
        "serializes each group through one task; RankSelect's range " +
        "repartition is the scale path")
    // the broadcast of the 5-row median table and the range exchanges
    // live inside RankSelect's internal passes; the returned plan is a
    // parallel ExistingRDD scan, same contract as q53
    assert(p.contains("Scan ExistingRDD"))
  }

  test("q65 entity match joins on the block key, never cross-joins") {
    val p = plan("q65_entity_match")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidate generation must be an equi-join on the blocking key")
    assert(p.contains("partial_count"),
      "distinct-name canonicalization must partial-aggregate before its exchange")
  }

  test("variant extraction stays inside whole-stage codegen with partial aggs") {
    val p = plan("q64_variant")
    assert(p.contains("variant_get"), "typed path extraction must appear in the plan")
    assert(p.contains("partial_count"),
      "the decile rollup must partial-aggregate below the exchange")
  }

  test("the portable-SQL entry point plans like the DataFrame path") {
    val p = plan("q67_sql")
    assert(p.contains("BroadcastHashJoin"),
      "the aggregated per-customer side must broadcast against customer")
    assert(p.contains("partial_count"),
      "the per-customer rollup must partial-aggregate below its exchange")
    assert(p.contains("WindowGroupLimit"),
      "the rk <= 3 filter must push a map-side window group limit")
  }

  test("round-4 aggregates partial-combine and broadcast their tiny sides") {
    // bit aggs: decomposable -> map-side partial (exchange carries 3
    // longs + count per group, never rows)
    val bit = plan("q72_bit_agg")
    assert(bit.contains("partial_bit_and") || bit.contains("Partial"),
      "bit aggregates must partial-combine below the exchange")
    // robust scaling: the 1-row quantile frame must broadcast back over
    // the fact table, never shuffle it (the constant g=1 key folds the
    // equi-join into a 1-row BroadcastNestedLoopJoin — still broadcast)
    val rs = plan("feat_robust_scale")
    assert((rs.contains("BroadcastHashJoin") ||
        rs.contains("BroadcastNestedLoopJoin")) && !rs.contains("SortMergeJoin"),
      "quantile scalars must broadcast against orders")
    // target encoding: global stats join is a broadcast nested loop of
    // ONE row — the fact table itself must not shuffle for it
    val te = plan("feat_target_encode")
    assert(!te.contains("SortMergeJoin"),
      "the 1-row global-prior join must not shuffle the categories")
  }

  test("span dedup marks covered tokens via one gram exchange, no doc pairs") {
    val p = plan("corpus_span_dedup")
    assert(p.contains("partial_count"),
      "duplicated-gram detection must partial-aggregate below its exchange")
    assert(!p.contains("CartesianProduct"),
      "no document pair may ever be compared directly")
  }

  test("range search is a scan + filter with zero exchanges before output") {
    val p = plan("ann_range")
    assert(!p.contains("Exchange hashpartitioning"),
      "radius search must not shuffle the corpus")
    assert(!p.contains("Exchange roundrobin"),
      "no ensure-repartition either: the per-row cosine is codegen'd and " +
        "a real corpus parallelizes at the scan via file splits")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the single query vector must broadcast")
  }

  test("keep_best survivor selection is ONE component shuffle over the pinned labeling") {
    // round 20 batch 3: the CC loop is the shared simhash_components
    // artifact; the plan is the artifact parquet scan + ONE documents
    // equi-join to re-attach n_chars + the survivor rank / member count
    // sharing a single Exchange on the high-cardinality component key.
    // A second hashpartitioning(component...) exchange or a third scan
    // means someone reintroduced the persist + re-join + second groupBy.
    val p = plan("dedup_keep_best")
    assert("Exchange hashpartitioning\\(component".r.findAllIn(p).length == 1,
      "survivor rank and member count must share one component exchange")
    assert("Window \\[".r.findAllIn(p).length == 2,
      "both the rank and the member count must be windows over that exchange")
    assert("FileScan parquet".r.findAllIn(p).length == 2,
      "exactly two scans: the pinned component labeling + documents for n_chars")
  }

  test("grid interval join hashes on the cell, never a theta nested loop") {
    val p = plan("q81_interval_point_join")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "containment must be an equi-join on the grid cell + filter")
    assert(p.contains("partial_count"),
      "per-interval counts must partial-aggregate below the exchange")
  }

  test("corpus chunking is entirely shuffle-free (explode stays in the scan stage)") {
    val p = plan("corpus_chunk")
    assert(!p.contains("Exchange"),
      "chunking is row-local split+explode — any shuffle means the " +
        "window arithmetic left the scan stage")
  }

  test("RRF fusion bounds both retrievers with partial top-N, no global sort") {
    val p = plan("ann_rrf")
    assert(p.contains("TakeOrderedAndProject"),
      "each retriever shortlist must be a partial top-N (TakeOrdered), " +
        "not a global sort of the corpus")
    // the only full-frame sorts allowed are over the fused candidate set
    // (≤ 2·Depth rows after the limits); the corpus itself must never be
    // globally sorted — which would print as Sort ... Exchange rangepartitioning
    assert(!p.contains("Exchange rangepartitioning"),
      "no corpus-wide range-partitioned sort may appear")
  }

  test("BM25 scoring is one broadcast aggregate + row-local top-k") {
    val p = plan("corpus_bm25")
    assert(p.contains("TakeOrderedAndProject"),
      "top-50 must be a partial top-N, not a global sort")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the 1-row corpus-stats frame must broadcast back")
    assert(!p.contains("Exchange hashpartitioning") &&
      !p.contains("Exchange rangepartitioning"),
      "scoring is row-local against broadcast stats — no keyed shuffle " +
        "may appear (the fixed query keeps tf extraction out of an " +
        "exploded term join)")
  }

  test("hard-negative mining prunes rank<=10 map-side, anchors broadcast") {
    val p = plan("ann_negatives")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      "rank<=10 must plan a map-side partial WindowGroupLimit")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the 5-row anchor set must broadcast, never shuffle the corpus")
  }

  test("semantic dedup pre-combines the assignment fan-out map-side") {
    val p = plan("dedup_semantic")
    assert(p.contains("partial_max"),
      "argmax assignment must partial-aggregate (one row per vector " +
        "reaches the exchange, not one per vector×centroid)")
    assert(p.contains("BroadcastNestedLoopJoin") &&
      p.contains("BroadcastHashJoin"),
      "centroids and keepers must both broadcast")
    assert(!p.contains("SortMergeJoin") &&
      !p.contains("Exchange rangepartitioning"),
      "no shuffle join or global sort: the only keyed exchanges are " +
        "the vec_id combine and the k-row keeper rollup")
  }

  test("pagerank iterations partial-aggregate contributions map-side") {
    val p = plan("q90_pagerank")
    assert(p.contains("partial_sum"),
      "per-dst contribution sums must combine below the exchange")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "every iteration must be a keyed equi-join on the node id")
    assert(p.contains("TakeOrderedAndProject"),
      "the top-50 must be a partial top-N, not a global rank sort")
  }

  test("duplicate-ngram signal shuffles keyed on the shingle only") {
    val p = plan("corpus_dupngrams")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "boilerplate detection must never compare document pairs")
    assert(p.contains("partial_count"),
      "per-doc and per-shingle counts must partial-aggregate below " +
        "their exchanges")
  }

  test("k-means assignment is row-local; only k-row aggregates shuffle") {
    // the centroids are a broadcast literal inside the projection, so
    // the final frame must show: partial-aggregated per-cid rollup
    // (one exchange over ≤k keys) + a broadcast join of the k-row
    // centroid-checksum frame — and never a shuffle join or a
    // vector×centroid exchange
    val p = plan("ann_kmeans")
    assert(p.contains("partial_count") && p.contains("partial_sum"),
      "cluster size/inertia must combine map-side below the exchange")
    assert(p.contains("BroadcastHashJoin"),
      "the k-row centroid checksum frame must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "no shuffle join may appear — assignment is a row-local argmin")
  }

  test("shortest-path rounds partial-aggregate the frontier min map-side") {
    val p = plan("q91_shortest_path")
    assert(p.contains("partial_min"),
      "per-node distance mins must combine below the exchange")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "every relaxation must be a keyed equi-join on the node id")
    assert(p.contains("TakeOrderedAndProject"),
      "the top-100 must be a partial top-N, not a global sort")
  }

  test("sq8 shortlists by integer dot via partial top-N, never a global sort") {
    val p = plan("ann_sq8")
    assert(p.contains("TakeOrderedAndProject"),
      "both the int-dot shortlist and the rerank must plan partial top-N")
    assert(!p.contains("Exchange rangepartitioning"),
      "no global sort shuffle belongs in a bounded-shortlist retrieval")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the 1-row query side must broadcast — quantized scoring is row-local")
  }

  test("bigram LM reads the count artifact; prefix top-20 broadcasts back") {
    val p = plan("corpus_bigram_lm")
    // round 20: the (w1,w2) count shuffle moved into the shared
    // bigram_counts artifact build (one partial_count per session);
    // the query itself must now scan parquet and partial-SUM the
    // prefix rollup map-side
    assert(!p.contains("partial_count"),
      "the per-pass (w1,w2) re-count should be gone — the artifact " +
        "scan replaces it")
    assert(p.contains("partial_sum"),
      "the prefix rollup must combine map-side below the exchange")
    assert(p.contains("BroadcastHashJoin"),
      "the 20-row prefix list must broadcast, not shuffle the count frame")
    assert(p.contains("WindowGroupLimit"),
      "rank<=3 must prune per-partition before the window shuffle")
  }

  test("k-core rounds are degree partial-aggs plus semi joins, never pairs") {
    val p = plan("q92_kcore")
    assert(p.contains("partial_count"),
      "per-round degrees must combine map-side below the exchange")
    assert(p.contains("LeftSemi"),
      "survivor filtering must plan as semi joins against the node set")
    assert(p.contains("BroadcastHashJoin"),
      "the |V|-bounded survivor set must broadcast — a shuffled semi " +
        "join re-exchanges the edge frame three times per round")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "no peel round may shuffle the edge frame against the node set")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "peeling must never expand to node pairs")
  }

  test("feature hashing shuffles once, pre-combined on (doc, bucket)") {
    val p = plan("feat_hashing")
    assert(p.contains("partial_sum"),
      "signed bucket weights must partial-aggregate below the exchange")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      "exactly one keyed shuffle: the (doc_id, bucket) rollup")
    assert(!p.contains("SortMergeJoin") && !p.contains("Exchange rangepartitioning"),
      "no join or global sort belongs in a row-local featurizer")
  }

  test("round-7 row-local operators stay shuffle-free or single-shuffle") {
    // winnowing / readability / shot detection: pure scan work (the
    // Parallelism.ensure round-robin exchange is the ONLY allowed one
    // on the single-file test tables)
    for (q <- Seq("corpus_winnowing", "mm_shot_detect")) {
      val p = plan(q)
      assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty &&
        !p.contains("Exchange rangepartitioning"),
        s"$q must not shuffle on keys — row-local kernel")
    }
    assert(!plan("text_readability").contains("Exchange"),
      "readability is a pure projection")
    // linear quality classifier: the hashed-feature scorer folds inside
    // one projection — the bucket vector never materializes, so there
    // is NO per-(doc, bucket) shuffle anywhere (feat_hashing pays one;
    // the classifier must not)
    assert(!plan("text_quality_clf").contains("Exchange"),
      "text_quality_clf is a zero-shuffle row-local projection")
    // budgeted selection: ONE keyed shuffle (source) — the prefix-sum
    // window must ride the same exchange, not add its own
    assert("Exchange hashpartitioning".r
        .findAllIn(plan("corpus_token_budget")).length == 1,
      "corpus_token_budget must shuffle once on source")
    // zipf audit: the global top-50 must be a TakeOrderedAndProject
    // (per-partition top-k, no global sort of the vocabulary)
    assert(plan("text_zipf_audit").contains("TakeOrderedAndProject"),
      "text_zipf_audit's top-50 must be a TakeOrderedAndProject")
    // normalized dedup: exactly one keyed shuffle (the normalized key)
    val dn = plan("dedup_normalized")
    assert("Exchange hashpartitioning".r.findAllIn(dn).length == 1 &&
      dn.contains("partial_min"),
      "one key rollup, partial-aggregated map-side")
  }

  test("corpus_pmi: pair rollup partial-combines; unigram/total sides broadcast") {
    val p = plan("corpus_pmi")
    assert(p.contains("partial_count"),
      "pair counts must combine map-side before the exchange")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "unigram counts and the total must come back as broadcasts")
    assert(p.contains("TakeOrderedAndProject"),
      "top-30 must be a partial top-N, not a global sort")
    assert(!p.contains("SortMergeJoin"),
      "no shuffle join belongs in the association scorer")
  }

  test("q94_scd2 windows partition on the high-cardinality user key only") {
    val p = plan("q94_scd2")
    // every Window node's partition-spec list (the second bracket group
    // in "Window [fns], [partSpec], [ordSpec]") must key on user_id — an
    // unpartitioned window would print an empty/other spec there. The
    // old form tested for the literal "PARTITION BY ()", which executed
    // plans never print, so it could not fail.
    val windowNodes = "(?m)^\\s*(?:[+:*\\-! ]*)Window .*$".r.findAllIn(p).toList
    assert(windowNodes.nonEmpty, "q94_scd2 must use window functions")
    windowNodes.foreach { w =>
      assert("\\], \\[user_id#\\d+".r.findFirstIn(w).isDefined,
        s"window must partition on user_id, got: $w")
    }
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).nonEmpty,
      "the one shuffle keys on user_id")
  }

  test("filtered ANN pushes the metadata predicate into the scan, pre-cosine") {
    val p = plan("ann_filtered")
    assert(p.contains("PushedFilters") && p.contains("EqualTo(label,3)"),
      "the label predicate must reach the parquet scan — a post-filter " +
        "top-k would run the cosine kernel on the whole corpus")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must be a partial top-N, not a global sort")
  }

  test("dedup_embedding_cells: broadcast centroids, map-side assignment prune") {
    val p = plan("dedup_embedding_cells")
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      "the nprobe assignment must prune map-side (partial WindowGroupLimit) " +
        "before the per-vector exchange")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the centroid fan-out must be a broadcast, never a shuffle")
  }

  test("mm_search: filter precedes the cosine kernel; top-k is partial") {
    val p = plan("mm_search")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must be a partial top-N, not a global sort")
    assert(!p.contains("SortMergeJoin"),
      "the 1-row query side must broadcast — no shuffle join in the scorer")
  }

  test("q98_seq_pattern: one user-partitioned window pass, no low-card cliff") {
    val p = plan("q98_seq_pattern")
    // every window node keys on the high-cardinality user_id — the same
    // real assertion shape as q94_scd2 (vacuous-form trap fixed r8)
    val windowNodes = "(?m)^\\s*(?:[+:*\\-! ]*)Window .*$".r.findAllIn(p).toList
    assert(windowNodes.nonEmpty, "q98 must use window functions")
    windowNodes.foreach { w =>
      assert("\\], \\[user_id#\\d+".r.findFirstIn(w).isDefined,
        s"window must partition on user_id, got: $w")
    }
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).nonEmpty,
      "the stream shuffles on the user key")
  }

  test("round-8 additions: shuffle budgets and window keys hold") {
    // random projection is a pure per-row map — zero exchanges beyond
    // the (allowed) single-file parallelism spread
    val rp = plan("feat_random_proj")
    assert("Exchange hashpartitioning".r.findAllIn(rp).isEmpty &&
      !rp.contains("Exchange rangepartitioning"),
      "feat_random_proj must not shuffle on keys")
    // k-anonymity: the canonical two-phase distinct-aggregate — first
    // keyed on (QI, sensitive) for the distinct, then on QI for the
    // counts; both partial-aggregated, and nothing more
    val ka = plan("dq_kanon")
    assert("Exchange hashpartitioning".r.findAllIn(ka).length == 2 &&
      ka.contains("partial_count"),
      "dq_kanon is the two-exchange distinct-agg rollup, partial map-side")
    // z-order audit: the maxima frame comes back as a broadcast, never
    // a shuffle join against the fact scan
    val zo = plan("layout_zorder")
    assert(zo.contains("BroadcastNestedLoopJoin") || zo.contains("BroadcastHashJoin"),
      "bucket bounds must broadcast")
    assert(!zo.contains("SortMergeJoin"), "no shuffle join for a 1-row frame")
    // attribution: every window partitions on the high-cardinality
    // purchase id (left_id) — no low-cardinality window cliff
    val at = plan("q100_attribution")
    val wns = "(?m)^\\s*(?:[+:*\\-! ]*)Window .*$".r.findAllIn(at).toList
    assert(wns.nonEmpty, "attribution must use window functions")
    wns.foreach { w =>
      assert("\\], \\[left_id#\\d+".r.findFirstIn(w).isDefined,
        s"window must partition on left_id, got: $w")
    }
  }

  test("round-8 wave-2 additions: scan pruning, partial aggs, group limits") {
    // gopher audit is a pure per-row rule map — no key shuffles at all
    val tg = plan("text_gopher")
    assert("Exchange hashpartitioning".r.findAllIn(tg).isEmpty,
      "text_gopher must not shuffle on keys")
    // bitmap distinct: partial bit_or below the first exchange, two
    // narrowing exchanges, zero joins, and only 2 columns scanned
    val bm = plan("q102_bitmap_distinct")
    assert(bm.contains("partial_bit_or"),
      "segment bitmaps must partial-aggregate map-side")
    assert("Exchange hashpartitioning".r.findAllIn(bm).length == 2 &&
      !bm.contains("Join"), "bitmap rollup is two exchanges, no joins")
    assert(bm.contains("ReadSchema: struct<l_partkey:bigint,l_returnflag:string>"),
      "scan must prune to the two referenced columns")
    // path analysis: the rn<=5 filter must prune per-partition before
    // the user exchange (Partial WindowGroupLimit)
    val pa = plan("q103_paths")
    assert(pa.contains("WindowGroupLimit") && pa.contains("Partial"),
      "q103_paths must carry a map-side (Partial) WindowGroupLimit")
    assert(pa.contains("TakeOrderedAndProject"),
      "top-20 paths must be a partial TakeOrdered, not a global sort")
    // freshness: the 1-row global watermark broadcasts against the scan
    val fr = plan("dq_freshness")
    assert(fr.contains("BroadcastNestedLoopJoin") ||
      fr.contains("BroadcastHashJoin"), "global max must broadcast")
    assert(!fr.contains("SortMergeJoin"), "no shuffle join for a 1-row frame")
    // cusum: the orders->days rollup partial-aggregates at scan
    // parallelism; the running windows order by day over the series
    val cu = plan("q101_cusum")
    assert(cu.contains("partial_count"),
      "daily rollup must partial-aggregate below the exchange")
  }

  test("round-8 wave-3 additions: bucketed candidates, broadcast stats") {
    // basket rules: the pair join must be ShuffledHash (no sort over
    // the pre-partitioned cache), item stats broadcast, and the pair
    // rollup partial-aggregated
    val br = plan("q104_basket_rules")
    assert(br.contains("ShuffledHashJoin"),
      "pair self-join must be a sort-free shuffled hash join")
    assert("BroadcastHashJoin".r.findAllIn(br).length >= 2,
      "item frequencies must broadcast back")
    assert(br.contains("partial_count"),
      "pair support must partial-aggregate map-side")
    // knn graph: centroids broadcast against the scan; the per-vector
    // top-3 prunes map-side (high-cardinality window partition)
    val kg = plan("ann_knn_graph")
    assert(kg.contains("BroadcastNestedLoopJoin") || kg.contains("BroadcastHashJoin"),
      "the k-row centroid frame must broadcast")
    assert(kg.contains("WindowGroupLimit"),
      "per-vector top-3 must carry a WindowGroupLimit")
    // containment: the postings self-join is keyed on the shingle —
    // no all-pairs nested loop anywhere on the big side
    val ct = plan("dedup_containment")
    assert(!ct.contains("CartesianProduct"),
      "containment must never cross-join documents")
    assert(ct.contains("partial_count"),
      "shared-shingle counts must partial-aggregate")
  }

  test("round-8 wave-4 additions: stats assemble tiny, walks stay indexed") {
    // ab test: one partial-agg user rollup; the statistic never
    // shuffles more than the 1-row frame
    val ab = plan("q105_ab_test")
    assert(ab.contains("partial_sum") || ab.contains("partial_count"),
      "per-user rollup must partial-aggregate")
    assert(!ab.contains("Join"), "the z statistic needs no joins at all")
    // shuffle shards: windows partition on the shard key — never a
    // global (empty-partition-spec) row_number
    val ss = plan("corpus_shuffle_shards")
    val wns = "(?m)^\\s*(?:[+:*\\-! ]*)Window .*$".r.findAllIn(ss).toList
    assert(wns.nonEmpty, "shuffle shards must use window functions")
    wns.foreach { w =>
      assert("\\], \\[shard#\\d+".r.findFirstIn(w).isDefined,
        s"window must partition on shard, got: $w")
    }
    // random walks: each step consumes the walker frame as a
    // BROADCAST against the persisted adjacency — the graph is
    // looked up, never re-shuffled per step
    val rw = plan("q107_random_walks")
    assert("BroadcastHashJoin".r.findAllIn(rw).length >= 4,
      "all 4 walk steps must broadcast the walker frame")
    assert(!rw.contains("SortMergeJoin"),
      "no step may sort-merge the adjacency")
  }

  test("round-8 wave-5 additions: bitmap rollups partial-agg, eval frames reuse") {
    // every bitmap-family query must partial-aggregate its segment
    // rollup below the first exchange and never join at the id level
    for (q <- Seq("q108_sliding_distinct", "q109_bitmap_retention",
      "dq_overlap_matrix")) {
      val p = plan(q)
      assert(p.contains("partial_bit_or"),
        s"$q: segment bitmaps must partial-aggregate map-side")
      assert(!p.contains("SortMergeJoin") || q == "q108_sliding_distinct",
        s"$q: bitmap joins stay hash/broadcast, never sort-merge")
    }
    // quant ablation: one persisted kernel frame, three window arms —
    // each top-k prunes map-side
    val qa = plan("ann_quant_ablation")
    assert(qa.contains("WindowGroupLimit"),
      "ablation arms must carry WindowGroupLimit")
    assert(qa.contains("InMemoryTableScan"),
      "the kernel pass must be computed once and reused from cache")
    // ann_prepare: centroid fan-out combines map-side (one row per
    // vector crosses the exchange, not one per (vector, centroid))
    val ap = plan("ann_prepare")
    assert(ap.contains("partial_max") || ap.contains("partial_min"),
      "assignment argmax must partial-aggregate")
  }

  test("round-8 wave-6 additions: grids stay tiny, vocab sides broadcast") {
    // the three statistics on the day/value grids never window over
    // the fact table: their rollups partial-aggregate first
    for (q <- Seq("q111_emd", "q112_autocorr", "q106_ks_test",
      "dq_benford", "dq_skew_report")) {
      val p = plan(q)
      assert(p.contains("partial_count") || p.contains("partial_sum"),
        s"$q: the fact rollup must partial-aggregate below the exchange")
    }
    // DSIR: token weights broadcast back against the postings —
    // vocab-bounded side never shuffles the corpus twice
    val ds = plan("corpus_dsir")
    assert(ds.contains("BroadcastHashJoin"),
      "corpus_dsir must broadcast the vocab weight frame")
    assert(ds.contains("TakeOrderedAndProject"),
      "top-20 must be a partial TakeOrdered")
    // bitmap growth/funnel: partial bit_or everywhere
    for (q <- Seq("q113_reach_funnel", "q114_new_vs_returning")) {
      assert(plan(q).contains("partial_bit_or"),
        s"$q: segment bitmaps must partial-aggregate map-side")
    }
  }

  test("partitionBy sink layout enables partition pruning on read") {
    import org.apache.spark.sql.functions.col
    import graft.pipeline.{SinkSpec, SourceSpec}
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString
    graft.sinks.Sinks.write(Tables.load(spark, sf, "documents"),
      SinkSpec("file", Map("path" -> dir, "format" -> "parquet",
        "partitionBy" -> "lang")))
    val back = graft.sources.Sources.read(spark,
      SourceSpec("file", Map("path" -> dir, "format" -> "parquet")))
    val filtered = back.filter(col("lang") === "en")
    val p = filtered.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(lang") ||
      p.contains("PartitionFilters: [(lang"),
      s"partition filter must prune directories, got: ${p.take(500)}")
    assert(filtered.count() ==
      Tables.load(spark, sf, "documents").filter(col("lang") === "en").count())
  }

  test("round-12 queries keep their committed scale shapes") {
    // q120: global top-20 must be a per-partition TakeOrderedAndProject,
    // never a global sort + limit (the text_zipf_audit discipline)
    val seq = plan("q120_seq_mining")
    assert(seq.contains("TakeOrderedAndProject"),
      "sequence mining top-k must plan as TakeOrderedAndProject")
    // calibration: the model-weight scoring is a row-local projection —
    // the only exchanges are the RankSelect range ladder + the 10-group
    // rollup; no sort-merge join may appear (cuts broadcast)
    val cal = plan("corpus_calibration")
    assert(!cal.contains("SortMergeJoin"),
      "decile cut assignment must broadcast, never shuffle-join")
    // matryoshka: anchors broadcast against the candidate scan — the
    // cosine KERNEL pass must be a broadcast nested-loop, never a
    // shuffled join of the big side. (The ≤50-row truth⋈top semi joins
    // show static SortMergeJoins that AQE re-plans to broadcasts once
    // sizes are known — the q90/q93 static-plan caveat — so only the
    // kernel-pass shape is asserted here.)
    val mat = plan("ann_matryoshka")
    assert(mat.contains("BroadcastNestedLoopJoin"),
      "anchor side must broadcast against the candidate scan")
  }

  test("round-13 queries keep their committed scale shapes") {
    // dq_profile: six COLUMN-PRUNED scans (same parquet bytes as one
    // full scan; each ReadSchema carries exactly its own column, so
    // no branch drags the full row width through its distinct agg)
    val prof = plan("dq_profile")
    val schemas = "ReadSchema: struct<[^>]*>".r.findAllIn(prof).toSeq
    assert(schemas.length == 6 && schemas.forall(!_.contains(",")),
      s"each profile branch must scan exactly one column: $schemas")
    // q128_backtest: one fact-table rollup, then days-bounded work —
    // no join anywhere (the per-cutoff folds run on a collected array)
    val bt = plan("q128_backtest")
    assert(!bt.contains("Join"), "backtest must not join — array folds only")
    assert(bt.contains("partial_sum"),
      "the daily rollup must partial-aggregate below the exchange")
    // dedup_incremental: the snapshot probe broadcasts the new-crawl
    // side; pinned history streams with no sort-merge exchange (the
    // minhashDedupFold plan, asserted end-to-end through the query)
    val inc = plan("dedup_incremental")
    assert(inc.contains("BroadcastHashJoin") && !inc.contains("SortMergeJoin"),
      "the incremental band probe must broadcast the batch side")
  }

  test("q131 MWU ranks without the single-partition global window") {
    // round 14 (VERDICT r13 task 2): rank() OVER (ORDER BY y) with no
    // partition key moves every order row through ONE task; the
    // committed plan is a tie-group rollup + PrefixSum — every
    // DATA-sized window must be partitioned by the range bucket, and
    // the only empty-partition window may scan the per-BUCKET totals
    // (rows = partition count, bounded by cluster parallelism)
    val p = plan("q131_mwu")
    assert(p.contains("windowspecdefinition(__ps_b"),
      "the prefix scan must be a window PARTITIONED by the range bucket")
    assert(!"windowspecdefinition\\(y#".r.findFirstIn(p).isDefined,
      "no window over the data may have an empty partition spec — " +
        "that is the single-task global sort PrefixSum exists to avoid")
  }
}
