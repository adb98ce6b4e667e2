package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.operators.{AsOfJoin, RangeJoin, Similarity}
import graft.functions.GraftFunctions._
import graft.functions.catalyst.GraftHash

class OperatorSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("bloom-pruned join is row-identical to the plain join and actually prunes") {
    import graft.operators.BloomPrune
    val lineitem = Tables.load(spark, sf, "lineitem")
    val bigOrders = Tables.load(spark, sf, "orders")
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"), col("o_orderstatus"))
    val pruned = BloomPrune.prunedEquiJoin(
        lineitem, bigOrders, "l_orderkey", "o_orderkey", 1024L)
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderstatus"))
    val plain = lineitem.join(bigOrders, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("o_orderstatus"))
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
    // the filter itself must kill the vast majority of probe rows
    val bf = BloomPrune.buildFilter(bigOrders, "o_orderkey", 1024L)
    val kept = BloomPrune.prune(lineitem, "l_orderkey", bf).count()
    val total = lineitem.count()
    assert(kept < total / 2, s"kept=$kept of $total — filter not selective")
    // mixed key types (int probe vs bigint build) must not drop matches:
    // both sides hash under the join's common type
    val probeInt = lineitem.withColumn("l_orderkey", col("l_orderkey").cast("int"))
    val mixed = BloomPrune.prunedEquiJoin(
        probeInt, bigOrders, "l_orderkey", "o_orderkey", 1024L)
      .select(col("o_orderkey"), col("l_linenumber"))
    assert(mixed.count() == plain.count(), "int-vs-bigint keys lost rows")
  }

  test("quality rules flag exactly the planted violations in one pass") {
    import graft.operators.Quality._
    import spark.implicits._
    val dirty = Seq(
      (1L, "ok", "en", 10L),
      (2L, null, "en", 10L),      // null text
      (3L, "", "fr", 10L),        // empty text
      (3L, "dup id", "de", 10L),  // duplicate id
      (4L, "bad lang", "xx", 10L),
      (5L, "bad bounds", "es", -1L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    val rules = Seq(NotNull("text"), NonEmpty("text"), Unique("doc_id"),
      InSet("lang", Seq("en", "de", "es", "fr", "zh")),
      Bounds("n_chars", 1, 1000000))
    val row = audit(dirty, rules).head()
    assert(row.getAs[Long]("n_rows") == 6L)
    assert(row.getAs[Long]("null_text") == 1L)
    assert(row.getAs[Long]("empty_text") == 1L)
    assert(row.getAs[Long]("dup_doc_id") == 1L)
    assert(row.getAs[Long]("domain_lang") == 1L)
    assert(row.getAs[Long]("bounds_n_chars") == 1L)
    assert(check(dirty, rules).values.forall(_ == false))
    val clean = Seq((1L, "ok", "en", 10L)).toDF("doc_id", "text", "lang", "n_chars")
    assert(check(clean, rules).values.forall(_ == true))
  }

  test("snapshot diff classifies insert/delete/update/unchanged") {
    import graft.operators.SnapshotDiff
    import spark.implicits._
    val old = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "s", "v")
    val neu = Seq((2L, "b", 2.0), (3L, "c", 9.0), (4L, "d", 4.0))
      .toDF("k", "s", "v")
    val got = SnapshotDiff.diff(old, neu, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "delete", 2L -> "unchanged",
      3L -> "update", 4L -> "insert"))
    // a null key present in both snapshots pairs via the null-safe join
    // and must classify by value, not by key-null-ness
    val oldN = Seq((Option(1L), "a"), (None, "x")).toDF("k", "s")
    val neuN = Seq((Option(1L), "a"), (None, "y")).toDF("k", "s")
    val gotN = SnapshotDiff.diff(oldN, neuN, Seq("k"))
      .collect().map(r => Option(r.get(0)) -> r.getString(1)).toMap
    assert(gotN == Map(Some(1L) -> "unchanged", None -> "update"))
  }

  test("global index equals the window idiom and stays multi-partition") {
    import graft.operators.GlobalIndex
    import org.apache.spark.sql.expressions.Window
    // deliberately single-file input: the operator itself must spread it
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val got = GlobalIndex.withRowNumber(orders, "rn",
      col("o_totalprice"), col("o_orderkey"))
    assert(got.rdd.getNumPartitions > 1, "numbering must stay parallel")
    val idiom = orders.withColumn("rn", row_number().over(
      Window.orderBy(col("o_totalprice"), col("o_orderkey"))))
    assert(got.exceptAll(idiom).isEmpty && idiom.exceptAll(got).isEmpty)
  }

  test("as-of join picks latest right row at or before left ts") {
    import spark.implicits._
    val right = Seq( // clicks: (user, ts, id)
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 11:00:00"), 101L),
      (2L, ts("2024-01-01 12:00:00"), 200L)
    ).toDF("user_id", "ts", "event_id")
    val left = Seq( // purchases
      (1L, ts("2024-01-01 10:30:00"), 500L), // after click 100
      (1L, ts("2024-01-01 11:00:00"), 501L), // ties click 101 -> included
      (2L, ts("2024-01-01 11:59:59"), 502L), // before any right row
      (3L, ts("2024-01-01 12:00:00"), 503L)  // no right partition
    ).toDF("user_id", "ts", "event_id")
    val out = AsOfJoin.lastEventAsOf(left, right, "user_id", "ts", "event_id")
      .select("event_id", "asof_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(500L -> 100L, 501L -> 101L, 502L -> -1L, 503L -> -1L))
  }

  test("range join counts right rows in preceding window only") {
    import spark.implicits._
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:30:00"), 2L),
      (1L, ts("2024-01-01 08:00:00"), 3L) // outside 1h window
    ).toDF("user_id", "ts", "event_id")
    val left = Seq((1L, ts("2024-01-01 10:45:00"), 9L),
      (2L, ts("2024-01-01 10:45:00"), 10L)).toDF("user_id", "ts", "event_id")
    val out = RangeJoin.countInPrecedingWindow(left, right, "user_id", "ts",
        3600L * 1000000L)
      .select("event_id", "n_in_window").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(9L -> 2L, 10L -> 0L))
  }

  test("range-join pairs equal the naive theta join, exactly once each") {
    // real data: every (purchase, click-in-24h) pair from sf0.001 events,
    // bucketed scheme vs the O(L*R)-per-key reference join
    val ev = Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
    val c = ev.filter(col("event_type") === "click")
    val got = RangeJoin.pairsInPrecedingWindow(p, c, "user_id", "ts",
        86400L * 1000000L)
      .select(col("left_id"), col("right_id"))
    val naive = p.select(col("user_id").as("pu"),
        unix_micros(col("ts")).as("pus"), col("event_id").as("pid"))
      .join(c.select(col("user_id").as("cu"),
        unix_micros(col("ts")).as("cus"), col("event_id").as("cid")),
        col("pu") === col("cu") &&
          col("cus") >= col("pus") - 86400L * 1000000L &&
          col("cus") <= col("pus"))
      .select(col("pid").as("left_id"), col("cid").as("right_id"))
    assert(got.count() > 0, "no pairs at all — test data assumption broke")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
      "bucketed pair join diverges from the reference theta join")
  }

  test("orphan count flags exactly the planted dangling keys") {
    import graft.operators.Quality
    import spark.implicits._
    val child = Seq((1L, 10L), (2L, 10L), (3L, 99L), (4L, 98L))
      .toDF("id", "fk")
    val childNull = child.union(
      Seq(5L).toDF("id").withColumn("fk", lit(null).cast("long")))
    val parent = Seq(10L, 11L).toDF("pk")
    val row = Quality.orphanCount(child, "fk", parent, "pk", "c.fk").head()
    assert(row.getString(0) == "c.fk" && row.getLong(1) == 4L &&
      row.getLong(2) == 2L)
    // NULL fk is an orphan by contract
    val rowN = Quality.orphanCount(childNull, "fk", parent, "pk", "n").head()
    assert(rowN.getLong(1) == 5L && rowN.getLong(2) == 3L)
  }

  test("poly hash matches reference fold") {
    import spark.implicits._
    val got = Seq("hello").toDF("t")
      .select(poly_hash(col("t"), 31, GraftHash.P1)).head().getLong(0)
    assert(got == GraftHash.poly("hello", 31, GraftHash.P1))
    assert(got == 99162322L) // "hello" base-31 fold, known value
  }

  test("cosine_sim is exact on unit vectors") {
    import spark.implicits._
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
    val out = df.select(cosine_sim(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(out(0) == 0.0 && out(1) == 1.0)
  }

  test("brute-force top-k excludes query and is sorted") {
    val emb = Tables.load(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val rows = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 5)
      .select("vec_id", "cos").collect()
    assert(rows.length == 5)
    assert(!rows.map(_.getLong(0)).contains(0L))
    val cs = rows.map(_.getDouble(1))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
  }

  test("lsh top-k returns a subset ranked identically to brute force") {
    val emb = Tables.load(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 50)
      .select("vec_id").collect().map(_.getLong(0))
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", q, 10)
      .select("vec_id").collect().map(_.getLong(0))
    assert(lsh.nonEmpty)
    // every LSH hit must appear in the brute-force ranking prefix order
    val pos = brute.zipWithIndex.toMap
    val ranks = lsh.flatMap(pos.get)
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a < b })
  }

  test("knn join per-query results equal single-query brute force") {
    val emb = Tables.load(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val got = Similarity.knnJoin(emb, "vec_id", "embedding", q, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val qids = q.select("qid").collect().map(_.getLong(0))
    assert(qids.length > 1 && got.length == qids.length * 5)
    // per-query slice must equal the single-query top-k operator
    qids.foreach { qid =>
      val single = emb.filter(col("vec_id") === qid)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val expect = Similarity.bruteForceTopK(emb, "vec_id", "embedding", single, 5)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      val slice = got.filter(_._1 == qid).sortBy(_._3).map(_._2).toSeq
      assert(slice == expect, s"qid=$qid")
    }
  }

  test("blocked knn join (large-|Q| path) selects identically to the broadcast path") {
    val emb = Tables.load(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val viaBroadcast = canon(
      Similarity.knnJoin(emb, "vec_id", "embedding", q, k = 5))
    val viaBlocks = canon(
      Similarity.knnJoinBlocked(emb, "vec_id", "embedding", q, k = 5, qBlocks = 4))
    assert(viaBlocks == viaBroadcast && viaBlocks.nonEmpty)
  }

  test("pq top-k recalls most true neighbors and never touches stored floats for ranking") {
    val emb = Tables.load(spark, sf, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val codebook = emb.filter(col("vec_id").between(1, 64))
      .select((col("vec_id") - 1).cast("int").as("c"), col("embedding").as("cv"))
    val base = emb.filter(col("vec_id") =!= 0)
    val k = 10
    // the production contract is candidate generation: ADC over-retrieves
    // 5x, an exact rerank of those 50 candidates follows. On these
    // near-random synthetic vectors the 64-code ADC keeps >= 70% of the
    // true top-10 in its top-50 (measured 80%); the structural point is
    // the LUT-only scan — quality scales with codebook size
    val cand = Similarity.pqTopK(base, "vec_id", "embedding", codebook, q,
        k = 5 * k, m = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, k)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val containment = (cand & exact).size.toDouble / k
    assert(containment >= 0.7, s"top-10 containment in ADC top-50 = $containment")
    // deterministic: a second run returns the identical candidate set
    val cand2 = Similarity.pqTopK(base, "vec_id", "embedding", codebook, q,
        k = 5 * k, m = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(cand2 == cand)
  }

  test("word shingles and char ngrams are distinct and sized right") {
    import spark.implicits._
    val df = Seq("a b c d").toDF("text")
    val sh = df.select(word_shingles(col("text"), 3)).head().getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    val ng = df.select(char_ngrams(col("text"), 5)).head().getSeq[String](0)
    assert(ng.contains("a b c") && ng.length == 3)
  }
}
