package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Property specs for the round-7 operators. The driver's oracle gate
  * proves value parity; these pin the semantic contracts an oracle
  * diff can't express.
  */
class Round7QueriesSpec extends SparkSpec {

  test("winnowing guarantee: docs sharing a substring of length >= w+k-1 share a fingerprint") {
    import spark.implicits._
    // k=8, w=16 → any common run of >= 23 chars must put at least one
    // common value in both sketches (the Schleimer guarantee, stated
    // over values — value-dedup can only merge equal fingerprints)
    val common = "the quick brown fox jumps over the lazy dog again"
    val docs = Seq(
      (1L, s"AAAA $common BBBB"),
      (2L, s"zzzzzz $common qqqq"),
      (3L, "completely unrelated content with no overlap at all xyzw"))
      .toDF("doc_id", "text")
    def sketch(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("gh", expr(
        """transform(sequence(1, greatest(length(text) - 7, 1)), i ->
          | aggregate(transform(sequence(0, least(7, length(text) - i)),
          |   j -> CAST(ascii(substring(text, CAST(i + j AS INT), 1)) AS BIGINT)),
          |  CAST(0 AS BIGINT), (a, c) -> (a * 31 + c) % 1000000007))""".stripMargin))
      .withColumn("fps", expr(
        """array_distinct(transform(sequence(1, greatest(size(gh) - 15, 1)),
          | i -> array_min(slice(gh, i, 16))))""".stripMargin))
      .select($"doc_id", explode($"fps").as("fp"))
    val fps = sketch(docs).collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "shared substring must share a fingerprint")
    assert((fps(1L) & fps(3L)).isEmpty, "unrelated docs should not collide here")
  }

  test("shotBoundaries kernel: framing, cuts and edge cases") {
    import spark.implicits._
    // 3 frames of 4 bytes: energies 4, 404, 404 → one cut at t=1 for
    // threshold 100 → 2 shots; a 3-byte payload frames to zero shots
    val flat = Array.fill(4)(1.toByte)
    val loud = Array.fill(4)(101.toByte)
    val media = Seq(
      (1L, "video", flat ++ loud ++ loud),
      (2L, "video", Array[Byte](1, 2, 3)),
      (3L, "audio", flat ++ loud)) // wrong kind: filtered out
      .toDF("media_id", "kind", "payload")
    val out = Multimodal.shotBoundaries(media, frameBytes = 4, threshold = 100L)
      .collect().map(s => s.media_id -> s).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L).n_frames == 3 && out(1L).n_shots == 2 && out(1L).max_delta == 400L)
    assert(out(2L).n_frames == 0 && out(2L).n_shots == 0 && out(2L).max_delta == 0L)
    // threshold above the max delta → a single shot
    assert(Multimodal.shotBoundaries(media, 4, 1000L)
      .filter(_.media_id == 1L).head().n_shots == 1L)
  }

  test("corpus_bpe pair counts equal the brute-force pair multiset") {
    val out = SparkEntry.queries("corpus_bpe")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // brute force on the driver over the same table
    val texts = Tables.load(spark, sf, "documents")
      .select("text").collect().map(_.getString(0))
    val brute = new scala.collection.mutable.HashMap[String, Long]()
    texts.foreach(_.split(" ").filter(_.length >= 2).foreach { w =>
      (0 until w.length - 1).foreach { i =>
        val p = w.substring(i, i + 2)
        brute(p) = brute.getOrElse(p, 0L) + 1L
      }
    })
    out.foreach { case (p, c) =>
      assert(brute(p) == c, s"pair '$p' count mismatch")
    }
    // the returned 20 really are the top by (count desc, pair asc)
    val expectedTop = brute.toSeq.sortBy { case (p, c) => (-c, p) }.take(20).toMap
    assert(out == expectedTop)
  }

  test("q94_scd2 versions partition each user's timeline into contiguous intervals") {
    val rows = SparkEntry.queries("q94_scd2")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4))))
    rows.groupBy(_._1).foreach { case (_, vs) =>
      val sorted = vs.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1L to sorted.length).toSeq, "dense versions")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4), "valid_to == next valid_from (contiguous)")
          assert(a._2 != b._2, "consecutive versions differ in type")
        case _ => ()
      }
      assert(sorted.last._5.isEmpty, "live row has NULL valid_to")
    }
  }

  test("ann_recall is bounded and the shortlist contains what it counts") {
    val rows = SparkEntry.queries("ann_recall")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 5)
    rows.foreach { case (_, hits, recall) =>
      assert(hits >= 0L && hits <= 10L)
      assert(recall == hits.toDouble / 10.0)
    }
  }

  test("ann_ivfpq candidates come only from probed cells and score deterministically") {
    import org.apache.spark.sql.functions.{col, row_number, broadcast}
    import spark.implicits._
    val out = SparkEntry.queries("ann_ivfpq")(spark, sf).collect()
    assert(out.length == 10)
    // results must lie in the 3 cells nearest the query (IVF contract)
    val emb = Tables.load(spark, sf, "embeddings")
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy($"label").orderBy($"vec_id".asc)
    val centroids = emb.withColumn("__rn", row_number().over(wc))
      .filter($"__rn" === 1)
      .select($"label".cast("int").as("cid"), $"embedding".as("cv"))
    val q = emb.filter($"vec_id" === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qv"))
    val probed = q.crossJoin(broadcast(centroids))
      .select($"cid", graft.functions.GraftFunctions
        .cosine_sim($"qv", $"cv").as("c"))
      .orderBy($"c".desc, $"cid".asc).limit(3)
      .collect().map(_.getInt(0).toLong).toSet
    out.foreach(r => assert(probed.contains(r.getLong(2)),
      s"vec ${r.getLong(0)} scored from unprobed cell ${r.getLong(2)}"))
    // deterministic across runs
    val again = SparkEntry.queries("ann_ivfpq")(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("ann_diversify picks the top-1 first and diversifies the rest") {
    import org.apache.spark.sql.functions.{col, broadcast}
    import spark.implicits._
    val picks = SparkEntry.queries("ann_diversify")(spark, sf)
      .orderBy(col("pick_order")).collect()
    assert(picks.length == 5 && picks.map(_.getLong(0)).distinct.length == 5)
    // pick 1 is the plain cosine argmax; later picks trade query
    // similarity against redundancy, so scores are <= their cosq
    val emb = Tables.load(spark, sf, "embeddings")
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val top1 = emb.filter($"vec_id" =!= 0).crossJoin(broadcast(q))
      .select($"vec_id", graft.functions.GraftFunctions
        .cosine_sim($"embedding", $"qv").as("c"))
      .orderBy($"c".desc, $"vec_id".asc).limit(1).head.getLong(0)
    assert(picks.head.getLong(0) == top1)
    picks.tail.foreach { r =>
      assert(r.getDouble(3) <= r.getDouble(2) + 1e-12,
        "MMR score must not exceed the raw query cosine")
    }
    GraftSession.release(spark)
  }

  test("q96_window_funnel stages are monotonically non-increasing") {
    val r = SparkEntry.queries("q96_window_funnel")(spark, sf).head()
    val (s1, s2, s3) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(s1 >= s2 && s2 >= s3, s"funnel must narrow: $s1 >= $s2 >= $s3")
    assert(s1 > 0, "some user viewed something")
    // the time bound must actually bind: stage2 is strictly tighter
    // than the unbounded ordered funnel would be (bounded by s1)
    assert(s2 <= s1)
  }

  test("q97_merge applies delete/update/insert exactly once per key") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = SparkEntry.queries("q97_merge")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val base = Tables.load(spark, sf, "customer")
      .select($"c_custkey", $"c_acctbal".cast("decimal(15,2)").as("bal"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    val byCust = Tables.load(spark, sf, "orders").groupBy($"o_custkey")
      .agg(count(lit(1)).as("n"), sum($"o_totalprice".cast("decimal(15,2)")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2)))
    val deleted = byCust.collect { case (k, _, _) if k % 97 == 0 => k }.toSet
    val updated = byCust.collect { case (k, n, t) if k % 97 != 0 && n >= 8 => k -> t }.toMap
    val inserted = byCust.collect { case (k, n, t) if n >= 12 => (k + 1000000L) -> t }.toMap
    assert(deleted.nonEmpty && updated.nonEmpty && inserted.nonEmpty,
      "fixture must exercise all three ops")
    deleted.foreach(k => assert(!out.contains(k), s"deleted key $k survived"))
    inserted.foreach { case (k, t) =>
      assert(out.contains(k) && out(k)._1.startsWith("NEW#"), s"insert $k missing")
      assert(out(k)._2 == t.doubleValue, s"insert $k balance")
    }
    updated.foreach { case (k, t) =>
      assert(out(k)._2 == base(k).add(t).doubleValue, s"update $k balance")
    }
    // untouched keys keep their balance
    val touched = deleted ++ updated.keySet
    base.keys.filterNot(touched).take(50).foreach { k =>
      assert(out(k)._2 == base(k).doubleValue, s"untouched $k changed")
    }
  }

  test("q93_label_prop is deterministic and conserves nodes") {
    val a = SparkEntry.queries("q93_label_prop")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = SparkEntry.queries("q93_label_prop")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b, "two runs must agree exactly (integer counts, total tie order)")
    val nNodes = a.map(_._2).sum
    val distinctParts = Tables.load(spark, sf, "lineitem")
      .select("l_partkey").distinct().count()
    // every part that co-occurs with another part is a node
    assert(nNodes <= distinctParts && nNodes > 0)
    GraftSession.release(spark)
  }
}
