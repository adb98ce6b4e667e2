package graft

import org.apache.spark.sql.functions._

/** Semantic contracts for the round-12 queries — invariants the
  * driver's oracle value-diff can't express (monotonicity, mass
  * conservation, cross-query consistency).
  */
class Round12QueriesSpec extends SparkSpec {

  test("q118_survival: KM curve is a valid survival function") {
    import spark.implicits._
    val rows = SparkEntry.queries("q118_survival")(spark, sf)
      .orderBy($"t").collect()
    assert(rows.nonEmpty)
    val nUsers = Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    // the earliest lifetime row sees the FULL population at risk
    assert(rows.head.getAs[Long]("n_risk") === nUsers)
    // survival is in (0, 1] and non-increasing in t; every row's
    // product recomputes from the published (d, n_risk) columns
    var prev = 1.0
    var prod = 1.0
    rows.foreach { r =>
      val surv = r.getAs[Double]("surv")
      prod *= 1.0 - r.getAs[Long]("d").toDouble / r.getAs[Long]("n_risk")
      assert(surv > 0.0 - 1e-12 && surv <= prev + 1e-12)
      assert(surv === prod) // exact: same left-to-right fold
      prev = surv
    }
    // everyone leaves the study exactly once
    assert(rows.map(r => r.getAs[Long]("d") + r.getAs[Long]("c")).sum
      === nUsers)
    GraftSession.release(spark)
  }

  test("q119_stationary: micro-unit mass is conserved up to truncation and never grows") {
    import spark.implicits._
    val out = SparkEntry.queries("q119_stationary")(spark, sf).collect()
    val types = Tables.events(spark, sf)
      .select($"event_type").distinct().count()
    assert(out.length === types.toInt)
    val total = out.map(_.getAs[Long]("rank_micro")).sum
    // start mass = 1e6 per state; truncating division only LEAKS mass
    // (every round drops < 1 micro-unit per transition edge), so the
    // settled total is positive and never exceeds the initial mass
    assert(total > 0L && total <= types * 1000000L)
    assert(out.forall(_.getAs[Long]("rank_micro") >= 0L))
    GraftSession.release(spark)
  }

  test("q120_seq_mining equals an independent in-memory recount of trigram supports") {
    import spark.implicits._
    val got = SparkEntry.queries("q120_seq_mining")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getAs[Long]("support")))
    // independent recount: collect the (small) sf0.001 event stream
    // and fold trigrams per user in plain Scala
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"),
        $"event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val want = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (r._3, r._4)).map(_._2).sliding(3)
        .filter(_.length == 3).map(s => (s(0), s(1), s(2))).toSeq
    }.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case ((a, b, c), n) => (a, b, c, n) }
      .sortBy { case (a, b, c, n) => (-n, a, b, c) }
      .take(20)
    assert(got.toSeq === want)
    GraftSession.release(spark)
  }

  test("q121_stickiness: bitmap DAU equals count-distinct truth; ratio bounded") {
    import spark.implicits._
    val rows = SparkEntry.queries("q121_stickiness")(spark, sf).collect()
    val dauTruth = Tables.events(spark, sf)
      .select($"ts".cast("date").as("day"), $"user_id").distinct()
      .groupBy($"day").count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(rows.length === dauTruth.size)
    rows.foreach { r =>
      assert(r.getAs[Long]("dau") === dauTruth(r.getDate(0).toString))
      assert(r.getAs[Long]("mau28") >= r.getAs[Long]("dau"))
      val st = r.getAs[Double]("stickiness")
      assert(st > 0.0 && st <= 1.0)
    }
    GraftSession.release(spark)
  }

  test("ann_matryoshka: the full-dimension row is exact self-recall; prefixes stay bounded") {
    import spark.implicits._
    val rows = SparkEntry.queries("ann_matryoshka")(spark, sf)
      .orderBy($"dim").collect()
    assert(rows.map(_.getAs[Long]("dim")).toSeq === Seq(8L, 16L, 32L, 64L))
    // the full-dim row IS the truth list: its hit count is the exact
    // recall denominator every other row divides by
    val nTruth = rows.last.getAs[Long]("n_hits")
    assert(nTruth === 50L) // 5 anchors × top-10 on this corpus
    rows.foreach { r =>
      val hits = r.getAs[Long]("n_hits")
      assert(hits >= 0L && hits <= nTruth)
      assert(r.getAs[Double]("recall") === hits.toDouble / nTruth.toDouble)
    }
    assert(rows.last.getAs[Double]("recall") === 1.0)
    GraftSession.release(spark)
  }

  test("q122_holt equals an independent in-memory fold of the committed recurrence") {
    import spark.implicits._
    val got = SparkEntry.queries("q122_holt")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val daily = Tables.events(spark, sf)
      .groupBy($"event_type", $"ts".cast("date").as("day"))
      .agg(count(lit(1)).cast("double").as("x"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString,
        r.getDouble(2)))
    daily.groupBy(_._1).foreach { case (t, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      var l = xs.head; var b = 0.0
      xs.tail.foreach { x =>
        val nl = 0.5 * x + 0.5 * (l + b)
        val nb = 0.25 * x - 0.25 * l + 0.75 * b
        l = nl; b = nb
      }
      val r = got(t)
      assert(r.getAs[Long]("n_days") === xs.length.toLong)
      assert(r.getAs[Double]("level") === l)
      assert(r.getAs[Double]("trend") === b)
      assert(r.getAs[Double]("forecast_2") === l + 2.0 * b)
    }
    GraftSession.release(spark)
  }

  test("q123_absorption equals an independent integer backward induction") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val got = SparkEntry.queries("q123_absorption")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("p_absorb_micro")).toMap
    assert(got("purchase") === 1000000L)
    assert(got.values.forall(p => p >= 0L && p <= 1000000L))
    // independent recount: collect the kernel, fold 8 rounds in Scala
    val w = Window.partitionBy($"user_id").orderBy($"us".asc, $"event_id".asc)
    val trans = Tables.events(spark, sf)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"),
        $"event_id")
      .withColumn("nxt", lead($"event_type", 1).over(w))
      .filter($"nxt".isNotNull)
      .groupBy($"event_type".as("src"), $"nxt".as("dst"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val ctot = trans.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val states = (trans.map(_._1) ++ trans.map(_._2)).distinct
    var p = states.map(s =>
      s -> (if (s == "purchase") 1000000L else 0L)).toMap
    (1 to 8).foreach { _ =>
      p = states.map { s =>
        s -> (if (s == "purchase") 1000000L
        else {
          val sp = trans.filter(_._1 == s).map { case (_, d, c) =>
            c * p(d) }.sum
          if (ctot.contains(s)) sp / ctot(s) else 0L
        })
      }.toMap
    }
    states.foreach(s => assert(got(s) === p(s), s))
    GraftSession.release(spark)
  }

  test("text_chi2_features equals an independent recount of the statistic") {
    import spark.implicits._
    val rows = SparkEntry.queries("text_chi2_features")(spark, sf).collect()
    assert(rows.length === 20)
    // ordering is the (chi2 desc, tok asc) total order
    val chis = rows.map(_.getAs[Double]("chi2"))
    assert(chis.sliding(2).forall { case Array(x, y) => x >= y })
    // independent recount for every returned token from raw doc data
    val docs = Tables.load(spark, sf, "documents")
      .select($"lang", $"text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ")
        .filter(_.nonEmpty).toSet))
    val nEn = docs.count(_._1 == "en").toDouble
    val nNon = docs.size - nEn
    rows.foreach { r =>
      val tok = r.getString(0)
      val a = docs.count(d => d._1 == "en" && d._2(tok)).toDouble
      val b = docs.count(d => d._1 != "en" && d._2(tok)).toDouble
      assert(r.getAs[Long]("a").toDouble === a)
      assert(r.getAs[Long]("b").toDouble === b)
      val c = nEn - a; val d = nNon - b; val nn = nEn + nNon
      val chi2 = nn * (a * d - b * c) * (a * d - b * c) /
        ((a + b) * (c + d) * (a + c) * (b + d))
      assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-9)
    }
    GraftSession.release(spark)
  }

  test("corpus_burstiness equals an independent recount of cf/df/peak") {
    import spark.implicits._
    val rows = SparkEntry.queries("corpus_burstiness")(spark, sf).collect()
    val docs = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty)))
    val byTok = docs.flatMap { case (id, ts) => ts.map(t => (t, id)) }
      .groupBy(_._1)
    rows.foreach { r =>
      val tok = r.getString(0)
      val occ = byTok(tok)
      val perDoc = occ.groupBy(_._2).view.mapValues(_.length.toLong)
      assert(r.getAs[Long]("cf") === occ.length.toLong)
      assert(r.getAs[Long]("df") === perDoc.size.toLong)
      assert(r.getAs[Long]("max_in_doc") === perDoc.values.max)
      assert(r.getAs[Double]("burstiness") ===
        occ.length.toDouble / perDoc.size.toDouble)
    }
    // ordered by corpus frequency, ties on token
    val cfs = rows.map(_.getAs[Long]("cf"))
    assert(cfs.sliding(2).forall { case Array(a, b) => a >= b })
    GraftSession.release(spark)
  }

  test("corpus_calibration: deciles partition the scored corpus with ntile sizes") {
    import spark.implicits._
    val rows = SparkEntry.queries("corpus_calibration")(spark, sf)
      .orderBy($"decile").collect()
    val scoredDocs = Tables.load(spark, sf, "documents")
      .filter(size(filter(split($"text", " "), t => length(t) > 0)) > 0)
      .count()
    assert(rows.map(_.getAs[Long]("decile")).toSeq === (1L to 10L))
    val sizes = rows.map(_.getAs[Long]("n_docs"))
    assert(sizes.sum === scoredDocs)
    // SQL-standard ntile: sizes differ by at most 1, larger buckets first
    assert(sizes.max - sizes.min <= 1L)
    assert(sizes.sorted.reverse.toSeq === sizes.toSeq)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_en") <= r.getAs[Long]("n_docs"))
    }
    GraftSession.release(spark)
  }

  test("mm_hamming_curve is monotone and its radius-2 image pairs equal mm_dedup's enumeration") {
    import spark.implicits._
    val curve = SparkEntry.queries("mm_hamming_curve")(spark, sf)
      .orderBy($"radius").collect()
      .map(r => (r.getAs[Long]("radius"), r.getAs[Long]("n_hash_pairs"),
        r.getAs[Long]("n_img_pairs")))
    assert(curve.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L))
    // radius 0 between DISTINCT hashes is empty by definition
    assert(curve.head._2 === 0L)
    // both counts are cumulative in the radius
    assert(curve.sliding(2).forall { case Array(a, b) =>
      a._2 <= b._2 && a._3 <= b._3 })
    // cross-query consistency: mm_dedup enumerates exactly the image
    // pairs within hamming 2 (including hash-identical members), so
    // its row count must equal the curve's radius-2 weighted total
    val dedupPairs = SparkEntry.queries("mm_dedup")(spark, sf).count()
    assert(curve(2)._3 === dedupPairs)
    GraftSession.release(spark)
  }
}
