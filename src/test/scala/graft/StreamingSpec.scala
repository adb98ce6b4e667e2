package graft

import org.apache.spark.sql.functions._
import graft.streaming.{EventRow, StreamingOps}

class StreamingSpec extends SparkSpec {

  test("streaming windowed counts match the batch q19 aggregation") {
    val stream = StreamingOps.eventsStream(spark, sf)
    val q = StreamingOps.windowedCounts(stream, "1 hour")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    q.processAllAvailable()
    val streamed = spark.sql(
      "SELECT unix_timestamp(window.start) ws, event_type, n FROM win_counts")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    q.stop()
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")), col("event_type"), col("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
  }

  test("append-mode windowed counts drop late data beyond the watermark") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_late").toString
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val mk = (m: Int, v: Double) => Seq((ts(m), "click", v))
      .toDF("ts", "event_type", "value")
    // b0: in-window row. b1: advances the watermark past the window
    // end (200min - 1h wm = 140 > 60). b2: a LATE row inside the
    // already-closed window — must be dropped on input, not merged.
    // batch boundaries controlled EXPLICITLY: each file lands only
    // after the previous is fully processed, so the watermark
    // genuinely advances between them (same-trigger arrival would let
    // the late row through legitimately — wm updates are per-batch)
    mk(10, 1.0).coalesce(1).write.parquet(s"$dir/in/b0")
    val stream = spark.readStream.schema(mk(0, 0.0).schema)
      .option("latestFirst", "false")
      .parquet(s"$dir/in/*")
    val q = StreamingOps.windowedCounts(stream, "1 hour")
      .writeStream.format("memory").queryName("late_win")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      mk(200, 1.0).coalesce(1).write.parquet(s"$dir/in/b1")
      q.processAllAvailable()
      mk(20, 9.0).coalesce(1).write.parquet(s"$dir/in/b2")
      q.processAllAvailable()
    } finally q.stop()
    val w0 = spark.sql(
      "SELECT unix_timestamp(window.start) ws, n, max_val FROM late_win")
      .collect().filter(_.getLong(0) == t0.getTime / 1000)
    // exactly ONE emission for the closed window, count 1, and the
    // late row's value (9.0) is nowhere in its aggregates
    assert(w0.length == 1, s"window must emit exactly once, got ${w0.toSeq}")
    assert(w0(0).getLong(1) == 1L && w0(0).getDouble(2) == 1.0,
      s"late row leaked into the closed window: ${w0(0)}")
    GraftSession.release(spark)
  }

  test("streaming windowed heavy hitters equal batch exact ranking per window") {
    val stream = StreamingOps.eventsStream(spark, sf)
    val q = StreamingOps.windowedTopK(stream, "user_id", "1 hour", k = 5)
      .writeStream.format("memory").queryName("win_topk")
      .outputMode("complete").start()
    q.processAllAvailable()
    val streamed = spark.sql(
      "SELECT unix_timestamp(window.start) ws, topk FROM win_topk")
      .collect().map { r =>
        r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(t => (t.getString(0), t.getLong(1)))
      }.toMap
    q.stop()
    // batch exact per-window ranking (n desc, key asc) — must equal the
    // sketch ranking in the exact regime (150 users << 0.75*512)
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"), col("user_id").cast("string").as("u"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("u"), col("n"))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(r => (r.getString(1), r.getLong(2)))
        .sortBy(t => (-t._2, t._1)).take(5).toSeq).toMap
    assert(streamed.keySet == batch.keySet)
    streamed.foreach { case (ws, topk) =>
      assert(topk == batch(ws), s"window $ws: $topk != ${batch(ws)}")
    }
  }

  test("streaming windowed HLL distinct equals batch exact per window") {
    val stream = StreamingOps.eventsStream(spark, sf)
    val q = StreamingOps.windowedDistinct(stream, "user_id", "1 hour")
      .writeStream.format("memory").queryName("win_distinct")
      .outputMode("complete").start()
    q.processAllAvailable()
    val streamed = spark.sql(
      "SELECT unix_timestamp(window.start) ws, distinct_est FROM win_distinct")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    q.stop()
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(countDistinct(col("user_id")).as("n"))
      .select(unix_timestamp(col("window.start")), col("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
    // emitted sketches re-merge with batch partials to the global count
    val merged = graft.operators.Sketches.hllMergeEstimate(
      spark.sql("SELECT hll_sketch FROM win_distinct"), Seq.empty, "n")
      .head().getLong(0)
    val exact = Tables.events(spark, sf)
      .agg(countDistinct(col("user_id"))).head().getLong(0)
    assert(merged == exact, s"merged=$merged exact=$exact")
  }

  test("stream-stream window join pairs match the batch range join") {
    val stream = StreamingOps.eventsStream(spark, sf)
    val purchases = stream.filter(col("event_type") === "purchase")
    val clicks = stream.filter(col("event_type") === "click")
    val q = StreamingOps.streamStreamWindowJoin(
        purchases, clicks, "user_id", "ts", "1 HOUR")
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    q.processAllAvailable()
    val streamed = spark.sql("SELECT count(*) FROM ss_join").head().getLong(0)
    q.stop()
    // batch truth: total matched pairs = sum of per-purchase counts
    val ev = Tables.events(spark, sf)
    val batchPairs = graft.operators.RangeJoin.countInPrecedingWindow(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "click"),
        "user_id", "ts", 3600L * 1000000L)
      .agg(sum("n_in_window")).head().getLong(0)
    assert(streamed == batchPairs, s"stream=$streamed batch=$batchPairs")
  }

  test("left-outer stream-stream join emits watermark-expired unmatched purchases") {
    val stream = StreamingOps.eventsStream(spark, sf)
    val purchases = stream.filter(col("event_type") === "purchase")
    val clicks = stream.filter(col("event_type") === "click")
    // short watermark so the single micro-batch's max event time
    // expires (almost) every join window and null rows can emit
    val q = StreamingOps.streamStreamWindowJoin(
        purchases, clicks, "user_id", "ts", "1 HOUR",
        watermark = "5 minutes", joinType = "left_outer")
      .writeStream.format("memory").queryName("ss_left")
      .outputMode("append").start()
    q.processAllAvailable()
    val matched = spark.sql(
      "SELECT count(*) FROM ss_left WHERE r_id IS NOT NULL").head().getLong(0)
    val unmatchedStream = spark.sql(
      "SELECT count(*) FROM ss_left WHERE r_id IS NULL").head().getLong(0)
    q.stop()
    val ev = Tables.events(spark, sf)
    val counts = graft.operators.RangeJoin.countInPrecedingWindow(
        ev.filter(col("event_type") === "purchase"),
        ev.filter(col("event_type") === "click"),
        "user_id", "ts", 3600L * 1000000L)
    val batchMatched = counts.agg(sum("n_in_window")).head().getLong(0)
    val batchUnmatched = counts.filter(col("n_in_window") === 0).count()
    // matched pairs equal batch exactly; null rows for zero-match
    // purchases emit only once the watermark passes their window, so
    // the final window's purchases may still be withheld in state
    assert(matched == batchMatched, s"matched=$matched batch=$batchMatched")
    assert(unmatchedStream > 0 && unmatchedStream <= batchUnmatched,
      s"unmatched=$unmatchedStream batchUnmatched=$batchUnmatched")
  }

  test("stream-static join enriches every event with broadcast dim rows") {
    import spark.implicits._
    val stream = StreamingOps.eventsStream(spark, sf)
    // derive a small per-user dim (deterministic tier from the id)
    val dim = Tables.events(spark, sf).select(col("user_id")).distinct()
      .withColumn("tier", (col("user_id") % 3).cast("int"))
    val q = StreamingOps.streamStaticJoin(stream, dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    q.processAllAvailable()
    val streamed = spark.sql(
      "SELECT count(*) n, count(tier) nt FROM enriched").head()
    q.stop()
    val total = Tables.events(spark, sf).count()
    assert(streamed.getLong(0) == total, "inner join must keep every event")
    assert(streamed.getLong(1) == total, "every event must carry its dim row")
  }

  test("foreachBatch upsert sink is idempotent under replay") {
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val stream = StreamingOps.eventsStream(spark, sf)
    val q = StreamingOps.upsertSink(stream, dir, Seq("user_id"), "upsert1")
    q.processAllAvailable(); q.stop()
    val once = spark.read.parquet(s"$dir/data")
    val users = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(once.count() == users, "one row per key after first run")
    // replay: new query, fresh checkpoint, same source -> same target rows
    val q2 = StreamingOps.upsertSink(
      StreamingOps.eventsStream(spark, sf),
      dir + "2_ckpt_but_same_data", Seq("user_id"), "upsert2")
    q2.processAllAvailable(); q2.stop()
    // merging the replayed output into the original target is a no-op
    val replay = spark.read.parquet(s"$dir/data")
      .unionByName(spark.read.parquet(s"$dir" + "2_ckpt_but_same_data/data"))
      .dropDuplicates("user_id")
    assert(replay.count() == users, "replayed batches add no new rows")
  }

  test("stateful sessionization emits closed sessions consistent with batch") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val stream = StreamingOps.eventsStream(spark, sf)
      .selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[EventRow]
    val q = StreamingOps.sessionize(stream, 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    q.processAllAvailable()
    val streamed = spark.sql("SELECT user_id, start_us, n_events FROM sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    q.stop()
    // batch truth from the q20 definition
    val batch = SparkEntry.queries("q20_sessionize")(spark, sf)
      .select("user_id", "start_us", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed.nonEmpty)
    // every emitted (closed) session must match the batch session exactly
    streamed.foreach { case (k, n) =>
      assert(batch.get(k).contains(n), s"session $k: stream=$n batch=${batch.get(k)}")
    }
  }

  test("streaming materialized aggregate folds batches and survives restart exactly-once") {
    import graft.operators.IncrementalAgg.Agg
    val in = java.nio.file.Files.createTempDirectory("graft-magg-in").toString
    val state = java.nio.file.Files.createTempDirectory("graft-magg-st").toString
    def writeFile(name: String, rows: String): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/$name"), rows)
    writeFile("a.csv", "k,v\nx,1\ny,10\nx,2\n")
    writeFile("b.csv", "k,v\ny,5\nz,100\n")
    val aggs = Seq(Agg("n", "count", lit(1)), Agg("s", "sum", col("v")),
      Agg("mx", "max", col("v")))
    def source() = spark.readStream.schema("k string, v long")
      .option("header", "true").option("maxFilesPerTrigger", "1").csv(in)
    val q1 = StreamingOps.materializedAggregate(source(), Seq("k"), aggs,
      state, "magg")
    q1.processAllAvailable(); q1.stop()
    def snapshot(): Map[String, (Long, Long, Long)] =
      StreamingOps.latestState(spark, state).get.collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(snapshot() == Map("x" -> ((2L, 3L, 2L)), "y" -> ((2L, 15L, 10L)),
      "z" -> ((1L, 100L, 100L))))
    // restart with new data: only the new file folds (checkpointed
    // offsets + version-keyed folds), nothing double-counts
    writeFile("c.csv", "k,v\nx,7\n")
    val q2 = StreamingOps.materializedAggregate(source(), Seq("k"), aggs,
      state, "magg")
    q2.processAllAvailable(); q2.stop()
    assert(snapshot() == Map("x" -> ((3L, 10L, 7L)), "y" -> ((2L, 15L, 10L)),
      "z" -> ((1L, 100L, 100L))))
    // 3 batches folded but only the newest 2 versions retained (pruning),
    // and no staging leftovers
    val versions = StreamingOps.stateVersions(spark, state)
    assert(versions.length == 2, s"got $versions")
    val names = new java.io.File(state).listFiles().map(_.getName).toSeq
    assert(!names.exists(_.startsWith("_staging")), s"got $names")
  }

  test("materialized aggregate refuses to fold when the checkpoint was reset against live state") {
    import graft.operators.IncrementalAgg.Agg
    val in = java.nio.file.Files.createTempDirectory("graft-mrst-in").toString
    val state = java.nio.file.Files.createTempDirectory("graft-mrst-st").toString
    def writeFile(name: String, rows: String): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$in/$name"), rows)
    writeFile("a.csv", "k,v\nx,1\n")
    writeFile("b.csv", "k,v\ny,2\n")
    writeFile("c.csv", "k,v\nz,3\n")
    val aggs = Seq(Agg("s", "sum", col("v")))
    def source() = spark.readStream.schema("k string, v long")
      .option("header", "true").option("maxFilesPerTrigger", "1").csv(in)
    val q1 = StreamingOps.materializedAggregate(source(), Seq("k"), aggs,
      state, "mrst")
    q1.processAllAvailable(); q1.stop()
    // 3 batches, retainVersions=2 -> v=0 pruned
    assert(StreamingOps.stateVersions(spark, state) == Seq(1L, 2L))
    // reset the checkpoint (batch ids restart at 0) but keep the state
    // dir: batch 0's version dir is pruned, so folding it again would
    // silently double-count x into the v=2 state — must refuse
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(deleteRec); f.delete(); ()
    }
    deleteRec(new java.io.File(s"$state/_checkpoint"))
    val q2 = StreamingOps.materializedAggregate(source(), Seq("k"), aggs,
      state, "mrst2")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("checkpoint was reset")), chain(e).toString)
    // state unchanged — nothing was double-counted
    assert(StreamingOps.latestState(spark, state).get.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("x" -> 1L, "y" -> 2L, "z" -> 3L))
  }

  test("materialized aggregate refuses a reset even when the colliding version dir survived pruning") {
    import graft.operators.IncrementalAgg.Agg
    val root = java.nio.file.Files.createTempDirectory("graft_mrst3").toString
    val in = s"$root/in"; val state = s"$root/state"
    new java.io.File(in).mkdirs()
    def writeFile(n: String, rows: String): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(in, n), rows.getBytes)
    writeFile("a.csv", "k,v\nx,1\n")
    val aggs = Seq(Agg("s", "sum", col("v")))
    def source() = spark.readStream.schema("k string, v long")
      .option("header", "true").option("maxFilesPerTrigger", "1").csv(in)
    val q1 = StreamingOps.materializedAggregate(source(), Seq("k"), aggs,
      state, "mrst3", retainVersions = 10)
    q1.processAllAvailable(); q1.stop()
    // v=0 RETAINED (retainVersions=10); reset the checkpoint only —
    // batch ids restart at 0 and collide with the surviving dir, which
    // the version-dir heuristic alone would misread as a replay
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).toSeq.flatten.foreach(deleteRec); f.delete(); ()
    }
    deleteRec(new java.io.File(s"$state/_checkpoint"))
    writeFile("b.csv", "k,v\ny,2\n")
    val q2 = StreamingOps.materializedAggregate(source(), Seq("k"), aggs,
      state, "mrst3b", retainVersions = 10)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q2.processAllAvailable() finally q2.stop()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("reset/replaced")), chain(e).toString)
  }

  test("AvailableNow trigger drains pending files, stops, and a restart picks only new ones") {
    import org.apache.spark.sql.streaming.Trigger
    val root = java.nio.file.Files.createTempDirectory("graft_an").toString
    val in = s"$root/in"; val ck = s"$root/ck"; val out = s"$root/out"
    new java.io.File(in).mkdirs()
    def writeFile(n: String, rows: String): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(in, n), rows.getBytes)
    def runOnce(): Long = {
      val q = spark.readStream.schema("k string, v long")
        .option("header", "true").csv(in)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)  // AvailableNow terminates by itself
      spark.read.parquet(out).count()
    }
    writeFile("a.csv", "k,v\nx,1\ny,2\n")
    assert(runOnce() == 2L, "first drain sees both initial rows")
    writeFile("b.csv", "k,v\nz,3\n")
    // same checkpoint -> the catch-up run appends ONLY the new file
    assert(runOnce() == 3L, "restart must not reprocess drained files")
  }

  test("transformWithState running per-user stats match batch count/max") {
    import spark.implicits._
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    try {
      // the op requires (not sets) the RocksDB provider — configure it
      // here, restore after, so other suites keep the default provider
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val stream = StreamingOps.eventsStream(spark, sf).as[EventRow]
      val q = StreamingOps.runningUserStats(stream)
        .writeStream.format("memory").queryName("tws_running")
        .outputMode("update")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("tws_ck").toString)
        .start()
      q.processAllAvailable()
      // single source file -> one micro-batch -> one emitted row per user
      val streamed = spark.sql(
        "SELECT user_id, n_events, max_value FROM tws_running")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      q.stop()
      val batch = Tables.events(spark, sf)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), max(col("value")).as("mx"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(streamed == batch)
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
