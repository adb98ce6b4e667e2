package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** The streaming point-in-time enrichment contract: with the
  * dimension maintained first, the streamed fact enrichment equals
  * the batch q95-style AS-OF join against the final dimension, no
  * fact is ever dropped, and batch replays are idempotent.
  */
class Scd2EnrichSpec extends SparkSpec {

  test("streamed enrichment equals the batch as-of join; facts never drop") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2e").toString
    val ev = Tables.events(spark, sf)
    val dimEvents = ev.filter(col("event_type") =!= "click")
    val facts = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    // 1. maintain the dimension from its own stream (the producer)
    dimEvents.coalesce(1).write.parquet(s"$dir/dim_in/b0")
    val dimStream = spark.readStream.schema(dimEvents.schema)
      .parquet(s"$dir/dim_in/*")
    val qd = StreamingOps.scd2Maintained(dimStream, s"$dir/dimstate", "scd2e_dim")
    try qd.processAllAvailable() finally qd.stop()
    // 2. stream the facts through the enrichment consumer
    facts.coalesce(1).write.parquet(s"$dir/facts_in/b0")
    val factStream = spark.readStream.schema(facts.schema)
      .parquet(s"$dir/facts_in/*")
    val qf = StreamingOps.scd2EnrichedTo(factStream, s"$dir/dimstate", s"$dir/out")
    try qf.processAllAvailable() finally qf.stop()
    val streamed = spark.read.parquet(s"$dir/out/data")
      .select(col("event_id"), col("dim_state"), col("version"))
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)), Option(r.get(2)))).toSet
    // batch truth: the same join against the final dimension
    val dim = StreamingOps.latestState(spark, s"$dir/dimstate").get
    val batch = StreamingOps.scd2Enrich(facts, dim)
      .select(col("event_id"), col("dim_state"), col("version"))
      .collect().map(r => (r.getLong(0),
        Option(r.getString(1)), Option(r.get(2)))).toSet
    assert(streamed == batch)
    // no fact dropped: every click appears exactly once
    assert(streamed.size == facts.count())
    GraftSession.release(spark)
  }

  test("a legacy flat-append outDir is refused, not silently duplicated") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2legacy").toString
    // fabricate the pre-round-9 layout: a loose parquet file under
    // data/ plus a _batch_0 marker at the outDir root
    Seq((1L, 7L, new java.sql.Timestamp(0L)))
      .toDF("event_id", "user_id", "ts").coalesce(1)
      .write.parquet(s"$dir/out/data")
    java.nio.file.Files.createFile(java.nio.file.Paths.get(s"$dir/out/_batch_0"))
    val facts = Seq((2L, 7L, new java.sql.Timestamp(1000L)))
      .toDF("event_id", "user_id", "ts")
    facts.coalesce(1).write.parquet(s"$dir/facts_in/b0")
    val factStream = spark.readStream.schema(facts.schema)
      .parquet(s"$dir/facts_in/*")
    val q = StreamingOps.scd2EnrichedTo(factStream, s"$dir/dimstate", s"$dir/out")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    assert(e.getMessage.contains("legacy flat-append") ||
      Option(e.getCause).exists(_.getMessage.contains("legacy flat-append")))
    GraftSession.release(spark)
  }

  test("a fact predating every dimension version survives with null dims") {
    import spark.implicits._
    val dim = Seq((7L, "signup", 1L, 1000L, Option.empty[Long]))
      .toDF("user_id", "event_type", "version", "valid_from_us", "valid_to_us")
    val facts = Seq((1L, 7L, new java.sql.Timestamp(0L)))
      .toDF("event_id", "user_id", "ts")
    val out = StreamingOps.scd2Enrich(facts, dim).collect()
    assert(out.length == 1 && out.head.isNullAt(out.head.fieldIndex("version")))
  }
}
