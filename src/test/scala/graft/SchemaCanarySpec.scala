package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canary for silent testdata regeneration (the round-6 incident: the
  * generator switched `events.ts` from TIMESTAMP(NANOS) to plain
  * `timestamp[us]`/NTZ and 11 queries + the streaming suite broke with
  * no single obvious failure point).
  *
  * The contract pinned here: whatever physical shape the generator
  * ships, `Tables.events`/`Tables.normalizeEventTs` deliver `ts` as
  * native TimestampType (µs, session-TZ aware), so every downstream
  * `unix_micros`/`window`/`withWatermark` call resolves. If the
  * generator moves again, THIS spec is the one that fails, and its
  * name says where to fix it.
  */
class SchemaCanarySpec extends SparkSpec {

  test("Tables.events normalizes ts to TimestampType for the current testdata generation") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType,
      s"normalizeEventTs must deliver TimestampType; got ${ev.schema("ts").dataType}. " +
        "The testdata generator likely changed events.ts's physical type again — " +
        "extend Tables.normalizeEventTs with a new schema-dispatch case.")
    // unix_micros must resolve AND evaluate (the round-6 failure mode was
    // an AnalysisException here).
    val n = ev.select(unix_micros(col("ts")).as("us")).filter(col("us") > 0).count()
    assert(n > 0L)
  }

  test("normalizeEventTs dispatches every generation shape") {
    import spark.implicits._
    // ns-epoch long (nanosAsLong legacy shape): exact integer div
    val fromLong = Tables.normalizeEventTs(
      Seq(1700000000123456789L).toDF("ts"))
    assert(fromLong.schema("ts").dataType == TimestampType)
    assert(fromLong.select(unix_micros($"ts")).head.getLong(0) == 1700000000123456L)
    // NTZ (current generation): UTC wall-clock reinterpretation preserves epoch-us
    val fromNtz = Tables.normalizeEventTs(
      Seq(java.time.LocalDateTime.of(2024, 1, 2, 3, 4, 5, 123456000)).toDF("ts"))
    assert(fromNtz.schema("ts").dataType == TimestampType)
    assert(fromNtz.select(unix_micros($"ts")).head.getLong(0) ==
      java.time.LocalDateTime.of(2024, 1, 2, 3, 4, 5, 123456000)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000 + 456)
    // already-native TimestampType passes through untouched
    val native = Tables.normalizeEventTs(
      Seq(new java.sql.Timestamp(1700000000123L)).toDF("ts"))
    assert(native.schema("ts").dataType == TimestampType)
  }

  test("streaming events source delivers watermarkable TimestampType") {
    val st = graft.streaming.StreamingOps.eventsStream(spark, sf)
    assert(st.isStreaming)
    assert(st.schema("ts").dataType == TimestampType)
    // must not throw EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    st.withWatermark("ts", "1 hour")
  }
}
