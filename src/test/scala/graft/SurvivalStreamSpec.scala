package graft

import org.apache.spark.sql.functions._

/** The streaming lifetime/survival contract: per-user (first, last)
  * endpoints fold split-invariantly (min/max algebra — ANY row
  * partition, ANY order), and the Kaplan-Meier consumer equals the
  * batch q118 curve bit-for-bit (shared Survival.kmCurve kernel).
  */
class SurvivalStreamSpec extends SparkSpec {

  import graft.streaming.StreamingOps

  test("interleaved split folds to the batch KM curve bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("graft_surv").toString
    val ev = Tables.events(spark, sf)
      .select(col("ts"), col("user_id"), col("event_id"))
    // three INTERLEAVED batches (event_id mod — deliberately NOT
    // time-ordered: min/max endpoint folds need no arrival contract,
    // the qualityAudit/bitmap class)
    (0 to 2).foreach { i =>
      ev.filter(col("event_id") % 3 === i)
        .coalesce(1).write.parquet(s"$dir/in/b$i")
    }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(s"$dir/in/*")
    val q = StreamingOps.lifetimesMaintained(stream, s"$dir/state", "surv_spec")
    try q.processAllAvailable() finally q.stop()
    val state = StreamingOps.latestState(spark, s"$dir/state").get
    // one endpoint row per user
    assert(state.count() ===
      Tables.events(spark, sf).select(col("user_id")).distinct().count())
    val got = StreamingOps.survivalFrom(state).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    val want = SparkEntry.queries("q118_survival")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(got === want) // surv doubles bit-equal: same kernel, same fold
    GraftSession.release(spark)
  }

  test("stratified kmCurveBy equals kmCurve run on each stratum alone") {
    import spark.implicits._
    import graft.operators.Survival
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts").cast("date").as("day"))
    val life = ev.groupBy($"user_id")
      .agg(min($"day").as("f"), max($"day").as("l"))
    val mx = ev.agg(max($"day").as("max_day"))
    // stratum 2 maps to NULL: a nullable group column must yield the
    // null stratum's full curve (null-safe group joins), not drop it
    val lt = life.crossJoin(org.apache.spark.sql.functions.broadcast(mx))
      .select(when($"user_id" % 3 =!= 2, $"user_id" % 3).as("g"),
        datediff($"l", $"f").cast("long").as("t"),
        when($"l" < $"max_day", 1L).otherwise(0L).as("is_event"))
      .persist()
    def canonRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq
        .map(r => (0 until r.length).map(r.get)).sortBy(_.toString)
    val grouped = Survival.kmCurveBy(lt, "g")
    Seq[Option[Long]](Some(0L), Some(1L), None).foreach { g =>
      def pick(df: org.apache.spark.sql.DataFrame) = g match {
        case Some(v) => df.filter($"g" === v)
        case None => df.filter($"g".isNull)
      }
      // bit-equal per stratum: the grouped path must not change the
      // ratio fold order or the risk-set arithmetic
      assert(canonRows(pick(grouped).drop("g")) ===
        canonRows(Survival.kmCurve(pick(lt).drop("g"))),
        s"stratum $g diverged")
    }
    GraftSession.release(spark)
  }
}
