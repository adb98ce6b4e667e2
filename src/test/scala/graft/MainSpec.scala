package graft

import java.nio.file.{Files, Paths}
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._

class MainSpec extends SparkSpec {

  test("CLI main runs a YAML-configured pipeline end to end") {
    val in = Files.createTempDirectory("graft-main-in").toString
    val out = Files.createTempDirectory("graft-main-out").toString
    Files.writeString(Paths.get(s"$in/r.csv"),
      "id,status\n1,important\n2,normal\n3,important-ish\n")
    val yaml = Files.createTempFile("graft-cfg", ".yaml")
    Files.writeString(yaml,
      s"""pipelines:
         |  - name: "cli-pipe"
         |    source:
         |      type: file
         |      properties:
         |        path: "$in"
         |        format: csv
         |        header: "true"
         |    transformations:
         |      - type: filter
         |        properties:
         |          column: "status"
         |          condition: "important"
         |    sink:
         |      type: file
         |      properties:
         |        path: "$out"
         |        format: parquet
         |""".stripMargin)
    graft.pipeline.Main.main(Array(yaml.toString))
    val back = spark.read.parquet(out)
    assert(back.count() == 2) // substring semantics: matches important-ish too
  }

  test("streaming dedup drops duplicate keys within the watermark") {
    val stream = StreamingOps.eventsStream(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts"))
    val q = StreamingOps.streamingDedup(stream,
        Seq("user_id", "event_type"), "ts", "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    q.processAllAvailable()
    val n = spark.sql("SELECT count(*) FROM dedup_stream").head().getLong(0)
    q.stop()
    // true KEY dedup: one row per (user, event_type)
    val batchKeys = Tables.events(spark, sf)
      .select("user_id", "event_type").distinct().count()
    assert(n == batchKeys)
  }
}
