package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.pipeline.{SinkSpec, SourceSpec}
import graft.sinks.Sinks
import graft.sources.Sources

/** ORC round-trip through the connector surface — the `format` option
  * reaches DataFrameReader/Writer untouched, so every Spark-built-in
  * columnar format (parquet/orc/json/csv) works through the same
  * file source/sink specs.
  */
class OrcSpec extends SparkSpec {

  test("file sink + source round-trips ORC with schema and pushdown") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val df = Tables.load(spark, sf, "nation")
    Sinks.write(df, SinkSpec("file", Map("path" -> dir, "format" -> "orc")))
    val back = Sources.read(spark,
      SourceSpec("file", Map("path" -> dir, "format" -> "orc")))
    assert(back.schema == df.schema)
    assert(back.count() == df.count())
    // predicate pushdown reaches the ORC scan like parquet
    val plan = back.filter(col("n_nationkey") === 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && !plan.contains("PushedFilters: []"))
    assert(back.filter(col("n_nationkey") === 3).count() == 1)
  }
}
