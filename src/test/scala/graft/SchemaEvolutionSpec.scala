package graft

import graft.pipeline.SourceSpec
import graft.sources.Sources

/** Schema evolution on read: parquet files written at different schema
  * versions union into one frame with mergeSchema, and nested-struct
  * reads prune to the referenced subfields at the scan.
  */
class SchemaEvolutionSpec extends SparkSpec {

  test("mergeSchema unions columns across parquet files written at different versions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evo").toString
    Seq((1L, "a")).toDF("id", "name")
      .write.parquet(s"$dir/part=v1")
    Seq((2L, "b", 9.5)).toDF("id", "name", "score")
      .write.parquet(s"$dir/part=v2")
    val df = Sources.read(spark, SourceSpec("file", Map(
      "path" -> dir, "format" -> "parquet", "mergeSchema" -> "true")))
    assert(df.columns.toSet == Set("id", "name", "score", "part"))
    val rows = df.select($"id", $"score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    // the old file's rows surface the new column as null
    assert(rows == Map(1L -> None, 2L -> Some(9.5)))
  }

  test("nested struct reads prune to the referenced subfield at the scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_nest").toString
    Seq((1L, ("x", 10L, "blob1")), (2L, ("y", 20L, "blob2")))
      .toDF("id", "meta")
      .select($"id", $"meta".cast("struct<name:string,size:bigint,payload:string>"))
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).select($"id", $"meta.size")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("struct<size:bigint>") ||
      plan.contains("meta:struct<size:bigint>"),
      s"scan must read only meta.size, got: ${plan.take(400)}")
    assert(df.collect().map(_.getLong(1)).toSet == Set(10L, 20L))
  }
}
