package graft

import java.nio.file.Files
import graft.pipeline._
import graft.sinks.Sinks

/** Real JDBC connector exercise against embedded Derby (ships with
  * Spark) — the reference's postgres-to-parquet pipeline
  * (README "4. PostgreSQL to Parquet Pipeline") minus the postgres
  * server.
  */
class JdbcSpec extends SparkSpec {

  private val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  test("jdbc sink + source round trip, then db -> filter -> parquet pipeline") {
    import spark.implicits._
    val dbDir = Files.createTempDirectory("graft-derby").toString
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val out = Files.createTempDirectory("graft-jdbc-out").toString

    // reference's employee table, written through the jdbc sink
    val emp = Seq(
      (1, "John Doe", "IT", 75000.0),
      (2, "Jane Smith", "HR", 65000.0),
      (3, "Bob Wilson", "Sales", 80000.0)
    ).toDF("id", "name", "department", "salary")
    Sinks.write(emp, SinkSpec("jdbc", Map(
      "jdbcUrl" -> url, "table" -> "employee",
      "driver" -> driver, "mode" -> "overwrite")))

    // reference pipeline 4: jdbc source with custom query -> parquet sink
    PipelineRunner.runBatch(spark, PipelineSpec(
      name = "postgres-to-parquet",
      source = SourceSpec("jdbc", Map(
        "jdbcUrl" -> url, "driver" -> driver, "batchSize" -> "1000",
        // Spark's JDBC writer creates quoted lowercase identifiers;
        // Derby upcases unquoted ones, so the query must quote them
        "query" -> """SELECT "id", "name", "salary" FROM employee WHERE "salary" > 70000""")),
      transformations = Seq.empty,
      sink = SinkSpec("file", Map("path" -> out, "format" -> "parquet"))))

    val back = spark.read.parquet(out).orderBy("id").collect()
    assert(back.map(_.getInt(0)).toSeq == Seq(1, 3))
    assert(back.head.getString(1) == "John Doe")
  }
}
