package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.pipeline.SinkSpec
import graft.sources.Sources

/** Sink connectors (SURVEY.md §2.1) — the reference's sinks
  * (factory/SinkFactory.java: file/CSV, parquet, jdbc, kafka, s3) on
  * DataFrameWriter / writeStream. Parquet replaces the reference's
  * Avro-schema path: Spark derives the schema from the DataFrame.
  */
object Sinks {

  /** The reference declares sink record shapes as Avro schemas
    * (pipeline-config-example.yaml `schema: |` blocks, consumed by its
    * ParquetSinkContext). Honor the same property: project + cast the
    * outgoing frame to the declared fields IN DECLARED ORDER. Avro
    * primitives and [null, T] unions map onto Spark types; nested
    * records are out of scope (the reference's examples are flat).
    */
  def applyAvroSchema(df: DataFrame, schemaJson: String): DataFrame = {
    import org.apache.avro.{LogicalTypes, Schema}
    // Logical types first: real-world Avro sink schemas carry
    // decimal/date/timestamp annotations on their physical types, exactly
    // as avro's own spec maps them. Time types have no Spark analog and
    // fall through to their physical int/long.
    def logicalSparkType(s: Schema): Option[String] = Option(s.getLogicalType).collect {
      case d: LogicalTypes.Decimal => s"decimal(${d.getPrecision},${d.getScale})"
      case _: LogicalTypes.Date => "date"
      case _: LogicalTypes.TimestampMillis => "timestamp"
      case _: LogicalTypes.TimestampMicros => "timestamp"
      case lt if lt.getName == "uuid" => "string"
    }
    def sparkType(s: Schema): String = logicalSparkType(s).getOrElse(s.getType match {
      case Schema.Type.STRING => "string"
      case Schema.Type.INT => "int"
      case Schema.Type.LONG => "bigint"
      case Schema.Type.FLOAT => "float"
      case Schema.Type.DOUBLE => "double"
      case Schema.Type.BOOLEAN => "boolean"
      case Schema.Type.BYTES => "binary"
      case Schema.Type.FIXED => "binary"
      case Schema.Type.ENUM => "string"
      case Schema.Type.UNION =>
        val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        require(nonNull.size == 1,
          s"only [null, T] unions are supported: $s")
        sparkType(nonNull.head)
      case other =>
        throw new IllegalArgumentException(s"unsupported avro type: $other")
    })
    val record = new Schema.Parser().parse(schemaJson)
    require(record.getType == Schema.Type.RECORD,
      s"sink schema must be an avro record, got ${record.getType}")
    df.select(record.getFields.asScala.toSeq.map { f =>
      org.apache.spark.sql.functions.col(f.name)
        .cast(sparkType(f.schema())).as(f.name)
    }: _*)
  }

  private def withDeclaredSchema(df: DataFrame, props: Map[String, String]): DataFrame =
    props.get("schema").map(applyAvroSchema(df, _)).getOrElse(df)

  /** `partitionBy: a, b` in YAML arrives with natural spacing — trim each
    * name and drop empties so a trailing comma or space never mints a
    * bogus " b" partition column.
    */
  private def partitionCols(spec: String): Seq[String] =
    spec.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  def write(rawDf: DataFrame, spec: SinkSpec): Unit = {
   val df = withDeclaredSchema(rawDf, spec.properties)
   spec.kind match {
    case "file" | "parquet" | "s3" =>
      val props = spec.properties
      if (spec.kind == "s3") {
        Sources.requireConnector("s3")
        Sources.applyS3Conf(df.sparkSession, props)
      }
      val path = if (spec.kind == "s3") Sources.s3aPath(props("path")) else props("path")
      val fmt = if (spec.kind == "parquet") "parquet"
        else props.getOrElse("format", "text")
      var w = df.write.format(fmt).mode(props.getOrElse("mode", "overwrite"))
      if (fmt == "csv" && props.getOrElse("includeHeaders", "true") == "true")
        w = w.option("header", "true")
      props.get("partitionBy").foreach(cols => w = w.partitionBy(partitionCols(cols): _*))
      props.get("compression").foreach(c => w = w.option("compression", c))
      // XML sink: forward the element tags (defaults: row/rows)
      Seq("rowTag", "rootTag", "declaration")
        .foreach(k => props.get(k).foreach(v => w = w.option(k, v)))
      w.save(path)
    case "jdbc" =>
      // write-side options differ from the read side: dbtable is
      // mandatory (a query target is meaningless for a sink) and the
      // batch knob is `batchsize`, not `fetchsize`
      val props = spec.properties
      val table = props.getOrElse("table",
        throw new IllegalArgumentException("JDBC sink requires table"))
      df.write.format("jdbc")
        .option("url", props.getOrElse("jdbcUrl", props.getOrElse("url", "")))
        .option("dbtable", table)
        .options(Seq("user", "password", "driver")
          .flatMap(k => props.get(k).map(k -> _)).toMap)
        .options(props.get("batchSize").map("batchsize" -> _).toMap)
        .mode(props.getOrElse("mode", "append"))
        .save()
    case "kafka" =>
      Sources.requireConnector("kafka")
      // strip EVERY source-subscription strategy kafkaOptions may have
      // emitted (subscribe / subscribePattern / assign) — a sink only
      // takes `topic`, and a copy-pasted source block must normalize
      df.write.format("kafka")
        .options(Sources.kafkaOptions(spec.properties)
          -- Seq("subscribe", "subscribePattern", "assign") +
          ("topic" -> spec.properties.getOrElse("topic", "")))
        .save()
    case "table" | "hive" =>
      // catalog table sink (saveAsTable): managed table in the session
      // catalog / Hive metastore; format + partitioning as for files
      val props = spec.properties
      val table = props.getOrElse("table",
        throw new IllegalArgumentException("Table sink requires table"))
      var w = df.write.format(props.getOrElse("format", "parquet"))
        .mode(props.getOrElse("mode", "overwrite"))
      props.get("partitionBy").foreach(cols => w = w.partitionBy(partitionCols(cols): _*))
      w.saveAsTable(table)
    case other => throw new IllegalArgumentException(s"Unknown sink type: $other")
   }
  }

  /** Streaming write with checkpointing — at-least-once like the
    * reference's Jet sinks, exactly-once for file sinks.
    */
  def writeStream(rawDf: DataFrame, spec: SinkSpec, name: String): StreamingQuery = {
    val df = withDeclaredSchema(rawDf, spec.properties)
    val props = spec.properties
    // pipeline names like "csv-to-parquet" must become valid identifiers
    val queryName = name.replaceAll("\\W", "_")
    val trigger = props.get("triggerMs")
      .map(ms => Trigger.ProcessingTime(ms.toLong))
      .getOrElse(Trigger.ProcessingTime(0L))
    spec.kind match {
      case "memory" =>
        df.writeStream.format("memory").queryName(queryName)
          .outputMode(props.getOrElse("outputMode", "append")).trigger(trigger).start()
      case "file" | "parquet" | "s3" =>
        if (spec.kind == "s3") {
          Sources.requireConnector("s3")
          Sources.applyS3Conf(df.sparkSession, props)
        }
        val path = if (spec.kind == "s3") Sources.s3aPath(props("path")) else props("path")
        val fmt = if (spec.kind == "parquet") "parquet" else props.getOrElse("format", "parquet")
        df.writeStream.format(fmt)
          .option("path", path)
          .option("checkpointLocation",
            props.getOrElse("checkpointLocation", s"$path/_checkpoint"))
          .outputMode(props.getOrElse("outputMode", "append")).trigger(trigger).start()
      case "kafka" =>
        Sources.requireConnector("kafka")
        df.writeStream.format("kafka")
          .options(Sources.kafkaOptions(props)
            -- Seq("subscribe", "subscribePattern", "assign") +
            ("topic" -> props.getOrElse("topic", "")))
          .option("checkpointLocation", props("checkpointLocation"))
          .trigger(trigger).start()
      case "table" | "hive" =>
        // streaming catalog-table sink (toTable) — exactly-once via the
        // table's checkpointed file sink underneath
        df.writeStream
          .option("checkpointLocation", props("checkpointLocation"))
          .outputMode(props.getOrElse("outputMode", "append"))
          .trigger(trigger)
          .toTable(props.getOrElse("table",
            throw new IllegalArgumentException("Table sink requires table")))
      case other => throw new IllegalArgumentException(s"Sink $other is not streamable")
    }
  }
}
