package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipeline.SourceSpec

/** Source connectors (SURVEY.md §2.1) — the reference's five source
  * types (file, directory, jdbc, kafka, s3; factory/SourceFactory.java:
  * 45-55) mapped onto Spark's DataFrameReader / readStream. Each maps
  * declaratively so Catalyst sees a plain relation: pushdown and pruning
  * apply to every connector for free.
  */
object Sources {

  /** Batch read. `directory`/`kafka` are inherently streaming in the
    * reference; their batch form reads the current snapshot.
    */
  def read(spark: SparkSession, spec: SourceSpec): DataFrame = spec.kind match {
    case "file" | "directory" => fileReader(spark, spec.properties)
    case "s3" => fileReader(spark, spec.properties ++
      spec.properties.get("path").map(p => "path" -> s3aPath(p)))
    case "jdbc" =>
      spark.read.format("jdbc").options(jdbcOptions(spec.properties)).load()
    case "kafka" =>
      spark.read.format("kafka").options(kafkaOptions(spec.properties)).load()
    case "table" | "hive" =>
      // catalog table source (session catalog, or Hive metastore when
      // the session was built with enableHiveSupport) — managed tables
      // carry their own schema + statistics, so pruning/pushdown apply
      spark.table(spec.properties.getOrElse("table",
        throw new IllegalArgumentException("Table source requires table")))
    case other => throw new IllegalArgumentException(s"Unknown source type: $other")
  }

  /** Streaming read (Structured Streaming) — the reference's directory
    * watch / kafka poll. File-based streams track new files exactly like
    * the reference's FileSourceContext.readNewFiles().
    */
  def readStream(spark: SparkSession, spec: SourceSpec): DataFrame = spec.kind match {
    case "file" | "directory" | "s3" =>
      val props = spec.properties
      val path = if (spec.kind == "s3") s3aPath(props("path")) else props("path")
      val fmt = props.getOrElse("format", "text")
      val reader = spark.readStream.format(fmt)
        .options(fileOptions(props))
      // streaming file sources need an explicit schema (except text)
      props.get("schemaDdl") match {
        case Some(ddl) => reader.schema(ddl).load(path)
        case None if fmt == "text" => reader.load(path)
        case None => reader.schema(
          read(spark, spec.copy(kind = "file",
            properties = props + ("path" -> path))).schema).load(path)
      }
    case "kafka" =>
      spark.readStream.format("kafka").options(kafkaOptions(spec.properties)).load()
    case other => throw new IllegalArgumentException(s"Source $other is not streamable")
  }

  private def fileReader(spark: SparkSession, props: Map[String, String]): DataFrame = {
    val fmt = props.getOrElse("format", "text")
    spark.read.format(fmt).options(fileOptions(props))
      .load(props.getOrElse("path",
        throw new IllegalArgumentException("File source requires path")))
  }

  /** Option mapping shared by batch+stream file reads. The reference's
    * `pattern: *.csv` becomes Spark's pathGlobFilter.
    */
  def fileOptions(props: Map[String, String]): Map[String, String] = {
    val passthrough = Seq("header", "delimiter", "inferSchema", "multiLine",
      "recursiveFileLookup", "maxFilesPerTrigger")
    passthrough.flatMap(k => props.get(k).map(k -> _)).toMap ++
      props.get("pattern").map("pathGlobFilter" -> _)
  }

  /** JDBC option mapping (reference: factory/source/JdbcSourceContext).
    * `query` wins over `table`, batchSize becomes fetchsize, and
    * partitioning options pass through for parallel scans at scale.
    */
  def jdbcOptions(props: Map[String, String]): Map[String, String] = {
    val base = Map("url" -> props.getOrElse("jdbcUrl", props.getOrElse("url", "")))
    val target = props.get("query").map("query" -> _)
      .orElse(props.get("table").map("dbtable" -> _))
      .getOrElse(throw new IllegalArgumentException("JDBC source requires table or query"))
    base + target ++
      props.get("user").map("user" -> _) ++
      props.get("password").map("password" -> _) ++
      props.get("batchSize").map("fetchsize" -> _) ++
      Seq("driver", "partitionColumn", "lowerBound", "upperBound", "numPartitions")
        .flatMap(k => props.get(k).map(k -> _))
  }

  /** Kafka option mapping (reference: factory/source/KafkaSourceContext). */
  def kafkaOptions(props: Map[String, String]): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" ->
        props.getOrElse("bootstrap.servers", props.getOrElse("bootstrapServers", "localhost:9092")),
      "subscribe" -> props.getOrElse("topic", props.getOrElse("subscribe", ""))) ++
      props.get("startingOffsets").map("startingOffsets" -> _)

  /** Reference S3SourceContext reads via bucket/prefix; on Spark that is
    * just an s3a:// path (hadoop-aws handles auth via the usual chain).
    */
  def s3aPath(p: String): String =
    if (p.startsWith("s3://")) "s3a://" + p.stripPrefix("s3://")
    else if (p.startsWith("s3a://") || p.contains("://")) p
    else s"s3a://$p"
}
