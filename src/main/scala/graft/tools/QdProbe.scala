package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only alternating A/B probe for the dq_quality_dup dup-flag
  * stage shapes (round 19, VERDICT r18 task 2). Times ONLY the
  * dupDocs count (the stage under test), alternating forms so burst
  * steal hits all arms equally.
  */
object QdProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/scale10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.functions.GraftFunctions.word_shingles

    def postings(): DataFrame = {
      val docs = graft.Tables.load(spark, sfDir, "documents")
      graft.operators.Parallelism.ensure(docs)
        .select($"doc_id", explode(word_shingles($"text", 8)).as("__shs"))
        .select($"doc_id", xxhash64($"__shs").as("sh"))
    }
    // A: persist + df rollup + semi join (hashed r18-ish form)
    def formA(): Long = {
      val sh = postings()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val shared = sh.groupBy($"sh").agg(count(lit(1)).as("d"))
        .filter($"d" > 1L).select($"sh")
      val n = sh.join(shared, Seq("sh"), "left_semi")
        .select($"doc_id").distinct().count()
      sh.unpersist(blocking = true)
      n
    }
    // B: single window count, no persist
    def formB(): Long = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"sh")
      postings().withColumn("d", count(lit(1)).over(w))
        .filter($"d" > 1L).select($"doc_id").distinct().count()
    }
    // C: no persist, recompute postings for the semi join
    def formC(): Long = {
      val shared = postings().groupBy($"sh").agg(count(lit(1)).as("d"))
        .filter($"d" > 1L).select($"sh")
      postings().join(shared, Seq("sh"), "left_semi")
        .select($"doc_id").distinct().count()
    }
    def control(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q1_agg")(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    def time(f: () => Long): Double = {
      graft.GraftSession.release(spark)
      val t0 = System.nanoTime(); val n = f()
      val dt = (System.nanoTime() - t0) / 1e9
      require(n > 0); dt
    }
    // warm every form once
    Seq(formA _, formB _, formC _).foreach(f => time(() => f()))
    val rounds = 3
    for (r <- 1 to rounds) {
      val c0 = control()
      val a = time(() => formA()); val b = time(() => formB())
      val c = time(() => formC()); val c1 = control()
      val la = scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      println(f"[qdprobe] round $r ctl=$c0%.2f/$c1%.2f A=$a%.2f B=$b%.2f " +
        f"C=$c%.2f loadavg=$la")
    }
    spark.stop()
  }
}
