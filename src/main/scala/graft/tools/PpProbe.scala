package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only stage-attribution probe for dedup_ppjoin (round 20): times
  * each prefix-ladder stage separately so the 3+ s cost is attributed
  * to a stage, not guessed.
  */
object PpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pp] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    (1 to 2).foreach { round =>
      println(s"[pp] === round $round ===")
      val stride = (graft.Tables.rowCount(spark, sfDir, "documents") + 1999L) / 2000L
      val docs = graft.Tables.load(spark, sfDir, "documents")
        .filter($"doc_id" % stride === 0)
        .select($"doc_id",
          expr("filter(split(text, ' '), gx -> gx != '')").as("toks"))
      val df = graft.operators.Parallelism.ensure(docs)
      val sets = df.select(col("doc_id").as("__id"),
          array_sort(array_distinct(col("toks"))).as("__toks"))
        .withColumn("__m", size(col("__toks")).cast("long"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("sets persist")(sets.count())
      val toks = sets.select(col("__id"), col("__m"),
        explode(col("__toks")).as("__tok"))
      val tdf = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__df"))
      val pref0 = toks.join(tdf, "__tok")
        .withColumn("__pos", row_number().over(
          Window.partitionBy(col("__id")).orderBy(col("__df"), col("__tok")))
          .cast("long"))
        .filter(col("__pos") <=
          col("__m") - expr(s"(__m * 19 + 19) div 20") + 1)
        .select(col("__id"), col("__tok"), col("__pos"), col("__m"))
      val pref = pref0.repartition(col("__tok"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("pref persist")(pref.count())
      val nd = 39
      val cands = pref.as("a").join(pref.as("b"),
          col("a.__tok") === col("b.__tok") && col("a.__id") < col("b.__id") &&
          least(col("a.__m"), col("b.__m")) * 20 >=
            greatest(col("a.__m"), col("b.__m")) * 19 &&
          lit(1L) + least(col("a.__m") - col("a.__pos"),
              col("b.__m") - col("b.__pos")) >=
            expr(s"(19 * (a.__m + b.__m) + ${nd - 1}) div $nd"))
        .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nc = time("cands distinct")(cands.count())
      println(s"[pp] n_cands = $nc")
      val fin = cands
        .join(sets.select(col("__id").as("id_a"), col("__toks").as("__ta"),
          col("__m").as("__ma")), "id_a")
        .join(sets.select(col("__id").as("id_b"), col("__toks").as("__tb"),
          col("__m").as("__mb")), "id_b")
        .withColumn("inter",
          size(array_intersect(col("__ta"), col("__tb"))).cast("long"))
        .withColumn("uni", col("__ma") + col("__mb") - col("inter"))
        .filter(col("inter") * 20 >= col("uni") * 19)
        .select(col("id_a"), col("id_b"), col("inter"), col("uni"))
      time("verify")(fin.count())
      graft.GraftSession.release(spark)
    }
    spark.stop()
  }
}
