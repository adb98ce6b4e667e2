package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects SQL functions into a fresh session") {
    // another suite may already own the default session (without the
    // extensions); clear the references so getOrCreate builds a new
    // SparkSession — reusing the shared SparkContext — with them applied
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
      import spark.implicits._
      val h = spark.sql("SELECT graft_poly_hash('hello') AS h").head().getLong(0)
      assert(h == 99162322L)
      val c = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
      c.createOrReplaceTempView("vecs")
      assert(spark.sql("SELECT graft_cosine(a, b) FROM vecs").head().getDouble(0) == 1.0)
      // usable inside lambda HOFs (the registry path that matters at scale)
      val m = spark.sql(
        "SELECT array_min(transform(array('x', 'y'), s -> graft_poly_hash(s))) AS m")
        .head().getLong(0)
      assert(m == math.min("x".charAt(0).toLong, "y".charAt(0).toLong))
      // sketch aggregates resolve from pure SQL (analyzer wraps the bare
      // AggregateFunction) — exact mode, so counts are exact
      Seq("a", "b", "a", "c", "a").toDF("v").createOrReplaceTempView("items")
      val top = spark.sql(
        """SELECT t.item, t.est FROM (
          |  SELECT explode(graft_freq_topk(graft_freq_sketch(v, 64), 1)) AS t
          |  FROM items) x""".stripMargin).head()
      assert(top.getString(0) == "a" && top.getLong(1) == 3L)
    // do NOT stop this session: that would kill the SparkContext shared
    // with the other suites' sessions
  }
}

class SamplingSpec extends SparkSpec {
  test("seeded sampling is reproducible and stratified fractions hold") {
    val docs = Tables.load(spark, sf, "documents")
    val a = graft.operators.Sampling.uniform(docs, 0.3).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = graft.operators.Sampling.uniform(docs, 0.3).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty && a.size < docs.count())
    val strat = graft.operators.Sampling.stratified(docs, "lang",
      Map("en" -> 0.1, "fr" -> 1.0))
    val byLang = strat.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang.keySet == Set("en", "fr")) // unlisted strata dropped
    val frTotal = docs.filter(org.apache.spark.sql.functions.col("lang") === "fr").count()
    assert(byLang("fr") == frTotal) // fraction 1.0 keeps everything
  }

  test("weighted top-k sample is deterministic and favors weight") {
    import org.apache.spark.sql.functions._
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    // 1000 heavy ids (weight 5) among 10000: expected heavy share of the
    // top-k is 5000/14000 ~ 36%, vs 10% population share
    val df = (0L until 10000L).toDF("id")
      .withColumn("wt", when($"id" < 1000, 5).otherwise(1))
    val s1 = graft.operators.Sampling.weightedTopK(df, "id", "wt", 500)
      .select("id").collect().map(_.getLong(0)).toSeq
    val s2 = graft.operators.Sampling.weightedTopK(df, "id", "wt", 500)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(s1 == s2, "same seed must reproduce the same sample")
    val heavy = s1.count(_ < 1000)
    assert(heavy > 100 && heavy < 350,
      s"heavy=$heavy of 500 — expected ~180 (36%), far above the 10% share")
    // different seed -> different (but still deterministic) sample
    val s3 = graft.operators.Sampling.weightedTopK(df, "id", "wt", 500, seed = 7L)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(s3 != s1)
    // weight 0 = never sample (a naive sequence(0,-1) would give such
    // rows TWO draws and over-sample them)
    val withZeros = df.withColumn("wt", when($"id" >= 9000, 0).otherwise($"wt"))
    val s4 = graft.operators.Sampling.weightedTopK(withZeros, "id", "wt", 500)
      .select("id").collect().map(_.getLong(0))
    assert(s4.forall(_ < 9000), "zero-weight rows must never be sampled")
  }
}

class SkewSpec extends SparkSpec {
  test("salted join is row-identical to the plain join") {
    val li = Tables.load(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val ord = Tables.load(spark, sf, "orders").select("o_orderkey", "o_custkey")
    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(li, ord, "l_orderkey", "o_orderkey", 8)
      .groupBy("o_custkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }
}
