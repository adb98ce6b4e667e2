package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The cross-snapshot dedup contract (round 13): the
  * minhashDedupFold split-equivalence extended ACROSS the
  * batch/snapshot boundary — prior state folded from crawl N,
  * persisted to parquet and reloaded (the operational "pinned
  * already-deduped corpus"), then crawl N+1 folded against it, equals
  * one batch fold over everything. Also pins the incremental scale
  * shape: the new crawl's probe broadcasts the BATCH side, so the
  * reloaded history streams through without re-pairing.
  */
class CrossSnapshotSpec extends SparkSpec {

  private def canon(df: DataFrame) =
    df.select(col("id"), col("is_dup"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1).toSeq

  test("fold(old) persisted + batch(new) == batch(old ∪ new)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xsnap").toString
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val mid = docs.agg(expr("(min(doc_id) + max(doc_id)) DIV 2"))
      .head().getLong(0)
    // crawl N: fold once, pin as the prior snapshot (parquet
    // round-trip — the state schema contract: id, sig, is_dup)
    Dedup.minhashDedupFold(None, docs.filter(col("doc_id") <= mid),
        "doc_id", "text")
      .write.parquet(s"$dir/prior")
    val prior = spark.read.parquet(s"$dir/prior")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // crawl N+1 against the reloaded snapshot
    val incremental = Dedup.minhashDedupFold(Some(prior),
      docs.filter(col("doc_id") > mid), "doc_id", "text")
    val oneShot = Dedup.minhashDedupFold(None, docs, "doc_id", "text")
    assert(canon(incremental) === canon(oneShot))
    // the old corpus never re-pairs: the band probe broadcasts the
    // batch side over the reloaded history (the fold's committed plan)
    val p = Dedup.minhashDedupFold(Some(prior),
        docs.filter(col("doc_id") > mid), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "the snapshot probe must broadcast the new-crawl side")
    assert(!p.contains("SortMergeJoin"),
      "pinned history must stream through without a sort-merge exchange")
    GraftSession.release(spark)
  }

  test("semantic fold(old) persisted + batch(new) == batch(old ∪ new)") {
    import org.apache.spark.sql.functions.expr
    val dir = java.nio.file.Files.createTempDirectory("graft_xsnap_s").toString
    val emb = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val k = math.ceil(math.sqrt(emb.count().toDouble)).toLong
    val cen = Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") < k)
      .select(col("vec_id").cast("long").as("cid"), col("embedding").as("cv"))
    val mid = emb.agg(expr("(min(vec_id) + max(vec_id)) DIV 2"))
      .head().getLong(0)
    Dedup.semanticDedupFold(None, emb.filter(col("vec_id") <= mid),
        "vec_id", "embedding", cen, 0.4)
      .write.parquet(s"$dir/prior")
    val prior = spark.read.parquet(s"$dir/prior")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val incremental = Dedup.semanticDedupFold(Some(prior),
      emb.filter(col("vec_id") > mid), "vec_id", "embedding", cen, 0.4)
    val oneShot = Dedup.semanticDedupFold(None, emb,
      "vec_id", "embedding", cen, 0.4)
    assert(canon(incremental) === canon(oneShot))
    GraftSession.release(spark)
  }
}
