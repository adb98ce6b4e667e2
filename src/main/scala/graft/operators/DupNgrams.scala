package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document duplicate-n-gram statistics (the Gopher-family
  * "fraction of text in duplicate n-grams" boilerplate signal; see
  * also queries/CorpusQueries5 for the oracle-gated entry).
  *
  * For each document: the number of its distinct n-gram shingles, how
  * many of those also occur in at least `minOtherDocs` other
  * documents, and the duplicate fraction.
  *
  * Scale shape: explode is row-local; the only keyed shuffles are the
  * per-(doc, shingle) distinct and the per-shingle doc count — both
  * keyed by the shingle (high cardinality, even spread); the flagged
  * set joins back semi-style. Never document pairs.
  *
  * `key` maps the shingle string to the grouping key. The default is
  * the identity (exact strings — oracle-comparable); at 100 TB pass
  * `xxhash64` so the shuffle carries 8-byte keys instead of n-token
  * strings — DupNgramsSpec proves the two paths produce identical
  * statistics (collisions aside, the same argument as
  * Contamination's hashed keying).
  */
object DupNgrams {

  def stats(docs: DataFrame, idCol: String, textCol: String, n: Int,
            minOtherDocs: Int,
            key: Column => Column = identity): DataFrame = {
    val id = col(idCol)
    val shingles = docs
      .select(id, split(col(textCol), " ").as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") >= n)
      .select(id, explode(sequence(lit(1), col("__n") - (n - 1))).as("__pos"),
        col("__toks"))
      .select(id,
        key(array_join(slice(col("__toks"), col("__pos"), lit(n)), " "))
          .as("__shingle"))
    val perDocDistinct = shingles.distinct()
    val common = perDocDistinct.groupBy(col("__shingle"))
      .agg(countDistinct(id).as("__ndocs"))
      .filter(col("__ndocs") >= minOtherDocs + 1)
      .select(col("__shingle"))
    val flagged = perDocDistinct.join(common, Seq("__shingle"), "left_semi")
      .groupBy(id).agg(count(lit(1)).as("__ncommon"))
    docs.select(id,
        greatest(size(split(col(textCol), " ")) - (n - 1), lit(0))
          .cast("long").as("n_shingles"))
      .join(flagged, Seq(idCol), "left")
      .select(id, col("n_shingles"),
        coalesce(col("__ncommon"), lit(0L)).as("n_common"),
        when(col("n_shingles") === 0, lit(0.0))
          .otherwise(coalesce(col("__ncommon"), lit(0L)).cast("double") /
            col("n_shingles").cast("double")).as("dup_frac"))
  }
}
