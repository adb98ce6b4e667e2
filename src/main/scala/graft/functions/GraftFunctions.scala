package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim
import graft.functions.catalyst._

/** Column-level function surface of the engine (SURVEY.md §2.5/§2.8).
  * Prefer built-in `functions._` compositions (whole-stage codegen'd);
  * the custom kernels are native Catalyst expressions with `doGenCode`,
  * never Scala UDFs.
  */
object GraftFunctions {

  // ---- native expression wrappers ---------------------------------------
  def poly_hash(c: Column, base: Int = 31, mod: Long = GraftHash.FP): Column =
    Shim.column(PolyHash(Shim.expression(c), base, mod))
  def simhash60(tokens: Column): Column =
    Shim.column(SimHash60(Shim.expression(tokens)))
  def minhash_sig(set: Column, numHashes: Int): Column =
    Shim.column(MinHashSig(Shim.expression(set), numHashes))
  def minhash_sig_text(text: Column, mode: String, n: Int, numHashes: Int): Column =
    Shim.column(MinHashSigText(Shim.expression(text), mode, n, numHashes))
  def minhash_bands(sig: Column, bands: Int): Column =
    Shim.column(MinHashBands(Shim.expression(sig), bands))
  def cosine_sim(a: Column, b: Column): Column =
    Shim.column(CosineSim(Shim.expression(a), Shim.expression(b)))
  /** Exact integer squared-L2 of two BIGINT arrays (codegen'd — the
    * HOF zip_with form runs interpreted and allocates per row). */
  def sq_dist(a: Column, b: Column): Column =
    Shim.column(SqDistLong(Shim.expression(a), Shim.expression(b)))
  def sign_lsh_buckets(vec: Column, bands: Int, rowsPerBand: Int): Column =
    Shim.column(SignLshBuckets(Shim.expression(vec), bands, rowsPerBand))
  /** Hamming distance of two 64-bit hashes (built-in composition). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
  /** Content-defined chunk keys: packed (hash<<31 | len) per chunk. */
  def cdc_chunks(text: Column, w: Int = 16, mask: Int = 64): Column =
    Shim.column(CdcChunks(Shim.expression(text), w, mask))

  // ---- mergeable sketch aggregates (DataSketches) ------------------------
  /** Frequent-items sketch of a string column (binary, mergeable). */
  def freq_sketch_agg(c: Column, maxMapSize: Int = 1024): Column =
    Shim.column(FreqSketchAgg(Shim.expression(c), maxMapSize).toAggregateExpression())
  /** Union pre-built frequent-items sketches (re-aggregation path). */
  def freq_sketch_merge(c: Column, maxMapSize: Int = 1024): Column =
    Shim.column(FreqSketchMerge(Shim.expression(c), maxMapSize).toAggregateExpression())
  /** Top-k (item, est) rows from a serialized frequent-items sketch. */
  def freq_sketch_topk(c: Column, k: Int): Column =
    Shim.column(FreqSketchTopK(Shim.expression(c), k))
  /** KLL quantile sketch of a double column (binary, mergeable). */
  def kll_sketch_agg(c: Column, k: Int = 200): Column =
    Shim.column(KllSketchAgg(Shim.expression(c), k).toAggregateExpression())
  /** Union pre-built KLL sketches (re-aggregation path). */
  def kll_sketch_merge(c: Column, k: Int = 200): Column =
    Shim.column(KllSketchMerge(Shim.expression(c), k).toAggregateExpression())
  /** Quantiles at the given ranks from a serialized KLL sketch. */
  def kll_quantiles(c: Column, ranks: Seq[Double]): Column =
    Shim.column(KllQuantiles(Shim.expression(c), ranks))
  // Theta sketches (distinct-count set algebra: union/intersect/a-not-b)
  // are Spark 4.1 built-ins — use org.apache.spark.sql.functions.theta_*
  // directly (theta_sketch_agg/theta_union_agg take lg(nominalEntries)).

  /** Register SQL-callable names (usable inside lambda HOFs too). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_poly_hash",
      es => PolyHash(es.head, 31, GraftHash.FP), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash60",
      es => SimHash60(es.head), "built-in")
    reg.createOrReplaceTempFunction("graft_cosine",
      es => CosineSim(es.head, es(1)), "built-in")
  }

  // ---- text analysis ----------------------------------------------------
  /** Whitespace tokens. Single-space separated corpus; literal split. */
  def words(text: Column): Column = split(text, " ")

  /** Token count by separator arithmetic — portable to any SQL engine:
    * len(text) - len(replace(text,' ','')) + 1.
    */
  def token_count(text: Column): Column =
    length(text) - length(regexp_replace(text, " ", "")) + lit(1)

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * non-space symbols.
    */
  def bpe_token_count(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0)))

  def count_in_set(tokens: Column, set: Seq[String]): Column =
    size(filter(tokens, t => t.isin(set.map(lit(_)): _*)))

  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "it")

  def stopword_count(text: Column): Column = count_in_set(words(text), stopwords)

  def punct_count(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?]", ""))

  /** Per-language marker-word profiles for the langid heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "en" -> Seq("the", "a", "is", "of", "and", "to"),
    "es" -> Seq("el", "la", "los", "de", "que", "y"),
    "fr" -> Seq("le", "les", "des", "et", "une", "est"),
    "zh" -> Seq("的", "是", "在", "了", "我"))

  /** Language scores + deterministic argmax (ties -> alphabetical first). */
  def lang_scores(text: Column): Seq[(String, Column)] =
    langMarkers.map { case (l, ms) => l -> count_in_set(words(text), ms) }

  /** CASE-chain argmax in list order (first language wins ties) — mirrors
    * the oracle's CASE WHEN s_de >= s_en AND ... chain exactly.
    */
  def lang_predict(scores: Seq[(String, Column)]): Column = {
    val cols = scores.map(_._2)
    scores.zipWithIndex.foldRight(lit("und")) { case (((l, c), i), els) =>
      val isMax = cols.zipWithIndex
        .filter(_._2 != i)
        .map { case (o, _) => c >= o }
        .reduce(_ && _)
      when(isMax, lit(l)).otherwise(els)
    }
  }

  /** Winnowing-style min fingerprint over all `win`-char windows. Needs
    * graft functions registered (uses SQL lambda with graft_poly_hash).
    */
  def min_window_fingerprint(text: Column, win: Int = 16): Column =
    array_min(transform(
      sequence(lit(1), greatest(length(text) - (win - 1), lit(1))),
      i => Shim.column(PolyHash(Shim.expression(substring_from(text, i, win)), 31, GraftHash.FP))))

  private def substring_from(text: Column, pos: Column, len: Int): Column =
    text.substr(pos, lit(len))

  // ---- tokenizers for dedup ---------------------------------------------
  /** Distinct word `n`-gram shingles joined by spaces; empty if < n words. */
  def word_shingles(text: Column, n: Int): Column = {
    val w = words(text)
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k + 1)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** ALL word `n`-grams in order, duplicates kept (the frequency-table
    * tokenizer, vs `word_shingles`' distinct set); empty below n words.
    * Single-space tokenization to match the corpus oracles.
    */
  def word_ngrams_all(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Distinct character `n`-grams; empty if text shorter than n. */
  def char_ngrams(text: Column, n: Int): Column =
    when(length(text) >= n,
      array_distinct(transform(sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))
}
