package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document duplicate SPAN removal — the substring-level dedup of
  * "Deduplicating Training Data Makes Language Models Better" (Lee et
  * al., 2022), re-expressed relationally: instead of a suffix array
  * over the concatenated corpus, every word n-gram occurrence is a row,
  * an n-gram repeated across >= `minDocs` distinct documents marks all
  * tokens it covers, and marked tokens are dropped from the rebuilt
  * text. Removes boilerplate/license blocks that exact- and
  * near-dedup (whole-document granularity) cannot touch.
  *
  * Scale shape — every stage is linear in total tokens:
  *   - n-gram occurrence table: O(tokens) rows (explode, no shuffle);
  *   - duplicated-gram set: one groupBy(gram).countDistinct(doc) —
  *     Catalyst expands it to a two-stage (gram, doc) partial-distinct
  *     collapse, so the exchange carries O(distinct occurrences);
  *   - cover marks: semi-join occurrences to the duplicated set (AQE
  *     broadcasts it when small), explode n positions per hit;
  *   - rebuild: anti-join tokens against marks, per-doc ordered
  *     reassembly (state bounded by document length, like Packing).
  * No pair of documents is ever compared directly — cost tracks corpus
  * size, not corpus-squared.
  */
object SpanDedup {

  /** Rebuild `textCol` with every token covered by a cross-document
    * duplicated `n`-gram removed. Returns one row per input document:
    * (idCol, clean_text, n_total, n_kept, n_removed). Documents shorter
    * than `n` tokens pass through unchanged; fully-duplicated documents
    * come back with empty clean_text.
    */
  def removeDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDocs: Int = 2): DataFrame = {
    require(n >= 1 && minDocs >= 2, s"need n>=1, minDocs>=2; got $n, $minDocs")
    // the tokenized frame feeds three consumers (occurrences, token
    // table, per-doc totals): persist it for the caller's action, same
    // contract as the LSH signature frames in Dedup — released by
    // spark.catalog.clearCache() between queries, not eagerly here
    // (an eager unpersist would re-run the split for every consumer)
    val base = Parallelism.ensure(docs)
      .select(col(idCol).as("__id"), split(col(textCol), " ").as("__ws"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // (doc, start, gram) occurrence table; sequence() descends for
      // negative spans, so short docs are filtered out first
      val occ = base.filter(size(col("__ws")) >= n)
        .select(col("__id"), explode(expr(
          s"transform(sequence(0, size(__ws) - $n), " +
            s"i -> struct(i AS start, array_join(slice(__ws, i + 1, $n), ' ') AS ng))"))
          .as("g"))
        .select(col("__id"), col("g.start").as("__start"), col("g.ng").as("__ng"))
      val dup = occ.groupBy(col("__ng"))
        .agg(countDistinct(col("__id")).as("__nd"))
        .filter(col("__nd") >= minDocs)
        .select(col("__ng"))
      val covered = occ.join(dup, "__ng")
        .select(col("__id"),
          explode(expr(s"sequence(__start, __start + ${n - 1})")).as("__pos"))
        .distinct()
      val toks = base.select(col("__id"),
        posexplode(col("__ws")).as(Seq("__pos", "__tok")))
      val kept = toks.join(covered, Seq("__id", "__pos"), "left_anti")
        .groupBy(col("__id"))
        .agg(count(lit(1)).as("n_kept"),
          array_join(expr("transform(array_sort(collect_list(" +
            "struct(__pos, __tok))), r -> r.__tok)"), " ").as("clean_text"))
      // left join keeps fully-duplicated documents (zero kept tokens)
      base.select(col("__id"), size(col("__ws")).cast("long").as("n_total"))
        .join(kept, Seq("__id"), "left")
        .select(col("__id").as(idCol),
          coalesce(col("clean_text"), lit("")).as("clean_text"),
          col("n_total"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          (col("n_total") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** The Lee et al. 2022 EXACT-SUBSTRING rule proper: remove only
    * MAXIMAL duplicated runs of at least `minRun` tokens, instead of
    * every covered token. [[removeDuplicateSpans]] marks each token
    * covered by any cross-document duplicated n-gram — but the paper's
    * standard removes merged maximal duplicated substrings over a
    * length threshold (~50 tokens), so incidental short phrase overlap
    * survives and only genuinely copied passages (boilerplate blocks,
    * licence headers, quoted articles) are cut. Covered positions
    * coalesce into maximal runs with the gaps-and-islands key
    * (pos − row_number over the per-doc position order — q56's idiom;
    * adjacent covered positions share a constant key), runs gate on
    * `count >= minRun`, and only gated runs' tokens drop from the
    * rebuilt text.
    *
    * Scale shape: identical to removeDuplicateSpans plus one per-doc
    * window over COVERED positions only (high-cardinality partition
    * key — no low-card window cliff) and one (doc, run)-keyed
    * partial-agg count. Returns one row per input document:
    * (idCol, clean_text, n_total, n_kept, n_removed, n_runs_removed,
    * max_run) — the last two are the audit columns an operator reads
    * to tune the threshold.
    */
  def removeDuplicateRuns(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5, minDocs: Int = 2, minRun: Int = 50): DataFrame = {
    require(n >= 1 && minDocs >= 2 && minRun >= n,
      s"need n>=1, minDocs>=2, minRun>=n; got $n, $minDocs, $minRun")
    val base = Parallelism.ensure(docs)
      .select(col(idCol).as("__id"), split(col(textCol), " ").as("__ws"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val occ = base.filter(size(col("__ws")) >= n)
      .select(col("__id"), explode(expr(
        s"transform(sequence(0, size(__ws) - $n), " +
          s"i -> struct(i AS start, array_join(slice(__ws, i + 1, $n), ' ') AS ng))"))
        .as("g"))
      .select(col("__id"), col("g.start").as("__start"), col("g.ng").as("__ng"))
    val dup = occ.groupBy(col("__ng"))
      .agg(countDistinct(col("__id")).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("__ng"))
    val covered = occ.join(dup, "__ng")
      .select(col("__id"),
        explode(expr(s"sequence(__start, __start + ${n - 1})")).as("__pos"))
      .distinct()
    // maximal runs: adjacent covered positions share (pos - rn); the
    // per-doc window runs over covered positions only
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__id")).orderBy(col("__pos"))
    // runs is consumed twice (the gate rollup + the removal join):
    // persist it, or the whole covered-position pipeline — the n-gram
    // explode, the dup groupBy, the cover join + distinct and the
    // per-doc window — recomputes for the second consumer
    val runs = covered
      .withColumn("__rk", col("__pos") - row_number().over(w))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // gated is itself read twice (threshold filter + the audit rollup)
    val gated = runs.groupBy(col("__id"), col("__rk"))
      .agg(count(lit(1)).as("__len"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val longRuns = gated.filter(col("__len") >= minRun)
    val removed = runs.join(longRuns.select(col("__id"), col("__rk")),
      Seq("__id", "__rk"))
    val toks = base.select(col("__id"),
      posexplode(col("__ws")).as(Seq("__pos", "__tok")))
    val kept = toks
      .join(removed.select(col("__id"), col("__pos")),
        Seq("__id", "__pos"), "left_anti")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(expr("transform(array_sort(collect_list(" +
          "struct(__pos, __tok))), r -> r.__tok)"), " ").as("clean_text"))
    val audit = gated.groupBy(col("__id"))
      .agg(sum(when(col("__len") >= minRun, 1L).otherwise(0L))
          .as("n_runs_removed"),
        max(col("__len")).as("max_run"))
    base.select(col("__id"), size(col("__ws")).cast("long").as("n_total"))
      .join(kept, Seq("__id"), "left")
      .join(audit, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_total") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("n_runs_removed"), lit(0L)).as("n_runs_removed"),
        coalesce(col("max_run"), lit(0L)).as("max_run"))
  }

  /** LINE-level exact dedup — C4/CCNet's other granularity (round 16,
    * VERDICT r13 task 6): every distinct line keeps only its FIRST
    * occurrence in (doc id, line position) order across the whole
    * corpus; all later occurrences are removed and each document's
    * text is rebuilt from its surviving lines in order. This is the
    * boilerplate killer for headers/footers/navigation chrome that
    * repeats verbatim across pages where n-gram spans are overkill.
    *
    * Scale shape — linear in total lines, no document pair ever
    * compared: one groupBy(line) with a map-side partial min(struct)
    * picks each line's first occurrence, one line-keyed join flags
    * occurrences, one per-doc groupBy rebuilds (state bounded by
    * document length). The shuffle key is the line STRING (exactly the
    * oracle's grouping — no hash-collision caveat); at 100 TB the
    * per-line payload stays bounded by line width.
    *
    * Returns one row per document:
    * (doc_id, clean_text, n_lines, n_kept, n_removed).
    */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String,
      delim: String = "\n"): DataFrame = {
    val occ = lineOcc(docs, idCol, textCol, delim)
    dedupFromOwners(occ, lineOwners(occ), delim)
  }

  /** (doc_id, pos, line) occurrence rows — the exploded line table
    * [[dedupLines]], [[lineOwners]] and the streaming fold's reader
    * all derive from (one shared definition so the batch operator and
    * [[graft.streaming.StreamingOps.lineOwnersMaintained]] can never
    * disagree on what a "line" is).
    */
  def lineOcc(docs: DataFrame, idCol: String, textCol: String,
      delim: String = "\n"): DataFrame = {
    val quoted = java.util.regex.Pattern.quote(delim)
    Parallelism.ensure(docs)
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), quoted)).as(Seq("pos", "line")))
  }

  /** First-occurrence owner per distinct line: `(line, f)` with
    * f = min(struct(doc_id, pos)). min over the struct is IDEMPOTENT
    * and COMMUTATIVE, so owners over any partition of the corpus merge
    * by re-grouping — the arithmetic split-invariance class (like the
    * bitmap fold, no arrival-order contract), which is exactly what
    * makes the streaming owner state a sound fold.
    */
  def lineOwners(occ: DataFrame): DataFrame =
    occ.groupBy(col("line"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("f"))

  /** Rebuild per-document survivors against an OWNER table (from
    * [[lineOwners]] over the same corpus, or a streamed owner state
    * covering it): an occurrence survives iff it IS its line's first
    * occurrence. Returns (doc_id, clean_text, n_lines, n_kept,
    * n_removed) — [[dedupLines]]'s contract.
    */
  def dedupFromOwners(occ: DataFrame, owners: DataFrame,
      delim: String = "\n"): DataFrame =
    occ.join(owners, "line")
      .select(col("doc_id"), col("pos"), col("line"),
        (col("doc_id") === col("f.doc_id") &&
          col("pos") === col("f.pos")).as("keep"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        // collect_list skips the nulls the when() leaves for removed
        // lines; struct sort restores document order
        array_join(transform(array_sort(
            collect_list(when(col("keep"),
              struct(col("pos"), col("line"))))),
          x => x.getField("line")), delim).as("clean_text"))
      .select(col("doc_id"), col("clean_text"), col("n_lines"),
        col("n_kept"), (col("n_lines") - col("n_kept")).as("n_removed"))
}
