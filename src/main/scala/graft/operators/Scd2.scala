package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD type-2 dimension building (q94_scd2 / q95_scd2_lookup /
  * streaming.StreamingOps.scd2Maintained share this core).
  *
  * [[runs]] collapses each user's time-ordered event stream into
  * versioned rows: one row per run of equal `event_type`, with
  * [valid_from_us, valid_to_us) epoch-micros intervals and the live
  * run open-ended (NULL valid_to_us).
  *
  * [[mergeFold]] maintains that table INCREMENTALLY: fold a new batch
  * of events into an existing dimension state without recomputing
  * history. Contract: per user, batch events arrive at-or-after every
  * previously folded event (in-order arrival — the same assumption a
  * watermarked append stream makes). The fold closes the open version
  * when the batch opens a different run, extends it when the batch
  * continues the same run, and renumbers batch runs after the user's
  * prior version counter. Closed prior versions are immutable, so the
  * per-batch work is O(batch + affected users), never O(history).
  */
object Scd2 {

  def runs(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"), col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    ev.withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to_us", lead(col("us"), 1).over(w))
      .select(col("user_id"), col("event_type"), col("version"),
        col("us").as("valid_from_us"), col("valid_to_us"))
  }

  def mergeFold(prev: Option[DataFrame], batchEvents: DataFrame): DataFrame = {
    val r = runs(batchEvents)
    prev match {
      case None => r
      case Some(st) =>
        val bu = r.select(col("user_id")).distinct()
        val untouched = st.join(bu, Seq("user_id"), "left_anti")
        val priorB = st.join(bu, Seq("user_id"), "left_semi")
        val open = priorB.filter(col("valid_to_us").isNull)
          .select(col("user_id"), col("event_type").as("o_type"),
            col("version").as("o_ver"), col("valid_from_us").as("o_from"))
        val closedPrior = priorB.filter(col("valid_to_us").isNotNull)
        val run1 = r.filter(col("version") === 1)
          .select(col("user_id"), col("event_type").as("f_type"),
            col("valid_from_us").as("f_from"), col("valid_to_us").as("f_to"))
        // per-user decision row; open may be absent (user new this batch)
        val dec = run1.join(open, Seq("user_id"), "left")
          .withColumn("has_open", col("o_ver").isNotNull)
          .withColumn("merged", col("has_open") && col("o_type") === col("f_type"))
          .withColumn("offset", when(!col("has_open"), lit(0L))
            .when(col("merged"), col("o_ver") - 1)
            .otherwise(col("o_ver")))
        // the user's open row, rewritten: absorbed (same type — its end
        // becomes the batch run-1's end, which is NULL when the batch
        // doesn't change type again) or closed at the batch's first event
        // runtime guard on the in-order contract: a batch whose first
        // event precedes a user's open valid_from_us would silently mint
        // an overlapping/negative interval and the streaming sink would
        // persist it as authoritative state — fail the job instead.
        // assert_true returns NULL when the predicate holds (one integer
        // compare per affected user) and throws with the message when
        // violated; gating valid_to_us on it keeps Catalyst from pruning
        // the check away.
        val openRows = dec.filter(col("has_open")).select(
          col("user_id"), col("o_type").as("event_type"),
          col("o_ver").as("version"), col("o_from").as("valid_from_us"),
          when(expr("assert_true(f_from >= o_from, " +
              "'Scd2.mergeFold: out-of-order batch — an event precedes " +
              "the open version valid_from_us (in-order-per-user " +
              "contract, see scaladoc)')").isNull,
            when(col("merged"), col("f_to")).otherwise(col("f_from")))
            .as("valid_to_us"))
        // batch runs renumbered after the prior counter; run 1 vanishes
        // into the open row when absorbed
        val batchRows = r
          .join(dec.select(col("user_id"), col("merged"), col("offset")),
            Seq("user_id"))
          .filter(!(col("merged") && col("version") === 1))
          .select(col("user_id"), col("event_type"),
            (col("version") + col("offset")).as("version"),
            col("valid_from_us"), col("valid_to_us"))
        untouched.unionByName(closedPrior)
          .unionByName(openRows).unionByName(batchRows)
    }
  }
}
