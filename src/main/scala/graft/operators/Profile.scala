package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, IntegerType, StringType}

/** One-pass dataset profiling — the "dataset card" primitive every
  * training-data pipeline publishes next to its corpus: per column,
  * row/null/distinct counts plus min/max, computed in a single
  * aggregate over one scan. The single pass is the SOURCE-AGNOSTIC
  * contract: this profiles arbitrary frames (a JDBC cursor, a derived
  * frame worth one materialization), where a rescan-per-column
  * strategy would re-run the upstream 100 times. The cost is the
  * multi-distinct Expand (n · (#cols+1) rows through the agg); when
  * the input IS a columnar table, per-column PRUNED scans read the
  * same bytes and shuffle far less — that shape is dq_profile
  * (measured 4× at 10× on orders), not this operator.
  *
  * Output is long-format (column, metric, value) with values rendered
  * as strings through exact integer/string paths only — no float
  * formatting, so the result is engine-portable (the repo's parity
  * discipline). Columns outside long/int/string are profiled for
  * counts but not extremes.
  */
object Profile {

  def profile(df: DataFrame): DataFrame = {
    val cols = df.schema.fields
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        count(c).as(s"${f.name}__nonnull"),
        countDistinct(c).as(s"${f.name}__distinct"))
      f.dataType match {
        case LongType | IntegerType | StringType =>
          base ++ Seq(min(c).cast("string").as(s"${f.name}__min"),
            max(c).cast("string").as(s"${f.name}__max"))
        case _ => base
      }
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    // long format via one stack over the single aggregated row
    val entries = cols.flatMap { f =>
      val metrics = Seq("nonnull", "distinct") ++ (f.dataType match {
        case LongType | IntegerType | StringType => Seq("min", "max")
        case _ => Seq.empty
      })
      metrics.map(m => (f.name, m))
    }
    val stacked = entries.map { case (c, m) =>
      struct(lit(c).as("column"), lit(m).as("metric"),
        col(s"${c}__$m").cast("string").as("value"))
    }
    row.select(col("__n"), explode(array(stacked: _*)).as("e"))
      .select(col("e.column").as("column"), col("e.metric").as("metric"),
        col("e.value").as("value"), col("__n").cast("long").as("n_rows"))
  }
}
