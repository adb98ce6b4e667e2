package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** 2-D Pareto frontier (skyline): the rows not strictly dominated by
  * any other row, where row B dominates row A iff `x_B >= x_A`,
  * `y_B >= y_A` and at least one inequality is strict (both dimensions
  * maximized; negate a column to minimize it).
  *
  * Scale shape: the naive formulation is an all-pairs NOT EXISTS
  * (quadratic — dead at 100 TB), and the classic sort-based scan
  * (`max(y) OVER (ORDER BY x DESC)`) is a single global window task.
  * Instead:
  *
  *   1. group by x, keep `max(y)` — one shuffle with map-side partial
  *      aggregation; a point survives only if its y equals its x-group
  *      maximum (anything lower is dominated within the group);
  *   2. exclusive prefix-max of the group maxima under descending x:
  *      range repartition + per-partition maxima (O(partitions) values
  *      to the driver, same ladder as [[Packing]]/[[GlobalIndex]]) and
  *      a per-partition rescan with the seeded running max — fully
  *      parallel, no global window;
  *   3. an x-group is on the frontier iff its `max(y)` strictly
  *      exceeds the prefix max over all strictly-greater x (a tie
  *      means some higher-x point dominates it);
  *   4. join the surviving (x, ymax) pairs back to the input — the
  *      frontier of n random points is tiny (expected O(log n) for
  *      independent dims), so AQE turns this into a broadcast join at
  *      runtime.
  *
  * Duplicate points (same x and y) are NOT strictly dominated by each
  * other: all copies survive together, matching the NOT-EXISTS oracle.
  */
object Skyline {

  /** Frontier rows of `rawDf` maximizing (`xCol`, `yCol`). Both
    * columns must be non-null and of an integral, decimal or string
    * type with exact ordering (no doubles — cross-engine NaN/-0.0
    * ordering is not worth the hazard in an exact operator).
    */
  def pareto2D(rawDf: DataFrame, xCol: String, yCol: String): DataFrame = {
    val df = Parallelism.ensure(rawDf)
    val grouped = df.groupBy(col(xCol)).agg(max(col(yCol)).as("__ymax"))
    val parts = math.max(grouped.rdd.getNumPartitions, 1)
    val ranged = grouped
      .repartitionByRange(parts, col(xCol).desc)
      .sortWithinPartitions(col(xCol).desc)
    val yIdx = ranged.schema.fieldIndex("__ymax")
    val yOrd = orderingFor(ranged.schema(yIdx).dataType)
    val rrdd = ranged.rdd
    // per-partition maxima: O(partitions) values on the driver, then an
    // exclusive scan seeds each partition with the max of everything in
    // strictly-earlier (higher-x) partitions
    val partMax: Array[Option[Any]] = rrdd.mapPartitionsWithIndex { case (pid, it) =>
      val m = it.map(_.get(yIdx)).reduceOption((a, b) => yOrd.max(a, b))
      Iterator.single(pid -> m)
    }.collect().sortBy(_._1).map(_._2)
    val seeds: Array[Option[Any]] = partMax.scanLeft(Option.empty[Any]) {
      case (acc, m) => (acc ++ m).reduceOption((a, b) => yOrd.max(a, b))
    }.dropRight(1)
    val schema = StructType(ranged.schema.fields.toSeq :+
      StructField("__on_frontier", BooleanType, nullable = false))
    val flagged = rrdd.mapPartitionsWithIndex { case (pid, it) =>
      var run: Option[Any] = seeds(pid)
      it.map { r =>
        val y = r.get(yIdx)
        // strict: a tie with any higher-x group max means dominated
        val on = run.forall(m => yOrd.gt(y, m))
        run = Some(run.fold(y)(m => yOrd.max(m, y)))
        Row.fromSeq(r.toSeq :+ on)
      }
    }
    val frontierKeys = ranged.sparkSession.createDataFrame(flagged, schema)
      .filter(col("__on_frontier"))
      .select(col(xCol), col("__ymax"))
    df.join(frontierKeys,
        df(xCol) === frontierKeys(xCol) && df(yCol) === frontierKeys("__ymax"))
      .select(df.columns.map(df(_)).toSeq: _*)
  }

  private def orderingFor(dt: DataType): Ordering[Any] = dt match {
    case IntegerType => Ordering.Int.on[Any](_.asInstanceOf[Int])
    case LongType => Ordering.Long.on[Any](_.asInstanceOf[Long])
    case ShortType => Ordering.Short.on[Any](_.asInstanceOf[Short])
    case StringType => Ordering.String.on[Any](_.asInstanceOf[String])
    case DateType => Ordering.by[Any, Long](_.asInstanceOf[java.sql.Date].getTime)
    case _: DecimalType => new Ordering[Any] {
      def compare(a: Any, b: Any): Int =
        a.asInstanceOf[java.math.BigDecimal]
          .compareTo(b.asInstanceOf[java.math.BigDecimal])
    }
    case other => sys.error(
      s"Skyline.pareto2D: unsupported y type $other (exact-ordering types only)")
  }
}
