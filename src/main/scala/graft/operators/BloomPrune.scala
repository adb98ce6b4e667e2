package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.catalyst.analysis.TypeCoercion
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Explicit Bloom-filter semi-join pruning — the "pre-shuffle filter"
  * for selective fact⋈dim joins at scale. Spark 4's own runtime filter
  * injection (InjectRuntimeFilter) does this automatically only inside
  * one query and only when its cost heuristics fire; this operator
  * makes the pattern a first-class, REUSABLE artifact: build the
  * compact filter once from the build side's join keys (a few MB for
  * hundreds of millions of keys at 1% fpp), then apply it to any
  * number of probe-side scans — the overwhelming majority of
  * non-matching fact rows die at the scan, before the shuffle that
  * would otherwise carry them.
  *
  * Exactness: might-contain admits false positives only, so pruning is
  * a superset prefilter — the exact join that follows removes them.
  * Results are bit-identical to the unpruned join.
  *
  * Uses Spark's native BloomFilterAggregate / BloomFilterMightContain
  * expressions (codegen'd probe; the same machinery InjectRuntimeFilter
  * plants), keyed on xxhash64 of the join key.
  */
object BloomPrune {

  /** Serialized Bloom filter of `keyCol`, sized for `expectedItems`.
    * One compact binary — persist it to re-prune future scans without
    * recomputing (e.g. nightly fact loads against a stable dim).
    * `hashType`: the type keys are cast to before hashing — build and
    * probe MUST use the same one or differently-typed-but-equal keys
    * (int 5 vs bigint 5) hash apart and matches are silently dropped.
    */
  def buildFilter(build: DataFrame, keyCol: String,
      expectedItems: Long, hashType: Option[DataType] = None): Array[Byte] =
    build.select(Shim.column(
        new BloomFilterAggregate(
          new XxHash64(Seq(Shim.expression(castTo(col(keyCol), hashType)))),
          expectedItems)
          .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)

  /** Probe-side predicate: true iff `keyCol` may be present. Pass the
    * same `hashType` the filter was built with.
    */
  def mightContain(filter: Array[Byte], keyCol: Column,
      hashType: Option[DataType] = None): Column =
    Shim.column(BloomFilterMightContain(
      Literal(filter, BinaryType),
      new XxHash64(Seq(Shim.expression(castTo(keyCol, hashType))))))

  private def castTo(c: Column, t: Option[DataType]): Column =
    t.fold(c)(c.cast)

  /** The type the equi-join itself would compare under — both sides are
    * cast to it before hashing, so the filter agrees with the join on
    * which keys are equal. Refuses pairs with no common type.
    */
  private[operators] def commonKeyType(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String): Option[DataType] = {
    val (pt, bt) = (probe.schema(probeKey).dataType, build.schema(buildKey).dataType)
    if (pt == bt) None
    else Some(TypeCoercion.findTightestCommonType(pt, bt).getOrElse(
      throw new IllegalArgumentException(
        s"no common key type for $probeKey: $pt vs $buildKey: $bt")))
  }

  /** `probe` rows whose `probeKey` passes the build side's filter —
    * a superset of the semi-join, cheap enough to sit under the scan.
    */
  def prune(probe: DataFrame, probeKey: String, filter: Array[Byte],
      hashType: Option[DataType] = None): DataFrame =
    probe.filter(mightContain(filter, col(probeKey), hashType))

  /** Equi-join with Bloom pre-pruning of the probe side: identical rows
    * to `probe.join(build, keys)`, but non-matching probe rows are
    * dropped at the scan instead of surviving to the join shuffle.
    * `expectedItems` sizes the filter (~1.2 bytes/key at 3% fpp — pass
    * the build side's distinct-key estimate; oversizing only costs
    * memory, undersizing only raises fpp, never correctness).
    */
  def prunedEquiJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      expectedItems: Long): DataFrame = {
    val t = commonKeyType(probe, probeKey, build, buildKey)
    val bf = buildFilter(build, buildKey, expectedItems, t)
    val pruned = prune(probe, probeKey, bf, t)
    pruned.join(build, pruned(probeKey) === build(buildKey))
  }
}
