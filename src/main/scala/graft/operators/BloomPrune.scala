package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

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
    */
  def buildFilter(build: DataFrame, keyCol: String,
      expectedItems: Long): Array[Byte] =
    build.select(Shim.column(
        new BloomFilterAggregate(
          new XxHash64(Seq(Shim.expression(col(keyCol)))), expectedItems)
          .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)

  /** Probe-side predicate: true iff `keyCol` may be present. */
  def mightContain(filter: Array[Byte], keyCol: Column): Column =
    Shim.column(BloomFilterMightContain(
      Literal(filter, BinaryType),
      new XxHash64(Seq(Shim.expression(keyCol)))))

  /** `probe` rows whose `probeKey` passes the build side's filter —
    * a superset of the semi-join, cheap enough to sit under the scan.
    */
  def prune(probe: DataFrame, probeKey: String,
      filter: Array[Byte]): DataFrame =
    probe.filter(mightContain(filter, col(probeKey)))

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
    val bf = buildFilter(build, buildKey, expectedItems)
    prune(probe, probeKey, bf)
      .join(build, col(probeKey) === build(buildKey))
  }
}
