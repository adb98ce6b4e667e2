package graft.functions.catalyst

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable-sketch aggregates (DataSketches) as native
  * `TypedImperativeAggregate`s. The buffer is the live sketch object —
  * Spark's ObjectHashAggregate keeps it on-heap between updates and only
  * calls serialize/deserialize at the partial-aggregation exchange, so a
  * 100 TB scan ships a few-KB sketch per (group × task), never raw keys.
  * The serialized form is the sketch's own portable byte image, so
  * partials can be persisted (e.g. per day/source) and re-merged later
  * to ANY coarser grain without rescanning — the same re-aggregation
  * contract as `Sketches.hllPartial`/`hllMergeEstimate`.
  *
  * Aggregates are imperative by nature (no codegen path exists for
  * TypedImperativeAggregate); the per-row update is a hash-map probe.
  */
object SketchSerde {
  private[catalyst] val strings = new ArrayOfStringsSerDe

  def freqToBytes(sk: ItemsSketch[String]): Array[Byte] = sk.toByteArray(strings)
  def freqFromBytes(b: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(b), strings)
}

/** Frequent-items (heavy hitters) sketch of a string column.
  * `maxMapSize` (power of 2) bounds memory; while the number of distinct
  * items stays under ~0.75·maxMapSize the sketch is in exact mode and
  * every estimate equals the true count (merge included) — beyond that
  * it degrades to the Misra-Gries guarantee: error ≤ 3.5·n/maxMapSize,
  * no false negatives at the matching threshold.
  * Returns the serialized sketch (binary, mergeable).
  */
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] =
    buf.merge(other)

  override def eval(buf: ItemsSketch[String]): Any = serialize(buf)
  override def serialize(buf: ItemsSketch[String]): Array[Byte] = SketchSerde.freqToBytes(buf)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    SketchSerde.freqFromBytes(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch_agg"
  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqSketchAgg =
    copy(child = c)
}

/** Union of pre-built frequent-items sketches (binary column) — the
  * re-aggregation half: persisted per-partition partials roll up to any
  * grain without touching raw data.
  */
case class FreqSketchMerge(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.merge(SketchSerde.freqFromBytes(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] =
    buf.merge(other)

  override def eval(buf: ItemsSketch[String]): Any = serialize(buf)
  override def serialize(buf: ItemsSketch[String]): Array[Byte] = SketchSerde.freqToBytes(buf)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    SketchSerde.freqFromBytes(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch_merge"
  override def withNewMutableAggBufferOffset(o: Int): FreqSketchMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqSketchMerge =
    copy(child = c)
}

/** Top-k extraction from a serialized frequent-items sketch:
  * array<struct<item string, est bigint>> ordered by (est desc, item asc)
  * — the item tie-break makes the output deterministic, so in exact mode
  * it hash-matches an exact SQL `ORDER BY cnt DESC, item LIMIT k`.
  * Scalar post-processing of a one-row-per-group result — never on the
  * per-row hot path, so CodegenFallback costs nothing (the aggregates
  * above are interpreted anyway).
  */
case class FreqSketchTopK(child: Expression, k: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  override protected def nullSafeEval(v: Any): Any = {
    val sk = SketchSerde.freqFromBytes(v.asInstanceOf[Array[Byte]])
    // NO_FALSE_NEGATIVES: a superset of every item that could reach the
    // threshold; in exact mode simply all items with exact counts.
    val rows = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    val top: Array[Any] = rows.map(r => (r.getItem, r.getEstimate))
      .sortBy { case (item, est) => (-est, item) }
      .take(k)
      .map { case (item, est) =>
        InternalRow(UTF8String.fromString(item), est): Any
      }
    new GenericArrayData(top)
  }

  override def prettyName: String = "freq_sketch_topk"
  override protected def withNewChildInternal(c: Expression): FreqSketchTopK =
    copy(child = c)
}

/** KLL quantile sketch over a double column. k=200 gives ~1.65% max
  * normalized rank error (99% confidence); the sketch is a few KB and
  * merges without error amplification, so global percentiles over 100 TB
  * are a per-task sketch + one tiny exchange — no sort, no full shuffle.
  * Returns the serialized sketch (binary, mergeable).
  */
case class KllSketchAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_agg"
  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
}

/** Union of pre-built KLL sketches (binary column). */
case class KllSketchMerge(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.merge(KllDoublesSketch.heapify(
      Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_merge"
  override def withNewMutableAggBufferOffset(o: Int): KllSketchMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllSketchMerge =
    copy(child = c)
}

/** Quantiles at the given ranks from a serialized KLL sketch
  * (INCLUSIVE search: quantile q = smallest value whose inclusive rank
  * ≥ q, matching SQL percentile_disc). Empty sketch → null.
  */
case class KllQuantiles(child: Expression, ranks: Seq[Double])
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else new GenericArrayData(ranks.map(r => sk.getQuantile(r,
      org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE)).toArray)
  }

  override def prettyName: String = "kll_quantiles"
  override protected def withNewChildInternal(c: Expression): KllQuantiles =
    copy(child = c)
}
