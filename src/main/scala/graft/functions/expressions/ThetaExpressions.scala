package graft.functions.expressions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta-sketch aggregates (DataSketches) — the SET-ALGEBRA sketch next to
  * the HLL/KLL/CMS trio. HLL answers only |A| and |A∪B|; a theta sketch
  * keeps a bounded sample of element hashes, so INTERSECTION (|A∩B| —
  * "how many users returned this week", "how much does corpus A overlap
  * corpus B") and DIFFERENCE (|A\B| — "how many are new") are answerable
  * from the persisted per-partition sketches alone, never by re-scanning
  * or joining the data.
  *
  * Both aggregates are [[TypedImperativeAggregate]]s (Spark's own shape
  * for its DataSketches HLL functions): the buffer is a live theta
  * [[Union]] held in memory, serialized to the compact sketch image ONLY
  * at shuffle boundaries — per-row cost is one hash probe, never a
  * serialize/deserialize. Theta set operations are order-insensitive (the
  * result retains exactly the hash set below min(θ), whatever the update
  * or merge order), so partial aggregation is lossless: re-aggregated
  * partials are byte-identical to a one-shot sketch over the same rows —
  * the property the spec pins.
  *
  * Accuracy contract: a sketch stays EXACT until its retained set exceeds
  * the nominal 2^lgK entries (estimates of smaller sets are the true
  * distinct counts); beyond that, relative standard error is
  * ~1/sqrt(2^lgK). The default lgK=16 keeps the fixture feeds (and any
  * group with < 65 K distinct keys) in the exact regime — which is what
  * lets the catalog entry sit under the DuckDB oracle — while a 100 TB
  * group degrades gracefully to ±0.4% error at 512 KB per sketch.
  */
final case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] {

  require(lgK >= 4 && lgK <= 26, s"lgK must be in [4, 26] (got $lgK)")

  // TypeCollection/AbstractDataType are private[sql] in Spark 4, so the
  // input gate is a manual checkInputDataTypes instead of ExpectsInputTypes
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | StringType | DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"theta_sketch_agg requires a long/int/string/double column, got $other")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType    => buffer.update(v.asInstanceOf[Long])
      case IntegerType => buffer.update(v.asInstanceOf[Int].toLong)
      case DoubleType  => buffer.update(v.asInstanceOf[Double])
      case StringType  => buffer.update(v.asInstanceOf[UTF8String].toString)
      case other => throw new IllegalStateException(
        s"theta_sketch_agg: unsupported input type $other")
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  /** Ordered compact image — the canonical serialized form, so equal hash
    * sets produce equal bytes regardless of aggregation order. */
  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** Re-aggregate serialized theta sketches (the binaries produced by
  * [[ThetaSketchAgg]] or a previous union) into one sketch over their
  * union — the any-range rollup step. NULL rows are skipped; an empty
  * group yields the empty sketch (estimate 0), matching theta set
  * semantics rather than SQL's NULL (the empty SET is a meaningful
  * operand to intersection/difference, a NULL sketch is not). */
final case class ThetaUnionAgg(
    child: Expression,
    lgK: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] {

  require(lgK >= 4 && lgK <= 26, s"lgK must be in [4, 26] (got $lgK)")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"theta_union_agg requires a binary sketch column, got $other")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_union_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}
