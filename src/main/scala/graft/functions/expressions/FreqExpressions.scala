package graft.functions.expressions

import org.apache.datasketches.frequencies.LongsSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Frequent-items (Misra-Gries / DataSketches LongsSketch) aggregates — the
  * HEAVY-HITTERS sketch completing the mergeable family: HLL answers "how
  * many distinct", KLL "what quantile", CMS "how often did X occur", theta
  * "how do two sets overlap"; this one answers "WHICH items dominate" —
  * top-talker users, runaway document templates, hot partition keys — from
  * persisted per-range sketches, never by re-scanning events.
  *
  * Same execution shape as the theta aggregates ([[ThetaSketchAgg]]): a
  * [[TypedImperativeAggregate]] whose buffer is the live sketch in memory,
  * serialized only at shuffle boundaries, so per-row cost is one hash-map
  * update. The sketch keeps at most maxMapSize counters (the Misra-Gries
  * invariant); when the map saturates, ~50% of low-count items are purged
  * and the purge median is added to the error offset — which yields the
  * published deterministic guarantee getLowerBound(x) <= true(x) <=
  * getUpperBound(x) with ub − lb <= getMaximumError() <= 3.5·N/maxMapSize,
  * REGARDLESS of update or merge order. While a sketch never saturates
  * (distinct items per group < 0.75·maxMapSize) every estimate is EXACT —
  * the regime the catalog entry's DuckDB oracle pins — and a 100 TB group
  * degrades gracefully to the ~3.5/maxMapSize relative-error envelope in a
  * fixed maxMapSize·16-byte footprint.
  *
  * Unlike theta (whose retained set is a pure function of the input hash
  * set), a SATURATED frequencies sketch's retained map depends on purge
  * order, so mergeability tests pin estimate equality in the exact regime
  * and error-bound containment beyond it — never byte equality.
  */
final case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch]
  with UnaryLike[Expression] {

  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"maxMapSize must be a power of 2 >= 8 (got $maxMapSize)")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"freq_sketch_agg requires a long/int column, got $other")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch_agg"

  override def createAggregationBuffer(): LongsSketch =
    new LongsSketch(maxMapSize)

  override def update(buffer: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType    => buffer.update(v.asInstanceOf[Long])
      case IntegerType => buffer.update(v.asInstanceOf[Int].toLong)
      case other => throw new IllegalStateException(
        s"freq_sketch_agg: unsupported input type $other")
    }
    buffer
  }

  override def merge(buffer: LongsSketch, other: LongsSketch): LongsSketch =
    buffer.merge(other)

  override def eval(buffer: LongsSketch): Any = buffer.toByteArray

  override def serialize(buffer: LongsSketch): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAgg =
    copy(child = newChild)
}

/** Re-aggregate serialized frequency sketches (the binaries produced by
  * [[FreqSketchAgg]] or a previous merge) into one sketch over their
  * union — the any-range rollup. NULL rows are skipped; an empty group
  * yields the empty sketch (stream length 0), mirroring theta's
  * empty-set-is-an-operand semantics. The merged sketch's error bound is
  * the SUM of the operands' offsets plus any purges the merge itself
  * triggers — still within the published getMaximumError envelope over the
  * combined stream. */
final case class FreqMergeAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch]
  with UnaryLike[Expression] {

  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"maxMapSize must be a power of 2 >= 8 (got $maxMapSize)")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"freq_merge_agg requires a binary sketch column, got $other")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_merge_agg"

  override def createAggregationBuffer(): LongsSketch =
    new LongsSketch(maxMapSize)

  override def update(buffer: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v == null) buffer
    else buffer.merge(
      LongsSketch.getInstance(Memory.wrap(v.asInstanceOf[Array[Byte]])))
  }

  override def merge(buffer: LongsSketch, other: LongsSketch): LongsSketch =
    buffer.merge(other)

  override def eval(buffer: LongsSketch): Any = buffer.toByteArray

  override def serialize(buffer: LongsSketch): Array[Byte] =
    buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqMergeAgg =
    copy(child = newChild)
}

/** [[FreqSketchAgg]] for STRING items (DataSketches `ItemsSketch<String>`
  * + `ArrayOfStringsSerDe`) — heavy hitters over event types, domains,
  * languages, template ids: the categorical columns a training-data
  * pipeline actually ranks. Identical Misra-Gries semantics and error
  * envelope; the buffer holds at most maxMapSize (string, counter)
  * entries, so the footprint is bounded by the retained strings'
  * lengths, not the stream. */
final case class FreqStringsSketchAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[
    org.apache.datasketches.frequencies.ItemsSketch[String]]
  with UnaryLike[Expression] {

  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"maxMapSize must be a power of 2 >= 8 (got $maxMapSize)")

  private def serde = new org.apache.datasketches.common.ArrayOfStringsSerDe

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"freq_strings_sketch_agg requires a string column, got $other")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_strings_sketch_agg"

  override def createAggregationBuffer()
      : org.apache.datasketches.frequencies.ItemsSketch[String] =
    new org.apache.datasketches.frequencies.ItemsSketch[String](maxMapSize)

  override def update(
      buffer: org.apache.datasketches.frequencies.ItemsSketch[String],
      input: InternalRow)
      : org.apache.datasketches.frequencies.ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.toString)
    buffer
  }

  override def merge(
      buffer: org.apache.datasketches.frequencies.ItemsSketch[String],
      other: org.apache.datasketches.frequencies.ItemsSketch[String])
      : org.apache.datasketches.frequencies.ItemsSketch[String] =
    buffer.merge(other)

  override def eval(
      buffer: org.apache.datasketches.frequencies.ItemsSketch[String]): Any =
    buffer.toByteArray(serde)

  override def serialize(
      buffer: org.apache.datasketches.frequencies.ItemsSketch[String])
      : Array[Byte] = buffer.toByteArray(serde)
  override def deserialize(bytes: Array[Byte])
      : org.apache.datasketches.frequencies.ItemsSketch[String] =
    org.apache.datasketches.frequencies.ItemsSketch.getInstance(
      Memory.wrap(bytes), serde)

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : FreqStringsSketchAgg = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : FreqStringsSketchAgg = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : FreqStringsSketchAgg = copy(child = newChild)
}

/** Re-aggregate serialized STRING frequency sketches — [[FreqMergeAgg]]'s
  * string twin, same empty-group and error-composition semantics. */
final case class FreqStringsMergeAgg(
    child: Expression,
    maxMapSize: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[
    org.apache.datasketches.frequencies.ItemsSketch[String]]
  with UnaryLike[Expression] {

  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"maxMapSize must be a power of 2 >= 8 (got $maxMapSize)")

  private def serde = new org.apache.datasketches.common.ArrayOfStringsSerDe

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"freq_strings_merge_agg requires a binary sketch column, got $other")
    }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_strings_merge_agg"

  override def createAggregationBuffer()
      : org.apache.datasketches.frequencies.ItemsSketch[String] =
    new org.apache.datasketches.frequencies.ItemsSketch[String](maxMapSize)

  override def update(
      buffer: org.apache.datasketches.frequencies.ItemsSketch[String],
      input: InternalRow)
      : org.apache.datasketches.frequencies.ItemsSketch[String] = {
    val v = child.eval(input)
    if (v == null) buffer
    else buffer.merge(
      org.apache.datasketches.frequencies.ItemsSketch.getInstance(
        Memory.wrap(v.asInstanceOf[Array[Byte]]), serde))
  }

  override def merge(
      buffer: org.apache.datasketches.frequencies.ItemsSketch[String],
      other: org.apache.datasketches.frequencies.ItemsSketch[String])
      : org.apache.datasketches.frequencies.ItemsSketch[String] =
    buffer.merge(other)

  override def eval(
      buffer: org.apache.datasketches.frequencies.ItemsSketch[String]): Any =
    buffer.toByteArray(serde)

  override def serialize(
      buffer: org.apache.datasketches.frequencies.ItemsSketch[String])
      : Array[Byte] = buffer.toByteArray(serde)
  override def deserialize(bytes: Array[Byte])
      : org.apache.datasketches.frequencies.ItemsSketch[String] =
    org.apache.datasketches.frequencies.ItemsSketch.getInstance(
      Memory.wrap(bytes), serde)

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : FreqStringsMergeAgg = copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int)
      : FreqStringsMergeAgg = copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression)
      : FreqStringsMergeAgg = copy(child = newChild)
}
