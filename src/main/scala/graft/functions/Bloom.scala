package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.types.BinaryType

/** Broadcast Bloom-filter prefilters — the shape Spark's own runtime row-
  * level filtering uses (a `BloomFilterAggregate` subquery feeding
  * `BloomFilterMightContain`), exposed here as an explicit operator so a
  * pipeline can prefilter a 100 TB fact by a dimension-sized key set
  * BEFORE the shuffle a semi-join would pay.
  *
  * Scale contract: the filter is built distributed (map-side partial
  * filters, driver merge — the same treeAggregate Spark's stat functions
  * use; no row data ever reaches the driver) and ships to executors inside
  * the serialized plan exactly like Spark's injected runtime filters. Size
  * it with `expectedItems`/`fpp`: 1 M keys at 1 % fpp ≈ 1.2 MB — dimension
  * keys fit; never build one over the fact side. The probe is a codegen'd
  * predicate (`BloomFilterMightContain.doGenCode`), so it fuses into the
  * scan stage and rows drop before exchange, aggregation, or join.
  *
  * False positives mean a Bloom prefilter alone is NOT a semi-join; pair it
  * with an exact confirm join on the survivors (see
  * [[CorpusOps.contaminatedBloom]]) when exact semantics are required.
  */
object Bloom {

  /** Build a Bloom filter over a LONG key column, serialized for
    * [[mightContain]]. Runs one Spark job (distributed build, driver
    * merge of the fixed-size bitmaps). */
  def build(df: DataFrame, keyCol: String, expectedItems: Long,
            fpp: Double = 0.01): Array[Byte] = {
    val bf = df.stat.bloomFilter(keyCol, math.max(expectedItems, 1L), fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Codegen'd membership probe of a LONG column against a serialized
    * filter from [[build]]. The filter binary rides the plan as a literal —
    * the same transport Spark uses for its injected runtime filters. */
  def mightContain(filter: Array[Byte], value: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      Literal.create(filter, BinaryType),
      GraftBridge.expression(value)))
}
