package graft

import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** The xxhash64-compatibility predicate shared by every salt construction
  * (`sources.Writers`, `operators.Skew`): Spark's hash expressions reject
  * MapType and VariantType inputs, including nested occurrences. One
  * definition so a newly unhashable type (as `variant` was) is handled in
  * one place. */
object Hashable {
  def unhashable(dt: DataType): Boolean = dt match {
    case _: MapType     => true
    case st: StructType => st.fields.exists(f => unhashable(f.dataType))
    case a: ArrayType   => unhashable(a.elementType)
    case d              => d.typeName == "variant"
  }
}
