package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Pass-through validator for `map_from_entries` inputs carrying the
  * reference's contract (`scalar/MapFromEntriesFunction.java`): a NULL
  * entry raises "map entry cannot be null", a NULL key raises "map key
  * cannot be null", and DUPLICATE keys raise — where Spark under the
  * session's LAST_WIN dedup policy (needed for map_concat's
  * last-map-wins contract) would silently keep the last value. The
  * dialect-facing `map_from_entries` wraps its argument in this
  * expression; the entries array passes through untouched when valid.
  */
case class CheckUniqueKeys(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType

  override protected def nullSafeEval(input: Any): Any =
    CheckUniqueKeys.validate(input.asInstanceOf[ArrayData], keyType)

  private def keyType: DataType = child.dataType match {
    case ArrayType(st: StructType, _) => st.fields(0).dataType
    case other => throw new IllegalArgumentException(
      s"map_from_entries expects array<row(k, v)>, got $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kt = ctx.addReferenceObj("keyType", keyType,
      classOf[DataType].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CheckUniqueKeys.validate($c, $kt)")
  }

  override protected def withNewChildInternal(newChild: Expression): CheckUniqueKeys =
    copy(child = newChild)

  override def prettyName: String = "check_unique_keys"
}

object CheckUniqueKeys {
  def validate(entries: ArrayData, keyType: DataType): ArrayData = {
    val n = entries.numElements()
    val seen = new java.util.HashSet[Any](math.max(16, n * 2))
    var i = 0
    while (i < n) {
      if (entries.isNullAt(i))
        throw new IllegalArgumentException("map entry cannot be null")
      val row = entries.getStruct(i, 2)
      if (row.isNullAt(0))
        throw new IllegalArgumentException("map key cannot be null")
      val k0 = row.get(0, keyType)
      val k = k0 match {
        // Array[Byte] hashes/compares by identity — VARBINARY keys
        // must dedup by CONTENT (reference MapFromEntriesFunction
        // raises on duplicate varbinary keys)
        case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
        case other => other
      }
      if (!seen.add(k))
        throw new IllegalArgumentException(
          s"Duplicate map keys ($k0) are not allowed")
      i += 1
    }
    entries
  }
}
