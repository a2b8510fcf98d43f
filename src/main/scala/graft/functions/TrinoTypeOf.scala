package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `typeof(x)` rendering the REFERENCE dialect's type names
  * (`operator/scalar/TypeOfFunction.java`, vectors in
  * `TestTypeOfFunction.java`): `integer`/`bigint`/`varchar`/`real`/
  * `row(name type, ...)`/`array(t)`/`map(k, v)`/`unknown`, not
  * Spark's `int`/`string`/`struct<...>`. Purely an analysis-time
  * constant — the child is never evaluated, and codegen emits the
  * rendered literal, so the expression folds into whole-stage codegen
  * with zero runtime cost.
  *
  * Engine type-system mappings (documented in docs/MIGRATION.md):
  * length-parametric VARCHAR(n)/CHAR(n) collapse to Spark's plain
  * string type outside table schemas, so `typeof('cat')` is `varchar`
  * (the reference says `varchar(3)`); timestamps render at the
  * engine's micros precision (`timestamp(6)`).
  */
case class TrinoTypeOf(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  // foldable: ConstantFolding collapses typeof(x) to the rendered
  // literal during optimization — the child is never evaluated and
  // nothing interpreted survives into the physical plan
  override def foldable: Boolean = true
  override def prettyName: String = "typeof"

  private lazy val rendered: UTF8String =
    UTF8String.fromString(TrinoTypeOf.render(child.dataType))

  override def eval(input: InternalRow): Any = rendered

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TrinoTypeOf {
  /** Catalyst DataType → reference dialect type name. */
  def render(dt: DataType): String = dt match {
    case NullType => "unknown"
    case BooleanType => "boolean"
    case ByteType => "tinyint"
    case ShortType => "smallint"
    case IntegerType => "integer"
    case LongType => "bigint"
    case FloatType => "real"
    case DoubleType => "double"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case VarcharType(n) => s"varchar($n)"
    case CharType(n) => s"char($n)"
    case _: StringType => "varchar"
    case BinaryType => "varbinary"
    case DateType => "date"
    case TimestampNTZType => "timestamp(6)"
    case TimestampType => "timestamp(6) with time zone"
    case _: DayTimeIntervalType => "interval day to second"
    case _: YearMonthIntervalType => "interval year to month"
    case CalendarIntervalType => "interval day to second"
    case ArrayType(e, _) => s"array(${render(e)})"
    case MapType(k, v, _) => s"map(${render(k)}, ${render(v)})"
    case StructType(fields) =>
      fields.map { f =>
        // anonymous colN fields render bare-typed like the reference's
        // anonymous row fields
        if (f.name.matches("col\\d+")) render(f.dataType)
        else s"${f.name} ${render(f.dataType)}"
      }.mkString("row(", ", ", ")")
    case other => other.simpleString
  }
}
