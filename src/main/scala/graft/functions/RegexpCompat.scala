package graft.functions

import java.util.concurrent.ConcurrentHashMap
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Reference `regexp_extract(subject, pattern[, group])` semantics
  * (`core/trino-main/.../operator/scalar/JoniRegexpFunctions.java`
  * regexpExtract), which differ from Spark's builtin in three ways:
  *
  *   - the default group is 0 (the whole match); Spark's default is 1
  *   - no match yields NULL; Spark yields ''
  *   - a group that did not participate in the match (e.g. the unused
  *     branch of an alternation) yields NULL; Spark yields ''
  *
  * The last case is unreachable with Spark's RegExpExtract output
  * alone ('' is ambiguous), so this is a thin eval over
  * java.util.regex with a process-wide compiled-pattern cache.
  * Out-of-range or negative group indexes throw, matching the
  * reference's INVALID_FUNCTION_ARGUMENT. Interpreted eval only
  * (CodegenFallback): compat path for translated reference SQL; the
  * repo's hot paths use Spark's native regexp machinery.
  */
object RegexpCompat {
  private val cache = new ConcurrentHashMap[String, Pattern]
  private val MaxCached = 1024

  def pattern(p: String): Pattern = {
    val hit = cache.get(p)
    if (hit != null) hit
    else {
      if (cache.size >= MaxCached) cache.clear()
      cache.computeIfAbsent(p, (s: String) => Pattern.compile(s))
    }
  }
}

case class GraftRegexpExtract(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def nullable: Boolean = true // NULL on no-match

  override protected def nullSafeEval(s: Any, p: Any, g: Any): Any = {
    val m = RegexpCompat.pattern(p.asInstanceOf[UTF8String].toString)
      .matcher(s.asInstanceOf[UTF8String].toString)
    val group = g.asInstanceOf[Int]
    if (group < 0)
      throw new IllegalArgumentException(
        s"regexp_extract group index may not be negative: $group")
    if (!m.find()) null
    else {
      val v = m.group(group) // throws on out-of-range group
      if (v == null) null else UTF8String.fromString(v)
    }
  }

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): GraftRegexpExtract =
    copy(first = f, second = s, third = t)

  override def prettyName: String = "graft_regexp_extract"
}
