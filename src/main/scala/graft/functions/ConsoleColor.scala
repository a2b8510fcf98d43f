package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Console-rendering color functions — the reference's COLOR-typed
  * client-formatting family (`operator/scalar/ColorFunctions.java`,
  * vectors in `operator/scalar/TestColorFunctions.java`). The
  * reference's opaque COLOR type maps to BIGINT here: non-negative
  * values are 24-bit RGB exactly as the reference encodes them
  * ((r<<16)|(g<<8)|b), ANSI system colors are -(index+1). Semantics
  * mirrored exactly:
  *
  *  - `color(varchar)` — `#rgb` CSS shorthand (nibble replication) or
  *    a system-color name; anything else raises "Invalid color".
  *  - `color(value, low, high, lowColor, highColor)` /
  *    `color(fraction, lowColor, highColor)` — linear interpolation in
  *    HSB space between two RGB endpoints, fraction clamped to [0,1];
  *    system-color endpoints are rejected ("not a valid RGB color").
  *  - `rgb(r, g, b)` — components range-checked to 0..255.
  *  - `bar(fraction, width[, lowColor, highColor])` — `⌊fraction·width⌋`
  *    filled cells, each escape-colored at its own interpolated hue
  *    (xterm-256 cube: 16 + 36·(r·6/256) + 6·(g·6/256) + (b·6/256)),
  *    one trailing reset, space-padded to `width`.
  *  - `render(value, color)` / `render(boolean)` — `ESC[38;5;<n>m` +
  *    text + reset; booleans render as green ✓ / red ✗.
  *
  * These are low-volume result-formatting scalars (the reference
  * evaluates them on the coordinator for CLI output), so an
  * interpreted (CodegenFallback) expression is the right cost tier —
  * nothing on a data path should route through them.
  */
object ColorKernels {
  private val systemColors = Map(
    "BLACK" -> 0, "RED" -> 1, "GREEN" -> 2, "YELLOW" -> 3,
    "BLUE" -> 4, "MAGENTA" -> 5, "CYAN" -> 6, "WHITE" -> 7)

  private val AnsiReset = "\u001b[0m"

  /** `#rgb` CSS shorthand → 24-bit RGB; -1 when not that form. */
  def parseRgb(s: String): Long = {
    if (s.length != 4 || s.charAt(0) != '#') return -1L
    val r = Character.digit(s.charAt(1), 16)
    val g = Character.digit(s.charAt(2), 16)
    val b = Character.digit(s.charAt(3), 16)
    if (r == -1 || g == -1 || b == -1) return -1L
    rgb((r << 4) | r, (g << 4) | g, (b << 4) | b)
  }

  def colorOf(s: String): Long = {
    val v = parseRgb(s)
    if (v != -1L) v
    else systemColors.get(s.toUpperCase(java.util.Locale.ROOT)) match {
      case Some(i) => -(i + 1).toLong
      case None =>
        throw new IllegalArgumentException(s"Invalid color: '$s'")
    }
  }

  def rgb(red: Long, green: Long, blue: Long): Long = {
    require(red >= 0 && red <= 255, "red must be between 0 and 255")
    require(green >= 0 && green <= 255, "green must be between 0 and 255")
    require(blue >= 0 && blue <= 255, "blue must be between 0 and 255")
    (red << 16) | (green << 8) | blue
  }

  private def red(c: Long): Int = {
    require(c >= 0, "color is not a valid rgb value")
    ((c >>> 16) & 0xff).toInt
  }
  private def green(c: Long): Int = {
    require(c >= 0, "color is not a valid rgb value")
    ((c >>> 8) & 0xff).toInt
  }
  private def blue(c: Long): Int = {
    require(c >= 0, "color is not a valid rgb value")
    (c & 0xff).toInt
  }

  /** HSB-space linear interpolation between two RGB endpoints (the
    * reference delegates to java.awt.Color's HSB conversions; so do
    * we — same rounding, headless-safe). */
  private def interpolate(fraction: Float, lo: Long, hi: Long): Long = {
    val l = java.awt.Color.RGBtoHSB(red(lo), green(lo), blue(lo), null)
    val h = java.awt.Color.RGBtoHSB(red(hi), green(hi), blue(hi), null)
    java.awt.Color.HSBtoRGB(
      fraction * (h(0) - l(0)) + l(0),
      fraction * (h(1) - l(1)) + l(1),
      fraction * (h(2) - l(2)) + l(2)) & 0xFFFFFF
  }

  def colorInterp(fraction: Double, lowColor: Long, highColor: Long): Long = {
    require(lowColor >= 0, "lowColor not a valid RGB color")
    require(highColor >= 0, "highColor not a valid RGB color")
    val f = math.max(0.0, math.min(1.0, fraction))
    interpolate(f.toFloat, lowColor, highColor)
  }

  def colorScaled(value: Double, low: Double, high: Double,
      lowColor: Long, highColor: Long): Long =
    colorInterp((value - low) / (high - low), lowColor, highColor)

  /** xterm-256 index: RGB → 6×6×6 cube cell; system colors pass
    * their own 0-7 index through. */
  private def toAnsi(c: Long): Int =
    if (c >= 0) 16 + (red(c) * 6 / 256) * 36 + (green(c) * 6 / 256) * 6 +
      (blue(c) * 6 / 256)
    else (-c - 1).toInt

  private def escape(c: Long): String = "\u001b[38;5;" + toAnsi(c) + "m"

  def bar(percent: Double, width: Long, lowColor: Long, highColor: Long): String = {
    val count = math.max(0L, math.min(width, (percent * width).toInt.toLong))
    val sb = new java.lang.StringBuilder
    var i = 0L
    while (i < count) {
      val fraction = (i.toDouble / (width - 1)).toFloat
      sb.append(escape(interpolate(fraction, lowColor, highColor)))
        .append('█')
      i += 1
    }
    sb.append(AnsiReset)
    i = count
    while (i < width) { sb.append(' '); i += 1 }
    sb.toString
  }

  def render(value: String, color: Long): String =
    escape(color) + value + AnsiReset

  def renderBoolean(b: Boolean): String =
    if (b) render("✓", colorOf("green")) else render("✗", colorOf("red"))
}

/** `color(...)` — 1-arg parse, 3-arg fraction interpolation, 5-arg
  * scaled-value interpolation (reference overload set). */
case class ColorFn(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(Set(1, 3, 5)(children.length), "color takes 1, 3 or 5 arguments")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    def d(i: Int): Double = vs(i) match {
      case n: Number => n.doubleValue()
      case x: Decimal => x.toDouble
    }
    def l(i: Int): Long = vs(i) match { case n: Number => n.longValue() }
    vs match {
      case Seq(s: UTF8String) => ColorKernels.colorOf(s.toString)
      case Seq(_, _, _) => ColorKernels.colorInterp(d(0), l(1), l(2))
      case _ => ColorKernels.colorScaled(d(0), d(1), d(2), l(3), l(4))
    }
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(newChildren)
}

/** `rgb(r, g, b)` — range-checked 24-bit RGB constructor. */
case class RgbFn(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.length == 3, "rgb takes 3 arguments")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    val Seq(r, g, b) = vs.map { case n: Number => n.longValue() }
    ColorKernels.rgb(r, g, b)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(newChildren)
}

/** `bar(fraction, width[, lowColor, highColor])`. */
case class BarFn(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.length == 2 || children.length == 4,
    "bar takes 2 or 4 arguments")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    val pct = vs.head match {
      case n: Number => n.doubleValue()
      case x: Decimal => x.toDouble
    }
    val width = vs(1) match { case n: Number => n.longValue() }
    val (lo, hi) =
      if (vs.length == 4)
        (vs(2) match { case n: Number => n.longValue() },
          vs(3) match { case n: Number => n.longValue() })
      else (ColorKernels.rgb(255, 0, 0), ColorKernels.rgb(0, 255, 0))
    UTF8String.fromString(ColorKernels.bar(pct, width, lo, hi))
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(newChildren)
}

/** `render(value, color)` for varchar/bigint/double values and
  * `render(boolean)`. */
case class RenderFn(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.length == 1 || children.length == 2,
    "render takes 1 or 2 arguments")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    val out = vs match {
      case Seq(b: java.lang.Boolean) => ColorKernels.renderBoolean(b)
      case Seq(v, c: java.lang.Long) =>
        val text = v match {
          case s: UTF8String => s.toString
          case f: java.lang.Float => f.toDouble.toString
          case other => other.toString
        }
        ColorKernels.render(text, c)
      case other => throw new IllegalArgumentException(
        s"render: unsupported argument shape $other")
    }
    UTF8String.fromString(out)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(newChildren)
}
