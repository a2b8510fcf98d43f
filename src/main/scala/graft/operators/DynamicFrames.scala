package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Dynamic (per-row) ROWS-frame window aggregation as a first-class
  * operator — the scale-safe path for `ROWS BETWEEN x PRECEDING AND y
  * FOLLOWING` with NON-constant offsets, which Spark's native window
  * framer cannot express (frame bounds must be foldable).
  *
  * The reference evaluates per-row frames in O(frame) per row over a
  * spillable whole-partition buffer (`operator/window/RowsFraming.java`
  * over a PagesIndex). This operator reproduces that shape exactly:
  * one shuffle on the partition key, a local sort, and a streaming
  * scan whose per-key working set is a [[SpillableRowBuffer]] (on-heap
  * up to the spill threshold, task-local disk pages beyond — the same
  * buffer the MATCH_RECOGNIZE operator uses). sum/count/avg evaluate
  * in O(1) per row off an exact prefix array (integral sums stay
  * Long-exact via addExact; 8–16 primitive bytes per buffered row);
  * min/max scan the frame (O(frame) per row, the reference's own
  * bound).
  *
  * This is the 100-TB path the SQL front-end's dynamic-offset lowering
  * (sqlcompat/WindowFrameSql.scala — whole-partition collected array
  * with a partition-size guard) points to in docs/MIGRATION.md: the
  * collected-array form cannot spill, this operator can.
  *
  * Offset semantics follow the standard and the reference: offsets
  * evaluate per row, must be non-negative and non-null ("Window frame
  * offset value must not be negative or null"), and frames clamp to
  * the partition edges. The current row is always inside its own
  * frame (lo, hi ≥ 0), so the frame is never empty.
  */
object DynamicFrames {

  /** Append `outCol` = `fn(valueCol)` over each row's dynamic frame
    * `[i - loCol(i), i + hiCol(i)]` within its (partCols, orderCols)
    * window partition. fn ∈ {sum, count, avg, min, max}; value and
    * offset columns must be integral or fractional primitives
    * (decimals: pre-scale to a long — the limb convention used by the
    * exact-decimal queries — or aggregate in double explicitly). */
  def rowsFrameAgg(
      df: DataFrame,
      partCols: Seq[String],
      orderCols: Seq[String],
      loCol: String,
      hiCol: String,
      valueCol: String,
      fn: String,
      outCol: String = "frame_agg",
      spillAfterRows: Int = MatchRecognize.SpillAfterRows): DataFrame = {
    require(Set("sum", "count", "avg", "min", "max")(fn),
      s"rowsFrameAgg supports sum/count/avg/min/max, got '$fn'")
    val inSchema = df.schema
    val vIdx = inSchema.fieldIndex(valueCol)
    val integral = inSchema(vIdx).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case FloatType | DoubleType => false
      case other => throw new IllegalArgumentException(
        s"rowsFrameAgg($fn($valueCol)): integral or fractional primitive " +
          s"column required, got $other (decimals: use the unscaled-long " +
          "limb convention)")
    }
    val outType: DataType = fn match {
      case "count" => LongType
      case "avg" => DoubleType
      case "sum" | "min" | "max" => if (integral) LongType else DoubleType
    }
    val outSchema = StructType(inSchema.fields :+
      StructField(outCol, outType, nullable = true))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(outSchema)

    val pCols = partCols
    val loIdx = inSchema.fieldIndex(loCol)
    val hiIdx = inSchema.fieldIndex(hiCol)
    val theFn = fn
    val isIntegral = integral
    val memCap = spillAfterRows

    df.repartition(partCols.map(col): _*)
      .sortWithinPartitions((partCols ++ orderCols).map(col): _*)
      .mapPartitions { it =>
        new Iterator[Row] {
          private val rows = it.buffered
          private var buf: SpillableRowBuffer = _
          private var n = 0
          private var pos = 0
          // exact prefix sums over non-null values (sum/count/avg)
          private var pSumL: Array[Long] = _
          private var pSumD: Array[Double] = _
          private var pCnt: Array[Int] = _

          private def keyOf(r: Row): Seq[Any] =
            pCols.map(c => r.get(r.fieldIndex(c)))

          private def offsetAt(r: Row, idx: Int): Long = {
            if (r.isNullAt(idx)) throw new IllegalArgumentException(
              "Window frame offset value must not be negative or null")
            val o = r.get(idx) match {
              case x: Number => x.longValue()
              case other => throw new IllegalArgumentException(
                s"window frame offset must be numeric, got ${other.getClass.getSimpleName}")
            }
            if (o < 0) throw new IllegalArgumentException(
              "Window frame offset value must not be negative or null")
            o
          }

          private def loadGroup(): Unit = {
            if (!rows.hasNext) return
            val key = keyOf(rows.head)
            buf = new SpillableRowBuffer(memCap)
            while (rows.hasNext && keyOf(rows.head) == key)
              buf.append(rows.next())
            n = buf.length
            pos = 0
            if (theFn == "sum" || theFn == "count" || theFn == "avg") {
              pCnt = new Array[Int](n + 1)
              if (isIntegral) pSumL = new Array[Long](n + 1)
              else pSumD = new Array[Double](n + 1)
              var i = 0
              while (i < n) {
                val r = buf(i)
                if (r.isNullAt(vIdx)) {
                  pCnt(i + 1) = pCnt(i)
                  if (isIntegral) pSumL(i + 1) = pSumL(i)
                  else pSumD(i + 1) = pSumD(i)
                } else {
                  pCnt(i + 1) = pCnt(i) + 1
                  if (isIntegral) pSumL(i + 1) = java.lang.Math.addExact(
                    pSumL(i), r.get(vIdx).asInstanceOf[Number].longValue())
                  else pSumD(i + 1) =
                    pSumD(i) + r.get(vIdx).asInstanceOf[Number].doubleValue()
                }
                i += 1
              }
            }
          }

          override def hasNext: Boolean = {
            while ((buf == null || pos >= n) && rows.hasNext) {
              if (buf != null) { buf.dispose(); buf = null }
              loadGroup()
            }
            val more = buf != null && pos < n
            if (!more && buf != null) { buf.dispose(); buf = null }
            more
          }

          override def next(): Row = {
            if (!hasNext) throw new NoSuchElementException
            val r = buf(pos)
            val lo = offsetAt(r, loIdx)
            val hi = offsetAt(r, hiIdx)
            val s = math.max(0L, pos - lo).toInt
            val e = math.min(n - 1L, pos + hi).toInt
            val agg: Any = theFn match {
              case "count" => (pCnt(e + 1) - pCnt(s)).toLong
              case "sum" =>
                if (pCnt(e + 1) - pCnt(s) == 0) null
                else if (isIntegral) pSumL(e + 1) - pSumL(s)
                else pSumD(e + 1) - pSumD(s)
              case "avg" =>
                val c = pCnt(e + 1) - pCnt(s)
                if (c == 0) null
                else if (isIntegral) (pSumL(e + 1) - pSumL(s)).toDouble / c
                else (pSumD(e + 1) - pSumD(s)) / c
              case _ => // min / max: O(frame) scan, the reference's bound
                val isMin = theFn == "min"
                var bestL = 0L
                var bestD = 0.0
                var any = false
                var j = s
                while (j <= e) {
                  val rr = buf(j)
                  if (!rr.isNullAt(vIdx)) {
                    if (isIntegral) {
                      val x = rr.get(vIdx).asInstanceOf[Number].longValue()
                      if (!any || (if (isMin) x < bestL else x > bestL)) bestL = x
                    } else {
                      val x = rr.get(vIdx).asInstanceOf[Number].doubleValue()
                      if (!any || (if (isMin) x < bestD else x > bestD)) bestD = x
                    }
                    any = true
                  }
                  j += 1
                }
                if (!any) null
                else if (isIntegral) bestL
                else bestD
            }
            pos += 1
            Row.fromSeq(r.toSeq :+ agg)
          }
        }
      }
  }
}
