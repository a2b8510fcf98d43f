package graft.functions

/** LISTAGG `ON OVERFLOW` finishing kernel (SQL:2016 §10.9; reference
  * grammar `SqlBase.g4:348-356` listAggOverflowBehavior, semantics in
  * `operator/aggregation/listagg/ListaggAggregationFunction.java` and
  * vectors in `sql/query/TestListagg.java:204-384`).
  *
  * The dialect lowers `LISTAGG(v, sep ON OVERFLOW ...) WITHIN GROUP
  * (ORDER BY k)` onto `graft_listagg_finish(array_agg(v ORDER BY k),
  * sep, isError, filler, withCount)` — the ordered-aggregate machinery
  * produces the entries in group order, and this kernel replays the
  * reference's output walk: concatenate entries until the next entry
  * (plus separator) would push the output past the 1 MiB byte cap,
  * then either raise (`ON OVERFLOW ERROR`) or append
  * `sep + filler + "(" + omittedCount + ")"` (`TRUNCATE [filler]
  * WITH|WITHOUT COUNT`). Lengths are UTF-8 BYTES, exactly like the
  * reference's Slice lengths; truncation lands on entry boundaries.
  *
  * Scale note: like the reference's accumulator, the group's entries
  * are fully buffered before finishing (the omitted-entry count needs
  * the total); the cap bounds only the OUTPUT, not the state.
  */
object ListaggOverflow {

  /** The reference's DEFAULT_MAX_PAGE_SIZE_IN_BYTES output cap. */
  val MaxOutputBytes: Int = 1048576

  def finish(arr: Seq[String], sep: String, isError: Boolean,
      filler: String, withCount: Boolean): String = {
    if (arr == null) return null
    val vals = arr.filter(_ != null)
    if (vals.isEmpty) return null
    val sepBytes = utf8Len(sep)
    val sb = new java.lang.StringBuilder
    var outLen = 0L
    var emitted = 0
    var overflow = false
    val it = vals.iterator
    while (it.hasNext && !overflow) {
      val v = it.next()
      val entryLen = utf8Len(v)
      val spaceRequired = entryLen + (if (emitted > 0) sepBytes else 0)
      if (outLen + spaceRequired > MaxOutputBytes) overflow = true
      else {
        if (emitted > 0) { sb.append(sep); outLen += sepBytes }
        sb.append(v)
        outLen += entryLen
        emitted += 1
      }
    }
    if (overflow) {
      if (isError) throw new IllegalStateException(
        "Concatenated string has the length in bytes larger than the " +
          s"maximum output length $MaxOutputBytes")
      if (emitted > 0) sb.append(sep)
      sb.append(filler)
      if (withCount)
        sb.append('(').append(vals.length - emitted).append(')')
    }
    sb.toString
  }

  /** UTF-8 byte length without materializing the byte array. */
  private def utf8Len(s: String): Int = {
    var n = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      n += (if (c < 0x80) 1
        else if (c < 0x800) 2
        else if (Character.isHighSurrogate(c)) { i += 1; 4 }
        else 3)
      i += 1
    }
    n
  }
}
