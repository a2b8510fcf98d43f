package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MatchRecognize, MatchRow}

/** Seq fixture row for pattern tests. */
case class Tick(k: Long, ord: Long, v: Double)

/** Unit semantics for the MATCH_RECOGNIZE operator: quantifier
  * greediness, alternation preference, bounded repeats, skip modes,
  * and PREV()-style predicates — mirroring the cases the reference
  * covers in its matcher tests (`operator/window/matcher/`). */
class MatchRecognizeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = graft.engine.Graft.session("graft-mr-test", 4)
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def runPat(
      values: Seq[Double],
      pattern: String,
      skipPastLast: Boolean = true): Seq[MatchRow] = {
    val spk = spark
    import spk.implicits._
    val df = values.zipWithIndex.map { case (v, i) => Tick(1L, i.toLong, v) }.toDF()
    val down: (Row, Row) => Boolean =
      (p, c) => p != null && c.getAs[Double]("v") < p.getAs[Double]("v")
    val up: (Row, Row) => Boolean =
      (p, c) => p != null && c.getAs[Double]("v") > p.getAs[Double]("v")
    val high: (Row, Row) => Boolean = (_, c) => c.getAs[Double]("v") >= 10
    MatchRecognize(df, "k", "ord", pattern,
      Map("D" -> down, "U" -> up, "H" -> high), skipPastLast)
      .collect().toSeq.sortBy(_.start_ord)
  }

  test("per-key buffer cap fails loudly with a remedy, not an OOM") {
    val saved = MatchRecognize.MaxRowsPerKey
    try {
      MatchRecognize.MaxRowsPerKey = 4
      val e = intercept[org.apache.spark.SparkException] {
        runPat(Seq[Double](5, 4, 3, 6, 7, 2, 8), "D+ U+")
      }
      val msg = e.getCause match {
        case c: IllegalStateException => c.getMessage
        case _ => e.getMessage
      }
      assert(msg.contains("exceeds 4 buffered rows"))
      assert(msg.contains("sub-partition"))
    } finally MatchRecognize.MaxRowsPerKey = saved
    // and with the cap restored the same input matches normally
    assert(runPat(Seq[Double](5, 4, 3, 6, 7, 2, 8), "D+ U+").nonEmpty)
  }

  test("SpillableRowBuffer pages to disk and reads back exactly") {
    import graft.operators.SpillableRowBuffer
    val buf = new SpillableRowBuffer(memCap = 8, pageSize = 4)
    val rows = (0 until 100).map(i => Row(i.toLong, s"s$i", i * 0.5))
    rows.foreach(buf.append)
    assert(buf.spilled && buf.length == 100)
    // random access across mem / flushed pages / unflushed tail
    for (i <- Seq(0, 7, 8, 9, 12, 47, 48, 95, 99))
      assert(buf(i) == rows(i), s"at $i")
    // non-sequential page hopping exercises the two-page cache
    for (i <- Seq(99, 8, 60, 9, 99, 20, 8))
      assert(buf(i) == rows(i), s"hop at $i")
    assert(buf.toSeq == rows)
    buf.dispose()
  }

  test("spilled per-key buffer matches identically to the on-heap path") {
    // A long sawtooth: many D+ U+ matches across one key. Force the
    // buffer to spill after 16 on-heap rows (several disk pages at
    // pageSize 16384? no — page size stays default, so the spilled
    // tail lives in pageBuf + flushed pages; shrink further below).
    val vals = (0 until 2000).map(i => ((i % 5) match {
      case 0 => 10.0; case 1 => 8.0; case 2 => 6.0; case 3 => 7.0; case 4 => 9.0
    }) + (i / 5) * 0.0001)
    val expected = runPat(vals, "D D U U")
    val savedSpill = MatchRecognize.SpillAfterRows
    val spillsBefore = MatchRecognize.SpillCount.get()
    try {
      MatchRecognize.SpillAfterRows = 16
      val spilledRun = runPat(vals, "D D U U")
      assert(spilledRun == expected && expected.nonEmpty)
    } finally MatchRecognize.SpillAfterRows = savedSpill
    // the disk path genuinely engaged (flushed at least one page file)
    assert(MatchRecognize.SpillCount.get() > spillsBefore,
      "expected the spill path to engage at SpillAfterRows=16")
  }

  test("pattern parser rejects malformed input") {
    intercept[IllegalArgumentException](MatchRecognize.parse("D+("))
    intercept[IllegalArgumentException](MatchRecognize.parse("(DU"))
    // unterminated quantifiers must fail fast, not scan unboundedly
    intercept[IllegalArgumentException](MatchRecognize.parse("A{3"))
    intercept[IllegalArgumentException](MatchRecognize.parse("A{3,"))
    intercept[NumberFormatException](MatchRecognize.parse("A{"))
    MatchRecognize.parse("(D|U)+ H{2,3}") // parses
  }

  test("greedy D+U+ consumes maximal runs") {
    // 5 4 3 6 7 2 8 → DD UU D U  → two V-shapes
    val ms = runPat(Seq[Double](5, 4, 3, 6, 7, 2, 8), "D+ U+")
    assert(ms.map(_.classifier) == Seq("DDUU", "DU"))
    assert(ms.map(m => (m.start_ord, m.end_ord)) == Seq((1L, 4L), (5L, 6L)))
    // per-variable COUNT measures
    assert(ms.map(_.var_counts) == Seq("D:2,U:2", "D:1,U:1"))
  }

  test("no match when only falling") {
    assert(runPat(Seq[Double](5, 4, 3, 2), "D+ U+").isEmpty)
  }

  test("bounded repeat {2,3} is greedy within bounds") {
    // H rows: values >= 10
    val ms = runPat(Seq[Double](11, 12, 13, 14, 1), "H{2,3}")
    assert(ms.map(_.classifier) == Seq("HHH"))
    assert(ms.head.start_ord == 0 && ms.head.end_ord == 2)
  }

  test("exact repeat {2} with skip-past-last tiles the run") {
    val ms = runPat(Seq[Double](11, 12, 13, 14, 1), "H{2}")
    assert(ms.map(m => (m.start_ord, m.end_ord)) == Seq((0L, 1L), (2L, 3L)))
  }

  test("alternation prefers the left branch") {
    // both H and U match at index 1 (12 > 11 and 12 >= 10)
    val ms = runPat(Seq[Double](11, 12), "H|U")
    assert(ms.head.classifier == "H" && ms.head.start_ord == 0)
  }

  test("optional and star quantifiers") {
    val ms = runPat(Seq[Double](5, 4, 6), "D? U", skipPastLast = true)
    assert(ms.map(_.classifier) == Seq("DU"))
    val ms2 = runPat(Seq[Double](3, 7), "D* U")
    assert(ms2.map(_.classifier) == Seq("U"))
  }

  test("skip to next row yields overlapping matches") {
    val past = runPat(Seq[Double](11, 12, 13), "H H", skipPastLast = true)
    val next = runPat(Seq[Double](11, 12, 13), "H H", skipPastLast = false)
    assert(past.size == 1 && next.size == 2)
  }

  test("measures: FINAL first/last/min/max over the matched rows") {
    val spk = spark
    import spk.implicits._
    // 5 3 4 7 6 → U-run is rows 2,3 (4,7); row 0-1 fall, row 4 falls
    val df = Seq[Double](5, 3, 4, 7, 6).zipWithIndex
      .map { case (v, i) => Tick(1L, i.toLong, v) }.toDF()
    val up: (Row, Row) => Boolean =
      (p, c) => p != null && c.getAs[Double]("v") > p.getAs[Double]("v")
    val ms = MatchRecognize.measures(df, "k", "ord", "U{2,}", Map("U" -> up), "v")
      .collect().toSeq
    assert(ms.size == 1)
    val m = ms.head
    assert(m.start_ord == 2 && m.end_ord == 3 && m.n_rows == 2)
    assert(m.first_val == 4.0 && m.last_val == 7.0)
    assert(m.min_val == 4.0 && m.max_val == 7.0)
  }

  test("allRows: RUNNING measures grow per row, FINAL stays constant") {
    val spk = spark
    import spk.implicits._
    // rising run 1 5 3 9 is not monotone; use 1 5 7 6: U-run rows 1,2
    val df = Seq[Double](1, 5, 7, 6).zipWithIndex
      .map { case (v, i) => Tick(1L, i.toLong, v) }.toDF()
    val up: (Row, Row) => Boolean =
      (p, c) => p != null && c.getAs[Double]("v") > p.getAs[Double]("v")
    val rows = MatchRecognize.allRows(df, "k", "ord", "U{2,}", Map("U" -> up), "v")
      .collect().toSeq.sortBy(_.ord)
    assert(rows.map(_.ord) == Seq(1L, 2L))
    assert(rows.map(_.running_cnt) == Seq(1L, 2L)) // RUNNING COUNT(*)
    assert(rows.map(_.final_cnt) == Seq(2L, 2L)) // FINAL COUNT(*)
    assert(rows.map(_.running_max) == Seq(5.0, 7.0)) // RUNNING MAX(v)
    assert(rows.map(_.final_last) == Seq(7.0, 7.0)) // FINAL LAST(v)
    assert(rows.forall(_.classifier == "U"))
  }

  test("pattern exclusion {- -}: rows match but are omitted from ALL ROWS output") {
    val spk = spark
    import spk.implicits._
    // D-run 5 4 3, then U-run 6 7: pattern D {- D+ -} U+ maps row 0 to
    // the visible D, rows 1-2 to the excluded D+, rows 3-4 to U+
    val df = Seq[Double](5, 4, 3, 6, 7).zipWithIndex
      .map { case (v, i) => Tick(1L, i.toLong, v) }.toDF()
    val down: (Row, Row) => Boolean =
      (p, c) => p == null || c.getAs[Double]("v") < p.getAs[Double]("v")
    val up: (Row, Row) => Boolean =
      (p, c) => p != null && c.getAs[Double]("v") > p.getAs[Double]("v")
    val defs = Map("D" -> down, "U" -> up)

    val all = MatchRecognize.allRows(df, "k", "ord", "D {- D+ -} U+", defs, "v")
      .collect().toSeq.sortBy(_.ord)
    // excluded rows 1-2 vanish from the output...
    assert(all.map(_.ord) == Seq(0L, 3L, 4L))
    assert(all.map(_.classifier) == Seq("D", "U", "U"))
    // ...but still participate in RUNNING/FINAL measures: the count is
    // over all 5 matched rows, and row 3's RUNNING position is 4
    assert(all.map(_.final_cnt).distinct == Seq(5L))
    assert(all.map(_.running_cnt) == Seq(1L, 4L, 5L))

    // ONE ROW PER MATCH ignores exclusions entirely: full classifier,
    // full span, full count
    val one = MatchRecognize(df, "k", "ord", "D {- D+ -} U+", defs)
      .collect().toSeq
    assert(one.map(_.classifier) == Seq("DDDUU"))
    assert(one.map(_.n_rows) == Seq(5L))

    // exclusion-free equivalent matches the same span (exclusion never
    // changes WHAT matches, only what ALL ROWS emits)
    val plain = MatchRecognize(df, "k", "ord", "D D+ U+", defs).collect().toSeq
    assert(plain.map(_.start_ord) == one.map(_.start_ord))
    assert(plain.map(_.end_ord) == one.map(_.end_ord))
  }

  test("pattern exclusion: DEFINE navigation sees excluded rows; {m,n} still parses") {
    val spk = spark
    import spk.implicits._
    val df = Seq[Double](1, 2, 3, 4).zipWithIndex
      .map { case (v, i) => Tick(1L, i.toLong, v) }.toDF()
    val up: (Row, Row) => Boolean =
      (p, c) => p == null || c.getAs[Double]("v") > p.getAs[Double]("v")
    // U{2} quantifier and an exclusion in one pattern: brace
    // disambiguation ('{' + '-' = exclusion, else quantifier)
    val all = MatchRecognize.allRows(df, "k", "ord", "{- U{2} -} U+",
      Map("U" -> up), "v").collect().toSeq.sortBy(_.ord)
    assert(all.map(_.ord) == Seq(2L, 3L))
    assert(all.map(_.final_cnt).distinct == Seq(4L))
    // running max at first visible row includes the excluded prefix
    assert(all.map(_.running_max) == Seq(3.0, 4.0))
  }

  test("PERMUTE matches variables in any order, preferring the listed one") {
    // 11 then 5: H fits row 0, D fits row 1 -> only the HD ordering works
    val ms = runPat(Seq[Double](11, 5), "PERMUTE(D, H)")
    assert(ms.map(_.classifier) == Seq("HD"))
    // both orderings feasible -> lexicographic preference takes the listed order
    val ms2 = runPat(Seq[Double](11, 12), "PERMUTE(H, U)")
    assert(ms2.head.classifier == "HU")
    // quantified PERMUTE group parses
    MatchRecognize.parse("PERMUTE(A, B)+ C")
    intercept[IllegalArgumentException](MatchRecognize.parse("PERMUTE(A, B, C, D, E, F)"))
    intercept[IllegalArgumentException](MatchRecognize.parse("PERMUTE()"))
  }

  test("AFTER MATCH SKIP modes: past-last vs to-next vs to-last(var)") {
    import graft.operators.MatchRecognize.SkipMode
    val spk = spark
    import spk.implicits._
    // 5 high rows; pattern H{3}
    val df = Seq[Double](11, 12, 13, 14, 15).zipWithIndex
      .map { case (v, i) => Tick(1L, i.toLong, v) }.toDF()
    val high: (Row, Row) => Boolean = (_, c) => c.getAs[Double]("v") >= 10
    def count(skip: SkipMode): Int =
      MatchRecognize.withSkip(df, "k", "ord", "H{3}", Map("H" -> high), skip)
        .collect().length
    assert(count(SkipMode.PastLastRow) == 1) // (0-2); rows 3-4 too short
    assert(count(SkipMode.ToNextRow) == 3) // starts 0, 1, 2
    assert(count(SkipMode.ToLast("H")) == 2) // (0-2) then resume AT row 2: (2-4)
    // skipping to the first row of the match would loop forever -> error
    val e = intercept[org.apache.spark.SparkException] {
      MatchRecognize.withSkip(df, "k", "ord", "H{3}",
        Map("H" -> high), SkipMode.ToFirst("H")).collect()
    }
    assert(e.getMessage.contains("SKIP TO FIRST") ||
      e.getCause.getMessage.contains("SKIP TO FIRST"))
  }

  test("multi-character variables: whitespace separates, adjacency names one var") {
    val spk = spark
    import spk.implicits._
    val df = Seq[Double](5, 4, 3, 6, 7).zipWithIndex
      .map { case (v, i) => Tick(1L, i.toLong, v) }.toDF()
    val down: (Row, Row) => Boolean =
      (p, c) => p != null && c.getAs[Double]("v") < p.getAs[Double]("v")
    val up: (Row, Row) => Boolean =
      (p, c) => p != null && c.getAs[Double]("v") > p.getAs[Double]("v")
    val ms = MatchRecognize(df, "k", "ord", "DOWN+ UP+",
      Map("DOWN" -> down, "UP" -> up)).collect().toSeq
    assert(ms.size == 1)
    assert(ms.head.var_counts == "DOWN:2,UP:2")
    // "DOWNUP" (no whitespace) is ONE variable named DOWNUP — undefined
    // here, and an undefined variable is TRUE for every row (SQL:2016;
    // reference TestRowPatternMatching.java:68 "A defaults to True"),
    // so every row is its own one-variable match.
    val all = MatchRecognize(df, "k", "ord", "DOWNUP",
      Map("DOWN" -> down, "UP" -> up)).collect().toSeq
    assert(all.size == 5 && all.forall(_.var_counts == "DOWNUP:1"))
    // quantifiers and grouping compose with identifiers
    MatchRecognize.parse("(DOWN | UP){2,3} FLAT_ROW?")
  }

  test("varMeasures: FIRST/LAST(V.value, n) with out-of-range null") {
    val spk = spark
    import spk.implicits._
    // 9 7 4 6 8 2 5 → DOWN rows 1,2 (7,4), UP rows 3,4 (6,8); then DOWN row 5 (2), UP row 6 (5)
    val df = Seq[Double](9, 7, 4, 6, 8, 2, 5).zipWithIndex
      .map { case (v, i) => Tick(1L, i.toLong, v) }.toDF()
    val down: (Row, Row) => Boolean =
      (p, c) => p != null && c.getAs[Double]("v") < p.getAs[Double]("v")
    val up: (Row, Row) => Boolean =
      (p, c) => p != null && c.getAs[Double]("v") > p.getAs[Double]("v")
    val rows = MatchRecognize.varMeasures(df, "k", "ord", "DOWN+ UP+",
      Map("DOWN" -> down, "UP" -> up), "v", offset = 1)
      .collect().toSeq.sortBy(r => (r.match_no, r.var_name))
    assert(rows.map(r => (r.match_no, r.var_name, r.var_rows)) ==
      Seq((1L, "DOWN", 2L), (1L, "UP", 2L), (2L, "DOWN", 1L), (2L, "UP", 1L)))
    val m1d = rows(0)
    assert(m1d.first_val == 7.0 && m1d.last_val == 4.0)
    assert(m1d.first_off.contains(4.0) && m1d.last_off.contains(7.0)) // offset 1
    val m1u = rows(1)
    assert(m1u.first_val == 6.0 && m1u.last_val == 8.0)
    assert(m1u.first_off.contains(8.0) && m1u.last_off.contains(6.0))
    // single-row variables: offset 1 is out of range → null
    assert(rows(2).first_off.isEmpty && rows(2).last_off.isEmpty)
    assert(rows(3).first_off.isEmpty && rows(3).last_off.isEmpty)
    // whole-match bounds are carried on every variable row
    assert(rows(0).start_ord == 1 && rows(0).end_ord == 4)
    assert(rows(2).start_ord == 5 && rows(2).end_ord == 6)
  }

  test("partitions are matched independently") {
    val spk = spark
    import spk.implicits._
    val df = Seq(
      Tick(1, 0, 5), Tick(1, 1, 4), Tick(1, 2, 6),
      Tick(2, 0, 9), Tick(2, 1, 8), Tick(2, 2, 10)).toDF()
    val down: (Row, Row) => Boolean =
      (p, c) => p != null && c.getAs[Double]("v") < p.getAs[Double]("v")
    val up: (Row, Row) => Boolean =
      (p, c) => p != null && c.getAs[Double]("v") > p.getAs[Double]("v")
    val ms = MatchRecognize(df, "k", "ord", "D U", Map("D" -> down, "U" -> up))
      .collect().toSeq
    assert(ms.map(_.part_key).sorted == Seq(1L, 2L))
  }

  test("reluctant +? stops at the FIRST viable continuation, greedy at the last") {
    val spk = spark
    import spk.implicits._
    val df = Seq[Double](5, 4, 6, 7).zipWithIndex
      .map { case (v, i) => Tick(1L, i.toLong, v) }.toDF()
    val any: (Row, Row) => Boolean = (_, _) => true
    val up: (Row, Row) => Boolean =
      (p, c) => p != null && c.getAs[Double]("v") > p.getAs[Double]("v")
    val defs = Map("A" -> any, "U" -> up)
    // greedy: A+ backtracks from the end → U is the LAST rise (ord 3)
    val g = MatchRecognize(df, "k", "ord", "A+ U", defs).collect().toSeq
    assert(g.map(m => (m.start_ord, m.end_ord, m.n_rows)) == Seq((0L, 3L, 4L)))
    // reluctant: A+? takes the FEWEST A rows → U is the FIRST rise (ord 2)
    val r = MatchRecognize(df, "k", "ord", "A+? U", defs).collect().toSeq
    assert(r.map(m => (m.start_ord, m.end_ord, m.n_rows)) == Seq((0L, 2L, 3L)))
  }

  test("ctx DEFINE: physical PREV(n)/NEXT navigation") {
    val spk = spark
    import spk.implicits._
    import MatchRecognize.MatchCtx
    val df = Seq[Double](1, 2, 3, 4, 1, 1).zipWithIndex
      .map { case (v, i) => Tick(1L, i.toLong, v) }.toDF()
    def v(r: Row): Double = if (r == null) Double.NaN else r.getAs[Double]("v")
    // X: two-back rise (PREV(v, 2) comparison), null-rejecting
    val x: MatchCtx => Boolean =
      ctx => ctx.prev(2) != null && v(ctx.row) > v(ctx.prev(2))
    val xs = MatchRecognize.measuresCtx(df, "k", "ord", "X{2,}", Map("X" -> x), "v")
      .collect().toSeq
    assert(xs.map(m => (m.start_ord, m.end_ord, m.n_rows)) == Seq((2L, 3L, 2L)))
    // Y: the NEXT row falls below the current one (lookahead)
    val y: MatchCtx => Boolean =
      ctx => ctx.next(1) != null && v(ctx.next(1)) < v(ctx.row)
    val ys = MatchRecognize.measuresCtx(df, "k", "ord", "Y", Map("Y" -> y), "v")
      .collect().toSeq.sortBy(_.start_ord)
    assert(ys.map(_.start_ord) == Seq(3L)) // only 4 → 1 falls
  }

  test("ctx DEFINE: running FIRST/LAST over a SUBSET union") {
    val spk = spark
    import spk.implicits._
    import MatchRecognize.MatchCtx
    val df = Seq[Double](10, 9, 8, 11).zipWithIndex
      .map { case (v, i) => Tick(1L, i.toLong, v) }.toDF()
    def v(r: Row): Double = if (r == null) Double.NaN else r.getAs[Double]("v")
    val down: MatchCtx => Boolean =
      ctx => ctx.prev(1) != null && v(ctx.row) < v(ctx.prev(1))
    // R: recovery ABOVE the match's first mapped row (via subset W) and
    // above the last D row — running FIRST/LAST navigation in DEFINE
    val rec: MatchCtx => Boolean = ctx =>
      ctx.first("W") != null && v(ctx.row) > v(ctx.first("W")) &&
        ctx.last("D") != null && v(ctx.row) > v(ctx.last("D"))
    val ms = MatchRecognize.measuresCtx(df, "k", "ord", "D+ R",
      Map("D" -> down, "R" -> rec), "v",
      subsets = Map("W" -> Set("D", "R"))).collect().toSeq
    // match = falls at ord 1,2 then 11 > first(W)=9 and > last(D)=8
    assert(ms.map(m => (m.start_ord, m.end_ord, m.n_rows, m.first_val, m.last_val))
      == Seq((1L, 3L, 3L, 9.0, 11.0)))
  }

  test("AFTER MATCH SKIP TO LAST resolves SUBSET union names") {
    val spk = spark
    import spk.implicits._
    import MatchRecognize.MatchCtx
    val df = Seq[Double](5, 4, 6, 5, 7).zipWithIndex
      .map { case (v, i) => Tick(1L, i.toLong, v) }.toDF()
    def v(r: Row): Double = if (r == null) Double.NaN else r.getAs[Double]("v")
    val down: MatchCtx => Boolean =
      ctx => ctx.prev(1) != null && v(ctx.row) < v(ctx.prev(1))
    val up: MatchCtx => Boolean =
      ctx => ctx.prev(1) != null && v(ctx.row) > v(ctx.prev(1))
    val defs = Map("D" -> down, "U" -> up)
    def run(skip: MatchRecognize.SkipMode) =
      MatchRecognize.measuresCtx(df, "k", "ord", "D U", defs, "v",
        skip = skip, subsets = Map("W" -> Set("D", "U")))
        .collect().toSeq.sortBy(_.start_ord).map(m => (m.start_ord, m.end_ord))
    // W's last row IS U's last row, so both skips resume identically
    assert(run(MatchRecognize.SkipMode.ToLast("W")) ==
      run(MatchRecognize.SkipMode.ToLast("U")))
    assert(run(MatchRecognize.SkipMode.ToLast("W")) == Seq((1L, 2L), (3L, 4L)))
  }

  test("allRowsWithUnmatched: every row once, nulls outside matches") {
    val spk = spark
    import spk.implicits._
    // series 5, 6, 7, 3, 4, 2: matches U{2,} at rows 1-2 (6,7) and a
    // single rise at row 4 (4) that is too short — rows 0, 3, 4, 5 unmatched
    val df = Seq(5.0, 6.0, 7.0, 3.0, 4.0, 2.0).zipWithIndex
      .map { case (v, i) => Tick(1L, i.toLong, v) }.toDF()
    val up: (Row, Row) => Boolean =
      (p, c) => p != null && c.getAs[Double]("v") > p.getAs[Double]("v")
    val rows = MatchRecognize.allRowsWithUnmatched(df, "k", "ord", "U{2,}",
        Map("U" -> up), "v")
      .collect().toSeq.sortBy(_.ord)
    assert(rows.map(_.ord) == Seq(0L, 1L, 2L, 3L, 4L, 5L)) // each row once
    assert(rows.filter(_.match_no.isDefined).map(_.ord) == Seq(1L, 2L))
    val matched = rows.filter(_.match_no.isDefined)
    assert(matched.forall(_.match_no.contains(1L)))
    assert(matched.map(_.running_cnt.get) == Seq(1L, 2L))
    assert(matched.map(_.running_max.get) == Seq(6.0, 7.0))
    assert(matched.forall(_.final_last.contains(7.0)))
    val unmatched = rows.filter(_.match_no.isEmpty)
    assert(unmatched.map(_.ord) == Seq(0L, 3L, 4L, 5L))
    assert(unmatched.forall(r => r.classifier.isEmpty && r.running_cnt.isEmpty &&
      r.final_cnt.isEmpty && r.running_max.isEmpty && r.final_last.isEmpty))
  }

  test("matchesShowEmpty: zero-width pattern emits numbered empty matches") {
    val spk = spark
    import spk.implicits._
    // 5, 4, 3, 6, 2 → empty at 0, 'DD' at 1-2, empty at 3, 'D' at 4
    val df = Seq(5.0, 4.0, 3.0, 6.0, 2.0).zipWithIndex
      .map { case (v, i) => Tick(1L, i.toLong, v) }.toDF()
    val down: (Row, Row) => Boolean =
      (p, c) => p != null && c.getAs[Double]("v") < p.getAs[Double]("v")
    val rows = MatchRecognize.matchesShowEmpty(df, "k", "ord", "D*",
        Map("D" -> down))
      .collect().toSeq.sortBy(_.match_no)
      .map(r => (r.match_no, r.anchor_ord, r.n_rows, r.classifier))
    assert(rows == Seq(
      (1L, 0L, 0L, None),
      (2L, 1L, 2L, Some("DD")),
      (3L, 3L, 0L, None),
      (4L, 4L, 1L, Some("D"))))
  }

  test("partition anchors: ^ pins match start, $ pins match end") {
    // 12,11,3,15: H (v>=10) holds at rows 0,1,3 — unanchored H+ finds
    // two runs; ^ H+ keeps only the one starting at the partition's
    // first row; H+ $ only the one ending at its last row.
    val vals = Seq[Double](12, 11, 3, 15)
    assert(runPat(vals, "H+").map(m => (m.start_ord, m.n_rows)) ==
      Seq((0L, 2L), (3L, 1L)))
    assert(runPat(vals, "^ H+").map(m => (m.start_ord, m.n_rows)) ==
      Seq((0L, 2L)))
    assert(runPat(vals, "H+ $").map(m => (m.start_ord, m.n_rows)) ==
      Seq((3L, 1L)))
    // anchored both ends: only a pattern spanning the whole partition
    assert(runPat(vals, "^ H+ $").isEmpty)
    assert(runPat(Seq[Double](12, 11, 15), "^ H+ $")
      .map(m => (m.start_ord, m.n_rows)) == Seq((0L, 3L)))
    // ^ D+ can never match: D needs a PREV row, the anchor forces row 0
    assert(runPat(Seq[Double](5, 4, 3), "^ D+").isEmpty)
  }

  test("partition anchors: anchored empty matches only at the boundary") {
    val spk = spark
    import spk.implicits._
    // 5,6,7: D never matches, so ^ D* yields ONE empty match at row 0 —
    // not one per row like unanchored D* (matchesShowEmpty contract).
    val df = Seq(5.0, 6.0, 7.0).zipWithIndex
      .map { case (v, i) => Tick(1L, i.toLong, v) }.toDF()
    val down: (Row, Row) => Boolean =
      (p, c) => p != null && c.getAs[Double]("v") < p.getAs[Double]("v")
    val anchored = MatchRecognize.matchesShowEmpty(df, "k", "ord", "^ D*",
        Map("D" -> down))
      .collect().toSeq.sortBy(_.match_no)
      .map(r => (r.match_no, r.anchor_ord, r.n_rows))
    assert(anchored == Seq((1L, 0L, 0L)))
    val unanchored = MatchRecognize.matchesShowEmpty(df, "k", "ord", "D*",
        Map("D" -> down)).collect()
    assert(unanchored.length == 3)
  }

  test("partition anchors: quantified anchors parse (zero-width collapse)") {
    // r13: anchors are quantifiable per the reference's testEmptyCycle
    // vectors (`^+`, `$*`) — the zero-width collapse rule terminates
    // the loop, so these are legal patterns now.
    MatchRecognize.parse("^* D")
    MatchRecognize.parse("D $+")
  }

  test("aggMeasures: per-variable and universal FINAL aggregates") {
    val spk = spark
    import spk.implicits._
    // series 10, 8, 5, 7, 9, 9: one V-shape D+ U+ = rows 1-4
    // (values 8, 5 falling; 7, 9 rising); the trailing flat 9 is out
    val df = Seq(10.0, 8.0, 5.0, 7.0, 9.0, 9.0).zipWithIndex
      .map { case (v, i) => Tick(1L, i.toLong, v) }.toDF()
    val down: (Row, Row) => Boolean =
      (p, c) => p != null && c.getAs[Double]("v") < p.getAs[Double]("v")
    val up: (Row, Row) => Boolean =
      (p, c) => p != null && c.getAs[Double]("v") > p.getAs[Double]("v")
    val rows = MatchRecognize.aggMeasures(df, "k", "ord", "D+ U+",
        Map("D" -> down, "U" -> up), "v")
      .collect().toSeq.sortBy(_.var_name)
      .map(r => (r.var_name, r.var_rows, r.sum_val, r.avg_val, r.min_val,
        r.max_val, r.start_ord, r.end_ord))
    assert(rows == Seq(
      ("*", 4L, 29.0, 7.25, 5.0, 9.0, 1L, 4L),
      ("D", 2L, 13.0, 6.5, 5.0, 8.0, 1L, 4L),
      ("U", 2L, 16.0, 8.0, 7.0, 9.0, 1L, 4L)))
  }

  test("aggMeasures sum is exact for 2-dp values regardless of order") {
    val spk = spark
    import spk.implicits._
    // 0.1 + 0.2 famously != 0.3 in IEEE; the scaled-long sum is exact
    val df = Seq(1.0, 0.1, 0.2, 0.3).zipWithIndex
      .map { case (v, i) => Tick(1L, i.toLong, v) }.toDF()
    val down: (Row, Row) => Boolean =
      (p, c) => p != null && c.getAs[Double]("v") < p.getAs[Double]("v")
    val up: (Row, Row) => Boolean =
      (p, c) => p != null && c.getAs[Double]("v") > p.getAs[Double]("v")
    val star = MatchRecognize.aggMeasures(df, "k", "ord", "D U+",
        Map("D" -> down, "U" -> up), "v")
      .collect().filter(_.var_name == "*").head
    assert(star.var_rows == 3L && star.sum_val == 0.6) // not 0.6000000000000001
  }
}
