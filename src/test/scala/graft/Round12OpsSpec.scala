package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Similarity, Stats, TextAnalysis, TimeSeries}

/** Hand-computed cases for the round-12 operators (the DuckDB oracles
  * check them end-to-end on the testdata; these pin the arithmetic on
  * inputs small enough to verify by hand). */
class Round12OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- winnowing --------------------------------------------------------

  /** Driver-side reference winnowing: the same word-hash → 3-gram →
    * packed-window-min → distinct chain as
    * [[graft.functions.HashNative.WinnowSelect]], written as plain Scala
    * so the native expression is checked against an INDEPENDENT
    * implementation, not against itself. */
  private def refWinnow(text: String, w: Int): Seq[(Long, Long)] = {
    val P = graft.functions.HashExprs.P
    val K = TextAnalysis.WinnowPosCap
    val wh = text.split(" ", -1).map { word =>
      word.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % P)
    }
    if (wh.length < 3) return Seq.empty
    val g = (0 to wh.length - 3)
      .map(i => ((wh(i) * 31 + wh(i + 1)) % P * 31 + wh(i + 2)) % P)
    val m = g.length
    val sel = scala.collection.mutable.LinkedHashSet.empty[Long]
    for (j <- 0 to math.max(m - w, 0)) {
      val mn = (j + 1 to math.min(j + w, m))
        .map(p => g(p - 1) * K + K - p).min
      sel += mn
    }
    sel.toSeq.map(e => (K - e % K, e / K))
  }

  test("winnowFingerprints matches the driver-side reference chain") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b",                       // < 3 words: no grams, no rows
      "x y z",                     // exactly one gram: one whole-array window
      "a a a a a a a a",           // all-equal grams: rightmost-tie rule
      "one two three four five six seven eight nine ten eleven twelve")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.winnowFingerprints(docs, "doc_id", "text", w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = texts.zipWithIndex.flatMap { case (t, i) =>
      refWinnow(t, 4).map { case (pos, fp) => (i.toLong, pos, fp) }
    }.toSet
    assert(got === want)
    // all-equal grams: every window picks the RIGHTMOST position in the
    // first window, then each new window's new rightmost element —
    // positions are the window right edges 4..6 for m=6, w=4
    val allEq = got.filter(_._1 == 3L).map(_._2)
    assert(allEq === Set(4L, 5L, 6L))
  }

  test("winnowing guarantee: a shared >= w+2 word run yields a shared fp") {
    // doc 0 and 1 share the 7-word run "alpha beta gamma delta epsilon
    // zeta eta" (> w + 2 = 6) embedded in different contexts
    val docs = Seq(
      (0L, "intro alpha beta gamma delta epsilon zeta eta closing words"),
      (1L, "other start alpha beta gamma delta epsilon zeta eta tail"),
      (2L, "completely unrelated text with no shared runs at all"))
      .toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowPairs(docs, "doc_id", "text",
      w = 4, minShared = 1, dfCap = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((0L, 1L)))
  }

  test("winnowPairs: dfCap drops boilerplate fingerprints") {
    // the same 8-word boilerplate in every doc; dfCap = 2 < 3 docs kills
    // every shared fingerprint -> no pairs survive
    val bp = "this page is copyright two thousand twenty four"
    val docs = Seq((0L, bp), (1L, bp), (2L, bp)).toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowPairs(docs, "doc_id", "text",
      w = 4, minShared = 1, dfCap = 2)
    assert(pairs.count() === 0L)
  }

  // ---- TimeSeries.theilSen ----------------------------------------------

  test("theilSen: hand median of pairwise daily slopes") {
    // one group, days 1970-01-01/02/03 with counts 1, 2, 4:
    // slopes (2-1)/1 = 1, (4-1)/2 = 1.5, (4-2)/1 = 2 -> median 1.5e6
    val ev = (Seq.fill(1)("2024-01-01") ++ Seq.fill(2)("2024-01-02") ++
      Seq.fill(4)("2024-01-03")).map(d => ("g", s"$d 00:00:00"))
      .toDF("event_type", "ts")
    val row = TimeSeries.theilSen(ev, "event_type", "ts").head()
    assert(row.getString(0) === "g")
    assert(row.getLong(1) === 3L)       // n_days
    assert(row.getLong(2) === 3L)       // n_pairs
    assert(row.getLong(3) === 1500000L) // slope_micro
    // even pair count takes the LOWER median: days 1..4 counts 1,2,4,4
    // slopes: 1, 1.5, 1, 2, 1, 0 -> sorted 0,1,1,1,1.5,2; m=6 rn=3 -> 1e6
    val ev2 = (Seq.fill(1)("2024-01-01") ++ Seq.fill(2)("2024-01-02") ++
      Seq.fill(4)("2024-01-03") ++ Seq.fill(4)("2024-01-04"))
      .map(d => ("g", s"$d 00:00:00")).toDF("event_type", "ts")
    assert(TimeSeries.theilSen(ev2, "event_type", "ts").head()
      .getLong(3) === 1000000L)
  }

  // ---- Stats.weightOfEvidence -------------------------------------------

  test("weightOfEvidence: hand smoothed WoE/IV, null category sentinel") {
    // cats a: (pos 1, neg 1), b: (pos 2, neg 0); tp=3 tn=1 c=2
    val df = Seq(("a", true), ("a", false), ("b", true), ("b", true))
      .toDF("cat", "y")
    val out = Stats.weightOfEvidence(df, col("cat"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    def woe(np: Long, nn: Long, tp: Long, tn: Long, c: Long): Long = {
      val l = math.log(((2.0 * np + 1) * (2 * tn + c)) /
        ((2.0 * nn + 1) * (2 * tp + c)))
      math.round(1e6 * l)
    }
    def iv(np: Long, nn: Long, tp: Long, tn: Long, c: Long): Long = {
      val l = math.log(((2.0 * np + 1) * (2 * tn + c)) /
        ((2.0 * nn + 1) * (2 * tp + c)))
      math.round(1e6 * ((2.0 * np + 1) / (2 * tp + c)
        - (2.0 * nn + 1) / (2 * tn + c)) * l)
    }
    assert(out("a") === ((1L, 1L, woe(1, 1, 3, 1, 2), iv(1, 1, 3, 1, 2))))
    assert(out("b") === ((2L, 0L, woe(2, 0, 3, 1, 2), iv(2, 0, 3, 1, 2))))
    // null category folds to the sentinel, not dropped
    val withNull = Seq((Some("a"), true), (None, false)).toDF("cat", "y")
    val cats = Stats.weightOfEvidence(withNull, col("cat"), col("y"))
      .collect().map(_.getString(0)).toSet
    assert(cats === Set("a", ""))
  }

  // ---- TextAnalysis.vocabGrowth / heapsLaw ------------------------------

  test("vocabGrowth: hand cumulative curve at step 1") {
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "c d e"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(docs, "doc_id", "text", step = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 2L), (2L, 4L, 3L), (3L, 7L, 5L)))
  }

  test("vocabGrowth: final rank always emitted even off-step") {
    val docs = Seq((1L, "a b"), (2L, "b c"), (3L, "c d"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(docs, "doc_id", "text", step = 2L)
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(2L, 3L)) // step hit + final rank 3
  }

  test("heapsLaw: two sampled points make the fit exact") {
    // step 2 with 4 docs samples r=2 and r=4: the 2-point OLS line passes
    // through both points, so beta = (y2-y1)/(x2-x1) exactly
    val docs = Seq((1L, "a b"), (2L, "c d"), (3L, "a c e"), (4L, "f g h"))
      .toDF("doc_id", "text")
    val row = TextAnalysis.heapsLaw(docs, "doc_id", "text", step = 2L).head()
    assert(row.getLong(0) === 2L)
    val x1 = math.round(1e6 * math.log(4.0))  // r=2: N=4, V=4
    val y1 = math.round(1e6 * math.log(4.0))
    val x2 = math.round(1e6 * math.log(10.0)) // r=4: N=10, V=8
    val y2 = math.round(1e6 * math.log(8.0))
    val beta = (y2 - y1).toDouble / (x2 - x1)
    assert(row.getLong(1) === math.round(1e6 * beta))
    assert(row.getLong(2) === math.round((y1 - beta * x1 + y2 - beta * x2) / 2))
  }

  // ---- Similarity.truncationRecall --------------------------------------

  test("truncationRecall: zero-padded tail gives perfect recall, " +
    "adversarial tail degrades it") {
    // corpus where dims 3..4 are all zero: truncation to 2 dims changes
    // nothing -> recall 10000 bp for every query
    val pad = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.5f, 0.5f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val perfect = Similarity.truncationRecall(pad, "vec_id", "embedding",
      k = 2, dims = 2, nQueries = 2)
    assert(perfect.collect().map(_.getLong(2)).toSeq === Seq(10000L, 10000L))
    // query 0 = (1,0,...): full-cosine top-1 is vec 2 (tail matches), but
    // truncated to 2 dims vec 2 looks orthogonal -> vec 1 wins instead
    val adv = Seq(
      (0L, Array(1.0f, 0.0f, 1.0f, 1.0f)),
      (1L, Array(0.1f, 0.9f, -1.0f, -1.0f)),
      (2L, Array(0.0f, 0.1f, 1.0f, 1.0f))).toDF("vec_id", "embedding")
    val got = Similarity.truncationRecall(adv, "vec_id", "embedding",
      k = 1, dims = 2, nQueries = 1).head()
    assert(got.getLong(1) === 0L && got.getLong(2) === 0L)
  }

  // ---- round-13 hardening of the round-12 operators ----------------------

  test("WinnowSelect: gram count past posCap fails loud, at the cap is fine") {
    import graft.functions.HashNative
    val df = Seq(Tuple1(Array(5L, 3L, 7L, 2L, 9L, 4L))).toDF("g")
    // cap = 4 < 6 grams: the packed (K - p) offset would go negative for
    // p in {5, 6} — must throw, never silently mis-select
    val boom = intercept[Throwable] {
      df.select(HashNative.winnowSelect(col("g"), 3, 4L).as("s")).collect()
    }
    val msgs = Iterator.iterate[Throwable](boom)(_.getCause)
      .takeWhile(_ != null).take(8)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msgs.contains("position cap"), s"unexpected failure: $msgs")
    // cap = exactly m: every position packs non-negative — selection runs.
    // Windows of 3 over [5,3,7,2,9,4] (1-based, K=6): window mins are
    // 3*6+(6-2)=22 once, then 2*6+(6-4)=14 for the remaining three.
    val ok = df.select(HashNative.winnowSelect(col("g"), 3, 6L).as("s"))
      .head().getSeq[Long](0)
    val decoded = ok.map(e => (e / 6L, 6L - e % 6L))
    assert(decoded === Seq((3L, 2L), (2L, 4L)))
  }

  test("winnowFingerprints output is invariant to the posCap constant") {
    // pos/fp decode must not depend on K: fp = h, pos = p for any K >= m
    import graft.functions.HashNative
    val g = Array(5L, 3L, 7L, 2L, 9L, 4L)
    val df = Seq(Tuple1(g)).toDF("g")
    def run(cap: Long): Seq[(Long, Long)] =
      df.select(HashNative.winnowSelect(col("g"), 3, cap).as("s"))
        .head().getSeq[Long](0).map(e => (e / cap, cap - e % cap))
    assert(run(8L) === run(1L << 31))
  }

  test("heapsFit: degenerate check is DECIMAL-exact past 2^53") {
    import org.apache.spark.sql.types._
    // n*sxx = 9007199326062757 and sx*sx = 94906266^2 = 9007199326062756
    // collide after a double cast (both round to ...756) but differ as
    // decimals: the fit must NOT report the spurious zero-variance NULL
    val schema = StructType(Seq(
      StructField("n_points", LongType),
      StructField("sx", DecimalType(38, 0)), StructField("sy", DecimalType(38, 0)),
      StructField("sxy", DecimalType(38, 0)), StructField("sxx", DecimalType(38, 0))))
    def dec(v: BigInt) = new java.math.BigDecimal(v.bigInteger)
    assert(BigInt(94906266L) * 94906266L === BigInt("9007199326062756"))
    val row = org.apache.spark.sql.Row(1L, dec(BigInt(94906266L)),
      dec(BigInt(1L)), dec(BigInt(1L)), dec(BigInt("9007199326062757")))
    val moments = spark.createDataFrame(
      java.util.Arrays.asList(row), schema)
    val got = TextAnalysis.heapsFit(moments).head()
    assert(!got.isNullAt(1), "double-cast collision must not NULL the fit")
    // and a GENUINELY degenerate pair of the same magnitude stays NULL
    val row2 = org.apache.spark.sql.Row(1L, dec(BigInt(94906266L)),
      dec(BigInt(1L)), dec(BigInt(1L)), dec(BigInt("9007199326062756")))
    val got2 = TextAnalysis.heapsFit(spark.createDataFrame(
      java.util.Arrays.asList(row2), schema)).head()
    assert(got2.isNullAt(1) && got2.isNullAt(2))
  }

  test("theilSen: maxSpanDays guard refuses a multi-decade span") {
    val ev = Seq(
      ("a", java.sql.Timestamp.valueOf("1995-01-01 00:00:00")),
      ("a", java.sql.Timestamp.valueOf("1995-01-02 00:00:00")),
      ("a", java.sql.Timestamp.valueOf("2015-06-01 00:00:00")))
      .toDF("event_type", "ts")
    val boom = intercept[IllegalArgumentException] {
      TimeSeries.theilSen(ev, "event_type", "ts", maxSpanDays = 100)
    }
    assert(boom.getMessage.contains("maxSpanDays"))
    // inside the bound: runs, and the hand case still holds
    val ok = TimeSeries.theilSen(ev.filter(col("ts") < "2000-01-01"),
      "event_type", "ts", maxSpanDays = 100)
    assert(ok.count() === 1L)
  }
}
