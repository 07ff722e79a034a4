package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.operators.{MediaCodec, Stats, TimeSeries}

/** Round-14b operators: hand-computed references and degenerate shapes for
  * the signed-rank / variance-gate / post-hoc family, the Ljung-Box / EWMA
  * composition, and the PCM WAV stats decode. The sf-corpus behavior is
  * covered by the oracle rows; these pin the closed forms on inputs small
  * enough to verify by hand.
  */
class Round14bOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- Wilcoxon signed-rank -------------------------------------------

  test("wilcoxonSignedRank: textbook small sample, ties and zero-diffs") {
    // pairs (x, y): diffs d = x - y = [2, 2, -1, 0, 4] -> zero drops,
    // |d| = [2, 2, 1, 4], midranks: 1 -> 1; {2, 2} -> 2.5; 4 -> 4.
    // Positive d: both 2s and the 4 -> W+ = 2.5 + 2.5 + 4 = 9 (w2 = 18).
    val pairs = Seq((5L, 3L), (7L, 5L), (2L, 3L), (9L, 9L), (8L, 4L))
      .toDF("x", "y")
    val r = Stats.wilcoxonSignedRank(pairs, "x", "y").collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_pairs") === 4L)
    assert(r(0).getAs[Long]("w2_plus") === 18L)
    // z = (9 - 4*5/4) / sqrt(4*5*9/24 - (2^3-2)/48)
    val expectZ = (9.0 - 5.0) / math.sqrt(4.0 * 5 * 9 / 24.0 - 6.0 / 48.0)
    assert(math.abs(r(0).getAs[Double]("z") - expectZ) < 1e-6)
  }

  test("wilcoxonSignedRank: all pairs tied -> degenerate NULL z") {
    val pairs = Seq((1L, 1L), (4L, 4L)).toDF("x", "y")
    val r = Stats.wilcoxonSignedRank(pairs, "x", "y").collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_pairs") === 0L)
    assert(r(0).isNullAt(r(0).fieldIndex("z")))
  }

  // ---- Brown-Forsythe ---------------------------------------------------

  test("brownForsythe: two groups, hand-computed F over lower-median deviations") {
    // g=a: values 0, 2, 4 (median 2) -> z = [2, 0, 2]; S_a = 4, Q_a = 8
    // g=b: values 0, 10, 20 (median 10) -> z = [10, 0, 10]; S_b = 20, Q_b = 200
    // N = 6, k = 2; T = 1e6*(16/3) + 1e6*(400/3) rounded per group
    val df = Seq(("a", 0L), ("a", 2L), ("a", 4L),
      ("b", 0L), ("b", 10L), ("b", 20L)).toDF("g", "v")
    val r = Stats.brownForsythe(df, "g", "v", valScale = 1.0).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n") === 6L)
    assert(r(0).getAs[Long]("n_groups") === 2L)
    val tAll = math.round(1e6 * 16.0 / 3) + math.round(1e6 * 400.0 / 3)
    val ssb = tAll / 1e6 - 24.0 * 24 / 6
    val ssw = 208.0 - tAll / 1e6
    val expectF = math.round(1e6 * (ssb / 1.0) / (ssw / 4.0))
    assert(r(0).getAs[Long]("f_micro") === expectF)
  }

  test("brownForsythe: even-sized group uses the LOWER median (2nd of 4)") {
    // g=a: 1,3,5,9 -> lower median 3 (NOT 5): z = [2,0,2,6]; S_a = 10, Q_a = 44
    // g=b: 0,4 -> lower median 0: z = [0,4]; S_b = 4, Q_b = 16
    val df = Seq(("a", 1L), ("a", 3L), ("a", 5L), ("a", 9L),
      ("b", 0L), ("b", 4L)).toDF("g", "v")
    val r = Stats.brownForsythe(df, "g", "v", valScale = 1.0).collect()(0)
    assert(r.getAs[Long]("n") === 6L)
    val tAll = math.round(1e6 * 100.0 / 4) + math.round(1e6 * 16.0 / 2)
    val ssb = tAll / 1e6 - 14.0 * 14 / 6
    val ssw = 60.0 - tAll / 1e6
    assert(r.getAs[Long]("f_micro") ===
      math.round(1e6 * (ssb / 1.0) / (ssw / 4.0)))
  }

  test("brownForsythe: single group and zero within-variance degenerate to NULL") {
    val one = Seq(("a", 1L), ("a", 5L)).toDF("g", "v")
    val r1 = Stats.brownForsythe(one, "g", "v", valScale = 1.0).collect()(0)
    assert(r1.isNullAt(r1.fieldIndex("f_micro")))
    // two constant groups: every deviation from the group median is 0,
    // SSW = 0 -> NULL (not a division blow-up)
    val sym = Seq(("a", 5L), ("a", 5L), ("b", 9L), ("b", 9L))
      .toDF("g", "v")
    val r2 = Stats.brownForsythe(sym, "g", "v", valScale = 1.0).collect()(0)
    assert(r2.isNullAt(r2.fieldIndex("f_micro")))
  }

  // ---- Dunn post-hoc -----------------------------------------------------

  test("dunnPosthoc: 3 groups -> 3 BH-adjusted pairs, adjusted p monotone in rank") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 4L), ("b", 5L), ("b", 6L),
      ("c", 1L), ("c", 6L), ("c", 3L)).toDF("g", "v")
    val rows = Stats.dunnPosthoc(df, "g", "v", valScale = 1.0)
      .orderBy(col("rn")).collect()
    assert(rows.length === 3)
    assert(rows.map(_.getAs[String]("k")).toSet ===
      Set("a|b", "a|c", "b|c"))
    val padj = rows.map(_.getAs[Long]("p_adj_micro"))
    assert(padj.forall(p => p >= 0L && p <= 1000000L))
    // BH suffix-min: adjusted p is non-decreasing down the rank order
    assert(padj.sliding(2).forall(w => w(0) <= w(1)))
    // the most separated pair (a vs b, disjoint ranges) ranks first
    assert(rows(0).getAs[String]("k") === "a|b")
  }

  // ---- Ljung-Box ----------------------------------------------------------

  test("ljungBox: matches the closed form over acf's own output") {
    val ev = Tables14b.dailyEvents(spark,
      "g" -> Seq(3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8))
    val acf = TimeSeries.acf(ev, "event_type", "ts", 3).collect()
      .map(r => (r.getAs[Long]("lag"),
        r.getAs[Long]("n_days"), r.getAs[Long]("acf_micro")))
    val n = acf.head._2
    val sNano = acf.map { case (lag, nd, a) =>
      math.round(1e9 * (a / 1e6) * (a / 1e6) / (nd - lag)) }.sum
    val expect = math.round(1e6 * n.toDouble * (n + 2) * (sNano / 1e9))
    val lb = TimeSeries.ljungBox(ev, "event_type", "ts", 3).collect()
    assert(lb.length === 1)
    assert(lb(0).getAs[Long]("h_lags") === 3L)
    assert(lb(0).getAs[Long]("q_micro") === expect)
  }

  test("ljungBox: constant series (zero variance) yields no row") {
    val ev = Tables14b.dailyEvents(spark, "g" -> Seq(4, 4, 4, 4, 4, 4))
    assert(TimeSeries.ljungBox(ev, "event_type", "ts", 2).count() === 0L)
  }

  // ---- EWMA ----------------------------------------------------------------

  test("ewmaDaily: constant series smooths to itself; head uses truncated kernel") {
    val ev = Tables14b.dailyEvents(spark, "g" -> Seq(7, 7, 7, 7, 7))
    val rows = TimeSeries.ewmaDaily(ev, "event_type", "ts", 0.5, 3)
      .orderBy("d").collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getAs[Long]("ewma_micro") === 7000000L))
    // varying series: day 2 of [8, 2] with alpha=.5, window 3:
    // w = [1e6, 5e5]; y = (1e6*2 + 5e5*8)/(1.5e6) = 4
    val ev2 = Tables14b.dailyEvents(spark, "g" -> Seq(8, 2))
    val r2 = TimeSeries.ewmaDaily(ev2, "event_type", "ts", 0.5, 3)
      .orderBy("d").collect()
    assert(r2(0).getAs[Long]("ewma_micro") === 8000000L)
    assert(r2(1).getAs[Long]("ewma_micro") === 4000000L)
  }

  test("ewmaWeightsMicro: iterated multiplication, monotone decreasing") {
    val w = TimeSeries.ewmaWeightsMicro(0.25, 5)
    assert(w === Seq(1000000L, 750000L, 562500L, 421875L, 316406L))
  }

  // ---- matrix profile -----------------------------------------------------

  test("matrixProfile: period-3 series finds its exact motifs, ties to smallest j") {
    // counts 1,2,3 repeating over 9 days; m=3, exclusion 1:
    // window i matches window i±3 exactly (dist 0)
    val ev = Tables14b.dailyEvents(spark, "g" -> Seq(1, 2, 3, 1, 2, 3, 1, 2, 3))
    val rows = TimeSeries.matrixProfile(ev, "event_type", "ts", 3)
      .orderBy("win_start").collect()
    assert(rows.length === 7)
    assert(rows.forall(_.getAs[Long]("p_dist") === 0L))
    // argmin tie-break: smallest neighbor index
    val nn = rows.map(r => r.getAs[Long]("win_start") -> r.getAs[Long]("nn_idx"))
    assert(nn.toSeq === Seq(1L -> 4L, 2L -> 5L, 3L -> 6L, 4L -> 1L,
      5L -> 2L, 6L -> 3L, 7L -> 1L))
  }

  test("matrixProfile: discord window carries the largest profile value") {
    // flat series with one spike: the windows containing the spike are
    // the discords (largest min-distance)
    val ev = Tables14b.dailyEvents(spark,
      "g" -> Seq(2, 2, 2, 2, 9, 2, 2, 2, 2, 2))
    val rows = TimeSeries.matrixProfile(ev, "event_type", "ts", 3)
      .collect()
    val byWin = rows.map(r =>
      r.getAs[Long]("win_start") -> r.getAs[Long]("p_dist")).toMap
    val spikeWins = Seq(3L, 4L, 5L) // windows covering day 5
    val flatMax = byWin.filterNot(kv => spikeWins.contains(kv._1)).values.max
    assert(spikeWins.map(byWin).min > flatMax)
  }

  test("matrixProfile: neighbor-less windows emit NULL profile, not no row") {
    // 4-day span, m=3, exclusion 1 -> 2 windows but a non-trivial pair
    // needs j > i+1: neither window has a neighbor; both rows must still
    // appear, with NULL p_dist/nn_idx ("no neighbor" != "no window")
    val ev = Tables14b.dailyEvents(spark, "g" -> Seq(1, 2, 3, 4))
    val rows = TimeSeries.matrixProfile(ev, "event_type", "ts", 3)
      .orderBy("win_start").collect()
    assert(rows.length === 2)
    assert(rows.map(_.getAs[Long]("win_start")).toSeq === Seq(1L, 2L))
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("p_dist"))
      && r.isNullAt(r.fieldIndex("nn_idx"))))
  }

  test("matrixProfile: maxSpanDays gate fails loud") {
    val ev = Tables14b.dailyEvents(spark, "g" -> Seq.fill(12)(1))
    val e = intercept[IllegalArgumentException] {
      TimeSeries.matrixProfile(ev, "event_type", "ts", 3, maxSpanDays = 10)
    }
    assert(e.getMessage.contains("maxSpanDays"))
  }

  // ---- runs test -----------------------------------------------------------

  test("runsTest: hand-computed runs and z over a 6-day series") {
    // counts 1,5,2,6,3,7; 6 days even -> LOWER median 3 (the 3rd order
    // statistic, not the 4th) drops day 5; signs -,+,-,+,+
    val ev = Tables14b.dailyEvents(spark, "g" -> Seq(1, 5, 2, 6, 3, 7))
    val r = TimeSeries.runsTest(ev, "event_type", "ts").collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_days") === 5L)
    assert(r(0).getAs[Long]("n_plus") === 3L)
    assert(r(0).getAs[Long]("n_minus") === 2L)
    assert(r(0).getAs[Long]("n_runs") === 4L)
    val mu = 2.0 * 3 * 2 / 5 + 1.0
    val sd = math.sqrt(2.0 * 3 * 2 * (2.0 * 3 * 2 - 5) / (25.0 * 4))
    assert(r(0).getAs[Long]("z_micro") === math.round(1e6 * (4.0 - mu) / sd))
  }

  test("runsTest: one-sided series degenerates to NULL z") {
    // counts 5,1,5,1,5,1 -> lower median 1 (cum 3 of 6 lands on x=1);
    // every surviving day is above it -> n_minus = 0, sigma = 0
    val ev = Tables14b.dailyEvents(spark, "g" -> Seq(5, 1, 5, 1, 5, 1))
    val r = TimeSeries.runsTest(ev, "event_type", "ts").collect()(0)
    assert(r.getAs[Long]("n_plus") === 3L)
    assert(r.getAs[Long]("n_minus") === 0L)
    assert(r.isNullAt(r.fieldIndex("z_micro")))
  }

  // ---- Anderson-Darling k-sample -----------------------------------------

  test("andersonDarlingK: hand-computed midrank terms on a 4-row pool") {
    // a: {1,2}, b: {2,3}; doubled units: B2 = [1,4,7], group M2s worked
    // by hand -> per-(g,j) micro terms 666667/2000000/666667 twice
    // (each N x the textbook h_j/N-weighted term), S = 6666668,
    // A2 = S*(N-1)/N^2 = S*3/16 -> the published A2akN = 1.25
    val df = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L))
      .toDF("g", "v")
    val r = Stats.andersonDarlingK(df, "g", "v", valScale = 1.0)
      .collect()(0)
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Long]("n_groups") === 2L)
    assert(r.getAs[Long]("n_values") === 3L)
    assert(r.getAs[Long]("a2_micro") === math.round(6666668.0 * 3 / 16))
    assert(r.getAs[Long]("a2_micro") === 1250000L)
  }

  test("andersonDarlingK: single group / single value degenerate to NULL") {
    val one = Seq(("a", 1L), ("a", 2L)).toDF("g", "v")
    val r1 = Stats.andersonDarlingK(one, "g", "v", valScale = 1.0)
      .collect()(0)
    assert(r1.isNullAt(r1.fieldIndex("a2_micro")))
    val tied = Seq(("a", 5L), ("b", 5L)).toDF("g", "v")
    val r2 = Stats.andersonDarlingK(tied, "g", "v", valScale = 1.0)
      .collect()(0)
    assert(r2.isNullAt(r2.fieldIndex("a2_micro")))
  }

  // ---- Jonckheere-Terpstra -------------------------------------------------

  test("jonckheereTerpstra: hand-computed doubled JT mass and tie-corrected z") {
    // a: {1,2}, b: {2,3}, c: {4}; U_ab = 3.5, U_ac = 2, U_bc = 2
    // -> JT2 = 15; mean = (25 - 9)/4 = 4; var = 246/72 + 0 + 8/160
    val df = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L), ("c", 4L))
      .toDF("g", "v")
    val r = Stats.jonckheereTerpstra(df, "g", "v", valScale = 1.0)
      .collect()(0)
    assert(r.getAs[Long]("n") === 5L)
    assert(r.getAs[Long]("n_groups") === 3L)
    assert(r.getAs[Long]("jt2") === 15L)
    val variance = 246.0 / 72.0 + 4.0 * 2.0 / (8.0 * 5 * 4)
    val z = (15.0 / 2.0 - 4.0) / math.sqrt(variance)
    assert(r.getAs[Long]("z_micro") === math.round(1e6 * z))
  }

  test("jonckheereTerpstra: all values tied -> NULL z") {
    val df = Seq(("a", 7L), ("a", 7L), ("b", 7L)).toDF("g", "v")
    val r = Stats.jonckheereTerpstra(df, "g", "v", valScale = 1.0)
      .collect()(0)
    assert(r.isNullAt(r.fieldIndex("z_micro")))
  }

  // ---- video frame motion ---------------------------------------------------

  test("videoFrameMotion: consecutive-frame L1 matches the SyntheticGif formula") {
    import graft.operators.Multimodal
    val media = Seq(2L, 5L, 8L).toDF("doc_id") // 1 + id%3 = 3 frames each
      .withColumn("media",
        expr(graft.queries.SyntheticGif.mediaSql("doc_id")))
    val rows = Multimodal.videoFrameMotion(media, "doc_id", "media")
      .collect()
    assert(rows.length === 6) // 3 docs x 2 consecutive pairs
    def pix(id: Long, k: Int, c: Int): Int =
      ((id * 11 + k * 17 + (c % 9) * 23 + (c / 9) * 5) % 128).toInt
    for (r <- rows) {
      val id = r.getAs[Long]("id")
      val ka = r.getAs[Long]("frame_a").toInt
      val want = (0 until 63)
        .map(c => math.abs(2 * pix(id, ka, c) - 2 * pix(id, ka + 1, c)))
        .sum.toLong
      assert(r.getAs[Long]("motion_l1") === want, s"id=$id frame=$ka")
      assert(r.getAs[Long]("frame_b") === ka + 1L)
    }
  }

  // ---- survival: log-rank + Nelson-Aalen --------------------------------

  test("logRank: hand-computed O/E/V over two small cohorts") {
    // A: events at t=1, t=2; B: event at t=1, censored at t=3
    val subj = Seq(("a", 1L, 1L), ("a", 2L, 1L), ("b", 1L, 1L),
      ("b", 3L, 0L)).toDF("g", "dur", "obs")
    val r = graft.operators.Survival
      .logRank(subj, "g", "dur", "obs", "a", "b").collect()(0)
    assert(r.getAs[Long]("n_a") === 2L)
    assert(r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Long]("n_times") === 2L)
    assert(r.getAs[Long]("o_a") === 2L)
    // t=1: e = 2*2/4 = 1, v = 2*2*2*2/(4^2*3) = 1/3
    // t=2: e = 1*1/2 = 1/2, v = 1/(2^2*1) = 1/4
    assert(r.getAs[Long]("e_a_nano") === 1500000000L)
    assert(r.getAs[Long]("v_nano") === 333333333L + 250000000L)
    val v = (333333333L + 250000000L) / 1e9
    assert(r.getAs[Long]("chi2_micro") === math.round(1e6 * 0.25 / v))
  }

  test("logRank: empty cohort degenerates to NULL chi2") {
    val subj = Seq(("a", 1L, 1L), ("a", 2L, 1L)).toDF("g", "dur", "obs")
    val r = graft.operators.Survival
      .logRank(subj, "g", "dur", "obs", "a", "b").collect()(0)
    assert(r.isNullAt(r.fieldIndex("chi2_micro")))
  }

  test("nelsonAalen: hazard steps accumulate the exact d/n terms") {
    val subj = Seq((1L, 1L), (1L, 1L), (2L, 1L), (3L, 0L))
      .toDF("dur", "obs")
    val rows = graft.operators.Survival.nelsonAalen(subj, "dur", "obs")
      .orderBy("t").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Long]("t") === 1L)
    assert(rows(0).getAs[Long]("n_risk") === 4L)
    assert(rows(0).getAs[Long]("cum_hazard_nano") === 500000000L)
    assert(rows(1).getAs[Long]("t") === 2L)
    assert(rows(1).getAs[Long]("n_risk") === 2L)
    assert(rows(1).getAs[Long]("cum_hazard_nano") === 1000000000L)
  }

  // ---- WAV stats decode ------------------------------------------------

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def wav(channels: Int, samples: Seq[Seq[Int]]): Array[Byte] = {
    val dataLen = samples.length * 2 * channels
    val b = new scala.collection.mutable.ArrayBuffer[Byte]()
    b ++= "RIFF".getBytes("US-ASCII") ++= le32(36 + dataLen)
    b ++= "WAVE".getBytes("US-ASCII") ++= "fmt ".getBytes("US-ASCII")
    b ++= le32(16) ++= le16(1) ++= le16(channels) ++= le32(8000)
    b ++= le32(8000 * 2 * channels) ++= le16(2 * channels) ++= le16(16)
    b ++= "data".getBytes("US-ASCII") ++= le32(dataLen)
    for (fr <- samples; s <- fr) b ++= le16(s & 0xffff)
    b.toArray
  }

  test("decodeWavStats: mono hand-computed stats incl. crossings, silence, clip") {
    // frames: 100, -200, 0, 300, -30500, 32000
    val bytes = wav(1, Seq(Seq(100), Seq(-200), Seq(0), Seq(300),
      Seq(-30500), Seq(32000)))
    val st = MediaCodec.decodeWavStats(bytes).get
    assert(st(0) === 6L) // frames
    assert(st(1) === 1L) // channels
    assert(st(2) === 100L + 200 + 0 + 300 + 30500 + 32000) // sum |m|
    assert(st(3) === 100L * 100 + 200L * 200 + 300L * 300 +
      30500L * 30500 + 32000L * 32000) // sum m^2
    assert(st(4) === 32000L) // max |m|
    // crossings: 100->-200 (1), -200->0 (no: zero breaks), 0->300 (no),
    // 300->-30500 (2), -30500->32000 (3)
    assert(st(5) === 3L)
    assert(st(6) === 4L) // |m| < 328: 100, 200, 0, 300
    assert(st(7) === 2L) // 30500 and 32000 >= 30000
  }

  test("decodeWavStats: stereo channel fold is the truncating mean") {
    // frame 1: (3, 4) -> 7/2 = 3; frame 2: (-3, -4) -> -7/2 = -3 (Java /)
    val bytes = wav(2, Seq(Seq(3, 4), Seq(-3, -4)))
    val st = MediaCodec.decodeWavStats(bytes).get
    assert(st(0) === 2L)
    assert(st(1) === 2L)
    assert(st(2) === 6L)
    assert(st(3) === 18L)
    assert(st(5) === 1L) // 3 -> -3 crosses
  }

  test("decodeWavEnvelope: uniform gain cancels exactly at 63 frames") {
    // 63 mono frames map 1:1 onto the 63 envelope cells, so the
    // normalization e*255 div max sees (16a)*255 div (16*mx) = a*255
    // div mx — byte-identical envelope across volume
    val sig = (0 until 63).map(i => ((i * 997) % 3001) - 1500)
    val quiet = MediaCodec.decodeWavEnvelope(wav(1, sig.map(Seq(_)))).get
    val loud = MediaCodec.decodeWavEnvelope(
      wav(1, sig.map(s => Seq(s * 16)))).get
    assert(quiet.toSeq === loud.toSeq)
    // and the envelope really is the normalized |amplitude| sequence
    val mx = sig.map(math.abs).max
    val want = sig.map(s => (math.abs(s) * 255 / mx).toByte)
    assert(quiet.toSeq === want.toSeq)
  }

  // ---- classifier eval metrics ------------------------------------------

  test("evalMetrics: hand-computed confusion, MCC, Brier, ECE on a fixed scoring") {
    // steps=0 keeps w=0 -> every score is exactly 0.5, pred=true:
    // tp = positives, fp = negatives, fn = tn = 0 -> MCC NULL;
    // Brier = mean (0.5 - y)^2 = 0.25 -> 250000 micro;
    // one bin (5), |1e6*n_pos - sum sm| = |2e6 - 5*5e5| = 5e5 over n=5
    val feat = Seq((1.0, 1.0), (1.0, 1.0), (0.0, 1.0), (0.0, 1.0),
      (0.0, 1.0)).toDF("label", "x0")
    val r = graft.operators.Classifier
      .evalMetrics(feat, Seq("x0"), steps = 0, bins = 10).collect()(0)
    assert(r.getAs[Long]("n") === 5L)
    assert(r.getAs[Long]("tp") === 2L)
    assert(r.getAs[Long]("fp") === 3L)
    assert(r.getAs[Long]("fn") === 0L)
    assert(r.getAs[Long]("tn") === 0L)
    assert(r.isNullAt(r.fieldIndex("mcc_micro")))
    assert(r.getAs[Long]("brier_micro") === 250000L)
    assert(r.getAs[Long]("ece_micro") === math.round(500000.0 / 5))
  }

  test("decodeWavStats: malformed payloads -> None") {
    assert(MediaCodec.decodeWavStats(null).isEmpty)
    assert(MediaCodec.decodeWavStats(Array.fill[Byte](50)(0x41)).isEmpty)
    // 8-bit WAV (bits=8) rejected by the PCM16 contract
    val bad = wav(1, Seq(Seq(1)))
    bad(34) = 8 // bits-per-sample low byte
    assert(MediaCodec.decodeWavStats(bad).isEmpty)
    // truncated: header only
    assert(MediaCodec.decodeWavStats(wav(1, Seq(Seq(1))).take(44)).isEmpty)
  }
}

/** Builders shared by the round-14b specs. */
object Tables14b {
  /** One event row per (day, replicate): series(k) counts on day k for a
    * single-group event frame with the `events` schema subset the
    * TimeSeries operators read. */
  def dailyEvents(spark: org.apache.spark.sql.SparkSession,
      series: (String, Seq[Int])): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val (g, xs) = series
    xs.zipWithIndex.flatMap { case (x, day) =>
      Seq.fill(x)((g, java.sql.Timestamp.valueOf(
        f"2024-01-${day + 1}%02d 12:00:00")))
    }.toDF("event_type", "ts")
  }
}
