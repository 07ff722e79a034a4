package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{MediaCodec, Multimodal, PerceptualHash}
import graft.queries.SyntheticGif

class Round14OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ---- SyntheticGif: the SQL-constructed GIF really decodes -----------

  /** Pure-Scala twin of SyntheticGif's generating formula. */
  private def pixIdx(id: Long, k: Int, c: Int): Int =
    ((id * 11 + k * 17 + (c % 9) * 23 + (c / 9) * 5) % 128).toInt

  private def gifBytes(id: Long): Array[Byte] = {
    val nf = (1 + id % 3).toInt
    val sb = new StringBuilder(SyntheticGif.headerHex)
    for (k <- 0 until nf) {
      sb.append("2C000000000900070000").append("0741").append("80")
      for (c <- 0 until 63) sb.append(f"${pixIdx(id, k, c)}%02X")
      sb.append("8100")
    }
    sb.append("3B")
    sb.toString.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  }

  private def expectedHash(id: Long, k: Int): Long = {
    val cells = Array.tabulate(63)(c => 2L * pixIdx(id, k, c))
    var f = 0L
    for (b <- 0 until 56) {
      val i = (b / 8) * 9 + (b % 8)
      if (cells(i) > cells(i + 1)) f |= 1L << b
    }
    f
  }

  test("SyntheticGif: hand-rolled uncompressed-LZW GIF decodes to the formula grids") {
    for (id <- Seq(0L, 1L, 2L, 5L, 41L, 127L, 1000L)) {
      val bytes = gifBytes(id)
      assert(Multimodal.sniffFormat(bytes) === "gif")
      val frames = MediaCodec.decodeGifFrames(bytes, 32)
        .getOrElse(fail(s"id=$id: JDK reader rejected the constructed GIF"))
      assert(frames.length === (1 + id % 3).toInt, s"id=$id frame count")
      for ((grid, k) <- frames.zipWithIndex) {
        val want = Array.tabulate(63)(c => (2 * pixIdx(id, k, c)).toByte)
        assert(grid.toSeq === want.toSeq, s"id=$id frame=$k grid")
      }
    }
  }

  test("SyntheticGif: Spark-side mediaSql expr matches the byte-level twin") {
    import spark.implicits._
    val df = Seq(0L, 1L, 2L, 7L, 63L).toDF("doc_id")
      .withColumn("media", expr(SyntheticGif.mediaSql("doc_id")))
    val got = df.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    for ((id, bytes) <- got)
      assert(bytes.toSeq === gifBytes(id).toSeq, s"id=$id payload")
  }

  // ---- lineDedup -------------------------------------------------------

  test("lineDedup: corpus-frequent lines drop, order survives, empty doc hashes md5('')") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "BANNER\nalpha beta\ngamma"),
      (2L, "BANNER\ndelta"),
      (3L, "BANNER\nalpha beta\nepsilon"),
      (4L, "BANNER")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .lineDedup(docs, "doc_id", "text", maxLineDf = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // BANNER df=4 > 2 dropped; 'alpha beta' df=2 kept; singles kept
    assert(out(1L) === ((3L, 2L, m("alpha beta\ngamma"))))
    assert(out(2L) === ((2L, 1L, m("delta"))))
    assert(out(3L) === ((3L, 2L, m("alpha beta\nepsilon"))))
    assert(out(4L) === ((1L, 0L, m(""))))
    // df counts DOCUMENTS: a doc repeating its own line doesn't breach
    val rep = Seq((1L, "x\nx\nx"), (2L, "y")).toDF("doc_id", "text")
    val out2 = graft.operators.TextAnalysis
      .lineDedup(rep, "doc_id", "text", maxLineDf = 1)
      .filter(col("id") === 1L).collect()(0)
    assert(out2.getLong(1) === 3L && out2.getLong(2) === 3L)
  }

  // ---- Pii --------------------------------------------------------------

  test("Pii.redact: sequential counts and sentinel substitution") {
    import spark.implicits._
    val docs = Seq(
      (1L, "write to bob.smith@corp.example.org today"),
      (2L, "call 555-123-4567 or 555-999-0000"),
      (3L, "host 192.168.0.1 acct 123456789012"),
      (4L, "nothing here"),
      // a 10-digit run formatted as a phone must count as PHONE not ID
      (5L, "5551234567 and 555-123-4567")).toDF("doc_id", "text")
    val out = graft.operators.Pii.redact(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getString(5)))).toMap
    assert(out(1L) === ((1L, 0L, 0L, 0L, "write to <EMAIL> today")))
    assert(out(2L) === ((0L, 0L, 2L, 0L, "call <PHONE> or <PHONE>")))
    assert(out(3L) === ((0L, 1L, 0L, 1L, "host <IP> acct <ID>")))
    assert(out(4L) === ((0L, 0L, 0L, 0L, "nothing here")))
    assert(out(5L) === ((0L, 0L, 1L, 1L, "<ID> and <PHONE>")))
  }

  test("Pii.exposureReport: per-group totals and any-PII rate") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "a", "x@y.io and z@w.ai"),
      (2L, "a", "clean"),
      (3L, "b", "call 555-123-4567")).toDF("doc_id", "g", "text")
    val red = graft.operators.Pii.redact(docs, "doc_id", "text")
      .join(docs.select(col("doc_id").as("id"), col("g")), Seq("id"))
    val rep = graft.operators.Pii.exposureReport(red, "g")
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(rep("a") === Seq(2L, 2L, 0L, 0L, 0L, 1L, 500000L))
    assert(rep("b") === Seq(1L, 0L, 0L, 1L, 0L, 1L, 1000000L))
  }

  // ---- bradleyTerry ------------------------------------------------------

  test("bradleyTerry: dominant item rises, symmetric matches stay equal") {
    import spark.implicits._
    // a beats b 3:1, b beats c 3:1, a beats c 4:0 — strict order a > b > c
    val matches = (Seq.fill(3)(("a", "b")) ++ Seq(("b", "a")) ++
      Seq.fill(3)(("b", "c")) ++ Seq(("c", "b")) ++
      Seq.fill(4)(("a", "c"))).toDF("w", "l")
    val out = graft.operators.Stats
      .bradleyTerry(matches, "w", "l", rounds = 10)
    val rows = out.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    graft.operators.Checkpoints.release(out)
    assert(rows("a")._1 === 7L && rows("a")._2 === 8L)
    assert(rows("b")._1 === 4L && rows("c")._1 === 1L)
    assert(rows("a")._3 > rows("b")._3 && rows("b")._3 > rows("c")._3)
    // strengths renormalize to k*1e6 each round
    assert(math.abs(rows.values.map(_._3).sum - 3000000L) <= 3L)

    // exact scala twin of one configuration pins the micro arithmetic
    val cells = Map(("a", "b") -> 4L, ("b", "a") -> 4L,
      ("b", "c") -> 4L, ("c", "b") -> 4L, ("a", "c") -> 4L, ("c", "a") -> 4L)
    val wins = Map("a" -> 7L, "b" -> 4L, "c" -> 1L)
    var s = Map("a" -> 1000000L, "b" -> 1000000L, "c" -> 1000000L)
    for (_ <- 1 to 10) {
      val den = s.keys.map { i =>
        i -> s.keys.filter(_ != i).map { j =>
          math.round(1e12 * cells((i, j)) / (s(i) + s(j)))
        }.sum
      }.toMap
      val u = s.keys.map(i => i -> math.round(1e12 * wins(i) / den(i))).toMap
      val su = u.values.sum.toDouble
      s = u.map { case (i, v) => i -> math.round(3L * 1e6 * v / su) }
    }
    assert(rows("a")._3 === s("a") && rows("b")._3 === s("b") &&
      rows("c")._3 === s("c"))

    // perfectly symmetric record -> equal strengths
    val sym = Seq(("x", "y"), ("y", "x")).toDF("w", "l")
    val so = graft.operators.Stats.bradleyTerry(sym, "w", "l", rounds = 5)
    val sr = so.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    graft.operators.Checkpoints.release(so)
    assert(sr("x") === sr("y"))
  }

  // ---- exactSpanScrub ----------------------------------------------------

  test("exactSpanScrub: cross-doc and within-doc duplicated spans are cut") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // docs 1 and 2 share the 3-token span "x y z"; doc 3 repeats its own
    // "p q r"; doc 4 is clean
    val docs = Seq(
      (1L, "a b x y z c"),
      (2L, "d x y z e f g"),
      (3L, "p q r s p q r"),
      (4L, "u v w1 w2 w3 w4")).toDF("doc_id", "text")
    val out = graft.operators.Dedup
      .exactSpanScrub(docs, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(4)))).toMap
    assert(out(1L) === ((6L, 3L, m("a b c"))))
    assert(out(2L) === ((7L, 3L, m("d e f g"))))
    // within-doc: "p q r" occurs twice (positions 0-2 and 4-6) -> both cut
    assert(out(3L) === ((7L, 6L, m("s"))))
    assert(out(4L) === ((6L, 0L, m("u v w1 w2 w3 w4"))))
    // a fully-duplicated doc survives as the empty string
    val dup = Seq((1L, "t1 t2 t3"), (2L, "t1 t2 t3")).toDF("doc_id", "text")
    val gone = graft.operators.Dedup
      .exactSpanScrub(dup, "doc_id", "text", k = 3)
      .filter(col("n_dup_tokens") === 3L).count()
    assert(gone === 2L)
  }

  // ---- seqPack -----------------------------------------------------------

  test("seqPack: global concat-and-chunk bins and crossing flags") {
    import spark.implicits._
    // token counts 3, 4, 5 with L = 4: offsets [0,3) [3,7) [7,12)
    val docs = Seq((1L, "a b c"), (2L, "d e f g"), (3L, "h i j k l"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .seqPack(docs, "doc_id", "text", 4L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(1L) === ((3L, 0L, 0L, false))) // [0,3) inside bin 0
    assert(out(2L) === ((4L, 0L, 1L, true)))  // [3,7) straddles the cut at 4
    assert(out(3L) === ((5L, 1L, 2L, true)))  // [7,12) straddles the cut at 8
  }

  // ---- doremiMixture ----------------------------------------------------

  test("doremiMixture: high-excess domain gains weight, rounds conserve mass") {
    import spark.implicits._
    // domain a: loss 1.0 nats, b: 2.0, c: 3.0 (micro) — corpus mean 2.0,
    // so excess = (0, 0, 1e6) and only c is upweighted
    val perDoc = Seq(
      ("a", 1000000L), ("a", 1000000L),
      ("b", 2000000L), ("b", 2000000L),
      ("c", 3000000L), ("c", 3000000L)).toDF("g", "loss")
    val out = graft.operators.LangModel
      .doremiMixture(perDoc, "g", "loss", etaMicro = 200000L, rounds = 4)
    val rows = out.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    graft.operators.Checkpoints.release(out)
    assert(rows("a")._3 === 0L && rows("b")._3 === 0L)
    assert(rows("c")._3 === 1000000L) // excess = mean_c - corpus mean
    // c strictly above uniform, a/b strictly below and equal by symmetry
    assert(rows("c")._4 > 333333L)
    assert(rows("a")._4 === rows("b")._4)
    assert(rows("a")._4 < 333333L)
    // each round normalizes to ~1e6, so the final weights sum there too
    val wSum = rows.values.map(_._4).sum
    assert(math.abs(wSum - 1000000L) <= 3L)
    // round-averaged weight sits between uniform and the final round
    assert(rows("c")._5 > 333333L && rows("c")._5 < rows("c")._4)
    // replay the 4 rounds in exact scala to pin the micro arithmetic
    var w = Map("a" -> 333333L, "b" -> 333333L, "c" -> 333333L)
    var ws = Map("a" -> 0L, "b" -> 0L, "c" -> 0L)
    for (_ <- 1 to 4) {
      val u = w.map { case (k, v) =>
        k -> math.round(v * math.exp(
          200000L * (if (k == "c") 1000000L else 0L) / 1e12)) }
      val su = u.values.sum.toDouble
      w = u.map { case (k, v) => k -> math.round(1e6 * v / su) }
      ws = ws.map { case (k, v) => k -> (v + w(k)) }
    }
    assert(rows("c")._4 === w("c") && rows("a")._4 === w("a"))
    assert(rows("c")._5 === ws("c") / 4)
  }

  test("videoFramePhashes over SyntheticGif payloads = formula dHash") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 2L, 3L, 10L, 100L)
    val df = ids.toDF("doc_id")
      .withColumn("media", expr(SyntheticGif.mediaSql("doc_id")))
    val out = Multimodal.videoFramePhashes(df, "doc_id", "media")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = (for {
      id <- ids; k <- 0 until (1 + id % 3).toInt
    } yield (id, k.toLong) -> expectedHash(id, k)).toMap
    assert(out === want)
  }
}
