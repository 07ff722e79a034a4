package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{EventAnalytics, LangModel}

/** Hand-computed cases for the LM-scoring operators (bigram NLL, DSIR
  * weights) and the Markov transition matrix. */
class LangModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  test("vocab cut is deterministic: count desc, term asc, capped") {
    val d = docs((1L, "b b a a c", "en"), (2L, "b d", "en"))
    // counts: b=3, a=2, b? -> b=3, a=2, c=1, d=1 -> top3 = b, a, c (tie c<d)
    val v = LangModel.vocab(d, "doc_id", "text", 3).collect().map(_.getString(0))
    assert(v.toSet === Set("b", "a", "c"))
  }

  test("bigram NLL matches a hand computation (with <unk> collapse)") {
    // one doc "a b a b z", vocab cap 2 -> vocab {a, b}, z -> <unk>, V+1 = 3
    // bigrams: (a,b) (b,a) (a,b) (b,<unk>)
    // c12: (a,b)=2, (b,a)=1, (b,<unk>)=1 ; c1: a=2, b=2
    // p(a,b) = (2+1)/(2+3) = 0.6; p(b,a) = (1+1)/(2+3) = 0.4 = p(b,<unk>)
    val d = docs((1L, "a b a b z", "en"))
    val out = LangModel.bigramNll(d, "doc_id", "text", 2).collect()
    assert(out.length === 1)
    val r = out.head
    val nllAb = math.round(-math.log(3.0 / 5.0) * 1e6)
    val nll04 = math.round(-math.log(2.0 / 5.0) * 1e6)
    val expected = 2 * nllAb + 2 * nll04
    assert(r.getAs[Long]("n_bigrams") === 4L)
    assert(r.getAs[Long]("nll_x1e6") === expected)
    assert(r.getAs[Long]("avg_nll_x1e6") === expected / 4)
  }

  test("bigram NLL: rarer continuations cost more") {
    // "a a a a a b": the (a,a) bigram is common, (a,b) rare — a doc of
    // pure (a,a) must score a lower average NLL than one ending in b
    val d = docs((1L, "a a a a", "en"), (2L, "a a a b", "en"))
    val out = LangModel.bigramNll(d, "doc_id", "text", 10)
      .collect().map(r => r.getAs[Long]("doc") -> r.getAs[Long]("avg_nll_x1e6")).toMap
    assert(out(1L) < out(2L))
  }

  test("docs under two tokens produce no row; others all scored") {
    val d = docs((1L, "solo", "en"), (2L, "two tokens", "en"))
    val out = LangModel.bigramNll(d, "doc_id", "text", 10)
      .collect().map(_.getAs[Long]("doc"))
    assert(out.toSet === Set(2L))
  }

  test("DSIR weights match a hand computation and favor target-like docs") {
    // target = lang en: doc1 "x x", doc2(raw only) "y y"
    // counts: x: ct=2, cr=2; y: ct=0, cr=2. Nt=2, Nr=4, V=2
    // w(x) = ln(3/4) - ln(3/6); w(y) = ln(1/4) - ln(3/6)
    val d = docs((1L, "x x", "en"), (2L, "y y", "de"))
    val out = LangModel.dsirWeights(d, "doc_id", "text", col("lang") === "en")
      .collect().map(r => (r.getAs[Long]("doc"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("weight_x1e6"))).toList
    val wx = math.round((math.log(3.0 / 4.0) - math.log(3.0 / 6.0)) * 1e6)
    val wy = math.round((math.log(1.0 / 4.0) - math.log(3.0 / 6.0)) * 1e6)
    assert(out.toSet === Set((1L, 2L, 2 * wx), (2L, 2L, 2 * wy)))
    // the target-slice doc must outrank the non-target doc
    assert(2 * wx > 2 * wy)
  }

  test("DSIR: every doc is scored exactly once") {
    val d = docs((1L, "a b", "en"), (2L, "c d", "de"), (3L, "a c", "fr"))
    val out = LangModel.dsirWeights(d, "doc_id", "text", col("lang") === "en")
    assert(out.select("doc").collect().map(_.getLong(0)).sorted
      === Array(1L, 2L, 3L))
  }

  test("transition matrix counts consecutive pairs and normalizes per row") {
    import spark.implicits._
    // u1: A B A B ; u2: A B  -> (A,B)=3, (B,A)=1
    // p(B|A)=1.0, p(A|B)=1.0 within their rows? rows: prev=A: only next=B
    // (3); prev=B: next=A (1). Add u3: A C so prev=A: B=3, C=1
    val e = Seq(
      (1L, 1L, 1L, "A"), (1L, 2L, 2L, "B"), (1L, 3L, 3L, "A"), (1L, 4L, 4L, "B"),
      (2L, 1L, 5L, "A"), (2L, 2L, 6L, "B"),
      (3L, 1L, 7L, "A"), (3L, 2L, 8L, "C"))
      .toDF("user_id", "us", "event_id", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_id"), col("event_type"))
    val out = EventAnalytics.transitionMatrix(e, "user_id", "ts",
      "event_type", "event_id")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(out === Map(
      ("A", "B") -> (3L, 0.75), ("A", "C") -> (1L, 0.25),
      ("B", "A") -> (1L, 1.0)))
  }

  test("transition matrix breaks timestamp ties on the tie column") {
    import spark.implicits._
    // same-microsecond events: order must follow event_id, so the sequence
    // is A(id1) B(id2) C(id3) -> (A,B), (B,C); reversed ids would differ
    val e = Seq((1L, 5L, 1L, "A"), (1L, 5L, 2L, "B"), (1L, 5L, 3L, "C"))
      .toDF("user_id", "us", "event_id", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_id"), col("event_type"))
    val out = EventAnalytics.transitionMatrix(e, "user_id", "ts",
      "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set(("A", "B"), ("B", "C")))
  }
}
