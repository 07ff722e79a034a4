package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bpe, Graph, Sampling, Stats, TimeSeries}

/** scalacheck structural invariants for the session-3 pipeline operators —
  * behaviors that must hold on ANY input, not just the hand cases: clamp
  * bounds, island disjointness, bucket balance, k-core self-consistency,
  * BPE count monotonicity. Case counts are small (each case runs Spark
  * jobs); the point is shape coverage, not volume. */
class PipelinePropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(p: Prop, cases: Int = 8): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(res.passed, res.status.toString)
  }

  private val valsGen: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.choose(-1000L, 1000L))

  test("winsorizedSum: lo <= hi, clamp bounds the sum, p0/p100 = plain sum") {
    check(Prop.forAll(valsGen) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => ("g", v, i.toLong) }
        .toDF("grp", "v", "rk")
      val r = Stats.winsorizedSum(df, "grp", "v", "rk")
        .as[(String, Long, Long, Long, Long)].collect().head
      val (_, n, lo, hi, wsum) = r
      val full = Stats.winsorizedSum(df, "grp", "v", "rk", pLo = 0, pHi = 100)
        .as[(String, Long, Long, Long, Long)].collect().head
      n == vs.length && lo <= hi &&
        wsum >= n * lo && wsum <= n * hi &&
        full._5 == vs.sum && full._3 == vs.min && full._4 == vs.max
    })
  }

  test("mergeIntervals: islands disjoint, count-preserving, covering") {
    val ivGen = Gen.nonEmptyListOf(for {
      s <- Gen.choose(0L, 100L); len <- Gen.choose(0L, 30L)
    } yield (s, s + len))
    check(Prop.forAll(ivGen) { ivs =>
      val df = ivs.map { case (s, e) => (1L, s, e) }.toDF("k", "s", "e")
      val islands = TimeSeries.mergeIntervals(df, "k", "s", "e")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
      val disjoint = islands.sliding(2).forall {
        case Array(a, b) => a._3 < b._2
        case _ => true
      }
      val covering = ivs.forall { case (s, e) =>
        islands.exists(i => i._2 <= s && e <= i._3) }
      disjoint && islands.map(_._4).sum == ivs.length && covering
    })
  }

  test("equiDepthHistogram: near-equal buckets, total preserved, ordered") {
    check(Prop.forAll(valsGen, Gen.choose(1, 8)) { (vs, b) =>
      val df = vs.zipWithIndex.map { case (v, i) => (v, i.toLong) }
        .toDF("v", "rk")
      val h = Stats.equiDepthHistogram(df, "v", "rk", b)
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
      val sizes = h.map(_._2)
      sizes.sum == vs.length &&
        (sizes.max - sizes.min) <= 1 &&
        h.sliding(2).forall {
          case Array(a, c) => a._4 <= c._3   // hi of bucket i <= lo of i+1
          case _ => true
        } && h.forall(r => r._3 <= r._4)
    })
  }

  test("kCore at fixpoint: every survivor's reported degree >= k") {
    val edgeGen = Gen.nonEmptyListOf(for {
      u <- Gen.choose(1L, 12L); v <- Gen.choose(1L, 12L) if u != v
    } yield (math.min(u, v), math.max(u, v)))
    check(Prop.forAll(edgeGen, Gen.choose(1, 4)) { (es0, k) =>
      val es = es0.distinct
      val fwd = es.toDF("src", "dst")
      val mirrored = fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      val out = Graph.kCore(mirrored, k, rounds = 12)
        .as[(Long, Long)].collect().toMap
      // survivors' degrees within the surviving subgraph match the report
      // and meet the threshold
      val deg = es.filter { case (u, v) =>
        out.contains(u) && out.contains(v) }
        .flatMap { case (u, v) => Seq(u, v) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      out.forall { case (id, d) => d >= k && deg.getOrElse(id, 0L) == d }
    }, cases = 6)
  }

  test("bpe: chosen pair counts are non-increasing across rounds") {
    val wordsGen = Gen.nonEmptyListOf(
      Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString take 6))
    check(Prop.forAll(wordsGen) { ws =>
      val docs = Seq(ws.mkString(" ")).toDF("text")
      val counts = Bpe.train(docs, "text", merges = 4)
        .as[(Int, String, String, Long)].collect().sortBy(_._1).map(_._4)
      counts.sliding(2).forall {
        case Array(a, b) => b <= a
        case _ => true
      }
    }, cases = 6)
  }

  test("weightedSample: size min(k, n), subset, repartition-invariant") {
    check(Prop.forAll(Gen.choose(1, 40), Gen.choose(1, 60)) { (k, n) =>
      val df = (1L to n.toLong).map(i => (i, (i % 7 + 1).toInt))
        .toDF("id", "w")
      val s1 = Sampling.weightedSample(df, "id", "w", k)
        .as[(Long, Int)].collect().map(_._1).toSet
      val s2 = Sampling.weightedSample(df.repartition(5), "id", "w", k)
        .as[(Long, Int)].collect().map(_._1).toSet
      s1 == s2 && s1.size == math.min(k, n) &&
        s1.subsetOf((1L to n.toLong).toSet)
    }, cases = 6)
  }
}
