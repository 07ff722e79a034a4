package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.GlobalRank

/** GlobalRank must be bit-identical to the single-partition global window
  * it replaces — checked directly against `Window.orderBy(...)` here (the
  * converted operators' DuckDB oracles re-check end to end). Data is
  * adversarial on purpose: heavy ties (so quantile cut points collide and
  * dedupe), skew (one hot value), and a non-trivial tiebreak order.
  */
class GlobalRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 10k rows, values in a small skewed domain → ties everywhere, cut-point
  // dedup exercised; id is a deterministic permutation-ish tiebreak
  def data() = spark.range(10000)
    .select(col("id"),
      (pmod(col("id") * 2654435761L, lit(97)) +
        when(pmod(col("id"), lit(7)) === 0, 0).otherwise(1000)).as("v"))

  test("withRowNumber matches the global single-partition window (asc)") {
    val (got, n) = GlobalRank.withRowNumber(data(), col("v"), asc = true,
      col("id"), "rn")
    assert(n === 10000L)
    val want = data().withColumn("rn_want",
      row_number().over(Window.orderBy(col("v").asc, col("id").asc))
        .cast("long"))
    val bad = got.join(want, Seq("id", "v"))
      .filter(col("rn") =!= col("rn_want")).count()
    assert(bad === 0L)
  }

  test("withRowNumber matches the global window (desc via negation)") {
    val (got, _) = GlobalRank.withRowNumber(data(), col("v"), asc = false,
      col("id"), "rn")
    val want = data().withColumn("rn_want",
      row_number().over(Window.orderBy(col("v").desc, col("id").asc))
        .cast("long"))
    val bad = got.join(want, Seq("id", "v"))
      .filter(col("rn") =!= col("rn_want")).count()
    assert(bad === 0L)
  }

  test("withNtile matches Spark ntile for ragged bucket sizes") {
    // 10000 % 7 != 0 → first n%B buckets take the extra row
    val got = GlobalRank.withNtile(data(), col("v"), asc = true,
      col("id"), 7, "b")
    val want = data().withColumn("b_want",
      ntile(7).over(Window.orderBy(col("v").asc, col("id").asc))
        .cast("long"))
    val bad = got.join(want, Seq("id", "v"))
      .filter(col("b") =!= col("b_want")).count()
    assert(bad === 0L)
  }

  test("withNtile with more buckets than rows = bucket per rank") {
    val tiny = data().filter(col("id") < 5)
    val got = GlobalRank.withNtile(tiny, col("v"), asc = true,
      col("id"), 64, "b")
    val want = tiny.withColumn("b_want",
      ntile(64).over(Window.orderBy(col("v").asc, col("id").asc))
        .cast("long"))
    val bad = got.join(want, Seq("id", "v"))
      .filter(col("b") =!= col("b_want")).count()
    assert(bad === 0L)
  }

  test("withCumSum matches the global running + grand-total windows") {
    val (got, grand) = GlobalRank.withCumSum(data(), col("v"), asc = false,
      col("id"), col("v"), "cum")
    val w = Window.orderBy(col("v").desc, col("id").asc)
    val want = data()
      .withColumn("cum_want", sum(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot_want", sum(col("v")).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    val bad = got.join(want, Seq("id", "v"))
      .filter(col("cum") =!= col("cum_want")).count()
    assert(bad === 0L)
    val tot = want.select(max(col("tot_want"))).as[Long].head()
    assert(grand === tot)
  }

  test("constant value column collapses to one shard, ranks still exact") {
    val const = spark.range(100).select(col("id"), lit(42L).as("v"))
    val (got, n) = GlobalRank.withRowNumber(const, col("v"), asc = true,
      col("id"), "rn")
    assert(n === 100L)
    assert(got.filter(col("rn") =!= col("id") + 1).count() === 0L)
  }

  test("empty input yields empty output, zero totals") {
    val empty = spark.range(0).select(col("id"), col("id").as("v"))
    val (got, n) = GlobalRank.withRowNumber(empty, col("v"), asc = true,
      col("id"), "rn")
    assert(n === 0L)
    assert(got.count() === 0L)
  }

  test("small-input fast path returns identical ranks, ntiles and cumsums") {
    val d = data().filter(col("id") < 3000)
    val n = d.count()
    val (fast, nf) = GlobalRank.withRowNumber(d, col("v"), asc = false,
      col("id"), "rn", knownCount = n)
    val (sharded, ns) = GlobalRank.withRowNumber(d, col("v"), asc = false,
      col("id"), "rn")
    assert(nf === ns)
    assert(fast.join(sharded.withColumnRenamed("rn", "rn2"),
      Seq("id", "v")).filter(col("rn") =!= col("rn2")).count() === 0L)
    val ntF = GlobalRank.withNtile(d, col("v"), asc = true, col("id"), 7,
      "b", knownCount = n)
    val ntS = GlobalRank.withNtile(d, col("v"), asc = true, col("id"), 7,
      "b")
    assert(ntF.join(ntS.withColumnRenamed("b", "b2"), Seq("id", "v"))
      .filter(col("b") =!= col("b2")).count() === 0L)
    val (csF, gF) = GlobalRank.withCumSum(d, col("v"), asc = true,
      col("id"), col("v"), "cum", knownCount = n)
    val (csS, gS) = GlobalRank.withCumSum(d, col("v"), asc = true,
      col("id"), col("v"), "cum")
    assert(gF === gS)
    assert(csF.join(csS.withColumnRenamed("cum", "cum2"), Seq("id", "v"))
      .filter(col("cum") =!= col("cum2")).count() === 0L)
  }

  test("multi-cumsum rides one pass: fast = sharded, grands = agg truth") {
    // two running sums over ONE order (the PR-curve / Wasserstein shape),
    // plus the rank column for successor joins
    val d = data().filter(col("id") < 3000)
      .withColumn("w", col("id") % 7)
    val n = d.count()
    def run(kc: Long) = GlobalRank.withRankedCumSums(d, col("v"),
      asc = true, col("id"), "r",
      Seq(col("v") -> "cv", col("w") -> "cw"), kc)
    val (fast, nf, gF) = run(n)
    val (sharded, ns, gS) = run(-1L)
    assert(nf === ns && gF === gS)
    val truth = d.agg(sum(col("v")), sum(col("w"))).head()
    assert(gF === Seq(truth.getLong(0), truth.getLong(1)))
    assert(fast.join(sharded.select(col("id"), col("r").as("r2"),
        col("cv").as("cv2"), col("cw").as("cw2")), Seq("id"))
      .filter(col("r") =!= col("r2") || col("cv") =!= col("cv2") ||
        col("cw") =!= col("cw2")).count() === 0L)
    // the rank column supports the successor (lead) join: rank r+1 has a
    // value >= rank r everywhere
    val succ = sharded.select(col("r"), col("v"))
      .join(sharded.select((col("r") - 1).as("r"), col("v").as("vn")),
        Seq("r"))
    assert(succ.filter(col("vn") < col("v")).count() === 0L)
  }

  test("boundedKey survives constant folding into the WindowExec spec") {
    // a literal partition key is folded away (verified: partitionBy(lit(1))
    // plans an EMPTY spec) — boundedKey must not be
    val df = spark.range(10).toDF("id")
    val w = Window.partitionBy(GlobalRank.boundedKey(col("id")))
      .orderBy(col("id"))
    val out = df.withColumn("rn", row_number().over(w))
    assert(out.collect().map(_.getInt(1)).sorted.toSeq == (1 to 10))
    val specs = out.queryExecution.sparkPlan.collect {
      case x: org.apache.spark.sql.execution.window.WindowExec =>
        x.partitionSpec
    }
    assert(specs.nonEmpty && specs.forall(_.nonEmpty),
      s"boundedKey was folded out of the window spec: $specs")
  }

  test("no single-partition WindowExec in the physical plan") {
    val (got, _) = GlobalRank.withRowNumber(data(), col("v"), asc = true,
      col("id"), "rn")
    val wins = got.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty)
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "found a WindowExec with no partition spec (single-task sort)")
  }
}
