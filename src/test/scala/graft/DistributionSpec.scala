package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Distribution
import graft.functions.GraftFunctions

class DistributionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("bucketed tables join without a shuffle exchange") {
    // force sort-merge joins so the comparison is exchange vs bucketing
    // (tiny test tables would otherwise broadcast on both paths)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = spark.read.parquet(s"$sf/orders.parquet")
      val c = spark.read.parquet(s"$sf/customer.parquet")
      Distribution.writeBucketed(o, "orders_b", Seq("o_custkey"), 4)
      Distribution.writeBucketed(
        c.withColumnRenamed("c_custkey", "o_custkey"), "customer_b", Seq("o_custkey"), 4)
      val joined = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
      assert(!Distribution.hasShuffle(joined), "bucketed join must not shuffle")
      assert(joined.count() === o.count())
      // same join over raw parquet DOES shuffle (sanity that the probe works)
      val raw = o.join(c.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
      assert(Distribution.hasShuffle(raw))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("q48_bucketed_join plan has no exchange and no sort on the join keys") {
    val q48 = SparkEntry.queries("q48_bucketed_join")(spark, sf)
    val plan = q48.queryExecution.executedPlan.toString()
    // the only allowed exchange is the final groupBy(yr); the join itself
    // must ride the bucketing (no hashpartitioning on either join key, and
    // the SMJ's sort order comes from the bucket sortBy, not a Sort node)
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
      s"lineitem side must not shuffle:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"orders side must not shuffle:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"merge hint must force SMJ:\n$plan")
    // and the answer matches the plain join over raw parquet
    val raw = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"))
          .as("rev_cents"))
    assert(q48.except(raw).count() === 0 && raw.except(q48).count() === 0)
  }

  test("salted join returns identical results to plain join") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey")
    val c = spark.read.parquet(s"$sf/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
      .select("o_custkey", "c_mktsegment")
    val plain = o.join(c, "o_custkey").select("o_orderkey", "c_mktsegment")
    val salted = Distribution.saltedJoin(o, c, "o_custkey", 8)
      .select("o_orderkey", "c_mktsegment")
    assert(salted.except(plain).count() === 0)
    assert(plain.except(salted).count() === 0)
    assert(salted.count() === plain.count())
  }

  test("custom expressions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    val dot = spark.sql(
      "SELECT vec_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d")
      .collect().head.getDouble(0)
    assert(dot === 11.0)
    val sim = spark.sql("SELECT simhash30(shingle_hashes(word_hashes('a b c d'))) AS s")
      .collect().head.getLong(0)
    assert(sim >= 0L)
  }

  test("approx_count_distinct lands within the declared error bound") {
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
    val exact = l.select(countDistinct(col("l_partkey"))).collect().head.getLong(0)
    val approx = l.select(approx_count_distinct(col("l_partkey"), 0.02))
      .collect().head.getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.06, s"hll error $err (exact $exact, approx $approx)")
  }
}
