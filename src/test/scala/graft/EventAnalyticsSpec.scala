package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, EventAnalytics}

/** Funnel / retention semantics on hand-built event logs, and the
  * cross-source overlap matrix (exact + HLL estimate). */
class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ev(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("user_id", "us", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_type"))
  }

  test("funnel enforces strict order, ties do not advance, greedy is exact") {
    // u1: full in-order A B C
    // u2: B before its only A -> stops at A
    // u3: B at the SAME microsecond as A -> tie, stops at A
    // u4: first A at t=4 misses B(t=2), but the EARLIEST A is t=1 -> the
    //     greedy chain must still complete A->B via (1, 2) ... and C after
    val events = ev(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "C"),
      (2L, 1L, "B"), (2L, 2L, "A"),
      (3L, 5L, "A"), (3L, 5L, "B"),
      (4L, 4L, "A"), (4L, 1L, "A"), (4L, 2L, "B"), (4L, 9L, "C"))
    val out = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
      Seq("A", "B", "C"))
    val byStep = out.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(byStep === Map(1L -> ("A", 4L), 2L -> ("B", 2L), 3L -> ("C", 2L)))
    out.unpersist()
  }

  test("funnel maxGap: conversion window measured from the earliest completion") {
    val events = ev(
      (1L, 1L, "A"), (1L, 2L, "B"),                 // gap 1 <= 10: converts
      (2L, 1L, "A"), (2L, 50L, "B"),                // gap 49 > 10: stops at A
      (3L, 1L, "A"), (3L, 5L, "B"), (3L, 100L, "C"),// C misses B's window
      // the window anchors at the EARLIEST A (t=1), so B@25 is out even
      // though a later A (t=20) would have fit - defined semantics
      (4L, 1L, "A"), (4L, 20L, "A"), (4L, 25L, "B"))
    val out = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
      Seq("A", "B", "C"), maxGapMicros = Some(10L))
    val byStep = out.collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byStep === Map(1L -> 4L, 2L -> 2L, 3L -> 0L))
    out.unpersist()
  }

  test("funnel returns a row per step on empty input") {
    val out = EventAnalytics.funnel(ev((1L, 1L, "other")),
      "user_id", "ts", "event_type", Seq("A", "B"))
    assert(out.collect().map(r => (r.getLong(0), r.getLong(2))).toSet ===
      Set((1L, 0L), (2L, 0L)))
    out.unpersist()
  }

  test("funnel supports repeated steps: each occurrence needs its own event") {
    // pattern view -> cart -> view:
    // u1: view@1, cart@2, view@3      -> completes all three
    // u2: view@1, cart@2 (no 2nd view)-> stops after cart
    // u3: cart@1, view@2              -> only the FIRST view matches (no
    //    cart after it): stops at step 1
    // u4: view@1, view@2, cart@3, view@4 -> greedy (1,3,4) completes
    val events = ev(
      (1L, 1L, "view"), (1L, 2L, "cart"), (1L, 3L, "view"),
      (2L, 1L, "view"), (2L, 2L, "cart"),
      (3L, 1L, "cart"), (3L, 2L, "view"),
      (4L, 1L, "view"), (4L, 2L, "view"), (4L, 3L, "cart"), (4L, 4L, "view"))
    val out = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
      Seq("view", "cart", "view"))
    val byStep = out.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(byStep === Map(1L -> ("view", 4L), 2L -> ("cart", 3L),
      3L -> ("view", 2L)))
    out.unpersist()
  }

  test("retention collapses user-weeks and offsets against the cohort week") {
    // origin 2024-01-01 (session TZ is UTC everywhere, so epoch micros
    // land on the intended calendar days); u1 first in wk0, active wk0
    // (twice — must collapse), wk1, wk3; u2 first in wk1 only
    val base = 1704067200L * 1000000L // 2024-01-01T00:00:00Z
    val day = 86400L * 1000000L
    val events = ev(
      (1L, base, "x"), (1L, base + 3600L * 1000000L, "x"),
      (1L, base + 8L * day, "x"),
      (1L, base + 22L * day, "x"),
      (2L, base + 7L * day, "x"))
    val out = EventAnalytics.retention(events, "user_id", "ts", "2024-01-01")
    val cells = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cells === Set((0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L)))
  }

  test("retention plans exactly two shuffles (per-user agg + cell agg)") {
    val events = graft.queries.Tables.normalizeEventTs(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val plan = EventAnalytics.retention(events, "user_id", "ts", "2024-01-01")
      .queryExecution.executedPlan.toString()
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles === 2, s"expected 2 shuffles, plan:\n$plan")
  }

  test("sourceOverlap counts distinct shared shingles once per source pair") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d", "s1"),        // shingles {abc, bcd}
      (2L, "b c d e", "s2"),        // {bcd, cde}
      (3L, "b c d e", "s2"),        // exact dup inside s2: no double count
      (4L, "x y", "s3")             // <3 words: NULL sentinel only
    ).toDF("doc_id", "text", "source")
    val out = Dedup.sourceOverlap(docs, "text", "source")
    val rows = out.collect().map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getLong(4)))
    out.unpersist()
    assert(rows.toSeq === Seq(("s1", "s2", 1L, 2L, 2L)))
  }

  test("sourceOverlapApprox tracks the exact matrix on real sources") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val exactDf = Dedup.sourceOverlap(docs, "text", "source")
    val exact = exactDf.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    exactDf.unpersist()
    val est = Dedup.sourceOverlapApprox(docs, "text", "source").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // approx emits EVERY ordered source pair (zero-overlap included, the
    // estimate just lands near 0); exact emits only pairs sharing >= 1
    assert(exact.keySet.subsetOf(est.keySet))
    // inclusion-exclusion error scales with the UNION size (each of the
    // three sketches errs ~1-2% of ITS cardinality), not the intersection:
    // a loose |A|+|B|-proportional band still catches wiring bugs (wrong
    // column, doubled counts, swapped pair) while tolerating HLL noise
    exact.foreach { case (k, (n, na, nb)) =>
      val e = est(k)
      assert(math.abs(e - n) <= math.max(25.0, 0.06 * (na + nb)),
        s"pair $k: exact $n vs estimate $e (|A|=$na |B|=$nb)")
    }
    val maxTot = exact.values.map(v => v._2 + v._3).max
    (est.keySet -- exact.keySet).foreach { k =>
      assert(est(k) <= math.max(25.0, 0.06 * maxTot),
        s"zero-overlap pair $k estimated ${est(k)}")
    }
  }
}
