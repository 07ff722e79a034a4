package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Scd2

/** SCD type-2 merge semantics on a hand-built dimension. */
class Scd2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val D = java.sql.Date.valueOf(_: String)

  // (key, attr, valid_from, valid_to, is_current)
  private def dim(rows: (Long, String, String, String, Boolean)*) = {
    import spark.implicits._
    rows.toDF("k", "attr", "vf", "vt", "is_current")
      .select(col("k"), col("attr"), to_date(col("vf")).as("valid_from"),
        to_date(col("vt")).as("valid_to"), col("is_current"))
  }

  private def batch(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("k", "attr")
  }

  test("merge closes changed rows, inserts new keys, ignores no-ops") {
    val current = dim(
      (1L, "a", "2024-01-01", null, true),    // will change: a -> a2
      (2L, "b", "2024-01-01", null, true),    // no-op re-delivery
      (3L, "c", "2024-01-01", null, true),    // absent from batch
      (1L, "a0", "2023-01-01", "2024-01-01", false)) // history passes through
    val out = Scd2.merge(current, batch((1L, "a2"), (2L, "b"), (9L, "z")),
      Seq("k"), Seq("attr"), "2024-06-01").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2),
        Option(r.getDate(3)), r.getBoolean(4))).toSet
    assert(out === Set(
      (1L, "a", D("2024-01-01"), Some(D("2024-06-01")), false),  // closed
      (1L, "a2", D("2024-06-01"), None, true),                   // replacement
      (2L, "b", D("2024-01-01"), None, true),                    // untouched
      (3L, "c", D("2024-01-01"), None, true),                    // untouched
      (1L, "a0", D("2023-01-01"), Some(D("2024-01-01")), false), // history
      (9L, "z", D("2024-06-01"), None, true)))                   // new key
  }

  test("null transitions are changes both ways; closed-only keys reinsert") {
    val current = dim(
      (1L, "a", "2024-01-01", null, true),    // a -> null: change
      (2L, null.asInstanceOf[String], "2024-01-01", null, true), // null -> b
      (3L, "c", "2023-01-01", "2024-01-01", false)) // no LIVE row
    val out = Scd2.merge(current,
      batch((1L, null.asInstanceOf[String]), (2L, "b"), (3L, "c")),
      Seq("k"), Seq("attr"), "2024-06-01").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getDate(2),
        Option(r.getDate(3)), r.getBoolean(4))).toSet
    assert(out === Set(
      (1L, Some("a"), D("2024-01-01"), Some(D("2024-06-01")), false),
      (1L, None, D("2024-06-01"), None, true),
      (2L, None, D("2024-01-01"), Some(D("2024-06-01")), false),
      (2L, Some("b"), D("2024-06-01"), None, true),
      (3L, Some("c"), D("2023-01-01"), Some(D("2024-01-01")), false),
      (3L, Some("c"), D("2024-06-01"), None, true))) // reopened from history
  }

  test("a NULL key component is a value: no-op re-delivery stays a no-op") {
    import spark.implicits._
    val current = Seq((Option.empty[Long], "a"), (Some(2L), "b"))
      .toDF("k", "attr")
      .select(col("k"), col("attr"),
        to_date(lit("2024-01-01")).as("valid_from"),
        lit(null).cast("date").as("valid_to"), lit(true).as("is_current"))
    // identical re-delivery for the NULL key -> must NOT churn history
    val noop = Scd2.merge(current,
      Seq((Option.empty[Long], "a")).toDF("k", "attr"),
      Seq("k"), Seq("attr"), "2024-06-01")
    assert(noop.collect().toSet === current.collect().toSet)
    // a real change on the NULL key still closes + inserts
    val out = Scd2.merge(current,
      Seq((Option.empty[Long], "a2")).toDF("k", "attr"),
      Seq("k"), Seq("attr"), "2024-06-01").collect()
      .map(r => (Option(r.get(0)), r.getString(1), r.getBoolean(4))).toSet
    assert(out === Set((None, "a", false), (None, "a2", true),
      (Some(2L), "b", true)))
  }

  test("snapshotAt returns the row version in effect on each date") {
    val history = dim(
      (1L, "a0", "2023-01-01", "2024-01-01", false),
      (1L, "a", "2024-01-01", "2024-06-01", false),
      (1L, "a2", "2024-06-01", null, true),
      (2L, "b", "2024-06-01", null, true)) // first inserted 2024-06-01
    def at(d: String) = Scd2.snapshotAt(history, d).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(at("2023-06-15") === Set((1L, "a0")))           // key 2 absent yet
    assert(at("2024-01-01") === Set((1L, "a")))            // boundary: new version
    assert(at("2024-03-15") === Set((1L, "a")))
    assert(at("2024-07-01") === Set((1L, "a2"), (2L, "b")))
    assert(at("2022-01-01") === Set.empty)                 // before any history
  }

  test("snapshotAt rejects a malformed as-of date instead of matching nothing") {
    val history = dim((1L, "a", "2024-01-01", null, true))
    intercept[java.time.format.DateTimeParseException] {
      Scd2.snapshotAt(history, "07/01/2024")
    }
    intercept[java.time.format.DateTimeParseException] {
      Scd2.snapshotAt(history, "2024-13-01")
    }
  }

  test("merge is idempotent: re-merging the same batch is a no-op") {
    val current = dim((1L, "a", "2024-01-01", null, true))
    val b = batch((1L, "a2"), (2L, "n"))
    val once = Scd2.merge(current, b, Seq("k"), Seq("attr"), "2024-06-01")
    val twice = Scd2.merge(once, b, Seq("k"), Seq("attr"), "2024-07-01")
    assert(twice.collect().toSet === once.collect().toSet)
  }

  test("merge fails loudly on a duplicate-key batch instead of corrupting") {
    val current = dim((1L, "a", "2024-01-01", null, true))
    val ex = intercept[Exception] {
      Scd2.merge(current, batch((1L, "x"), (1L, "y")),
        Seq("k"), Seq("attr"), "2024-06-01").collect()
    }
    assert(ex.getMessage.contains("multiple rows for key"))
  }

  // (key, attr, ts) version batch for mergeVersions
  private def versions(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.toDF("k", "attr", "ts")
      .select(col("k"), col("attr"), to_date(col("ts")).as("ts"))
  }

  test("mergeVersions folds an ordered intra-batch change sequence") {
    val current = dim(
      (1L, "a", "2024-01-01", null, true),   // a -> b -> c in ONE batch
      (2L, "b", "2024-01-01", null, true),   // no-op then change
      (3L, "c", "2024-01-01", null, true))   // untouched
    val out = Scd2.mergeVersions(current, versions(
        (1L, "b", "2024-02-01"), (1L, "c", "2024-05-01"),
        (2L, "b", "2024-03-01"), (2L, "b2", "2024-04-01"),
        (4L, "n1", "2024-02-15"), (4L, "n2", "2024-06-15")), // new key, 2 versions
      Seq("k"), Seq("attr"), "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2),
        Option(r.getDate(3)), r.getBoolean(4))).toSet
    assert(out === Set(
      (1L, "a", D("2024-01-01"), Some(D("2024-02-01")), false),
      (1L, "b", D("2024-02-01"), Some(D("2024-05-01")), false),
      (1L, "c", D("2024-05-01"), None, true),
      (2L, "b", D("2024-01-01"), Some(D("2024-04-01")), false), // closed at the
      (2L, "b2", D("2024-04-01"), None, true),                  // REAL transition
      (3L, "c", D("2024-01-01"), None, true),
      (4L, "n1", D("2024-02-15"), Some(D("2024-06-15")), false),
      (4L, "n2", D("2024-06-15"), None, true)))
  }

  test("mergeVersions: revert sequences reopen; redeliveries collapse") {
    val current = dim((1L, "a", "2024-01-01", null, true))
    // a -> FLIP -> a (revert), with the FLIP row delivered twice
    val out = Scd2.mergeVersions(current, versions(
        (1L, "FLIP", "2024-02-01"), (1L, "FLIP", "2024-02-01"),
        (1L, "a", "2024-05-01")),
      Seq("k"), Seq("attr"), "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2),
        Option(r.getDate(3)), r.getBoolean(4))).toSet
    assert(out === Set(
      (1L, "a", D("2024-01-01"), Some(D("2024-02-01")), false),
      (1L, "FLIP", D("2024-02-01"), Some(D("2024-05-01")), false),
      (1L, "a", D("2024-05-01"), None, true)))
  }

  test("mergeVersions: all-no-op batch leaves the dimension untouched") {
    val current = dim((1L, "a", "2024-01-01", null, true))
    val out = Scd2.mergeVersions(current,
      versions((1L, "a", "2024-02-01"), (1L, "a", "2024-03-01")),
      Seq("k"), Seq("attr"), "ts")
    assert(out.collect().toSet === current.collect().toSet)
  }

  test("mergeVersions raises on conflicting rows at the same (key, ts)") {
    val current = dim((1L, "a", "2024-01-01", null, true))
    val ex = intercept[Exception] {
      Scd2.mergeVersions(current,
        versions((1L, "x", "2024-02-01"), (1L, "y", "2024-02-01")),
        Seq("k"), Seq("attr"), "ts").collect()
    }
    assert(ex.getMessage.contains("no deterministic apply order"))
  }
}
