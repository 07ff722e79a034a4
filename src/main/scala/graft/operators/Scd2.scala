package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) merge: fold an update batch into a
  * history-tracked dimension table — the canonical warehouse maintenance
  * step downstream of a Singer-style loader (the reference loads raw
  * streams; a real deployment's next job is exactly this merge).
  *
  * Contract: `current` carries `keyCols ++ trackedCols` plus the SCD2
  * bookkeeping columns `valid_from: date`, `valid_to: date` (null while
  * live), `is_current: boolean`; `updates` carries `keyCols ++
  * trackedCols`, ONE row per key (pre-dedupe upstream — e.g.
  * `Dedup.exact` keeping the latest). The merge:
  *
  *   - a key whose live row differs on ANY tracked column (null-safe:
  *     null → value and value → null both count as changes) closes the
  *     live row (`valid_to = batchDate`, `is_current = false`) and
  *     inserts a fresh live row;
  *   - a key with no live row (brand new, or all history closed) just
  *     inserts;
  *   - an update identical to the live row is a no-op (idempotent
  *     re-deliveries — a Singer at-least-once reality — don't churn
  *     history);
  *   - closed history rows and keys absent from the batch pass through
  *     untouched.
  *
  * Scale shape: two equi-joins, BOTH on the dimension key — changed-row
  * detection (updates ⨝ live) and the close-out marker (current ⨝
  * changed keys). The update batch is typically a small fraction of the
  * dimension, so AQE broadcasts it and the merge costs one scan of
  * `current` plus two broadcast probes — no global shuffle of the
  * dimension. With a huge batch both joins hash-partition on the same
  * key and the exchange is reused. History grows by exactly
  * |changed| + |new| rows per batch; nothing is ever rewritten in
  * place, so the output is safe to write with a partition-overwrite on
  * `is_current` or an append of the delta.
  */
object Scd2 {

  def merge(current: DataFrame, updates: DataFrame, keyCols: Seq[String],
      trackedCols: Seq[String], batchDate: String): DataFrame = {
    require(keyCols.nonEmpty && trackedCols.nonEmpty,
      "scd2 merge needs key and tracked columns")
    val vf = to_date(lit(batchDate))
    val dataCols = keyCols ++ trackedCols

    // updates that represent a change: no live row for the key, or some
    // tracked column differs null-safely from the live row. "No live row"
    // is tested on a constant marker, not a key column — the key join is
    // null-safe, so a NULL key component is a legal value and its
    // post-join NULL must not read as "unmatched"
    val live = current.filter(col("is_current"))
      .select(dataCols.map(c => col(c).as(s"__cur_$c")) :+
        lit(true).as("__cur"): _*)
    val changed = updates
      .join(live, keyCols.map(k => col(k) <=> col(s"__cur_$k")).reduce(_ && _),
        "left")
      .filter(col("__cur").isNull ||
        trackedCols.map(tc => !(col(tc) <=> col(s"__cur_$tc"))).reduce(_ || _))
      .select(dataCols.map(col): _*)

    val inserts = changed
      .withColumn("valid_from", vf)
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))

    // close superseded live rows; history and untouched keys pass through
    val marks = changed.select(keyCols.map(k => col(k).as(s"__chg_$k")): _*)
      .withColumn("__chg", lit(true))
    val closing = col("__chg").isNotNull && col("is_current")
    val carried = current
      .join(marks, keyCols.map(k => col(k) <=> col(s"__chg_$k")).reduce(_ && _),
        "left")
      .withColumn("valid_to", when(closing, vf).otherwise(col("valid_to")))
      .withColumn("is_current", when(closing, lit(false))
        .otherwise(col("is_current")))
      .drop(keyCols.map(k => s"__chg_$k") :+ "__chg": _*)

    carried.unionByName(inserts)
  }

  /** Point-in-time dimension snapshot — the query SCD2 history exists to
    * serve: the row version of every key that was in effect on `asOfDate`
    * (`valid_from <= asOf < valid_to`, open `valid_to` = still live). A
    * pure filter: both predicates push to the parquet scan, so row-group
    * min/max stats on `valid_from`/`valid_to` skip history files that
    * closed before the as-of date. Keys first inserted after `asOfDate`
    * simply have no row in effect and are absent. A malformed date fails
    * here rather than silently filtering every row to NULL. */
  def snapshotAt(dim: DataFrame, asOfDate: String): DataFrame = {
    val asOf = lit(java.sql.Date.valueOf(java.time.LocalDate.parse(asOfDate)))
    dim.filter(col("valid_from") <= asOf &&
      (col("valid_to").isNull || col("valid_to") > asOf))
  }
}
