package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

    // contract guard: the one-row-per-key contract was previously only
    // documented — a duplicate-key batch silently inserted several
    // is_current rows for one key, corrupting the dimension in a way
    // snapshotAt then propagates. Fail LOUDLY instead: a window count over
    // the (small, broadcastable) batch, folded into a filter so lazy
    // evaluation is preserved and column pruning can't drop the check.
    // Batches with genuine multiple versions per key belong to
    // [[mergeVersions]].
    val dupW = Window.partitionBy(keyCols.map(col): _*)
    val guarded = updates
      .withColumn("__kn", count(lit(1)).over(dupW))
      .filter(when(col("__kn") > 1, raise_error(concat(
          lit("Scd2.merge: updates batch has multiple rows for key ("),
          concat_ws(",", keyCols.map(k => col(k).cast("string")): _*),
          lit(") — pre-dedupe upstream or use Scd2.mergeVersions"))))
        .otherwise(lit(true)))
      .drop("__kn")

    // updates that represent a change: no live row for the key, or some
    // tracked column differs null-safely from the live row. "No live row"
    // is tested on a constant marker, not a key column — the key join is
    // null-safe, so a NULL key component is a legal value and its
    // post-join NULL must not read as "unmatched"
    val live = current.filter(col("is_current"))
      .select(dataCols.map(c => col(c).as(s"__cur_$c")) :+
        lit(true).as("__cur"): _*)
    val changed = guarded
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

  /** Multi-version SCD2 merge: fold a batch carrying SEVERAL ordered
    * changes per key — an intra-batch change sequence, the shape a CDC
    * feed delivers when merges run less often than sources change.
    * `updates` carries `keyCols ++ trackedCols ++ tsCol`; versions of a
    * key apply in `tsCol` order. Exactly one history row lands per REAL
    * transition: a version identical (null-safe, all tracked columns) to
    * the state in effect before it — the key's live row for the first
    * version, the previous version otherwise — is a no-op and leaves no
    * row, so at-least-once re-deliveries and unchanged snapshots never
    * churn history. Exact duplicate rows (same key, ts and values)
    * collapse first; two CONFLICTING rows at the same (key, ts) raise —
    * there is no deterministic order to apply them in.
    *
    * Inserted rows chain: `valid_from = date(ts)`, `valid_to` = the next
    * transition's date (null + `is_current` for the last); the
    * previously-live row closes at the FIRST transition's date. Several
    * versions inside one calendar day yield zero-duration rows
    * (`valid_from = valid_to`) for the superseded ones — [[snapshotAt]]
    * never returns them (`valid_to > asOf` fails), so a day's last
    * version is the one in effect.
    *
    * Scale shape matches [[merge]]: the no-op collapse is a lag window
    * and the chaining a lead window, BOTH partitioned on the dimension
    * key (one shuffle of the batch, reused across the windows by AQE);
    * the live-row probe and close-out marker are the same two key joins,
    * batch side broadcastable. The lag compare is exact because a no-op
    * row's values EQUAL the in-effect state by definition — inductively,
    * lag always reads the in-effect state, kept or not. */
  def mergeVersions(current: DataFrame, updates: DataFrame,
      keyCols: Seq[String], trackedCols: Seq[String],
      tsCol: String): DataFrame = {
    require(keyCols.nonEmpty && trackedCols.nonEmpty,
      "scd2 merge needs key and tracked columns")
    val dataCols = keyCols ++ trackedCols

    val live = current.filter(col("is_current"))
      .select(dataCols.map(c => col(c).as(s"__cur_$c")) :+
        lit(true).as("__cur"): _*)

    // exact-duplicate collapse, then the same-(key, ts) conflict guard
    // (lazy, prune-proof — see merge's guard)
    val tsW = Window.partitionBy((keyCols :+ tsCol).map(col): _*)
    val u = updates
      .select((dataCols :+ tsCol).map(col): _*)
      .distinct()
      .withColumn("__tsn", count(lit(1)).over(tsW))
      .filter(when(col("__tsn") > 1, raise_error(concat(
          lit("Scd2.mergeVersions: conflicting rows at the same ("),
          concat_ws(",", (keyCols :+ tsCol).map(k => col(k).cast("string")): _*),
          lit(") — no deterministic apply order"))))
        .otherwise(lit(true)))
      .drop("__tsn")

    val seqW = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc)
    val joined = u
      .join(live, keyCols.map(k => col(k) <=> col(s"__cur_$k")).reduce(_ && _),
        "left")
      .withColumn("__rn", row_number().over(seqW))
    // per tracked column, the value in effect before this version: the
    // live row's for the first version, the previous version's otherwise
    val withPrev = trackedCols.foldLeft(joined) { (df, c) =>
      df.withColumn(s"__prev_$c",
        when(col("__rn") === 1, col(s"__cur_$c"))
          .otherwise(lag(col(c), 1).over(seqW)))
    }
    val isChange =
      (col("__rn") === 1 && col("__cur").isNull) ||
        trackedCols.map(c => !(col(c) <=> col(s"__prev_$c"))).reduce(_ || _)
    val transitions = withPrev.filter(isChange)
      .select(dataCols.map(col) :+ col(tsCol): _*)

    val chainW = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc)
    val nextTs = lead(col(tsCol), 1).over(chainW)
    val inserts = transitions
      .withColumn("valid_from", col(tsCol).cast("date"))
      .withColumn("valid_to", nextTs.cast("date"))
      .withColumn("is_current", nextTs.isNull)
      .select(dataCols.map(col) :+ col("valid_from") :+ col("valid_to") :+
        col("is_current"): _*)

    // close the superseded live row at the key's FIRST transition date
    val marks = transitions
      .groupBy(keyCols.map(col): _*)
      .agg(min(col(tsCol)).cast("date").as("__chg_ts"))
      .select(keyCols.map(k => col(k).as(s"__chg_$k")) :+ col("__chg_ts"): _*)
    val closing = col("__chg_ts").isNotNull && col("is_current")
    val carried = current
      .join(marks, keyCols.map(k => col(k) <=> col(s"__chg_$k")).reduce(_ && _),
        "left")
      .withColumn("valid_to", when(closing, col("__chg_ts"))
        .otherwise(col("valid_to")))
      .withColumn("is_current", when(closing, lit(false))
        .otherwise(col("is_current")))
      .drop(keyCols.map(k => s"__chg_$k") :+ "__chg_ts": _*)

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
