package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the right row with the
  * greatest `rightTs <= leftTs` among rows sharing the join key (the classic
  * "latest known value at event time" operator; DuckDB `ASOF JOIN`, kdb `aj`).
  *
  * Spark has no built-in as-of join, and a naive theta-join
  * (`l.ts >= r.ts` + argmax) explodes to a cartesian per key. This
  * implementation is the scalable formulation: union both sides tagged,
  * single shuffle on the key, per-partition sort by (ts, side), then a
  * running `last(value, ignoreNulls)` window — O(n log n) per key group,
  * one shuffle total, no join blow-up. At 100 TB this is the same access
  * pattern as a sort-merge join and benefits from AQE skew splitting.
  *
  * Tie semantics: a right row with `rightTs == leftTs` IS visible to that
  * left row (>= semantics, right sorts before left at equal ts).
  * Determinism: callers must make the right side unique per (key, ts) —
  * pre-aggregate otherwise (multiple right rows at the same key+ts would make
  * "which one wins" order-dependent, as in any as-of engine).
  */
object AsOfJoin {

  /** @param tolerance maximum allowed `leftTs - rightTs` (backward) or
    *                   `rightTs - leftTs` (forward) for a match, in the ts
    *                   columns' own units — matches further away resolve to
    *                   NULL (pandas merge_asof `tolerance`). Requires
    *                   numeric ts columns (convert timestamps with
    *                   `unix_micros` first); `None` = unbounded lookback. */
  def joinBackward(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightValues: Seq[String],
      tolerance: Option[Long] = None): DataFrame =
    joinDirectional(left, right, leftKeys, rightKeys, leftTs, rightTs,
      rightValues, backward = true, tolerance)

  /** Forward as-of join: the right row with the SMALLEST `rightTs >= leftTs`
    * per key (the "next known value" operator). Same single-shuffle
    * union+window plan, sorted descending. */
  def joinForward(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightValues: Seq[String],
      tolerance: Option[Long] = None): DataFrame =
    joinDirectional(left, right, leftKeys, rightKeys, leftTs, rightTs,
      rightValues, backward = false, tolerance)

  private def joinDirectional(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightValues: Seq[String],
      backward: Boolean,
      tolerance: Option[Long] = None): DataFrame = {
    require(leftKeys.length == rightKeys.length, "key arity mismatch")
    tolerance.foreach { t =>
      require(t >= 0, s"tolerance must be non-negative, got $t")
      require(right.schema(rightTs).dataType.isInstanceOf[
          org.apache.spark.sql.types.NumericType],
        "tolerance requires numeric ts columns (convert timestamps with unix_micros)")
    }
    val collisions = rightValues.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"rightValues collide with left columns: ${collisions.mkString(", ")} — alias them first")
    val keyAliases = leftKeys.indices.map(i => s"__asof_k$i")

    // All right values travel as ONE struct so the window's last(..., ignoreNulls)
    // picks a single matched right row atomically: its per-column NULLs are
    // preserved, and every value column provably comes from the same row
    // (per-column fill would mix rows and skip NULL values).
    // with a tolerance, the matched right ts rides the struct so the
    // post-fill filter can null out matches beyond the window
    val vsFields = rightValues.map(v => right.schema(v)) ++
      tolerance.map(_ => org.apache.spark.sql.types.StructField(
        "__asof_mts", right.schema(rightTs).dataType))
    val vsType = org.apache.spark.sql.types.StructType(vsFields)

    val lTagged = left.select(
      leftKeys.zip(keyAliases).map { case (k, a) => col(k).as(a) } ++ Seq(
        col(leftTs).as("__asof_ts"),
        lit(1).as("__asof_side"),
        struct(left.columns.map(col).toSeq: _*).as("__asof_row"),
        lit(null).cast(vsType).as("__asof_vs")): _*)

    val rTagged = right.select(
      rightKeys.zip(keyAliases).map { case (k, a) => col(k).as(a) } ++ Seq(
        col(rightTs).as("__asof_ts"),
        lit(0).as("__asof_side"),
        lit(null).cast(lTagged.schema("__asof_row").dataType).as("__asof_row"),
        struct(rightValues.map(col) ++
          tolerance.map(_ => col(rightTs).as("__asof_mts")): _*)
          .as("__asof_vs")): _*)

    val tsOrder = if (backward) col("__asof_ts").asc else col("__asof_ts").desc
    val w = Window
      .partitionBy(keyAliases.map(col): _*)
      .orderBy(tsOrder, col("__asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled0 = lTagged.unionByName(rTagged)
      .select(col("__asof_side"), col("__asof_row"), col("__asof_ts"),
        last(col("__asof_vs"), ignoreNulls = true).over(w).as("__asof_vs"))
      .filter(col("__asof_side") === 1)

    // tolerance: a match further from the left ts than `t` reads as no
    // match (the whole struct nulls atomically, like an unmatched row)
    val filled = tolerance.fold(filled0) { t =>
      val dist =
        if (backward) col("__asof_ts") - col("__asof_vs.__asof_mts")
        else col("__asof_vs.__asof_mts") - col("__asof_ts")
      filled0.withColumn("__asof_vs",
        when(dist <= t, col("__asof_vs")))
    }

    filled.select(col("__asof_row.*") +:
      rightValues.map(v => col(s"__asof_vs.$v").as(v)): _*)
  }
}
