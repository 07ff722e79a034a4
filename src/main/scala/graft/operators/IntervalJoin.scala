package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join: pair rows whose [start, end] ranges intersect
  * (optionally also matching equi-keys). The naive formulation is a theta
  * join — a near-cartesian nested-loop at scale. This operator uses the
  * standard bin-join decomposition instead:
  *
  *  1. each interval emits one row per fixed-width bin it covers
  *     (`sequence(start div w, end div w)` — intervals are usually short
  *     relative to the data span, so the blow-up factor is
  *     `~len/w + 1`, chosen via `binWidth`);
  *  2. candidates come from an EQUI-join on (keys, bin) — shuffle-bounded,
  *     AQE/skew-handled, no nested loop;
  *  3. the exact overlap predicate filters candidates, and each surviving
  *     pair is kept only in the bin containing the LATER of the two starts
  *     — a pair overlapping across several shared bins is emitted exactly
  *     once without any distinct/shuffle (the classic dedup-free bin-join
  *     trick).
  *
  * Endpoints are inclusive integers (e.g. `unix_micros`); the caller picks
  * `binWidth` around the typical interval length (too small → more
  * replicated bin rows; too large → more false candidates per bin).
  */
object IntervalJoin {

  /** Overlap-join `left` and `right` on `leftKey == rightKey` AND
    * `[leftStart, leftEnd] ∩ [rightStart, rightEnd] != ∅`. All four
    * endpoint columns must be integral and non-negative; output is the
    * joined row pairs (all left columns + all right columns). */
  def overlap(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val lb = left.withColumn("__bin",
      explode(expr(s"sequence($leftStart div $binWidth, $leftEnd div $binWidth)")))
    val rb = right.withColumn("__bin",
      explode(expr(s"sequence($rightStart div $binWidth, $rightEnd div $binWidth)")))
    lb.join(rb,
        col(leftKey) === col(rightKey) && lb("__bin") === rb("__bin") &&
          col(rightStart) <= col(leftEnd) && col(leftStart) <= col(rightEnd) &&
          // emit each overlapping pair from exactly one bin: the one holding
          // the later start (which both intervals necessarily cover);
          // integer `div`, not `/` — double division would lose precision
          // on microsecond epochs
          lb("__bin") === expr(s"greatest($leftStart, $rightStart) div $binWidth"))
      .drop("__bin")
  }
}
