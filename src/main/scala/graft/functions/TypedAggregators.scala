package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** User-defined typed aggregation surface (`Aggregator[IN, BUF, OUT]`),
  * registered for untyped DataFrame use via `functions.udaf`.
  *
  * `SumOfSquares` is deliberately simple: its math (Σ x²) is expressible in
  * plain SQL, so the UDAF *machinery* — buffer encoding, partial (map-side)
  * aggregation, merge — is verified against the DuckDB oracle exactly like
  * any built-in. The buffer is a single double: partial aggregation and
  * codegen'd shuffle both apply, so the pattern scales like a native sum.
  */
/** One (sortKey, id) candidate flowing into [[TypedAggregators.TopK]].
  * Top level + public: Spark product encoders require a reachable,
  * non-inner case class. */
final case class TopKItem(key: Double, id: Long)

object TypedAggregators {

  object SumOfSquares extends Aggregator[Double, Double, Double] {
    def zero: Double = 0.0
    def reduce(b: Double, x: Double): Double = b + x * x
    def merge(a: Double, b: Double): Double = a + b
    def finish(r: Double): Double = r
    def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Bounded top-k as an AGGREGATE: each task keeps at most k candidates
    * (ordered by key DESC, ties by id ASC), partials merge by
    * concat+truncate, and the result is the sorted top-k per group.
    *
    * This is the 100 TB shape for "top k rows per group": the window
    * formulation (`row_number over (partition by g order by s) <= k`)
    * must SHUFFLE AND SORT every input row; this aggregator reduces each
    * map task's contribution to k rows before the exchange — the same
    * map-side-combine argument as any partial sum, applied to ranking.
    * Buffers stay arrays (k is small by contract); output is the final
    * ranked array, ready for `posexplode`. */
  final case class TopK(k: Int)
      extends Aggregator[TopKItem, Seq[TopKItem], Seq[TopKItem]] {
    require(k > 0, s"k must be positive, got $k")
    private def ord: Ordering[TopKItem] =
      Ordering.by((t: TopKItem) => (-t.key, t.id))
    private def bound(xs: Seq[TopKItem]): Seq[TopKItem] =
      xs.sorted(ord).take(k)
    def zero: Seq[TopKItem] = Seq.empty
    // the buffer is kept sorted (zero is, and bound() re-sorts), so when it
    // is full the common case — a row no better than the current k-th —
    // is a single comparison with no allocation
    def reduce(b: Seq[TopKItem], x: TopKItem): Seq[TopKItem] =
      if (b.length >= k && ord.compare(x, b.last) >= 0) b
      else bound(b :+ x)
    def merge(a: Seq[TopKItem], b: Seq[TopKItem]): Seq[TopKItem] = bound(a ++ b)
    def finish(r: Seq[TopKItem]): Seq[TopKItem] = r
    def bufferEncoder: Encoder[Seq[TopKItem]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Seq[TopKItem]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }


}
