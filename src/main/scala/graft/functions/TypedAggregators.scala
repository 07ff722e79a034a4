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
object TypedAggregators {

  object SumOfSquares extends Aggregator[Double, Double, Double] {
    def zero: Double = 0.0
    def reduce(b: Double, x: Double): Double = b + x * x
    def merge(a: Double, b: Double): Double = a + b
    def finish(r: Double): Double = r
    def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
