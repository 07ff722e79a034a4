package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction: build a bloom filter over the dimension
  * side's join keys, broadcast it, and drop fact rows that cannot join BEFORE
  * they reach the shuffle. This is the classic star-join reduction — at
  * 100 TB the win is that the pruned fact rows never leave their input
  * partitions: no shuffle write, no network, no sort for rows that a
  * selective dimension predicate would discard after the exchange anyway.
  *
  * Spark's own runtime row-level filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`, AQE-injected) uses
  * the same two Catalyst expressions (`BloomFilterAggregate` /
  * `BloomFilterMightContain`); this operator makes the shape explicit and
  * unconditional, which matters when the optimizer's heuristics (creation
  * side size thresholds) would decline to inject it — the pipeline author
  * often KNOWS the dimension predicate is selective.
  *
  * Scale shape: the bloom build is a distributed aggregate (partial blooms
  * merged pairwise, only the final bitmap — `numBits/8` bytes — reaches the
  * driver/broadcast); the probe is a broadcast-nested-loop-free cross join
  * against ONE row carrying the bitmap, evaluated as a codegen'd expression
  * per fact row. No false negatives, so the subsequent real join restores
  * exactness; false positives only cost the rows they admit.
  */
object BloomPrune {

  private def col2expr(c: Column) = GraftColumnBridge.expression(c)

  /** Aggregate a key column into a bloom-filter bitmap (one binary value).
    * `expectedItems` sizes the filter; `numBits` bounds its memory
    * (default ~8 bits/item => ~3% false-positive rate). */
  def bloomAgg(key: Column, expectedItems: Long, numBits: Long): Column =
    GraftColumnBridge.column(
      new BloomFilterAggregate(col2expr(xxhash64(key)),
        col2expr(lit(expectedItems).cast("long")),
        col2expr(lit(numBits).cast("long"))).toAggregateExpression())

  /** Membership probe against a bloom bitmap column. */
  def mightContain(bloom: Column, key: Column): Column =
    GraftColumnBridge.column(
      BloomFilterMightContain(col2expr(bloom), col2expr(xxhash64(key))))

  /** One-row DataFrame `(bf: binary)` holding the bloom filter of
    * `dim[dimKey]`. The aggregation is map-side partial + single final
    * merge: each task builds a partial bitmap over its partition and the
    * bitmaps OR together, so no key list is ever collected. */
  def buildBloom(dim: DataFrame, dimKey: String,
      expectedItems: Long = 1000000L, numBits: Long = 8000000L): DataFrame =
    dim.agg(bloomAgg(col(dimKey), expectedItems, numBits).as("bf"))

  /** `fact` minus the rows whose `factKey` cannot exist in `dim[dimKey]`.
    * False positives pass through (the caller's join removes them); false
    * negatives are impossible, so `prune(...).join(dim)` ==
    * `fact.join(dim)` exactly.
    *
    * The bloom build rides along as a scalar subquery — `might_contain`
    * requires its bitmap input be a constant or scalar subquery (the
    * executed subquery result is broadcast to the filter's tasks), which is
    * precisely how Spark's own AQE-injected runtime filter is shaped. */
  def prune(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
      expectedItems: Long = 1000000L, numBits: Long = 8000000L): DataFrame = {
    val bloom = buildBloom(dim, dimKey, expectedItems, numBits)
    val bloomScalar = GraftColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        bloom.queryExecution.analyzed))
    fact.filter(mightContain(bloomScalar, col(factKey)))
  }

  /** The full reduced star join: bloom-prune `fact` on the join key, then
    * equi-join the surviving rows against `dim`. Exact. */
  def prunedJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, expectedItems: Long = 1000000L,
      numBits: Long = 8000000L): DataFrame =
    prune(fact, factKey, dim, dimKey, expectedItems, numBits)
      .join(dim, col(factKey) === col(dimKey))
}
