package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.HashExprs

/** Rendezvous (highest-random-weight) shard assignment — the export-side
  * placement primitive of a 100 TB pipeline: route every record to one of
  * `n` output shards so that GROWING the shard count moves ONLY the keys
  * that land on the new shards (|moved| ≈ N/(n+1)), where `key % n` would
  * reshuffle nearly everything. That minimal-disruption property is what
  * makes incremental re-sharding of a petabyte corpus affordable: shards
  * untouched by the argmax keep their files verbatim.
  *
  * Mechanics: score(key, shard) = the SQUARE mod P of the shared
  * deterministic polynomial char hash ([[HashExprs]]) of `shard ":" key`.
  * The squaring is load-bearing: a polynomial hash is LINEAR, so for the
  * raw hash `score_i − score_j = (H_i − H_j)·31^len(key) mod P` — a
  * function of the key's LENGTH only, collapsing the argmax to one shard
  * per length class (measured: 15k keys → 2 shards). `h² mod P` makes
  * shard and key interact (`(a_i + k)²` carries the `2·a_i·k` cross term),
  * restoring a uniform argmax. The key goes to the highest-scoring shard
  * (ties → smallest shard index, guaranteed by the ascending fold with a
  * strict comparison). Per row this is one
  * `aggregate(transform(sequence(...)))` HOF chain — pure narrow codegen'd
  * projection, NO shuffle, no join, no explode-induced row growth; cost is
  * O(n·|key|) per row, so keep `n` to the physical shard count (10²-10³),
  * not a hash-space size.
  *
  * The polynomial hash keeps the oracle bit-exact; a production deployment
  * can swap in `xxhash64(key, shard)` for better mixing with the identical
  * plan shape (the [[HashExprs]] swap note).
  */
object Sharding {

  /** `df` plus a `shard` column in `[0, nShards)` assigned by rendezvous
    * hashing over `keyCol` (read as a string; normalize/trim upstream if
    * the key domain needs it). Evaluated by the native
    * [[graft.functions.ShardNative.RendezvousShard]] expression — the
    * key is hashed ONCE and each shard pays a few integer ops on its
    * prefix via the polynomial-hash composition, replacing the
    * O(nShards·|key|) interpreted HOF chain (the PhashNative lesson);
    * [[hofShardExpr]] keeps the HOF formulation for the parity spec. */
  def rendezvousAssign(df: DataFrame, keyCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    df.withColumn("shard", graft.functions.ShardNative.rendezvousShard(
      col(keyCol).cast("string"), nShards))
  }

  /** The original HOF shard expression over a SQL string expression —
    * retained as the independent reference the native expression is
    * parity-tested against (and the formulation the DuckDB oracle
    * mirrors verbatim). */
  private[graft] def hofShardExpr(key: String, nShards: Int): String = {
    val score = HashExprs.sparkCharHash(
      s"concat(CAST(i AS STRING), ':', $key)")
    // 's' carried as BIGINT so the column type matches the oracle side
    // (DuckDB range() yields BIGINTs) — the driver compares schemas.
    // Inner transform computes each raw hash ONCE; the indexed outer
    // transform squares it (h < P ≈ 2³⁰, so h² < 2⁶⁰ stays in long).
    s"""aggregate(
       |  transform(
       |    transform(sequence(0, ${nShards - 1}), i -> $score),
       |    (x, i) -> named_struct('h', (x * x) % ${HashExprs.P},
       |                           's', CAST(i AS BIGINT))),
       |  named_struct('h', CAST(-1 AS BIGINT), 's', CAST(-1 AS BIGINT)),
       |  (acc, x) -> IF(x.h > acc.h, x, acc)).s""".stripMargin
  }

  /** The DuckDB mirror of [[rendezvousAssign]]'s shard expression, over a
    * SQL string expression `key`. */
  def duckRendezvous(key: String, nShards: Int): String = {
    val score = HashExprs.duckCharHash(s"(CAST(i AS VARCHAR) || ':' || $key)")
    // DuckDB's list_transform lambda has no index parameter, so the
    // squared score is written as ($score)·($score) — textually doubled,
    // semantically the same h² mod P as the Spark side
    s"""list_reduce(
       |  list_prepend({'h': -1::BIGINT, 's': -1::BIGINT},
       |    list_transform(range(0, $nShards),
       |      i -> {'h': (($score) * ($score)) % ${HashExprs.P},
       |            's': i})),
       |  (a2, x2) -> CASE WHEN x2.h > a2.h THEN x2 ELSE a2 END).s""".stripMargin
  }
}
