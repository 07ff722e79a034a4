package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native evaluator for the rendezvous (highest-random-weight) shard
  * assignment ([[graft.operators.Sharding.rendezvousAssign]]).
  *
  * Exists for the [[HashNative]]/[[PhashNative]] reason: the HOF
  * formulation re-hashes the FULL key string once per shard in an
  * interpreted `aggregate(transform(...))` — O(nShards·|key|) interpreted
  * folds per row (q136's measured cost: 2.3 s for a narrow no-shuffle
  * projection over 150k keys). The polynomial char hash is LINEAR, so the
  * per-shard hash decomposes: `hash(prefix ++ key) = (hash(prefix)·31^len
  * + hash(key)) mod P` — the key is hashed ONCE and each shard pays a
  * handful of integer ops on its (tiny) `"i:"` prefix. O(|key| +
  * nShards·digits) per row, one tight JVM loop.
  *
  * Parity: bit-identical to the HOF chain (and the DuckDB mirror):
  * per-code-point polynomial hash of `"<shard>:<key>"` in
  * [[HashExprs.P]]'s field, score = h² mod P (the squaring that breaks
  * the linear length-class collapse — see Sharding's scaladoc), argmax
  * with strict `>` so ties go to the smallest shard index. Asserted
  * against the HOF expression in Round10OpsSpec. */
object ShardNative {

  /** Shard in [0, nShards) for a string key column (null → null). */
  def rendezvousShard(key: Column, nShards: Int): Column =
    GraftColumnBridge.column(
      RendezvousShard(GraftColumnBridge.expression(key), nShards))

  case class RendezvousShard(child: Expression, nShards: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def checkInputDataTypes() = {
      if (child.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rendezvous_shard requires a STRING key, got ${child.dataType.catalogString}")
    }
    override protected def nullSafeEval(input: Any): Any = {
      val P = HashExprs.P
      val s = input.asInstanceOf[UTF8String].toString
      // hash(key) and 31^(code points) in one code-point walk — the same
      // per-character stream split('')/ascii() sees
      var hk = 0L
      var pw = 1L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        hk = (hk * 31 + cp) % P
        pw = (pw * 31) % P
        i += Character.charCount(cp)
      }
      var bestScore = -1L
      var bestShard = -1L
      var sh = 0
      while (sh < nShards) {
        var hp = 0L
        var d = if (sh == 0) 1 else 0 // digit count via repeated division
        var t = sh
        while (t > 0) { d += 1; t /= 10 }
        var div = 1
        var k = d - 1
        while (k > 0) { div *= 10; k -= 1 }
        while (div > 0) { // most-significant digit first
          hp = (hp * 31 + ('0' + (sh / div) % 10)) % P
          div /= 10
        }
        hp = (hp * 31 + ':') % P
        val h = (hp * pw + hk) % P // hp, pw < P ~ 2^30: product < 2^60
        val score = h * h % P
        if (score > bestScore) { bestScore = score; bestShard = sh }
        sh += 1
      }
      bestShard
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }
}
