package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native evaluators for the text-sketch chain (word hashes → shingles →
  * minhash / simhash). Each expression computes EXACTLY the same integer
  * math as its SQL builder in [[HashExprs]] (and therefore the DuckDB
  * oracle) — these exist purely because Spark evaluates higher-order
  * functions interpreted, one virtual call per lambda step; a tight JVM
  * loop in `eval` is 50-100x faster. `CodegenFallback` is fine here: the
  * per-row work (hundreds of characters) dwarfs the single boxed call, the
  * loop itself is JIT-compiled.
  *
  * Semantics parity notes (each mirrors its HOF equivalent):
  * - `WordHashes` = `transform(split(text, ' '), w -> aggregate(split(w,''),...))`:
  *   split on single space keeps empty tokens (hash 0); BMP code points.
  * - `ShingleHashes` = first-occurrence-order distinct 3-gram combine;
  *   `[null]` for <3 words.
  * - `MinHashSig` skips null shingles like `array_min`.
  * - `SimHash` counts bit-votes over non-null elements but sizes over all,
  *   like `size(filter(...))` vs `size(arr)`.
  */
object HashNative {
  import HashExprs.{P, SimhashBits, perms}

  private def col(e: Expression): Column = GraftColumnBridge.column(e)

  def wordHashes(text: Column): Column =
    col(WordHashes(GraftColumnBridge.expression(text)))
  def shingleHashes(wh: Column): Column =
    col(ShingleHashes(GraftColumnBridge.expression(wh)))
  /** In-order (non-distinct) k-gram hashes of a word-hash array — the
    * positional gram table of the exact-substring dedup. Same polynomial
    * combine as [[ShingleHashes]], generalized width, POSITION-PRESERVING
    * (index i = gram starting at word i); empty array below k words. */
  def gramHashes(wh: Column, k: Int): Column =
    col(GramHashes(GraftColumnBridge.expression(wh), k))
  def minhashSig(sh: Column): Column =
    col(MinHashSig(GraftColumnBridge.expression(sh)))
  def simhash(sh: Column): Column =
    col(SimHash(GraftColumnBridge.expression(sh)))
  /** 64-bit simhash (bit votes over all 64 bits of the input hashes) —
    * the wide-fingerprint scale variant, no DuckDB oracle. */
  def simhash64(sh: Column): Column =
    col(SimHash(GraftColumnBridge.expression(sh), bits = 64))
  /** Winnowing selected fingerprints, packed `hash·K + (K − pos)`. */
  def winnowSelect(g: Column, w: Int, posCap: Long): Column =
    col(WinnowSelect(GraftColumnBridge.expression(g), w, posCap))

  case class WordHashes(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val words = s.split(" ", -1)
      val out = new Array[Any](words.length)
      var i = 0
      while (i < words.length) {
        val w = words(i)
        var acc = 0L
        var j = 0
        while (j < w.length) {
          acc = (acc * 31 + w.charAt(j).toLong) % P
          j += 1
        }
        out(i) = acc
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class ShingleHashes(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override protected def nullSafeEval(input: Any): Any = {
      val wh = input.asInstanceOf[ArrayData]
      val n = wh.numElements()
      if (n < 3) return new GenericArrayData(Array[Any](null))
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 0
      while (i <= n - 3) {
        val h = ((wh.getLong(i) * 31 + wh.getLong(i + 1)) % P * 31 +
          wh.getLong(i + 2)) % P
        seen.add(h)
        i += 1
      }
      val out = new Array[Any](seen.size())
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next().longValue(); k += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class GramHashes(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any = {
      val wh = input.asInstanceOf[ArrayData]
      val n = wh.numElements()
      if (n < k) return new GenericArrayData(Array.empty[Any])
      val out = new Array[Any](n - k + 1)
      var i = 0
      while (i <= n - k) {
        var acc = 0L
        var j = 0
        while (j < k) { acc = (acc * 31 + wh.getLong(i + j)) % P; j += 1 }
        out(i) = acc
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  case class MinHashSig(child: Expression)
      extends UnaryExpression with CodegenFallback {
    private val as = perms.map(_._1).toArray
    private val bs = perms.map(_._2).toArray
    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override protected def nullSafeEval(input: Any): Any = {
      val sh = input.asInstanceOf[ArrayData]
      val n = sh.numElements()
      val out = new Array[Any](as.length)
      var p = 0
      while (p < as.length) {
        val a = as(p); val b = bs(p)
        var min = Long.MaxValue
        var any = false
        var i = 0
        while (i < n) {
          if (!sh.isNullAt(i)) {
            val v = (a * sh.getLong(i) + b) % P
            if (v < min) { min = v; any = true }
          }
          i += 1
        }
        out(p) = if (any) min else null
        p += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression) = copy(c)
  }

  case class SimHash(child: Expression, bits: Int = SimhashBits)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(input: Any): Any = {
      val sh = input.asInstanceOf[ArrayData]
      val n = sh.numElements()
      val ones = new Array[Int](bits)
      var i = 0
      while (i < n) {
        if (!sh.isNullAt(i)) {
          val h = sh.getLong(i)
          var b = 0
          while (b < bits) {
            ones(b) += (((h >>> b) & 1L)).toInt
            b += 1
          }
        }
        i += 1
      }
      var f = 0L
      var b = 0
      while (b < bits) {
        if (2 * ones(b) > n) f |= (1L << b)
        b += 1
      }
      f
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Winnowing window selection (Schleimer-Wilkerson-Aiken) over an
    * in-order gram-hash array: for every window of `w` consecutive grams
    * keep the packed minimum `g[p]·K + (K − p)` (p the 1-based gram
    * index — min hash, RIGHTMOST position on ties), distinct across
    * windows in first-occurrence order. Exactly the
    * `array_distinct(transform(sequence(0, greatest(m-w,0)), j ->
    * array_min(transform(sequence(j+1, least(j+w,m)), p -> g[p]*K+K-p))))`
    * HOF chain — which Spark evaluates INTERPRETED with the gram
    * subexpression re-inlined into the lambda by project collapse
    * (O(m²·w) per row and worse once filter pushdown duplicates it into a
    * predicate; the round-12 hang). One tight O(m·w) loop per row instead.
    * Docs with fewer than `w` grams yield the single whole-array window;
    * an empty gram array yields an empty selection. */
  case class WinnowSelect(child: Expression, w: Int, posCap: Long)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any = {
      val g = input.asInstanceOf[ArrayData]
      val m = g.numElements()
      if (m < 1) return new GenericArrayData(Array.empty[Any])
      // the packed encoding g[p]·K + (K − p) is only injective-and-ordered
      // while p ≤ K: one over-long document would otherwise SILENTLY pack
      // negative offsets and corrupt the window-minimum selection — fail
      // loud instead (chunk the document first; TextAnalysis.chunk is the
      // bounded-row contract for pathological concatenated-crawl rows)
      require(m <= posCap,
        s"WinnowSelect: $m grams exceed the position cap $posCap — the " +
          "packed (hash, position) encoding cannot represent positions " +
          "past the cap; split the document (TextAnalysis.chunk) first")
      val nWin = math.max(m - w, 0) + 1
      val seen = new java.util.HashSet[java.lang.Long]()
      val buf = new java.util.ArrayList[Any]()
      var j = 0
      while (j < nWin) {
        var mn = Long.MaxValue
        var p = j + 1
        val end = math.min(j + w, m)
        while (p <= end) {
          val v = g.getLong(p - 1) * posCap + posCap - p
          if (v < mn) mn = v
          p += 1
        }
        if (seen.add(mn)) buf.add(mn)
        j += 1
      }
      new GenericArrayData(buf.toArray)
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }
}
