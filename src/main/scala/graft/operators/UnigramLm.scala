package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer training — the other
  * mainstream tokenizer family next to [[Bpe]] (Kudo 2018): score a
  * candidate piece inventory with a unigram language model, segment each
  * word by lowest total cost (Viterbi), re-estimate piece probabilities
  * from the segmentations, repeat. This implementation is the HARD-EM
  * (Viterbi-EM) variant over a FIXED candidate inventory: the E-step
  * takes each word's single best segmentation rather than the
  * forward-backward expectation, and no pruning schedule shrinks the
  * inventory between rounds (zero-count pieces just drop out of the
  * final readout) — the honest trade that keeps every intermediate an
  * exact integer the DuckDB oracle can replay stage-for-stage.
  *
  * Scale shape (the [[LangModel.doremiMixture]] / [[Stats.bradleyTerry]]
  * pattern): the corpus is touched ONCE, by the distributed word-count
  * aggregate; training then runs on the `maxWords`-capped distinct-word
  * table (top by frequency, deterministic ties — the standard
  * SentencePiece corpus-subsample step), collected driver-side as
  * bounded control plane. Candidate seeding, the per-round Viterbi DP
  * (O(len · maxPieceLen) per word over ≤ `maxWords` words), and the
  * count re-estimation are driver loops over that bounded table — a
  * Spark round loop here would pay multi-job latency per EM round for
  * zero distributed work (measured on doremiMixture: 4.5-41 s of
  * scheduling for a k-row table). The fertility readout pays one more
  * corpus scan joined against the broadcast word→tokens table.
  *
  * Determinism contract (oracle-mirrored): piece costs are the one
  * mirrored-double site, `round(-1e6 · ln(freq/total))` micro-longs
  * (Laplace-smoothed `(cnt+1)/(tot+k)` in re-estimation rounds, so a
  * zero-count single-char piece keeps a finite cost and every
  * `[a-z0-9]` word stays segmentable); DP totals are exact long sums of
  * micro costs; the DP argmin is the exact-long key
  * `(cost_total · 32 + L)` so ties break on the SHORTER last piece; the
  * traceback is the deterministic key readout. The DuckDB replica
  * unrolls the DP as one CTE stage per word position (`maxWordLen`
  * bounded) and the traceback the same way — no recursive CTE, no
  * list_reduce on non-string accumulators (unsafe in DuckDB at scale,
  * the [[Bpe]] lesson).
  */
object UnigramLm {

  /** Training hyper-parameters, shared verbatim by the Scala path and
    * the generated oracle SQL (the shared-constant discipline). */
  final case class Params(
      maxWordLen: Int = 12,
      maxPieceLen: Int = 4,
      maxWords: Int = 4096,
      seedPieces: Int = 512,
      rounds: Int = 2) {
    require(maxWordLen >= 1 && maxWordLen <= 30, "maxWordLen in [1,30]")
    require(maxPieceLen >= 1 && maxPieceLen <= maxWordLen,
      "maxPieceLen in [1,maxWordLen]")
    require(maxWords >= 1, "maxWords >= 1")
    require(seedPieces >= 40, "seedPieces must leave room for singles")
    require(rounds >= 1, "rounds >= 1")
  }

  /** The distributed part: distinct `[a-z0-9]+` words of length ≤
    * maxWordLen with corpus counts, capped to the `maxWords` most
    * frequent (ties: word asc). */
  private def wordTable(docs: DataFrame, textCol: String, p: Params): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$")
        && length(col("word")) <= p.maxWordLen)
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .orderBy(col("wc").desc, col("word").asc)
      .limit(p.maxWords)

  /** One trained state: piece → (cost_micro used for DP). */
  private final case class Trained(
      pieces: Seq[String],               // full seeded inventory, stable order
      counts: Map[String, Long],         // final-round Viterbi counts
      costs: Map[String, Long],          // final-round smoothed costs
      tot: Long,                         // sum of final counts
      wordToks: Seq[(String, Long)])     // word → final path length

  /** Driver-side training over the collected bounded word table. */
  private def trainCollected(words: Array[(String, Long)], p: Params): Trained = {
    // ---- candidate seeding: every substring occurrence, freq-weighted
    val freq = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    for ((w, wc) <- words; i <- 1 to w.length;
         l <- 1 to math.min(i, p.maxPieceLen)) {
      val piece = w.substring(i - l, i)
      freq(piece) = freq.getOrElse(piece, 0L) + wc
    }
    val singles = freq.keys.filter(_.length == 1).toSeq.sorted
    val multis = freq.filter(_._1.length > 1).toSeq
      .sortBy { case (pc, f) => (-f, pc) }
      .take(math.max(0, p.seedPieces - singles.size)).map(_._1)
    val inventory = singles ++ multis
    val k = inventory.size.toLong
    if (k == 0L)
      return Trained(Nil, Map.empty, Map.empty, 0L, Nil)

    // ---- initial costs from substring frequency
    val total0 = inventory.iterator.map(freq).sum
    var costs: Map[String, Long] = inventory.iterator.map { pc =>
      pc -> math.round(-1e6 * math.log(freq(pc).toDouble / total0))
    }.toMap

    // ---- EM rounds: Viterbi segment -> re-count -> smoothed re-cost
    var counts = Map.empty[String, Long]
    var tot = 0L
    var wordToks = Seq.empty[(String, Long)]
    for (_ <- 1 to p.rounds) {
      val cnt = scala.collection.mutable.HashMap.empty[String, Long]
      val toks = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      for ((w, wc) <- words) {
        val n = w.length
        // dp(i) = min key over L of ((dpCost(i-L) + cost(piece)) * 32 + L)
        val dpKey = new Array[Long](n + 1)
        java.util.Arrays.fill(dpKey, -1L)
        val dpCost = new Array[Long](n + 1)
        dpCost(0) = 0L
        var i = 1
        while (i <= n) {
          var best = Long.MaxValue
          var l = 1
          while (l <= math.min(i, p.maxPieceLen)) {
            if (dpKey(i - l) >= 0L || i - l == 0) {
              costs.get(w.substring(i - l, i)).foreach { c =>
                val key = (dpCost(i - l) + c) * 32L + l
                if (key < best) best = key
              }
            }
            l += 1
          }
          if (best != Long.MaxValue) { dpKey(i) = best; dpCost(i) = best / 32L }
          i += 1
        }
        // traceback (reachability: every seeded single char has a finite
        // smoothed cost, so dpKey(n) >= 0 always)
        var pos = n
        var nToks = 0L
        while (pos > 0) {
          val l = (dpKey(pos) % 32L).toInt
          val piece = w.substring(pos - l, pos)
          cnt(piece) = cnt.getOrElse(piece, 0L) + wc
          nToks += 1
          pos -= l
        }
        toks += ((w, nToks))
      }
      counts = inventory.iterator.map(pc => pc -> cnt.getOrElse(pc, 0L)).toMap
      tot = counts.valuesIterator.sum
      costs = inventory.iterator.map { pc =>
        pc -> math.round(-1e6 *
          math.log((counts(pc) + 1).toDouble / (tot + k)))
      }.toMap
      wordToks = toks.toSeq
    }
    Trained(inventory, counts, costs, tot, wordToks)
  }

  private def trained(docs: DataFrame, textCol: String, p: Params): Trained =
    trainCollected(
      wordTable(docs, textCol, p).collect()
        .map(r => (r.getString(0), r.getLong(1))), p)

  /** Learn the piece inventory. Output: one row per piece that survives
    * the final Viterbi round with cnt > 0 —
    * (piece, cnt, logp_micro = round(1e6·ln((cnt+1)/(tot+k)))). */
  def train(docs: DataFrame, textCol: String, p: Params = Params()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val t = trained(docs, textCol, p)
    val k = t.pieces.size.toLong
    t.pieces.iterator
      .map(pc => (pc, t.counts.getOrElse(pc, 0L)))
      .filter(_._2 > 0L)
      .map { case (pc, c) =>
        (pc, c, math.round(1e6 * math.log((c + 1).toDouble / (t.tot + k))))
      }.toSeq.toDF("piece", "cnt", "logp_micro")
  }

  /** Fertility/compression readout over the CORPUS under the trained
    * segmentation: per `srcCol` — filter-passing word occurrences,
    * occurrences covered by the (maxWords-capped) trained table, and the
    * summed Viterbi token count of the covered ones. One corpus scan,
    * broadcast join against the vocabulary-sized word→tokens table (the
    * [[Bpe.compression]] shape). */
  def fertility(docs: DataFrame, textCol: String, srcCol: String,
      p: Params = Params()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val t = trained(docs, textCol, p)
    val perWord = t.wordToks.toDF("word", "toks")
    docs.select(col(srcCol).as("source"),
        explode(split(col(textCol), " ")).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$")
        && length(col("word")) <= p.maxWordLen)
      .join(broadcast(perWord), Seq("word"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("words_total"),
        count(col("toks")).as("words_covered"),
        coalesce(sum(col("toks")), lit(0L)).as("unigram_tokens"))
  }

  // ------------------------------------------------------------------
  // DuckDB replica: the same pipeline with the DP unrolled as one CTE
  // stage per word position and the traceback the same way. Multi-
  // referenced CTEs are AS MATERIALIZED (exponential-inlining guard).
  // ------------------------------------------------------------------

  /** CTE chain shared by both oracle readouts: defines `wt` (capped word
    * table), `inv` (seeded inventory), and per-round `cost{r}`,
    * `cnt{r}`, `path{r}` tables, ending after round `p.rounds`. */
  private def oracleCtes(p: Params): String = {
    val L = p.maxPieceLen
    // occurrence grid: one row per (word, end-pos i, piece length l)
    val occ =
      s"""occ AS MATERIALIZED (
         |  SELECT word, wc, i, l, substr(word, i - l + 1, l) AS piece
         |  FROM wt,
         |       UNNEST(generate_series(1, length(word))) AS u1(i),
         |       UNNEST(generate_series(1, least(i, $L))) AS u2(l))""".stripMargin

    def dpRound(r: Int): String = {
      val oc = s"oc$r"
      val costed =
        s"""$oc AS MATERIALIZED (
           |  SELECT o.word, o.i, o.l, c.cost
           |  FROM occ o JOIN cost${r - 1} c ON c.piece = o.piece)""".stripMargin
      val stages = (1 to p.maxWordLen).map { i =>
        val prevs = (1 to math.min(i, L)).map { l =>
          if (i - l == 0)
            s"""SELECT o.word, o.cost * 32 + o.l AS key
               |    FROM $oc o WHERE o.i = $i AND o.l = $l""".stripMargin
          else
            s"""SELECT o.word, (d.dk // 32 + o.cost) * 32 + o.l AS key
               |    FROM $oc o JOIN dp${r}_${i - l} d ON d.word = o.word
               |    WHERE o.i = $i AND o.l = $l""".stripMargin
        }.mkString("\n    UNION ALL\n    ")
        s"""dp${r}_$i AS MATERIALIZED (
           |  SELECT word, min(key) AS dk FROM (
           |    $prevs)
           |  GROUP BY word)""".stripMargin
      }
      val dpAll =
        s"""dpall$r AS MATERIALIZED (
           |  ${(1 to p.maxWordLen)
               .map(i => s"SELECT word, $i AS i, dk FROM dp${r}_$i")
               .mkString("\n  UNION ALL\n  ")})""".stripMargin
      val tb = (1 to p.maxWordLen).map { t =>
        val src = if (t == 1) "SELECT word, length(word) AS pos FROM wt"
          else s"SELECT word, pos FROM tb${r}_${t - 1} WHERE pos > 0"
        s"""tb${r}_$t AS MATERIALIZED (
           |  SELECT s.word,
           |         CAST(s.pos - (d.dk % 32) AS BIGINT) AS pos,
           |         substr(s.word, CAST(s.pos - (d.dk % 32) + 1 AS INTEGER),
           |                CAST(d.dk % 32 AS INTEGER)) AS piece
           |  FROM ($src) s JOIN dpall$r d
           |    ON d.word = s.word AND d.i = s.pos)""".stripMargin
      }
      val path =
        s"""path$r AS MATERIALIZED (
           |  ${(1 to p.maxWordLen)
               .map(t => s"SELECT word, piece FROM tb${r}_$t")
               .mkString("\n  UNION ALL\n  ")})""".stripMargin
      val cnt =
        s"""cnt$r AS MATERIALIZED (
           |  SELECT i.piece,
           |         CAST(coalesce(sum(w.wc), 0) AS BIGINT) AS cnt
           |  FROM inv i LEFT JOIN path$r p2 ON p2.piece = i.piece
           |       LEFT JOIN wt w ON w.word = p2.word
           |  GROUP BY 1)""".stripMargin
      val cost =
        s"""cost$r AS MATERIALIZED (
           |  SELECT piece, CAST(round(-1e6 * ln((cnt + 1) * 1.0 /
           |           ((SELECT sum(cnt) FROM cnt$r)
           |            + (SELECT count(*) FROM inv)))) AS BIGINT) AS cost
           |  FROM cnt$r)""".stripMargin
      (Seq(costed) ++ stages ++ Seq(dpAll) ++ tb ++ Seq(path, cnt, cost))
        .mkString(",\n")
    }

    s"""WITH wt AS MATERIALIZED (
       |  SELECT word, wc FROM (
       |    SELECT word, CAST(count(*) AS BIGINT) AS wc
       |    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |    WHERE regexp_matches(word, '^[a-z0-9]+$$')
       |      AND length(word) <= ${p.maxWordLen}
       |    GROUP BY 1)
       |  ORDER BY wc DESC, word LIMIT ${p.maxWords}),
       |$occ,
       |cand AS MATERIALIZED (
       |  SELECT piece, CAST(sum(wc) AS BIGINT) AS freq
       |  FROM occ GROUP BY 1),
       |inv AS MATERIALIZED (
       |  SELECT piece, freq FROM cand WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, freq FROM (
       |    SELECT piece, freq,
       |           row_number() OVER (ORDER BY freq DESC, piece) AS rn
       |    FROM cand WHERE length(piece) > 1)
       |  WHERE rn <= ${p.seedPieces}
       |             - (SELECT count(*) FROM cand WHERE length(piece) = 1)),
       |cost0 AS MATERIALIZED (
       |  SELECT piece, CAST(round(-1e6 * ln(freq * 1.0 /
       |           (SELECT sum(freq) FROM inv))) AS BIGINT) AS cost
       |  FROM inv),
       |${(1 to p.rounds).map(dpRound).mkString(",\n")}""".stripMargin
  }

  /** DuckDB replica of [[train]]. */
  def trainOracleSql(p: Params = Params()): String = {
    val r = p.rounds
    s"""${oracleCtes(p)}
       |SELECT piece, cnt,
       |       CAST(round(1e6 * ln((cnt + 1) * 1.0 /
       |         ((SELECT sum(cnt) FROM cnt$r)
       |          + (SELECT count(*) FROM inv)))) AS BIGINT) AS logp_micro
       |FROM cnt$r WHERE cnt > 0""".stripMargin
  }

  /** DuckDB replica of [[fertility]]. */
  def fertilityOracleSql(p: Params = Params()): String = {
    val r = p.rounds
    s"""${oracleCtes(p)},
       |toks AS (SELECT word, CAST(count(*) AS BIGINT) AS toks
       |         FROM path$r GROUP BY 1)
       |SELECT c.source, CAST(count(*) AS BIGINT) AS words_total,
       |       CAST(count(t.word) AS BIGINT) AS words_covered,
       |       CAST(coalesce(sum(t.toks), 0) AS BIGINT) AS unigram_tokens
       |FROM (SELECT source, unnest(string_split(text, ' ')) AS word
       |      FROM documents) c
       |LEFT JOIN toks t ON t.word = c.word
       |WHERE regexp_matches(c.word, '^[a-z0-9]+$$')
       |  AND length(c.word) <= ${p.maxWordLen}
       |GROUP BY 1""".stripMargin
  }
}
