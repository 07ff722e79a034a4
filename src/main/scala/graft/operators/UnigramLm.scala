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
      rounds: Int = 2,
      pruneTo: Int = 0) {
    require(maxWordLen >= 1 && maxWordLen <= 30, "maxWordLen in [1,30]")
    require(maxPieceLen >= 1 && maxPieceLen <= maxWordLen,
      "maxPieceLen in [1,maxWordLen]")
    require(maxWords >= 1, "maxWords >= 1")
    require(seedPieces >= 40, "seedPieces must leave room for singles")
    require(rounds >= 1, "rounds >= 1")
    // pruneTo = 0 disables the pruning schedule (the fixed-inventory
    // variant); pruning needs a later round to re-estimate on the shrunk
    // inventory, so it requires rounds >= 2
    require(pruneTo == 0 || rounds >= 2, "pruning needs rounds >= 2")
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

  /** Viterbi DP for one word under a cost table: (total micro cost, path
    * pieces left-to-right). The DP argmin key `(cost·32 + L)` and the
    * traceback match the oracle's CTE unrolling exactly. Segmentability
    * is guaranteed only while every single char of the word has a cost —
    * true for the full inventory (singles are always seeded and never
    * pruned), so a finite path always exists. */
  private def viterbi(w: String, costs: Map[String, Long],
      maxPieceLen: Int): (Long, List[String]) = {
    val n = w.length
    val dpKey = new Array[Long](n + 1)
    java.util.Arrays.fill(dpKey, -1L)
    val dpCost = new Array[Long](n + 1)
    dpCost(0) = 0L
    var i = 1
    while (i <= n) {
      var best = Long.MaxValue
      var l = 1
      while (l <= math.min(i, maxPieceLen)) {
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
    var pos = n
    var path = List.empty[String]
    while (pos > 0) {
      val l = (dpKey(pos) % 32L).toInt
      path = w.substring(pos - l, pos) :: path
      pos -= l
    }
    (dpCost(n), path)
  }

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

    // ---- EM rounds: Viterbi segment -> (prune) -> re-count -> re-cost
    var inv = inventory
    var counts = Map.empty[String, Long]
    var tot = 0L
    var wordToks = Seq.empty[(String, Long)]
    for (r <- 1 to p.rounds) {
      val cnt = scala.collection.mutable.HashMap.empty[String, Long]
      val toks = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      val paths = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, List[String], Long)]
      for ((w, wc) <- words) {
        val (c, path) = viterbi(w, costs, p.maxPieceLen)
        path.foreach(pc => cnt(pc) = cnt.getOrElse(pc, 0L) + wc)
        toks += ((w, path.length.toLong))
        if (p.pruneTo > 0 && r < p.rounds) paths += ((w, wc, path, c))
      }
      // ---- pruning schedule (SentencePiece's shrink step, hard-EM
      // flavored): each multi-char piece's EM-loss contribution is the
      // wc-weighted increase of its words' best segmentation cost when
      // the piece is removed — measured under the SAME cost table the
      // round segmented with, so the oracle can reuse that round's
      // costed-occurrence table. Singles are never pruned (they are the
      // segmentability floor); loss >= 0 always (removing an option
      // cannot improve a min). Keep the pruneTo highest-loss pieces.
      if (p.pruneTo > 0 && r < p.rounds && inv.size > p.pruneTo) {
        val loss = scala.collection.mutable.HashMap.empty[String, Long]
        for ((w, wc, path, orig) <- paths;
             q <- path.distinct if q.length > 1) {
          val (alt, _) = viterbi(w, costs - q, p.maxPieceLen)
          loss(q) = loss.getOrElse(q, 0L) + wc * (alt - orig)
        }
        val singles = inv.filter(_.length == 1)
        val multis = inv.filter(_.length > 1)
          .sortBy(pc => (-loss.getOrElse(pc, 0L), pc))
          .take(math.max(0, p.pruneTo - singles.size))
        inv = singles ++ multis
      }
      counts = inv.iterator.map(pc => pc -> cnt.getOrElse(pc, 0L)).toMap
      tot = counts.valuesIterator.sum
      val kNow = inv.size.toLong
      costs = inv.iterator.map { pc =>
        pc -> math.round(-1e6 *
          math.log((counts(pc) + 1).toDouble / (tot + kNow)))
      }.toMap
      wordToks = toks.toSeq
    }
    Trained(inv, counts, costs, tot, wordToks)
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

  /** Name of the inventory in effect for round `r`'s counting/costing:
    * the seeded `inv` until a prune has happened, then `inv{j}p` of the
    * latest prune round j < r. */
  private def invNameFor(p: Params, r: Int): String =
    if (p.pruneTo > 0 && r > 1) s"inv${r - 1}p" else "inv"

  /** CTE chain shared by both oracle readouts: defines `wt` (capped word
    * table), `inv` (seeded inventory), per-round `cost{r}`, `cnt{r}`,
    * `path{r}` tables, and — when `p.pruneTo > 0` — the per-round prune
    * block (`loss{r}`, `inv{r}p`) after every non-final round, ending
    * after round `p.rounds`. */
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
      val invName = invNameFor(p, r)
      val pruneAfter = p.pruneTo > 0 && r < p.rounds
      val oc = s"oc$r"
      val costed =
        s"""$oc AS MATERIALIZED (
           |  SELECT o.word, o.i, o.l, o.piece, c.cost
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
           |  FROM $invName i LEFT JOIN path$r p2 ON p2.piece = i.piece
           |       LEFT JOIN wt w ON w.word = p2.word
           |  GROUP BY 1)""".stripMargin
      // ---- prune block (only between rounds): per-piece EM-loss =
      // wc-weighted alt-minus-orig DP cost with the piece removed,
      // measured under THIS round's segmenting costs (so the alt DP
      // reuses oc$r), keyed (word, rm) through the same stage unroll
      val pruneBlock = if (!pruneAfter) Seq.empty[String] else {
        val rm =
          s"""rm$r AS MATERIALIZED (
             |  SELECT DISTINCT word, piece AS rm FROM path$r
             |  WHERE length(piece) > 1)""".stripMargin
        val aoc =
          s"""aoc$r AS MATERIALIZED (
             |  SELECT r2.word, r2.rm, o.i, o.l, o.cost
             |  FROM rm$r r2 JOIN oc$r o ON o.word = r2.word
             |  WHERE o.piece <> r2.rm)""".stripMargin
        val astages = (1 to p.maxWordLen).map { i =>
          val prevs = (1 to math.min(i, L)).map { l =>
            if (i - l == 0)
              s"""SELECT o.word, o.rm, o.cost * 32 + o.l AS key
                 |    FROM aoc$r o WHERE o.i = $i AND o.l = $l""".stripMargin
            else
              s"""SELECT o.word, o.rm, (d.dk // 32 + o.cost) * 32 + o.l AS key
                 |    FROM aoc$r o JOIN adp${r}_${i - l} d
                 |      ON d.word = o.word AND d.rm = o.rm
                 |    WHERE o.i = $i AND o.l = $l""".stripMargin
          }.mkString("\n    UNION ALL\n    ")
          s"""adp${r}_$i AS MATERIALIZED (
             |  SELECT word, rm, min(key) AS dk FROM (
             |    $prevs)
             |  GROUP BY 1, 2)""".stripMargin
        }
        val aall =
          s"""aall$r AS MATERIALIZED (
             |  ${(1 to p.maxWordLen)
                 .map(i => s"SELECT word, rm, $i AS i, dk FROM adp${r}_$i")
                 .mkString("\n  UNION ALL\n  ")})""".stripMargin
        val orig =
          s"""orig$r AS MATERIALIZED (
             |  SELECT d.word, d.dk // 32 AS oc
             |  FROM dpall$r d JOIN wt w2
             |    ON w2.word = d.word AND d.i = length(w2.word))""".stripMargin
        val afin =
          s"""afin$r AS MATERIALIZED (
             |  SELECT a.word, a.rm, a.dk // 32 AS ac
             |  FROM aall$r a JOIN wt w2
             |    ON w2.word = a.word AND a.i = length(w2.word))""".stripMargin
        val loss =
          s"""loss$r AS MATERIALIZED (
             |  SELECT a.rm AS piece,
             |         CAST(sum(w2.wc * (a.ac - o2.oc)) AS BIGINT) AS loss
             |  FROM afin$r a JOIN orig$r o2 ON o2.word = a.word
             |       JOIN wt w2 ON w2.word = a.word
             |  GROUP BY 1)""".stripMargin
        val invp =
          s"""inv${r}p AS MATERIALIZED (
             |  SELECT piece, freq FROM $invName WHERE length(piece) = 1
             |  UNION ALL
             |  SELECT piece, freq FROM (
             |    SELECT i.piece, i.freq,
             |           row_number() OVER (ORDER BY coalesce(l.loss, 0) DESC,
             |                              i.piece) AS rn
             |    FROM $invName i LEFT JOIN loss$r l ON l.piece = i.piece
             |    WHERE length(i.piece) > 1)
             |  WHERE rn <= ${p.pruneTo}
             |    - (SELECT count(*) FROM $invName WHERE length(piece) = 1))"""
            .stripMargin
        Seq(rm, aoc) ++ astages ++ Seq(aall, orig, afin, loss, invp)
      }
      val costInv = if (pruneAfter) s"inv${r}p" else invName
      val cost =
        s"""cost$r AS MATERIALIZED (
           |  SELECT i.piece, CAST(round(-1e6 * ln((c.cnt + 1) * 1.0 /
           |           ((SELECT sum(c2.cnt) FROM $costInv i2
           |             JOIN cnt$r c2 ON c2.piece = i2.piece)
           |            + (SELECT count(*) FROM $costInv)))) AS BIGINT) AS cost
           |  FROM $costInv i JOIN cnt$r c ON c.piece = i.piece)""".stripMargin
      (Seq(costed) ++ stages ++ Seq(dpAll) ++ tb ++ Seq(path, cnt) ++
        pruneBlock ++ Seq(cost)).mkString(",\n")
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
    val finalInv = invNameFor(p, r)
    s"""${oracleCtes(p)}
       |SELECT piece, cnt,
       |       CAST(round(1e6 * ln((cnt + 1) * 1.0 /
       |         ((SELECT sum(cnt) FROM cnt$r)
       |          + (SELECT count(*) FROM $finalInv)))) AS BIGINT) AS logp_micro
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
