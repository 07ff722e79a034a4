package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece tokenizer training — the third mainstream subword family
  * next to [[Bpe]] (frequency argmax) and [[UnigramLm]] (EM over a piece
  * inventory). WordPiece (Schuster & Nakajima 2012; the BERT tokenizer)
  * runs BPE's merge loop but scores candidate pairs by the LIKELIHOOD
  * RATIO `count(pair) / (count(left) · count(right))` — the unigram-LM
  * likelihood gain of fusing the pair — instead of raw pair frequency,
  * and marks non-initial symbols with the `##` continuation prefix so
  * word-initial and word-internal units are distinct vocabulary entries
  * (`a` vs `##a`). A merge of `(x, ##y)` yields `x##y`-stripped = `xy`;
  * of `(##x, ##y)` yields `##xy` — the merged unit keeps the left
  * symbol's position marking.
  *
  * Scale shape: identical to [[Bpe]] — the corpus is touched once
  * (token explode → distinct-word counts); every merge round runs on the
  * bounded distinct-word table. Per round one extra vocabulary-sized
  * aggregate (the symbol unigram counts the denominator needs) joins the
  * pair table on its two symbol keys — both sides vocabulary-bounded,
  * AQE broadcasts them. The argmax is the same 1-row bounded-control-
  * plane collect. The score is the one double in the loop, computed
  * `CAST(cnt AS DOUBLE) / (CAST(ul AS DOUBLE) * ur)` on both engines
  * (the double product also sidesteps ANSI long-overflow at web-corpus
  * unit counts; at 100 TB the exact-rational comparison would move to
  * DECIMAL(38,0) cross-products).
  *
  * The caller owns returned frames per the [[Checkpoints]] contract.
  */
object Wordpiece {
  import Bpe.Sep

  /** The likelihood-ratio score, shared verbatim with the oracle so the
    * argmax ordering (score desc, lft, rgt) is IEEE-identical. */
  private val ScoreFrag = "CAST(cnt AS DOUBLE) / (CAST(ul AS DOUBLE) * ur)"
  private val ScorePicoFrag =
    s"CAST(round(1e12 * ($ScoreFrag)) AS BIGINT)"

  /** Distinct words with counts and the WordPiece symbolization: first
    * character bare, every later character `##`-prefixed. The
    * `[a-z0-9]+` pre-tokenization filter guarantees symbols never
    * contain `Sep`, quotes, or a mid-symbol `##`. */
  private[operators] def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .withColumn("seq", expr(
        s"""concat_ws('$Sep', transform(array_remove(split(word, ''), ''),
           |  (c, i) -> IF(i = 0, c, concat('##', c))))""".stripMargin))

  private final case class Rule(step: Int, lft: String, rgt: String,
    cnt: Long, ul: Long, ur: Long)

  private def trainLoop(docs: DataFrame, textCol: String, merges: Int)
      : (DataFrame, Seq[Rule]) = {
    var cur = wordTable(docs, textCol).localCheckpoint()
    val rules = scala.collection.mutable.ArrayBuffer.empty[Rule]
    var r = 1
    var exhausted = false
    while (r <= merges && !exhausted) {
      val units = cur
        .select(col("wc"), explode(split(col("seq"), Sep)).as("s"))
        .groupBy(col("s")).agg(sum(col("wc")).as("u"))
      val top = cur.select(col("wc"), split(col("seq"), Sep).as("arr"))
        .select(col("wc"), explode(expr(
          """CASE WHEN size(arr) >= 2 THEN transform(sequence(1, size(arr) - 1),
            |  i -> named_struct('lft', element_at(arr, i),
            |                    'rgt', element_at(arr, i + 1)))
            |ELSE array() END""".stripMargin)).as("p"))
        .groupBy(col("p.lft").as("lft"), col("p.rgt").as("rgt"))
        .agg(sum(col("wc")).as("cnt"))
        .join(units.select(col("s").as("lft"), col("u").as("ul")), Seq("lft"))
        .join(units.select(col("s").as("rgt"), col("u").as("ur")), Seq("rgt"))
        .select(col("lft"), col("rgt"), col("cnt"), col("ul"), col("ur"),
          expr(ScoreFrag).as("score"))
        .orderBy(col("score").desc, col("lft").asc, col("rgt").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val t = top(0)
        val (l, rt) = (t.getAs[String]("lft"), t.getAs[String]("rgt"))
        rules += Rule(r, l, rt, t.getAs[Long]("cnt"),
          t.getAs[Long]("ul"), t.getAs[Long]("ur"))
        // BPE's greedy leftmost fold, except the appended text drops the
        // continuation prefix: the merged unit keeps only acc's marking
        val rtStripped = rt.stripPrefix("##")
        val next = cur.withColumn("seq", expr(
          s"""aggregate(split(seq, '$Sep'), '', (acc, x) ->
             |  CASE WHEN acc = '' THEN x
             |       WHEN x = '$rt' AND (acc = '$l' OR endswith(acc, '$Sep$l'))
             |         THEN acc || '$rtStripped'
             |       ELSE acc || '$Sep' || x END)""".stripMargin))
          .localCheckpoint()
        Checkpoints.release(cur)
        cur = next
        r += 1
      }
    }
    (cur, rules.toSeq)
  }

  /** Learn `merges` likelihood-ratio merge rules. One row per rule:
    * (step, lft, rgt, cnt, ul, ur, score_pico) — the pair's weighted
    * count, both symbols' unigram counts at selection time, and the
    * pico-scaled score; ties break (score desc, lft asc, rgt asc). */
  def train(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    val spark = docs.sparkSession
    val (words, rules) = trainLoop(docs, textCol, merges)
    Checkpoints.release(words)
    import spark.implicits._
    rules.map(r => (r.step, r.lft, r.rgt, r.cnt, r.ul, r.ur))
      .toDF("step", "lft", "rgt", "cnt", "ul", "ur")
      .withColumn("score_pico", expr(ScorePicoFrag))
  }

  /** Train, then read the vocabulary off the final word table: the
    * `topK` most frequent units (corpus-weighted) under the learned
    * segmentation — `##`-marked continuations are distinct entries. */
  def vocab(docs: DataFrame, textCol: String, merges: Int,
      topK: Int): DataFrame = {
    val (words, _) = trainLoop(docs, textCol, merges)
    words.select(col("wc"), explode(split(col("seq"), Sep)).as("token"))
      .groupBy(col("token")).agg(sum(col("wc")).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(topK)
  }

  /** Greedy longest-match-first segmentation (the WordPiece ENCODER) of
    * one word against a unit inventory: repeatedly take the longest
    * vocabulary unit matching a prefix of the remainder (`##`-prefixed
    * after the first piece); None when some position has no match (the
    * `[UNK]` case). Driver-side helper for bounded inventories — the
    * corpus-scale readout rides the trained word table, whose merge-fold
    * segmentation agrees with longest-match for training words. */
  def segmentWord(word: String, units: Set[String]): Option[Seq[String]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < word.length) {
      val pfx = if (pos == 0) "" else "##"
      var len = word.length - pos
      var hit = -1
      while (len >= 1 && hit < 0) {
        if (units.contains(pfx + word.substring(pos, pos + len))) hit = len
        else len -= 1
      }
      if (hit < 0) return None
      out += pfx + word.substring(pos, pos + hit)
      pos += hit
    }
    Some(out.toSeq)
  }

  // ------------------------------------------------------------------
  // DuckDB replicas: the Bpe oracle chain plus a per-round unit-count
  // CTE; the argmax ORDER BY uses the same score expression text.
  // ------------------------------------------------------------------

  /** DuckDB replica of [[train]]. */
  def trainOracleSql(merges: Int): String = {
    val union = (1 to merges)
      .map(r => s"""SELECT $r AS step, lft, rgt, cnt, ul, ur,
                   |  $ScorePicoFrag AS score_pico
                   |FROM m$r""".stripMargin)
      .mkString(" UNION ALL ")
    s"${oracleCtes(merges)}\nSELECT * FROM ($union)"
  }

  /** DuckDB replica of [[vocab]]. */
  def vocabOracleSql(merges: Int, topK: Int): String =
    s"""${oracleCtes(merges)}
       |SELECT token, CAST(sum(wc) AS BIGINT) AS freq
       |FROM (SELECT wc, unnest(string_split(seq, '$Sep')) AS token
       |      FROM w$merges)
       |GROUP BY 1 ORDER BY freq DESC, token LIMIT $topK""".stripMargin

  private def oracleCtes(merges: Int): String = {
    val rounds = (1 to merges).map { r =>
      s"""u$r AS MATERIALIZED (
         |  SELECT s, CAST(sum(wc) AS BIGINT) AS u
         |  FROM (SELECT wc, unnest(string_split(seq, '$Sep')) AS s
         |        FROM w${r - 1})
         |  GROUP BY 1),
         |p$r AS (
         |  SELECT arr[i] AS lft, arr[i+1] AS rgt,
         |         CAST(sum(wc) AS BIGINT) AS cnt
         |  FROM (SELECT wc, string_split(seq, '$Sep') AS arr FROM w${r - 1}),
         |       UNNEST(generate_series(1, len(arr) - 1)) AS g(i)
         |  GROUP BY 1, 2),
         |m$r AS (
         |  SELECT p.lft, p.rgt, p.cnt, a.u AS ul, b.u AS ur
         |  FROM p$r p JOIN u$r a ON a.s = p.lft JOIN u$r b ON b.s = p.rgt
         |  ORDER BY ${ScoreFrag.replace("ul", "a.u").replace("ur", "b.u")
            .replace("cnt", "p.cnt")} DESC, p.lft, p.rgt LIMIT 1),
         |w$r AS MATERIALIZED (
         |  SELECT word, wc,
         |    list_reduce(string_split(seq, '$Sep'),
         |      (acc, x) -> CASE WHEN x = m.rgt AND (acc = m.lft OR
         |                         ends_with(acc, '$Sep' || m.lft))
         |                       THEN acc || CASE WHEN m.rgt LIKE '##%'
         |                         THEN substr(m.rgt, 3) ELSE m.rgt END
         |                       ELSE acc || '$Sep' || x END) AS seq
         |  FROM w${r - 1}, m$r m)""".stripMargin
    }.mkString(",\n")
    s"""WITH w0 AS MATERIALIZED (
       |  SELECT word, wc,
       |    array_to_string(list_transform(string_split(word, ''),
       |      (c, i) -> CASE WHEN i = 1 THEN c ELSE '##' || c END),
       |      '$Sep') AS seq
       |  FROM (SELECT word, CAST(count(*) AS BIGINT) AS wc
       |        FROM (SELECT unnest(string_split(text, ' ')) AS word
       |              FROM documents)
       |        WHERE regexp_matches(word, '^[a-z0-9]+$$')
       |        GROUP BY 1)),
       |$rounds""".stripMargin
  }
}
