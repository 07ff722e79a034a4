package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training — the canonical LLM-tokenizer
  * pipeline step (Sennrich et al. 2016): start from characters, repeatedly
  * merge the globally most frequent adjacent symbol pair.
  *
  * Scale shape: the corpus is touched ONCE (token explode → distinct-word
  * counts); every merge round then runs on the bounded distinct-word table
  * (vocabulary-sized — ~10^5 rows at sf0.1, ~10^7 on a 100 TB web corpus,
  * always orders of magnitude below the corpus), exactly how reference BPE
  * trainers scale. Per round: one map-side-combined pair-count aggregate, a
  * 1-row TakeOrdered argmax collect (bounded control plane, same contract
  * as `KMeans`' centroid collect), and a codegen'd `aggregate` HOF fold
  * rewriting each word's symbol sequence. No shuffle grows with rounds;
  * the word table is `localCheckpoint`ed per round so plans stay flat.
  *
  * Symbol sequences are separator-joined strings (U+001F, excluded from
  * the vocabulary by the pre-tokenization filter) rather than arrays: the
  * fold's boundary check `endswith(acc, SEP || left)` is then exact symbol
  * matching, and the greedy leftmost non-overlapping merge of standard BPE
  * falls out of a single left fold — on [a,a,a] rule (a,a) yields [aa,a],
  * and on [a,b,a,b] rule (a,b) yields [ab,ab], both matching reference
  * implementations.
  *
  * The caller owns the returned frame per the [[Checkpoints]] contract
  * (it is a local result assembled from the K collected merge rules, so
  * release is a no-op — documented for uniformity).
  */
object Bpe {
  val Sep = "\u001f"

  /** Pre-tokenized distinct words with counts and the character-level
    * symbolization. The `[a-z0-9]+` filter is the pre-tokenization
    * normalization step (and guarantees symbols never contain `Sep` or
    * SQL-literal metacharacters, so learned symbols can be inlined into
    * the fold expression as plain literals). */
  private[operators] def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      // array_remove guards the empty-string artifact Java's regex split
      // can append on zero-width matches; DuckDB's string_split(w, '')
      // yields exactly the characters
      .withColumn("seq",
        concat_ws(Sep, expr("array_remove(split(word, ''), '')")))

  /** Run the merge loop: returns the final (word, wc, seq) table — a
    * `localCheckpoint`ed frame the caller owns per the [[Checkpoints]]
    * contract — and the chosen rules. */
  private def trainLoop(docs: DataFrame, textCol: String, merges: Int)
      : (DataFrame, Seq[(Int, String, String, Long)]) = {
    var cur = wordTable(docs, textCol).localCheckpoint()
    val rules = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= merges && !exhausted) {
      val top = cur.select(col("wc"), split(col("seq"), Sep).as("arr"))
        .select(col("wc"), explode(expr(
          """CASE WHEN size(arr) >= 2 THEN transform(sequence(1, size(arr) - 1),
            |  i -> named_struct('lft', element_at(arr, i),
            |                    'rgt', element_at(arr, i + 1)))
            |ELSE array() END""".stripMargin)).as("p"))
        .groupBy(col("p.lft").as("lft"), col("p.rgt").as("rgt"))
        .agg(sum(col("wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("lft").asc, col("rgt").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, rt, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        rules += ((r, l, rt, c))
        // greedy leftmost single-pass merge; DuckDB's list_reduce over the
        // same CASE is fold-for-fold identical (its first-element init
        // equals this ''-init plus the acc = '' branch)
        val next = cur.withColumn("seq", expr(
          s"""aggregate(split(seq, '$Sep'), '', (acc, x) ->
             |  CASE WHEN acc = '' THEN x
             |       WHEN x = '$rt' AND (acc = '$l' OR endswith(acc, '$Sep$l'))
             |         THEN acc || x
             |       ELSE acc || '$Sep' || x END)""".stripMargin))
          .localCheckpoint()
        Checkpoints.release(cur)
        cur = next
        r += 1
      }
    }
    (cur, rules.toSeq)
  }

  /** Learn `merges` merge rules. Returns one row per rule:
    * (step, lft, rgt, cnt) where cnt is the pair's weighted frequency at
    * the time it was chosen; ties break (count desc, lft asc, rgt asc) so
    * the trajectory is deterministic. Stops early if no pair remains. */
  def train(docs: DataFrame, textCol: String, merges: Int): DataFrame = {
    val spark = docs.sparkSession
    val (words, rules) = trainLoop(docs, textCol, merges)
    Checkpoints.release(words)
    import spark.implicits._
    rules.toDF("step", "lft", "rgt", "cnt")
  }

  /** Train, then read the resulting vocabulary off the final word table:
    * the `topK` most frequent tokens (corpus-weighted, ties on the token)
    * under the learned segmentation. The caller owns the result per the
    * [[Checkpoints]] contract (it closes over the final checkpointed
    * word table). */
  def vocab(docs: DataFrame, textCol: String, merges: Int,
      topK: Int): DataFrame = {
    val (words, _) = trainLoop(docs, textCol, merges)
    words.select(col("wc"), explode(split(col("seq"), Sep)).as("token"))
      .groupBy(col("token")).agg(sum(col("wc")).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(topK)
  }

  /** Apply the learned segmentation back to the corpus: per `srcCol`,
    * whitespace-word count vs BPE-token count — the compression-ratio
    * readout a tokenizer-training run is judged by. The corpus pays one
    * more scan (token explode); per-word token counts ride a broadcast of
    * the vocabulary-sized word table (switch to a key join past ~10^7
    * distinct words). Caller owns the result per [[Checkpoints]]. */
  def compression(docs: DataFrame, textCol: String, srcCol: String,
      merges: Int): DataFrame = {
    val (words, _) = trainLoop(docs, textCol, merges)
    val perWord = words.select(col("word"),
      size(split(col("seq"), Sep)).cast("long").as("toks"))
    docs.select(col(srcCol).as("source"),
        explode(split(col(textCol), " ")).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .join(broadcast(perWord), Seq("word"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("words"), sum(col("toks")).as("bpe_tokens"))
  }

  /** DuckDB replica of [[compression]]. */
  def compressionOracleSql(merges: Int): String =
    s"""${oracleCtes(merges)}
       |SELECT source, count(*) AS words,
       |       CAST(sum(len(string_split(seq, '$Sep'))) AS BIGINT) AS bpe_tokens
       |FROM (SELECT source, unnest(string_split(text, ' ')) AS word
       |      FROM documents) c
       |JOIN w$merges USING (word)
       |GROUP BY 1""".stripMargin

  /** DuckDB replica of [[train]]: the K rounds unrolled as CTE triples
    * (pair counts → 1-row argmax → list_reduce rewrite), `UNION ALL` of
    * the argmax rows. String-accumulator fold only — DuckDB's list_reduce
    * is unsafe on struct accumulators at scale. */
  def trainOracleSql(merges: Int): String = {
    val union = (1 to merges)
      .map(r => s"SELECT $r AS step, lft, rgt, cnt FROM m$r")
      .mkString(" UNION ALL ")
    s"${oracleCtes(merges)}\nSELECT * FROM ($union)"
  }

  /** DuckDB replica of [[vocab]]: the same CTE chain, final select reads
    * token frequencies off the last rewritten word table. */
  def vocabOracleSql(merges: Int, topK: Int): String =
    s"""${oracleCtes(merges)}
       |SELECT token, CAST(sum(wc) AS BIGINT) AS freq
       |FROM (SELECT wc, unnest(string_split(seq, '$Sep')) AS token
       |      FROM w$merges)
       |GROUP BY 1 ORDER BY freq DESC, token LIMIT $topK""".stripMargin

  private def oracleCtes(merges: Int): String = {
    val rounds = (1 to merges).map { r =>
      s"""p$r AS (
         |  SELECT arr[i] AS lft, arr[i+1] AS rgt,
         |         CAST(sum(wc) AS BIGINT) AS cnt
         |  FROM (SELECT wc, string_split(seq, '$Sep') AS arr FROM w${r - 1}),
         |       UNNEST(generate_series(1, len(arr) - 1)) AS u(i)
         |  GROUP BY 1, 2),
         |m$r AS (SELECT lft, rgt, cnt FROM p$r
         |        ORDER BY cnt DESC, lft, rgt LIMIT 1),
         |w$r AS (
         |  SELECT word, wc,
         |    list_reduce(string_split(seq, '$Sep'),
         |      (acc, x) -> CASE WHEN x = m.rgt AND (acc = m.lft OR
         |                         ends_with(acc, '$Sep' || m.lft))
         |                       THEN acc || x
         |                       ELSE acc || '$Sep' || x END) AS seq
         |  FROM w${r - 1}, m$r m)""".stripMargin
    }.mkString(",\n")
    s"""WITH w0 AS (
       |  SELECT word, count(*) AS wc,
       |         array_to_string(string_split(word, ''), '$Sep') AS seq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE regexp_matches(word, '^[a-z0-9]+$$')
       |  GROUP BY 1),
       |$rounds""".stripMargin
  }
}
