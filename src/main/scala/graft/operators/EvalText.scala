package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-generation evaluation metrics — the n-gram-overlap half of the
  * eval family next to [[Classifier.evalMetrics]]' scoring half: corpus
  * BLEU (Papineni et al. 2002) and per-document ROUGE-N recall (Lin
  * 2004), the two numbers every generation/summarization eval reports.
  *
  * Scale shape: candidate and reference token tables (one corpus scan
  * each), n-gram construction by per-document `lead` windows (document-
  * grain partitions — no corpus-grain window; BLEU fuses ALL orders into
  * one windowed pass per side), clipped-count matching by one
  * (id, n, gram) equi-join, then map-side-combinable aggregates.
  * Everything is an exact integer until the single closing mirrored
  * double (brevity penalty × geometric mean for BLEU, one ratio for
  * ROUGE), micro-rounded at scale 0 — the established discipline.
  *
  * No smoothing: a zero n-gram match at any order zeroes corpus BLEU
  * (the textbook definition; smoothed variants exist but their additive
  * constants are convention-dependent, and the integer match/total
  * columns are emitted alongside so any smoothing is a driver-side
  * readout away).
  */
object EvalText {

  /** (id, pos, w) token table for one side, positions re-ranked dense
    * so n-grams ride consecutive positions. */
  private def toks(pairs: DataFrame, idCol: String, textCol: String) = {
    import org.apache.spark.sql.expressions.Window
    pairs.select(col(idCol).as("id"),
        posexplode(split(col(textCol), " ")).as(Seq("p0", "w")))
      .filter(col("w") =!= "")
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("p0"))).cast("long"))
      .select(col("id"), col("pos"), col("w"))
  }

  /** (id, gram, c) n-gram counts from a token table: per-document lead
    * window, grams joined with U+001F so token boundaries are exact. */
  private def gramCounts(t: DataFrame, n: Int) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val parts = (0 until n).map(k =>
      if (k == 0) col("w") else lead(col("w"), k).over(w))
    t.select(col("id"), concat_ws("\u001f", parts: _*).as("g"),
        parts.last.isNotNull.as("full"))
      .filter(col("full"))
      .groupBy(col("id"), col("g")).agg(count(lit(1)).as("c"))
  }

  /** (id, n, gram, c) counts for ALL orders 1..maxN from ONE pass: a
    * single per-document window sort computes every lead once, the
    * (n, gram) pairs ride one Generate, and one aggregate counts them —
    * vs one sort + one aggregate PER ORDER PER SIDE in the unfused
    * shape (round-15 text_bleu spent 4.8 s on 8 gram-table scans; the
    * fused plan pays 2). */
  private def gramCountsMulti(t: DataFrame, maxN: Int) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id")).orderBy(col("pos"))
    val leads = (1 until maxN).map(k => lead(col("w"), k).over(w).as(s"w$k"))
    val base = t.select(col("id") +: col("w").as("w0") +: leads: _*)
    val gramCols = (1 to maxN).map { n =>
      val parts = (0 until n).map(k => col(s"w$k"))
      struct(lit(n).as("n"), concat_ws("\u001f", parts: _*).as("g"),
        parts.last.isNotNull.as("full"))
    }
    base.select(col("id"), explode(array(gramCols: _*)).as("t"))
      .filter(col("t.full"))
      .select(col("id"), col("t.n").as("n"), col("t.g").as("g"))
      .groupBy(col("id"), col("n"), col("g")).agg(count(lit(1)).as("c"))
  }

  /** Corpus BLEU-`maxN`: one row —
    * (n_pairs, cand_len, ref_len, m1, t1, …, m{maxN}, t{maxN},
    * bleu_micro). `m_n` = Σ clipped n-gram matches, `t_n` = Σ candidate
    * n-gram counts; `bleu_micro = round(1e6 · BP · (Π m_n/t_n)^(1/maxN))`,
    * 0 when any order has zero matches. */
  def corpusBleu(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 6, s"maxN in [1,6], got $maxN")
    // dense token arrays once per side (the sequences toks() exploded),
    // then BOTH sides ride one side-tagged native-kernel gram stream into
    // ONE (id, n, g) aggregate; least(c, cr) per row reproduces the old
    // inner join's clipped-match sum (a gram absent on either side
    // contributes 0), so the per-side aggregates, the (id, n, g)
    // equi-join, the totals aggregate and their joins all collapse into
    // one map-side-combined aggregate plus a single-row pivot — and no
    // window sort exists at any scale (the windowed form's per-id
    // exchange was also AQE-coalesced to single tasks at eval-panel
    // size). Token lengths read sum(size(arr)) — same counts toks() gave.
    val base = pairs.select(col(idCol).as("id"),
      filter(split(col(candCol), " "), w => w =!= "").as("ca"),
      filter(split(col(refCol), " "), w => w =!= "").as("ra")).persist()
    val lens = base.agg(
        coalesce(sum(size(col("ca"))), lit(0L)).cast("long").as("cand_len"),
        coalesce(sum(size(col("ra"))), lit(0L)).cast("long").as("ref_len"))
      .crossJoin(base.select(col("id")).distinct()
        .agg(count(lit(1)).as("n_pairs")))
    def side(arrCol: String, tag: Int) = base.select(col("id"),
      lit(tag).as("side"),
      explode(graft.functions.NgramsNative.ngramsAll(col(arrCol), maxN))
        .as("t"))
    val both = side("ca", 0).unionByName(side("ra", 1))
      .select(col("id"), col("t.n").as("n"), col("t.g").as("g"), col("side"))
      .groupBy(col("id"), col("n"), col("g"))
      .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("c"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("cr"))
    val pivotCols = (1 to maxN).flatMap(n => Seq(
      coalesce(sum(when(col("n") === n, least(col("c"), col("cr")))),
        lit(0L)).as(s"m$n"),
      coalesce(sum(when(col("n") === n, col("c"))), lit(0L)).as(s"t$n")))
    val perN = both.agg(pivotCols.head, pivotCols.tail: _*)
    val joined = lens.crossJoin(perN)
    val zeroGuard = (1 to maxN)
      .map(n => s"m$n = 0 OR t$n = 0").mkString(" OR ")
    val prod = (1 to maxN)
      .map(n => s"CAST(m$n AS DOUBLE) / t$n")
      .mkString(" * ")
    val out = joined.select(
      (Seq(col("n_pairs"), col("cand_len"), col("ref_len")) ++
        (1 to maxN).flatMap(n => Seq(col(s"m$n"), col(s"t$n"))) :+
        expr(
          s"""CASE WHEN $zeroGuard OR cand_len = 0 THEN CAST(0 AS BIGINT)
             |ELSE CAST(round(1e6
             |  * (CASE WHEN cand_len >= ref_len THEN 1.0D
             |     ELSE exp(1.0D - CAST(ref_len AS DOUBLE) / cand_len) END)
             |  * power($prod, 1.0D / $maxN)) AS BIGINT)
             |END""".stripMargin).as("bleu_micro")): _*)
    val materialized = out.localCheckpoint()
    base.unpersist()
    materialized
  }

  /** Per-document ROUGE-N recall: (id, m, ref_grams, rouge_micro =
    * round(1e6 · m/ref_grams); NULL when the reference has no n-grams).
    * Documents whose candidate shares nothing still get their row —
    * "no overlap" reads 0, "no reference" reads NULL. */
  def rougeRecall(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String, n: Int = 2): DataFrame = {
    require(n >= 1 && n <= 6, s"n in [1,6], got $n")
    val cg = gramCounts(toks(pairs, idCol, candCol), n)
    val rg = gramCounts(toks(pairs, idCol, refCol), n)
    val m = cg.join(rg.withColumnRenamed("c", "cr"), Seq("id", "g"))
      .groupBy(col("id"))
      .agg(sum(least(col("c"), col("cr"))).as("m0"))
    pairs.select(col(idCol).as("id")).distinct()
      .join(rg.groupBy(col("id")).agg(sum(col("c")).as("ref_grams")),
        Seq("id"), "left")
      .join(m, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("m0"), lit(0L)).as("m"),
        coalesce(col("ref_grams"), lit(0L)).as("ref_grams"),
        expr("""CASE WHEN coalesce(ref_grams, 0) = 0
               |  THEN CAST(NULL AS BIGINT)
               |ELSE CAST(round(1e6 * coalesce(m0, 0) / ref_grams)
               |  AS BIGINT) END""".stripMargin).as("rouge_micro"))
  }

  /** [[corpusBleu]] plus a Chen–Cherry method-2 smoothed readout
    * (`bleu_smooth_micro`): unigram precision stays exact, every higher
    * order reads (m_n + 1)/(t_n + 1), so a zero match at one order no
    * longer zeroes the corpus score. A pure readout over the exact
    * integer m_n/t_n columns corpusBleu already emits — no new scan,
    * same CTE chain, one more mirrored closing double. */
  def smoothedBleu(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String, maxN: Int = 4): DataFrame = {
    val base = corpusBleu(pairs, idCol, candCol, refCol, maxN)
    base.select(col("*"),
      expr(bleuSmoothFrag("D", maxN)).as("bleu_smooth_micro"))
  }

  private def bleuSmoothFrag(d: String, maxN: Int): String = {
    val prod = (s"CAST(m1 AS DOUBLE) / t1" +:
      (2 to maxN).map(n => s"((m$n + 1.0$d) / (t$n + 1.0$d))"))
      .mkString(" * ")
    s"""CASE WHEN m1 = 0 OR t1 = 0 OR cand_len = 0 THEN CAST(0 AS BIGINT)
       |ELSE CAST(round(1e6
       |  * (CASE WHEN cand_len >= ref_len THEN 1.0$d
       |     ELSE exp(1.0$d - CAST(ref_len AS DOUBLE) / cand_len) END)
       |  * power($prod, 1.0$d / $maxN)) AS BIGINT)
       |END""".stripMargin
  }

  /** Per-document ROUGE-L: (id, lcs, cand_len, ref_len, rl_recall_micro,
    * rl_f1_micro). LCS over whitespace tokens via the native
    * [[graft.functions.LcsLength]] kernel (O(len²) per doc, document
    * grain, embarrassingly parallel). Recall = LCS/ref_len (NULL when the
    * reference is empty); F1 = harmonic mean of LCS precision and recall
    * (Lin 2004 uses F-β with β→∞ ≈ recall; both conventions are readouts
    * of the exact integer columns emitted, F1 is the one mirrored). */
  def rougeL(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String): DataFrame =
    pairs.select(col(idCol).as("id"),
        filter(split(col(candCol), " "), _ =!= "").as("ct"),
        filter(split(col(refCol), " "), _ =!= "").as("rt"))
      .select(col("id"),
        graft.functions.LcsNative.lcsLength(col("ct"), col("rt")).as("lcs"),
        size(col("ct")).cast("long").as("cand_len"),
        size(col("rt")).cast("long").as("ref_len"))
      .select(col("id"), col("lcs"), col("cand_len"), col("ref_len"),
        expr(rlRecallFrag).as("rl_recall_micro"),
        expr(rlF1Frag("D")).as("rl_f1_micro"))

  // closing doubles shared fragment-for-fragment with the oracle (the `d`
  // parameter writes Spark's D literal suffix; bare decimals parse as
  // DECIMAL in Spark SQL and the derived arithmetic then drifts)
  private def rlRecallFrag: String =
    """CASE WHEN ref_len = 0 THEN CAST(NULL AS BIGINT)
      |ELSE CAST(round(1e6 * CAST(lcs AS DOUBLE) / ref_len) AS BIGINT)
      |END""".stripMargin
  private def rlF1Frag(d: String): String =
    s"""CASE WHEN cand_len = 0 OR ref_len = 0 THEN CAST(NULL AS BIGINT)
       |WHEN lcs = 0 THEN CAST(0 AS BIGINT)
       |ELSE CAST(round(1e6
       |  * (2.0$d * (CAST(lcs AS DOUBLE) / cand_len)
       |     * (CAST(lcs AS DOUBLE) / ref_len))
       |  / (CAST(lcs AS DOUBLE) / cand_len + CAST(lcs AS DOUBLE) / ref_len))
       |  AS BIGINT)
       |END""".stripMargin

  /** Per-document TER (translation edit rate, Snover et al. 2006, the
    * shift-less variant — word-level Levenshtein over reference length;
    * the phrase-shift search is NP-hard and every large-scale TER
    * implementation approximates it, this one documents edit-only):
    * (id, edits, cand_len, ref_len, ter_micro). Distance via the native
    * [[graft.functions.WordEditDistance]] kernel — document grain,
    * embarrassingly parallel, O(len²) per doc. TER = edits/ref_len (can
    * exceed 1; NULL when the reference is empty), micro-scaled. */
  def ter(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String): DataFrame =
    pairs.select(col(idCol).as("id"),
        filter(split(col(candCol), " "), _ =!= "").as("ct"),
        filter(split(col(refCol), " "), _ =!= "").as("rt"))
      .select(col("id"),
        graft.functions.EditDistNative.wordEditDistance(col("ct"), col("rt"))
          .as("edits"),
        size(col("ct")).cast("long").as("cand_len"),
        size(col("rt")).cast("long").as("ref_len"))
      .select(col("id"), col("edits"), col("cand_len"), col("ref_len"),
        expr(terFrag).as("ter_micro"))

  private def terFrag: String =
    """CASE WHEN ref_len = 0 THEN CAST(NULL AS BIGINT)
      |ELSE CAST(round(1e6 * CAST(edits AS DOUBLE) / ref_len) AS BIGINT)
      |END""".stripMargin

  /** (id, n, gram, c) counts for ALL orders 1..maxN built from a per-row
    * token ARRAY — the window-free [[gramCountsMulti]]: gram construction
    * is a per-row array expression riding the (spread) scan partitioning,
    * and the ONLY exchange is the map-side-combined count aggregate.
    *
    * Why: the windowed form's `Window.partitionBy(id)` exchange carries
    * few BYTES at eval-panel sizes, so AQE coalesces it to ONE partition
    * — and then the expensive part (per-token lead projection, ×maxN
    * explode, partial aggregation) runs in a single task (measured: the
    * four 1-task stages held ~5 s of text_chrf's 6.3 s). Building grams
    * from the token array needs no sort and no pre-aggregate exchange at
    * ANY scale. Gram keys are byte-identical (same U+001F join of the
    * same dense token sequence), so counts — and every downstream corpus
    * sum — are unchanged.
    *
    * `arr` must be the DENSE token array (empties already filtered). */
  private def gramCountsMultiArr(rows: DataFrame, maxN: Int) = {
    // all orders' grams from ONE native per-row kernel (an earlier HOF
    // transform/slice/concat_ws form paid interpreted-expression overhead
    // per GRAM - ~2.5 s per gram branch at the eval panel, measured);
    // gram bytes identical, see NgramsImpl
    rows.select(col("id"),
        explode(graft.functions.NgramsNative.ngramsAll(col("arr"), maxN))
          .as("t"))
      .select(col("id"), col("t.n").as("n"), col("t.g").as("g"))
      .groupBy(col("id"), col("n"), col("g")).agg(count(lit(1)).as("c"))
  }

  private def chrfTriples(pfx: String, maxN: Int): Seq[(String, String, String)] =
    (1 to maxN).map(n => (s"${pfx}m$n", s"${pfx}t$n", s"${pfx}r$n"))

  /** The chrF F-β readout over (match, cand-total, ref-total) column
    * triples: per-order precision/recall read 0 when their denominator
    * is 0 (Popović 2015's convention for absent orders), arithmetic
    * mean over orders, F-β with β² recall weighting. Shared
    * fragment-for-fragment with the oracle (`d` writes Spark's D
    * suffix) so the IEEE op order matches exactly. */
  private def chrfFrag(d: String, triples: Seq[(String, String, String)],
      beta: Double): String = {
    val nOrders = triples.size
    val b2 = beta * beta
    val ps = triples.map { case (m, t, _) =>
      s"(CASE WHEN $t > 0 THEN CAST($m AS DOUBLE) / $t ELSE 0.0$d END)"
    }.mkString(" + ")
    val rs = triples.map { case (m, _, r) =>
      s"(CASE WHEN $r > 0 THEN CAST($m AS DOUBLE) / $r ELSE 0.0$d END)"
    }.mkString(" + ")
    s"""CASE WHEN ($ps) = 0.0$d OR ($rs) = 0.0$d THEN CAST(0 AS BIGINT)
       |ELSE CAST(round(1e6
       |  * (1.0$d + $b2$d) * (($ps) / $nOrders) * (($rs) / $nOrders)
       |  / ($b2$d * (($ps) / $nOrders) + (($rs) / $nOrders))) AS BIGINT)
       |END""".stripMargin
  }

  /** Corpus chrF (Popović 2015) and chrF++ (Popović 2017) in one row:
    * (n_pairs, cm1..cm{charN}, ct1.., cr1.., wm1..wm{wordN}, wt1..,
    * wr1.., chrf_micro, chrf_pp_micro). `cm/ct/cr` are the corpus-summed
    * clipped char-n-gram matches / candidate totals / reference totals
    * per order (whitespace removed before char grams); `wm/wt/wr` the
    * same at word grain. chrF averages the char orders' precision and
    * recall and closes with F-β (β=2, recall-weighted); chrF++ extends
    * the average with the word orders. Every count is an exact integer
    * until the closing mirrored double — zero-denominator orders
    * contribute 0 (the sacrebleu epsilon conventions differ by
    * implementation; this one is documented and mirrored exactly).
    *
    * Scale shape: identical to [[corpusBleu]] — per-document windows,
    * one (id, n, gram) equi-join per grain, map-side-combinable sums to
    * ~30 scalars. Char tables are ~5× the word-token row count and ride
    * the same document-grain partitioning. */
  def chrF(pairs: DataFrame, idCol: String, candCol: String,
      refCol: String, charN: Int = 6, wordN: Int = 2,
      beta: Double = 2.0): DataFrame = {
    require(charN >= 1 && charN <= 8, s"charN in [1,8], got $charN")
    require(wordN >= 1 && wordN <= 4, s"wordN in [1,4], got $wordN")
    // dense token arrays per grain (same sequences chars()/toks() emitted
    // as exploded rows), cached once: the four gram branches and the
    // n_pairs aggregate all read this 1-row-per-pair frame instead of
    // four exploded-and-persisted token tables — and gram construction
    // goes through the window-free [[gramCountsMultiArr]] (the windowed
    // form's per-id exchange carried so few bytes at eval-panel size that
    // AQE coalesced it to ONE partition, serializing the expensive
    // explode/aggregate work into single tasks — 4 × ~1-3 s of the
    // measured entry).
    def charArr(c: String) =
      filter(split(translate(col(c), " ", ""), ""), w => w =!= "")
    def wordArr(c: String) = filter(split(col(c), " "), w => w =!= "")
    val base = pairs.select(col(idCol).as("id"),
      charArr(candCol).as("cand_c"), charArr(refCol).as("ref_c"),
      wordArr(candCol).as("cand_w"), wordArr(refCol).as("ref_w")).persist()
    def stats(candArr: String, refArr: String, maxN: Int, pfx: String) = {
      // BOTH sides ride one side-tagged gram stream into ONE (id, n, g)
      // aggregate; the clipped match then reads least(c, cr) per row —
      // a gram absent on either side contributes least(..) = 0, exactly
      // the old inner join's sum — so the separate per-side aggregates,
      // the (id, n, g) equi-join and the totals full-join all collapse
      // into one map-side-combined aggregate plus a single-row pivot.
      def side(arrCol: String, tag: Int) = base.select(col("id"),
        lit(tag).as("side"),
        explode(graft.functions.NgramsNative.ngramsAll(col(arrCol), maxN))
          .as("t"))
      val both = side(candArr, 0).unionByName(side(refArr, 1))
        .select(col("id"), col("t.n").as("n"), col("t.g").as("g"),
          col("side"))
        .groupBy(col("id"), col("n"), col("g"))
        .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("c"),
          sum(when(col("side") === 1, 1L).otherwise(0L)).as("cr"))
      val pivotCols = (1 to maxN).flatMap(n => Seq(
        coalesce(sum(when(col("n") === n, least(col("c"), col("cr")))),
          lit(0L)).as(s"${pfx}m$n"),
        coalesce(sum(when(col("n") === n, col("c"))), lit(0L)).as(s"${pfx}t$n"),
        coalesce(sum(when(col("n") === n, col("cr"))), lit(0L)).as(s"${pfx}r$n")))
      both.agg(pivotCols.head, pivotCols.tail: _*)
    }
    val lens = base.select(col("id")).distinct()
      .agg(count(lit(1)).as("n_pairs"))
    val joined = lens
      .crossJoin(stats("cand_c", "ref_c", charN, "c"))
      .crossJoin(stats("cand_w", "ref_w", wordN, "w"))
    val out = joined.select(col("*"),
      expr(chrfFrag("D", chrfTriples("c", charN), beta)).as("chrf_micro"),
      expr(chrfFrag("D", chrfTriples("c", charN) ++ chrfTriples("w", wordN),
        beta)).as("chrf_pp_micro"))
    val materialized = out.localCheckpoint()
    base.unpersist()
    materialized
  }

  // ------------------------------------------------------------------
  // DuckDB replicas. `pairsCte` must define `pairs(id, cand, ref)`;
  // the closing double expression is generated from the SAME fragment
  // as the Spark side so the IEEE op order matches exactly.
  // ------------------------------------------------------------------

  /** Token + n-gram CTEs for one side (`cand`/`ref` column of pairs):
    * defines `{side}t(id, pos, w)` and `{side}g{n}(id, g, c)`. */
  private def sideCtes(side: String, ns: Seq[Int]): String =
    sideCtesOver(side, ns, s"string_split($side, ' ')")

  /** The same CTE chain over an arbitrary token-list expression (word
    * split for BLEU/ROUGE, char split for chrF): defines
    * `{pfx}t(id, pos, w)` and `{pfx}g{n}(id, g, c)`. */
  private def sideCtesOver(pfx: String, ns: Seq[Int],
      listExpr: String): String = {
    val tok =
      s"""${pfx}t AS MATERIALIZED (
         |  SELECT id, CAST(row_number() OVER (PARTITION BY id ORDER BY i)
         |    AS BIGINT) AS pos, w
         |  FROM (SELECT id, t.i AS i, ws[CAST(t.i AS INT)] AS w
         |        FROM (SELECT id, $listExpr AS ws FROM pairs),
         |             unnest(range(1, len(ws) + 1)) AS t(i))
         |  WHERE w <> '')""".stripMargin
    val grams = ns.map { n =>
      val g = (0 until n).map {
        case 0 => "w"
        case k => s"lead(w, $k) OVER (PARTITION BY id ORDER BY pos)"
      }.mkString(" || chr(31) || ")
      val full = if (n == 1) "TRUE"
        else s"lead(w, ${n - 1}) OVER (PARTITION BY id ORDER BY pos) IS NOT NULL"
      s"""${pfx}g$n AS MATERIALIZED (
         |  SELECT id, g, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT id, $g AS g, $full AS is_full FROM ${pfx}t)
         |  WHERE is_full GROUP BY 1, 2)""".stripMargin
    }
    (tok +: grams).mkString(",\n")
  }

  /** DuckDB replica of [[corpusBleu]]. */
  def bleuOracleSql(pairsCte: String, maxN: Int = 4): String =
    bleuOracleCore(pairsCte, maxN, "")

  /** DuckDB replica of [[smoothedBleu]] — the same chain plus the
    * smoothed readout column. */
  def smoothedBleuOracleSql(pairsCte: String, maxN: Int = 4): String =
    bleuOracleCore(pairsCte, maxN,
      s",\n  ${bleuSmoothFrag("", maxN)} AS bleu_smooth_micro")

  private def bleuOracleCore(pairsCte: String, maxN: Int,
      extraCols: String): String = {
    val mt = (1 to maxN).map { n =>
      s"""mt$n AS (SELECT
         |  (SELECT CAST(coalesce(sum(least(a.c, b.c)), 0) AS BIGINT)
         |   FROM cg$n a JOIN rg$n b ON b.id = a.id AND b.g = a.g) AS m$n,
         |  (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM cg$n) AS t$n)"""
        .stripMargin
    }.mkString(",\n")
    val zeroGuard = (1 to maxN).map(n => s"m$n = 0 OR t$n = 0")
      .mkString(" OR ")
    val prod = (1 to maxN).map(n => s"CAST(m$n AS DOUBLE) / t$n")
      .mkString(" * ")
    val mtList = (1 to maxN).map(n => s"mt$n").mkString(" CROSS JOIN ")
    val cols = (1 to maxN).map(n => s"m$n, t$n").mkString(", ")
    s"""WITH $pairsCte,
       |${sideCtes("cand", 1 to maxN).replace("candg", "cg")},
       |${sideCtes("ref", 1 to maxN).replace("refg", "rg")},
       |lens AS (SELECT
       |  (SELECT CAST(count(*) AS BIGINT) FROM candt) AS cand_len,
       |  (SELECT CAST(count(*) AS BIGINT) FROM reft) AS ref_len,
       |  (SELECT CAST(count(DISTINCT id) AS BIGINT) FROM pairs) AS n_pairs),
       |$mt
       |SELECT n_pairs, cand_len, ref_len, $cols,
       |  CASE WHEN $zeroGuard OR cand_len = 0 THEN CAST(0 AS BIGINT)
       |  ELSE CAST(round(1e6
       |    * (CASE WHEN cand_len >= ref_len THEN 1.0
       |       ELSE exp(1.0 - CAST(ref_len AS DOUBLE) / cand_len) END)
       |    * power($prod, 1.0 / $maxN)) AS BIGINT)
       |  END AS bleu_micro$extraCols
       |FROM lens CROSS JOIN $mtList""".stripMargin
  }

  /** DuckDB replica of [[rougeL]]. DuckDB has no LCS function, so the
    * oracle runs the DP itself as a recursive CTE over candidate
    * positions, carrying each document's DP row as a LIST with a leading
    * sentinel (`row[1] = L[i][0] = 0`, `row[j+1] = L[i][j]`). The row
    * update uses the last-match identity — `L[i][j] = max(L[i-1][j],
    * L[i-1][mk-1] + 1)` where `mk` is the LARGEST position ≤ j with
    * `ref[mk] = cand[i]` — which is exact because DP rows are
    * non-decreasing in j (property-checked against the classic
    * three-branch DP in EvalTextSpec). Match positions are precomputed
    * per (doc, candidate position) so each iteration touches only the
    * few positions where the token actually occurs. */
  def rougeLOracleSql(pairsCte: String): String =
    s"""WITH RECURSIVE $pairsCte,
       |rldocs AS MATERIALIZED (
       |  SELECT id,
       |         list_filter(string_split(cand, ' '), x -> x <> '') AS ct,
       |         list_filter(string_split(ref, ' '), x -> x <> '') AS rt
       |  FROM pairs),
       |rldims AS MATERIALIZED (
       |  SELECT id, len(ct) AS cl, len(rt) AS rl,
       |    list_transform(range(1, len(ct) + 1), i ->
       |      list_filter(range(1, len(rt) + 1), k -> rt[k] = ct[i])) AS mpos
       |  FROM rldocs),
       |dp AS (
       |  SELECT id, 0 AS i,
       |         list_transform(range(0, rl + 1), x -> 0) AS row
       |  FROM rldims
       |  UNION ALL
       |  SELECT dp.id, dp.i + 1,
       |    list_prepend(0, list_transform(range(1, d.rl + 1), j ->
       |      CASE WHEN list_max(list_filter(d.mpos[dp.i + 1], p -> p <= j))
       |             IS NULL
       |        THEN dp.row[j + 1]
       |        ELSE greatest(dp.row[j + 1],
       |          dp.row[list_max(list_filter(d.mpos[dp.i + 1],
       |            p -> p <= j))] + 1)
       |      END))
       |  FROM dp JOIN rldims d ON d.id = dp.id
       |  WHERE dp.i < d.cl),
       |fin AS (
       |  SELECT d.id, CAST(coalesce(list_max(dp.row), 0) AS BIGINT) AS lcs,
       |         CAST(d.cl AS BIGINT) AS cand_len,
       |         CAST(d.rl AS BIGINT) AS ref_len
       |  FROM dp JOIN rldims d ON d.id = dp.id WHERE dp.i = d.cl)
       |SELECT id, lcs, cand_len, ref_len,
       |  $rlRecallFrag AS rl_recall_micro,
       |  ${rlF1Frag("")} AS rl_f1_micro
       |FROM fin""".stripMargin

  /** DuckDB replica of [[ter]]. DuckDB's `levenshtein` is character-level,
    * so the oracle runs the word-level DP itself as a recursive CTE at
    * (doc, ref-position) grain — rows, not lists, because the serial
    * in-row dependence D[i][j-1] is eliminated by the prefix-min identity
    * `D[i][j] = j + min_{k≤j}(A[k] − k)` with
    * `A[k] = min(D[i-1][k] + 1, D[i-1][k-1] + cost_ik)` (`A[0] = i`),
    * which a running-min window over the previous DP row evaluates in
    * O(1) amortized per cell — total O(n·m) per doc, the [[rougeLOracleSql]]
    * cost class. Docs whose candidate is exhausted drop out of the
    * recursion; `fin` reads each doc's row at (i = cand_len, j = ref_len). */
  def terOracleSql(pairsCte: String): String =
    s"""WITH RECURSIVE $pairsCte,
       |tdocs AS MATERIALIZED (
       |  SELECT id,
       |         list_filter(string_split(cand, ' '), x -> x <> '') AS ct,
       |         list_filter(string_split(ref, ' '), x -> x <> '') AS rt
       |  FROM pairs),
       |tdims AS MATERIALIZED (
       |  SELECT id, len(ct) AS cl, len(rt) AS rl, ct, rt FROM tdocs),
       |dp AS (
       |  SELECT id, 0 AS i, CAST(r.j AS INT) AS j, CAST(r.j AS INT) AS d
       |  FROM tdims, unnest(range(0, rl + 1)) AS r(j)
       |  UNION ALL
       |  SELECT id, i + 1, j,
       |    j + min(a - j) OVER (PARTITION BY id ORDER BY j
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |  FROM (
       |    SELECT dp.id, dp.i, dp.j,
       |      CASE WHEN dp.j = 0 THEN dp.d + 1
       |        ELSE least(dp.d + 1,
       |          lag(dp.d) OVER (PARTITION BY dp.id ORDER BY dp.j)
       |            + CASE WHEN d.ct[dp.i + 1] = d.rt[dp.j] THEN 0 ELSE 1 END)
       |        END AS a
       |    FROM dp JOIN tdims d ON d.id = dp.id
       |    WHERE dp.i < d.cl)),
       |fin AS (
       |  SELECT d.id, CAST(dp.d AS BIGINT) AS edits,
       |         CAST(d.cl AS BIGINT) AS cand_len,
       |         CAST(d.rl AS BIGINT) AS ref_len
       |  FROM dp JOIN tdims d ON d.id = dp.id
       |  WHERE dp.i = d.cl AND dp.j = d.rl)
       |SELECT id, edits, cand_len, ref_len,
       |  $terFrag AS ter_micro
       |FROM fin""".stripMargin

  /** DuckDB replica of [[chrF]]: the BLEU oracle's scalar-subquery
    * match/total pattern over FOUR gram-table chains (candidate/reference
    * × char/word grain), closing with the SAME F-β fragment as the
    * Spark side. */
  def chrfOracleSql(pairsCte: String, charN: Int = 6, wordN: Int = 2,
      beta: Double = 2.0): String = {
    def charList(c: String) = s"string_split(replace($c, ' ', ''), '')"
    def wordList(c: String) = s"string_split($c, ' ')"
    val sides = Seq(
      sideCtesOver("cc", 1 to charN, charList("cand")),
      sideCtesOver("rc", 1 to charN, charList("ref")),
      sideCtesOver("cw", 1 to wordN, wordList("cand")),
      sideCtesOver("rw", 1 to wordN, wordList("ref"))).mkString(",\n")
    val grains = Seq(("c", "cc", "rc", charN), ("w", "cw", "rw", wordN))
    val mt = grains.flatMap { case (pfx, cs, rfs, maxN) =>
      (1 to maxN).map { n =>
        s"""${pfx}mt$n AS (SELECT
           |  (SELECT CAST(coalesce(sum(least(a.c, b.c)), 0) AS BIGINT)
           |   FROM ${cs}g$n a JOIN ${rfs}g$n b ON b.id = a.id AND b.g = a.g) AS ${pfx}m$n,
           |  (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM ${cs}g$n) AS ${pfx}t$n,
           |  (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) FROM ${rfs}g$n) AS ${pfx}r$n)"""
          .stripMargin
      }
    }.mkString(",\n")
    val mtList = grains.flatMap { case (pfx, _, _, maxN) =>
      (1 to maxN).map(n => s"${pfx}mt$n") }.mkString(" CROSS JOIN ")
    val cols = grains.flatMap { case (pfx, _, _, maxN) =>
      (1 to maxN).map(n => s"${pfx}m$n, ${pfx}t$n, ${pfx}r$n") }
      .mkString(", ")
    s"""WITH $pairsCte,
       |$sides,
       |lens AS (SELECT
       |  (SELECT CAST(count(DISTINCT id) AS BIGINT) FROM pairs) AS n_pairs),
       |$mt
       |SELECT n_pairs, $cols,
       |  ${chrfFrag("", chrfTriples("c", charN), beta)} AS chrf_micro,
       |  ${chrfFrag("", chrfTriples("c", charN) ++ chrfTriples("w", wordN),
            beta)} AS chrf_pp_micro
       |FROM lens CROSS JOIN $mtList""".stripMargin
  }

  /** DuckDB replica of [[rougeRecall]]. */
  def rougeOracleSql(pairsCte: String, n: Int = 2): String =
    s"""WITH $pairsCte,
       |${sideCtes("cand", Seq(n)).replace(s"candg$n", "cg")},
       |${sideCtes("ref", Seq(n)).replace(s"refg$n", "rg")},
       |m AS (SELECT a.id, CAST(sum(least(a.c, b.c)) AS BIGINT) AS m0
       |      FROM cg a JOIN rg b ON b.id = a.id AND b.g = a.g GROUP BY 1),
       |rgt AS (SELECT id, CAST(sum(c) AS BIGINT) AS ref_grams
       |        FROM rg GROUP BY 1)
       |SELECT p.id, coalesce(m.m0, 0) AS m,
       |       coalesce(rgt.ref_grams, 0) AS ref_grams,
       |  CASE WHEN coalesce(rgt.ref_grams, 0) = 0 THEN CAST(NULL AS BIGINT)
       |  ELSE CAST(round(1e6 * coalesce(m.m0, 0) / rgt.ref_grams) AS BIGINT)
       |  END AS rouge_micro
       |FROM (SELECT DISTINCT id FROM pairs) p
       |LEFT JOIN rgt ON rgt.id = p.id
       |LEFT JOIN m ON m.id = p.id""".stripMargin
}
