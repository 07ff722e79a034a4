package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column profiling — the `ANALYZE TABLE` analog a large-scale pipeline
  * runs for data-quality gates and drift monitoring (null-rate spikes,
  * cardinality collapse, value-range excursions).
  *
  * One pass over the data: every per-column aggregate lands in a single
  * `agg(...)` (Catalyst plans the distinct counts through one Expand), and
  * the single result row is pivoted to long format driver-side — the
  * pivot touches one row, never data. min/max are emitted as strings so
  * heterogeneous columns share one schema; callers profiling doubles
  * should pre-scale to exact integers (float formatting is
  * engine-specific).
  */
object Profile {

  /** `(col_name, n_nonnull, n_nulls, n_distinct, min_s, max_s)` per
    * requested column. `exactDistinct = false` swaps the distinct counts
    * for HLL++ estimates (2% rsd) — the 100 TB path: exact multi-column
    * distincts expand the input once per column through the shuffle, while
    * the sketches keep the pass fully map-side-combined. */
  def summarize(df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    def distinctAgg(c: String) =
      if (exactDistinct) countDistinct(col(c))
      else approx_count_distinct(col(c), 0.02)
    val aggs = count(lit(1)).as("__total") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"__n_$c"),
        distinctAgg(c).as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"__n_$c").as("n_nonnull"),
        (col("__total") - col(s"__n_$c")).as("n_nulls"),
        col(s"__d_$c").as("n_distinct"),
        col(s"__min_$c").as("min_s"),
        col(s"__max_$c").as("max_s"))
    }
    one.select(explode(array(stacked: _*)).as("p")).select(col("p.*"))
  }

  // ---- incremental profiling against a persisted sketch index ----------
  //
  // The streaming/batch-append analog of `summarize` (and the profiling
  // counterpart of [[IncrementalDedup]]): each ingested batch contributes
  // one Datasketches-HLL sketch + one Datasketches-KLL quantile sketch
  // (numeric columns) + exact null/nonnull counts per column (a few KB
  // per batch), and the corpus-wide profile is a MERGE of the persisted
  // sketches — never a rescan of prior batches. At 100 TB this is the
  // only viable shape for "distinct user_ids to date" or "p95 price to
  // date": the index grows by O(cols) rows per batch while the data grows
  // by terabytes, and both sketch unions are exact w.r.t. their sketch
  // semantics (no accuracy decay from merging, unlike sampling — KLL
  // merge keeps the same rank-error bound as a single-pass sketch).

  /** KLL accuracy knob: k = 400 gives ~0.9% normalized rank error at 99%
    * confidence (~1 KB serialized per column per batch). */
  val KllK = 400

  /** Sketch one batch's `cols` into `indexDir` (append-only parquet).
    * One row per column:
    * `(col_name, sketch, n_nonnull, n_nulls, kll, kll_type)`.
    * Columns outside the HLL-supported types (int/long/string/binary) are
    * distinct-sketched on their canonical string form — distinctness of
    * string representations, which matches the merged estimate's contract.
    * Numeric columns additionally carry a KLL quantile sketch (`kll`,
    * typed by `kll_type`: integrals as exact BIGINT sketches, float/
    * double/decimal as DOUBLE); non-numeric columns store a null `kll`. */
  def sketchBatch(df: DataFrame, cols: Seq[String], indexDir: String): Unit = {
    require(cols.nonEmpty, "sketch of zero columns")
    import org.apache.spark.sql.types._
    def sketchSql(c: String) = df.schema(c).dataType match {
      case IntegerType | LongType | StringType | BinaryType => s"`$c`"
      case _ => s"CAST(`$c` AS STRING)"
    }
    def kllSql(c: String): (String, String) = df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        (s"kll_sketch_agg_bigint(CAST(`$c` AS BIGINT), $KllK)", "bigint")
      case FloatType | DoubleType | _: DecimalType =>
        (s"kll_sketch_agg_double(CAST(`$c` AS DOUBLE), $KllK)", "double")
      case _ => ("CAST(NULL AS BINARY)", null)
    }
    val aggs = count(lit(1)).as("__total") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"__n_$c"),
        expr(s"hll_sketch_agg(${sketchSql(c)}, 12)").as(s"__sk_$c"),
        expr(kllSql(c)._1).as(s"__kll_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"__sk_$c").as("sketch"),
        col(s"__n_$c").as("n_nonnull"),
        (col("__total") - col(s"__n_$c")).as("n_nulls"),
        col(s"__kll_$c").as("kll"),
        lit(kllSql(c)._2).cast("string").as("kll_type"))
    }
    one.select(explode(array(stacked: _*)).as("p")).select(col("p.*"))
      .coalesce(1)
      .write.mode("append").parquet(indexDir)
  }

  /** Per-column Shannon entropy of the value distribution, in micro-nats:
    * H = ln(N) − (Σ n_v·ln(n_v))/N over value frequencies n_v. The per-value
    * terms are integerized (`n_v · round(ln(n_v)·1e6)` — exact longs, so
    * the cross-value sum is reduction-order-free, the engine's standard
    * micro-nat discipline) and the one division runs on exact inputs.
    * NULLs count as a value, folded to a \\u0001 sentinel — a control
    * character no text domain carries (a printable sentinel like " null"
    * would merge a genuine equal value into the NULL bucket and skew the
    * statistic); the sentinel is a groupBy intermediate only, never
    * emitted. All columns profile in ONE corpus scan (the
    * (column, value) pairs explode from a generator projection, same as
    * the summarize anchors); per-column frequency tables are
    * cardinality-bounded. Output: (col_name, n, n_distinct, entropy_micro).
    */
  def entropy(df: DataFrame, cols: Seq[String]): DataFrame = {
    val pairs = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"),
          coalesce(col(c).cast("string"), lit("\u0001"))
            .as("value"))): _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("p.value").as("value"))
    pairs.groupBy(col("col_name"), col("value"))
      .agg(count(lit(1)).as("nv"))
      .withColumn("term",
        col("nv") * expr("CAST(round(ln(CAST(nv AS DOUBLE)) * 1e6) AS BIGINT)"))
      .groupBy(col("col_name"))
      .agg(sum(col("nv")).as("n"), count(lit(1)).as("n_distinct"),
        sum(col("term")).as("st"))
      .select(col("col_name"), col("n"), col("n_distinct"),
        (expr("CAST(round(ln(CAST(n AS DOUBLE)) * 1e6) AS BIGINT)") -
          expr("CAST(round(CAST(st AS DOUBLE) / n) AS BIGINT)"))
          .as("entropy_micro"))
  }

  /** Hot-key / skew diagnostics for prospective shuffle keys — the
    * pre-flight check before keying a 100 TB join or aggregate on a
    * column: per requested column, the `topK` heaviest values with exact
    * counts, integer basis-point share of rows, and rank. A key whose
    * share dwarfs 1/parallelism is the task-killing skew the salted-join
    * / AQE mitigations exist for; this report is how a pipeline finds
    * them BEFORE the 4-hour stage does.
    *
    * Scale shape: all columns ride ONE corpus scan (the entropy-style
    * generator projection), one map-side-combined (column, value) count,
    * per-column totals as a second bounded aggregate joined back
    * broadcast (never a window over the full distinct-key table — that
    * would collapse each column's keys into one task, the very skew this
    * measures), and a per-column ranked window over the counts. NULL
    * folds to the \\u0001 sentinel for grouping and is emitted back as
    * NULL. Output: (col_name, key, cnt, share_x1e4, rank). */
  def keySkew(df: DataFrame, cols: Seq[String], topK: Int = 5): DataFrame = {
    require(cols.nonEmpty && topK > 0, "need columns and topK > 0")
    import org.apache.spark.sql.expressions.Window
    val pairs = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"),
          coalesce(col(c).cast("string"), lit("\u0001")).as("k"))): _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("p.k").as("k"))
    val cnts = pairs.groupBy(col("col_name"), col("k"))
      .agg(count(lit(1)).as("cnt"))
    val totals = cnts.groupBy(col("col_name")).agg(sum(col("cnt")).as("n"))
    val w = Window.partitionBy(col("col_name"))
      .orderBy(col("cnt").desc, col("k").asc)
    cnts.join(broadcast(totals), "col_name")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("col_name"),
        when(col("k") === "\u0001", lit(null)).otherwise(col("k")).as("key"),
        col("cnt"), expr("cnt * 10000 div n").as("share_x1e4"),
        col("rank").cast("long").as("rank"))
  }

  /** Partitioned-write layout planner: per partition-key group, the row
    * and byte totals plus the file split a compacting writer should use —
    * `n_files = ceil(bytes / targetBytes)` (never 0), `rows_per_file =
    * ceil(rows / n_files)` — so a pipeline can pass per-partition
    * `maxRecordsPerFile` hints and land uniformly-sized parquet instead of
    * the small-files swamp (or its opposite, the one-giant-file partition
    * that caps downstream scan parallelism). The query-level complement of
    * the loader's compaction admission predicate
    * ([[graft.loader.Compaction]] merges bad layouts after the fact; this
    * plans them away before the write).
    *
    * Scale shape: one map-side-combined aggregate over the group keys —
    * the output is partition-count-sized metadata, all the ceil arithmetic
    * integer floor-division (`(a + b - 1) div b`), engine-exact. */
  def layoutPlan(df: DataFrame, groupCols: Seq[String], sizeCol: Column,
      targetBytes: Long): DataFrame = {
    require(groupCols.nonEmpty && targetBytes > 0,
      "need group columns and targetBytes > 0")
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), sum(sizeCol).as("n_bytes"))
      .withColumn("n_files",
        greatest(lit(1L), expr(s"(n_bytes + $targetBytes - 1) div $targetBytes")))
      .withColumn("rows_per_file", expr("(n_rows + n_files - 1) div n_files"))
  }

  /** Benford first-digit audit of a POSITIVE INTEGER column (callers
    * integerize first — cents, counts; integer-to-string leading digits
    * are engine-exact, where float formatting is not): observed digit
    * counts vs the Benford expectation `N·log10(1 + 1/d)` (micro-scaled),
    * per group. The classic fabricated-data / unit-mixing detector for
    * financial-shaped columns. One aggregate over (grp, digit) + a
    * 9-rows-per-group window — output is ≤ 9 rows per group.
    * Output: (grp, digit, n, expected_micro).
    */
  def benford(df: DataFrame, grpCol: String, valCol: String): DataFrame = {
    val digit = expr(
      s"CAST(substring(CAST($valCol AS STRING), 1, 1) AS BIGINT)")
    df.filter(col(valCol) > 0)
      .select(col(grpCol).as("grp"), digit.as("digit"))
      .groupBy(col("grp"), col("digit")).agg(count(lit(1)).as("n"))
      .withColumn("expected_micro",
        round(sum(col("n")).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("grp"))).cast("double") *
          log10(lit(1.0) + lit(1.0) / col("digit").cast("double")) * 1e6)
          .cast("long"))
      .select(col("grp"), col("digit"), col("n"), col("expected_micro"))
  }

  /** Corpus-wide profile from the persisted index alone:
    * `(col_name, n_nonnull, n_nulls, n_distinct_est, p50_est, p95_est)`
    * — quantile estimates are DOUBLE, null for non-numeric columns (and
    * for indexes written before the KLL columns existed). Cost is
    * O(batches x cols) index rows — independent of corpus size. */
  def mergedProfile(spark: SparkSession, indexDir: String): DataFrame = {
    // mergeSchema: an append-only index can mix pre-KLL and post-KLL batch
    // files; default schema inference picks ONE footer, and inferring the
    // old (kll-less) schema would silently null quantiles for every batch,
    // including ones that carry sketches. Merged inference unions the
    // footers so old files backfill null while new files' sketches survive.
    val idx0 = spark.read.option("mergeSchema", "true").parquet(indexDir)
    val idx =
      if (idx0.columns.contains("kll")) idx0
      else idx0.withColumn("kll", lit(null).cast("binary"))
        .withColumn("kll_type", lit(null).cast("string"))
    // per-type merge: the CASE filter feeds each merge aggregate only its
    // own type's sketches (the other aggregate sees all-null input and
    // yields an EMPTY sketch, which the get_n guard turns into null —
    // Datasketches aggs skip nulls rather than failing). A column whose
    // batches carry MIXED types (schema drift: 'bigint' sketches before a
    // widening, 'double' after) fails LOUDLY — silently merging only the
    // max(kll_type) batches would report quantiles of the recent data as
    // if they covered the corpus. Pre-KLL batches (null kll_type) are not
    // a conflict: count(DISTINCT) skips nulls.
    def quantile(q: Double, name: String) = expr(
      s"""CASE
            WHEN count(DISTINCT kll_type) > 1 THEN
              CAST(raise_error(concat(
                'mergedProfile: mixed KLL sketch types in the index for ',
                'column ', col_name,
                ' — rebuild the index with one sketch type')) AS DOUBLE)
            WHEN max(kll_type) = 'bigint' THEN
              CASE WHEN kll_sketch_get_n_bigint(
                     kll_merge_agg_bigint(
                       CASE WHEN kll_type = 'bigint' THEN kll END)) > 0
                THEN CAST(kll_sketch_get_quantile_bigint(
                       kll_merge_agg_bigint(
                         CASE WHEN kll_type = 'bigint' THEN kll END), $q)
                     AS DOUBLE) END
            WHEN max(kll_type) = 'double' THEN
              CASE WHEN kll_sketch_get_n_double(
                     kll_merge_agg_double(
                       CASE WHEN kll_type = 'double' THEN kll END)) > 0
                THEN kll_sketch_get_quantile_double(
                       kll_merge_agg_double(
                         CASE WHEN kll_type = 'double' THEN kll END), $q) END
          END""").as(name)
    idx.groupBy(col("col_name"))
      .agg(sum(col("n_nonnull")).as("n_nonnull"),
        sum(col("n_nulls")).as("n_nulls"),
        expr("hll_sketch_estimate(hll_union_agg(sketch, false))")
          .as("n_distinct_est"),
        quantile(0.5, "p50_est"),
        quantile(0.95, "p95_est"))
  }
}
