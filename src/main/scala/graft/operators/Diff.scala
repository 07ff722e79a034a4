package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff (change-data-capture between two versions of a
  * keyed table): classify every key as added / removed / changed between
  * an old and a new snapshot. The workhorse of dataset versioning at
  * 100 TB — "what moved between crawl N and crawl N+1" — where shipping
  * the payload through the comparison join is the cost that kills you.
  */
object Diff {

  /** One row per key whose state differs between snapshots:
    * (key, status ∈ {added, removed, changed}); unchanged keys are
    * dropped (the overwhelming majority at scale — output is
    * change-sized, not corpus-sized).
    *
    * Payload columns are collapsed to an md5 digest BEFORE the full-outer
    * join, so the shuffle carries (key, 32-char digest) instead of the
    * payload — at 100 TB the join exchanges ~40 bytes/row regardless of
    * document size, and both digests land in the same task co-partitioned
    * by key. md5 is bit-identical across engines (the DuckDB oracle
    * digests the same separator-joined byte string). NULL payload cells
    * fold to a U+0002 sentinel so (NULL) and ('') differ.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCol: String,
      payloadCols: Seq[String]): DataFrame = {
    def digested(df: DataFrame, out: String) = df.select(
      col(keyCol).as("key"),
      md5(concat_ws("\u0001", payloadCols.map(c =>
        coalesce(col(c).cast("string"), lit("\u0002"))): _*)).as(out))
    digested(oldDf, "od").join(digested(newDf, "nd"), Seq("key"), "full_outer")
      .withColumn("status",
        when(col("od").isNull, "added")
          .when(col("nd").isNull, "removed")
          .when(col("od") =!= col("nd"), "changed"))
      .filter(col("status").isNotNull)
      .select(col("key"), col("status"))
  }
}
