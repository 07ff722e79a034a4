package graft.loader

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{CanNotUploadFileException, GraftConfig}

/** ACTIVATE_VERSION semantics (singer-sdk inherited behavior; the reference
  * receives the message through the same loop, reference target_hdfs/
  * target.py:51-52): a tap doing full-table replication stamps every RECORD
  * with a table `version` and closes the sync with ACTIVATE_VERSION — at
  * which point rows of *earlier* versions are superseded and must be
  * removed from the target.
  *
  * Loader contract here: [[SingerLoader]] stamps `_sdc_table_version` on
  * record batches whose messages carry a version; `activate` rewrites the
  * stream dir keeping only rows with `_sdc_table_version >= version` or a
  * NULL stamp (rows never stamped were never part of versioned replication
  * — deleting them on a version bump would destroy data, so they are kept,
  * conservatively).
  *
  * Scale shape: one distributed filter-rewrite job over the stream dir (no
  * driver loop over files), staged into a sibling tmp dir and swapped by
  * two directory renames — same staged-rename commit the per-file
  * compaction uses (reference utils/hdfs.py:56-73). On object stores the
  * rename window is the usual non-atomic caveat; the old data stays
  * recoverable under `__purge_old` until the final delete.
  */
object VersionPurge {

  def activate(spark: SparkSession, config: GraftConfig, stream: String,
      version: Long): Unit = {
    val dir = config.streamDir(stream)
    val hfs = Compaction.fs(spark, dir)
    val dirPath = new Path(dir)
    if (!hfs.exists(dirPath)) return // nothing loaded yet — activate is a no-op

    // mergeSchema: files written before versioned replication began lack the
    // stamp column; their rows read as NULL and are kept
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    if (!df.columns.contains("_sdc_table_version")) return

    val keep = df.filter(
      col("_sdc_table_version").isNull || col("_sdc_table_version") >= version)

    val tmp = new Path(dirPath.getParent, dirPath.getName + "__purge_tmp")
    val old = new Path(dirPath.getParent, dirPath.getName + "__purge_old")
    var w = keep.write.mode("overwrite")
      .option("compression", config.compressionMethod)
    if (config.partitionCols.nonEmpty) w = w.partitionBy(config.partitionCols: _*)
    if (config.maxRecordsPerFile > 0)
      w = w.option("maxRecordsPerFile", config.maxRecordsPerFile)
    w.parquet(tmp.toString)

    if (hfs.exists(old) && !hfs.delete(old, true))
      throw new CanNotUploadFileException(s"could not clear stale $old")
    if (!hfs.rename(dirPath, old))
      throw new CanNotUploadFileException(
        s"rename $dirPath -> $old failed; purged data staged at $tmp")
    if (!hfs.rename(tmp, dirPath)) {
      hfs.rename(old, dirPath) // restore; best-effort — tmp still holds the rewrite
      throw new CanNotUploadFileException(
        s"rename $tmp -> $dirPath failed; original restored, rewrite kept at $tmp")
    }
    hfs.delete(old, true)
  }
}
