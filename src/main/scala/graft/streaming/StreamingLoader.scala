package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.core.GraftConfig
import graft.loader.SingerLoader

/** Structured-Streaming front end for the Singer loader: a file-source
  * stream of JSONL feeds `foreachBatch`, each micro-batch running the exact
  * batch dataflow ([[SingerLoader.load]]) — flatten, stream maps, extra
  * fields, compaction write. The checkpoint directory plays the reference's
  * STATE role (at-least-once commit of consumed input), which is precisely
  * the reference's delivery contract (SURVEY §3.1 step 6).
  *
  * The reference's streaming is unwindowed pass-through with bounded
  * buffers; micro-batches bound memory the same way (`maxFilesPerTrigger`).
  * Event-time windowing, when wanted, composes on the *loaded* tables — see
  * [[WindowedAgg]]. Stateful compositions (windowed aggregation, streaming
  * dedup) at production key cardinality should start under
  * [[StateStores.withRocksDB]] — the default state store is on-heap.
  */
object StreamingLoader {

  def start(spark: SparkSession, inputDir: String, config: GraftConfig,
      checkpointDir: String, availableNow: Boolean = false): StreamingQuery = {
    val lines = spark.readStream
      .option("maxFilesPerTrigger", 16)
      .text(inputDir)
    // SCHEMA messages arrive once, records keep flowing: carry schemas
    // across micro-batches AND across restarts (committed batches never
    // replay from the checkpoint, so an in-memory cache alone would lose the
    // SCHEMA on restart — it is persisted as Singer SCHEMA lines next to the
    // checkpoint, the streaming analog of the reference's per-stream sink
    // registry).
    val schemaCache = scala.collection.mutable.LinkedHashMap.empty[String, graft.core.SchemaMessage]
    val hadoopConf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    loadSchemaRegistry(checkpointDir, hadoopConf).foreach(sm => schemaCache(sm.stream) = sm)
    val writer = lines.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import batch.sparkSession.implicits._
        val result = SingerLoader.load(batch.sparkSession, batch.as[String],
          config, knownSchemas = schemaCache.toMap)
        schemaCache ++= result.schemas
        saveSchemaRegistry(checkpointDir, hadoopConf, schemaCache.values.toSeq)
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }

  // The registry lives NEXT TO the checkpoint on whatever filesystem hosts it
  // (HDFS, S3A, local, …) — resolved through the Hadoop FileSystem API like
  // the checkpoint itself, never java.nio (which would silently point at a
  // nonexistent local path for hdfs:// URIs and break restart recovery).
  private def registryPath(checkpointDir: String) =
    new org.apache.hadoop.fs.Path(checkpointDir, "graft-schemas.jsonl")

  private[streaming] def loadSchemaRegistry(checkpointDir: String,
      hadoopConf: org.apache.hadoop.conf.Configuration): Seq[graft.core.SchemaMessage] = {
    val p = registryPath(checkpointDir)
    val fs = p.getFileSystem(hadoopConf)
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      val text = try {
        scala.io.Source.fromInputStream(in, "UTF-8").mkString
      } finally in.close()
      text.linesIterator.toSeq
        .filter(_.nonEmpty)
        .map(graft.core.SingerMessage.parse)
        .collect { case sm: graft.core.SchemaMessage => sm }
    }
  }

  private[streaming] def saveSchemaRegistry(checkpointDir: String,
      hadoopConf: org.apache.hadoop.conf.Configuration,
      schemas: Seq[graft.core.SchemaMessage]): Unit = {
    val lines = schemas.map { sm =>
      val keys = sm.keyProperties.map(k => "\"" + k + "\"").mkString("[", ",", "]")
      s"""{"type": "SCHEMA", "stream": "${sm.stream}", "schema": ${sm.schemaJson}, "key_properties": $keys}"""
    }
    val p = registryPath(checkpointDir)
    val fs = p.getFileSystem(hadoopConf)
    // Staged write + ATOMIC overwrite-rename (FileContext, not
    // FileSystem.rename): delete-then-rename would open a crash window with
    // no registry at all, and FileSystem.rename signals failure by returning
    // false rather than throwing.
    val tmp = new org.apache.hadoop.fs.Path(checkpointDir, "graft-schemas.jsonl._tmp")
    val out = fs.create(tmp, true)
    try out.write(lines.mkString("\n").getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, hadoopConf)
      .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }
}

/** Event-time windowed aggregation with watermarking — the streaming-side
  * operator surface (tumbling/sliding windows, late-data drop). */
object WindowedAgg {

  /** Tumbling-window counts/sums per key with a watermark; late rows beyond
    * `lateness` are dropped by Spark's state eviction. */
  def tumblingCounts(events: DataFrame, tsCol: String, keyCol: String,
      windowLen: String, lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n"), col("total_value"))

  /** Session windows: gap-based grouping per key — a session closes after
    * `gap` of per-key silence (watermark advancing past it). */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String,
      gap: String, lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col(keyCol), col("n"))

  /** EXACT windowed distinct-key counts on a stream: chained stateful
    * operators — `dropDuplicates` on (window, key) dedupes with
    * watermark-bounded state (one row per distinct (window, key) alive at
    * a time, evicted once the watermark passes the window), then the
    * windowed count aggregates the deduped stream. Streaming forbids
    * `count(DISTINCT)` outright and the HLL path is approximate past
    * sketch-sparse cardinalities; this is the exact formulation with
    * bounded state, and it replays byte-identical to the batch
    * `count(DISTINCT)` oracle. Output: (window_start, distinct_keys).
    */
  def tumblingDistinct(events: DataFrame, tsCol: String, keyCol: String,
      windowLen: String, lateness: String): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .select(col(tsCol), window(col(tsCol), windowLen).as("w"),
        col(keyCol).as("k"))
      .dropDuplicates("w", "k")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("distinct_keys"))
      .select(col("w.start").as("window_start"), col("distinct_keys"))
}
