package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.core.GraftConfig
import graft.streaming.{StreamingLoader, WindowedAgg}

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming loader ingests singer files through foreachBatch") {
    val in = Files.createTempDirectory("graft-stream-in").toString
    val out = Files.createTempDirectory("graft-stream-out").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    Files.write(java.nio.file.Paths.get(s"$in/batch1.jsonl"), Seq(
      """{"type": "SCHEMA", "stream": "t", "schema": {"type": "object", "properties": {"col1": {"type": "integer"}, "col2": {"type": "string"}}}}""",
      """{"type": "RECORD", "stream": "t", "record": {"col1": 1, "col2": "a"}}""",
      """{"type": "RECORD", "stream": "t", "record": {"col1": 2, "col2": "b"}}""").mkString("\n").getBytes)

    val q = StreamingLoader.start(spark, in, GraftConfig(hdfsDestinationPath = out),
      ckpt, availableNow = true)
    q.awaitTermination(60000)
    assert(spark.read.parquet(s"$out/t").count() === 2)
  }

  test("schemas survive across record-only batches and restarts") {
    val in = Files.createTempDirectory("graft-stream-in2").toString
    val out = Files.createTempDirectory("graft-stream-out2").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt2").toString
    val cfg = GraftConfig(hdfsDestinationPath = out)
    Files.write(java.nio.file.Paths.get(s"$in/f1.jsonl"), Seq(
      """{"type": "SCHEMA", "stream": "t", "schema": {"type": "object", "properties": {"x": {"type": "integer"}}}}""",
      """{"type": "RECORD", "stream": "t", "record": {"x": 1}}""").mkString("\n").getBytes)
    val q1 = StreamingLoader.start(spark, in, cfg, ckpt, availableNow = true)
    q1.awaitTermination(60000)
    // restart with a record-only file: the SCHEMA came in an earlier,
    // already-committed batch and must come from the persisted registry
    Files.write(java.nio.file.Paths.get(s"$in/f2.jsonl"), Seq(
      """{"type": "RECORD", "stream": "t", "record": {"x": 2}}""",
      """{"type": "RECORD", "stream": "t", "record": {"x": 3}}""").mkString("\n").getBytes)
    val q2 = StreamingLoader.start(spark, in, cfg, ckpt, availableNow = true)
    q2.awaitTermination(60000)
    assert(spark.read.parquet(s"$out/t").count() === 3)
  }

  test("streaming dedup drops at-least-once replay duplicates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val df = mem.toDF().toDF("event_id", "ts")
    val dedup = graft.streaming.StreamingDedup
      .dedupWithinWatermark(df, Seq("event_id"), "ts", "10 minutes")
    val q = dedup.writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    mem.addData((1L, ts(1)), (2L, ts(2)), (1L, ts(1)))   // dup in batch
    q.processAllAvailable()
    mem.addData((2L, ts(2)), (3L, ts(3)))                // replay across batch
    q.processAllAvailable()
    val ids = spark.sql("SELECT event_id FROM dedup_out").collect().map(_.getLong(0)).sorted
    q.stop()
    assert(ids.toSeq === Seq(1L, 2L, 3L))
  }

  test("stream-static enrichment broadcast-joins each micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("cust_id", "tier")
    val mem = MemoryStream[(Long, Long)]
    val enriched = graft.streaming.StreamingDedup
      .enrich(mem.toDF().toDF("event_id", "cust_id"), dim, "cust_id", "cust_id")
    val q = enriched.writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append()).start()
    mem.addData((10L, 1L), (11L, 2L), (12L, 9L)) // 9 has no dim row
    q.processAllAvailable()
    val rows = spark.sql("SELECT event_id, tier FROM enrich_out").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    q.stop()
    assert(rows === Map(10L -> "gold", 11L -> "silver", 12L -> null))
  }

  test("mapGroupsWithState keeps running per-key counts across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val counts = graft.streaming.StreamingDedup
      .runningCounts(mem.toDF().toDF("k"), "k")
    val q = counts.toDF().writeStream.format("memory").queryName("rc_out")
      .outputMode(OutputMode.Update()).start()
    mem.addData("a", "a", "b")
    q.processAllAvailable()
    mem.addData("a", "b", "c")
    q.processAllAvailable()
    // last update per key wins
    val last = spark.sql("SELECT key, max(n) FROM rc_out GROUP BY key").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    q.stop()
    assert(last === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("streaming heavy hitters: exact across batches; state stays bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val hh = graft.streaming.StreamingSketch
      .heavyHitters(mem.toDF().toDF("k"), "nullif(k, 'skip')",
        shards = 2, capacity = 8)
    val q = hh.toDF().writeStream.format("memory").queryName("shh_out")
      .outputMode(OutputMode.Update()).start()
    mem.addData("a", "a", "b", "c")
    q.processAllAvailable()
    // "skip" rows become NULL keys via the expression — mirrored from the
    // batch sketch's null semantics (skipped), and a null key would
    // otherwise poison the state map at serialization time
    mem.addData("a", "b", "b", "b", "skip", "skip")
    q.processAllAvailable()
    val top = graft.streaming.StreamingSketch
      .finalTopK(spark.table("shh_out"), 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    q.stop()
    // counts accumulated across both micro-batches, exactly
    assert(top.toSeq === Seq(("b", 4L), ("a", 3L)))
  }

  test("streaming heavy hitters: estimation regime recalls true heavies") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    // 3 heavy keys (600 hits each) in 4000 distinct singletons, state
    // capped at 2 shards x 64 counters — 30x under the key cardinality,
    // so MG decrements must fire and the heavies must still survive
    val hh = graft.streaming.StreamingSketch
      .heavyHitters(mem.toDF().toDF("k"), "k", shards = 2, capacity = 64)
    val q = hh.toDF().writeStream.format("memory").queryName("shh_est_out")
      .outputMode(OutputMode.Update()).start()
    val rnd = new scala.util.Random(7)
    val rows = rnd.shuffle(
      (0 until 1800).map(i => s"heavy_${i % 3}") ++
      (0 until 4000).map(i => s"noise_$i"))
    rows.grouped(1500).foreach { g => mem.addData(g: _*); q.processAllAvailable() }
    val summaries = spark.table("shh_est_out")
    // bounded state: no summary ever exceeds its capacity
    val maxTracked = summaries.selectExpr("max(size(items)) AS s")
      .collect()(0).getInt(0)
    val top = graft.streaming.StreamingSketch.finalTopK(summaries, 3)
      .collect().map(_.getString(0)).toSet
    q.stop()
    assert(maxTracked <= 64, s"shard state grew past capacity: $maxTracked")
    assert(top === Set("heavy_0", "heavy_1", "heavy_2"),
      s"sketch missed a true heavy hitter: $top")
  }

  test("session windows close after gap silence") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val df = mem.toDF().toDF("ts", "user")
    val agg = graft.streaming.WindowedAgg.sessionCounts(df, "ts", "user", "5 minutes", "1 minute")
    val q = agg.writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    // one session (1,2,4), silence, another session (20)
    mem.addData((ts(1), "u"), (ts(2), "u"), (ts(4), "u"), (ts(20), "u"))
    q.processAllAvailable()
    mem.addData((ts(50), "u")) // advance watermark to close both sessions
    q.processAllAvailable()
    val rows = spark.sql("SELECT n FROM sess_out").collect().map(_.getLong(0)).sorted
    q.stop()
    assert(rows.toSeq === Seq(1L, 3L))
  }

  test("flatMapGroupsWithState capped sessions: gap close, cap split, timeout eviction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val df = mem.toDF().toDF("user", "ts")
    val sessions = graft.streaming.StreamingDedup
      .cappedSessions(df, "user", "ts", gap = "5 minutes",
        maxDuration = "12 minutes", lateness = "1 minute")
    val q = sessions.toDF().writeStream.format("memory").queryName("caps_out")
      .outputMode(OutputMode.Append()).start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    // "a": events every 4 min from 0 to 16 — gap never expires, but the
    //      12-minute cap must split at the row that stretches past it
    // "b": 1, 3, then silence — must close by event-time timeout
    mem.addData(
      (("a", ts(0))), (("a", ts(4))), (("a", ts(8))), (("a", ts(12))),
      (("a", ts(16))),
      (("b", ts(1))), (("b", ts(3))))
    q.processAllAvailable()
    // advance the watermark far past b's last+gap so the timeout fires
    mem.addData((("c", ts(40))))
    q.processAllAvailable()
    mem.addData((("c", ts(41))))   // extra batch: timeouts fire on the next trigger
    q.processAllAvailable()
    val rows = spark.sql(
        "SELECT key, session_start, session_end, n_events, closed_by FROM caps_out")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getString(4)))
    q.stop()
    val a = rows.filter(_._1 == "a")
    val b = rows.filter(_._1 == "b")
    // a: [0..12] capped when the 16-min row arrived (16-0 > 12), new open
    //    session at 16 stays in state (not yet emitted — watermark at 40
    //    does pass 16+5, so it may ALSO have timed out by now; accept both)
    assert(a.exists(s => s._2 === ts(0) && s._3 === ts(12) && s._4 === 4L &&
      s._5 === "cap"), s"missing capped a-session in ${a.mkString(";")}")
    // b: closed by timeout with both events and closed_by = gap
    assert(b === Array(("b", ts(1), ts(3), 2L, "gap")),
      s"unexpected b sessions: ${b.mkString(";")}")
  }

  test("incremental profile maintains under foreachBatch streaming ingest") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-stream-profidx").toString
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the per-batch hook a production loader runs at commit time:
        // sketch the batch into the index, never rescan prior batches
        if (!batch.isEmpty)
          graft.operators.Profile.sketchBatch(batch, Seq("id", "v"), dir)
      }
      .start()
    mem.addData((1L, "a"), (2L, "b"), (3L, "c"))
    q.processAllAvailable()
    mem.addData((3L, "c"), (4L, "d"))   // overlaps batch 1 on one value
    q.processAllAvailable()
    q.stop()
    val m = graft.operators.Profile.mergedProfile(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getAs[Long]("n_distinct_est"))).toMap
    // counters sum per batch (5 rows seen); distinct merges the sketches
    // (4 distinct ids/values across both batches; HLL exact at this size)
    assert(m("id") === ((5L, 4L)))
    assert(m("v") === ((5L, 4L)))
  }

  test("incremental agg state maintains under foreachBatch, equals batch recompute") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.IncrementalAgg
    val mem = MemoryStream[(String, Double)]
    // running state table held across micro-batches: each batch folds in
    // as partial-aggregate state; history is never rescanned (the monoid
    // merge is the whole contract)
    var state: Option[org.apache.spark.sql.DataFrame] = None
    val q = mem.toDF().toDF("k", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val s = IncrementalAgg.state(batch, Seq("k"), "v")
          val merged = state match {
            case Some(prev) => IncrementalAgg.merge(Seq(prev, s), Seq("k"))
            case None => s
          }
          val ckpt = merged.localCheckpoint()
          state.foreach(graft.operators.Checkpoints.release)
          state = Some(ckpt)
        }
      }
      .start()
    val all = Seq(("a", 1.5), ("b", -2.0), ("a", 0.25),
      ("b", 7.0), ("c", 3.0), ("a", -1.0))
    mem.addData(all.take(2): _*); q.processAllAvailable()
    mem.addData(all.slice(2, 4): _*); q.processAllAvailable()
    mem.addData(all.drop(4): _*); q.processAllAvailable()
    q.stop()
    val streamed = IncrementalAgg.readout(state.get)
      .orderBy("k").collect().toSeq
    val batch = IncrementalAgg.readout(
        IncrementalAgg.state(all.toDF("k", "v"), Seq("k"), "v"))
      .orderBy("k").collect().toSeq
    assert(streamed == batch)
  }

  test("scd2 dimension maintains under foreachBatch streaming upserts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // versioned store: each micro-batch reads the latest vN, merges, and
    // writes v(N+1) — an SCD2 fold rewrites rows, so the safe pattern is
    // write-new-then-advance, never read+overwrite one path in a job
    // (contrast the incremental profile/dedup stores, which only append)
    val root = Files.createTempDirectory("graft-stream-scd2").toString
    def latestV(): Int = new java.io.File(root).listFiles()
      .map(_.getName.stripPrefix("v").toInt).max
    spark.sql("SELECT CAST(1 AS BIGINT) AS k, 'a' AS attr UNION ALL SELECT 2, 'b'")
      .selectExpr("k", "attr", "DATE '2024-01-01' AS valid_from",
        "CAST(NULL AS DATE) AS valid_to", "true AS is_current")
      .write.parquet(s"$root/v1")
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("k", "attr").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          // date keyed off the store version, not the micro-batch id:
          // Spark may assign ids to empty batches, so ids aren't dense
          val n = latestV()
          graft.operators.Scd2.merge(
              spark.read.parquet(s"$root/v$n"), batch,
              Seq("k"), Seq("attr"), Seq("2024-06-01", "2024-07-01")(n - 1))
            .write.parquet(s"$root/v${n + 1}")
        }
      }
      .start()
    mem.addData((1L, "a2"), (3L, "c"))  // change + brand-new key
    q.processAllAvailable()
    mem.addData((1L, "a2"), (2L, "b2")) // no-op re-delivery + change
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$root/v${latestV()}").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toString,
        Option(r.getDate(3)).map(_.toString), r.getBoolean(4))).toSet
    assert(out === Set(
      (1L, "a", "2024-01-01", Some("2024-06-01"), false),
      (1L, "a2", "2024-06-01", None, true),
      (2L, "b", "2024-01-01", Some("2024-07-01"), false),
      (2L, "b2", "2024-07-01", None, true),
      (3L, "c", "2024-06-01", None, true)))
  }

  test("graft target CLI loads a file end-to-end") {
    val in = Files.createTempFile("cli", ".jsonl")
    Files.write(in, Seq(
      """{"type": "SCHEMA", "stream": "t", "schema": {"type": "object", "properties": {"x": {"type": "integer"}}}}""",
      """{"type": "RECORD", "stream": "t", "record": {"x": 5}}""",
      """{"type": "STATE", "value": {"done": true}}""").mkString("\n").getBytes)
    val out = Files.createTempDirectory("cli-out").toString
    val cfg = Files.createTempFile("cfg", ".json")
    Files.write(cfg, s"""{"hdfs_destination_path": "$out"}""".getBytes)
    // materialize the shared session BEFORE main so the ownership guard is
    // actually exercised (lazy init after main would make this vacuous)
    val shufflePartsBefore = spark.conf.get("spark.sql.shuffle.partitions")
    graft.loader.GraftTarget.main(Array(
      "--config", cfg.toString, "--input", in.toString))
    assert(spark.conf.get("spark.sql.shuffle.partitions") === shufflePartsBefore,
      "CLI must not reconfigure the caller's session")
    assert(spark.read.parquet(s"$out/t").count() === 1)
    assert(!spark.sparkContext.isStopped, "CLI must not stop the caller's session")
  }

  test("tumbling window with watermark aggregates event time") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val agg = WindowedAgg.tumblingCounts(df, "ts", "event_type", "10 minutes", "5 minutes")
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append()).start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    mem.addData((ts(1), "click", 1.0), (ts(2), "click", 2.0), (ts(11), "view", 5.0))
    q.processAllAvailable()
    // advance watermark far enough to close the first two windows
    mem.addData((ts(40), "click", 1.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT event_type, n, total_value FROM win_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    assert(rows.contains(("click", 2L, 3.0)))
    assert(rows.contains(("view", 1L, 5.0)))
  }

  test("stream-stream interval join pairs rows within the time bound only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val memA = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val memB = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val a = memA.toDF().toDF("a_id", "a_user", "a_ts")
    val b = memB.toDF().toDF("b_id", "b_user", "b_ts")
    val joined = graft.streaming.StreamingDedup.intervalJoin(
      a, b, "a_user", "b_user", "a_ts", "b_ts",
      lateness = "1 hour", bound = "10 minutes")
    val q = joined.select("a_id", "b_id")
      .writeStream.format("memory").queryName("sj_out")
      .outputMode(OutputMode.Append()).start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    memA.addData((1L, 7L, ts(10)), (2L, 7L, ts(30)), (3L, 8L, ts(10)))
    memB.addData((11L, 7L, ts(15)), (12L, 7L, ts(50)), (13L, 9L, ts(10)))
    q.processAllAvailable()
    val pairs = spark.sql("SELECT a_id, b_id FROM sj_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    // (1,11): same user, 5 min apart — in; (2,11) 15 min — out;
    // (2,12) 20 min — out; (3,*) user 8 never matches user 9
    assert(pairs === Set((1L, 11L)))
  }

  test("interval join under the RocksDB state store matches the batch oracle") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rowsA = Seq((1L, 7L, 10), (2L, 7L, 30), (3L, 8L, 10), (4L, 9L, 42))
    val rowsB = Seq((11L, 7L, 15), (12L, 7L, 50), (13L, 9L, 45), (14L, 9L, 50))
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    // batch oracle: plain join with the same key + |Δts| <= 10 min predicate
    val expected = rowsA.flatMap { case (aId, aU, aM) =>
      rowsB.collect { case (bId, bU, bM)
        if aU == bU && math.abs(aM - bM) <= 10 => (aId, bId) }
    }.toSet
    val stateOps = graft.streaming.StateStores.withRocksDB(spark) {
      val memA = MemoryStream[(Long, Long, java.sql.Timestamp)]
      val memB = MemoryStream[(Long, Long, java.sql.Timestamp)]
      val joined = graft.streaming.StreamingDedup.intervalJoin(
        memA.toDF().toDF("a_id", "a_user", "a_ts"),
        memB.toDF().toDF("b_id", "b_user", "b_ts"),
        "a_user", "b_user", "a_ts", "b_ts",
        lateness = "1 hour", bound = "10 minutes")
      val q = joined.select("a_id", "b_id")
        .writeStream.format("memory").queryName("sj_rocks")
        .outputMode(OutputMode.Append()).start()
      memA.addData(rowsA.map { case (i, u, m) => (i, u, ts(m)) }: _*)
      memB.addData(rowsB.map { case (i, u, m) => (i, u, ts(m)) }: _*)
      q.processAllAvailable()
      val ops = q.recentProgress.flatMap(_.stateOperators)
      q.stop()
      ops
    }
    val pairs = spark.sql("SELECT a_id, b_id FROM sj_rocks").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === expected)
    assert(expected.size === 3) // non-degenerate oracle
    // prove the provider actually engaged: RocksDB stores report their own
    // custom metrics in the progress events; the HDFS-backed one does not
    import scala.jdk.CollectionConverters._
    assert(stateOps.exists(_.customMetrics.keySet.asScala
        .exists(_.toLowerCase.contains("rocksdb"))),
      "state operator progress shows no RocksDB metrics — provider not used")
  }

  test("left-outer interval join releases unmatched rows only past the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val memA = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val memB = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val a = memA.toDF().toDF("a_id", "a_user", "a_ts")
    val b = memB.toDF().toDF("b_id", "b_user", "b_ts")
    val joined = graft.streaming.StreamingDedup.intervalJoinLeft(
      a, b, "a_user", "b_user", "a_ts", "b_ts",
      lateness = "10 minutes", bound = "10 minutes")
    val q = joined.select("a_id", "b_id")
      .writeStream.format("memory").queryName("sjl_out")
      .outputMode(OutputMode.Append()).start()
    def ts(h: Int, min: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 0$h:$min%02d:00")
    // a=1 matches; a=2 (user 8) never matches and its window closes well
    // before the final watermark; a=3 arrives near the stream end, so its
    // window is still open when the replay finishes — must stay withheld
    memA.addData((1L, 7L, ts(0, 10)), (2L, 8L, ts(0, 10)))
    memB.addData((11L, 7L, ts(0, 15)))
    q.processAllAvailable()
    // advance both watermarks far past a=1/a=2's windows
    memA.addData((3L, 9L, ts(3, 0)))
    memB.addData((12L, 7L, ts(3, 0)))
    q.processAllAvailable()
    val out = spark.sql("SELECT a_id, b_id FROM sjl_out").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    q.stop()
    // matched pair emitted; a=2 emitted null-joined after eviction;
    // a=3's window still open at shutdown -> NOT emitted
    assert(out === Set((1L, 11L), (2L, -1L)))
  }

  test("tumblingDistinct chains dedup + windowed count exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val df = mem.toDF().toDF("user_id", "ts")
    val q = WindowedAgg
      .tumblingDistinct(df, "ts", "user_id", "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("tdist_out")
      .outputMode(OutputMode.Complete()).start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    // window [00:00,00:10): users 1,1,2 -> 2 distinct; [00:10,00:20): 1
    mem.addData((1L, ts(1)), (1L, ts(2)), (2L, ts(3)))
    q.processAllAvailable()
    mem.addData((1L, ts(4)), (1L, ts(12)))   // replayed user + new window
    q.processAllAvailable()
    val out = spark.sql("SELECT window_start, distinct_keys FROM tdist_out")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSet
    q.stop()
    assert(out === Set(("2024-01-01 00:00:00.0", 2L),
      ("2024-01-01 00:10:00.0", 1L)))
  }
}
