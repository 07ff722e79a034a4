package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only measurement probe: times/validates operator building blocks in
  * isolation so optimization targets the measured bottleneck, not a
  * guessed one. Not part of the library surface; the driver never runs
  * this main. Modes (args(0)): `lshrecall` — recall/candidate sweep of
  * cosineNearDupsLsh vs the exact kernel.
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("lshrecall")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-perfprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    mode match {
      case "lshrecall" =>
        import graft.operators.Similarity
        val e = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
        val n = e.count()
        val exact = Similarity.cosineNearDups(e, "vec_id", "embedding", 0.45)
          .cache()
        val nExact = exact.count()
        println(s"[probe] n=$n exact_pairs=$nExact")
        for (planes <- Seq(2, 3, 4, 5); tables <- Seq(4, 8, 16)) {
          val t0 = System.nanoTime()
          val lsh = Similarity.cosineNearDupsLsh(e, "vec_id", "embedding",
            0.45, numPlanes = planes, tables = tables)
          val nLsh = lsh.count()
          val hit = lsh.join(exact, Seq("id_a", "id_b")).count()
          val dt = (System.nanoTime() - t0) / 1e9
          lsh.unpersist()
          println(f"[probe] planes=$planes tables=$tables%2d lsh=$nLsh " +
            f"true=$hit recall=${hit.toDouble / nExact}%.3f " +
            f"falsePos=${nLsh - hit} ${dt}%.2f s")
        }
      case "ivfpq" =>
        // recall@10 of the composed index (and its building blocks) vs the
        // exact scorer, at the sim_ivfpq query-entry parameters
        import graft.operators.Similarity
        val e = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
        val queries = e.filter(col("vec_id") % 10 === 0)
        val exact = Similarity.bruteForceTopK(queries, e, "vec_id",
          "embedding", 10, broadcastCorpus = true)
          .select("query_id", "neighbor_id").cache()
        val nExact = exact.count()
        def recallOf(tag: String)(ann: DataFrame): Unit = {
          val t0 = System.nanoTime()
          val hit = exact.join(ann.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id")).count()
          val dt = (System.nanoTime() - t0) / 1e9
          ann.unpersist()
          println(f"[probe] $tag recall@10=${hit.toDouble / nExact}%.3f ${dt}%.2f s")
        }
        recallOf("pq_rerank")(Similarity.pqRerankTopK(queries, e, "vec_id",
          "embedding", 10, candidates = 100))
        recallOf("ivfpq_rerank n6")(Similarity.ivfPqRerankTopK(queries, e,
          "vec_id", "embedding", 10, candidates = 100, nCells = 8, nprobe = 6,
          trainMaxRows = 1000L))
        recallOf("ivfpq_rerank n4")(Similarity.ivfPqRerankTopK(queries, e,
          "vec_id", "embedding", 10, candidates = 100, nCells = 8, nprobe = 4,
          trainMaxRows = 1000L))
      case other => sys.error(s"unknown probe mode $other")
    }
    spark.stop()
  }
}
