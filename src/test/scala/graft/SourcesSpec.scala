package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format matrix: every format Spark ships round-trips the same
  * frame (the engine's scan surface beyond parquet + Singer JSONL). */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("csv, json, orc, parquet round-trip the nation table") {
    val nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    for (fmt <- Seq("csv", "json", "orc", "parquet")) {
      val dir = Files.createTempDirectory(s"graft-src-$fmt").toString + "/t"
      val writer = nation.write.format(fmt).mode("overwrite")
      (if (fmt == "csv") writer.option("header", "true") else writer).save(dir)
      val reader = spark.read.format(fmt)
      val back = (fmt match {
        case "csv" => reader.option("header", "true").option("inferSchema", "true")
        case _     => reader
      }).load(dir)
      assert(back.count() === nation.count(), fmt)
      assert(back.columns.sorted === nation.columns.sorted, fmt)
      // content equality modulo csv's inferred int widths
      val a = back.selectExpr("CAST(n_nationkey AS BIGINT) k", "n_name").orderBy("k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val b = nation.selectExpr("CAST(n_nationkey AS BIGINT) k", "n_name").orderBy("k")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(a === b, fmt)
    }
  }
}
