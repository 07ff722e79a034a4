package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.types._
import graft.core.{InvalidConfigException, SizeParser}
import graft.schema.Flattener

/** scalacheck property tests (SURVEY §5 test plan): flattening invariants,
  * size-parser semantics — the behaviors whose correctness is structural
  * rather than example-driven. */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop, cases: Int = 50): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(res.passed, res.status.toString)
  }

  // ---- size parser -------------------------------------------------------

  test("size parser: n + unit parses to n * multiplier, any case, any suffix") {
    val units = Gen.oneOf("K" -> 1024L, "k" -> 1024L,
      "M" -> 1024L * 1024, "m" -> 1024L * 1024,
      "G" -> 1024L * 1024 * 1024, "g" -> 1024L * 1024 * 1024)
    val suffixes = Gen.oneOf("", "B", "b", "iB", "bytes", "Xtra")
    check(Prop.forAll(Gen.choose(0L, 1000000L), units, suffixes) {
      (n, unit, suffix) =>
        SizeParser.convertSizeToBytes(s"$n${unit._1}$suffix") == n * unit._2
    })
  }

  test("size parser: bare digits and non-size strings are rejected") {
    check(Prop.forAll(Gen.choose(0L, Long.MaxValue)) { n =>
      Prop.throws(classOf[InvalidConfigException])(
        SizeParser.convertSizeToBytes(n.toString))
    })
    check(Prop.forAll(Gen.alphaStr.suchThat(s => s.isEmpty || !s.head.isDigit)) { s =>
      Prop.throws(classOf[InvalidConfigException])(
        SizeParser.convertSizeToBytes(s))
    })
  }

  // ---- flattening --------------------------------------------------------

  private val leafType: Gen[DataType] =
    Gen.oneOf(StringType, LongType, DoubleType, BooleanType, IntegerType)

  /** Random nested struct schemas: bounded depth/width, field names from a
    * separator-free alphabet so output names decompose unambiguously. */
  private def genSchema(depth: Int): Gen[StructType] = {
    val fieldName = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val fieldType: Gen[DataType] =
      if (depth <= 0) leafType
      else Gen.frequency(
        4 -> leafType,
        1 -> Gen.lzy(genSchema(depth - 1)),
        1 -> leafType.map(ArrayType(_)))
    for {
      n <- Gen.choose(1, 4)
      names <- Gen.listOfN(n, fieldName).suchThat(l => l.distinct.size == l.size)
      types <- Gen.listOfN(n, fieldType)
    } yield StructType(names.zip(types).map { case (nm, t) => StructField(nm, t) })
  }

  test("flattening: executed projection schema equals the declared flat schema") {
    val spark = TestSpark.spark
    check(Prop.forAll(genSchema(3)) { schema =>
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      val produced = Flattener.flatten(empty).schema
      val declared = Flattener.flattenedSchema(schema)
      produced.fieldNames.toSeq == declared.fieldNames.toSeq &&
        produced.fields.map(_.dataType).toSeq ==
          declared.fields.map(_.dataType).toSeq
    }, cases = 20)
  }

  test("flattening: output names are the __-joined leaf paths; no structs survive") {
    check(Prop.forAll(genSchema(3)) { schema =>
      val flat = Flattener.flattenedSchema(schema)
      val noNesting = flat.fields.forall(f => f.dataType match {
        case _: StructType | _: ArrayType | _: MapType => false
        case _ => true
      })
      def leafPaths(st: StructType, prefix: Seq[String], depth: Int): Seq[String] =
        st.fields.toSeq.flatMap { f =>
          f.dataType match {
            case nested: StructType if depth < 10 =>
              leafPaths(nested, prefix :+ f.name, depth + 1)
            case _ => Seq((prefix :+ f.name).mkString(Flattener.Separator))
          }
        }
      noNesting && flat.fieldNames.toSeq == leafPaths(schema, Nil, 1)
    })
  }

  test("flattening: depth bound JSON-stringifies exactly the too-deep structs") {
    check(Prop.forAll(genSchema(3), Gen.choose(1, 4)) { (schema, maxDepth) =>
      val flat = Flattener.flattenedSchema(schema, maxDepth)
      def walk(st: StructType, prefix: Seq[String], depth: Int): Seq[(String, Boolean)] =
        st.fields.toSeq.flatMap { f =>
          f.dataType match {
            case nested: StructType if depth < maxDepth =>
              walk(nested, prefix :+ f.name, depth + 1)
            case _: StructType | _: ArrayType | _: MapType =>
              Seq((prefix :+ f.name).mkString(Flattener.Separator) -> true)
            case _ =>
              Seq((prefix :+ f.name).mkString(Flattener.Separator) -> false)
          }
        }
      walk(schema, Nil, 1).zip(flat.fields.toSeq).forall {
        case ((name, stringified), field) =>
          field.name == name && (!stringified || field.dataType == StringType)
      }
    })
  }

  test("flattening: already-flat schemas are fixed points") {
    check(Prop.forAll(genSchema(3)) { schema =>
      val once = Flattener.flattenedSchema(schema)
      Flattener.flattenedSchema(once) == once
    })
  }

  // ---- bounded top-k aggregator (pure merge laws) ------------------------

  test("TopK: any reduce/merge partitioning equals global sort.take(k)") {
    import graft.functions.{TopKItem, TypedAggregators}
    val items = Gen.listOf(Gen.zip(
      Gen.choose(-100.0, 100.0), Gen.choose(0L, 50L)).map(TopKItem.tupled))
    val ks = Gen.choose(1, 6)
    check(Prop.forAll(items, ks, Gen.choose(1, 5)) { (xs, k, parts) =>
      val agg = TypedAggregators.TopK(k)
      // split the input arbitrarily into `parts` partial buffers, reduce
      // each, then merge — must equal one global reduce, must equal the
      // sorted prefix
      val groups = xs.zipWithIndex.groupBy(_._2 % parts).values
        .map(_.map(_._1).foldLeft(agg.zero)(agg.reduce))
      val merged = groups.foldLeft(agg.zero)(agg.merge)
      val global = xs.foldLeft(agg.zero)(agg.reduce)
      val expected = xs.sortBy(t => (-t.key, t.id)).take(k)
      merged == expected && global == expected
    })
  }

  // ---- morton interleave -------------------------------------------------

  test("morton spread: codes are unique and order-preserving on each axis") {
    // bijectivity surrogate (no Spark session in this suite): the reference
    // interleave used by ScaleOpsSpec must be injective and monotone per
    // axis — the properties file-skipping relies on
    def ref(x: Long, y: Long): Long = {
      var r = 0L
      for (b <- 0 until 31)
        r |= (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
      r
    }
    val coords = Gen.choose(0L, Int.MaxValue.toLong)
    check(Prop.forAll(coords, coords, coords, coords) { (x1, y1, x2, y2) =>
      val inj = (x1 == x2 && y1 == y2) == (ref(x1, y1) == ref(x2, y2))
      val monoX = x1 == x2 || (ref(x1, y1) < ref(x2, y1)) == (x1 < x2)
      val monoY = y1 == y2 || (ref(x1, y1) < ref(x1, y2)) == (y1 < y2)
      inj && monoX && monoY
    })
  }
}
