package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources.Avro

/** S4 Avro source/sink over the stock classpath (avro-mapred, no
  * connector): value fidelity incl. nulls and hostile strings, nested
  * struct/array/map recursion, binary, and the logical-type scope guard. */
class AvroSpec extends SparkSpec {

  test("avro round-trip preserves primitives, nulls and hostile strings") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n", IntegerType, nullable = true),
      StructField("x", DoubleType, nullable = true),
      StructField("ok", BooleanType, nullable = false),
      StructField("s", StringType, nullable = true)))
    val rows = Seq(
      Row(1L, 7, 1.5, true, "plain"),
      Row(2L, null, null, false, "comma, \"quote\"\nnewline\ttab"),
      Row(3L, -1, Double.MinPositiveValue, true, "ünïcódé — 中文 🙂"),
      Row(4L, 0, -0.0, false, null),
      Row(5L, Int.MaxValue, Double.MaxValue, true, ""))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
    val back = Avro.avroRoundTrip(spark, df, "avro-spec-")
    assert(back.schema == schema)
    val got = back.collect().sortBy(_.getLong(0)).toSeq
    val want = rows.sortBy(_.getLong(0))
    assert(got == want, s"got $got\nexpected $want")
  }

  test("splittable read: multi-partition write comes back complete") {
    import spark.implicits._
    val df = spark.range(0, 10000, 1, 8)
      .select($"id", ($"id" % 97).cast("int").as("m"))
    val back = Avro.avroRoundTrip(spark, df, "avro-split-")
    assert(back.rdd.getNumPartitions >= 8, "one split per container file")
    assert(back.count() == 10000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0)
      == (0L until 10000L).sum)
  }

  test("nested struct/array/map round-trip, incl. nulls at every depth") {
    val lineSt = StructType(Seq(
      StructField("no", IntegerType, nullable = false),
      StructField("cents", LongType, nullable = true)))
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("lines", ArrayType(lineSt, containsNull = false), nullable = true),
      StructField("meta", StructType(Seq(
        StructField("n", LongType, nullable = false),
        StructField("tag", StringType, nullable = true))), nullable = true),
      StructField("tags", MapType(StringType, LongType, valueContainsNull = true),
        nullable = true),
      StructField("blob", BinaryType, nullable = true)))
    val rows = Seq(
      Row(1L, Seq(Row(1, 100L), Row(2, null)), Row(2L, "ok"),
        Map("a" -> 1L, "b" -> null), Array[Byte](0, 1, -1, 127)),
      Row(2L, Seq.empty[Row], Row(0L, null), Map.empty[String, Long],
        Array.emptyByteArray),
      Row(3L, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val back = Avro.avroRoundTrip(spark, df, "avro-nested-")
    assert(back.schema == schema)
    val got = back.collect().sortBy(_.getLong(0)).toSeq
    // binary needs element-wise comparison (Array[Byte] equality is by ref)
    got.zip(rows).foreach { case (g, w) =>
      assert(g.getLong(0) == w.getLong(0))
      assert(g.get(1) == w.get(1), s"lines: $g vs $w")
      assert(g.get(2) == w.get(2), s"meta: $g vs $w")
      assert(g.get(3) == w.get(3), s"tags: $g vs $w")
      val (gb, wb) = (g.get(4), w.get(4))
      assert((gb == null) == (wb == null) &&
        (gb == null || java.util.Arrays.equals(gb.asInstanceOf[Array[Byte]],
          wb.asInstanceOf[Array[Byte]])), s"blob: $g vs $w")
    }
  }

  test("logical types are rejected toward the connector path") {
    val dec = StructType(Seq(StructField("a", DecimalType(10, 2))))
    intercept[IllegalArgumentException](Avro.avroSchemaJson(dec, "r"))
  }
}
