package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources.Avro

/** S4 Avro source/sink over the stock classpath (avro-mapred, no
  * connector): value fidelity incl. nulls and hostile strings, nested
  * struct/array/map recursion, binary, and the logical-type matrix
  * (decimal / timestamp-micros / local-timestamp-micros / date). */
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

  test("logical types round-trip: decimal / timestamp / timestamp_ntz / date, nulls included") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("dec", DecimalType(10, 2), nullable = true),
      StructField("big", DecimalType(30, 6), nullable = true),
      StructField("ts", TimestampType, nullable = true),
      StructField("ntz", TimestampNTZType, nullable = true),
      StructField("d", DateType, nullable = true)))
    def bd(s: String) = new java.math.BigDecimal(s)
    val rows = Seq(
      Row(1L, bd("12345678.90"), bd("123456789012345678901234.567891"),
        java.sql.Timestamp.valueOf("2024-01-02 03:04:05.123456"),
        java.time.LocalDateTime.parse("2024-01-02T03:04:05.000001"),
        java.sql.Date.valueOf("2024-01-02")),
      Row(2L, bd("-0.01"), bd("-1.000001"),
        java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999999"), // pre-epoch
        java.time.LocalDateTime.parse("1969-12-31T23:59:59.999999"),
        java.sql.Date.valueOf("1969-12-31")),
      Row(3L, null, null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val back = Avro.avroRoundTrip(spark, df, "avro-logical-")
    assert(back.schema == schema)
    val got = back.collect().sortBy(_.getLong(0)).toSeq
    // compare via Spark-normalized values (Decimal scale normalization):
    // collect both frames and compare row-by-row
    val want = df.collect().sortBy(_.getLong(0)).toSeq
    assert(got == want, s"got $got\nexpected $want")
    // the writer schema carries the interop annotations spark-avro and
    // any Avro consumer resolve
    val json = Avro.avroSchemaJson(schema, "r")
    assert(json.contains(""""logicalType":"decimal","precision":10,"scale":2"""))
    assert(json.contains(""""logicalType":"timestamp-micros""""))
    assert(json.contains(""""logicalType":"local-timestamp-micros""""))
    assert(json.contains(""""logicalType":"date""""))
  }
}
