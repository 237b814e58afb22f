package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.sources.Avro

/** S4 Avro source/sink over the stock classpath (avro-mapred, no
  * connector): value fidelity incl. nulls and hostile strings, and the
  * flat-primitive scope guard. */
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

  test("non-flat schemas are rejected toward the connector path") {
    val nested = StructType(Seq(StructField("a",
      StructType(Seq(StructField("b", LongType))))))
    intercept[IllegalArgumentException](Avro.avroSchemaJson(nested, "r"))
  }
}
