package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Payload parsing: the reference's P2-P4 surface (survey §2.3) — cast the
  * raw source bytes to string, parse JSON against an explicit schema, expand
  * the struct. Reference: `StreamingJobImpl.scala:29-39`.
  *
  * `from_json` is a Catalyst-native expression (`JsonToStructs`), so the
  * parse stays inside whole-stage codegen and distributes trivially — no UDF.
  */
object Parse {

  /** The reference's hand-declared device-message schema
    * (`StreamingJobImpl.scala:29-35`). */
  val deviceMessageSchema: StructType = StructType(Seq(
    StructField("timestamp", TimestampType, nullable = false),
    StructField("id", StringType, nullable = false),
    StructField("antenna_id", StringType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("app", StringType, nullable = false),
  ))

  /** Schema of the test-data `events.props` JSON payload ({"k": int}). */
  val propsSchema: StructType = StructType(Seq(
    StructField("k", IntegerType, nullable = true),
  ))

  /** Cast a binary/string payload column and parse it with an explicit
    * schema, then expand the struct to top-level columns — exactly the
    * reference's parserJsonData (`StreamingJobImpl.scala:37-40`). */
  def parseJson(df: DataFrame, payload: Column, schema: StructType): DataFrame =
    df.withColumn("__parsed", from_json(payload.cast(StringType), schema))
      .select(col("__parsed.*"))

  /** Parse the payload but KEEP the original columns (the shape our
    * test-data queries need: events columns + extracted `k`). */
  def withJsonField(df: DataFrame, payload: Column, schema: StructType,
                    field: String, as: String): DataFrame =
    df.withColumn(as, from_json(payload.cast(StringType), schema).getField(field))
}
