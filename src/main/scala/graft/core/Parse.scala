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

  /** SCHEMA-ON-READ semi-structured ingestion via Spark 4 VARIANT — the
    * declared-schema-free counterpart to [[parseJson]]: `parse_json`
    * stores the payload in Spark's binary variant encoding (typed,
    * shredded, columnar-friendly — the open Parquet `VARIANT` spec), and
    * fields extract lazily with `variant_get` path expressions, so a
    * payload whose shape drifts (new fields, heterogeneous rows) ingests
    * WITHOUT a schema migration — `try_variant_get` returns NULL for an
    * absent path or an uncastable value instead of failing the batch,
    * the (P3) explicit-schema contract relaxed to evolving feeds.
    * `malformedNull = true` swaps `try_parse_json` in, additionally
    * mapping syntactically invalid payloads to a NULL variant (the
    * quarantine-friendly read; pair with [[graft.ext.Governance
    * .quarantine]] to route them).
    *
    * Scale shape: both functions are Catalyst-native expressions inside
    * whole-stage codegen — a pure projection, no UDF, no shuffle; at rest
    * the variant column stores ONCE and serves every future field access,
    * where repeated `from_json` re-parses the string per query. */
  def variantField(df: DataFrame, payload: Column, path: String,
                   targetType: String, as: String,
                   malformedNull: Boolean = false): DataFrame = {
    val v = if (malformedNull) try_parse_json(payload.cast(StringType))
            else parse_json(payload.cast(StringType))
    df.withColumn(as, try_variant_get(v, path, targetType))
  }
}
