package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (plus the extension tier) is exposed as a
  * named query over the `/root/testdata/sf*` parquet tables, with an
  * equivalent DuckDB oracle in [[oracleSql]]. Column names and aliases match
  * between the Spark query and the oracle exactly (the driver sorts columns
  * by name before hashing). Every query ends in a deterministic ORDER BY on
  * a unique key so row order can never cause a hash mismatch; double sums go
  * through exact decimal arithmetic ([[graft.core.Num]]) so summation order
  * can't either.
  *
  * Domain mapping (survey §7.1): events.ts → timestamp, events.user_id → id,
  * events.event_type → antenna_id, JSON props.k → app, events.value → bytes,
  * customer(c_custkey, c_name, c_acctbal) → user_metadata(id, email, quota).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A4: hourly tumbling-window sum of value per event_type over events. */
  def entry(spark: SparkSession): DataFrame =
    Agg.windowedSum(
      Tables.events(spark, "/root/testdata/sf0.001"),
      col("event_type"), col("ts"), "1 hour", col("value"),
      "antenna_bytes_total")

  // ---- helpers -----------------------------------------------------------

  private def events(s: SparkSession, d: String)   = Tables.events(s, d)
  private def customer(s: SparkSession, d: String) = Tables.customer(s, d)

  /** events enriched with the customer dimension (J1), reference semantics:
    * inner equi-join on user id, broadcast dim, drop duplicate key. */
  private def enriched(s: SparkSession, d: String): DataFrame =
    Enrich.enrich(events(s, d), customer(s, d), "user_id", "c_custkey")

  /** events with the JSON props payload parsed: adds int column `k` (P3). */
  private def withK(s: SparkSession, d: String): DataFrame =
    Parse.withJsonField(events(s, d), col("props"), Parse.propsSchema, "k", "k")

  // ---- queries -----------------------------------------------------------

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1: bytes per antenna, 90 s tumbling window (streaming agg, batch-run)
    "a1_antenna_90s" -> ((s, d) =>
      Agg.windowedSum(events(s, d), col("event_type"), col("ts"),
        "90 seconds", col("value"), "antenna_bytes_total")
        .orderBy("timestamp", "id")),

    // A2: bytes per user, 90 s tumbling window
    "a2_user_90s" -> ((s, d) =>
      Agg.windowedSum(events(s, d), col("user_id").cast("string"), col("ts"),
        "90 seconds", col("value"), "user_bytes_total")
        .orderBy("timestamp", "id")),

    // A3: bytes per app (JSON-parsed props.k), 90 s tumbling window (+P3)
    "a3_app_90s" -> ((s, d) =>
      Agg.windowedSum(withK(s, d), col("k").cast("string"), col("ts"),
        "90 seconds", col("value"), "app_bytes_total")
        .orderBy("timestamp", "id")),

    // A4: bytes per antenna, 1 h tumbling window (batch layer)
    "a4_antenna_1h" -> ((s, d) =>
      Agg.windowedSum(events(s, d), col("event_type"), col("ts"),
        "1 hour", col("value"), "antenna_bytes_total")
        .orderBy("timestamp", "id")),

    // A5: bytes per user email, 1 h window — requires the J1 enrichment
    "a5_email_1h" -> ((s, d) =>
      Agg.windowedSum(enriched(s, d), col("c_name"), col("ts"),
        "1 hour", col("value"), "email_bytes_total")
        .orderBy("timestamp", "id")),

    // A6: bytes per app, 1 h window
    "a6_app_1h" -> ((s, d) =>
      Agg.windowedSum(withK(s, d), col("k").cast("string"), col("ts"),
        "1 hour", col("value"), "app_bytes_total")
        .orderBy("timestamp", "id")),

    // A7/P8: hourly quota violators — groupBy + HAVING over the enrichment
    "a7_quota_violations" -> ((s, d) =>
      QuotaCheck.quotaViolations(enriched(s, d), col("c_name"),
        col("c_acctbal"), col("ts"), col("value"), "1 hour")
        .orderBy("email", "timestamp")),

    // J1/P1/P5/P10: the enrichment join itself (row-level output)
    "j1_enrich" -> ((s, d) =>
      enriched(s, d).select(
        col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
        .orderBy("event_id")),

    // S2/P7/P9: conjunctive equality filter on derived date parts
    // (the reference's partition-pruned y/m/d/h scan, BatchJobImpl.scala:22-26)
    "s2_hour_slice" -> ((s, d) =>
      events(s, d)
        .where(year(col("ts")) === lit(2024) && month(col("ts")) === lit(1) &&
          dayofmonth(col("ts")) === lit(1) && hour(col("ts")) === lit(10))
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
          col("value"))
        .orderBy("event_id")),

    // P2/P3/P4: JSON parse with explicit schema, struct field extraction
    "p3_json_parse" -> ((s, d) =>
      withK(s, d).select(col("event_id"), col("k"))
        .orderBy("event_id")),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = {
    def windowed(dur: String, idExpr: String, from: String, tag: String) =
      s"""SELECT time_bucket(INTERVAL '$dur', ts) AS "timestamp", $idExpr AS id,
         | CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS value,
         | '$tag' AS type
         |FROM $from GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin.replace("\n", " ")
    val enrichedFrom =
      "events e JOIN customer c ON e.user_id = c.c_custkey"
    Map(
      "a1_antenna_90s" -> windowed("90 seconds", "event_type", "events", "antenna_bytes_total"),
      "a2_user_90s" -> windowed("90 seconds", "CAST(user_id AS VARCHAR)", "events", "user_bytes_total"),
      "a3_app_90s" -> windowed("90 seconds",
        "CAST(CAST(json_extract(props, '$.k') AS INT) AS VARCHAR)", "events", "app_bytes_total"),
      "a4_antenna_1h" -> windowed("1 hour", "event_type", "events", "antenna_bytes_total"),
      "a5_email_1h" -> windowed("1 hour", "c_name", enrichedFrom, "email_bytes_total"),
      "a6_app_1h" -> windowed("1 hour",
        "CAST(CAST(json_extract(props, '$.k') AS INT) AS VARCHAR)", "events", "app_bytes_total"),
      "a7_quota_violations" ->
        ("""SELECT c_name AS email,
           | CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS usage,
           | c_acctbal AS quota,
           | time_bucket(INTERVAL '1 hour', ts) AS "timestamp"
           |FROM events e JOIN customer c ON e.user_id = c.c_custkey
           |GROUP BY c_name, c_acctbal, 4
           |HAVING CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) > c_acctbal
           |ORDER BY email, "timestamp"""".stripMargin.replace("\n", " ")),
      "j1_enrich" ->
        ("""SELECT event_id, ts, user_id, event_type, value, c_name, c_acctbal,
           | c_mktsegment
           |FROM events e JOIN customer c ON e.user_id = c.c_custkey
           |ORDER BY event_id""".stripMargin.replace("\n", " ")),
      "s2_hour_slice" ->
        ("""SELECT event_id, ts, user_id, event_type, value FROM events
           |WHERE EXTRACT(year FROM ts) = 2024 AND EXTRACT(month FROM ts) = 1
           | AND EXTRACT(day FROM ts) = 1 AND EXTRACT(hour FROM ts) = 10
           |ORDER BY event_id""".stripMargin.replace("\n", " ")),
      "p3_json_parse" ->
        "SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k FROM events ORDER BY event_id",
    )
  }
}
