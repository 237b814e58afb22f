package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parameterized batch sources over the driver-generated parquet test data
  * (see /root/repo/TESTDATA.md). Equivalent of the reference's batch sources
  * (survey §2.1 S2/S3: `BatchJobImpl.scala:17-38`), re-expressed as plain
  * parquet scans parameterized by scale-factor directory.
  *
  * Scale note: `spark.read.parquet` yields a file-source relation that
  * Catalyst can prune (partition pruning, predicate pushdown, column
  * pruning). At 100 TB these tables would be directory-partitioned and/or
  * bucketed; the loaders stay the same — pruning comes from the filters the
  * query applies, not from the loader.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is µs-precision parquet with `isAdjustedToUTC=false`, which
    * Spark reads natively as TIMESTAMP_NTZ (wall-clock, no zone) — the same
    * logical type the DuckDB oracle reads, so schema parity holds by
    * construction and range predicates on `ts` push straight into the
    * parquet scan (row-group min/max pruning; see [[Prune.hourSlice]]).
    * Earlier generations of the fixture were TIMESTAMP(NANOS), which needed
    * a legacy long-read + ns→µs division; that path is retired with the
    * data. */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "events")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "customer")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "lineitem")
  def part(spark: SparkSession, sfDir: String): DataFrame       = table(spark, sfDir, "part")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** CSV source with an EXPLICIT schema — never schema inference, which
    * costs an extra full pass over 100 TB and guesses types per-run.
    * `multiLine` handles quoted embedded newlines (real text columns have
    * them); note multiLine CSV files are not splittable — at scale prefer
    * many files over one giant one, or escape newlines at produce time. */
  def csvTable(spark: SparkSession, path: String,
               schema: org.apache.spark.sql.types.StructType,
               header: Boolean = true, multiLine: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("multiLine", multiLine.toString)
      .option("escape", "\"")
      .csv(path)

  /** JSON-lines source with an explicit schema (same no-inference rule);
    * one JSON object per line — splittable, the standard interchange shape
    * for document corpora. */
  def jsonlTable(spark: SparkSession, path: String,
                 schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC source (in-box in Spark, no extra dependency) — the other
    * columnar format with predicate pushdown and column pruning; explicit
    * schema for the same reasons as [[csvTable]]. */
  def orcTable(spark: SparkSession, path: String,
               schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** JDBC dimension scan, the shape of the reference's `readUserMetadata`
    * (`BatchJobImpl.scala:29-38`). Not exercised offline (no DB in the test
    * environment); kept as the production path for a serving-DB dimension.
    */
  def jdbcTable(spark: SparkSession, url: String, dbtable: String,
                user: String, password: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", dbtable)
      .option("user", user)
      .option("password", password)
      .load()

  /** Range-partitioned parallel JDBC scan — the scale shape of
    * [[jdbcTable]]: a plain JDBC read is ONE connection pulling the whole
    * table through a single task (the classic ingest bottleneck); this
    * variant splits `[lower, upper]` on a numeric key into `numPartitions`
    * disjoint range predicates, one connection per partition, so the scan
    * parallelizes like a file source. Filters and column pruning still
    * push into each partition's generated SQL (JDBCRelation PushedFilters).
    * Bounds don't filter — rows outside land in the edge partitions. */
  def jdbcTablePartitioned(spark: SparkSession, url: String, dbtable: String,
                           partitionColumn: String, lower: Long, upper: Long,
                           numPartitions: Int,
                           user: String, password: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", dbtable)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .option("user", user)
      .option("password", password)
      .load()
}
