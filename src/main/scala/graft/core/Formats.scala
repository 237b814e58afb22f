package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text source-format round-trips: stage a frame to JSON-lines / CSV with a
  * normal DISTRIBUTED write, read it back through the corresponding Spark
  * source with an EXPLICIT schema (schema inference over a 100 TB corpus is
  * a full extra pass — never rely on it at scale). Exists to put the
  * non-parquet batch sources behind the same DuckDB oracle as everything
  * else: a round-tripped aggregate can only match the parquet-side oracle if
  * the writer and the reader both preserve values exactly (longs, shortest-
  * round-trip doubles, quoted strings).
  *
  * JSON and CSV are the in-core text formats standing on the same source
  * API surface; the Avro path the reference declares
  * (`KCDBProcessingMel/build.sbt:12`) lives in [[graft.sources.Avro]]
  * (avro-mapred container files — the connector jar isn't shipped
  * offline). Staging lives under [[Scratch]] (removed on JVM exit);
  * executors write and read — nothing driver-resident.
  */
object Formats {

  /** Stage `df` to JSON-lines, read back with `schemaDDL`. */
  def jsonRoundTrip(spark: SparkSession, df: DataFrame, schemaDDL: String,
                    tag: String): DataFrame = {
    val dir = Scratch.dir(tag)
    df.write.mode("overwrite").json(dir)
    spark.read.schema(schemaDDL).json(dir)
  }

  /** Stage `df` to headered CSV, read back with `schemaDDL`. */
  def csvRoundTrip(spark: SparkSession, df: DataFrame, schemaDDL: String,
                   tag: String): DataFrame = {
    val dir = Scratch.dir(tag)
    df.write.mode("overwrite").option("header", "true").csv(dir)
    spark.read.schema(schemaDDL).option("header", "true").csv(dir)
  }

  /** Stage `df` to ORC, read back with `schemaDDL` — the in-core COLUMNAR
    * alternative to parquet (same vectorized reader / predicate-pushdown /
    * column-pruning surface, so a warehouse standardized on ORC gets the
    * identical scan discipline). Binary format: the round-trip under test
    * is type fidelity through a second columnar codec, not text parsing. */
  def orcRoundTrip(spark: SparkSession, df: DataFrame, schemaDDL: String,
                   tag: String): DataFrame = {
    val dir = Scratch.dir(tag)
    df.write.mode("overwrite").orc(dir)
    spark.read.schema(schemaDDL).orc(dir)
  }
}
