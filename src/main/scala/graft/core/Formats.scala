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

  /** Stage `df` to XML (Spark 4's NATIVE xml source — spark-xml folded
    * into core, no connector jar), read back with `schemaDDL`. The
    * round-trip under test is the escaping-sensitive one: XML must
    * entity-encode &, <, > in string values and the reader must decode
    * them back exactly, on top of the long/shortest-round-trip-double
    * fidelity the JSON/CSV twins grade. `rowTag` is mandatory on read —
    * there is no default record delimiter in XML. */
  def xmlRoundTrip(spark: SparkSession, df: DataFrame, schemaDDL: String,
                   tag: String): DataFrame = {
    val dir = Scratch.dir(tag)
    df.write.mode("overwrite").option("rootTag", "rows")
      .option("rowTag", "row").format("xml").save(dir)
    spark.read.schema(schemaDDL).option("rowTag", "row")
      .format("xml").load(dir)
  }

  /** SCHEMA EVOLUTION read: stage several schema EPOCHS of one logical
    * table (each write appends its own part files) and read the directory
    * back with `mergeSchema` — the lakehouse schema-drift reality at
    * 100 TB, where years of ingest jobs each wrote the columns that
    * existed at the time. The merged schema is the union of all epochs'
    * fields (matched by name, later-epoch additions appended); rows from
    * epochs missing a column read as NULL in it. mergeSchema costs one
    * footer read PER FILE at planning — Spark distributes the footer scan,
    * but steady-state readers of a settled table should pin the unioned
    * schema explicitly (`.schema(...)`) and skip the discovery pass; the
    * parquet scan itself stays fully pruned/pushed either way. */
  def schemaEvolutionRead(spark: SparkSession, epochs: Seq[DataFrame],
                          tag: String): DataFrame = {
    val dir = Scratch.dir(tag)
    epochs.foreach(_.write.mode("append").parquet(dir))
    spark.read.option("mergeSchema", "true").parquet(dir)
  }
}
