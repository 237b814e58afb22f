package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.core.Tables

/** CSV / JSON-lines sources round-trip with explicit schemas — including
  * the hostile strings a real document corpus contains (embedded commas,
  * quotes, newlines, unicode). Schema is always explicit: inference costs a
  * full extra pass at scale and guesses types per-run. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("score", DoubleType)))

  private lazy val fixture = Seq(
    (1L, "plain text", 1.5),
    (2L, "comma, separated, values", -0.25),
    (3L, "a \"quoted\" value", 0.0),
    (4L, "line\nbreak inside", 2.0),
    (5L, "unicode: 中文 désolé", 3.5),
  ).toDF("doc_id", "text", "score")

  test("csvTable: write → read with explicit schema is lossless") {
    val dir = tmpDir("csv_src")
    fixture.write.mode("overwrite").option("header", "true")
      .option("escape", "\"").csv(dir)
    val back = Tables.csvTable(spark, dir, schema)
    assert(back.schema == schema, back.schema.treeString)
    assert(back.as[(Long, String, Double)].collect().toSet ==
      fixture.as[(Long, String, Double)].collect().toSet)
  }

  test("jsonlTable: write → read with explicit schema is lossless") {
    val dir = tmpDir("jsonl_src")
    fixture.write.mode("overwrite").json(dir)
    val back = Tables.jsonlTable(spark, dir, schema)
    assert(back.schema == schema, back.schema.treeString)
    assert(back.as[(Long, String, Double)].collect().toSet ==
      fixture.as[(Long, String, Double)].collect().toSet)
  }

  test("orcTable: write → read is lossless and pushdown-capable") {
    val dir = tmpDir("orc_src")
    fixture.write.mode("overwrite").orc(dir)
    val back = Tables.orcTable(spark, dir, schema)
    assert(back.schema == schema, back.schema.treeString)
    assert(back.as[(Long, String, Double)].collect().toSet ==
      fixture.as[(Long, String, Double)].collect().toSet)
    val filtered = back.where(org.apache.spark.sql.functions.col("doc_id") > 3L)
    assert(filtered.queryExecution.executedPlan.toString.contains("PushedFilters: [IsNotNull(doc_id)"),
      "ORC scan must accept pushed filters")
    assert(filtered.count() == 2)
  }

  test("explicit schema tolerates missing columns as nulls (jsonl)") {
    val dir = tmpDir("jsonl_missing")
    Seq("""{"doc_id": 9}""").toDF("value").as[String]
      .write.mode("overwrite").text(dir)
    val back = Tables.jsonlTable(spark, dir, schema).collect()
    assert(back.toSeq == Seq(Row(9L, null, null)))
  }
}
