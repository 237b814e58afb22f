package graft

import org.apache.spark.sql.functions._
import graft.queries.Cdc
import graft.ext.Quality

class CdcQualitySpec extends SparkSpec {
  import spark.implicits._

  test("cdc apply: latest seq wins, delete drops, re-insert resurrects") {
    val base = Seq(
      (1L, "a", 10.0),   // untouched
      (2L, "b", 20.0),   // updated twice: seq 2 wins
      (3L, "c", 30.0),   // deleted
      (4L, "d", 40.0),   // deleted then re-inserted: resurrected
    ).toDF("k", "name", "bal")
    val changes = Seq(
      (2L, "b", 21.0, 1L, "U"),
      (2L, "b2", 22.0, 2L, "U"),
      (3L, "c", 0.0, 1L, "D"),
      (4L, "d", 0.0, 1L, "D"),
      (4L, "d2", 44.0, 2L, "I"),
      (5L, "e", 50.0, 1L, "I"),   // fresh insert
    ).toDF("k", "name", "bal", "seq", "op")
    val out = Cdc.applyChanges(base, changes, "k", "seq", "op")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(out == Seq(
      (1L, "a", 10.0),
      (2L, "b2", 22.0),
      (4L, "d2", 44.0),
      (5L, "e", 50.0)))
  }

  test("cdc apply: full-row image means NULLs in the image are real") {
    val base = Seq((1L, Some("x"))).toDF("k", "v")
    val changes = Seq((1L, None: Option[String], 1L, "U")).toDF("k", "v", "seq", "op")
    val out = Cdc.applyChanges(base, changes, "k", "seq", "op")
      .as[(Long, Option[String])].collect().toSeq
    assert(out == Seq((1L, None)))
  }

  test("constraint report: each class counts its violations, pass flag set") {
    val df = Seq(
      (Some(1L), "O", 5.0),
      (Some(1L), "F", -1.0),     // dup key + negative
      (None, "X", 2.0),          // null key + bad status
    ).toDF("k", "st", "price")
    val out = Quality.constraintReport(df, Seq(
        "k_not_null" -> Quality.notNull(col("k")),
        "k_unique" -> Quality.unique(col("k")),
        "price_non_negative" -> Quality.nonNegative(col("price")),
        "st_in_domain" -> Quality.inSet(col("st"), Seq("O", "F", "P")),
        "price_not_null" -> Quality.notNull(col("price"))))
      .orderBy("check_name").as[(String, Long, Int)].collect().toSeq
    assert(out == Seq(
      ("k_not_null", 1L, 0),
      ("k_unique", 1L, 0),
      ("price_non_negative", 1L, 0),
      ("price_not_null", 0L, 1),
      ("st_in_domain", 1L, 0)))
  }

  test("referential integrity: orphans counted, null child keys are orphans") {
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = Quality.riReport("ri", child, col("fk"), parent, col("pk"))
      .as[(String, Long, Int)].collect().toSeq
    assert(out == Seq(("ri", 2L, 0)))
  }
}
