package graft

import org.apache.spark.sql.functions._

/** Round-7 additions, part 6: incremental connected components and the
  * subject access report.
  *
  * The incremental-components test is the load-bearing one: label-star ∪
  * batch must equal from-scratch over the union on randomized graphs —
  * including batches that MERGE previously separate components (the case
  * the star-graph argument exists for) and batches touching brand-new
  * nodes only.
  */
class Round7fSpec extends SparkSpec {

  test("incrementalComponents equals from-scratch on random splits") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val all = (1 to 300).map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    for (cut <- Seq(0.3, 0.7)) {
      val k = (all.size * cut).toInt
      val (oldE, newE) = all.splitAt(k)
      val labels = ext.Graph.connectedComponents(
        oldE.toDF("src", "dst"), "src", "dst")
      val got = ext.Graph.incrementalComponents(labels,
          newE.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      val want = ext.Graph.connectedComponents(
          all.toDF("src", "dst"), "src", "dst")
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"cut=$cut")
    }
  }

  test("incrementalComponents: batch merges two old components") {
    import spark.implicits._
    val oldE = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    val labels = ext.Graph.connectedComponents(oldE, "src", "dst")
    // bridge 2-3 plus a fresh disjoint pair 9-10
    val got = ext.Graph.incrementalComponents(labels,
        Seq((2L, 3L), (9L, 10L)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      9L -> 9L, 10L -> 9L))
  }

  test("qqDrift: exact integer-rank quartiles, including tie runs") {
    import spark.implicits._
    val a = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "v")
    // side b: 100 values 101,103,...,299 plus ties at the low end
    val b = ((1L to 100L).map(i => (i, 99.0 + 2 * i)) :+ (200L, 101.0))
      .toDF("id", "v")
    val got = queries.Stats.qqDrift(a, b, col("id"), col("v"), splits = 4)
      .orderBy("decile")
      .as[(Int, Double, Double, Double)].collect().toSeq
    // n_a=100 -> ranks 25,50,75 -> values 25,50,75
    // n_b=101 -> ranks ceil(k*101/4)=26,51,76 -> sorted b: 101,101,103,...
    //   rank 26 = 99+2*25=149, rank 51 = 199, rank 76 = 249
    assert(got == Seq((1, 25.0, 149.0, 124.0), (2, 50.0, 199.0, 149.0),
      (3, 75.0, 249.0, 174.0)))
  }

  test("imputeByGroupMedian: median fill, all-null group stays null") {
    import spark.implicits._
    val df = Seq(
      ("g1", 1L, Some(10.0)), ("g1", 2L, Some(20.0)), ("g1", 3L, None),
      ("g1", 4L, Some(31.0)),
      ("g2", 5L, None), ("g2", 6L, None))
      .toDF("g", "id", "bal")
    val got = ext.Quality.imputeByGroupMedian(df, col("g"), col("bal"))
      .orderBy("id")
      .select("id", "was_imputed", "imputed")
      .as[(Long, Int, Option[Double])].collect().toSeq
    // g1 non-null median = 20.0; g2 has nothing to impute from
    assert(got == Seq((1L, 0, Some(10.0)), (2L, 0, Some(20.0)),
      (3L, 1, Some(20.0)), (4L, 0, Some(31.0)),
      (5L, 1, None), (6L, 1, None)))
  }

  test("variantField: drifted, absent, malformed, uncastable payloads") {
    import spark.implicits._
    val df = Seq(
      (1L, """{"k": 7}"""),
      (2L, """{"k": "x"}"""),        // uncastable to int -> NULL
      (3L, """{"a": {"b": 5}}"""),   // nested path, k absent
      (4L, "not json"))              // malformed -> NULL variant
      .toDF("id", "props")
    val got = core.Parse.variantField(
        core.Parse.variantField(df, col("props"), "$.k", "int", "k",
          malformedNull = true),
        col("props"), "$.a.b", "int", "ab", malformedNull = true)
      .select("id", "k", "ab")
      .as[(Long, Option[Int], Option[Int])].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, Some(7), None), (2L, None, None),
      (3L, None, Some(5)), (4L, None, None)))
  }

  test("subjectAccessReport: rollups, zero-activity subjects report zeros") {
    import spark.implicits._
    val subjects = Seq((10L, "alice"), (20L, "bo")).toDF("id", "name")
    val ev = Seq((10L, 1.5), (10L, 2.25), (30L, 9.0))
      .toDF("graft_sid", "graft_val")
    val ord = Seq((10L, 100.0)).toDF("graft_sid", "graft_val")
    val got = ext.Governance.subjectAccessReport(subjects, "id",
        Seq("events" -> ev, "orders" -> ord))
      .orderBy("id")
      .select("id", "name", "n_events", "total_events", "n_orders",
        "total_orders")
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (10L, "alice", 2L, 3750000L, 1L, 100000000L),
      (20L, "bo", 0L, 0L, 0L, 0L)))
  }
}
