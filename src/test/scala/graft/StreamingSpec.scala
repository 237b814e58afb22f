package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.core.{Parse, Sinks}
import graft.streaming.Speed

/** Speed-layer specs (survey §2.6): watermark + tumbling window semantics,
  * JSON parse on the stream, partitioned archive sink, foreachBatch sink —
  * all driven synchronously through MemoryStream + processAllAvailable. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def msg(t: String, id: String, ant: String, bytes: Long, app: String) =
    s"""{"timestamp":"$t","id":"$id","antenna_id":"$ant","bytes":$bytes,"app":"$app"}"""

  test("T1/T2: windowed sum over a stream; late data beyond watermark dropped") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val parsed = Speed.parseJson(in.toDF(), "value")
    val agg = Speed.windowedSumLong(parsed, col("antenna_id"), "timestamp",
      "90 seconds", "15 seconds", col("bytes"), "antenna_bytes_total")
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("t1_out").start()
    try {
      // batch 1: two events in window [0,90), one at 120 s pushing max event
      // time to 120 → watermark 105 s > 90 s closes the first window.
      in.addData(
        msg("2022-02-26T00:00:10Z", "u1", "ant1", 100, "FB"),
        msg("2022-02-26T00:00:50Z", "u2", "ant1", 50, "FB"),
        msg("2022-02-26T00:02:00Z", "u1", "ant2", 7, "IG"))
      q.processAllAvailable()
      // batch 2: a late event for the already-closed window (00:00:20 is far
      // behind watermark 105 s) must be DROPPED; a fresh event advances the
      // watermark past window [90,180) so ant2 emits too.
      in.addData(
        msg("2022-02-26T00:00:20Z", "u3", "ant1", 999, "FB"), // late → dropped
        msg("2022-02-26T00:05:00Z", "u1", "ant3", 1, "IG"))
      q.processAllAvailable()
      val got = spark.table("t1_out")
        .as[(Timestamp, String, Long, String)].collect().toSet
      assert(got.contains((Timestamp.valueOf("2022-02-26 00:00:00"), "ant1",
        150L, "antenna_bytes_total")), s"window [0,90) must sum to 150 (late 999 dropped): $got")
      assert(got.contains((Timestamp.valueOf("2022-02-26 00:01:30"), "ant2",
        7L, "antenna_bytes_total")))
      assert(!got.exists(_._3 == 1149L), "late event must not be merged")
    } finally q.stop()
  }

  test("K3: streaming archive writes year/month/day/hour partition layout") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val parsed = Speed.parseJson(in.toDF(), "value")
    val path = tmpDir("archive")
    val q = Sinks.archiveStream(parsed, "timestamp", s"$path/data",
      s"$path/chk").start()
    try {
      in.addData(
        msg("2022-02-26T00:10:00Z", "u1", "ant1", 100, "FB"),
        msg("2022-02-26T13:10:00Z", "u2", "ant2", 50, "IG"))
      q.processAllAvailable()
    } finally q.stop()
    val part = new java.io.File(s"$path/data/year=2022/month=2/day=26/hour=13")
    assert(part.isDirectory, s"expected hive partition dirs under $path/data")
    // partition-pruned read-back: only hour 13 files are touched
    val back = spark.read.parquet(s"$path/data")
      .where(col("year") === 2022 && col("hour") === 13)
    assert(back.select("bytes").as[Long].collect().toSeq == Seq(50L))
  }

  test("K2: foreachBatch sink delivers every micro-batch to the batch writer") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val parsed = Speed.parseJson(in.toDF(), "value")
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = Sinks.foreachBatchSink(parsed, tmpDir("chk")) { (batch, id) =>
      seen.add(id -> batch.count())
    }.start()
    try {
      in.addData(msg("2022-02-26T00:10:00Z", "u1", "a", 1, "FB"))
      q.processAllAvailable()
      in.addData(msg("2022-02-26T00:11:00Z", "u2", "a", 2, "FB"),
        msg("2022-02-26T00:12:00Z", "u3", "a", 3, "FB"))
      q.processAllAvailable()
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    val rows = seen.asScala.toSeq.sortBy(_._1)
    assert(rows.map(_._2).sum == 3, s"all rows must reach the sink: $rows")
    assert(rows.map(_._1).distinct.size == rows.size, "batch ids distinct")
  }

  test("dedupStream: duplicate keys within the watermark horizon are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val parsed = Speed.parseJson(in.toDF(), "value")
    val dd = Speed.dedupStream(parsed, Seq("id"), "timestamp", "10 minutes")
    val q = dd.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dd_out").start()
    try {
      in.addData(msg("2022-02-26T00:00:10Z", "u1", "a", 1, "FB"))
      q.processAllAvailable()
      in.addData(
        msg("2022-02-26T00:01:00Z", "u1", "a", 2, "FB"),  // dup key u1 → drop
        msg("2022-02-26T00:01:00Z", "u2", "a", 3, "FB"))  // new key → keep
      q.processAllAvailable()
      val got = spark.table("dd_out").select("id", "bytes")
        .as[(String, Long)].collect().toSet
      assert(got == Set("u1" -> 1L, "u2" -> 3L), got.toString)
    } finally q.stop()
  }

  test("QuotaAlert: one alert per user, emitted at the crossing batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.QuotaAlert
    val in = MemoryStream[(String, Long, Long)]
    val usage = in.toDF().toDF("id", "bytes", "quota")
    val q = QuotaAlert.alerts(usage).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("alerts").start()
    try {
      in.addData(("u1", 60L, 100L), ("u2", 10L, 100L))
      q.processAllAvailable()
      assert(spark.table("alerts").count() == 0, "nobody over quota yet")
      in.addData(("u1", 50L, 100L))   // u1 total 110 > 100 → alert
      q.processAllAvailable()
      val got = spark.table("alerts").as[(String, Long, Long)].collect().toSeq
      assert(got == Seq(("u1", 110L, 100L)), got.toString)
      in.addData(("u1", 999L, 100L))  // already alerted → no duplicate
      q.processAllAvailable()
      assert(spark.table("alerts").count() == 1, "exactly one alert per user")
    } finally q.stop()
  }

  test("stream-stream join: errors correlate to clicks within the time bound") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, String)]
    val errors = MemoryStream[(Timestamp, String)]
    val joined = Speed.joinWithin(
      errors.toDF().toDF("ts", "uid"), clicks.toDF().toDF("ts", "uid"),
      keyCol = "uid", leftTs = "ts", rightTs = "ts",
      watermark = "10 seconds", within = "60 seconds")
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ss_join").start()
    try {
      clicks.addData(
        (Timestamp.valueOf("2022-02-26 00:00:00"), "u1"),
        (Timestamp.valueOf("2022-02-26 00:05:00"), "u2"))
      errors.addData(
        (Timestamp.valueOf("2022-02-26 00:00:30"), "u1"),  // 30 s after u1 click → joins
        (Timestamp.valueOf("2022-02-26 00:09:00"), "u2"),  // 4 min after u2 click → out of range
        (Timestamp.valueOf("2022-02-26 00:00:40"), "u3"))  // no click at all
      q.processAllAvailable()
      val got = spark.table("ss_join").select("uid", "r_ts")
        .as[(String, Timestamp)].collect().toSet
      assert(got == Set(("u1", Timestamp.valueOf("2022-02-26 00:00:00"))), got.toString)
    } finally q.stop()
  }

  test("J1 streaming: stream-static broadcast enrichment, then windowed agg") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val parsed = Speed.parseJson(in.toDF(), "value")
    val dim = Seq(("u1", "alice@x.io"), ("u2", "bob@x.io")).toDF("uid", "email")
    val enriched = Speed.enrichStream(parsed, dim, "id", "uid")
    val agg = Speed.windowedSumLong(enriched, col("email"), "timestamp",
      "90 seconds", "15 seconds", col("bytes"), "email_bytes_total")
    val q = agg.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("j1_stream").start()
    try {
      in.addData(
        msg("2022-02-26T00:00:10Z", "u1", "ant1", 100, "FB"),
        msg("2022-02-26T00:00:40Z", "u1", "ant2", 20, "IG"),
        msg("2022-02-26T00:00:50Z", "u2", "ant1", 5, "FB"),
        msg("2022-02-26T00:00:55Z", "u3", "ant1", 999, "FB")) // no dim row → dropped
      q.processAllAvailable()
      val got = spark.table("j1_stream").select("id", "value")
        .as[(String, Long)].collect().toSet
      assert(got == Set("alice@x.io" -> 120L, "bob@x.io" -> 5L), got.toString)
    } finally q.stop()
  }

  test("curation composes with streams: hash split is stateless and stable") {
    // the split projection is stateless (no shuffle, no state store), so it
    // runs unchanged on a stream — and a doc's split matches the batch
    // assignment exactly (reprocessing a record never moves it)
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Long]
    val q = graft.ext.Sampling.withSplit(in.toDF(), col("value"), "s1")
      .writeStream.outputMode(OutputMode.Append()).format("memory")
      .queryName("split_out").start()
    try {
      in.addData(1L to 50L: _*)
      q.processAllAvailable()
      val streamed = spark.table("split_out")
        .select("value", "split").as[(Long, String)].collect().toMap
      val batch = graft.ext.Sampling.withSplit(
          spark.range(1, 51).toDF("value"), col("value"), "s1")
        .select("value", "split").as[(Long, String)].collect().toMap
      assert(streamed == batch, "stream and batch must assign identical splits")
    } finally q.stop()
  }

  test("T4 recovery: stateful totals survive stop → offline data → restart") {
    // the exactly-once operational contract a 100 TB stream depends on:
    // kill the query, let data keep arriving, restart from the SAME
    // checkpoint — state resumes (no loss) and committed batches are not
    // re-applied (no double count). Update-mode groupBy state is unbounded
    // here (test-only); production paths bound state by watermark (Speed).
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val ckpt = tmpDir("ckpt-recovery")
    val totals = scala.collection.concurrent.TrieMap[String, Long]()
    def start() = in.toDF().toDF("k", "v")
      .groupBy("k").agg(sum(col("v")).as("total"))
      .writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", ckpt)
      .foreachBatch((df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.collect().foreach(r => totals(r.getString(0)) = r.getLong(1)))
      .start()
    val q1 = start()
    try {
      in.addData(("a", 1L), ("b", 2L)); q1.processAllAvailable()
      in.addData(("a", 10L)); q1.processAllAvailable()
    } finally q1.stop()
    assert(totals("a") == 11L && totals("b") == 2L, totals.toString)
    in.addData(("a", 100L), ("b", 20L)) // arrives while the query is down
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(totals("a") == 111L && totals("b") == 22L,
      s"recovered state must continue exact totals: $totals")
  }

  test("Replay: streaming engine reproduces the batch windowed sum exactly") {
    import java.time.LocalDateTime
    val rows = Seq[(LocalDateTime, String, Double)](
      (LocalDateTime.parse("2022-02-26T00:00:10"), "ant1", 100.5),
      (LocalDateTime.parse("2022-02-26T00:00:50"), "ant1", 49.5),
      (LocalDateTime.parse("2022-02-26T00:02:00"), "ant2", 7.0),
      (LocalDateTime.parse("2022-02-26T00:05:00"), "ant3", 1.0))
    val streamed = graft.streaming.Replay.windowedSumReplay(spark,
        rows.toDF("ts", "id", "value"),
        "90 seconds", "15 seconds", "antenna_bytes_total")
      .orderBy("timestamp", "id")
      .as[(LocalDateTime, String, Double, String)].collect().toSeq
    val batch = graft.core.Agg.windowedSum(
        rows.toDF("ts", "id", "value"), col("id"), col("ts"), "90 seconds",
        col("value"), "antenna_bytes_total")
      .orderBy("timestamp", "id")
      .as[(LocalDateTime, String, Double, String)].collect().toSeq
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(streamed.size == 3 && !streamed.exists(_._2 == graft.streaming.Replay.SentinelId))
  }

  test("Replay: streaming session windows reproduce the batch session sum") {
    import java.time.LocalDateTime
    def t(s: String) = LocalDateTime.parse(s)
    val rows = Seq[(LocalDateTime, String, Double)](
      (t("2022-02-26T00:00:10"), "u1", 1.0),
      (t("2022-02-26T00:00:40"), "u1", 2.0), // 30 s gap < 60 s → same session
      (t("2022-02-26T00:03:00"), "u1", 4.0), // 140 s gap → new session
      (t("2022-02-26T00:00:05"), "u2", 8.0))
    val streamed = graft.streaming.Replay.sessionWindowSumReplay(spark,
        rows.toDF("ts", "id", "value"), "60 seconds", "15 seconds", "sess",
        java.time.Duration.ofMinutes(10))
      .orderBy("timestamp", "id")
      .as[(LocalDateTime, String, Double, String)].collect().toSeq
    val batch = graft.core.Agg.windowedSumSession(
        rows.toDF("ts", "id", "value"), col("id"), col("ts"), "60 seconds",
        col("value"), "sess")
      .orderBy("timestamp", "id")
      .as[(LocalDateTime, String, Double, String)].collect().toSeq
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(streamed.size == 3 && streamed.map(_._3).sum == 15.0)
  }

  test("firstBreach: event-time-ordered crossing once per key, state across batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.QuotaAlert
    def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
    val in = MemoryStream[(Long, Timestamp, Long, Long)]
    val df = in.toDF().toDF("id", "ts", "seq", "v")
    val q = QuotaAlert.firstBreach(df, 100L).toDF()
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("fb_out").start()
    try {
      // batch 1 arrives OUT of event-time order: u1's 60-unit event at
      // 00:00:30 precedes the 50-unit event at 00:00:10 in ARRIVAL order.
      // The operator must sort by event time, so the crossing is at
      // 00:00:30 with cum = 110 (arrival-order folding would report the
      // same cum here but the wrong timestamp ordering semantics).
      in.addData((1L, ts("00:00:30"), 2L, 60L), (1L, ts("00:00:10"), 1L, 50L),
        (2L, ts("00:00:10"), 3L, 40L))
      q.processAllAvailable()
      val b1 = spark.table("fb_out").as[(Long, Timestamp, Long)].collect().toSet
      assert(b1 == Set((1L, ts("00:00:30"), 110L)), b1.toString)
      // batch 2: u2 crosses with carried state (40 + 70 = 110); u1 already
      // breached → no second emission despite more data.
      in.addData((2L, ts("00:01:00"), 4L, 70L), (1L, ts("00:01:30"), 5L, 999L))
      q.processAllAvailable()
      val b2 = spark.table("fb_out").as[(Long, Timestamp, Long)].collect().toSet
      assert(b2 == Set((1L, ts("00:00:30"), 110L), (2L, ts("00:01:00"), 110L)),
        b2.toString)
    } finally q.stop()
  }

  test("Replay: stream-stream join emits exactly the in-window pairs") {
    import java.time.LocalDateTime
    def t(s: String) = LocalDateTime.parse(s)
    val errors = Seq(
      (10L, t("2022-02-26T00:00:30"), 1L), // 30 s after u1's click → joins
      (11L, t("2022-02-26T00:09:00"), 2L), // 4 min after u2's click → out of range
      (12L, t("2022-02-26T00:00:40"), 3L)) // no click at all
    val clicks = Seq(
      (20L, t("2022-02-26T00:00:00"), 1L),
      (21L, t("2022-02-26T00:05:00"), 2L))
    val out = graft.streaming.Replay.joinWithinReplay(spark,
        errors.toDF("event_id", "ts", "user_id"),
        clicks.toDF("event_id", "ts", "user_id"),
        "10 seconds", "60 seconds")
      .select("event_id", "r_event_id").as[(Long, Long)].collect().toSet
    assert(out == Set((10L, 20L)), s"got $out")
  }

  test("Replay multi-batch: watermark EVICTS join state between batches, result unchanged") {
    import java.time.LocalDateTime
    def t(s: String) = LocalDateTime.parse(s)
    // four hours of one-pair-per-hour data; within = 60 s, watermark = 10 s:
    // by the time a later hour's batch runs, every earlier hour's buffered
    // state is provably dead and must be evicted — the state-lifecycle
    // behavior the single-batch replay (previous test) never executes
    val errors = (0 until 4).map(h =>
      (10L + h, t(f"2022-02-26T0$h%d:00:30"), 1L + h))
    val clicks = (0 until 4).map(h =>
      (20L + h, t(f"2022-02-26T0$h%d:00:00"), 1L + h))
    val (out, evicted) = graft.streaming.Replay.joinWithinSlicedReplay(spark,
      errors.toDF("event_id", "ts", "user_id"),
      clicks.toDF("event_id", "ts", "user_id"),
      slices = 4, "10 seconds", "60 seconds")
    val pairs = out.select("event_id", "r_event_id").as[(Long, Long)].collect().toSet
    assert(pairs == (0 until 4).map(h => (10L + h, 20L + h)).toSet, s"got $pairs")
    assert(evicted > 0, "multi-batch replay must evict retired join state")
  }

  test("Replay left outer: unmatched left rows emit null-padded on state expiry") {
    import java.time.LocalDateTime
    def t(s: String) = LocalDateTime.parse(s)
    val errors = Seq(
      (10L, t("2022-02-26T00:00:30"), 1L), // click 30 s earlier → matches
      (11L, t("2022-02-26T01:00:00"), 2L), // no click for u2 → null row
      (12L, t("2022-02-26T03:00:00"), 3L)) // last batch, no click → null row
    val clicks = Seq(
      (20L, t("2022-02-26T00:00:00"), 1L),
      (21L, t("2022-02-26T02:00:00"), 9L)) // unmatched RIGHT row: never emitted
    val (out, _) = graft.streaming.Replay.joinWithinSlicedReplay(spark,
      errors.toDF("event_id", "ts", "user_id"),
      clicks.toDF("event_id", "ts", "user_id"),
      slices = 4, "10 seconds", "60 seconds", joinType = "left_outer")
    val rows = out.where($"event_id" >= 0)
      .select("event_id", "r_event_id")
      .as[(Long, Option[Long])].collect().toSet
    // 12's state can only expire via the SENTINEL slice — a replay without
    // it would emit 10 and 11 but hold 12's null row forever
    assert(rows == Set((10L, Some(20L)), (11L, None), (12L, None)), s"got $rows")
  }

  test("T5: several concurrent streaming queries from one parsed stream") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val parsed = Speed.parseJson(in.toDF(), "value")
    val q1 = Speed.windowedSumLong(parsed, col("antenna_id"), "timestamp",
      "90 seconds", "15 seconds", col("bytes"), "antenna_bytes_total")
      .writeStream.outputMode(OutputMode.Complete()).format("memory")
      .queryName("t5_antenna").start()
    val q2 = Speed.windowedSumLong(parsed, col("app"), "timestamp",
      "90 seconds", "15 seconds", col("bytes"), "app_bytes_total")
      .writeStream.outputMode(OutputMode.Complete()).format("memory")
      .queryName("t5_app").start()
    try {
      in.addData(
        msg("2022-02-26T00:00:10Z", "u1", "ant1", 100, "FB"),
        msg("2022-02-26T00:00:20Z", "u2", "ant1", 11, "IG"))
      q1.processAllAvailable(); q2.processAllAvailable()
      assert(spark.table("t5_antenna").where(col("id") === "ant1")
        .select("value").as[Long].head() == 111L)
      assert(spark.table("t5_app").select("id", "value").as[(String, Long)]
        .collect().toSet == Set("FB" -> 100L, "IG" -> 11L))
    } finally { q1.stop(); q2.stop() }
  }

  test("Ingest: archive dedup keeps first arrival across ordered micro-batches") {
    val b0 = Seq((10L, "alpha beta"), (11L, "gamma delta"), (13L, "alpha beta"))
      .toDF("doc_id", "text") // 13 dups 10 within the same batch
    val b1 = Seq((1L, "alpha beta"), (12L, "epsilon zeta"))
      .toDF("doc_id", "text") // 1 dups 10 ACROSS batches — arrival beats id
    val dir = graft.streaming.Replay.slicedSourceReplay(spark, Seq(b0, b1),
        "doc_id BIGINT, text STRING", "ingest-spec-") { (src, dir) =>
      b0.limit(0).select(col("doc_id"),
          graft.ext.TextAnalysis.fingerprint(col("text")).as("content_fp"))
        .write.parquet(s"$dir/archive")
      graft.streaming.Ingest.dedupIngest(src, "doc_id", "text",
        s"$dir/archive", s"$dir/ckpt")
    }
    val kept = spark.read.parquet(s"$dir/archive")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(10L, 11L, 12L),
      "within-batch min id (10 over 13), earliest batch over min id (10 over 1)")
  }

  test("upsertMatview: a re-emitted window REPLACES its snapshot row") {
    def t(m: Int) = new Timestamp(1704067200000L + m * 60000L) // 2024-01-01 UTC
    // window [00:00, 01:00) gets value 1.0 in batch 0 and 2.0 more in
    // batch 1 — update mode re-emits the running total, the upsert must
    // replace (a blind append would leave both versions in the view)
    val b0 = Seq((t(5), "u", 1.0)).toDF("ts", "id", "value")
    val b1 = Seq((t(30), "u", 2.0), (t(70), "u", 5.0)).toDF("ts", "id", "value")
    val dir = graft.streaming.Replay.slicedSourceReplay(spark, Seq(b0, b1),
        "ts TIMESTAMP, id STRING, value DOUBLE", "mv-spec-") { (src, dir) =>
      val agg = Speed.windowedSum(src, col("id"), "ts", "1 hour",
        "30 seconds", col("value"), "t")
      graft.streaming.Ingest.upsertMatview(agg, Seq("timestamp", "id"),
        s"$dir/snap", s"$dir/ckpt")
    }
    val v0 = spark.read.parquet(s"$dir/snap/v=0")
      .select("value").as[Double].collect().toSeq
    assert(v0 == Seq(1.0), "batch 0 snapshot holds the partial total")
    val fin = graft.streaming.Ingest.latestSnapshot(spark, s"$dir/snap")
      .select("value").as[Double].collect().sorted.toSeq
    assert(fin == Seq(3.0, 5.0),
      "first window's row replaced with the full total, second window added")
  }

  test("upsertMatview: untouched buckets survive a batch (changed-partitions write)") {
    def t(m: Int) = new Timestamp(1704067200000L + m * 60000L) // 2024-01-01 UTC
    // both keys share window [00:00, 01:00); batch 1 re-emits key a ONLY —
    // key b's bucket must never be rewritten after v=0
    val b0 = Seq((t(5), "a", 1.0), (t(5), "b", 2.0)).toDF("ts", "id", "value")
    val b1 = Seq((t(6), "a", 10.0)).toDF("ts", "id", "value")
    val dir = graft.streaming.Replay.slicedSourceReplay(spark, Seq(b0, b1),
        "ts TIMESTAMP, id STRING, value DOUBLE", "mvpart-spec-") { (src, dir) =>
      val agg = Speed.windowedSum(src, col("id"), "ts", "1 hour",
        "30 seconds", col("value"), "t")
      graft.streaming.Ingest.upsertMatview(agg, Seq("timestamp", "id"),
        s"$dir/snap", s"$dir/ckpt", buckets = 64)
    }
    // buckets computed with the sink's own expression (deterministic)
    val pk = Seq("a", "b").toDF("id")
      .select(pmod(xxhash64(lit("2024-01-01 00:00:00").cast("timestamp"),
        col("id")), lit(64)).cast("int").as("pk")).as[Int].collect()
    val (pkA, pkB) = (pk(0), pk(1))
    assert(pkA != pkB, "fixture keys must land in distinct buckets")
    def dirs(v: Int) = new java.io.File(s"$dir/snap/v=$v").listFiles()
      .filter(_.getName.startsWith("pk=")).map(_.getName).toSet
    assert(dirs(0) == Set(s"pk=$pkA", s"pk=$pkB"), dirs(0).toString)
    assert(dirs(1) == Set(s"pk=$pkA"),
      s"batch 1 must rewrite ONLY key a's bucket: ${dirs(1)}")
    // the reader serves key b from the v=0 files batch 1 never touched
    val fin = graft.streaming.Ingest.latestSnapshot(spark, s"$dir/snap")
      .select("id", "value").as[(String, Double)].collect().toSet
    assert(fin == Set("a" -> 11.0, "b" -> 2.0), fin.toString)
  }
}
