package graft

import org.apache.spark.sql.functions._
import graft.core.{Layout, Tables}

/** Bucketed-layout plans: the write-once-shuffle-never-again contract.
  * Plan assertions follow the repo invariant — run collect() and read the
  * FINALIZED plan, never the initial one. */
class LayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Finalized executed-plan text (post-AQE, final section only). */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  /** Count REAL key exchanges: a ReusedExchange line textually references
    * the original ("ReusedExchange [...], Exchange hashpartitioning(...)"),
    * so a raw substring count double-counts it. */
  private def keyExchanges(plan: String): Int =
    plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bucketed equi-join and keyed aggregation run with ZERO exchanges") {
    Layout.writeBucketed(Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderpriority"),
      "orders_bkt", "o_orderkey", numBuckets = 4)
    Layout.writeBucketed(Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice"),
      "lineitem_bkt", "l_orderkey", numBuckets = 4)
    // disable broadcast so the join must prove co-location, not hide
    // behind a small-table broadcast
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table("lineitem_bkt")
        .join(spark.table("orders_bkt"), col("l_orderkey") === col("o_orderkey"))
        .select("o_orderkey", "o_orderpriority", "l_quantity")
      val jp = finalPlan(joined)
      assert(jp.contains("SortMergeJoin"), jp)
      assert(!jp.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$jp")

      val agg = spark.table("lineitem_bkt")
        .groupBy("l_orderkey").agg(sum(col("l_quantity")).as("q"))
      val ap = finalPlan(agg)
      assert(!ap.contains("Exchange"),
        s"aggregation on the bucket key must not shuffle:\n$ap")
    }
    // same data, same results as the unbucketed plan
    val viaBuckets = spark.table("lineitem_bkt")
      .groupBy("l_orderkey").agg(sum(col("l_quantity")).as("q"))
    val direct = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey").agg(sum(col("l_quantity")).as("q"))
    assert(viaBuckets.exceptAll(direct).isEmpty && direct.exceptAll(viaBuckets).isEmpty)
  }

  test("bucket pruning: an equality filter on the bucket key reads ONE bucket") {
    // the scan-side complement of the zero-Exchange join: a point lookup
    // on the bucket column hashes to its bucket and skips the other files
    Layout.writeBucketed(Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice"), "orders_prune_bkt", "o_orderkey", 4)
    // auto-bucketed-scan turns the bucketed read off when no join/agg
    // needs the distribution — pin it on so the PRUNING mechanism (the
    // thing a point-lookup on a 100 TB bucketed table relies on) is
    // observable in the plan
    withConf("spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
      val q = spark.table("orders_prune_bkt").where(col("o_orderkey") === 42L)
      val p = finalPlan(q)
      assert(p.contains("SelectedBucketsCount: 1 out of 4"),
        s"expected a single selected bucket:\n$p")
    }
  }

  test("clusterBy: identical consumers share ONE exchange (and pruning divergence breaks it)") {
    val li = Layout.clusterBy(Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity"), "l_orderkey", 4)
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // identical subplans on both sides → one exchange + ReusedExchange,
      // and the join itself adds no exchange (both sides pre-clustered)
      val self = li.as("x").join(li.as("y"), "l_orderkey")
      val p = finalPlan(self)
      assert(p.contains("ReusedExchange"), s"expected exchange reuse:\n$p")
      assert(keyExchanges(p) == 1, s"exactly one key exchange for both sides:\n$p")

      // the documented caveat: consumers pruning DIFFERENT columns get
      // different subplans — two exchanges, no reuse (use writeBucketed
      // or persist for divergent consumers)
      val wide = Layout.clusterBy(Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_quantity", "l_extendedprice"), "l_orderkey", 4)
      val a = wide.groupBy("l_orderkey").agg(sum(col("l_quantity")).as("sq"))
      val b = wide.groupBy("l_orderkey").agg(sum(col("l_extendedprice")).as("sp"))
      val dp = finalPlan(a.join(b, "l_orderkey"))
      assert(keyExchanges(dp) == 2 && !dp.contains("ReusedExchange"),
        s"pruning divergence must yield two exchanges (caveat pin):\n$dp")
    }
  }

  test("zorderKey interleaves bits exactly") {
    import spark.implicits._
    def morton(a: Long, b: Long): Long =
      (0 until 32).foldLeft(0L) { (z, i) =>
        z | ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
      }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (10L, 6L),
      (0xffffffffL, 0L), (0L, 0xffffffffL), (0xffffffffL, 0xffffffffL),
      (123456789L, 987654321L))
    val got = cases.toDF("a", "b")
      .select(Layout.zorderKey(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    assert(got == cases.map((morton _).tupled),
      s"got $got expected ${cases.map((morton _).tupled)}")
  }

  test("zo1 staging: the 2-D range scan skips row groups; a round-robin layout cannot") {
    // the GRADED zo1 path's skipping, asserted from real scan metrics: the
    // z-ordered files put footer min/max rectangles around the data, so the
    // pushed range predicate lets the parquet reader skip whole row groups;
    // the same data written round-robin gives every row group near-full
    // min/max envelopes on both keys — nothing skips, every row is read
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_linenumber",
      "l_partkey", "l_quantity", "l_extendedprice")
    val total = li.count()
    val m = li.agg(max(col("l_orderkey")), max(col("l_partkey"))).head
    val (okHi, pkHi) = (m.getLong(0), m.getLong(1))
    val zdir = tmpDir("zo1-skip") + "/z"
    val rdir = tmpDir("zo1-skip") + "/r"
    Layout.writeZOrdered(li, "l_orderkey", "l_partkey", zdir, files = 16)
    li.repartition(16).write.parquet(rdir)
    def rowsScanned(dir: String): Long = {
      val df = spark.read.parquet(dir)
        .where(col("l_orderkey").between(okHi / 4, okHi / 2) &&
          col("l_partkey").between(pkHi / 4, pkHi / 2))
      df.collect() // no exchange → non-adaptive plan; metrics are final
      val scan = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head
      assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual"),
        s"range predicate must push into the scan: ${scan.metadata("PushedFilters")}")
      scan.metrics("numOutputRows").value
    }
    val (zRows, rRows) = (rowsScanned(zdir), rowsScanned(rdir))
    assert(rRows == total, s"round-robin layout must read every row: $rRows of $total")
    assert(zRows * 2 <= total,
      s"z-layout must skip at least half the row groups: read $zRows of $total")
  }

  test("z-ordered layout prunes files on BOTH dimensions; single sort only on one") {
    import spark.implicits._
    // a full 256×256 grid: every file of a perfect z-layout covers a
    // rectangle; a single-column sort covers thin x-slices spanning all y
    val grid = spark.range(0, 65536L, 1, 8)
      .select(($"id" % 256).as("x"), ($"id" / 256).cast("long").as("y"))
    val zdir = tmpDir("z-layout") + "/z"
    val sdir = tmpDir("z-layout") + "/s"
    Layout.writeZOrdered(grid, "x", "y", zdir, files = 16)
    grid.withColumn("__k", col("x"))
      .repartitionByRange(16, col("__k")).sortWithinPartitions("__k")
      .drop("__k").write.parquet(sdir)
    // per-file (min, max) envelopes per dimension, via the files themselves
    def envelopes(dir: String, c: String): Seq[(Long, Long)] =
      spark.read.parquet(dir)
        .groupBy(input_file_name()).agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
        .select("lo", "hi").as[(Long, Long)].collect().toSeq
    def filesMatching(env: Seq[(Long, Long)], v: Long) =
      env.count { case (lo, hi) => lo <= v && v <= hi }
    // point predicates across the domain: the z-layout reads a strict
    // subset of files on EITHER dimension; the x-sorted layout prunes x
    // but reads EVERY file for a y predicate (footer min/max spans all y)
    for (v <- Seq(3L, 100L, 200L, 255L)) {
      assert(filesMatching(envelopes(zdir, "x"), v) <= 8, s"z x=$v")
      assert(filesMatching(envelopes(zdir, "y"), v) <= 8, s"z y=$v")
      assert(filesMatching(envelopes(sdir, "y"), v) == 16, s"sort y=$v reads all")
    }
  }
}
