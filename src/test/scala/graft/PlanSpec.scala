package graft

import graft.SparkEntry

/** Physical-plan assertions: the scale-critical plan shapes must not
  * regress — pushdown reaching the scan, dimensions broadcast, top-k
  * executed as partial group-limits, no full-sort for limit queries. */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("s2_hour_slice: range predicate pushes into the parquet scan") {
    val p = plan("s2_hour_slice")
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      s"expected pushed ts range:\n$p")
  }

  test("q1_pricing_summary: shipdate filter pushed, schema pruned") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"expected pushed shipdate filter:\n$p")
    assert(!p.contains("l_partkey"), s"unused columns must be pruned:\n$p")
  }

  test("q6: every predicate reaches the parquet scan") {
    val p = plan("q6_forecast_revenue")
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(p.contains(s"IsNotNull($c)") || p.contains(s"($c,"),
        s"expected $c pushed to the scan:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull("), s"expected pushed filters:\n$p")
  }

  test("joins against dimensions are broadcast, fact side never shuffles for them") {
    for (q <- Seq("a5_email_1h", "q5_local_supplier", "q10_returned_items")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q expected broadcast join:\n$p")
    }
  }

  test("q4 semi-join and aj1 anti-join plan as such") {
    assert(plan("q4_priority_semijoin").contains("LeftSemi"))
    assert(plan("aj1_customers_without_orders").contains("LeftAnti"))
  }

  test("top-k queries use TakeOrderedAndProject, not a global sort") {
    for (q <- Seq("q3_top_orders", "q10_returned_items")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"), s"$q expected top-k operator:\n$p")
    }
  }

  test("rank<=k window runs as a group-limit before the final window") {
    val p = plan("w1_top_order_per_customer")
    assert(p.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$p")
  }

  test("sp3 stratified sample: per-partition group limit bounds the shuffle at k") {
    val p = plan("sp3_stratified_sample")
    assert(p.contains("WindowGroupLimit"),
      s"expected partial WindowGroupLimit below the stratum exchange:\n$p")
  }

  test("archive layout: y/m/d/h filter becomes partition pruning, not a scan") {
    import spark.implicits._
    val msgs = Seq(
      (java.sql.Timestamp.valueOf("2022-02-26 00:10:00"), "u1", 1L),
      (java.sql.Timestamp.valueOf("2022-03-01 13:10:00"), "u2", 2L),
    ).toDF("timestamp", "id", "bytes")
    val path = tmpDir("plan_archive")
    graft.core.Sinks.writePartitionedParquet(msgs, "timestamp", path)
    val read = spark.read.parquet(path)
      .where(org.apache.spark.sql.functions.col("month") === 3)
    val p = read.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(month"),
      s"expected partition pruning on the archive layout:\n$p")
    assert(read.select("bytes").as[Long].collect().toSeq == Seq(2L))
  }

  test("windowed aggregates do partial aggregation before the shuffle") {
    val p = plan("a4_antenna_1h")
    // partial_ appears in HashAggregate(keys=..., functions=[partial_sum...])
    assert(p.contains("partial_sum"), s"expected map-side combine:\n$p")
  }

  test("text queries prune the documents scan to the referenced columns") {
    // documents carries (doc_id, text, lang, source, n_chars); the text
    // operators touch only (doc_id, text) — at 100 TB reading the other
    // three columns is pure waste
    for (q <- Seq("t1_token_count", "d1_exact_dedup", "x1_top_tokens")) {
      val p = plan(q)
      assert(!p.contains("n_chars") && !p.contains("source"),
        s"$q must not read unused document columns:\n$p")
    }
  }

  test("archive joins partition-prune dynamically from the dimension filter") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val facts = (1 to 12).map(m =>
      (java.sql.Timestamp.valueOf(f"2022-$m%02d-15 10:00:00"), s"u$m", m.toLong))
      .toDF("timestamp", "id", "bytes")
    val path = tmpDir("plan_dpp")
    graft.core.Sinks.writePartitionedParquet(facts, "timestamp", path)
    val dimPath = tmpDir("plan_dpp_dim")
    Seq((2, "keep"), (3, "keep"), (7, "drop")).toDF("m", "tag")
      .write.mode("overwrite").parquet(dimPath)
    // a real scan with a residual filter — a filtered LocalRelation folds
    // to literals and leaves no "selective predicate" for DPP to latch onto
    val dim = spark.read.parquet(dimPath).where(col("tag") === "keep")
    // the tiny fixture fails DPP's cost heuristic (pruning a KB-scale scan
    // isn't worth a subquery) — disable the stats gate to assert the
    // MECHANISM the 100 TB archive relies on
    val prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try {
      val joined = spark.read.parquet(path)
        .join(dim, col("month") === col("m"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("dynamicpruning"),
        s"expected dynamic partition pruning on the archive join:\n$p")
      assert(joined.select("bytes").as[Long].collect().toSet == Set(2L, 3L))
    } finally
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", prev)
  }

  test("d5_emb_neardup: LSH-blocked — no cartesian / nested-loop join anywhere") {
    val p = plan("d5_emb_neardup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"near-dup candidates must come from LSH buckets, not all-pairs:\n$p")
  }

  test("rj1_price_band: bucketed range join plans as a HASH join, no nested loop") {
    val p = plan("rj1_price_band")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must block on buckets, not compare all pairs:\n$p")
    assert(p.contains("HashJoin"), s"expected an equi hash join on the bucket:\n$p")
  }

  test("x1_top_tokens: explode runs above a fan-out exchange (not on one split)") {
    val p = plan("x1_top_tokens")
    val gen = p.indexOf("Generate")
    val ex = p.indexOf("Exchange RoundRobinPartitioning")
    assert(gen >= 0 && ex > gen,
      s"expected the explode ABOVE a round-robin fan-out exchange:\n$p")
  }

  test("d1_exact_dedup: fingerprint partial-agg runs above the fan-out exchange") {
    val p = plan("d1_exact_dedup")
    val ex = p.indexOf("Exchange RoundRobinPartitioning")
    assert(ex >= 0 && p.lastIndexOf("HashAggregate") < ex,
      s"expected partial hash-aggregate ABOVE the round-robin exchange:\n$p")
  }

  test("q19: disjunctive residual keeps the equi hash join — no nested loop") {
    val p = plan("q19_band_revenue")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"OR-of-conjuncts must factor the common equi-key:\n$p")
    assert(p.contains("HashJoin"), s"expected hash join on l_partkey:\n$p")
  }

  test("broadcast hints exist ONLY for fixed-size dims, never SF-scaled relations") {
    // the 100×-scale contract (round-2 verdict #1): an explicit broadcast()
    // on customer/part/threshold frames would OOM the driver at scale —
    // those joins must carry NO hint (AQE decides); nation/region keep
    // theirs. Counted on the ANALYZED plan, where every hint is visible.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    def hints(name: String): Int =
      SparkEntry.queries(name)(spark, sf).queryExecution.analyzed
        .collect { case h: ResolvedHint => h }.size
    for (q <- Seq("q3_top_orders", "q13_order_distribution", "q14_promo_share",
        "q17_small_qty_revenue", "q18_large_orders"))
      assert(hints(q) == 0, s"$q must leave join strategy to AQE")
    assert(hints("q5_local_supplier") == 2, "q5: exactly region + nation hinted")
    assert(hints("q10_returned_items") == 1, "q10: exactly nation hinted")
  }

  test("q11: the global scalar reuses the per-part exchange — one lineitem scan") {
    // finalized adaptive plan (collect, not count — repo invariant)
    val df = SparkEntry.queries("q11_important_parts")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("FileScan parquet".r.findAllIn(p).length == 1,
      s"two-pass global-scalar must scan lineitem once:\n$p")
    assert(p.contains("ReusedExchange"), s"expected reused exchange:\n$p")
  }

  test("round-6 TPC-H: correlated shapes stay hash joins — no cartesian anywhere") {
    for (q <- Seq("q2_min_cost_offer", "q7_volume_shipping", "q8_market_share",
        "q9_product_profit", "q16_supplier_variety", "q20_excess_shippers")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q must not plan a cartesian:\n$p")
    }
    // q15/q22 carry exactly one benign 1-row-scalar nested-loop each (the
    // q11 pattern); the data joins around them stay keyed
    for (q <- Seq("q15_top_supplier", "q22_idle_balances")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q must not plan a cartesian:\n$p")
      assert("BroadcastNestedLoopJoin".r.findAllIn(p).length <= 1,
        s"$q: only the 1-row scalar may nested-loop:\n$p")
    }
    assert(plan("q16_supplier_variety").contains("LeftAnti"),
      "q16: the complaint-filter stand-in is an anti join")
    assert(plan("q20_excess_shippers").contains("LeftSemi"),
      "q20: supplier reduction is a semi join")
    assert(plan("q22_idle_balances").contains("LeftAnti"),
      "q22: the no-recent-orders test is an anti join")
  }

  test("cur3: blocklist screen is a broadcast anti join — corpus never shuffles") {
    val p = plan("cur3_domain_filter")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"expected broadcast LEFT ANTI against the bounded blocklist:\n$p")
  }

  test("q15/q20: the correlated threshold costs ONE lineitem scan") {
    // finalized adaptive plans (collect, not count — repo invariant).
    // q15: rev + its global max share the per-supplier exchange (the q11
    // pattern — kept alive by comparing with >=, not =; an extracted
    // equality equi-join breaks the canonical match and doubles the scan).
    // maxScans = lineitem ONCE + each dimension once.
    val q15 = SparkEntry.queries("q15_top_supplier")(spark, sf)
    q15.collect()
    val p15 = q15.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p15.contains("ReusedExchange"),
      s"q15: rev + max must share the per-supplier exchange:\n$p15")
    assert("FileScan parquet".r.findAllIn(p15).length <= 2,
      s"q15: lineitem once + supplier once:\n$p15")
    // q20: the per-part total is a WINDOW over the per-pair aggregate —
    // single consumer chain, one fact scan by construction (lineitem,
    // part, supplier, nation = 4 scans, nothing twice)
    val q20 = SparkEntry.queries("q20_excess_shippers")(spark, sf)
    q20.collect()
    val p20 = q20.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("FileScan parquet".r.findAllIn(p20).length <= 4,
      s"q20: each table scanned at most once:\n$p20")
    assert(p20.contains("Window"), s"q20: per-part total must be a window:\n$p20")
    // q2: correlated min as a window for the same reason — the offers
    // join tree ends in broadcast joins (no exchange boundary), so a
    // min-agg + join-back would read EVERY table twice (it did: 8 scans)
    val q2 = SparkEntry.queries("q2_min_cost_offer")(spark, sf)
    q2.collect()
    val p2 = q2.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("FileScan parquet".r.findAllIn(p2).length <= 5,
      s"q2: lineitem/part/supplier/nation/region each scanned once:\n$p2")
    assert(p2.contains("Window"), s"q2: per-part min must be a window:\n$p2")
  }

  test("dpp1: the fact scan carries a dynamic-pruning partition filter") {
    // the campaign constraint lives in dimension DATA, so the only way it
    // can prune the day-partitioned fact scan is the DPP subquery — a
    // static PartitionFilter on day would mean constraint inference leaked
    // the filter and the demonstration proves nothing
    val p = plan("dpp1_partition_pruned_join")
    assert(p.contains("dynamicpruningexpression"),
      s"expected dynamicpruning in the fact's PartitionFilters:\n$p")
  }
}
