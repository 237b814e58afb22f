package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{Num, Tables}

/** Analytics breadth over the TPC-H-ish tables: the same operator classes
  * the reference exercises (scan → filter → join → aggregate) plus the
  * standard warehouse operators a complete engine needs (top-k, semi/anti
  * joins, window functions, rollup, set ops). Everything is declarative
  * DataFrame API — Catalyst handles pushdown, pruning, join selection.
  *
  * Scale notes (100 TB):
  *  - `lineitem`/`orders`/`events` are the big fact tables; every query
  *    aggregates or filters them BEFORE any join that can't be broadcast.
  *  - `nation` (25 rows) and `region` (5 rows) are FIXED-size dimensions —
  *    always broadcast, explicitly hinted.
  *  - `customer`/`supplier`/`part` are SF-SCALED (they grow linearly with
  *    the data, ~1/10 to ~1/40 of orders' rows): a forced `broadcast()`
  *    hint would bypass the auto-broadcast threshold AND AQE and build a
  *    multi-GB driver-side relation at 100× — so they carry NO hint. AQE
  *    still chooses broadcast-hash-join at small SF (runtime size stats)
  *    and degrades gracefully to shuffle join at scale.
  *  - Top-k goes through `orderBy().limit(k)` which Spark executes as
  *    TakeOrderedAndProject — per-partition heaps + driver merge of k rows,
  *    never a global sort of the fact table.
  */
object Analytics {
  import Tables._

  /** Timestamp columns of the TPC-H-ish tables surface as TIMESTAMP_NTZ
    * (zone-less data, UTC sessions); a no-op if the reader already inferred
    * NTZ. Keeps output schemas identical to the zone-less oracle. */
  private def ntz(df: DataFrame, cols: String*): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast("timestamp_ntz")))

  /** TPC-H Q1-style pricing summary: one pass over lineitem, partial-agg
    * collapses to ≤|flag×status| groups before the shuffle. */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame =
    lineitem(spark, sfDir)
      .where(col("l_shipdate") <= lit("2000-12-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Num.dsum(col("l_quantity")).as("sum_qty"),
        Num.dsum(col("l_extendedprice")).as("sum_base_price"),
        Num.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        Num.davg(col("l_quantity")).as("avg_qty"),
        Num.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style top-k: filter both fact sides early, join the filtered
    * customer keys (no hint — customer is SF-scaled, AQE picks broadcast
    * when the filtered side is small), aggregate, then
    * TakeOrderedAndProject. */
  def topUnshippedOrders(spark: SparkSession, sfDir: String, segment: String = "BUILDING",
                         cutoff: String = "1998-06-01", k: Int = 10): DataFrame = {
    val cust = customer(spark, sfDir).where(col("c_mktsegment") === segment)
      .select("c_custkey")
    val ord = ntz(orders(spark, sfDir), "o_orderdate")
      .where(col("o_orderdate") < lit(cutoff))
    val li = lineitem(spark, sfDir).where(col("l_shipdate") > lit(cutoff))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(Num.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(k)
  }

  /** TPC-H Q4-style order-priority count via LEFT SEMI join (EXISTS):
    * orders with at least one lineitem shipped after the order date. */
  def orderPriorityCount(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = orders(spark, sfDir)
    val li = lineitem(spark, sfDir).select("l_orderkey", "l_shipdate")
    ord.join(li,
        ord("o_orderkey") === li("l_orderkey") && li("l_shipdate") > ord("o_orderdate"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q5-style local-supplier volume: full snowflake join — lineitem
    * shuffles once (to orders); the fixed dims (region, nation) are
    * broadcast-hinted, the SF-scaled sides (customer, supplier) are left
    * to AQE so the plan survives a 100× scale-up. */
  def localSupplierVolume(spark: SparkSession, sfDir: String,
                          regionName: String = "ASIA"): DataFrame = {
    val reg = region(spark, sfDir).where(col("r_name") === regionName)
    val nat = nation(spark, sfDir)
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = customer(spark, sfDir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_nationkey").as("cn_key"), col("n_name"))
    val supp = supplier(spark, sfDir).select("s_suppkey", "s_nationkey")
    val ord = orders(spark, sfDir).select("o_orderkey", "o_custkey")
    lineitem(spark, sfDir)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp,
        col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("cn_key"))
      .groupBy(col("n_name"))
      .agg(Num.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("n_name"))
  }

  /** TPC-H Q10-style returned-item report: top 20 customers by lost revenue. */
  def returnedItemReport(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    val li = lineitem(spark, sfDir).where(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val ord = orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val cust = customer(spark, sfDir)
    val nat = nation(spark, sfDir).select("n_nationkey", "n_name")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(Num.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(k)
  }

  /** Analytic window function: each customer's single largest order
    * (row_number over a per-customer ordering). */
  def topOrderPerCustomer(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey")
  }

  /** Exact per-(flag, status) partials for the grouping-set queries: the
    * rollup/cube Expand operator multiplies its INPUT by the number of
    * grouping sets, so expand a 6-row pre-aggregate, not the fact table.
    * Decimal partials re-aggregate exactly (associative), so results are
    * identical to a direct rollup/cube over lineitem. */
  private def flagStatusPartials(spark: SparkSession, sfDir: String): DataFrame =
    lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(Num.dsumDec(col("l_extendedprice")).as("rev_dec"),
        count(lit(1)).as("n_part"))

  private def sentinelProject(df: DataFrame): DataFrame =
    df.select(
      coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
      coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
      col("revenue"), col("n"))
      .orderBy("returnflag", "linestatus")

  /** ROLLUP aggregate with null keys folded to a sentinel so ordering and
    * hashing are engine-agnostic. */
  def revenueRollup(spark: SparkSession, sfDir: String): DataFrame =
    sentinelProject(
      flagStatusPartials(spark, sfDir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("rev_dec")).cast("double").as("revenue"),
          sum(col("n_part")).as("n")))

  /** GROUPING SETS aggregate — the general form rollup/cube specialize: an
    * explicit mix of grouping levels, here {(flag, status), (status), ()} —
    * the (flag) marginal is deliberately absent, so neither ROLLUP nor CUBE
    * can express it. Same cost discipline as [[revenueRollup]]: the Expand
    * (one row copy per grouping set) runs over the |flag×status|-sized
    * PARTIAL aggregate, never the fact table — at any fact scale the
    * multi-level pass costs one extra shuffle of a few dozen rows. */
  def revenueGroupingSets(spark: SparkSession, sfDir: String): DataFrame =
    sentinelProject(
      flagStatusPartials(spark, sfDir)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("rev_dec")).cast("double").as("revenue"),
          sum(col("n_part")).as("n")))

  /** Set operation: customers with open ('O') orders that never had a
    * finished ('F') order — EXCEPT has distinct-set semantics. */
  def openNotFinishedCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = orders(spark, sfDir)
    ord.where(col("o_orderstatus") === "O").select("o_custkey")
      .except(ord.where(col("o_orderstatus") === "F").select("o_custkey"))
      .orderBy("o_custkey")
  }

  /** Distinct aggregation: per-flag distinct part count (two-phase distinct
    * aggregate — Catalyst plans partial distinct before the shuffle). */
  def distinctPartsPerFlag(spark: SparkSession, sfDir: String): DataFrame =
    lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** Pivot: customers per (nation × market segment) as a wide table. Pivot
    * values are enumerated explicitly so the plan is a single pass of
    * conditional aggregates (no extra job to discover values). */
  val Segments: Seq[String] =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  def customersByNationSegment(spark: SparkSession, sfDir: String): DataFrame =
    customer(spark, sfDir)
      .groupBy("c_nationkey")
      .pivot("c_mktsegment", Segments)
      .agg(count(lit(1)))
      .na.fill(0L, Segments)
      .orderBy("c_nationkey")

  /** CUBE aggregate (all grouping-set combinations) over the pre-aggregated
    * partials, null keys folded to a sentinel. */
  def revenueCube(spark: SparkSession, sfDir: String): DataFrame =
    sentinelProject(
      flagStatusPartials(spark, sfDir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("rev_dec")).cast("double").as("revenue"),
          sum(col("n_part")).as("n")))

  /** Date arithmetic: ship-delay histogram in whole days, computed on epoch
    * seconds so both engines bucket identically. */
  def shipDelayHistogram(spark: SparkSession, sfDir: String): DataFrame =
    lineitem(spark, sfDir)
      .join(orders(spark, sfDir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select((
        (unix_timestamp(col("l_shipdate").cast("timestamp")) -
          unix_timestamp(col("o_orderdate").cast("timestamp"))) / 86400L)
        .cast("long").as("delay_days"))
      .groupBy("delay_days")
      .agg(count(lit(1)).as("n"))
      .orderBy("delay_days")

  /** Scalar string-function surface: regexp extraction, case mapping,
    * length, concat — one projection, fully codegen'd. */
  def partBrandParse(spark: SparkSession, sfDir: String): DataFrame =
    part(spark, sfDir).select(
      col("p_partkey"),
      regexp_extract(col("p_brand"), "(\\d+)", 1).cast("int").as("brand_num"),
      upper(col("p_type")).as("type_upper"),
      length(col("p_name")).cast("long").as("name_len"),
      concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy("p_partkey")

  /** TPC-H Q6-style forecast revenue: the purest pushdown shape — every
    * predicate (timestamp range, numeric range, threshold) reaches the
    * parquet row-group stats, no join, single global aggregate whose
    * partials collapse to one row per partition before the 1-row shuffle. */
  def forecastRevenue(spark: SparkSession, sfDir: String): DataFrame =
    lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(Num.dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))
      .orderBy("revenue")

  /** TPC-H Q12-style conditional aggregation: one join, then CASE-driven
    * pivoting of order priorities into two counters per line status —
    * the conditional-sum shape every report query leans on. */
  def priorityShippingCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitem(spark, sfDir)
      .join(orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .where(col("l_shipdate") > col("o_orderdate"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** TPC-H Q14-style promo share: ratio of two exact-decimal conditional
    * sums over one broadcast-enriched scan; the division happens ONCE in
    * double space at the very end so both engines agree bit-for-bit. */
  def promoRevenueShare(spark: SparkSession, sfDir: String): DataFrame = {
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1997-07-01"))
      .join(part(spark, sfDir).select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) * Num.dsumDec(when(col("p_type") === "PROMO", disc).otherwise(lit(0.0)))
          .cast("double") / Num.dsumDec(disc).cast("double")).as("promo_share"))
      .orderBy("promo_share")
  }

  /** TPC-H Q17-style correlated threshold: lineitems below 20% of their
    * part's average quantity. The correlated scalar subquery re-expressed
    * the scale-correct way — ONE pre-aggregation builds every per-part
    * threshold (map-side combine, |parts| rows out) joined back against
    * the fact scan; a correlated rescan per outer row would read lineitem
    * |parts| times. The threshold side is SF-scaled (|parts| rows) so it
    * carries no broadcast hint — AQE broadcasts it while it fits and falls
    * back to a shuffle join at scale, where both sides already hash on
    * l_partkey. The threshold average is exact-decimal divided once in
    * double space, so the qualifying row set is engine-identical. */
  def smallQuantityRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val thresholds = lineitem(spark, sfDir)
      .groupBy(col("l_partkey").as("t_partkey"))
      .agg(Num.davg(col("l_quantity")).as("avg_qty"))
    lineitem(spark, sfDir)
      .join(thresholds, col("l_partkey") === col("t_partkey"))
      .where(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((Num.dsumDec(col("l_extendedprice")).cast("double") / lit(7.0))
        .as("avg_yearly"))
      .orderBy("avg_yearly")
  }

  /** Lag window: days since the customer's previous order — the
    * lead/lag analytic class. One shuffle on the partition key, one sort
    * within partitions; first order per customer yields null. */
  def orderGaps(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    ntz(orders(spark, sfDir), "o_orderdate")
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), col("prev_date")).cast("long").as("gap_days"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Ordered set aggregation: the part keys of each order as one sorted
    * comma-joined string. collect_list is UNORDERED in a distributed
    * engine — any aggregation that exposes a list MUST impose an explicit
    * order (sort_array here) or the result is partitioning-dependent; the
    * string join makes it hash-comparable across engines. */
  def orderPartLists(spark: SparkSession, sfDir: String, maxOrderKey: Long = 1000): DataFrame =
    lineitem(spark, sfDir)
      .where(col("l_orderkey") <= maxOrderKey)
      .groupBy("l_orderkey")
      .agg(array_join(sort_array(collect_list(col("l_partkey"))), ",").as("part_keys"),
        count(lit(1)).as("n_items"))
      .orderBy("l_orderkey")

  /** Exact percentiles (sort-based, per group) — values rounded so the
    * interpolation's last-ulp differences across engines can't flake.
    * Scale note: exact `percentile` buffers each group's values; it is fine
    * up to ~10⁷ rows per group. At 100 TB switch to
    * `approx_percentile(col, p, accuracy)` (bounded-memory GK sketch,
    * mergeable across partitions) — not graded here because sketch results
    * are implementation-defined and no cross-engine oracle can match them
    * value-for-value. */
  def quantityPercentiles(spark: SparkSession, sfDir: String): DataFrame =
    lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("med_qty"),
        round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90_price"))
      .orderBy("l_returnflag")

  /** TPC-H Q13-style left-outer distribution: orders per customer INCLUDING
    * the zero-order customers, then the histogram of those counts. The
    * status predicate lives in the JOIN CONDITION — as a post-filter it
    * would silently delete every zero-order customer (the null-extended
    * rows), which is the classic outer-join bug this query pins down.
    * Scale: one shuffle join (customer ⋈ orders on custkey), two cheap
    * aggregations whose partials collapse to |customers| then |distinct
    * counts| rows. */
  def orderCountDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = customer(spark, sfDir).select("c_custkey")
    val ord = orders(spark, sfDir).select("o_custkey", "o_orderkey", "o_orderstatus")
    cust.join(ord,
        cust("c_custkey") === ord("o_custkey") && ord("o_orderstatus") =!= "P",
        "left_outer")
      .groupBy(cust("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count")) // count(col) skips nulls → 0
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("c_count"))
  }

  /** TPC-H Q11-style global-scalar HAVING: parts whose revenue exceeds
    * `factor` × the MEAN per-part revenue. The global scalar comes from a
    * second aggregation over the same per-part pre-aggregate — Catalyst
    * reuses the exchange, so lineitem is scanned and shuffled ONCE — and
    * attaches as a 1-row broadcast nested-loop join (the x2_tfidf pattern),
    * never a per-row rescan. A mean-relative threshold stays meaningful at
    * every scale factor (a fixed fraction-of-total goes empty as |parts|
    * grows). Exact-decimal partials; the double cast and the threshold
    * compare happen once, identically in both engines. */
  def importantParts(spark: SparkSession, sfDir: String,
                     factor: Double = 1.3): DataFrame = {
    val perPart = lineitem(spark, sfDir)
      .groupBy(col("l_partkey"))
      .agg(Num.dsumDec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("rev_dec"))
    val global = perPart.agg(sum(col("rev_dec")).as("total_dec"),
      count(lit(1)).as("n_parts"))
    perPart.crossJoin(broadcast(global))
      .where(col("rev_dec").cast("double") >
        lit(factor) * col("total_dec").cast("double") / col("n_parts"))
      .select(col("l_partkey"), col("rev_dec").cast("double").as("revenue"))
      .orderBy("l_partkey")
  }

  /** Full-outer set reconciliation: per-customer order counts of two year
    * snapshots FULL OUTER joined on the customer key, each row classified
    * by its null pattern — `added` (only in the new snapshot), `removed`
    * (only in the old), `changed` (both, different counts), `same`. The
    * diff/CDC-report shape; both sides aggregate BEFORE the join, so the
    * full-outer join runs at |customers| scale, not |orders|. */
  def customerActivityDiff(spark: SparkSession, sfDir: String,
                           yearOld: Int = 1996, yearNew: Int = 1997): DataFrame = {
    val ord = orders(spark, sfDir)
    def snapshot(y: Int, key: String, n: String): DataFrame =
      ord.where(year(col("o_orderdate")) === y)
        .groupBy(col("o_custkey").as(key)).agg(count(lit(1)).as(n))
    snapshot(yearOld, "k_old", "n_old")
      .join(snapshot(yearNew, "k_new", "n_new"),
        col("k_old") === col("k_new"), "full_outer")
      .select(
        coalesce(col("k_old"), col("k_new")).as("custkey"),
        when(col("k_old").isNull, "added")
          .when(col("k_new").isNull, "removed")
          .when(col("n_old") =!= col("n_new"), "changed")
          .otherwise("same").as("status"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .orderBy("custkey")
  }

  /** Frame-based window aggregation: per-customer RUNNING total of order
    * value (rows unbounded-preceding..current — the cumulative-frame class,
    * distinct from w1/w2's row_number/lag which carry no frame) plus the
    * customer's within-history quartile via ntile. The running sum
    * accumulates in exact decimal: a double frame sum is associated in
    * whatever order the engine's window algorithm chooses (running
    * accumulator vs segment tree), so only exact arithmetic is
    * engine-portable. One shuffle on the partition key, one sort. */
  def runningOrderTotals(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(30, 6)))
          .over(frame).cast("double").as("running_total"),
        ntile(4).over(w).as("quartile"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Set operation: customers holding BOTH open and finished orders —
    * INTERSECT (distinct-set semantics), completing the set-op family
    * next to [[openNotFinishedCustomers]]' EXCEPT. */
  def openAndFinishedCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = orders(spark, sfDir)
    ord.where(col("o_orderstatus") === "O").select("o_custkey")
      .intersect(ord.where(col("o_orderstatus") === "F").select("o_custkey"))
      .orderBy("o_custkey")
  }

  /** TPC-H Q18-style large-volume orders: aggregate the fact table, keep
    * keys over the HAVING threshold, then join BACK to the dimensions for
    * the report — the aggregate-then-enrich shape. The per-order quantity
    * aggregate collapses map-side to |orders| rows before its shuffle; the
    * join back to orders/customer is keyed on the already-aggregated
    * (small) side. */
  def largeVolumeOrders(spark: SparkSession, sfDir: String,
                        minQty: Double = 250.0): DataFrame = {
    val big = lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg(Num.dsum(col("l_quantity")).as("total_qty"))
      .where(col("total_qty") > minQty)
    big
      .join(ntz(orders(spark, sfDir), "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
  }

  /** TPC-H Q21-flavored chained quantifiers: orders where EVERY lineitem
    * shipped after the order date — EXISTS(late) AND NOT EXISTS(on-time),
    * i.e. a left-semi and a left-anti join chained on the same fact with
    * opposite residual conditions, counted by priority. */
  def fullyLateOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = orders(spark, sfDir)
    val li = lineitem(spark, sfDir).select("l_orderkey", "l_shipdate")
    ord
      .join(li, ord("o_orderkey") === li("l_orderkey") &&
        li("l_shipdate") > ord("o_orderdate"), "left_semi")
      .join(li, ord("o_orderkey") === li("l_orderkey") &&
        li("l_shipdate") <= ord("o_orderdate"), "left_anti")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q19-style disjunctive-predicate join: an OR of conjunctive
    * (brand, size-band, quantity-band) clauses as the join residual. The
    * optimizer test here is join-strategy survival: every disjunct shares
    * the l_partkey = p_partkey equi-key, so Catalyst plans a HASH join
    * with the OR as a post-join residual (PlanSpec asserts no cartesian) —
    * a planner that can't factor the common key degenerates to a
    * nested-loop over the fact table. */
  def disjunctiveBandRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    def band(brand: String, szLo: Int, szHi: Int, qLo: Int, qHi: Int) =
      col("p_brand") === brand && col("p_size").between(szLo, szHi) &&
        col("l_quantity").between(qLo, qHi)
    lineitem(spark, sfDir)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .join(part(spark, sfDir).select("p_partkey", "p_brand", "p_size"),
        col("l_partkey") === col("p_partkey") &&
          (band("Brand#4", 1, 10, 1, 15) || band("Brand#2", 11, 25, 10, 30) ||
            band("Brand#19", 26, 50, 20, 40)))
      .agg(Num.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy("revenue")
  }

  /** Sketch-based approximate aggregates — the bounded-memory answer to
    * pct1/cd1-style questions at 100 TB: HyperLogLog++ (approx_count_
    * distinct) and the GK quantile sketch (approx_percentile) are
    * fixed-size and MERGEABLE across partitions, where exact countDistinct
    * shuffles every distinct value and exact percentile buffers whole
    * groups. Sketch outputs are implementation-defined (engine-specific
    * hash/merge details), so NO cross-engine value oracle can match them —
    * graded by BOUND assertions instead (ExtSpec): HLL within a few
    * relative standard deviations of the exact count, the quantile sketch
    * within its rank-error guarantee of the exact quantile neighborhood.
    * The graded entry is rows-only for the same reason. */
  def approxStats(spark: SparkSession, sfDir: String, rsd: Double = 0.05): DataFrame =
    lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), rsd).as("approx_parts"),
        expr("approx_percentile(l_quantity, 0.5, 10000)").as("approx_med_qty"),
        expr("approx_percentile(l_extendedprice, 0.9, 10000)").as("approx_p90_price"))
      .orderBy("l_returnflag")

  /** Anti join (NOT EXISTS): customers with no pending ('P') order, counted
    * by segment. */
  def customersWithoutOrders(spark: SparkSession, sfDir: String): DataFrame =
    customer(spark, sfDir)
      .join(orders(spark, sfDir).where(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")

  // ---- TPC-H breadth, round 6: the remaining classic shapes, adapted to
  // the testdata schema (no partsupp table — the observed DISTINCT
  // (l_partkey, l_suppkey) relation in lineitem stands in for it; no
  // s_comment/c_phone — acctbal predicates stand in for the string
  // filters). Each exercises a distinct plan shape the suite lacked. -----

  /** Fixed-size dimension: suppliers of one region with their nation name —
    * nation/region are broadcast-hinted (fixed 25/5 rows); supplier itself
    * is SF-scaled and carries no hint. */
  private def regionSuppliers(spark: SparkSession, sfDir: String,
                              regionName: String): DataFrame = {
    val reg = region(spark, sfDir).where(col("r_name") === regionName)
    val nat = nation(spark, sfDir)
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    supplier(spark, sfDir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name", "s_acctbal", "n_name")
  }

  /** TPC-H Q2-style minimum-cost offer: for every STANDARD-type part, the
    * EUROPE suppliers whose offer price equals the part's minimum offer
    * price in that region. The correlated-min subquery rides as a WINDOW
    * min over the offers relation — min over doubles is exact (no
    * summation), so the equality match is engine-identical, and the
    * single-consumer formulation keeps ONE scan of every table (a min
    * pre-aggregate joined back would give the offers join tree two
    * consumers; broadcast joins have no exchange boundary to reuse, so the
    * whole tree — lineitem included — would be read twice; PlanSpec pins
    * the scan count). Offers are filtered by part type and supplier region
    * BEFORE the window's partkey shuffle; the final TakeOrdered keeps k
    * rows. Reference shape: TPC-H Q2 with lineitem standing in for
    * partsupp (no partsupp table in the testdata). */
  def minCostOffer(spark: SparkSession, sfDir: String,
                   regionName: String = "EUROPE", pType: String = "STANDARD",
                   k: Int = 100): DataFrame = {
    val prt = part(spark, sfDir).where(col("p_type") === pType)
      .select("p_partkey")
    val offers = lineitem(spark, sfDir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice").as("cost"))
      .join(prt, col("l_partkey") === col("p_partkey"))
      .join(regionSuppliers(spark, sfDir, regionName),
        col("l_suppkey") === col("s_suppkey"))
    offers
      .withColumn("min_cost", min(col("cost"))
        .over(Window.partitionBy("l_partkey")))
      .where(col("cost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"), col("cost"))
      .distinct()
      .orderBy(col("s_acctbal").desc, col("p_partkey"), col("s_name"))
      .limit(k)
  }

  /** TPC-H Q7-style volume shipping: revenue flowing between two nations
    * (supplier side ↔ customer side, both directions) by ship year. The
    * nation filters push into the supplier/customer joins BEFORE the fact
    * join, so the big join runs over pre-shrunk sides; nation is broadcast
    * (fixed), customer/supplier carry no hint (SF-scaled, AQE decides). */
  def volumeShipping(spark: SparkSession, sfDir: String,
                     nationA: String = "NATION_1", nationB: String = "NATION_2")
      : DataFrame = {
    val nat = nation(spark, sfDir)
      .where(col("n_name").isin(nationA, nationB))
      .select("n_nationkey", "n_name")
    val supp = supplier(spark, sfDir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = customer(spark, sfDir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(orders(spark, sfDir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .where(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(Num.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q8-style market share: of all PROMO-part revenue sold to ASIA
    * customers per order year, the fraction supplied by one nation — the
    * conditional-sum-ratio-over-snowflake shape. Both numerator and
    * denominator accumulate in exact decimal from the SAME aggregate pass;
    * the single double division at the end is engine-identical. */
  def marketShare(spark: SparkSession, sfDir: String,
                  custRegion: String = "ASIA", shareNation: String = "NATION_2",
                  pType: String = "PROMO"): DataFrame = {
    val reg = region(spark, sfDir).where(col("r_name") === custRegion)
    val natC = nation(spark, sfDir)
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val cust = customer(spark, sfDir)
      .join(broadcast(natC), col("c_nationkey") === col("cn_key"))
      .select("c_custkey")
    val supp = supplier(spark, sfDir)
      .join(broadcast(nation(spark, sfDir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val disc = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    lineitem(spark, sfDir)
      .join(part(spark, sfDir).where(col("p_type") === pType).select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      .join(orders(spark, sfDir)
          .where(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1998-01-01"))
          .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((Num.dsumDec(when(col("supp_nation") === shareNation, disc)
          .otherwise(lit(0.0))).cast("double") /
        Num.dsumDec(disc).cast("double")).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q9-style product-type profit by supplier nation and order year.
    * Profit per lineitem = discounted revenue − 10% of the part's retail
    * price × quantity (p_retailprice stands in for ps_supplycost — no
    * partsupp table). The part-name filter prunes the part join side before
    * anything joins the fact table; exact-decimal amount sums. */
  def productProfit(spark: SparkSession, sfDir: String,
                    nameToken: String = "red"): DataFrame = {
    val prt = part(spark, sfDir).where(col("p_name").contains(nameToken))
      .select("p_partkey", "p_retailprice")
    val supp = supplier(spark, sfDir)
      .join(broadcast(nation(spark, sfDir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val amount = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
      lit(0.1) * col("p_retailprice") * col("l_quantity")
    lineitem(spark, sfDir)
      .join(prt, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(orders(spark, sfDir).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(Num.dsum(amount).as("sum_profit"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  /** TPC-H Q15-style top supplier: per-supplier revenue over one quarter,
    * keeping the supplier(s) whose revenue equals the global maximum. The
    * scalar max attaches as a 1-row broadcast nested-loop over the SAME
    * per-supplier pre-aggregate, compared with `>=` rather than `=` —
    * semantically identical against a maximum (rev ≤ max always, ties
    * kept), but an equality predicate is extracted into an equi-join whose
    * rewritten branch no longer canonical-matches the other consumer, and
    * the exchange-reuse that makes this a ONE-lineitem-scan plan (the q11
    * pattern; PlanSpec pins ReusedExchange) is lost. The comparison is on
    * the exact DECIMAL sums, never rounded doubles, so ties and the match
    * are engine-identical. */
  def topSupplier(spark: SparkSession, sfDir: String,
                  from: String = "1997-01-01", until: String = "1997-04-01")
      : DataFrame = {
    // explicit isNotNull on the group key: the supplier equi-join infers
    // it into the JOIN branch's scan only, which would de-canonicalize the
    // two consumers of the rev exchange and double the lineitem scan (the
    // d3 inferred-filter problem in join form; a no-op on TPC-H data)
    val rev = lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit(from) && col("l_shipdate") < lit(until) &&
        col("l_suppkey").isNotNull)
      .groupBy(col("l_suppkey"))
      .agg(Num.dsumDec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("rev_dec"))
    val top = rev.agg(max(col("rev_dec")).as("max_dec"))
    rev.crossJoin(broadcast(top))
      .where(col("rev_dec") >= col("max_dec"))
      .join(supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev_dec").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q16-style supplier variety: how many distinct suppliers serve
    * each (brand, type, size) bucket, over the observed DISTINCT
    * (l_partkey, l_suppkey) relation (the partsupp stand-in), excluding one
    * brand, off-list sizes, and negative-balance suppliers (the s_comment
    * complaint filter stand-in) via LEFT ANTI join. Distinct-collapse
    * happens BEFORE the part join; the count-distinct aggregate is
    * two-phase (partial distinct before the shuffle). */
  def supplierVariety(spark: SparkSession, sfDir: String,
                      excludeBrand: String = "Brand#5",
                      sizes: Seq[Int] = Seq(1, 5, 10, 15, 20, 25, 30, 35, 40, 45))
      : DataFrame = {
    val rel = lineitem(spark, sfDir).select("l_partkey", "l_suppkey").distinct()
      .join(supplier(spark, sfDir).where(col("s_acctbal") < 0)
          .select("s_suppkey"),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
    rel.join(part(spark, sfDir)
          .where(col("p_brand") =!= excludeBrand &&
            col("p_size").isin(sizes.map(Integer.valueOf): _*))
          .select("p_partkey", "p_brand", "p_type", "p_size"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q20-style excess shippers: suppliers in one nation who shipped
    * more than `share` of some red-named part's total 1997 volume — the
    * correlated-threshold + semijoin-chain shape. The per-part total rides
    * as a WINDOW sum over the per-(part, supplier) pre-aggregate (the
    * x2_tfidf df pattern) instead of a second aggregate + self-join — so
    * the filtered fact relation has exactly ONE consumer, lineitem is
    * scanned once BY CONSTRUCTION (no exchange-reuse needed; PlanSpec pins
    * the scan count), and the only extra cost is a partkey shuffle of the
    * already-collapsed pair relation. The threshold compares exact decimal
    * sums cast to double once, identically in both engines; the supplier
    * table is reduced by LEFT SEMI join (no row multiplication). */
  def excessShippers(spark: SparkSession, sfDir: String,
                     namePrefix: String = "red", nationName: String = "NATION_7",
                     share: Double = 0.2): DataFrame = {
    val prt = part(spark, sfDir).where(col("p_name").startsWith(namePrefix))
      .select("p_partkey")
    val perPair = lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(prt, col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(Num.dsumDec(col("l_quantity")).as("pair_qty"))
    val heavy = perPair
      .withColumn("part_qty", sum(col("pair_qty"))
        .over(Window.partitionBy("l_partkey")))
      .where(col("pair_qty").cast("double") >
        lit(share) * col("part_qty").cast("double"))
      .select("l_suppkey")
    val nat = nation(spark, sfDir).where(col("n_name") === nationName)
      .select("n_nationkey")
    supplier(spark, sfDir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  /** TPC-H Q22-style idle balances: customers richer than the global
    * average positive balance with no RECENT order (none since `cutoff` —
    * TPC-H's "no orders in 7 years" window; in this corpus every customer
    * has SOME order, so an all-time test would be vacuous), counted and
    * summed per nation. The global average is a 1-row broadcast scalar
    * (computed exactly: decimal sum / count, divided once in double); the
    * no-recent-orders test is a LEFT ANTI join whose build side is the
    * date-filtered orders key column (the filter pushes to the scan). */
  def idleBalances(spark: SparkSession, sfDir: String,
                   cutoff: String = "1999-01-01"): DataFrame = {
    val cust = customer(spark, sfDir)
    val avgPos = cust.where(col("c_acctbal") > 0)
      .agg(Num.davg(col("c_acctbal")).as("avg_bal"))
    cust.crossJoin(broadcast(avgPos))
      .where(col("c_acctbal") > col("avg_bal"))
      .join(orders(spark, sfDir).where(col("o_orderdate") >= lit(cutoff))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), Num.dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy("c_nationkey")
  }
}
