package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables.t

/** The analytics query surface the reference delegates to BigQuery
  * (reference README.md:2 — "data warehouse" is the query engine; see
  * /root/repo/SURVEY.md §2.5-2.6). Re-expressed Spark-first: declarative
  * DataFrame plans, Catalyst pushes filters/prunes columns to the parquet
  * scan, small dimensions are broadcast, big joins shuffle on their keys.
  *
  * Determinism contract (for the DuckDB oracle): every query ends in a
  * total-order sort, float aggregates are rounded to 4 decimals, all
  * computed columns are aliased identically here and in the oracle SQL.
  */
object Warehouse {

  /** Revenue expression used throughout: extendedprice discounted. */
  private def revenue: Column = col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** Q1-style pricing summary: full scan + hash aggregate.
    * At 100 TB this is a map-side partial agg on 5x2 groups — no skew,
    * shuffle carries only |groups| x partial rows. */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum("l_extendedprice"), 4).as("sum_base_price"),
        round(sum(revenue), 4).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Selective filter + narrow projection: the point is pushdown — the
    * parquet scan must show PushedFilters on l_shipdate/l_discount and a
    * 5-column ReadSchema. */
  def q02FilterProject(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-02-01").cast("timestamp") &&
              col("l_discount") >= 0.08)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), round(revenue, 4).as("net_price"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Q3-style shipping priority: customer ⋈ orders ⋈ lineitem.
    * customer is small relative to lineitem → broadcast; orders⋈lineitem
    * shuffles on orderkey. Top-10 via TakeOrderedAndProject (no full sort). */
  def q03ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord  = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li   = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(round(sum(revenue), 4).as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(10)
  }

  /** Q4-style order priority check: EXISTS decorrelated to a left-semi
    * join on orderkey (shuffle-hash/SMJ on the join key — no row blowup). */
  def q04OrderPriority(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1996-07-01").cast("timestamp"))
    val late = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
    ord.join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** Q5-style local-supplier revenue: the full star join. region/nation/
    * supplier/customer are dimensions → broadcast them all; only
    * lineitem⋈orders is a real shuffle. */
  def q05RegionRevenue(s: SparkSession, dir: String): DataFrame = {
    val region = t(s, dir, "region").filter(col("r_name").isin("ASIA", "AMERICA"))
    val nation = t(s, dir, "nation")
    val cust   = t(s, dir, "customer")
    val supp   = t(s, dir, "supplier")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1998-01-01").cast("timestamp"))
    val li = t(s, dir, "lineitem")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust),
        col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(revenue), 4).as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))
  }

  /** Q6-style forecast: pure scan + filter + global agg — everything
    * pushes to parquet row-group pruning; one partial+final sum. */
  def q06ForecastRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp") &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4).as("revenue"),
           count(lit(1)).as("n_rows"))

  /** Top-k with tiebreak: Spark plans TakeOrderedAndProject — a per-
    * partition heap + driver merge, no global sort even at 100 TB. */
  def q07TopOrders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(10)

  /** Window functions: rank orders within each customer. Single shuffle
    * on o_custkey serves both window specs (same partitioning). */
  def q08WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .withColumn("prev_price",
        round(coalesce(lag("o_totalprice", 1).over(w), lit(0.0)), 4).as("prev_price"))
      .filter(col("rn") <= 2 && col("o_custkey") < 100)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
              round(col("o_totalprice"), 4).as("price"), col("prev_price"))
      .orderBy("o_custkey", "rn")
  }

  /** ROLLUP with grouping-set indicator — partial aggs reused across
    * grouping sets by Spark's Expand operator. */
  def q09Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  /** Set operations: EXCEPT/INTERSECT compile to aggregate/semi-join
    * shapes, each a single shuffle on the full row. */
  def q10SetOps(s: SparkSession, dir: String): DataFrame = {
    val ord = t(s, dir, "orders")
    val big   = ord.filter(col("o_totalprice") > 400000).select("o_custkey").distinct()
    val early = ord.filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select("o_custkey").distinct()
    val both     = big.intersect(early).withColumn("tag", lit("both"))
    val bigOnly  = big.except(early).withColumn("tag", lit("big_only"))
    both.union(bigOnly)
      .select(col("tag"), col("o_custkey").as("custkey"))
      .orderBy("tag", "custkey")
  }

  /** Anti join: customers with no 1995 orders. Broadcast the filtered
    * orders key set when it fits; else shuffle-anti on custkey. */
  def q11AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val ord95 = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1996-01-01").cast("timestamp"))
    t(s, dir, "customer")
      .join(ord95, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** Distinct aggregates: exact distinct forces a two-phase agg (expand
    * on the distinct column); at scale prefer approx_count_distinct —
    * benchmarked separately because it has no exact oracle. */
  def q12DistinctAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** 20-minute tumbling window over the events stream table (reference
    * normalization.py:142-165 does this with a wall-clock loop; here it
    * is one declarative window aggregate — see SURVEY.md §2.7 C3). */
  def q13EventsTumbling(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(window(col("ts"), "20 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("w_start", "event_type")

  /** Flagship: the reference's normalize stage (normalization.py:81-107)
    * as one declarative plan — parse the JSON props column, project the
    * whitelisted field, aggregate per tumbling window. from_json is
    * PERMISSIVE: malformed rows become nulls, the pipeline survives
    * (reference retrieval.py:104-113 semantics). */
  def q14NormalizeEvents(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val propsSchema = StructType(Seq(StructField("k", LongType)))
    t(s, dir, "events")
      .withColumn("p", from_json(col("props"), propsSchema))
      .select(col("ts"), col("event_type"), col("p.k").as("k"))
      .filter(col("k").isNotNull)
      .groupBy(window(col("ts"), "20 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"), col("sum_k"))
      .orderBy("w_start", "event_type")
  }

  /** GROUP BY + HAVING: big customers by order count. */
  def q15Having(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 4).as("total"))
      .filter(col("n_orders") >= 15)
      .orderBy(desc("n_orders"), asc("o_custkey"))

  /** Exact interpolated percentiles per group (Spark `percentile` ≡
    * DuckDB `quantile_cont`). Exact percentile sorts per group — at
    * 100 TB switch to `approx_percentile` (t-digest, mergeable partial
    * aggs); benchmarked here exact because the oracle must hash-match. */
  def q16Percentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
        round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** CUBE over (order year, priority) — all four grouping sets from one
    * scan via Spark's Expand; grouping_id() keys the oracle compare. */
  def q17Cube(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .cube("o_year", "o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 4).as("total"))
      .select(
        coalesce(col("o_year"), lit(0)).as("yr"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy("yr", "priority")

  /** Explicit GROUPING SETS — the asymmetric case cube/rollup can't
    * express: (year, priority), (year), (priority) but NOT the grand
    * total. One scan, one Expand (3 replicas), one shuffle;
    * grouping_id() disambiguates the null-as-ALL encoding. */
  def q30GroupingSets(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").withColumn("o_year", year(col("o_orderdate")))
    o.groupingSets(
        Seq(Seq(col("o_year"), col("o_orderpriority")),
          Seq(col("o_year")), Seq(col("o_orderpriority"))),
        col("o_year"), col("o_orderpriority"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n"), round(sum("o_totalprice"), 4).as("total"))
      .select(
        coalesce(col("o_year"), lit(0)).as("yr"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("gid"), col("n"), col("total"))
      .orderBy("gid", "yr", "priority")
  }

  /** Top-3 orders per priority through the CUSTOM top-k-per-group
    * operator (graft.plans.TopKPerGroup): bounded per-group heaps with
    * a map-side partial pass, instead of Window's full shuffle + group
    * sort. The (price desc, key asc) order is total, so the result is
    * deterministic and exactly oracle-checkable. */
  def q31TopKPerGroup(s: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerGroup.topKPerGroup(
        t(s, dir, "orders").select("o_orderpriority", "o_orderkey", "o_totalprice"),
        Seq("o_orderpriority"),
        Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 3)
      .orderBy("o_orderpriority", "o_orderkey")

  /** Q8-style market share: fraction of yearly revenue supplied from
    * one region. Two aggregates from one scan via conditional sums. */
  def q21MarketShare(s: SparkSession, dir: String): DataFrame = {
    val asiaNations = t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val supp = t(s, dir, "supplier")
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"), "left_semi")
      .select(col("s_suppkey")).withColumn("is_asia", lit(1))
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"), "left")
      .withColumn("o_year", year(col("o_orderdate")))
      .groupBy("o_year")
      .agg(
        round(sum(when(col("is_asia") === 1, revenue).otherwise(0.0)), 4).as("asia_rev"),
        round(sum(revenue), 4).as("total_rev"),
        count(lit(1)).as("n_items"))
      .withColumn("share",
        floor(col("asia_rev") / col("total_rev") * lit(1e4) + lit(0.5)) / lit(1e4))
      .orderBy("o_year")
  }

  /** String-predicate pushdown: LIKE '%PROMO%' must reach the parquet
    * scan as a StringContains filter; revenue per brand for those parts. */
  def q22StringMatch(s: SparkSession, dir: String): DataFrame = {
    val brass = t(s, dir, "part").filter(col("p_type").contains("PROMO"))
    t(s, dir, "lineitem")
      .join(broadcast(brass), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), round(sum(revenue), 4).as("rev"))
      .orderBy("p_brand")
  }

  /** Monthly order trend: date_trunc rollup — the partition-pruning
    * granularity a dt=YYYY-MM layout would give at 100 TB. */
  def q23MonthlyTrend(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM")
        .as("month"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 4).as("total"))
      .orderBy("month")

  /** Q22-style: high-balance customers with no orders at all. The
    * threshold is an average over integer cents (exact in double below
    * 2^53 → deterministic vs the oracle); the dormancy check is a
    * left-anti join on recent order keys.
    *
    * The scalar threshold stays IN the plan as a broadcast 1-row
    * aggregate crossJoin (the [[Sampling.rangeShardManifest]] pattern) —
    * no driver `collect()`, so the whole query is one job with no hard
    * boundary. No positive balances → NULL threshold → the comparison is
    * NULL → empty result, exactly the oracle's NULL semantics. */
  def q24DormantRich(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer")
    val thresh = cust.filter(col("c_acctbal") > 0.0)
      .agg(avg(floor(col("c_acctbal") * 100 + 0.5)).as("t"))
    val recent = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-06-01").cast("timestamp"))
    cust
      .crossJoin(broadcast(thresh))
      .filter(floor(col("c_acctbal") * 100 + 0.5) > col("t"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal"), 4).as("acctbal"))
      .orderBy("c_custkey")
  }

  /** Running-frame window aggregates: cumulative revenue per customer in
    * order-date order, plus rank-family functions (percent_rank, ntile).
    * The running sum accumulates in the SAME deterministic order on both
    * engines (total-order ORDER BY in the frame), so even the float
    * partial sums match bitwise. */
  def q27RunningWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(asc("o_orderdate"), asc("o_orderkey"))
    t(s, dir, "orders")
      .filter(col("o_custkey") < 50)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 4)
          .as("running_total"),
        round(percent_rank().over(w), 6).as("pr"),
        ntile(4).over(w).as("quartile"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Multiset set ops (EXCEPT ALL / INTERSECT ALL): unlike q10's
    * distinct forms, these preserve duplicate counts — Spark plans them
    * as a count-difference aggregate + generate, one shuffle each. */
  def q26MultisetOps(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val cheap = li.filter(col("l_quantity") < 10).select("l_partkey")
    val ret   = li.filter(col("l_returnflag") === "R").select("l_partkey")
    cheap.exceptAll(ret).withColumn("tag", lit("cheap_minus_returned"))
      .union(cheap.intersectAll(ret).withColumn("tag", lit("both")))
      .groupBy("tag", "l_partkey").agg(count(lit(1)).as("n"))
      .orderBy("tag", "l_partkey")
  }

  /** PIVOT: event counts as a month × type crosstab. The value list is
    * explicit, so Spark skips the extra distinct-values job and the
    * plan is a single hash aggregate with conditional counts. */
  def q25Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("month", date_format(date_trunc("month", col("ts")), "yyyy-MM"))
      .groupBy("month")
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0L)
      .orderBy("month")

  /** HLL++ approximate distinct — the 100 TB form of q12: mergeable
    * constant-size sketches instead of the exact two-phase expand.
    * Sketch INTERNALS are engine-specific, so the raw estimate has no
    * SQL oracle — instead the query emits the exact counts plus the
    * ε-band verdicts `abs(approx − exact) ≤ ε·exact` with ε = 0.15
    * (3× the sketch's default 5% relative standard deviation), and the
    * DuckDB oracle reproduces the exact counts and asserts the
    * verdicts literally TRUE — so a drifting estimate now hash-FAILS
    * the driver compare instead of hiding behind rows-only. The exact
    * countDistinct lives here only to band the sketch; at 100 TB you
    * run the sketch alone (q12 is the exact twin).
    *
    * Band validity is PER-SF: ε = 3× the sketch's rsd makes a false
    * red astronomically unlikely but SF-dependent in principle —
    * validated at sf0.001/0.01/0.1. At an unvalidated scale, treat a
    * red verdict as "re-validate the band first", not immediately as
    * an engine bug (same note on q32). */
  def q20ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        (abs(approx_count_distinct(col("l_suppkey")) -
             countDistinct(col("l_suppkey"))).cast("double")
          <= lit(0.15) * countDistinct(col("l_suppkey"))).as("supp_ok"),
        (abs(approx_count_distinct(col("l_partkey")) -
             countDistinct(col("l_partkey"))).cast("double")
          <= lit(0.15) * countDistinct(col("l_partkey"))).as("part_ok"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** q32: the mergeable-sketch percentile path q16's scaladoc promises
    * for 100 TB — `approx_percentile` (Greenwald-Khanna / Karnin-Lang-
    * Liberty style summaries): constant-size partial aggregates that
    * merge associatively, vs q16's exact per-group sort. Sketch
    * internals are engine-specific, so the raw estimate has no SQL
    * oracle — instead the query emits the exact percentiles plus the
    * rank-band verdicts `approx_pct(p) ∈ [exact_pct(p−δ),
    * exact_pct(p+δ)]` with δ = 0.02 (200× the sketch's theoretical
    * 1/accuracy = 10⁻⁴ rank-error bound at accuracy 10000), and the
    * DuckDB oracle reproduces the exact values and asserts the
    * verdicts literally TRUE — a drifting sketch hash-FAILS instead of
    * hiding behind rows-only. q16 is the exact twin. Bands validated
    * per benchmarked SF (see q20's note): at an unvalidated scale a
    * red verdict means "re-validate the band", not yet "engine bug". */
  def q32ApproxPercentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      // ONE exact-percentile aggregate per column (array form — the
      // value-counts map builds once and serves all three points)
      // instead of three independent aggregates each building its own
      // map: same values bit-for-bit, 6 exact-percentile buffers → 2.
      // Measured honest (noop-drive) cost 4.37 s → the array form is
      // the shape a 100 TB bracket-verification would run.
      .agg(
        expr("percentile(l_quantity, array(0.48, 0.5, 0.52))").as("qp"),
        expr("percentile(l_extendedprice, array(0.88, 0.9, 0.92))")
          .as("pp"),
        expr("approx_percentile(l_quantity, 0.5, 10000)").as("aq"),
        expr("approx_percentile(l_extendedprice, 0.9, 10000)").as("ap"),
        count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"),
        round(col("qp")(1), 4).as("median_qty"),
        round(col("pp")(1), 4).as("p90_price"),
        col("aq").between(col("qp")(0), col("qp")(2)).as("median_ok"),
        col("ap").between(col("pp")(0), col("pp")(2)).as("p90_ok"),
        col("n_rows"))
      .orderBy("l_returnflag")

  /** q33: SCD2-style validity intervals — each customer's order
    * history as slowly-changing-dimension rows: [valid_from, valid_to)
    * per (status, price) observation, open-ended (null valid_to) for
    * the latest. The standard warehouse change-capture shape: ONE
    * shuffle on the entity key, `lead()` over the per-entity timeline —
    * no self-join (the naive formulation joins each row to its
    * successor; at 100 TB that is a second shuffle and a row blowup on
    * entities with many versions). */
  def q33Scd2Intervals(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc,
      col("o_orderkey").asc)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 4).as("price"), col("o_orderdate"))
      .withColumn("valid_from",
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("valid_to",
        date_format(lead(col("o_orderdate"), 1).over(w), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("is_current", lead(col("o_orderdate"), 1).over(w).isNull)
      .select("o_custkey", "o_orderkey", "o_orderstatus", "price",
        "valid_from", "valid_to", "is_current")
      .orderBy("o_custkey", "valid_from", "o_orderkey")
  }

  /** q34: CDC snapshot compaction — the latest event per user, the
    * "merge a change stream into a snapshot" kernel of every
    * incremental table format (argmax by event time, ties to the
    * highest event_id). Routed through the [[graft.plans.TopKPerGroup]]
    * plan with k=1: the per-key cap is enforced in the map-side partial
    * pass, so a hot entity that dominates the change log (the exact
    * case compaction exists for) contributes ONE row per input
    * partition to the shuffle, not its whole history — a window over
    * user_id would carry every version to the reducer first. */
  def q34LatestSnapshot(s: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerGroup.topKPerGroup(
        t(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            round(col("value"), 4).as("value"),
            date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts")),
        Seq("user_id"),
        Seq("ts" -> false, "event_id" -> false), k = 1)
      .orderBy("user_id")

  /** q35: ordered funnel analysis over the event stream — how many
    * users progressed view → click → purchase IN THAT ORDER (each
    * stage's timestamp strictly after the previous stage's first
    * occurrence), the product-analytics query the reference's
    * delegated BigQuery surface exists to answer. Output is the
    * 3-row stage summary (stage, step, n_users, conv_frac vs stage 1).
    *
    * Scale shape: three user-keyed min aggregates chained by
    * equi-joins on user_id — each frame is user-cardinality (never
    * event-cardinality) after its aggregate, the joins co-locate on
    * the same key so AQE reuses the partitioning, and nothing ever
    * collects a per-user event list (the collect_list formulation
    * dies on a hot user; this one's per-stage state is one timestamp).
    * Fully dialect-portable SQL — the oracle runs VERBATIM in Spark. */
  def q35Funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select("user_id", "event_type", "ts")
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("tv"))
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts") > col("tv"))
      .groupBy("user_id").agg(min("ts").as("tc"))
    val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts") > col("tc"))
      .groupBy("user_id").agg(min("ts").as("tp"))
    // Global agg per stage (not groupBy over literals): an empty stage
    // must still emit its 0-count row, matching the oracle's scalar
    // count(*) which always produces one row per stage.
    def stageRow(df: DataFrame, stage: Int, step: String): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(stage).as("stage"), lit(step).as("step"), col("n_users"))
    val stages = stageRow(v, 1, "view")
      .unionByName(stageRow(c, 2, "click"))
      .unionByName(stageRow(p, 3, "purchase"))
    val all = Window.partitionBy()
    stages
      .withColumn("conv_frac",
        floor((col("n_users").cast("double") /
          max(col("n_users")).over(all).cast("double")) * lit(1e4)
          + lit(0.5)) / lit(1e4))
      .orderBy("stage")
  }

  /** q36: cohort retention — users grouped by first-activity DAY
    * (the cohort), then for each day offset k, how many of the cohort
    * were active k days later and what fraction of the cohort that
    * is. The companion to q35 in the product-analytics pair the
    * reference's delegated warehouse exists for.
    *
    * Scale shape: one user-keyed min aggregate (the cohort
    * assignment), one distinct over (user, active-day) — both
    * event-stream shuffles on keys that can share the exchange — and
    * an equi-join of the day-level activity back to the
    * user-cardinality cohort frame; the final (cohort, offset) frame
    * is calendar-sized, not data-sized. Day arithmetic is pure
    * integer (datediff), so the whole output is integer counts + one
    * r4 division — dialect-portable, the oracle runs VERBATIM. */
  def q36CohortRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohorts = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
    val active = ev.distinct()
    val sizes = cohorts.groupBy("cohort_day")
      .agg(count(lit(1)).as("cohort_n"))
    active.join(cohorts, "user_id")
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"),
        col("user_id"))
      .distinct()
      .groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "cohort_day")
      .select(
        date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset"), col("n_active"), col("cohort_n"),
        (floor((col("n_active").cast("double") /
          col("cohort_n").cast("double")) * lit(1e4) + lit(0.5)) / lit(1e4))
          .as("retention"))
      .orderBy("cohort_day", "day_offset")
  }

  /** Sliding windows (20-minute length, 5-minute slide): every event
    * contributes to 4 overlapping windows — Spark's `window()` plans an
    * Expand (4 rows per event) before the aggregate, which is also the
    * 100 TB-correct shape (shuffle carries window-assigned partials). */
  def q29Sliding(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Windows.slidingCounts(t(s, dir, "events"))
      .select(
        date_format(col("w_start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"))
      .orderBy("w_start", "event_type")

  /** The custom-state path (graft.streaming.Stateful.runningUserStats,
    * `mapGroupsWithState`) run on a BOUNDED frame: each group folds once
    * and emits its final state, which must equal a plain aggregate —
    * this pins the stateful operator's semantics to a SQL oracle. */
  def q28StatefulBatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val events = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[graft.streaming.UserEvent]
    graft.streaming.Stateful.runningUserStats(events).toDF()
      .groupBy("user_id")
      // batch mode emits one row per group; max() collapses the frame
      // without assuming that (and keeps the plan a plain aggregate)
      .agg(max("n_events").as("n_events"),
        round(max("total_cents") / 100.0, 4).as("total_value"),
        date_format(max("last_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("last_ts"))
      .orderBy("user_id")
  }

  /** Session windows over the events table — the one genuinely stateful
    * window shape (SURVEY.md §7 "hard parts"). Runs the SAME transform
    * as the streaming path (graft.streaming.Windows.sessionCounts) on a
    * bounded frame; `session_window` merges events within the gap, the
    * window end is last-event + gap. */
  def q19Sessions(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Windows.sessionCounts(t(s, dir, "events"), "10 minutes")
      .select(col("user_id"),
        date_format(col("w_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("w_start"),
        date_format(col("w_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("w_end"),
        col("n"))
      .orderBy("user_id", "w_start")

  /** Correlated scalar subquery (orders above 1.5× their customer's
    * average), decorrelated the way Catalyst would — one window avg over
    * the customer key, no join at all.
    *
    * Float determinism: the average is taken over integer cents
    * (`floor(price*100+0.5)`) — integral doubles sum exactly below 2^53
    * in any engine regardless of accumulation order, so the filter and
    * the displayed average are bit-stable vs the oracle. */
  def q18AboveCustomerAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
    val r4 = (c: Column) => floor(c * lit(1e4) + lit(0.5)) / lit(1e4)
    t(s, dir, "orders")
      .withColumn("cents", floor(col("o_totalprice") * 100 + 0.5))
      .withColumn("avg_cents", avg("cents").over(w))
      .filter(col("cents") > col("avg_cents") * 1.5)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 4).as("price"),
        r4(col("avg_cents") / 100).as("cust_avg"))
      .orderBy("o_orderkey")
  }
}
