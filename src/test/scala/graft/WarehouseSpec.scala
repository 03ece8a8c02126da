package graft

import org.apache.spark.sql.functions._
import graft.operators.Warehouse

class WarehouseSpec extends SparkSuite {
  import spark.implicits._

  test("q01 groups are the 6 (returnflag, linestatus) combinations") {
    val out = Warehouse.q01PricingSummary(spark, sf).collect()
    assert(out.length == 6)
    assert(out.map(r => (r.getString(0), r.getString(1))).distinct.length == 6)
  }

  test("results are invariant to shuffle partition count (batch invariance)") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      val p1 = Warehouse.q05RegionRevenue(spark, sf).collect().toSeq
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val p7 = Warehouse.q05RegionRevenue(spark, sf).collect().toSeq
      assert(p1 == p7)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("q07 top-k equals full sort head") {
    val topk = Warehouse.q07TopOrders(spark, sf).collect().map(_.getLong(0)).toSeq
    val full = Tables.t(spark, sf, "orders")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .select("o_orderkey").as[Long].collect().take(10).toSeq
    assert(topk == full)
  }

  test("q10 set ops: both/big_only partition the big-spender set") {
    val out = Warehouse.q10SetOps(spark, sf).collect()
    val both = out.filter(_.getString(0) == "both").map(_.getLong(1)).toSet
    val bigOnly = out.filter(_.getString(0) == "big_only").map(_.getLong(1)).toSet
    assert(both.intersect(bigOnly).isEmpty)
    val big = Tables.t(spark, sf, "orders")
      .filter(col("o_totalprice") > 400000).select("o_custkey")
      .distinct().as[Long].collect().toSet
    assert(both.union(bigOnly) == big)
  }

  test("q14 flagship parses props and aggregates per window (entry path)") {
    val out = SparkEntry.entry(spark)
    assert(out.count() > 0)
    // sum_k over all windows == sum of parsed k over raw events
    val total = Warehouse.q14NormalizeEvents(spark, sf)
      .agg(sum("sum_k")).as[Long].collect().head
    val raw = Tables.t(spark, sf, "events")
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .agg(sum("k")).as[Long].collect().head
    assert(total == raw)
  }

  test("q32 exact columns equal q16; sketch verdicts hold in-band") {
    val exact = Warehouse.q16Percentiles(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3))).toSeq
    val banded = Warehouse.q32ApproxPercentiles(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getBoolean(3), r.getBoolean(4), r.getLong(5))).toSeq
    // the exact columns reproduce q16 bit-for-bit (same percentile expr)
    assert(banded.map(b => (b._1, b._2, b._3, b._6)) == exact)
    // and the GK sketch at accuracy 10000 sits inside the ±0.02 rank band
    banded.foreach { case (f, _, _, medianOk, p90Ok, _) =>
      assert(medianOk && p90Ok, s"$f: sketch drifted out of the rank band")
    }
  }

  test("q02 plan pushes filters down to the parquet scan") {
    val plan = Warehouse.q02FilterProject(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("l_shipdate") || plan.contains("l_discount")),
      s"expected parquet pushdown in plan:\n$plan")
  }

  test("q33 SCD2 intervals chain per customer, exactly one current version") {
    val rows = Warehouse.q33Scd2Intervals(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(4), Option(r.getString(5)),
        r.getBoolean(6)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cust, hist) =>
      // already in (valid_from, orderkey) order; each row's valid_to is
      // the NEXT row's valid_from, and only the final row is open-ended
      hist.init.zip(hist.tail).foreach { case (cur, next) =>
        assert(cur._3.contains(next._2),
          s"cust $cust: interval chain broken at ${cur._2}")
        assert(!cur._4, s"cust $cust: non-final row marked current")
      }
      assert(hist.last._3.isEmpty && hist.last._4,
        s"cust $cust: final version must be open-ended and current")
    }
  }

  test("q35 funnel ≡ Scala ordered-sequence recomputation; stages monotone") {
    val ev = graft.Tables.t(spark, sf, "events")
      .select("user_id", "event_type", "ts").collect()
      .map { r =>
        val i = r.getTimestamp(2).toInstant // keep MICROS, not just ms
        (r.getLong(0), r.getString(1),
          i.getEpochSecond * 1000000L + i.getNano / 1000L)
      }
    val byUser = ev.groupBy(_._1)
    def firstAfter(u: Long, tpe: String, after: Long): Option[Long] =
      byUser.getOrElse(u, Array.empty)
        .filter(e => e._2 == tpe && e._3 > after)
        .map(_._3).minOption
    val tv = byUser.keys.flatMap(u => firstAfter(u, "view", Long.MinValue)
      .map(u -> _)).toMap
    val tc = tv.flatMap { case (u, t) => firstAfter(u, "click", t).map(u -> _) }
    val tp = tc.flatMap { case (u, t) => firstAfter(u, "purchase", t).map(u -> _) }
    def r4d(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val expected = Seq(
      (1, "view", tv.size.toLong, r4d(1.0)),
      (2, "click", tc.size.toLong, r4d(tc.size.toDouble / tv.size)),
      (3, "purchase", tp.size.toLong, r4d(tp.size.toDouble / tv.size)))
    val got = Warehouse.q35Funnel(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == expected)
    assert(tv.size >= tc.size && tc.size >= tp.size, "funnel must narrow")
  }

  test("q36 cohort retention ≡ Scala recomputation; offset-0 row is the full cohort") {
    val ev = graft.Tables.t(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).cast("string").as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1))))
    val cohortOf = ev.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).min }
    val sizes = cohortOf.values.groupBy(identity).map { case (d, v) => d -> v.size }
    def r4d(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val expected = ev.map { case (u, d) =>
      val c = cohortOf(u)
      ((c, java.time.temporal.ChronoUnit.DAYS.between(c, d).toInt), u)
    }.distinct.groupBy(_._1).toSeq
      .map { case ((c, off), us) =>
        (c.toString, off, us.length.toLong, sizes(c).toLong,
          r4d(us.length.toDouble / sizes(c)))
      }.sortBy(t => (t._1, t._2))
    val got = Warehouse.q36CohortRetention(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expected)
    // offset 0 always retains the whole cohort
    got.filter(_._2 == 0).foreach { case (_, _, nAct, nCoh, ret) =>
      assert(nAct == nCoh && ret == 1.0)
    }
  }

  test("q34 latest snapshot equals the window formulation, one row per user") {
    val got = Warehouse.q34LatestSnapshot(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.map(_._1).distinct.size == got.size, "duplicate user rows")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_s").desc, col("event_id").desc)
    val expected = graft.Tables.t(spark, sf, "events")
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("user_id", "event_id").orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
  }
}
