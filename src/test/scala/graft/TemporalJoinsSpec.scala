package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.TemporalJoins

class TemporalJoinsSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofJoin picks the latest right row at-or-before each left row") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00")) // key with no earlier right row
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:30:00"), 5.0),
      (10L, ts("2024-01-01 11:00:00"), 7.0),
      (20L, ts("2024-01-01 09:30:00"), 9.0)
    ).toDF("user_id", "ts", "p_value")
    val out = TemporalJoins.asofJoin(left, right, "user_id", "ts", Seq("p_value"))
      .orderBy("event_id").collect()
    assert(out(0).getAs[Timestamp]("asof_ts") == ts("2024-01-01 09:30:00"))
    assert(out(0).getAs[Double]("asof_p_value") == 5.0)
    assert(out(1).getAs[Timestamp]("asof_ts") == ts("2024-01-01 11:00:00"))
    assert(out(1).getAs[Double]("asof_p_value") == 7.0)
    assert(out(2).isNullAt(out(2).fieldIndex("asof_ts")), "no right row <= left ts")
  }

  test("asofJoin: a null value in the matched row stays null (same-row pairing)") {
    val left = Seq((1L, 10L, ts("2024-01-01 12:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:00:00"), Some(5.0)),
      (10L, ts("2024-01-01 11:00:00"), Option.empty[Double]) // matched row, null value
    ).toDF("user_id", "ts", "p_value")
    val out = TemporalJoins.asofJoin(left, right, "user_id", "ts", Seq("p_value")).collect()
    assert(out.head.getAs[Timestamp]("asof_ts") == ts("2024-01-01 11:00:00"))
    assert(out.head.isNullAt(out.head.fieldIndex("asof_p_value")),
      "value must come from the matched row, not an older non-null one")
  }

  test("asofJoin: equal timestamps match (<= semantics)") {
    val left = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq((10L, ts("2024-01-01 10:00:00"), 3.0)).toDF("user_id", "ts", "p_value")
    val out = TemporalJoins.asofJoin(left, right, "user_id", "ts", Seq("p_value")).collect()
    assert(out.head.getAs[Double]("asof_p_value") == 3.0)
  }

  test("rangeJoinCount counts right rows in [ts-width, ts) incl. cross-bucket") {
    val us = 1000000L
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:10:00")),
      (2L, 10L, ts("2024-01-01 10:00:30")), // window crosses a bucket edge
      (3L, 20L, ts("2024-01-01 10:10:00")) // no purchases at all
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 10:05:00")), // in [10:00, 10:10) for event 1
      (10L, ts("2024-01-01 10:10:00")), // boundary: excluded (ts < left.ts)
      (10L, ts("2024-01-01 09:55:00"))  // in [09:50:30, 10:00:30) for event 2
    ).toDF("user_id", "ts")
    val out = TemporalJoins.rangeJoinCount(left, right, "user_id", "ts",
        "event_id", width = 10L * 60 * us)
      .orderBy("event_id").collect()
    assert(out.map(_.getAs[Long]("n_in_range")).toSeq == Seq(1L, 1L, 0L))
  }

  test("asofJoinForward picks the earliest right row at-or-after each left row") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 11:30:00")), // only the 12:00 right remains
      (3L, 20L, ts("2024-01-01 10:00:00")) // key with no later right row
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00"), 5.0), // equal ts → matches (>=)
      (10L, ts("2024-01-01 12:00:00"), 7.0),
      (20L, ts("2024-01-01 09:30:00"), 9.0)
    ).toDF("user_id", "ts", "p_value")
    val out = TemporalJoins.asofJoinForward(left, right, "user_id", "ts", Seq("p_value"))
      .orderBy("event_id").collect()
    assert(out(0).getAs[Timestamp]("asof_ts") == ts("2024-01-01 10:00:00"))
    assert(out(0).getAs[Double]("asof_p_value") == 5.0)
    assert(out(1).getAs[Timestamp]("asof_ts") == ts("2024-01-01 12:00:00"))
    assert(out(2).isNullAt(out(2).fieldIndex("asof_ts")), "no right row >= left ts")
  }

  test("asofJoinTolerance voids stale matches, keeps fresh ones (merge_asof tolerance)") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // match 20 min old → kept
      (2L, 10L, ts("2024-01-01 13:00:00")), // match 2h old → voided
      (3L, 20L, ts("2024-01-01 09:00:00"))  // no match at all
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 09:40:00"), 5.0),
      (10L, ts("2024-01-01 11:00:00"), 7.0)
    ).toDF("user_id", "ts", "p_value")
    val out = TemporalJoins.asofJoinTolerance(left, right, "user_id", "ts",
        Seq("p_value"), toleranceUs = 30L * 60 * 1000000)
      .orderBy("event_id").collect()
    assert(out(0).getTimestamp(3) == ts("2024-01-01 09:40:00")
      && out(0).getDouble(4) == 5.0)
    assert(out(1).isNullAt(3) && out(1).isNullAt(4), "stale match must void")
    assert(out(2).isNullAt(3) && out(2).isNullAt(4))
    // law: on rows where the plain as-of match is within tolerance,
    // the two joins agree exactly — over the real events table
    val j01 = TemporalJoins.clickLastPurchase(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), Option(r.getString(3))))).toMap
    val j05 = TemporalJoins.clickLastPurchaseWithin(spark, sf).collect()
      .map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(j01.keySet == j05.keySet)
    def usOf(s: String): Long = {
      val t = Timestamp.valueOf(s)
      t.getTime * 1000 + (t.getNanos / 1000) % 1000
    }
    j05.foreach { case (id, pts) =>
      val (clickTs, j01Pts) = j01(id)
      if (pts.isDefined) assert(j01Pts == pts, s"fresh match drifted at $id")
      else j01Pts.foreach { p => // voided: the j01 match must be STALE
        assert(usOf(clickTs) - usOf(p) > TemporalJoins.J05ToleranceUs,
          s"j05 voided a within-tolerance j01 match at $id")
      }
    }
    assert(j05.values.count(_.isDefined) < j01.values.count(_._2.isDefined),
      "the 30-min bound must actually void something on the events table")
  }

  test("registered queries run on testdata and key uniquely by event_id") {
    val a = TemporalJoins.clickLastPurchase(spark, sf)
    assert(a.count() == a.select("event_id").distinct().count())
    val r = TemporalJoins.purchasesBeforeClick(spark, sf)
    assert(r.count() == r.select("event_id").distinct().count())
  }

  test("j04 nearest = the closer of backward/forward as-of, ties backward") {
    def byEvent(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      df.collect().map(r => r.getAs[Long]("event_id") ->
        r.getAs[String]("purchase_ts")).toMap
    val back = byEvent(TemporalJoins.clickLastPurchase(spark, sf))
    val fwd = byEvent(TemporalJoins.clickNextPurchase(spark, sf))
    val nearest = TemporalJoins.clickNearestPurchase(spark, sf).collect()
    assert(nearest.nonEmpty && nearest.length == back.size)
    def us(s: String): Long = {
      val t = Timestamp.valueOf(s)
      t.getTime * 1000 + (t.getNanos / 1000) % 1000 // µs incl. sub-ms digits
    }
    nearest.foreach { r =>
      val id = r.getAs[Long]("event_id")
      val t = us(r.getAs[String]("ts_s"))
      val got = Option(r.getAs[String]("purchase_ts"))
      val exp = (back.get(id).flatMap(Option(_)), fwd.get(id).flatMap(Option(_))) match {
        case (None, f) => f
        case (b, None) => b
        case (Some(b), Some(f)) =>
          if (t - us(b) <= us(f) - t) Some(b) else Some(f)
      }
      assert(got == exp, s"event $id: got $got, expected $exp")
    }
  }

  test("j06 rangeJoinAgg: strict half-open window on a crafted frame") {
    def ts(min: Long) = new Timestamp(min * 60000L)
    val left = Seq((1L, 7L, ts(100))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (7L, ts(30), 1.0),   // stale — before the 30-min window
      (7L, ts(70), 2.0),   // exactly at ts−width → INcluded (>= bound)
      (7L, ts(99), 3.0),   // inside
      (7L, ts(100), 99.0), // at the purchase instant → EXcluded (strict <)
      (8L, ts(99), 50.0)   // other user
    ).toDF("user_id", "ts", "value")
    val got = TemporalJoins.rangeJoinAgg(left, right, "user_id", "ts",
        "event_id", "value", TemporalJoins.J06WidthUs,
        Seq(count(lit(1)).as("n"), sum(col("value")).as("s")))
      .collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("n") == 2 && got.head.getAs[Double]("s") == 5.0,
      got.head.toString)
  }

  test("j06 rangeJoinAgg: left rows with no match survive with null aggs") {
    def ts(min: Long) = new Timestamp(min * 60000L)
    val left = Seq((1L, 7L, ts(100)), (2L, 9L, ts(100)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((7L, ts(99), 3.0)).toDF("user_id", "ts", "value")
    val got = TemporalJoins.rangeJoinAgg(left, right, "user_id", "ts",
        "event_id", "value", TemporalJoins.J06WidthUs,
        Seq(sum(col("value")).as("s")))
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[Any]("s"))).toMap
    assert(got(1L).contains(3.0) && got(2L).isEmpty, got.toString)
  }

  test("j06 registry form: n_clicks 0 rows carry null sums, counts match " +
       "a naive recomputation") {
    val got = TemporalJoins.purchaseClickFeatures(spark, sf)
    val zeros = got.filter(col("n_clicks") === 0)
    assert(zeros.filter(col("sum_click_value").isNotNull).count() == 0)
    // naive recomputation (unbucketed inequality join) — small SF only
    val ev = Tables.t(spark, sf, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"), col("value"))
    val naive = p.join(c, col("user_id") === col("cu") &&
        col("cts") >= col("ts") - expr("INTERVAL 30 MINUTE") &&
        col("cts") < col("ts"), "left")
      .groupBy("event_id").agg(count(col("value")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.collect().foreach { r =>
      assert(r.getAs[Long]("n_clicks") == naive(r.getAs[Long]("event_id")))
    }
  }

  test("j07 attribution: linear credit splits, last-touch rule, " +
       "unattributed purchases absent; touches == j06's click counts") {
    val got = TemporalJoins.purchaseAttribution(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty, "no attributed purchase on the gate corpus")
    // brute-force recomputation over the collected events
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val evTyped = graft.Tables.t(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getDouble(4)))
    val w = TemporalJoins.J06WidthUs
    val clicks = evTyped.filter(_._3 == "click")
    evTyped.filter(_._3 == "purchase").foreach {
      case (pid, user, _, pus, value) =>
        val touches = clicks.filter { case (_, u, _, cus, _) =>
          u == user && cus >= pus - w && cus < pus }
        if (touches.isEmpty) assert(!got.contains(pid), s"phantom $pid")
        else {
          val (n, lastId, credit) = got(pid)
          assert(n == touches.length)
          val expLast = touches.maxBy(t => (t._4, t._1))
          assert(lastId == expLast._1,
            s"last-touch off for $pid: $lastId vs ${expLast._1}")
          assert(credit ==
            math.floor(value * 100.0 / touches.length + 0.5).toLong)
        }
    }
    assert(ev.count() > 0) // the raw read stays exercised
  }
}
