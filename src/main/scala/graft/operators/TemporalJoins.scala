package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables.t

/** As-of and range joins over event streams — operators Spark has no
  * native keyword for, composed from built-ins so Catalyst still owns
  * the physical plan.
  *
  * Scale design:
  *  - as-of join: the union + running-`last` trick — ONE shuffle on the
  *    key, a single sort per partition, zero row blowup. The naive
  *    formulation (inequality join + max) is a range self-join that
  *    explodes quadratically in keys×time; this one is linear and is
  *    how a 100 TB backfill should run.
  *  - range join: bucketize time into `width`-sized buckets, explode the
  *    probe side to the two buckets its window can touch, equi-join on
  *    (key, bucket), then filter the exact range — the classic bucketed
  *    interval join. Shuffle volume is O(input), never O(pairs).
  */
object TemporalJoins {

  /** Generic as-of join: for every left row, the latest right row with
    * the same key and `rightTs <= leftTs`.
    *
    * @param left     probe side; all its columns survive
    * @param right    reference side, pre-deduplicated per (key, ts)
    * @param key      equi-join key column name (same name both sides)
    * @param ts       timestamp column name (same name both sides)
    * @param rightVals right-side value columns to carry (renamed as given)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightVals: Seq[String]): DataFrame =
    asofJoinImpl(left, right, key, ts, rightVals, forward = false)

  /** Forward as-of: for every left row, the EARLIEST right row with the
    * same key and `rightTs >= leftTs` — "next event after". Same single
    * window pass as the backward join, with the time axis reversed. */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String, ts: String,
                      rightVals: Seq[String]): DataFrame =
    asofJoinImpl(left, right, key, ts, rightVals, forward = true)

  private def asofJoinImpl(left: DataFrame, right: DataFrame, key: String,
                           ts: String, rightVals: Seq[String],
                           forward: Boolean): DataFrame = {
    val leftCols = left.columns
    // the whole right row rides in ONE struct so a single running-last
    // picks the timestamp and every value from the SAME matched row —
    // per-column last(ignoreNulls) would skip a null value and pair
    // asof_ts with a value from an older row
    val rStructFields = (col(ts).as("__t") +: rightVals.map(col)): Seq[Column]
    val rTagged = right
      .withColumn("__side", lit(0))
      .withColumn("__r", struct(rStructFields: _*))
      .select(col(key), col(ts), col("__side"), col("__r"))
    val lTagged = left
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rTagged.schema("__r").dataType))
    // right rows sort before left rows at equal ts → inclusive bound
    // ("<=" backward, ">=" forward); forward just reverses the time
    // axis so the running-last sees later rights first
    val tsOrd = if (forward) col(ts).desc else col(ts).asc
    val w = Window.partitionBy(key).orderBy(tsOrd, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
    val carried = rightVals.map(v => col("__asof")(v).as(s"asof_$v"))
    joined
      .where(col("__side") === 1)
      .select((leftCols.map(col) :+ col("__asof")("__t").as("asof_ts")) ++ carried: _*)
  }

  /** Backward as-of with a STALENESS BOUND — pandas `merge_asof`'s
    * `tolerance`: a match older than `toleranceUs` microseconds is
    * DISCARDED (null asof columns), not carried. The semantics
    * attribution and feature-freshness joins actually need (a
    * day-old quote must not price today's trade; a week-old click
    * must not claim today's purchase). Costs the same single window
    * pass as [[asofJoin]] — the bound is one column expression over
    * the already-matched row, NOT a second join. */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, key: String,
                        ts: String, rightVals: Seq[String],
                        toleranceUs: Long): DataFrame = {
    val base = asofJoin(left, right, key, ts, rightVals)
    val fresh = col("asof_ts").isNotNull &&
      unix_micros(col(ts)) - unix_micros(col("asof_ts")) <= toleranceUs
    val guard: Seq[(String, Column)] =
      ("asof_ts" -> col("asof_ts")) +:
        rightVals.map(v => s"asof_$v" -> col(s"asof_$v"))
    guard.foldLeft(base) { case (df, (name, c)) =>
      df.withColumn(name, when(fresh, c))
    }
  }

  /** Generic bucketed range join: for every left row, aggregate right
    * rows with the same key and `ts` in `[leftTs - width, leftTs)`.
    * Returns left keyed by `leftId` with `n_in_range` (0 for no match).
    * `width` in microseconds. */
  def rangeJoinCount(left: DataFrame, right: DataFrame, key: String,
                     ts: String, leftId: String, width: Long): DataFrame = {
    val l = left.withColumn("__us", unix_micros(col(ts)))
    val r = right.select(col(key), unix_micros(col(ts)).as("__rus"))
      .withColumn("__bucket", floor(col("__rus") / width))
    // the [ts-width, ts) window spans at most two width-sized buckets
    val probe = l.withColumn("__bucket",
      explode(array(floor(col("__us") / width) - 1, floor(col("__us") / width))))
    val counts = probe.join(r, Seq(key, "__bucket"))
      .where(col("__rus") >= col("__us") - width && col("__rus") < col("__us"))
      .groupBy(leftId)
      .agg(count(lit(1)).as("__n"))
    left.join(counts, Seq(leftId), "left")
      .withColumn("n_in_range", coalesce(col("__n"), lit(0L)))
      .drop("__n")
  }

  // ----- query-registry entries over the events table -----

  private def typed(s: SparkSession, dir: String, kind: String): DataFrame =
    t(s, dir, "events").where(col("event_type") === kind)

  /** For every click, the user's most recent purchase at-or-before the
    * click (timestamp + value). Purchases are pre-aggregated per
    * (user, ts) with max(value) so ties are deterministic on both the
    * Spark and the oracle side. */
  def clickLastPurchase(s: SparkSession, dir: String): DataFrame = {
    val clicks = typed(s, dir, "click").select("event_id", "user_id", "ts")
    val purchases = typed(s, dir, "purchase")
      .groupBy("user_id", "ts").agg(max("value").as("p_value"))
    asofJoin(clicks, purchases, "user_id", "ts", Seq("p_value"))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
        date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
        round(col("asof_p_value"), 4).as("purchase_value"))
      .orderBy("event_id")
  }

  /** j05's tolerance window — single-sourced into the oracle SQL
    * (INTERVAL 30 MINUTE there). */
  val J05ToleranceUs: Long = 30L * 60 * 1000000

  /** j05: last-touch attribution join — for every click, the user's
    * most recent purchase at-or-before it, but only if it happened
    * within the last 30 minutes ([[asofJoinTolerance]]); a stale match
    * yields nulls, exactly pandas `merge_asof(tolerance=...)`. */
  def clickLastPurchaseWithin(s: SparkSession, dir: String): DataFrame = {
    val clicks = typed(s, dir, "click").select("event_id", "user_id", "ts")
    val purchases = typed(s, dir, "purchase")
      .groupBy("user_id", "ts").agg(max("value").as("p_value"))
    asofJoinTolerance(clicks, purchases, "user_id", "ts", Seq("p_value"),
        J05ToleranceUs)
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
        date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
        round(col("asof_p_value"), 4).as("purchase_value"))
      .orderBy("event_id")
  }

  /** For every click, the user's NEXT purchase at-or-after the click —
    * the attribution-window direction of the as-of join. */
  def clickNextPurchase(s: SparkSession, dir: String): DataFrame = {
    val clicks = typed(s, dir, "click").select("event_id", "user_id", "ts")
    val purchases = typed(s, dir, "purchase")
      .groupBy("user_id", "ts").agg(max("value").as("p_value"))
    asofJoinForward(clicks, purchases, "user_id", "ts", Seq("p_value"))
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
        date_format(col("asof_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
        round(col("asof_p_value"), 4).as("purchase_value"))
      .orderBy("event_id")
  }

  /** j04: NEAREST-event join — for every click, the purchase by the
    * same user closest in time in EITHER direction (ties to the earlier
    * one). Composed from the two as-of passes: backward gives the
    * nearest at-or-before, forward the nearest at-or-after, and the
    * true nearest is whichever of the two is closer — so the pair
    * blowup of a |Δt|-ordered join never happens. Cost at 100 TB: two
    * key-sorted window passes plus one equi-join on the (unique) left
    * id; the join is on the probe table alone, never on pairs. */
  def clickNearestPurchase(s: SparkSession, dir: String): DataFrame = {
    val clicks = typed(s, dir, "click").select("event_id", "user_id", "ts")
    val purchases = typed(s, dir, "purchase")
      .groupBy("user_id", "ts").agg(max("value").as("p_value"))
    val back = asofJoin(clicks, purchases, "user_id", "ts", Seq("p_value"))
      .select(col("event_id"), col("asof_ts").as("b_ts"), col("asof_p_value").as("b_val"))
    val fwd = asofJoinForward(clicks, purchases, "user_id", "ts", Seq("p_value"))
      .select(col("event_id"), col("asof_ts").as("f_ts"), col("asof_p_value").as("f_val"))
    // back wins ties: at equal distance its ts is the earlier one,
    // matching the oracle's ORDER BY (abs distance, ts)
    val useBack = col("f_ts").isNull || (col("b_ts").isNotNull &&
      unix_micros(col("ts")) - unix_micros(col("b_ts")) <=
        unix_micros(col("f_ts")) - unix_micros(col("ts")))
    clicks.join(back, "event_id").join(fwd, "event_id")
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts_s"),
        date_format(when(useBack, col("b_ts")).otherwise(col("f_ts")),
          "yyyy-MM-dd HH:mm:ss.SSSSSS").as("purchase_ts"),
        round(when(useBack, col("b_val")).otherwise(col("f_val")), 4)
          .as("purchase_value"))
      .orderBy("event_id")
  }

  /** For every click, how many purchases the same user made in the 10
    * minutes before it. */
  def purchasesBeforeClick(s: SparkSession, dir: String): DataFrame = {
    val clicks = typed(s, dir, "click").select("event_id", "user_id", "ts")
    val purchases = typed(s, dir, "purchase").select("user_id", "ts")
    rangeJoinCount(clicks, purchases, "user_id", "ts", "event_id",
        width = 10L * 60 * 1000000)
      .select(col("event_id"), col("user_id"), col("n_in_range").as("n_purchases"))
      .orderBy("event_id")
  }

  /** j06's lookback window — single-sourced into the oracle SQL
    * (INTERVAL 30 MINUTE there). */
  val J06WidthUs: Long = 30L * 60 * 1000000

  /** Generic bucketed range-AGGREGATE join: [[rangeJoinCount]]
    * generalized from a count to arbitrary aggregates over the right
    * rows with the same key and `ts` in `[leftTs − width, leftTs)`.
    * `aggs` builds the aggregate list from the right-side value column;
    * left rows with no match keep a row (fill NULL/0 downstream).
    * Same scale contract as [[rangeJoinCount]]: the probe explodes to
    * at most TWO width-sized buckets, the join is an equi-join on
    * (key, bucket), shuffle volume O(input) never O(pairs). */
  def rangeJoinAgg(left: DataFrame, right: DataFrame, key: String,
                   ts: String, leftId: String, valCol: String,
                   width: Long, aggs: Seq[Column]): DataFrame = {
    val l = left.withColumn("__us", unix_micros(col(ts)))
    val r = right.select(col(key), unix_micros(col(ts)).as("__rus"),
        col(valCol))
      .withColumn("__bucket", floor(col("__rus") / width))
    val probe = l.withColumn("__bucket",
      explode(array(floor(col("__us") / width) - 1, floor(col("__us") / width))))
    val feat = probe.join(r, Seq(key, "__bucket"))
      .where(col("__rus") >= col("__us") - width && col("__rus") < col("__us"))
      .groupBy(leftId)
      .agg(aggs.head, aggs.tail: _*)
    left.join(feat, Seq(leftId), "left")
  }

  /** j06: point-in-time feature join — for every purchase, aggregate
    * features of the same user's CLICKS in the preceding 30 minutes
    * (count / total / peak click value): the leakage-free feature
    * backfill a training pipeline runs to attach behavioral context to
    * each label event. The window is strictly before the purchase
    * (`[ts−30min, ts)`), so no feature can see the label's own instant
    * — the point-in-time-correctness rule feature stores enforce. */
  def purchaseClickFeatures(s: SparkSession, dir: String): DataFrame = {
    val purchases = typed(s, dir, "purchase").select("event_id", "user_id", "ts")
    val clicks = typed(s, dir, "click").select("user_id", "ts", "value")
    rangeJoinAgg(purchases, clicks, "user_id", "ts", "event_id", "value",
        J06WidthUs, Seq(
          count(lit(1)).as("__n"),
          round(sum(col("value")), 4).as("__sum"),
          round(max(col("value")), 4).as("__max")))
      .select(col("event_id"), col("user_id"),
        coalesce(col("__n"), lit(0L)).as("n_clicks"),
        col("__sum").as("sum_click_value"),
        col("__max").as("max_click_value"))
      .orderBy("event_id")
  }

  /** j07: windowed multi-touch attribution — the serving-side dual of
    * j06's feature backfill: each purchase's VALUE is shared linearly
    * across the same user's clicks in the preceding 30 minutes, and
    * the last-touch click is named (the two standard attribution
    * models in one report). Purchases with no in-window click are
    * unattributed and drop out — attribution is a report over
    * attributed conversions, not a left join.
    *
    * Same bucketed-interval equi-join as j02/j06 (probe side explodes
    * to ≤2 width-sized buckets, exact range filter after the join) —
    * shuffle O(input), never O(pairs). Credit is in CENTS, floored
    * half-up: ONE float op chain, so the dialect-portable oracle
    * replays it bit-for-bit. Last-touch ties (same microsecond) break
    * to the larger click id via the max-struct, mirrored by the
    * oracle's ORDER BY ts DESC, click_id DESC. */
  def purchaseAttribution(s: SparkSession, dir: String,
                          width: Long = J06WidthUs): DataFrame = {
    val purchases = typed(s, dir, "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts"), col("value"))
    val clicks = typed(s, dir, "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("cts"))
    val p = purchases.withColumn("__us", unix_micros(col("ts")))
      .withColumn("__bucket", explode(array(
        floor(col("__us") / width) - 1, floor(col("__us") / width))))
    val c = clicks.withColumn("__cus", unix_micros(col("cts")))
      .withColumn("__bucket", floor(col("__cus") / width))
    p.join(c, Seq("user_id", "__bucket"))
      .where(col("__cus") >= col("__us") - width && col("__cus") < col("__us"))
      .groupBy("purchase_id", "value")
      .agg(count(lit(1)).as("n_touches"),
        max(struct(col("__cus"), col("click_id"))).as("__last"))
      .select(col("purchase_id"), col("n_touches"),
        col("__last.click_id").as("last_click_id"),
        floor(col("value") * 100.0 / col("n_touches") + 0.5).cast("long")
          .as("credit_cents"))
      .orderBy("purchase_id")
  }
}
