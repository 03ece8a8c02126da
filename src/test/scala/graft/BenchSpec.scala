package graft

import org.scalatest.funsuite.AnyFunSuite

/** Replays the r13 bench false-positive conditions against the r14
  * pre-quiet adjudicator (Bench.adjudicatePreQuiet) and proves a
  * synthetic surgical regression still reaches the quiet re-measure
  * path. VERDICT r13 task 2's "Done" criteria, as a pure-function spec
  * (no Spark session needed).
  */
class BenchSpec extends AnyFunSuite {

  private val names = Seq("q14", "q15", "q16", "q17", "q18", "q19",
    "x18", "x19", "x20", "x21")
  private val medians: Map[String, Double] = names.map(_ -> 0.30).toMap

  test("r13-style contention wave is voided as contention without a quiet re-run") {
    // 8 adjacent queries spiked 2-7x together (the 14:57Z window).
    val values: Map[String, Double] =
      names.map(n => n -> (if (n == "q14" || n == "x21") 0.31 else 0.95)).toMap
    val v = Bench.adjudicatePreQuiet("q16", fin = 0.95, thr = 0.60,
      prev = 0.30, sameHeadRow = None, selectedNames = names,
      values = values, medians = medians)
    assert(v.isDefined, "wave must void the verdict")
    assert(v.get.startsWith("contention wave"))
  }

  test("same-HEAD prior full-suite row in-band voids the verdict (14:08Z alibi)") {
    // Even with NO neighbor wave, the prior same-HEAD row proves the
    // code is fast at this HEAD.
    val values: Map[String, Double] =
      names.map(n => n -> (if (n == "q16") 0.95 else 0.31)).toMap
    val prior = Some(names.map(_ -> 0.28).toMap)
    val v = Bench.adjudicatePreQuiet("q16", fin = 0.95, thr = 0.60,
      prev = 0.30, sameHeadRow = prior, selectedNames = names,
      values = values, medians = medians)
    assert(v.isDefined)
    assert(v.get.startsWith("contention ("))
    assert(v.get.contains("same-HEAD"))
  }

  test("synthetic surgical regression still trips (reaches quiet re-measure)") {
    // Only q16 is slow; neighbors in-band; no same-HEAD row (new
    // commit). Must return None -> quiet re-measure -> can be labeled
    // persistent.
    val values: Map[String, Double] =
      names.map(n => n -> (if (n == "q16") 0.95 else 0.31)).toMap
    val v = Bench.adjudicatePreQuiet("q16", fin = 0.95, thr = 0.60,
      prev = 0.30, sameHeadRow = None, selectedNames = names,
      values = values, medians = medians)
    assert(v.isEmpty, "a surgical regression must NOT be voided")
  }

  test("a same-HEAD prior row that is itself slow is no alibi") {
    // The prior row at this HEAD was ALSO over threshold -> the code
    // regressed at this commit; must fall through (no wave here).
    val values: Map[String, Double] =
      names.map(n => n -> (if (n == "q16") 0.95 else 0.31)).toMap
    val prior = Some(names.map(n => n -> (if (n == "q16") 0.90 else 0.28)).toMap)
    val v = Bench.adjudicatePreQuiet("q16", fin = 0.95, thr = 0.60,
      prev = 0.30, sameHeadRow = prior, selectedNames = names,
      values = values, medians = medians)
    assert(v.isEmpty)
  }

  test("one spiked neighbor is not a wave") {
    val values: Map[String, Double] = names.map(n =>
      n -> (if (n == "q16" || n == "q17") 0.95 else 0.31)).toMap
    val v = Bench.adjudicatePreQuiet("q16", fin = 0.95, thr = 0.60,
      prev = 0.30, sameHeadRow = None, selectedNames = names,
      values = values, medians = medians)
    assert(v.isEmpty, "a single hot neighbor (could be a shared-cause real regression) must not void")
  }

  test("an already-adjudicated cost level does not re-flag (established-level check)") {
    // the r14 s32/t33 case: an intentional plan change raised the cost;
    // the most recent full-suite row (any HEAD) already measured it
    // there; the median lags. Must be voided as "established level".
    val values: Map[String, Double] =
      names.map(n => n -> (if (n == "q16") 0.70 else 0.31)).toMap
    val latest = Some(names.map(n => n -> (if (n == "q16") 0.68 else 0.30)).toMap)
    val v = Bench.adjudicatePreQuiet("q16", fin = 0.70, thr = 0.60,
      prev = 0.30, sameHeadRow = None, selectedNames = names,
      values = values, medians = medians, latestRow = latest)
    assert(v.isDefined)
    assert(v.get.startsWith("established level"))
  }

  test("a regression ABOVE the latest full-suite row still trips") {
    // latest row had q16 at its normal level -> a new spike is NOT
    // established; and a spike far above an elevated prior level is
    // a fresh regression on top of it
    val values: Map[String, Double] =
      names.map(n => n -> (if (n == "q16") 0.95 else 0.31)).toMap
    val inBandPrior = Some(names.map(_ -> 0.28).toMap)
    val v1 = Bench.adjudicatePreQuiet("q16", fin = 0.95, thr = 0.60,
      prev = 0.30, sameHeadRow = None, selectedNames = names,
      values = values, medians = medians, latestRow = inBandPrior)
    assert(v1.isEmpty, "an in-band latest row is no establishment alibi")
    val elevatedPrior = Some(names.map(n =>
      n -> (if (n == "q16") 0.65 else 0.28)).toMap)
    val v2 = Bench.adjudicatePreQuiet("q16", fin = 1.50, thr = 0.60,
      prev = 0.30, sameHeadRow = None, selectedNames = names,
      values = values, medians = medians, latestRow = elevatedPrior)
    assert(v2.isEmpty, "1.5s is far above the established 0.65s level - must still trip")
  }

  test("suite-edge queries adjudicate with truncated neighbor windows") {
    val values: Map[String, Double] = names.map(_ -> 0.95).toMap
    val v = Bench.adjudicatePreQuiet("q14", fin = 0.95, thr = 0.60,
      prev = 0.30, sameHeadRow = None, selectedNames = names,
      values = values, medians = medians)
    assert(v.isDefined) // q15+q16 both waving
  }
}
