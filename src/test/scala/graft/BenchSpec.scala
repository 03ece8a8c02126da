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

  test("suite-edge queries adjudicate with truncated neighbor windows") {
    val values: Map[String, Double] = names.map(_ -> 0.95).toMap
    val v = Bench.adjudicatePreQuiet("q14", fin = 0.95, thr = 0.60,
      prev = 0.30, sameHeadRow = None, selectedNames = names,
      values = values, medians = medians)
    assert(v.isDefined) // q15+q16 both waving
  }
}
