package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch as a typed mergeable UDAF (Cormode & Muthukrishnan,
  * J. Algorithms 2005) — the additive-counts complement to the
  * [[MisraGriesAggregator]] deletion-based summary.
  *
  * The buffer is a fixed `CmsDepth × CmsWidth` array of counters —
  * O(1) memory per partition regardless of input size or vocabulary,
  * the 100 TB contract: the exact `groupBy(token).count` shuffles
  * every distinct token, while this shuffles exactly depth·width longs
  * per partition. Point estimates are overcounts only
  * (est ≥ true always; est ≤ true + εn with probability 1−δ for
  * w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉), which is what makes the registered t25
  * law (`n_cms ≥ n_exact`) a hard invariant rather than a tendency.
  *
  *  - reduce: +1 in one cell per row (cells from [[Hashing.cmsCells]]
  *    — the deterministic multiply-shift family, oracle-replayable).
  *  - merge: elementwise sum — CMS is a linear sketch, so the
  *    map-side-partial / reduce-side-merge contract is EXACT, not just
  *    valid-summary-preserving like Misra-Gries.
  *
  * The sketch alone never returns a token list (it has no keys);
  * callers query it with known tokens — see `TextOps.cmsFrequencies`,
  * which broadcasts the finished sketch as a plan literal the way x15
  * carries its classifier weights.
  */
class CountMinAggregator
    extends Aggregator[Long, Array[Long], Array[Long]] {
  private val d = Hashing.CmsDepth
  private val w = Hashing.CmsWidth

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    val cells = Hashing.cmsCells(h)
    var r = 0
    while (r < d) { b(r * w + cells(r)) += 1; r += 1 }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
