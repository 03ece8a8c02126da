package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters summary as a typed mergeable UDAF
  * (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS 2012).
  *
  * The buffer holds at most `capacity` (item, residual-count) entries —
  * O(capacity) memory per partition regardless of input size, which is
  * the whole point at 100 TB: the exact `groupBy(token).count` shuffles
  * every distinct token, while this shuffles ≤ capacity entries per
  * partition and still GUARANTEES every item with true frequency
  * > n/(capacity+1) survives, undercounted by at most n/(capacity+1).
  *
  *  - reduce: increment if tracked; insert if there's room; otherwise
  *    decrement every tracked count by 1 (cancelling capacity+1 stream
  *    units at once — that cancellation rate is where the n/(c+1)
  *    error bound comes from).
  *  - merge: add counts, then subtract the (capacity+1)-th largest
  *    count from every entry and drop the non-positive ones. Agarwal
  *    et al. prove the result is again a valid MG summary, which is
  *    exactly the map-side-partial / reduce-side-merge contract Spark
  *    needs.
  *
  * The summary alone is order-dependent (which items survive at the
  * bound is tie-arbitrary); callers that need deterministic output
  * re-count the survivors exactly — see `TextOps.heavyHitters`.
  */
class MisraGriesAggregator(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], w: String): Map[String, Long] =
    b.get(w) match {
      case Some(c)                   => b.updated(w, c + 1)
      case None if b.size < capacity => b.updated(w, 1L)
      case None =>
        b.iterator.map { case (k, c) => (k, c - 1) }.filter(_._2 > 0).toMap
    }

  override def merge(x: Map[String, Long],
                     y: Map[String, Long]): Map[String, Long] = {
    val sum = y.foldLeft(x) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (sum.size <= capacity) sum
    else {
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
      sum.iterator.map { case (k, c) => (k, c - cut) }.filter(_._2 > 0).toMap
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
