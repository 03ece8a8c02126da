package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (the `Aggregator[IN, BUF, OUT]` surface from SURVEY.md
  * §2.8): per-group elementwise mean of equal-length vectors.
  *
  * This is the scale-correct way to compute per-label embedding
  * centroids: each partition folds its rows into ONE (sums, count)
  * buffer per group (map-side partial aggregation), so the shuffle
  * carries k×dim doubles per partition — independent of row count. The
  * declarative alternative (posexplode to (label, pos, x) then
  * groupBy(label, pos).avg) shuffles n×dim exploded rows: correct, but
  * ~dim× more shuffle volume on a 100 TB corpus.
  *
  * Mean = Σ/n with a plain left-to-right double accumulation per
  * partition — the same semantics as Spark's/DuckDB's own avg(), so
  * results agree with an avg-based SQL oracle at 4-decimal rounding.
  */
class CentroidAggregator
    extends Aggregator[(Int, Seq[Double]), (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long),
                      a: (Int, Seq[Double])): (Array[Double], Long) = {
    val v = a._2
    if (b._2 == 0L) (v.toArray, 1L)
    else {
      val s = b._1
      require(s.length == v.length,
        s"ragged vectors: ${s.length} vs ${v.length}")
      var i = 0
      while (i < s.length) { s(i) += v(i); i += 1 }
      (s, b._2 + 1)
    }
  }

  override def merge(x: (Array[Double], Long),
                     y: (Array[Double], Long)): (Array[Double], Long) =
    if (x._2 == 0L) y
    else if (y._2 == 0L) x
    else {
      val s = x._1
      require(s.length == y._1.length,
        s"ragged vectors: ${s.length} vs ${y._1.length}")
      var i = 0
      while (i < s.length) { s(i) += y._1(i); i += 1 }
      (s, x._2 + y._2)
    }

  override def finish(b: (Array[Double], Long)): Seq[Double] =
    b._1.map(_ / b._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(ExpressionEncoderHelper.arrayDouble, Encoders.scalaLong)

  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoderHelper.seqDouble
}

/** Spark's implicit encoders live on SparkSession.implicits (an
  * instance); an Aggregator needs them statically. These are the same
  * `ExpressionEncoder`s the implicits would resolve. */
private object ExpressionEncoderHelper {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  val arrayDouble: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  val seqDouble: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
