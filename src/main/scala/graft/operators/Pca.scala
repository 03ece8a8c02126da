package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.VectorExprs.dot

/** Second-moment accumulator for PCA: one pass over the corpus folds
  * every vector into (n, Σv, Σvvᵀ) — a dim + dim² double buffer
  * (64-dim: ~33 KB) per partition, merged associatively, so the
  * covariance of a 100 TB corpus costs ONE narrow scan + a single
  * model-state-sized reduce (the same shape as the centroid UDAF).
  * The outer-product fold is a tight JVM loop in the typed aggregator;
  * no per-element Column HOFs (the interpreted-lambda trap). */
case class Moments(n: Long, s: Array[Double], ss: Array[Double])

class MomentsAggregator(dim: Int)
    extends Aggregator[Seq[Double], Moments, Moments] {
  override def zero: Moments =
    Moments(0L, new Array[Double](dim), new Array[Double](dim * dim))
  override def reduce(m: Moments, v: Seq[Double]): Moments = {
    val a = v.toArray
    var i = 0
    while (i < dim) {
      m.s(i) += a(i)
      var j = 0
      val row = i * dim
      while (j < dim) { m.ss(row + j) += a(i) * a(j); j += 1 }
      i += 1
    }
    Moments(m.n + 1, m.s, m.ss)
  }
  override def merge(x: Moments, y: Moments): Moments = {
    var i = 0
    while (i < dim) { x.s(i) += y.s(i); i += 1 }
    i = 0
    while (i < dim * dim) { x.ss(i) += y.ss(i); i += 1 }
    Moments(x.n + y.n, x.s, x.ss)
  }
  override def finish(m: Moments): Moments = m
  override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
  override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
}

/** PCA model state: mean, top-k principal components, eigenvalues.
  * Fit-once / serve-many, like [[PqModel]]: the distributed work is the
  * one-pass moment aggregate; the eigen-decomposition runs driver-side
  * on the dim×dim covariance (power iteration with deflation — fixed
  * iteration count, deterministic init, so the fit is reproducible for
  * a given partitioning; float-sum order across partitions makes the
  * last ulps partitioning-dependent, which is why s12 is a rows-only
  * query and PcaSpec asserts LAWS with tolerances, not bit equality). */
case class PcaModel(mean: Array[Double], components: Array[Array[Double]],
                    eigenvalues: Array[Double]) {
  def k: Int = components.length
  def dim: Int = mean.length

  def save(s: SparkSession, path: String): Unit = {
    import s.implicits._
    val rows = ("mean", -1, mean.toSeq, 0.0) +:
      components.toSeq.zipWithIndex.map { case (c, i) =>
        ("component", i, c.toSeq, eigenvalues(i))
      }
    rows.toDF("kind", "i", "vec", "eig")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }
}

object Pca {

  /** One distributed pass → driver-side eigen. `vecs` must expose a
    * Seq[Double] column named `v`. */
  def fit(vecs: DataFrame, dim: Int, k: Int, iters: Int = 100): PcaModel = {
    import vecs.sparkSession.implicits._
    val agg = new MomentsAggregator(dim).toColumn
    val m = vecs.select(col("v").as[Seq[Double]]).select(agg).head()
    require(m.n > 1, s"need >1 vectors to fit PCA, got ${m.n}")
    val n = m.n.toDouble
    val mean = m.s.map(_ / n)
    // C = E[vvᵀ] − μμᵀ
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      m.ss(i * dim + j) / n - mean(i) * mean(j)
    }
    val (comps, eigs) = topEigen(cov, k, iters)
    PcaModel(mean, comps, eigs)
  }

  /** Power iteration with deflation: deterministic SplitMix64 init,
    * fixed iteration count. Returns (components, eigenvalues), largest
    * first. */
  private[operators] def topEigen(cov0: Array[Array[Double]], k: Int,
                                  iters: Int): (Array[Array[Double]], Array[Double]) = {
    val dim = cov0.length
    val cov = cov0.map(_.clone())
    def matVec(v: Array[Double]): Array[Double] =
      Array.tabulate(dim) { i =>
        var acc = 0.0; var j = 0
        while (j < dim) { acc += cov(i)(j) * v(j); j += 1 }
        acc
      }
    def norm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    val comps = Array.ofDim[Array[Double]](k)
    val eigs = new Array[Double](k)
    for (c <- 0 until k) {
      var v = Array.tabulate(dim) { d =>
        val h = Dedup.splitmix64(c.toLong * 7919L + d)
        (h >>> 11).toDouble / (1L << 53).toDouble - 0.5
      }
      // re-orthogonalize against the components already found every
      // iteration (Gram-Schmidt): deflation alone leaves O(1e-5)
      // cross-talk when the spectrum is near-degenerate (uniform data)
      def orthog(w: Array[Double]): Array[Double] = {
        val out = w.clone()
        var p = 0
        while (p < c) {
          val cp = comps(p)
          var d = 0.0; var i = 0
          while (i < dim) { d += out(i) * cp(i); i += 1 }
          i = 0
          while (i < dim) { out(i) -= d * cp(i); i += 1 }
          p += 1
        }
        out
      }
      var nv = norm(v)
      v = v.map(_ / nv)
      for (_ <- 1 to iters) {
        val w = orthog(matVec(v))
        nv = norm(w)
        if (nv > 0) v = w.map(_ / nv)
      }
      val cv = matVec(v)
      val lambda = v.zip(cv).map { case (a, b) => a * b }.sum
      comps(c) = v
      eigs(c) = lambda
      // deflate: C ← C − λvvᵀ
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) { cov(i)(j) -= lambda * v(i) * v(j); j += 1 }
        i += 1
      }
    }
    (comps, eigs)
  }

  def load(s: SparkSession, path: String): PcaModel = {
    val rows = s.read.parquet(path).collect()
    val mean = rows.find(_.getAs[String]("kind") == "mean").get
      .getAs[scala.collection.Seq[Double]]("vec").toArray
    val cs = rows.filter(_.getAs[String]("kind") == "component")
      .sortBy(_.getAs[Int]("i"))
    PcaModel(mean,
      cs.map(_.getAs[scala.collection.Seq[Double]]("vec").toArray),
      cs.map(_.getAs[Double]("eig")))
  }

  /** s12: project every embedding onto the top-k principal components —
    * the dimensionality-reduction / decorrelation step a 100 TB
    * embedding pipeline runs before quantization or ANN (the same role
    * as OPQ's rotation). Serve path: each component is a plan literal;
    * the projection is k codegen'd dots per row, one narrow pass, no
    * shuffle before the output sort. Rows-only (eigenvectors are
    * sign-ambiguous and the covariance float-sum is partition-order-
    * dependent in its last ulps — no SQL oracle); PcaSpec pins the
    * spectral laws. */
  def project(s: SparkSession, dir: String, k: Int = 4,
              model: Option[PcaModel] = None,
              whiten: Boolean = false): DataFrame = {
    val vecs = t(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), _.cast("double")).as("v"))
    val mdl = model.getOrElse(fit(vecs, dim = 64, k = k))
    val centered = zip_with(col("v"), typedlit(mdl.mean.toSeq), (x, mu) => x - mu)
    val pcs = mdl.components.zipWithIndex.map { case (w, i) =>
      // whitening rescales each axis to unit variance (divide by √λ) —
      // the decorrelate-and-equalize transform quantizers want
      val scale = if (whiten) math.sqrt(mdl.eigenvalues(i)).max(1e-12) else 1.0
      round(dot(centered, typedlit(w.map(_ / scale).toSeq)), 4).as(s"pc${i + 1}")
    }
    vecs.select(col("vec_id") +: col("label") +: pcs: _*)
      .orderBy("vec_id")
  }
}
