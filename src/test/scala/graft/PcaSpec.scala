package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pca, PcaModel}

/** s12 PCA — spectral laws in place of an SQL oracle (eigenvectors are
  * sign-ambiguous; the covariance float-sum is partition-order-
  * dependent in its last ulps):
  *
  *   1. on planted anisotropic data the recovered axes align with the
  *      known directions and the eigenvalues match the known variances;
  *   2. components are orthonormal;
  *   3. eigenvalues come out sorted and the per-component projection
  *      variance on the corpus equals the eigenvalue (the defining
  *      property of PCA);
  *   4. save/load roundtrips the whole model.
  */
class PcaSpec extends SparkSuite {
  import spark.implicits._

  private def dotL(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("planted anisotropy: axes recovered, eigenvalues match variances") {
    // x along e0 with sd 3, e1 with sd 2, e2 with sd 1, rest sd 0.05
    val rnd = new scala.util.Random(7)
    val dim = 16
    val data = Seq.fill(2000) {
      val v = Array.fill(dim)(rnd.nextGaussian() * 0.05)
      v(0) += rnd.nextGaussian() * 3.0
      v(1) += rnd.nextGaussian() * 2.0
      v(2) += rnd.nextGaussian() * 1.0
      v.toSeq
    }
    val df = data.toDF("v")
    val mdl = Pca.fit(df, dim, k = 3)
    assert(mdl.eigenvalues(0) > mdl.eigenvalues(1) &&
      mdl.eigenvalues(1) > mdl.eigenvalues(2))
    // eigenvalues ≈ planted variances (9, 4, 1) within sampling noise
    assert(math.abs(mdl.eigenvalues(0) - 9.0) < 1.0, mdl.eigenvalues(0))
    assert(math.abs(mdl.eigenvalues(1) - 4.0) < 0.6, mdl.eigenvalues(1))
    assert(math.abs(mdl.eigenvalues(2) - 1.0) < 0.3, mdl.eigenvalues(2))
    // axis alignment up to sign
    for ((axis, i) <- Seq(0, 1, 2).zipWithIndex) {
      val c = mdl.components(i)
      assert(math.abs(c(axis)) > 0.99,
        s"component $i not aligned with e$axis: ${c(axis)}")
    }
  }

  test("components are orthonormal; eigenvalue equals projection variance") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
    val mdl = Pca.fit(vecs, dim = 64, k = 4)
    for (i <- 0 until 4; j <- i until 4) {
      val d = dotL(mdl.components(i), mdl.components(j))
      val expected = if (i == j) 1.0 else 0.0
      assert(math.abs(d - expected) < 1e-6, s"<c$i,c$j> = $d")
    }
    // projection variance per component == eigenvalue (defining law)
    val proj = Pca.project(spark, sf, k = 4, model = Some(mdl))
    val stats = proj.agg(
      variance(col("pc1")), variance(col("pc2")),
      variance(col("pc3")), variance(col("pc4"))).head()
    for (i <- 0 until 4) {
      val v = stats.getDouble(i)
      // sample variance (n-1) vs population eigenvalue (n) + rounding:
      // tolerance scaled to the eigenvalue
      assert(math.abs(v - mdl.eigenvalues(i)) < 0.02 * mdl.eigenvalues(i) + 1e-3,
        s"pc${i + 1} variance $v vs eigenvalue ${mdl.eigenvalues(i)}")
    }
    // spectral ordering visible in the projection itself
    assert(stats.getDouble(0) >= stats.getDouble(1))
    // whitening equalizes: every component comes out at unit variance
    val white = Pca.project(spark, sf, k = 4, model = Some(mdl), whiten = true)
      .agg(variance(col("pc1")), variance(col("pc2")),
        variance(col("pc3")), variance(col("pc4"))).head()
    for (i <- 0 until 4)
      assert(math.abs(white.getDouble(i) - 1.0) < 0.05,
        s"whitened pc${i + 1} variance ${white.getDouble(i)}")
  }

  test("save/load roundtrips the model; served projection matches") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
    val mdl = Pca.fit(vecs, dim = 64, k = 2)
    val dir0 = java.nio.file.Files.createTempDirectory("pcamodel")
    val p = dir0.resolve("m").toString
    mdl.save(spark, p)
    val back = Pca.load(spark, p)
    assert(back.mean.toSeq == mdl.mean.toSeq)
    assert(back.components.map(_.toSeq).toSeq == mdl.components.map(_.toSeq).toSeq)
    assert(back.eigenvalues.toSeq == mdl.eigenvalues.toSeq)
    val a = Pca.project(spark, sf, k = 2, model = Some(mdl)).collect().map(_.toSeq).toSeq
    val b = Pca.project(spark, sf, k = 2, model = Some(back)).collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("eigenvector signs are canonical: largest-|x| entry positive") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
    val mdl = Pca.fit(vecs, dim = 64, k = 4)
    for ((c, i) <- mdl.components.zipWithIndex) {
      val pivot = c.indices.maxBy(j => (math.abs(c(j)), -j))
      assert(c(pivot) > 0, s"component $i pivot ${c(pivot)} not positive")
    }
  }

  test("pinned fixture drift: re-fit at sf0.01 aligns with pinnedModel") {
    // the registered s12 serves the fixture; this law catches the
    // fixture rotting if the testdata or the fit ever changes — the
    // re-fit must land on the SAME canonical axes (dot ≈ +1, not ±1,
    // thanks to sign canonicalization) with the same spectrum
    val vecs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
    val mdl = Pca.fit(vecs, dim = 64, k = 4)
    val pin = Pca.pinnedModel
    for (i <- 0 until 4) {
      // per-axis tolerance is deliberately loose (0.999, not 1−1e-6):
      // the synthetic spectrum is near-degenerate (λ gaps ~1%), so the
      // axes are ill-conditioned — partition-order ulps in the moment
      // sums can rotate adjacent axes measurably even when nothing
      // rotted. Eigenvalues are Rayleigh quotients (second-order
      // stable), so they stay tight.
      val d = dotL(mdl.components(i), pin.components(i))
      assert(d > 0.999, s"component $i drifted: <fit, pinned> = $d")
      val rel = math.abs(mdl.eigenvalues(i) - pin.eigenvalues(i)) /
        pin.eigenvalues(i)
      assert(rel < 1e-6, s"eigenvalue $i drifted: rel err $rel")
    }
    assert(mdl.mean.zip(pin.mean).forall { case (a, b) =>
      math.abs(a - b) < 1e-9 }, "mean drifted")
  }
}
