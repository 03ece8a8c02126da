package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorExprs.dot
import graft.operators.{Pca, Pinned, PqModel, Similarity}

/** Drift laws for the pinned model fixtures behind the oracle-exact
  * serve paths (s05/s09/s10/s11/s13): re-fit at sf0.01 and compare
  * against the literals in [[graft.operators.Pinned]].
  *
  * The PQ fits are pure functions of the data (deterministic
  * TakeOrdered sample + driver-side Lloyd), so they must equal the
  * fixtures EXACTLY; the distributed fits (k-means centroid averages,
  * PCA moments) are partition-order-dependent in their last ulps, so
  * they get tolerances. A red test here means the fixture rotted
  * (testdata or fit changed) — regenerate with
  * `sbt "runMain graft.tools.PinModelsTool"`. */
class PinnedModelsSpec extends SparkSuite {

  private lazy val normed: DataFrame =
    graft.Tables.t(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      .select(col("vec_id"), transform(col("v"), x => x / col("nrm")).as("v"))
      .localCheckpoint()

  private def sameBooks(a: Array[Array[Array[Double]]],
                        b: Array[Array[Array[Double]]]): Boolean =
    a.length == b.length && a.indices.forall(j =>
      a(j).indices.forall(c => a(j)(c).sameElements(b(j)(c))))

  test("Pinned.pq equals a re-fit exactly (pure-function fit)") {
    val refit = PqModel.fit(PqModel.sampleVectors(normed, 4096),
      m = 8, codebookSize = 32, iters = 3)
    assert(refit.coarse.isEmpty)
    assert(sameBooks(refit.books, Pinned.pq.books))
  }

  test("Pinned.ivfPq equals a re-fit exactly (coarse + residual books)") {
    val refit = PqModel.fit(PqModel.sampleVectors(normed, 4096),
      m = 8, codebookSize = 32, iters = 3, nCoarse = 8, coarseIters = 3)
    assert(refit.coarse.get.indices.forall(i =>
      refit.coarse.get(i).sameElements(Pinned.ivfPq.coarse.get(i))))
    assert(sameBooks(refit.books, Pinned.ivfPq.books))
  }

  test("Pinned.ivfCentroids matches a distributed re-fit to 1e-9") {
    val refit = Similarity.fitCentroids(normed, k = 8, iters = 3)
    for (i <- refit.indices; d <- refit(i).indices)
      assert(math.abs(refit(i)(d) - Pinned.ivfCentroids(i)(d)) < 1e-9,
        s"centroid $i dim $d drifted")
  }

  test("Pinned.s40Centroids matches a distributed re-fit on the " +
       "lifecycle fit frame to 1e-9") {
    val refit = Similarity.fitCentroids(
      Similarity.s40FitFrame(spark, "/root/testdata/sf0.01"),
      k = 8, iters = 3)
    for (i <- refit.indices; d <- refit(i).indices)
      assert(math.abs(refit(i)(d) - Pinned.s40Centroids(i)(d)) < 1e-9,
        s"s40 centroid $i dim $d drifted")
  }

  test("Pinned.semCells equals a re-fit exactly (pure-function Lloyd)") {
    val refit = PqModel.lloyd(PqModel.sampleVectors(normed, 4096), 8, 3)
    assert(refit.indices.forall(i =>
      refit(i).sameElements(Pinned.semCells(i))))
  }

  test("Pinned.opqRotation aligns with a PCA re-fit; opqBooks exact given the rotation") {
    val rot = Pca.fit(normed, dim = 64, k = 64).components
    for (i <- 0 until 64) {
      // loose per-axis tolerance: the bulk spectrum is near-degenerate,
      // so adjacent axes are ill-conditioned under the moment sums'
      // partition-order ulps (see PcaSpec's drift law note)
      val d = rot(i).zip(Pinned.opqRotation(i)).map { case (a, b) => a * b }.sum
      assert(d > 0.999, s"rotation row $i drifted: <fit, pinned> = $d")
    }
    // given the PINNED rotation literals, the codebook fit is again a
    // pure function — exact equality required
    val refit = PqModel.fit(
      PqModel.sampleVectors(
        Similarity.rotatedFrame(normed, Pinned.opqRotation, 8), 4096),
      m = 8, codebookSize = 32, iters = 3)
    assert(sameBooks(refit.books, Pinned.opqBooks.books))
  }

  test("Pinned.s03cAnchors equals the runtime anchor selection exactly") {
    // the s03c oracle replays this list in place of Spark's xxhash64 —
    // any drift between fixture and runtime selection would surface as
    // a phantom hash mismatch at the driver gate, so pin it here
    val runtime = Similarity.lshAnchorIds(spark, "/root/testdata/sf0.01",
      nPlanes = 4, bucketCap = 8).collect().map(_.getLong(0))
    assert(runtime.sameElements(Pinned.s03cAnchors),
      s"anchor drift: runtime ${runtime.length} ids vs fixture ${Pinned.s03cAnchors.length}")
  }

  test("s03c: the cap is ENGAGED at sf0.01 — registered pair set strictly smaller, subset of uncapped") {
    // the whole point of s03c: unlike s03/d09/s14 (cap no-op at gate
    // scale), the driver-verified query must exercise the capped path
    val dir = "/root/testdata/sf0.01"
    def pairs(cap: Int) =
      Similarity.lshPairs(spark, dir, threshold = 0.3, nPlanes = 4, bucketCap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val capped = pairs(8)
    val uncapped = pairs(Int.MaxValue)
    assert(capped.size < uncapped.size,
      s"cap did not engage: ${capped.size} == ${uncapped.size}")
    assert(capped.subsetOf(uncapped), "capped pairs must be exact-cos subset")
    // anchors cover every bucket: some pairs must survive
    assert(capped.nonEmpty)
  }
}
