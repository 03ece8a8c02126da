package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Similarity

/** Dev tool: sweep the s17/s19 graph-ANN recall dials (nTables × beam ×
  * hops × NN-descent rounds, against the autoNPlanes occupancy dial) and
  * the s23 mining dials at a given SF — the evidence run behind the
  * BASELINE.md second-decade recall table. The r16 finding this probes:
  * at N = 200k the plane dial alone holds occupancy but recall@3 falls
  * to 0.60 — the fixed nTables=6 / beam=8 budget becomes binding.
  *
  * Usage:
  *   runMain graft.tools.AnnSweepProbe <sfDir> [nQ] [cfg...]
  * cfg grammar (s17/s19 arm): t<nTables>b<beam>h<hops>r<rounds>[p<planes>]
  * cfg grammar (s23 arm):     m<nTables>[p<planes>]
  * Defaults probe a 3×3 grid at r=0 plus refinement arms.
  */
object AnnSweepProbe {
  private val S17Cfg = "t(\\d+)b(\\d+)h(\\d+)r(\\d+)(?:p(\\d+))?(?:e(\\d+))?".r
  private val S23Cfg = "m(\\d+)(?:p(\\d+))?".r

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("testdata-sf10")
    val nQ = args.drop(1).headOption.flatMap(a => scala.util.Try(a.toInt).toOption).getOrElse(20)
    val cfgs: Seq[String] =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("t6b8h4r0", "t10b8h4r0", "t16b8h4r0",
        "t6b16h4r0", "t6b32h4r0", "t6b16h6r0", "t10b16h6r0",
        "t6b8h4r1", "t6b16h6r1", "t6b16h6r2",
        "m12", "m16")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val s17Cfgs = cfgs.filter(S17Cfg.pattern.matcher(_).matches())
    val s23Cfgs = cfgs.filter(S23Cfg.pattern.matcher(_).matches())

    if (s17Cfgs.nonEmpty) {
      val t0 = System.nanoTime
      val exact = Similarity.annBruteForce(spark, dir, nQueries = nQ)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      println(f"[sweep] $dir exact truth (nQ=$nQ): ${(System.nanoTime - t0) / 1e9}%.1f s")
      s17Cfgs.foreach { case S17Cfg(t, b, h, r, p, e) =>
        val nP = Option(p).map(_.toInt)
        val nE = Option(e).map(_.toInt).getOrElse(4)
        val runs = (1 to 2).map { _ =>
          val w0 = System.nanoTime
          // r=0 measures the REGISTERED s17 shape (annGraphLsh — no
          // candidate-set checkpoint); r>0 the s19 refine path
          val out = (if (r.toInt == 0)
            Similarity.annGraphLsh(spark, dir, nTables = t.toInt,
              nPlanes = nP, beam = Some(b.toInt), hops = Some(h.toInt),
              nQueries = nQ, nEntries = nE)
          else
            Similarity.annGraphLshRefined(spark, dir,
              rounds = r.toInt, nTables = t.toInt, nPlanes = nP,
              beam = Some(b.toInt), hops = Some(h.toInt), nQueries = nQ,
              nEntries = nE)).collect()
          ((System.nanoTime - w0) / 1e9, out)
        }
        val got = runs.head._2.map(x => (x.getLong(0), x.getLong(2))).toSet
        val recall = got.intersect(exact).size.toDouble / exact.size
        println(f"[sweep] $dir s17 t=$t b=$b h=$h r=$r p=${nP.getOrElse(-1)} e=$nE: " +
          f"${runs.map(_._1).min}%.2f s min-of-2, recall@3 $recall%.3f")
      }
    }

    if (s23Cfgs.nonEmpty) {
      val nSrc = graft.Tables.t(spark, dir, "embeddings")
        .filter(org.apache.spark.sql.functions.expr("label % 2 = 0")).count()
      s23Cfgs.foreach { case S23Cfg(t, p) =>
        val nP = Option(p).map(_.toInt)
        val runs = (1 to 2).map { _ =>
          val w0 = System.nanoTime
          val out = Similarity.bitextMineLsh(spark, dir,
            nTables = t.toInt, nPlanes = nP).collect()
          ((System.nanoTime - w0) / 1e9, out)
        }
        val covered = runs.head._2.length.toDouble / nSrc
        println(f"[sweep] $dir s23 t=$t p=${nP.getOrElse(-1)}: " +
          f"${runs.map(_._1).min}%.2f s min-of-2, source coverage $covered%.3f")
      }
    }
    spark.stop()
  }
}
