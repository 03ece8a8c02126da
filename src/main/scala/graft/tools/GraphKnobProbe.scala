package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Similarity

/** Dev tool: measure the s17 graph-ANN nPlanes dial at a given SF —
  * the in-bucket candidate volume is ~N²/2^nPlanes per table, so the
  * documented deployment response to a bigger corpus is more planes,
  * and this probe is the evidence run behind BASELINE.md's s17 row.
  *
  * Usage: runMain graft.tools.GraphKnobProbe <sfDir> [nPlanes...]
  */
object GraphKnobProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("testdata-sf1")
    val planes = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(6, 8, 9)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val exact = Similarity.annBruteForce(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    // None = the registered default: the autoNPlanes occupancy dial.
    // Probing it alongside the explicit points shows what a user who
    // passes nothing actually gets at this SF.
    (planes.map(Option(_)) :+ None).foreach { nP =>
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime
        val out = Similarity.annGraphLsh(spark, dir, nPlanes = nP).collect()
        ((System.nanoTime - t0) / 1e9, out)
      }
      val got = runs.head._2.map(r => (r.getLong(0), r.getLong(2))).toSet
      val recall = got.intersect(exact).size.toDouble / exact.size
      val label = nP.map(_.toString).getOrElse("auto")
      println(f"[knob] $dir nPlanes=$label: ${runs.map(_._1).min}%.2f s min-of-2, recall@3 vs exact $recall%.2f")
    }
    // s23's MINING-tuned dial (occupancy 2^4): the same probe shape —
    // wall + source coverage per explicit setting and for the
    // registered auto default. Coverage = mined sources / side size
    // (the dial must not starve sources of candidates).
    val nSrc = graft.Tables.t(spark, dir, "embeddings")
      .filter(org.apache.spark.sql.functions.expr("label % 2 = 0")).count()
    (planes.map(Option(_)) :+ None).foreach { nP =>
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime
        val out = Similarity.bitextMineLsh(spark, dir, nPlanes = nP).collect()
        ((System.nanoTime - t0) / 1e9, out)
      }
      val covered = runs.head._2.length.toDouble / nSrc
      val label = nP.map(_.toString).getOrElse("auto")
      println(f"[knob] $dir s23 nPlanes=$label: ${runs.map(_._1).min}%.2f s min-of-2, source coverage $covered%.2f")
    }
    spark.stop()
  }
}
