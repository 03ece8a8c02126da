package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: d13's honest decade-scaling measurement.
  *
  * The registered d13 runs over `customer.c_name`, and the sf1 derive
  * (ScaleUpTool) replicates each name VERBATIM 10× (only keys are
  * remapped) — so the registered query at sf1 measures the dup-blob
  * artifact the ScaleUpTool scaladoc warns about for near-dup
  * families (each 10-copy name family alone contributes C(10,2)
  * distance-0 pairs; output grows ~14×, not 10×). This probe
  * REGENERATES the name from the remapped key (`Customer#%09d`, the
  * TPC-H format) so the sf1 corpus has 10× DISTINCT entities — the
  * actual 100 TB question — and times [[graft.operators.Dedup
  * .fuzzyPairs]] min-of-N on both SFs.
  *
  * Usage: runMain graft.tools.FuzzyScaleProbe [repeat]
  */
object FuzzyScaleProbe {
  def main(args: Array[String]): Unit = {
    val repeat = if (args.nonEmpty) args(0).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def names(dir: String): DataFrame =
      graft.Tables.t(spark, dir, "customer")
        .select(col("c_custkey").as("id"),
          concat(lit("Customer#"),
            lpad(col("c_custkey").cast("string"), 9, "0")).as("name"))

    for (dir <- Seq("/root/testdata/sf0.1", "/root/repo/testdata-sf1")) {
      val n = names(dir).count()
      val times = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        val rows = graft.operators.Dedup.fuzzyPairs(names(dir)).count()
        (System.nanoTime() - t0) / 1e9 -> rows
      }
      val best = times.map(_._1).min
      println(f"[fuzzy-probe] $dir: $n%d names, " +
        f"${times.head._2}%d pairs, min-of-$repeat%d ${best}%.2f s")
    }
    spark.stop()
  }
}
