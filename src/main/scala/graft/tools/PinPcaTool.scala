package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Pca

/** Dev tool: regenerate the [[graft.operators.Pca.pinnedModel]]
  * fixture (fit at sf0.01, printed as Scala literals). Run with
  * `sbt "runMain graft.tools.PinPcaTool"` and paste the output. */
object PinPcaTool {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val vecs = graft.Tables.t(spark, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val m = Pca.fit(vecs, dim = 64, k = 4)
    def lit(a: Array[Double]): String = a.mkString("Array(", ", ", ")")
    println("PINNED_MEAN = " + lit(m.mean))
    m.components.zipWithIndex.foreach { case (c, i) =>
      println(s"PINNED_COMP_$i = " + lit(c))
    }
    println("PINNED_EIGS = " + lit(m.eigenvalues))
    spark.stop()
  }
}
