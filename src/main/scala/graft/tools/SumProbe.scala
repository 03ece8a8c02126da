package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Full-materialization timing probe: drives each named query with a
  * checksum aggregate over ALL its columns (count() alone lets
  * Catalyst prune left-join branches — a 0 s "cost" for join-shaped
  * reports). */
object SumProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { name =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(name)(spark, dir)
        df.select(xxhash64(df.columns.map(col): _*).as("h"))
          .agg(bit_xor(col("h"))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name -> min-of-3 ${times.min}%.3f s (all ${times.map(t => f"$t%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
