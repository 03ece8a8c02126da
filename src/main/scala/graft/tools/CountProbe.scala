package graft.tools
import org.apache.spark.sql.SparkSession
/** Row-count probe for scale analysis: prints name -> count at
  * SPARK_GRAFT_SF_DIR for each named query. */
object CountProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { name =>
      println(s"$name -> ${graft.SparkEntry.queries(name)(spark, dir).count()}")
    }
    spark.stop()
  }
}
