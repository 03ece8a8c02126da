package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev aid: print a registered query's result (full, truncate=false)
  * at SPARK_GRAFT_SF_DIR — the quickest way to eyeball a new
  * operator's rows before wiring its oracle. */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { name =>
      println(s"==== $name @ $dir ====")
      graft.SparkEntry.queries(name)(spark, dir).show(100, false)
    }
    spark.stop()
  }
}
