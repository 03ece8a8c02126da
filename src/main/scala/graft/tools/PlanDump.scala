package graft.tools
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, dir)
      println(s"==== $name ====")
      df.count() // drive AQE to final plan
      println(df.queryExecution.executedPlan.toString.take(7000))
    }
    spark.stop()
  }
}
