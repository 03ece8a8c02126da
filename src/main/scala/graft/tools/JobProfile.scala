package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev aid (r17): per-JOB wall-clock breakdown of a registered query —
  * tells overhead-dominated queries (many small eager-checkpoint jobs)
  * apart from compute-dominated ones (one big job), which is the first
  * branch in the optimization playbook (guide §1.1). For each query:
  * total wall, then one line per Spark job with duration, task count
  * and the job group/description if set.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.tools.JobProfile s17_ann_graph_lsh ..."
  */
object JobProfile {

  private final class JobListener
      extends org.apache.spark.scheduler.SparkListener {
    case class J(id: Int, var start: Long = 0L, var end: Long = 0L,
                 var nTasks: Int = 0, var nStages: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    override def onJobStart(
        e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      val j = J(e.jobId, e.time)
      j.nStages = e.stageInfos.size
      j.nTasks = e.stageInfos.map(_.numTasks).sum
      jobs.put(e.jobId, j)
    }
    override def onJobEnd(
        e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
      val j = jobs.get(e.jobId)
      if (j != null) j.end = e.time
    }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // one warm pass of the first query absorbs session/JIT cost
    try graft.Bench.drive(graft.SparkEntry.queries(args.head)(spark, dir))
    catch { case _: Throwable => () }
    args.foreach { name =>
      val lst = new JobListener
      spark.sparkContext.addSparkListener(lst)
      val t0 = System.nanoTime()
      graft.Bench.drive(graft.SparkEntry.queries(name)(spark, dir))
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftglue.drainListenerBus(spark)
      spark.sparkContext.removeSparkListener(lst)
      import scala.jdk.CollectionConverters._
      val js = lst.jobs.values.asScala.toSeq.sortBy(_.id)
      val jobSum = js.map(j => (j.end - j.start) / 1e3).sum
      println(f"==== $name wall=$wall%.2fs jobs=${js.size} jobSum=$jobSum%.2fs")
      js.foreach { j =>
        println(f"  job ${j.id}%3d  ${(j.end - j.start) / 1e3}%6.2fs  " +
          f"stages=${j.nStages}%2d tasks=${j.nTasks}%4d")
      }
    }
    spark.stop()
  }
}
