package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at
  * `SPARK_GRAFT_SF_DIR` and emits ONE machine-parsable JSON line, plus
  * the SAME JSON to a file (`SPARK_GRAFT_BENCH_OUT`, default
  * `bench_results.json` in the cwd) — the external driver's tail
  * capture truncates lines near 2000 chars, so the file is the
  * authoritative artifact and the printed line is a fallback kept
  * short by rounding timings to milliseconds.
  *
  * `SPARK_GRAFT_ONLY=x03,d0` runs only queries whose name starts with
  * one of the comma-separated prefixes, and `SPARK_GRAFT_REPEAT=5`
  * times each query N times reporting the MINIMUM. REPEAT defaults to
  * 2 (not 1): min-of-2 filters the sandbox's scheduler-contention
  * spikes that have repeatedly produced phantom 4× "regressions" in
  * single-shot driver runs (r1 d06 50s→3.9s on immediate replay; r4
  * s09 9.8 vs 2.5 local; r5 x03 4.1 vs 0.83 local) at the cost of one
  * extra pass. The JSON carries `repeat` so rounds stay comparable.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_results.json")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session once (parquet reader init, codegen of common
    // stages) so the first timed query doesn't absorb ~5s of one-time
    // JVM/janino startup that isn't the query's own cost. One tiny
    // query per table family at the SMALLEST available sf: the
    // alphabetically-first timed queries (d01/d02) were otherwise
    // paying ~2s of documents-path/kernel warm-up that belongs to the
    // session, not to them (measured: d01 2.3s first-in-suite vs 0.37s
    // warm). The smoke dir derives from SPARK_GRAFT_SF_DIR's parent
    // (overridable via SPARK_GRAFT_SMOKE_DIR), falling back to the
    // bench dir itself — no hardcoded path. Each smoke query gets its
    // OWN try/catch so one missing table can't silently skip the rest
    // and push its warm-up cost back onto the first timed query of
    // that family.
    val smoke = sys.env.get("SPARK_GRAFT_SMOKE_DIR").getOrElse {
      val sibling = java.nio.file.Paths.get(sfDir).toAbsolutePath
        .getParent.resolve("sf0.001")
      if (java.nio.file.Files.isDirectory(sibling)) sibling.toString else sfDir
    }
    def smokeRun(body: => Unit): Unit =
      try body catch { case _: Throwable => () }
    smokeRun(SparkEntry.entry(spark).count()) // events
    smokeRun(SparkEntry.queries("d02_minhash_lsh")(spark, smoke).count()) // documents + sketch kernels
    smokeRun(SparkEntry.queries("s01_ann_bruteforce")(spark, smoke).count()) // embeddings + dot kernel
    smokeRun(SparkEntry.queries("q01_pricing_summary")(spark, smoke).count()) // lineitem
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2").toInt.max(1)
    val results = selected.map { case (name, fn) =>
      val times = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
              .replaceAll("[\"\\\\\\n\\r\\t]", " ").take(200)
            false
          }
        // A failed query must not masquerade as a fast success: report
        // -1 instead of the elapsed time of the failed attempt.
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    def ms(v: Double): String =
      if (v < 0) "-1" else (math.round(v * 1000) / 1000.0).toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"\"$k\":\"$v\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json = s"""{"metric":"total","value":${ms(total)},"unit":"sec","repeat":$repeat,"queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (json + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"bench: could not write $outPath: ${e.getMessage}")
    }
    // Append-only history beside the overwritten-per-run artifact: the
    // per-round BENCH_rNN.json tail capture truncates at ~2000 chars
    // (losing the front of the query map), and bench_results.json is
    // clobbered by every run — this file keeps every full run line so
    // rounds stay comparable query-by-query.
    try {
      val hist = java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_HISTORY", "bench_history.jsonl"))
      val stamped = json.dropRight(1) +
        s""","ts":"${java.time.Instant.now()}"}"""
      java.nio.file.Files.write(hist, (stamped + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case e: Throwable =>
      System.err.println(s"bench: could not append history: ${e.getMessage}")
    }
    println(json)
    spark.stop()
  }
}
