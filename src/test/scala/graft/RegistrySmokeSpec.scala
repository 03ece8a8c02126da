package graft

/** Every registry entry must RUN — the driver's smoke gate only checks
  * `entry`, and a query that throws at sf0.01 silently drops out of the
  * correctness report. This catches a broken entry at test time.
  * Also asserts the column-name contract: every oracle key has a query,
  * and (spot-checked in the oracle gate) matching aliases. */
class RegistrySmokeSpec extends SparkSuite {

  test("flagship entry returns rows (the driver's t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every registered query runs at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("shuffle-partition count does not change results (batch invariance)") {
    val names = Seq("q05_region_revenue", "d02_minhash_lsh", "j01_asof_join")
    def run(name: String, parts: String): Seq[String] = {
      val before = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq
      } finally spark.conf.set("spark.sql.shuffle.partitions", before)
    }
    names.foreach { n =>
      assert(run(n, "1") == run(n, "7"), s"$n differs across partition counts")
    }
  }
}
