package graft

import org.apache.spark.sql.functions._

/** Plan-level proof that Catalyst's runtime Bloom-filter injection
  * (`InjectRuntimeFilter`) fires on our join shapes — the 100 TB lever
  * that prunes the fact-table scan down to rows whose join key passes a
  * Bloom filter built from the selective dimension side, BEFORE the
  * shuffle. Thresholds are tuned down because testdata is tiny; on a
  * real cluster the defaults (10 MB creation side / 10 GB application
  * side) describe exactly the dim⋈fact case.
  */
class RuntimeFilterSpec extends SparkSuite {

  test("selective dim filter injects a bloom_filter probe on the fact scan") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // force a shuffle join — a broadcast join already prunes via its
      // broadcast relation, so no runtime filter would be needed
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val orders = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT") // selective creation side
      val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      val joined = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a bloom_filter runtime probe in:\n$plan")
      assert(joined.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
