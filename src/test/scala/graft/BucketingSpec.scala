package graft

import org.apache.spark.sql.functions._

/** Bucketed tables co-locate join keys at WRITE time, so a join on the
  * bucket key plans with ZERO shuffle — the 100 TB lever for repeated
  * big-to-big joins (lineitem ⋈ orders on orderkey every day forever).
  * This spec proves the property on the physical plan, not by timing. */
class BucketingSpec extends SparkSuite {

  test("join of two tables bucketed on the join key plans without a shuffle") {
    val db = "graft_bucketing_test"
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"CREATE DATABASE $db")
    // tiny test tables would broadcast — disable it so the planner
    // exercises the sort-merge path bucketing is designed for
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.t(spark, sf, "orders")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable(s"$db.orders_b")
      Tables.t(spark, sf, "lineitem")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable(s"$db.lineitem_b")

      val joined = spark.table(s"$db.lineitem_b")
        .join(spark.table(s"$db.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))

      // force execution so AQE settles on the final plan, then assert on
      // its rendering (collect() can't traverse into AQE query stages)
      val rows = joined.collect()
      assert(rows.nonEmpty)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans in:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
             !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not shuffle its inputs:\n$plan")

      // sanity: the same join on plain parquet DOES shuffle its inputs
      val unbucketed = Tables.t(spark, sf, "lineitem")
        .join(Tables.t(spark, sf, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      unbucketed.collect()
      val plainPlan = unbucketed.queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange hashpartitioning(l_orderkey") ||
             plainPlan.contains("Exchange hashpartitioning(o_orderkey"),
        "control: plain join should shuffle its inputs")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
