package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSuite {
  import spark.implicits._

  test("saltedJoin equals the plain join on a skewed key distribution") {
    // hot key: 90% of rows share user 1
    val big = (1L to 1000L).map(i => (if (i <= 900) 1L else i % 50, i))
      .toDF("k", "row_id")
    val dim = (0L until 50L).map(k => (k, s"name_$k")).toDF("k", "name")
    val plain = big.join(dim, "k").select("row_id", "name")
      .orderBy("row_id").collect()
    val salted = Skew.saltedJoin(big, dim, "k", "row_id", salts = 8)
      .select("row_id", "name").orderBy("row_id").collect()
    assert(salted.sameElements(plain))
    assert(salted.length == 1000)
  }

  test("saltedCount equals plain groupBy count") {
    val df = Tables.t(spark, sf, "orders")
    val plain = df.groupBy("o_custkey").count()
      .orderBy("o_custkey").as[(Long, Long)].collect().toSeq
    val salted = Skew.saltedCount(df, "o_custkey", "o_orderkey", salts = 16)
      .orderBy("o_custkey").as[(Long, Long)].collect().toSeq
    assert(salted == plain)
  }

  test("AQE splits a skewed sort-merge join partition (skew=true in plan)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // testdata is KBs, the production defaults are 256MB — scale the
      // thresholds down so the same detection logic fires
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // one key owns ~95% of rows, with a fat payload per row
      val big = (1L to 20000L)
        .map(i => (if (i <= 19000) 7L else i % 100, i, "x" * 64))
        .toDF("k", "row_id", "pad")
      val dim = (0L until 100L).map(k => (k, s"name_$k")).toDF("k", "name")
      val joined = big.join(dim, "k").select("row_id", "name")
      // collect() drives THIS Dataset's queryExecution (count() would
      // execute a different, aggregated plan and leave this one unrun,
      // so AQE would never finalize it)
      assert(joined.collect().length == 20000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected an AQE-split skewed join in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("salt assignment is deterministic across evaluations") {
    val df = (1L to 100L).map(i => (1L, i)).toDF("k", "row_id")
    val dim = Seq((1L, "x")).toDF("k", "name")
    val a = Skew.saltedJoin(df, dim, "k", "row_id", 4).count()
    val b = Skew.saltedJoin(df, dim, "k", "row_id", 4).count()
    assert(a == 100 && b == 100)
  }
}
