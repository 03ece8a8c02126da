package graft

import org.apache.spark.sql.functions._

import graft.plans.TopKPerGroup

class TopKPerGroupSpec extends SparkSuite {
  import spark.implicits._

  test("custom operator equals the window-function formulation") {
    val orders = Tables.t(spark, sf, "orders")
      .select("o_orderpriority", "o_orderkey", "o_totalprice")
    val custom = TopKPerGroup.topKPerGroup(orders,
        Seq("o_orderpriority"), Seq("o_totalprice" -> false, "o_orderkey" -> true), 5)
      .orderBy("o_orderpriority", "o_orderkey").collect().map(_.toString)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val window = orders.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5).drop("rk")
      .orderBy("o_orderpriority", "o_orderkey").collect().map(_.toString)
    assert(custom.nonEmpty && custom.sameElements(window))
  }

  test("plan has partial and final heap passes around one exchange") {
    val orders = Tables.t(spark, sf, "orders")
      .select("o_orderpriority", "o_orderkey")
    val df = TopKPerGroup.topKPerGroup(orders,
      Seq("o_orderpriority"), Seq("o_orderkey" -> true), 2)
    df.collect()
    // plan.collect doesn't descend into AQE query stages — assert on the
    // rendered tree instead (partial pass prints "..., true", final
    // "..., false", with the required exchange between them)
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerGroup .*true".r.findFirstIn(plan).isDefined,
      s"expected a partial TopKPerGroupExec in:\n$plan")
    assert("TopKPerGroup .*false".r.findFirstIn(plan).isDefined,
      s"expected a final TopKPerGroupExec in:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(o_orderpriority"),
      "final pass must demand a hash exchange on the group key")
  }

  test("ascending, descending, k larger than group, and ties by tiebreak") {
    val df = Seq(("a", 3L, 1.0), ("a", 1L, 2.0), ("a", 2L, 2.0), ("b", 9L, 5.0))
      .toDF("g", "id", "v")
    val top2 = TopKPerGroup.topKPerGroup(df, Seq("g"),
        Seq("v" -> false, "id" -> true), 2)
      .orderBy("g", "id").collect().map(r => (r.getString(0), r.getLong(1)))
    // group a: v=2.0 twice → tiebreak id asc keeps ids 1 and 2;
    // group b has 1 < k rows → kept whole
    assert(top2.toSeq == Seq(("a", 1L), ("a", 2L), ("b", 9L)))
  }

  test("unknown column fails fast") {
    val df = Seq(("a", 1)).toDF("g", "x")
    intercept[IllegalArgumentException] {
      TopKPerGroup.topKPerGroup(df, Seq("nope"), Seq("x" -> true), 1)
    }
  }

  test("high-cardinality group key equals the window formulation") {
    // per-customer top-k: ~1 group per 1.5 rows at sf0.001 — the shape
    // the capped partial map + streaming final pass exist for
    val orders = Tables.t(spark, sf, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val custom = TopKPerGroup.topKPerGroup(orders,
        Seq("o_custkey"), Seq("o_totalprice" -> false, "o_orderkey" -> true), 2)
      .orderBy("o_custkey", "o_orderkey").collect().map(_.toString)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val window = orders.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2).drop("rk")
      .orderBy("o_custkey", "o_orderkey").collect().map(_.toString)
    assert(custom.nonEmpty && custom.sameElements(window))
  }

  test("partial-map cap: overflow groups pass through unreduced, result unchanged") {
    // cap = 1 forces every partition to pass almost all rows through
    // un-combined — the final pass must still produce the exact answer
    spark.conf.set("spark.graft.topk.maxPartialGroups", "1")
    try {
      val orders = Tables.t(spark, sf, "orders")
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
      val capped = TopKPerGroup.topKPerGroup(orders,
          Seq("o_orderpriority"), Seq("o_totalprice" -> false, "o_orderkey" -> true), 5)
        .orderBy("o_orderpriority", "o_orderkey").collect().map(_.toString)
      spark.conf.unset("spark.graft.topk.maxPartialGroups")
      val uncapped = TopKPerGroup.topKPerGroup(orders,
          Seq("o_orderpriority"), Seq("o_totalprice" -> false, "o_orderkey" -> true), 5)
        .orderBy("o_orderpriority", "o_orderkey").collect().map(_.toString)
      assert(capped.nonEmpty && capped.sameElements(uncapped))
    } finally spark.conf.unset("spark.graft.topk.maxPartialGroups")
  }

  test("empty groupCols = global top-k") {
    val orders = Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice")
    val global = TopKPerGroup.topKPerGroup(orders, Nil,
        Seq("o_totalprice" -> false, "o_orderkey" -> true), 7)
      .collect().map(r => r.getLong(0)).sorted
    val expected = orders.orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(7).collect().map(r => r.getLong(0)).sorted
    assert(global.sameElements(expected))
  }

  test("float group keys are normalized: -0.0 joins 0.0, NaN bit patterns unify") {
    // byte-wise key comparison would split these into 4 groups; the
    // normalized plan must see exactly 2 (0.0 and NaN)
    val altNaN = java.lang.Double.longBitsToDouble(0x7ff8000000000001L)
    val df = Seq((0.0, 1L), (-0.0, 2L), (Double.NaN, 3L), (altNaN, 4L))
      .toDF("g", "id").repartition(4) // spread keys across input partitions
    val top1 = TopKPerGroup.topKPerGroup(df, Seq("g"), Seq("id" -> true), 1)
      .collect().map(_.getLong(1)).sorted
    assert(top1.toSeq == Seq(1L, 3L),
      s"expected one row per logical group, got ids ${top1.toSeq}")
  }

  test("rows of each group are emitted in ranked order without an explicit orderBy") {
    val df = Seq(("a", 3L, 1.0), ("a", 1L, 9.0), ("a", 2L, 5.0),
                 ("b", 9L, 2.0), ("b", 8L, 7.0))
      .toDF("g", "id", "v")
    val rows = TopKPerGroup.topKPerGroup(df, Seq("g"), Seq("v" -> false, "id" -> true), 2)
      .collect().map(r => (r.getString(0), r.getDouble(2)))
    // within each group, v must be descending in emission order
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val vs = rs.map(_._2).toSeq
      assert(vs == vs.sorted.reverse, s"group $g emitted unranked: $vs")
    }
  }
}
