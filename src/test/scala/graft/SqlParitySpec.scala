package graft

import org.apache.spark.sql.DataFrame

/** The reference delegates its whole query surface to SQL text
  * (README.md:2 — BigQuery). This spec proves that surface is reachable
  * in the engine through `spark.sql(...)` over [[Tables.registerAll]]'s
  * views and yields frames IDENTICAL to the DataFrame API forms —
  * including the custom operators injected by [[GraftExtensions]]
  * (`graft_dot` as a SQL function, TopKStrategy for the top-k plan). */
class SqlParitySpec extends SparkSuite {

  Tables.registerAll(spark, sf)
  GraftExtensions.register(spark) // graft_dot on the live session
  graft.plans.TopKPerGroup.register(spark)

  /** Order-free frame fingerprint, columns sorted by name like the
    * driver's compare. */
  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toString).sorted.toSeq
  }

  private def assertParity(name: String, sql: String): Unit = {
    val viaSql = canon(spark.sql(sql))
    val viaDf = canon(SparkEntry.queries(name)(spark, sf))
    assert(viaSql.nonEmpty, s"$name SQL form returned no rows")
    assert(viaSql == viaDf, s"$name: SQL and DataFrame forms disagree")
  }

  test("q01 pricing summary: SQL text equals the DataFrame form") {
    // the oracle SQL doubles as the Spark SQL form — one dialect
    assertParity("q01_pricing_summary",
      SparkEntry.oracleSql("q01_pricing_summary"))
  }

  test("q05 region revenue: SQL text equals the DataFrame form") {
    assertParity("q05_region_revenue",
      SparkEntry.oracleSql("q05_region_revenue"))
  }

  test("q31: SQL window formulation equals the custom top-k plan") {
    assertParity("q31_topk_per_group",
      SparkEntry.oracleSql("q31_topk_per_group"))
  }

  test("graft_dot resolves in SQL text and matches the native expression") {
    val viaSql = spark.sql(
      """SELECT label, round(sum(graft_dot(embedding, embedding)), 4) AS sq_norm
         FROM embeddings GROUP BY label ORDER BY label""").collect()
    val viaDf = {
      import org.apache.spark.sql.functions._
      val e = Tables.t(spark, sf, "embeddings")
      val v = col("embedding").cast("array<double>")
      e.select(col("label"),
          graft.functions.VectorExprs.dot(v, v).as("d"))
        .groupBy("label").agg(round(sum(col("d")), 4).as("sq_norm"))
        .orderBy("label").collect()
    }
    assert(viaSql.nonEmpty && viaSql.sameElements(viaDf))
  }
}
