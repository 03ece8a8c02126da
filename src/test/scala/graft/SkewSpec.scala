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

  test("salt assignment is deterministic across evaluations") {
    val df = (1L to 100L).map(i => (1L, i)).toDF("k", "row_id")
    val dim = Seq((1L, "x")).toDF("k", "name")
    val a = Skew.saltedJoin(df, dim, "k", "row_id", 4).count()
    val b = Skew.saltedJoin(df, dim, "k", "row_id", 4).count()
    assert(a == 100 && b == 100)
  }
}
