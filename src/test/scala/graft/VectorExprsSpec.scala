package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorExprs.dot

class VectorExprsSpec extends SparkSuite {
  import spark.implicits._

  test("dot product: correct, null-safe, length-mismatch-tolerant") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),       // 4+10+18 = 32
      (Seq(1.0, 2.0), Seq(3.0))                       // min-length: 3
    ).toDF("a", "b")
    assert(df.select(dot(col("a"), col("b"))).as[Double].collect().toSeq
      == Seq(32.0, 3.0))
    val withNull = Seq((Some(Seq(1.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(withNull.select(dot(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("dot product matches the interpreted HOF formulation bit-for-bit") {
    val df = Tables.t(spark, sf, "embeddings")
      .select(transform(col("embedding"), _.cast("double")).as("v"))
    val hof = df.select(
      aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)).as[Double].collect()
    val gen = df.select(dot(col("v"), col("v"))).as[Double].collect()
    assert(hof.toSeq == gen.toSeq, "same sequential sum order ⇒ identical doubles")
  }

  test("graft_dot registers as a SQL function on a live session") {
    GraftExtensions.register(spark)
    val out = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].collect()
    assert(out.toSeq == Seq(11.0))
  }
}
