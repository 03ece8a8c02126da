package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Warehouse table access. Tables are hive-less parquet files laid out as
  * `dir/<name>.parquet` (see /root/repo/TESTDATA.md). Reading through
  * `spark.read.parquet` keeps the scan columnar + vectorized and lets
  * Catalyst push filters and prune columns down to the parquet reader —
  * the property we rely on for the 100 TB design point.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The events.ts column has shipped as parquet TIMESTAMP(NANOS) —
    // unreadable in Spark 4 unless surfaced as a long — and as
    // TIMESTAMP(MICROS) without timezone — surfaced as TIMESTAMP_NTZ,
    // which watermarks and unix_micros reject. Normalize BOTH physical
    // encodings to session-tz TimestampType here, and FORCE the
    // session timezone to UTC the same way the legacy flag is forced:
    // the NTZ→TimestampType cast reinterprets wall-clock time in the
    // session zone, so the two encodings only read identical instants
    // under UTC — a caller in another zone would silently read
    // shifted timestamps.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
        acc.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      else if (f.name == "ts" &&
          f.dataType == org.apache.spark.sql.types.TimestampNTZType)
        acc.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      else acc
    }
  }

  /** Register every table as a temp view so `spark.sql(...)` works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
