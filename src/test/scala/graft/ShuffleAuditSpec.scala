package graft

import org.apache.spark.sql.functions._
import graft.tools.ShuffleAudit

class ShuffleAuditSpec extends SparkSuite {
  import spark.implicits._

  test("metric keys still live: a groupBy reads nonzero shuffle " +
       "bytes/records, a pure projection reads zero, a parquet scan " +
       "reads nonzero filesSize (canary for Spark metric-key renames)") {
    val df = (1L to 10000L).toDF("id")
      .groupBy((col("id") % 64).as("k")).agg(count(lit(1)).as("n"))
    val m = ShuffleAudit.audit(df)
    assert(m("shuffle_bytes") > 0, s"shuffleBytesWritten key dead: $m")
    assert(m("shuffle_records") > 0, s"shuffleRecordsWritten key dead: $m")
    val p = ShuffleAudit.audit((1L to 100L).toDF("id").select(col("id") + 1))
    assert(p("shuffle_bytes") == 0, s"pure projection shuffled: $p")
    val scan = Tables.t(spark, sf, "region").select("r_regionkey")
    assert(ShuffleAudit.audit(scan)("scan_bytes") > 0, "filesSize key dead")
  }
}
