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
    val m = ShuffleAudit.audit(spark)(df)
    assert(m("shuffle_bytes") > 0, s"shuffleBytesWritten key dead: $m")
    assert(m("shuffle_records") > 0, s"shuffleRecordsWritten key dead: $m")
    val p = ShuffleAudit.audit(spark)(
      (1L to 100L).toDF("id").select(col("id") + 1))
    assert(p("shuffle_bytes") == 0, s"pure projection shuffled: $p")
    val scan = Tables.t(spark, sf, "region").select("r_regionkey")
    assert(ShuffleAudit.audit(spark)(scan)("scan_bytes") > 0,
      "filesSize key dead")
  }

  test("listener totals see through localCheckpoint: the plan walk " +
       "reads 0 for a checkpointed groupBy, the all-jobs total does not " +
       "(the r17 under-report fix)") {
    // construction must happen INSIDE the by-name audit argument —
    // the eager localCheckpoint runs its jobs at build time
    val m = ShuffleAudit.audit(spark)(
      (1L to 10000L).toDF("id")
        .groupBy((col("id") % 64).as("k")).agg(count(lit(1)).as("n"))
        .localCheckpoint()
        .select(sum(col("n")).as("tot")))
    // the checkpoint truncated the plan: the groupBy exchange is
    // invisible to the plan-metric walk...
    assert(m("shuffle_bytes") < m("shuffle_bytes_all_jobs"),
      s"listener total did not exceed the truncated plan walk: $m")
    // ...but the listener counted it
    assert(m("shuffle_bytes_all_jobs") > 0, s"listener saw no shuffle: $m")
  }
}
