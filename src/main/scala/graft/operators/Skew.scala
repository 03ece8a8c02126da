package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the manual counterpart to AQE's
  * skew-join splitting, for when a single key is hot enough that even
  * one post-split partition overwhelms an executor (the classic 100 TB
  * failure mode: one viral document id, one null-ish default key).
  *
  * Salting trades a bounded replication of the small side for an even
  * redistribution of the hot side:
  *  - join: hot side gets a deterministic salt in [0, salts); the small
  *    side is replicated once per salt; the join key becomes
  *    (key, salt). Shuffle partitions per key grow from 1 to `salts`.
  *  - aggregation: partial-aggregate on (key, salt), then final on key.
  *    (Spark's map-side partial aggregation already does this for
  *    algebraic aggs; the explicit form is for when the partial state
  *    itself is the bottleneck, e.g. huge collect_set state per key.)
  *
  * Salts are deterministic (hash of a stable id column, not rand()), so
  * retried tasks produce identical output — required for exactly-once
  * sinks and reproducible tests.
  */
object Skew {

  /** Inner equi-join where `skewed` has hot values of `key`: salt the
    * hot side, replicate `small` across all salts, join on (key, salt).
    * `idCol` must be a stable per-row column of `skewed` (any type) —
    * it seeds the deterministic salt. */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
                 idCol: String, salts: Int): DataFrame = {
    val saltedBig = skewed.withColumn("__salt",
      pmod(xxhash64(col(idCol)), lit(salts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted count per key: partial on (key, salt), final on
    * key. Result is identical to a plain groupBy count. */
  def saltedCount(df: DataFrame, key: String, idCol: String,
                  salts: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(idCol)), lit(salts)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(key)
      .agg(sum("__partial").as("n"))
}
