package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** End-to-end corpus curation: the composition a training-data user
  * actually runs — quality filter → exact dedup → train/val/test split
  * — chained from the library's own operators, reported as a funnel of
  * counts per stage. Every stage is a narrow transform or a single
  * hash-shuffle; the funnel is what you'd watch in production to catch
  * a filter suddenly eating the corpus. */
object Curation {

  def curationFunnel(s: SparkSession, dir: String,
                     qualityMin: Double = 0.5): DataFrame = {
    val quality = TextOps.qualityScore(s, dir).select(col("doc_id"), col("quality"))
    // localCheckpoint: the funnel's four count branches all re-read this
    // subtree; blocks are auto-released when the returned plan is GC'd
    // (cache() entries would accumulate across invocations)
    val docs = t(s, dir, "documents")
      .join(quality, "doc_id")
      .withColumn("fp",
        md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))))
      .localCheckpoint()
    val passing = docs.filter(col("quality") >= qualityMin)
    val keepers = passing.groupBy("fp").agg(min("doc_id").as("doc_id"))
    val split = Sampling.deterministicSplit(keepers, "doc_id")

    def stage(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("stage"), col("n"))

    stage("1_raw", docs)
      .unionByName(stage("2_quality_pass", passing))
      .unionByName(stage("3_dedup_keepers", keepers))
      .unionByName(
        split.groupBy("split").agg(count(lit(1)).as("n"))
          .select(concat(lit("4_"), col("split")).as("stage"), col("n")))
      .orderBy("stage")
  }
}
