package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class DedupSpec extends SparkSuite {
  import spark.implicits._

  test("shingles: distinct 3-grams, short docs yield none") {
    val df = Seq("a b c d", "a b", "x y z x y z").toDF("text")
      .select(Dedup.shingles(col("text")).as("sh"))
    val out = df.collect().map(_.getSeq[String](0).toSet)
    assert(out(0) == Set("a b c", "b c d"))
    assert(out(1) == Set.empty)
    assert(out(2) == Set("x y z", "y z x", "z x y")) // distinct-ified
  }

  test("exact dedup keeps the smallest doc_id per fingerprint") {
    val out = Dedup.exactDedup(spark, sf)
    val n = out.count()
    assert(n > 0)
    // keeper is unique and counts sum to table size
    val total = out.agg(sum("n_copies")).as[Long].collect().head
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(total == docs)
  }

  test("minhash-LSH equals exact inverted-index Jaccard at threshold 0.7") {
    val lsh = Dedup.minhashLsh(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exact = Dedup.ngramJaccard(spark, sf).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(lsh.toSeq == exact.toSeq)
    assert(lsh.nonEmpty, "testdata plants near-dup pairs; LSH must find them")
  }

  test("dupClusters: connected pairs share a cluster labeled by the min id") {
    val pairs = Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = Dedup.dupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    // every cluster label is the smallest member of its component
    clusters.groupBy(_._2).foreach { case (lbl, members) =>
      assert(members.keys.min == lbl)
    }
  }

  test("dupClusters on a pair-free corpus returns empty, not an error") {
    // threshold 1.01 > any possible jaccard → zero pairs
    assert(Dedup.dupClusters(spark, sf, threshold = 1.01).count() == 0)
  }

  test("cappedNgramJaccard equals plain jaccard when the cap is never hit") {
    val capped = Dedup.cappedNgramJaccard(spark, sf, dfCap = Int.MaxValue)
      .collect().map(_.toSeq)
    val plain = Dedup.ngramJaccard(spark, sf).collect().map(_.toSeq)
    assert(capped.toSeq == plain.toSeq)
  }

  test("simhash pairs are a subset of exact near-dups at loose threshold") {
    val sim = Dedup.simhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccard(spark, sf, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim.nonEmpty)
    assert(sim.subsetOf(exact),
      s"simhash found non-near-dup pairs: ${sim.diff(exact).take(5)}")
  }
}
