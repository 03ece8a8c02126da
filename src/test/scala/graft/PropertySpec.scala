package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.functions.Hashing
import graft.operators.{Multimodal, Normalize}

/** Property-based laws (SURVEY.md §5.3): partition-count invariance,
  * normalization round-trips, kernel determinism. Pure-JVM kernels are
  * checked with ScalaCheck generators (driven directly — the scalatest
  * bridge artifact isn't on the classpath); Spark-level invariances
  * with targeted repartitionings (a full generator per plan would spin
  * up hundreds of jobs for no extra coverage).
  */
class PropertySpec extends AnyFunSuite {

  /** Minimal forAll: 100 samples from the generator. */
  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit = {
    val seed0 = org.scalacheck.rng.Seed(42L)
    Iterator.iterate(seed0)(_.next).take(100).foreach { seed =>
      gen.apply(Gen.Parameters.default, seed).foreach(f)
    }
  }

  private lazy val spark = SparkSuite.session
  private val sf = "/root/testdata/sf0.001"

  // ---- kernel laws (no Spark needed) ----

  private val tokenGen = Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))

  test("shingleHashes: deterministic, distinct, size = max(0, tokens-2) pre-dedup") {
    forAll(tokenGen) { toks =>
      val text = toks.mkString(" ")
      val a = Hashing.shingleHashes(text, 3)
      val b = Hashing.shingleHashes(text, 3)
      assert(a.toSeq == b.toSeq, "deterministic")
      assert(a.distinct.length == a.length, "de-duplicated")
      if (toks.length < 3) assert(a.isEmpty)
      else assert(a.length <= toks.length - 2 && a.nonEmpty)
    }
  }

  test("simhash of identical shingle multisets is identical; order-independent") {
    forAll(Gen.nonEmptyListOf(Gen.long)) { hs =>
      assert(Hashing.simhash64(hs) == Hashing.simhash64(hs.reverse))
    }
  }

  test("minhash band keys: permutation-invariant in shingle order, 16 bands") {
    forAll(Gen.nonEmptyListOf(Gen.long)) { hs =>
      val a = Hashing.minhashBandKeys(hs)
      val b = Hashing.minhashBandKeys(scala.util.Random.shuffle(hs))
      assert(a.toSeq == b.toSeq, "min over a set ignores order")
      assert(a.length == Hashing.Bands)
    }
  }

  test("identical docs collide in every band; decoder output is a distribution") {
    forAll(tokenGen.suchThat(_.length >= 3)) { toks =>
      val h = Hashing.shingleHashes(toks.mkString(" "), 3)
      assert(Hashing.minhashBandKeys(h).toSeq ==
        Hashing.minhashBandKeys(h).toSeq)
    }
    val d = new Multimodal.FakeDecoder
    forAll(Gen.nonEmptyListOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val f = d.decode(bytes.toArray)
      assert(f.forall(x => x >= 0.0f && x <= 1.0f))
      assert(math.abs(f.sum - 1.0f) < 1e-4)
    }
  }

  // ---- Spark-level invariances ----

  test("aggregation results are partition-count invariant") {
    import spark.implicits._
    val base = Tables.t(spark, sf, "lineitem")
    def agg(n: Int) =
      base.repartition(n)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("q"))
        .orderBy("l_returnflag")
        .as[(String, Long, Double)].collect().toSeq
    assert(agg(1) == agg(7), "1 vs 7 partitions must agree")
  }

  test("normalize round-trip: to_json then normalizeJsonLines preserves scalars") {
    import spark.implicits._
    val lines = Seq(
      """[{"_id":"a","accountId":"1","amount":5,"notes":"n","extra":"drop-me"}]""",
      """[{"_id":"b","before":{"x":1},"after":{},"createdAt":"2024-01-01T00:00:00"}]""",
      """not json at all""").toDF("value")
    val out = Normalize.normalizeJsonLines(lines).collect()
    val byId = out.filter(!_.isNullAt(0)).map(r => r.getString(0) -> r).toMap
    assert(byId("a").getAs[String]("amount") == "5")
    assert(byId("a").schema.fieldNames.length == Normalize.whitelist.length,
      "non-whitelisted keys dropped")
    assert(byId("b").getAs[String]("before") == """{"x":1}""", "nested → JSON text")
    assert(byId("b").getAs[String]("after") == "", "empty object → empty string")
    assert(out.exists(_.isNullAt(0)), "malformed line survives as a null row")
  }
}
