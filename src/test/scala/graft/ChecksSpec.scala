package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.operators.Checks
import graft.operators.Checks._

/** The declarative data-quality gate (v01): verdict semantics on
  * crafted frames, and the one-scan plan contract. */
class ChecksSpec extends SparkSuite {

  import spark.implicits._

  test("each check type flags exactly its violations") {
    val df = Seq(
      (Some(1L), "a", 5.0, "O"),
      (Some(2L), "b", -1.0, "F"),
      (None, "b", 50.0, "Z") // null id, dup key b, bad status Z
    ).toDF("id", "k", "price", "status")
    val got = Checks.run(df, Seq(
        NotNull("id"), Unique("k"), MinBound("price", 0.0),
        MaxBound("price", 10.0), InSet("status", Seq("O", "F"))))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    assert(got.toSeq == Seq(
      ("in_set(status)", 1.0, false),
      ("max_bound(price)", 50.0, false),
      ("min_bound(price)", -1.0, false),
      ("not_null(id)", 1.0, false),
      ("unique(k)", 1.0, false)))
    // and the all-pass shape
    val ok = Checks.run(df.filter($"id".isNotNull && $"price".between(0, 10)
        && $"status".isin("O", "F")),
      Seq(NotNull("id"), MinBound("price", 0.0), InSet("status", Seq("O", "F"))))
      .collect()
    assert(ok.forall(_.getBoolean(2)), ok.mkString(","))
  }

  test("null values count as in_set violations") {
    val df = Seq(Some("O"), None, Some("X")).toDF("s")
    val got = Checks.run(df, Seq(InSet("s", Seq("O")))).collect()
    assert(got.head.getDouble(1) == 2.0 && !got.head.getBoolean(2))
  }

  test("empty table: count metrics are 0, every verdict non-null (vacuous pass)") {
    val df = Seq((Some(1L), "a", 5.0, "O")).toDF("id", "k", "price", "status")
      .filter($"price" < 0) // empty, schema intact
    val got = Checks.run(df, Seq(
        NotNull("id"), Unique("k"), MinBound("price", 0.0),
        MaxBound("price", 10.0), InSet("status", Seq("O", "F"))))
      .collect()
    // getBoolean must not NPE on any row, and all pass vacuously
    assert(got.forall(r => !r.isNullAt(2) && r.getBoolean(2)), got.mkString(","))
    val byId = got.map(r => r.getString(0) ->
      (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // violation counts coalesce to 0; bounds honestly report "no observed value"
    assert(byId("not_null(id)").contains(0.0))
    assert(byId("unique(k)").contains(0.0))
    assert(byId("in_set(status)").contains(0.0))
    assert(byId("min_bound(price)").isEmpty && byId("max_bound(price)").isEmpty)
  }

  test("v01 orders contract: one parquet scan no matter how many checks") {
    val report = Checks.ordersContract(spark, sf)
    val plan = report.queryExecution.executedPlan
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: FileSourceScanExec => 1
      case other => other.children.map(scans).sum +
        other.subqueries.map(scans).sum
    }
    assert(scans(plan) == 1, s"expected exactly one scan:\n$plan")
    val rows = report.collect()
    assert(rows.length == 5)
    // the deliberately-failing bound fails; the contract checks pass
    val byId = rows.map(r => r.getString(0) -> r.getBoolean(2)).toMap
    assert(!byId("max_bound(o_totalprice)"))
    assert(byId("not_null(o_custkey)") && byId("unique(o_orderkey)")
      && byId("min_bound(o_totalprice)") && byId("in_set(o_orderstatus)"))
  }

  test("v02 fkOrphans: planted orphans counted, null child keys excluded, clean edge passes") {
    import spark.implicits._
    val parent = Seq(10L, 20L, 30L).toDF("pk")
    val dirty = Seq(Some(10L), Some(10L), Some(99L), Some(77L), None)
      .toDF("fk")
    val r = Checks.fkOrphans(dirty, "fk", parent, "pk", "dirty.fk->p.pk")
      .collect().head
    // null child key excluded from n_child; 99 and 77 are orphans
    assert(r.getString(0) == "dirty.fk->p.pk")
    assert(r.getLong(1) == 4 && r.getLong(2) == 2 && !r.getBoolean(3))
    val clean = Seq(10L, 20L, 20L).toDF("fk")
    val c = Checks.fkOrphans(clean, "fk", parent, "pk", "e").collect().head
    assert(c.getLong(1) == 3 && c.getLong(2) == 0 && c.getBoolean(3))
  }

  test("v02 warehouse audit: every declared FK edge holds on the testdata") {
    val rows = Checks.referentialIntegrity(spark, sf).collect()
    assert(rows.length == Checks.warehouseEdges.length)
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0)).toSeq.sorted)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"orphans on ${r.getString(0)}: $r")
      assert(r.getLong(1) > 0, s"empty child side on ${r.getString(0)}")
    }
  }

  test("v03 profile ≡ driver recomputation over orders; nulls and both " +
    "metric families exercised on a crafted frame") {
    def r4(x: Double): Double =
      math.floor(x * 1e4 + 0.5) / 1e4
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice",
        "o_orderstatus", "o_orderpriority").collect()
    def expectNum(c: Int): (Long, Long, Double, Double) = {
      val vs = rows.map(r => if (r.isNullAt(c)) None
        else Some(r.get(c) match {
          case l: Long => l.toDouble; case d: Double => d }))
      (vs.count(_.isEmpty).toLong, vs.flatten.distinct.length.toLong,
        r4(vs.flatten.min), r4(vs.flatten.max))
    }
    def expectStr(c: Int): (Long, Long, String, String) = {
      val vs = rows.map(r => Option(r.getString(c)))
      (vs.count(_.isEmpty).toLong, vs.flatten.distinct.length.toLong,
        vs.flatten.min, vs.flatten.max)
    }
    val got = Checks.ordersProfile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.size == 5)
    Seq("o_orderkey" -> 0, "o_custkey" -> 1, "o_totalprice" -> 2).foreach {
      case (name, c) =>
        val (nn, nd, mn, mx) = expectNum(c)
        val r = got(name)
        assert(r.getLong(1) == rows.length.toLong && r.getLong(2) == nn &&
          r.getLong(3) == nd && r.getDouble(4) == mn && r.getDouble(5) == mx &&
          r.isNullAt(6) && r.isNullAt(7), s"$name: $r")
    }
    Seq("o_orderstatus" -> 3, "o_orderpriority" -> 4).foreach {
      case (name, c) =>
        val (nn, nd, mn, mx) = expectStr(c)
        val r = got(name)
        assert(r.getLong(2) == nn && r.getLong(3) == nd &&
          r.isNullAt(4) && r.isNullAt(5) &&
          r.getString(6) == mn && r.getString(7) == mx, s"$name: $r")
    }
    // crafted frame: nulls counted, distincts ignore nulls, min/max skip them
    val crafted = Seq(
      (Some(3.0), Some("b")), (None, Some("a")), (Some(1.5), None),
      (Some(3.0), Some("a"))
    ).toDF("x", "s")
    val p = Checks.profile(crafted, Seq("x"), Seq("s")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("x").getLong(1) == 4 && p("x").getLong(2) == 1 &&
      p("x").getLong(3) == 2 && p("x").getDouble(4) == 1.5 &&
      p("x").getDouble(5) == 3.0)
    assert(p("s").getLong(2) == 1 && p("s").getLong(3) == 2 &&
      p("s").getString(6) == "a" && p("s").getString(7) == "b")
  }

  test("v07 corpus datasheet matches a Scala recomputation; " +
       "nBins-parameterized psi covers wider binnings") {
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
    val toks = rows.map(_.getString(1).trim.split("\\s+").length.toLong)
    val fps = rows.map(r =>
      r.getString(1).trim.replaceAll("\\s+", " ").toLowerCase).distinct
    val nDocs = rows.length.toLong
    val nTokens = toks.sum
    val expected = Map(
      "n_docs" -> nDocs,
      "n_tokens" -> nTokens,
      "n_chars" -> rows.map(r => r.getAs[Number]("n_chars").longValue).sum,
      "n_langs" -> rows.map(_.getString(2)).distinct.length.toLong,
      "n_sources" -> rows.map(_.getString(3)).distinct.length.toLong,
      "n_distinct_content" -> fps.length.toLong,
      "tokens_min" -> toks.min,
      "tokens_max" -> toks.max,
      "dup_docs" -> (nDocs - fps.length),
      "dup_milli" ->
        math.floor((nDocs - fps.length) * 1000.0 / nDocs + 0.5).toLong,
      "tokens_avg_milli" ->
        math.floor(nTokens * 1000.0 / nDocs + 0.5).toLong)
    val got = Checks.corpusDatasheet(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // the r13 advisor fix: a caller binning wider than the v04 fixture
    // gets every bin reported, not silently dropped
    val wide = Seq((0, true), (15, false), (15, true)).toDF("bin", "is_ref")
    val rep = Checks.psiReport(wide, nBins = 16).collect()
    assert(rep.map(_.getInt(0)).toSeq == (0 until 16) &&
      rep.map(r => r.getLong(1) + r.getLong(2)).sum == 3L)
  }

  test("v08 split leakage: content row provably 0, n-gram leakage " +
       "matches a Scala recomputation, planted dup family stays together") {
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def splitOf(fp: String): String = {
      val b = md5hex(fp).substring(0, 2)
      if (b < "0d") "test" else if (b < "1a") "val" else "train"
    }
    def tris(text: String): Set[String] = {
      val tk = text.trim.split("\\s+").toSeq
      if (tk.size < 3) Set.empty else tk.sliding(3).map(_.mkString(" ")).toSet
    }
    val bySplit = rows.groupBy { case (_, text) =>
      splitOf(md5hex(text.trim.replaceAll("\\s+", " ").toLowerCase))
    }
    val triSets = bySplit.map { case (s, ds) =>
      s -> ds.flatMap(d => tris(d._2)).toSet
    }.withDefaultValue(Set.empty[String])
    def exp(which: String): Seq[(String, Long)] = {
      val n = triSets(which).size.toLong
      val h = (triSets(which) & triSets("train")).size.toLong
      Seq(s"${which}_ngrams" -> n, s"${which}_ngrams_in_train" -> h,
        s"${which}_leak_milli" ->
          (if (n == 0) 0L else math.floor(h * 1000.0 / n + 0.5).toLong))
    }
    val expected = (Seq("content_fps_multi_split" -> 0L)
      ++ exp("val") ++ exp("test")).sortBy(_._1)
    val got = Checks.splitLeakage(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == expected)
    // planted dup family: identical texts land in ONE split, so the
    // content row stays 0 even when duplicates exist
    val planted = Seq((1L, "x y z w"), (2L, "x y z w"), (3L, "p q r s t"))
      .toDF("doc_id", "text")
    val p = Checks.splitLeakage(planted, "doc_id", "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(p("content_fps_multi_split") == 0L && p.size == 7)
  }

  test("v04 psi: identical populations score exactly zero in every bin") {
    // every value appears once as ref and once as cur → p == q bin-wise
    val vals = Seq(0, 0, 3, 5, 5, 5, 9)
    val binned = (vals.map((_, true)) ++ vals.map((_, false)))
      .toDF("bin", "is_ref")
    val got = Checks.psiReport(binned).collect()
    assert(got.length == Checks.V04NBins)
    assert(got.forall(r => r.getDouble(3) == 0.0 && r.getBoolean(4)),
      got.mkString(","))
  }

  test("v04 psi: report is total (all bins present), terms non-negative, " +
       "and a one-sided population still yields finite terms") {
    val binned = Seq((0, true), (0, true), (1, true), (9, false))
      .toDF("bin", "is_ref")
    val got = Checks.psiReport(binned).collect()
    assert(got.map(_.getInt(0)).toSeq == (0 until Checks.V04NBins))
    assert(got.forall(r => !r.isNullAt(3) && r.getDouble(3) >= 0.0),
      got.mkString(","))
    // the drifted bins carry the mass of the index
    val byBin = got.map(r => r.getInt(0) -> r.getDouble(3)).toMap
    assert(byBin(0) > byBin(4) && byBin(9) > byBin(4))
  }

  test("v04 drift over the warehouse: 10 bins, every term defined") {
    val got = Checks.driftPsi(spark, sf).collect()
    assert(got.length == Checks.V04NBins)
    assert(got.forall(r => !r.isNullAt(3) && r.getDouble(3) >= 0.0))
  }

  private val v10Lenses = Set("bloom_exact", "bloom_prefilter",
    "exact_overlap", "fuzzy_overlap", "memorization", "split_content",
    "split_ngrams")

  test("v10 contamination report: every row equals its member lens " +
       "recomputation (cross-laws vs x05/x16/x18/t31/v08)") {
    import graft.operators.{Dedup, Sampling, TextOps}
    val rep = Checks.contaminationReport(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(rep.keySet == v10Lenses, s"lens set: ${rep.keySet}")
    // uniform rate law on every row
    rep.foreach { case (lens, (f, p, rate)) =>
      val want = if (p == 0L) 0L else math.floor(f * 1000.0 / p + 0.5).toLong
      assert(rate == want, s"$lens rate_milli $rate != $want")
    }
    // member recomputations — each lens must restate its member's
    // numbers, not a near-miss of them
    val nDocs = Tables.t(spark, sf, "documents").count()
    assert(rep("exact_overlap")._1 == Dedup.decontaminate(spark, sf).count())
    assert(rep("fuzzy_overlap")._1 ==
      Dedup.fuzzyDecontaminate(spark, sf).count())
    val x18 = Dedup.bloomDecontaminate(spark, sf).collect()
    assert(rep("bloom_exact")._1 ==
      x18.count(_.getAs[Boolean]("exact_hit")).toLong)
    assert(rep("bloom_prefilter")._1 ==
      x18.count(_.getAs[Boolean]("bloom_hit")).toLong)
    assert(rep("bloom_exact")._2 == nDocs && rep("bloom_prefilter")._2 == nDocs)
    // bloom pre-filter admits a superset of the exact verdict (no
    // false negatives by construction)
    assert(rep("bloom_prefilter")._1 >= rep("bloom_exact")._1)
    val t31 = TextOps.memorization(spark, sf).collect()
    assert(rep("memorization")._1 ==
      t31.count(_.getAs[Long]("n_memorized") > 0L).toLong)
    assert(rep("memorization")._2 == t31.length.toLong)
    val v08 = Checks.splitLeakage(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("split_content")._1 == v08("content_fps_multi_split"))
    assert(rep("split_ngrams")._1 == v08("test_ngrams_in_train"))
    assert(rep("split_ngrams")._2 == v08("test_ngrams"))
    // exact/fuzzy probe the same denominator: shingled TRAIN docs
    val shTrain = Sampling.deterministicSplit(
        Tables.t(spark, sf, "documents"), "doc_id")
      .filter($"split" === "train")
      .filter(org.apache.spark.sql.functions
        .size(org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.trim($"text"), "\\s+")) >= 3)
      .count()
    assert(rep("exact_overlap")._2 == shTrain)
    assert(rep("fuzzy_overlap")._2 == shTrain)
  }

  test("v10 contamination report: an EMPTY corpus still reports all " +
       "seven lenses with zero rows-affected (the q35/v06 law)") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val rep = Checks.contaminationReport(empty, "doc_id", "text").collect()
    assert(rep.map(_.getString(0)).toSet == v10Lenses)
    assert(rep.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L &&
      r.getLong(3) == 0L), rep.mkString(","))
  }
}
