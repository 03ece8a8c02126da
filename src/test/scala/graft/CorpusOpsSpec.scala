package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Dedup, Sampling, TextOps}

/** Semantic checks for the round-2 corpus operators (t06/t07/x05/x06):
  * each query's output is recomputed independently in plain Scala over
  * the collected sf0.001 documents and compared row-for-row.
  */
class CorpusOpsSpec extends SparkSuite {

  private def r4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private lazy val docs: Seq[(Long, String)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  test("t06 repetition matches a per-doc Scala recomputation") {
    val expected = docs.map { case (id, text) =>
      val toks = text.trim.split("\\s+").toSeq
      val counts = toks.groupBy(identity).map(_._2.size)
      (id, toks.size.toLong, counts.size.toLong,
        r4(1.0 - counts.size.toDouble / toks.size),
        r4(counts.max.toDouble / toks.size))
    }.sortBy(_._1)
    val got = TextOps.repetition(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
      .toSeq
    assert(got == expected)
  }

  test("t07 scrub counts and lengths match the same regex in plain Java") {
    val pat = ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" +
      "|[0-9]{7,}|\\b(?i:customer|supplier)\\b").r
    val expected = docs.map { case (id, text) =>
      val matches = pat.findAllIn(text).toSeq
      (id, matches.size,
        text.length, pat.replaceAllIn(text, "[REDACTED]").length)
    }.sortBy(_._1)
    val got = TextOps.scrub(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    assert(got == expected)
    assert(expected.map(_._2).sum > 0, "denylist terms must occur in testdata")
    // the case-insensitivity is the point: mixed-case denylist hits
    // must be redacted (plain-Scala cross-check, independent of Spark)
    assert("\\b(?i:customer)\\b".r.findFirstIn("a Customer here").isDefined)
  }

  test("t09 chunk windows match a Scala recomputation and reassemble the doc") {
    val width = 32; val stride = 24
    val expected = docs.flatMap { case (id, text) =>
      val toks = text.trim.split("\\s+").toSeq
      val nc = 1 + (math.max(0, toks.size - width) + stride - 1) / stride
      (0 until nc).map { i =>
        val ck = toks.slice(i * stride, i * stride + width)
        (id, i.toLong, ck.size.toLong, ck.mkString(" "))
      }
    }.sortBy(t => (t._1, t._2))
    val got = TextOps.chunkWindows(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == expected)
    // coverage law: first chunk + the non-overlap suffix of each later
    // chunk reassembles the exact token stream of the document
    got.groupBy(_._1).foreach { case (id, cks) =>
      val ordered = cks.sortBy(_._2).map(_._4.split(" ").toSeq)
      val reassembled =
        ordered.head ++ ordered.tail.flatMap(_.drop(width - stride))
      val orig = docs.toMap.apply(id).trim.split("\\s+").toSeq
      assert(reassembled == orig, s"doc $id: chunking lost or reordered tokens")
    }
  }

  test("t09 chunking laws hold across width/stride combos") {
    val frame = spark.read.parquet(s"$sf/documents.parquet")
    val nToks = docs.map { case (id, text) => (id, text.trim.split("\\s+").length) }.toMap
    for ((w, s) <- Seq((16, 16), (20, 10), (50, 50), (40, 15))) {
      val rows = TextOps.chunkWindows(frame, "doc_id", "text", w, s).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      val byDoc = rows.groupBy(_._1)
      assert(byDoc.keySet == nToks.keySet)
      byDoc.foreach { case (id, cks) =>
        val n = nToks(id)
        val expectChunks = 1 + (math.max(0, n - w) + s - 1) / s
        assert(cks.length == expectChunks, s"(w=$w,s=$s) doc $id chunk count")
        val ordered = cks.sortBy(_._2)
        // every chunk but the tail is full when it fits; tail covers to n
        ordered.init.foreach(c => assert(c._3 == w, s"(w=$w,s=$s) short mid-chunk"))
        val tailStart = (expectChunks - 1) * s
        assert(ordered.last._3 == math.min(w, n - tailStart).toLong)
        // reassembly: token stream is preserved
        val reassembled = ordered.head._4.split(" ").toSeq ++
          ordered.tail.toSeq.flatMap(_._4.split(" ").drop(w - s).toSeq)
        assert(reassembled.size == n, s"(w=$w,s=$s) doc $id coverage")
      }
    }
  }

  test("t10 BM25 matches a plain-Scala computation of the Okapi formula") {
    val terms = Seq("customer", "window", "query")
    val k1 = 1.2; val b = 0.75
    val toks = docs.map { case (id, text) => (id, text.trim.split("\\s+").toSeq) }
    val n = toks.size.toLong
    val sumDl = toks.map(_._2.size.toLong).sum
    val df = terms.map(t => toks.count(_._2.contains(t)).toLong)
    val expected = toks.map { case (id, tk) =>
      val dl = tk.size.toLong
      val score = terms.indices.map { i =>
        val tf = tk.count(_ == terms(i)).toDouble
        val idf = math.log((n.toDouble - df(i) + 0.5) / (df(i) + 0.5) + 1.0)
        idf * (tf * (k1 + 1.0)) /
          (tf + k1 * (1.0 - b + b * (dl.toDouble / (sumDl.toDouble / n))))
      }.sum
      (id, r4(score))
    }.filter(_._2 > 0).sortBy(t => (-t._2, t._1)).take(10).zipWithIndex
      .map { case ((id, s), i) => (i + 1L, id, s) }
    val got = TextOps.bm25TopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.map(_._3).sameElements(got.map(_._3).sorted.reverse))
  }

  test("t11 heavy hitters equal the exact top-10 token counts") {
    val counts = docs.flatMap(_._2.trim.split("\\s+")).groupBy(identity)
      .map { case (w, ws) => (w, ws.size.toLong) }.toSeq
    val expected = counts.sortBy { case (w, n) => (-n, w) }.take(10)
      .zipWithIndex.map { case ((w, n), i) => (i + 1L, w, n) }
    val got = TextOps.heavyHitters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("t25 CMS estimates ≡ Scala cell-count recomputation; overcount-only law") {
    val H = graft.functions.Hashing
    val toks = docs.flatMap(_._2.trim.split("\\s+"))
    // sketch = per-(row, cell) instance counts (CMS is linear)
    val cellCounts = scala.collection.mutable.Map.empty[(Int, Int), Long]
    toks.foreach { w =>
      val cells = H.cmsCells(H.fnv64(w))
      var r = 0
      while (r < H.CmsDepth) {
        cellCounts((r, cells(r))) = cellCounts.getOrElse((r, cells(r)), 0L) + 1
        r += 1
      }
    }
    val exact = toks.groupBy(identity)
      .map { case (w, ws) => (w, ws.size.toLong) }.toSeq
    val expected = exact.sortBy { case (w, n) => (-n, w) }.take(10)
      .zipWithIndex.map { case ((w, n), i) =>
        val cells = H.cmsCells(H.fnv64(w))
        val est = (0 until H.CmsDepth).map(r => cellCounts((r, cells(r)))).min
        (i + 1L, w, n, est)
      }
    val got = TextOps.cmsFrequencies(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    got.foreach { case (_, w, nExact, nCms) =>
      assert(nCms >= nExact, s"CMS undercounted '$w': $nCms < $nExact")
    }
  }

  test("CMS laws: linear merge is exact; estimate dominates truth for EVERY token") {
    import graft.functions.CountMinAggregator
    val H = graft.functions.Hashing
    val stream = docs.flatMap(_._2.trim.split("\\s+")).map(H.fnv64)
    val agg = new CountMinAggregator
    val whole = stream.foldLeft(agg.zero)(agg.reduce)
    // 4-way split merged pairwise — the partition/merge shape Spark runs;
    // a LINEAR sketch must reproduce the single-pass buffer EXACTLY
    val parts = stream.grouped(stream.size / 4 + 1).toSeq
      .map(_.foldLeft(agg.zero)(agg.reduce))
    val merged = parts.reduce(agg.merge)
    assert(merged.sameElements(whole), "merge drifted from the one-pass fold")
    // every token (not just the top-10) is overcounted, never under
    val truth = docs.flatMap(_._2.trim.split("\\s+"))
      .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }
    truth.foreach { case (w, n) =>
      val cells = H.cmsCells(H.fnv64(w))
      val est = (0 until H.CmsDepth)
        .map(r => whole(r * H.CmsWidth + cells(r))).min
      assert(est >= n, s"'$w' undercounted: $est < $n")
    }
  }

  test("t26 span coverage ≡ Scala stride-1 window recomputation") {
    val w = TextOps.T26Width
    val winsByDoc = docs.map { case (id, text) =>
      val tk = text.trim.split("\\s+").toSeq
      id -> (tk.length, if (tk.length >= w) tk.sliding(w).map(_.mkString(" ")).toSeq
                        else Seq.empty[String])
    }
    val occ = winsByDoc.flatMap { case (_, (_, ws)) => ws }
      .groupBy(identity).map { case (k, v) => (k, v.size) }
    val expected = winsByDoc.sortBy(_._1).map { case (id, (nTok, ws)) =>
      val dup = ws.zipWithIndex.filter { case (s, _) => occ(s) >= 2 }
        .map { case (_, i) => (i, i + w - 1) }
      // interval union via running max (the gaps-and-islands form)
      var prevEnd = -1
      var covered = 0L
      dup.foreach { case (s, e) =>
        covered += math.max(0, e - math.max(s - 1, prevEnd))
        prevEnd = math.max(prevEnd, e)
      }
      (id, nTok, math.max(nTok - w + 1, 0), dup.size.toLong, covered,
        r4(covered.toDouble / nTok))
    }
    val got = TextOps.spanCoverage(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expected)
  }

  test("t26 law: a one-token-shifted cross-doc duplicate is caught (t15's blind spot)") {
    import spark.implicits._
    val w = TextOps.T26Width
    val span = (1 to w).map(i => s"dup$i").mkString(" ")
    val pad = (1 to 40).map(i => s"pada$i").mkString(" ")
    val pad2 = (1 to 41).map(i => s"padb$i").mkString(" ")
    // doc 1 carries the span at offset 40; doc 2 at offset 41 — never
    // aligned to a common stride-w chunk boundary
    val frame = Seq((1L, s"$pad $span"), (2L, s"$pad2 $span"))
      .toDF("doc_id", "text")
    val out = TextOps.spanCoverage(frame, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(4))).toMap
    assert(out(1L) == w && out(2L) == w,
      s"shifted duplicate span not fully covered: $out")
    // the t15 stride-w chunking misses it: no chunk repeats
    val t15Chunks = TextOps.chunkDedup(frame, "doc_id", "text", width = w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    t15Chunks.foreach { case (_, nChunks, nKept) =>
      assert(nKept == nChunks, "expected the chunked pass to see no dupes")
    }
  }

  test("Misra-Gries laws: survival guarantee, undercount bound, mergeability") {
    import graft.functions.MisraGriesAggregator
    val rng = new scala.util.Random(42)
    // skewed stream: item i drawn with weight ~ 1/(i+1) over 50 items
    val stream = Seq.fill(20000) {
      val u = rng.nextDouble()
      var i = 0; var acc = 0.0
      val z = (0 until 50).map(j => 1.0 / (j + 1)).sum
      while ({ acc += 1.0 / ((i + 1) * z); acc < u && i < 49 }) i += 1
      s"item$i"
    }
    val truth = stream.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val n = stream.size.toLong
    for (c <- Seq(3, 8, 20)) {
      val agg = new MisraGriesAggregator(c)
      // single-pass fold, then a 4-way split merged pairwise (the
      // partition/merge shapes Spark will actually run)
      val whole = stream.foldLeft(agg.zero)(agg.reduce)
      val parts = stream.grouped(stream.size / 4 + 1).toSeq
        .map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = parts.reduce(agg.merge)
      for (summary <- Seq(whole, merged)) {
        assert(summary.size <= c, s"capacity $c exceeded: ${summary.size}")
        val bound = n / (c + 1)
        truth.foreach { case (item, f) =>
          if (f > bound)
            assert(summary.contains(item),
              s"c=$c: item with freq $f > n/(c+1)=$bound evicted")
          val est = summary.getOrElse(item, 0L)
          assert(est <= f, s"c=$c: overcount $est > $f for $item")
          assert(f - est <= bound, s"c=$c: undercount ${f - est} > $bound")
        }
      }
    }
  }

  test("t12 perplexity matches a plain-Scala bigram-LM recomputation") {
    val allBigrams = docs.flatMap { case (id, text) =>
      val tk = text.trim.split("\\s+").toSeq
      (0 until tk.size - 1).map(i => (id, i, tk(i), tk(i + 1)))
    }
    val cvw = allBigrams.groupBy(b => (b._3, b._4)).map { case (k, v) => (k, v.size.toLong) }
    val cv = allBigrams.groupBy(_._3).map { case (k, v) => (k, v.size.toLong) }
    val vsz = docs.flatMap(_._2.trim.split("\\s+")).distinct.size.toLong
    val expected = allBigrams.groupBy(_._1).map { case (id, bgs) =>
      val lnps = bgs.sortBy(_._2).map { case (_, _, v, w) =>
        math.log((cvw((v, w)).toDouble + 1.0) / (cv(v).toDouble + vsz.toDouble))
      }
      val sum = lnps.foldLeft(0.0)(_ + _) // position-ordered left fold
      val ce = -sum / bgs.size.toDouble
      (id, bgs.size.toLong, r4(ce), r4(math.exp(ce)))
    }.toSeq.sortBy(_._1)
    val got = TextOps.perplexity(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == expected)
    // sanity: every ce positive (probabilities < 1), ppl = exp(ce) > 1
    got.foreach { case (id, n, ce, ppl) =>
      assert(n > 0 && ce > 0 && ppl > 1, s"doc $id: n=$n ce=$ce ppl=$ppl")
    }
  }

  test("t13 BPE merges match the classic algorithm run in plain Scala") {
    // reference implementation: word-freq dict, greedy leftmost merges
    var vocab: Map[Seq[String], Long] = docs.flatMap(_._2.trim.split("\\s+"))
      .groupBy(identity).map { case (w, ws) =>
        (w.split("").toSeq :+ "</w>", ws.size.toLong)
      }
    def mergeSeq(syms: Seq[String], a: String, b: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toSeq
    }
    val expected = (1 to 8).map { rank =>
      val counts = vocab.toSeq.flatMap { case (syms, f) =>
        syms.zip(syms.tail).map(p => (p, f))
      }.groupBy(_._1).map { case (p, v) => (p, v.map(_._2).sum) }
      val ((a, b), n) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
      vocab = vocab.toSeq.map { case (syms, f) => (mergeSeq(syms, a, b), f) }
        .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum) }
      (rank.toLong, a, b, a + b, n)
    }
    val got = TextOps.bpeMerges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == expected)
    // merged units must compose their parts
    got.foreach { case (_, a, b, m, n) => assert(m == a + b && n > 0) }
  }

  test("t14 BPE encode matches an independent Scala recomputation") {
    val merges = TextOps.bpeMerges(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    def mergeSeq(syms: Seq[String], a: String, b: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toSeq
    }
    def enc(word: String): Long =
      merges.foldLeft(word.split("").toSeq :+ "</w>") {
        case (syms, (a, b)) => mergeSeq(syms, a, b)
      }.length.toLong
    val expected = docs.map { case (id, text) =>
      val ws = text.trim.split("\\s+").toSeq
      (id, ws.size.toLong, ws.map(enc).sum)
    }.sortBy(_._1)
    val got = TextOps.bpeEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // every word costs ≥ 1 subword, and merging never grows a word
    // beyond chars + 1 (the </w> marker)
    got.foreach { case (id, nw, nb) =>
      assert(nb >= nw, s"doc $id: $nb subwords for $nw words")
    }
  }

  test("t14 pinned-merge encode matches a driver recomputation with the fixture") {
    def mergeSeq(syms: Seq[String], a: String, b: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toSeq
    }
    def enc(word: String): Long =
      TextOps.pinnedMerges.foldLeft(word.split("").toSeq :+ "</w>") {
        case (syms, (a, b)) => mergeSeq(syms, a, b)
      }.length.toLong
    val expected = docs.map { case (id, text) =>
      val ws = text.trim.split("\\s+").toSeq
      (id, ws.size.toLong, ws.map(enc).sum)
    }.sortBy(_._1)
    val got = TextOps.bpeEncodePinned(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("t13 BPE stops early when every word collapses to one symbol") {
    import spark.implicits._
    // two 2-char words: only 3 possible merges exist (ab, ab</w>, cd…)
    val tiny = Seq("ab", "ab", "cd").toDF("text")
    val got = TextOps.bpeMerges(tiny, "text", nMerges = 50).collect()
    assert(got.length < 50 && got.nonEmpty)
    // after the learned merges, re-applying them collapses each word
    assert(got.forall(_.getLong(4) > 0))
  }

  test("x05 decontaminate matches string-shingle overlap with the test split") {
    def shingleSet(text: String): Set[String] = {
      val toks = text.trim.split("\\s+")
      if (toks.length < 3) Set.empty
      else (0 to toks.length - 3).map(i => s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").toSet
    }
    def bucket(id: Long): String = md5hex(id.toString).substring(0, 2)
    val withSh = docs.map { case (id, t) => (id, bucket(id), shingleSet(t)) }
      .filter(_._3.nonEmpty)
    val testSh = withSh.filter(_._2 < "0d").flatMap(_._3).toSet
    val expected = withSh.filter(_._2 >= "1a").flatMap { case (id, _, sh) =>
      val n = sh.count(testSh)
      if (n == 0) None
      else Some((id, n.toLong, sh.size.toLong, r4(n.toDouble / sh.size)))
    }.sortBy(_._1)
    val got = Dedup.decontaminate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
    assert(got.nonEmpty, "testdata's planted near-dups must contaminate the split")
  }

  test("x06 shards are contiguous, non-overlapping, and cover all orders") {
    val m = Sampling.rangeShardManifest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(m.nonEmpty && m.forall { case (s, _, _, _) => s >= 0 && s < 8 })
    m.sliding(2).foreach {
      case Array((_, _, _, maxPrev), (_, _, minNext, _)) =>
        assert(maxPrev < minNext, "shard ranges must not overlap")
      case _ =>
    }
    val total = m.map(_._2).sum
    assert(total == spark.read.parquet(s"$sf/orders.parquet").count())
  }

  test("x07 proportional sample keeps ceil(frac*n) rows per stratum") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val perSource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Sampling.proportionalSample(docs, "source", "doc_id", 0.2)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sampled.keySet == perSource.keySet, "every stratum survives")
    sampled.foreach { case (src, n) =>
      assert(n == math.ceil(perSource(src) * 0.2).toLong, s"stratum $src")
    }
    // determinism: same rows on re-evaluation
    val a = Sampling.proportionalSample(docs, "source", "doc_id", 0.2)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.proportionalSample(docs, "source", "doc_id", 0.2)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }

  test("x03 two-phase cumsum is partitioning- and bucket-width-invariant " +
    "and equals the single-window form") {
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
    val nTokens = size(split(trim(col("text")), "\\s+")).cast("bigint")
    def run(digits: Int, inputParts: Int): Seq[(String, Long, Long, Long)] =
      Sampling.tokenShardAssignments(docsDf.repartition(inputParts),
        "lang", "doc_id", nTokens, 2000L, bucketHexDigits = digits)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(x => (x._1, x._2)).toSeq
    val coarse = run(digits = 1, inputParts = 1) // 16 buckets per stratum
    val fine = run(digits = 3, inputParts = 8)   // 4096, strata widely split
    assert(coarse == fine,
      "shard assignment must not depend on partitioning or bucket width")
    // and both equal the naive one-window-partition-per-stratum form
    // over the same (hash, id) packing order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Long.MinValue, 0)
    val expected = docsDf
      .select(col("lang"), col("doc_id"), nTokens.as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      .withColumn("shard", ((col("cum") - col("n_tokens")) / 2000L).cast("bigint"))
      .select("lang", "doc_id", "n_tokens", "shard")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(fine == expected)
  }

  test("x10 pack manifest: invariant to partitioning/bucket width, " +
    "contiguous offsets, and spans obey the ceil law") {
    val docsDf = spark.read.parquet(s"$sf/documents.parquet")
    val nTokens = size(split(trim(col("text")), "\\s+")).cast("bigint")
    val budget = 256L
    def run(width: Long, inputParts: Int): Seq[(Long, Long, Long, Long, Long, Long)] =
      Sampling.packManifest(docsDf.repartition(inputParts), "doc_id",
          nTokens, budget, bucketWidth = width)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
        .toSeq
    val coarse = run(width = 512, inputParts = 1) // one bucket holds all
    val fine = run(width = 7, inputParts = 8)     // ids widely split
    assert(coarse == fine,
      "manifest must not depend on partitioning or bucket width")
    // contiguity: the packing is the concatenation in doc_id order
    fine.sliding(2).foreach {
      case Seq((_, n0, s0, _, _, _), (id1, _, s1, _, _, _)) =>
        assert(s1 == s0 + n0, s"offset gap before doc $id1")
      case _ => ()
    }
    assert(fine.head._3 == 0L, "first doc starts at token 0")
    // per-row laws: span count and position derive from the offset
    fine.foreach { case (id, n, start, seqFirst, nSeqs, pos) =>
      assert(seqFirst == start / budget, s"doc $id seq_first")
      assert(pos == start % budget, s"doc $id pos_in_seq")
      assert(nSeqs == (start + n - 1) / budget - start / budget + 1,
        s"doc $id n_seqs")
      assert(nSeqs >= 1 && pos < budget)
    }
  }

  test("x10 auto bucket width: the offsets table stays bounded at 10× " +
    "and 100× id ranges, and AUTO matches a fixed-width run") {
    // the r12 verdict's dial: at FIXED width the offsets table is
    // range/width rows — linear in corpus size. AUTO must hold the
    // broadcast frame at ~AutoOffsetRows rows no matter how far the
    // id range grows, without moving a single result value.
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val nTokens = size(split(trim(col("text")), "\\s+")).cast("bigint")
    def manifest(df: org.apache.spark.sql.DataFrame, width: Long) =
      Sampling.packManifest(df, "doc_id", nTokens, 256L, width)
        .collect().map(_.toSeq).toSeq
    for (scale <- Seq(10L, 100L)) {
      // same rows, id range inflated ×scale (sparse ids — the worst
      // case for a fixed-width bucketing)
      val scaled = base.withColumn("doc_id", col("doc_id") * scale)
      val r = scaled.agg(min("doc_id"), max("doc_id")).head()
      val w = Sampling.autoBucketWidth(r.getLong(0), r.getLong(1))
      // the offsets frame is the per-bucket aggregate: its row count
      // is exactly the number of occupied buckets under the auto width
      val occupied = scaled
        .select(expr(s"doc_id div $w").as("b")).distinct().count()
      assert(occupied <= Sampling.AutoOffsetRows + 1,
        s"×$scale id range: $occupied offset rows under auto width $w")
      // and AUTO (width = 0) computes the identical manifest as an
      // explicit fixed width — the dial moves only the plan shape
      assert(manifest(scaled, 0L) == manifest(scaled, 64L),
        s"×$scale: auto-width manifest diverged from fixed-width")
    }
    // arithmetic law across scales: bucket count under the auto width
    // is range-independent
    for (range <- Seq(1L << 14, 1L << 24, 1L << 40)) {
      val w = Sampling.autoBucketWidth(0L, range - 1)
      val buckets = (range - 1) / w + 1
      assert(buckets <= Sampling.AutoOffsetRows + 1,
        s"range $range: $buckets buckets under auto width $w")
    }
  }

  test("t33 ngram novelty matches a per-doc Scala recomputation; " +
       "totals obey the first-occurrence partition law") {
    val tri: Seq[(Long, Set[String])] = docs.map { case (id, text) =>
      val tk = text.trim.split("\\s+").toSeq
      (id, if (tk.size < 3) Set.empty[String]
           else tk.sliding(3).map(_.mkString(" ")).toSet)
    }
    val firstOcc = tri.flatMap { case (id, s) => s.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    val expected = tri.sortBy(_._1).map { case (id, s) =>
      val n = s.size.toLong
      val novel = s.count(g => firstOcc(g) == id).toLong
      (id, n, novel,
        if (n == 0) 1000L else math.floor(novel * 1000.0 / n + 0.5).toLong)
    }
    val got = TextOps.ngramNovelty(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // every distinct corpus trigram is novel in EXACTLY one doc
    assert(got.map(_._3).sum == firstOcc.size.toLong)
    // the min-doc_id doc with trigrams is fully novel by construction
    got.find(_._2 > 0).foreach(first => assert(first._4 == 1000L))
  }

  test("t34 incremental novelty matches a Scala recomputation of the " +
       "fixture split; store-probe ≡ first-occurrence restricted to the cut") {
    val frac = TextOps.T34SplitFrac
    val cut = math.floor(docs.map(_._1).max * frac).toLong
    def tris(text: String): Set[String] = {
      val tk = text.trim.split("\\s+").toSeq
      if (tk.size < 3) Set.empty else tk.sliding(3).map(_.mkString(" ")).toSet
    }
    val storeSet = docs.filter(_._1 < cut).flatMap(d => tris(d._2)).toSet
    val expected = docs.filter(_._1 >= cut).sortBy(_._1).map { case (id, text) =>
      val t = tris(text)
      val n = t.size.toLong
      val novel = t.count(!storeSet.contains(_)).toLong
      (id, n, novel,
        if (n == 0) 1000L else math.floor(novel * 1000.0 / n + 0.5).toLong)
    }
    val got = TextOps.incrementalNovelty(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    assert(got.nonEmpty, "fixture batch is empty — the cut is degenerate")
  }

  test("t19 tfidf top terms match a per-doc Scala recomputation") {
    val n = docs.size
    val tf: Seq[(Long, String, Long)] = docs.flatMap { case (id, text) =>
      text.trim.split("\\s+").toSeq.groupBy(identity)
        .map { case (w, g) => (id, w, g.size.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
    val expected = tf.groupBy(_._1).toSeq.flatMap { case (id, terms) =>
      val scored = terms.map { case (_, w, c) =>
        (w, r4(c.toDouble * (math.log((n + 1.0) / (df(w) + 1.0)) + 1.0)))
      }
      scored.sortBy { case (w, s) => (-s, w) }.take(3).zipWithIndex
        .map { case ((w, s), i) => (id, (i + 1).toLong, w, s) }
    }.sortBy(x => (x._1, x._2))
    val got = TextOps.tfidfTopTerms(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3)))
      .toSeq
    assert(got == expected)
  }

  test("x11 dsir weights match an integer-exact Scala recomputation") {
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val feats = rows.flatMap { case (id, text, lang) =>
      text.trim.split("\\s+").toSeq
        .map(w => (id, lang == "en", md5hex(w).substring(0, 2)))
    }
    val nRaw = feats.groupBy(_._3).map { case (f, g) => f -> g.size.toLong }
    val nTgt = feats.groupBy(_._3).map { case (f, g) => f -> g.count(_._2).toLong }
    val rTot = nRaw.values.sum.toDouble
    val tTot = nTgt.values.sum.toDouble
    def lam(f: String): Long =
      math.floor(math.log(((nTgt(f) + 0.5) / (tTot + 128.0))
        / ((nRaw(f) + 0.5) / (rTot + 128.0))) * 1e6 + 0.5).toLong
    val expected = feats.groupBy(_._1).toSeq.map { case (id, g) =>
      (id, g.size.toLong,
        g.groupBy(_._3).map { case (f, fg) => fg.size.toLong * lam(f) }.sum)
    }.sortBy(_._1)
    val got = Curation.dsirWeights(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // weights separate: target-language docs should score higher per
    // token on average (that's the entire point of the estimator)
    val byLang = rows.map(r => r._1 -> (r._3 == "en")).toMap
    val (en, rest) = got.partition(g => byLang(g._1))
    def avgPerToken(xs: Seq[(Long, Long, Long)]): Double =
      xs.map(x => x._3.toDouble / x._2).sum / xs.size
    if (en.nonEmpty && rest.nonEmpty) {
      assert(avgPerToken(en) > avgPerToken(rest),
        "per-token importance should favor the target language")
    }
  }

  test("t21 LM continuations match a full-corpus Scala recomputation") {
    val bigrams = docs.flatMap { case (_, text) =>
      val tk = text.trim.split("\\s+")
      if (tk.length < 2) Seq.empty[(String, String)]
      else tk.sliding(2).map(w => (w(0), w(1))).toSeq
    }
    val pairCounts = bigrams.groupBy(identity).map { case (p, g) => p -> g.size.toLong }
    val ctxTotals = pairCounts.groupBy(_._1._1)
      .map { case (c, g) => c -> g.values.sum }
    val topCtx = ctxTotals.toSeq.sortBy { case (c, n) => (-n, c) }.take(20)
    val expected = topCtx.flatMap { case (ctx, total) =>
      pairCounts.collect { case ((c, n), cnt) if c == ctx => (n, cnt) }
        .toSeq.sortBy { case (n, cnt) => (-cnt, n) }.take(3).zipWithIndex
        .map { case ((n, cnt), i) =>
          (ctx, (i + 1).toLong, n, cnt, r4(cnt.toDouble / total)) }
    }.sortBy(x => (x._1, x._2))
    val got = TextOps.lmContinuations(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expected)
    // probabilities are valid conditionals: each row's prob <= 1 and
    // the k continuations of a context never exceed its mass
    got.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._5).sum <= 1.0 + 1e-9)
    }
  }

  test("x13 weighted sample matches the Efraimidis-Spirakis draw in Scala") {
    val expected = docs.map { case (id, text) =>
      val w = text.trim.split("\\s+").length.toLong
      val v = java.lang.Long.parseLong(md5hex(id.toString).substring(0, 13), 16)
      val u = (v + 1).toDouble / 4503599627370496.0
      val sk = math.floor((math.log(u) / w) * 1e9 + 0.5) / 1e9
      (id, w, sk)
    }.filter(_._2 > 0)
      .sortBy { case (id, _, sk) => (-sk, id) }.take(50).zipWithIndex
      .map { case ((id, w, sk), i) => ((i + 1).toLong, id, w, sk) }
    val got = Sampling.weightedSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == expected)
    // the weighting works: the token-weighted draw overrepresents long
    // docs, so the sample's mean weight exceeds the corpus mean
    val corpusMean = docs.map(_._2.trim.split("\\s+").length).sum.toDouble / docs.size
    val sampleMean = got.map(_._3).sum.toDouble / got.size
    assert(sampleMean > corpusMean,
      s"weighted draw did not favor heavy docs: $sampleMean <= $corpusMean")
  }

  test("x19 epoch shuffle: per-epoch permutations ≡ the md5-sorted Scala order, " +
    "uncorrelated across epochs, partitioning-invariant") {
    val ids = docs.map(_._1)
    val expected = (0 until Sampling.X19Epochs).flatMap { e =>
      ids.map(id => (e, id, md5hex(s"$e:$id")))
        .sortBy { case (_, id, k) => (k, id) }.zipWithIndex
        .map { case ((ep, id, _), i) =>
          (ep, id, (i + 1).toLong, ((i.toLong) % Sampling.X19Shards).toInt) }
    }
    val got = Sampling.epochShuffle(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    assert(got == expected)
    // each epoch is a full permutation
    (0 until Sampling.X19Epochs).foreach { e =>
      val ep = got.filter(_._1 == e)
      assert(ep.map(_._2).toSet == ids.toSet, s"epoch $e not a permutation")
      assert(ep.map(_._3).toSet == (1L to ids.size.toLong).toSet)
    }
    // orders are uncorrelated: epoch 0's sequence differs from epoch 1's
    val ord0 = got.filter(_._1 == 0).sortBy(_._3).map(_._2)
    val ord1 = got.filter(_._1 == 1).sortBy(_._3).map(_._2)
    assert(ord0 != ord1, "epoch orders identical - salt not applied")
    // round-robin sharding balances within 1
    val sizes = got.filter(_._1 == 0).groupBy(_._4).values.map(_.size)
    assert(sizes.max - sizes.min <= 1, s"shards unbalanced: $sizes")
    // the manifest is partitioning-invariant (the x03/x12 law)
    import spark.implicits._
    val repart = Sampling.epochShuffle(
      ids.toDF("doc_id").repartition(7), "doc_id",
      Sampling.X19Epochs, Sampling.X19Shards).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    assert(repart == expected)
  }

  test("x12 curriculum bins equal the single-window global ranking") {
    val q = TextOps.qualityScore(spark, sf).select("doc_id", "quality")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val n = q.size.toLong
    val expected = q.sortBy { case (id, ql) => (ql, id) }.zipWithIndex
      .map { case ((id, ql), i) => (id, ql, (i + 1).toLong, (i.toLong * 4) / n) }
      .sortBy(_._1)
    val got = Curation.curriculumBins(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // equal-population law: bin sizes differ by at most 1 when n % 4 != 0
    val sizes = got.groupBy(_._4).values.map(_.size).toSeq
    assert(sizes.max - sizes.min <= 1, s"bins unbalanced: $sizes")
  }

  test("ordered export: repartitionByRange + sortWithinPartitions yields " +
    "disjoint sorted files") {
    val dir = Files.createTempDirectory("graft_ordered_export").toString
    spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")
      .repartitionByRange(4, col("o_totalprice"))
      .sortWithinPartitions("o_totalprice")
      .write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-")).map(_.toString).sorted
    assert(files.length > 1, "expected multiple range partitions")
    val ranges = files.map { f =>
      val vals = spark.read.parquet(f).select("o_totalprice")
        .collect().map(_.getDouble(0))
      assert(vals.sameElements(vals.sorted), s"file $f not internally sorted")
      (vals.min, vals.max)
    }
    ranges.sliding(2).foreach {
      case Array((_, maxPrev), (minNext, _)) =>
        assert(maxPrev <= minNext, "file ranges overlap — not a global order")
      case _ =>
    }
  }

  test("x08 temperature mix: per-source quota is exactly min(n, ceil(4·√n))") {
    val rows = Sampling.temperatureMix(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val quota = math.min(n, math.ceil(4.0 * math.sqrt(n.toDouble)).toLong)
      assert(r.getAs[Long]("n_sampled") == quota,
        s"source ${r.getString(0)}: n=$n sampled=${r.getAs[Long]("n_sampled")} quota=$quota")
    }
    // flattening law, on a deliberately-skewed frame (testdata sources
    // are equal-sized, where flattening is a no-op by definition):
    // a 100× bigger stratum contributes ~10×, not 100×, the rows
    import spark.implicits._
    val skewed = ((1 to 400).map(i => ("big", i.toLong)) ++
      (1 to 4).map(i => ("small", 1000L + i))).toDF("source", "doc_id")
    val counts = Sampling.quotaSample(skewed, "source", "doc_id",
        n => ceil(lit(4.0) * sqrt(n.cast("double"))).cast("bigint"))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("big") == 80L && counts("small") == 4L,
      s"got $counts — expected ceil(4·√400)=80 and min(4, ceil(4·√4))=4")
  }

  test("t16 inverted index matches a full-corpus Scala recomputation") {
    val cap = 10
    val tf = docs.flatMap { case (id, text) =>
      text.trim.split("\\s+").toSeq.groupBy(identity).map {
        case (term, occ) => (term, id, occ.size.toLong)
      }
    }
    val expected = tf.groupBy(_._1).toSeq.map { case (term, rows) =>
      val postings = rows.sortBy(_._2).take(cap)
        .map(r => s"${r._2}:${r._3}").mkString(",")
      (term, rows.size.toLong, rows.map(_._3).sum, postings)
    }.sortBy(_._1)
    val got = TextOps.invertedIndex(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(got == expected)
    // the cap must actually bite on the corpus vocabulary
    assert(expected.exists(_._2 > cap), "no term exceeds the posting cap")
  }

  test("t17 phrase search matches a full-corpus Scala recomputation") {
    val nPhrases = 3
    val toks = docs.map { case (id, text) => (id, text.trim.split("\\s+").toSeq) }
    val top = toks
      .flatMap { case (_, tk) => tk.sliding(2).filter(_.size == 2).map(_.mkString(" ")) }
      .groupBy(identity).toSeq.map { case (p, occ) => (p, occ.size) }
      .sortBy { case (p, n) => (-n, p) }.take(nPhrases).map(_._1)
    val expected = top.flatMap { p =>
      val ws = p.split(" ")
      toks.flatMap { case (id, tk) =>
        val hits = (0 until math.max(0, tk.size - 1))
          .filter(i => tk(i) == ws(0) && tk(i + 1) == ws(1))
        if (hits.isEmpty) None
        else Some((p, id, hits.size.toLong, (hits.head + 1).toLong))
      }
    }.sortBy(t => (t._1, t._2))
    val got = TextOps.phraseSearch(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // every top phrase must actually match somewhere, else the test is vacuous
    assert(top.forall(p => got.exists(_._1 == p)),
      s"a top phrase had no positional hits: $top")
  }

  test("t18 PMI collocations match a full-corpus Scala recomputation") {
    val (minCount, k) = (5, 20)
    val toks = docs.map { case (_, text) => text.trim.split("\\s+").toSeq }
    val bgc = toks.flatMap(tk => tk.sliding(2).filter(_.size == 2).map(_.mkString(" ")))
      .groupBy(identity).map { case (b, o) => b -> o.size.toLong }
    val uni = toks.flatten.groupBy(identity).map { case (w, o) => w -> o.size.toLong }
    val bTotal = bgc.values.sum.toDouble
    val tTotal = uni.values.sum.toDouble
    val scored = bgc.toSeq.filter(_._2 >= minCount).map { case (b, n) =>
      val ws = b.split(" ")
      val pmi = r4(math.log((n / bTotal) /
        ((uni(ws(0)) / tTotal) * (uni(ws(1)) / tTotal))))
      (b, n, pmi)
    }
    val expected = scored.sortBy(t => (-t._3, t._1)).take(k).zipWithIndex
      .map { case ((b, n, p), i) => (i + 1, b, n, p) }
    val got = TextOps.collocations(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == expected)
    // PMI must actually reorder vs raw frequency, else the score is vacuous
    assert(expected.map(_._2) !=
      scored.sortBy(t => (-t._2, t._1)).take(k).map(_._1),
      "top-PMI order identical to top-frequency order")
  }

  test("t15 chunk dedup matches a full-corpus Scala recomputation") {
    val width = 32
    // every chunk occurrence, in (doc_id, chunk_id) order of appearance
    val occ = docs.flatMap { case (id, text) =>
      val toks = text.trim.split("\\s+").toSeq
      val nc = 1 + (math.max(0, toks.size - width) + width - 1) / width
      (0 until nc).map { i =>
        (id, i.toLong, toks.slice(i * width, i * width + width).mkString(" "))
      }
    }
    val firstOf = occ.groupBy(_._3).map { case (txt, os) =>
      txt -> os.map(o => (o._1, o._2)).min
    }
    val expected = occ.groupBy(_._1).toSeq.map { case (id, os) =>
      val kept = os.count(o => firstOf(o._3) == ((o._1, o._2)))
      (id, os.size.toLong, kept.toLong, r4(kept.toDouble / os.size))
    }.sortBy(_._1)
    val got = TextOps.chunkDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
  }

  test("t15 planted duplicate spans survive only at their first occurrence") {
    import spark.implicits._
    val span = (1 to 32).map(i => s"w$i").mkString(" ")
    val other = (33 to 64).map(i => s"w$i").mkString(" ")
    val frame = Seq(
      (1L, span + " " + span), // two chunks, both the same span
      (2L, span),              // the span again, later doc
      (3L, other)              // unique content
    ).toDF("doc_id", "text")
    val got = TextOps.chunkDedup(frame, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq(
      (1L, 2L, 1L, 0.5), // (1, 0) is the corpus-wide first occurrence
      (2L, 1L, 0L, 0.0),
      (3L, 1L, 1L, 1.0)))
  }

  test("x09 domain caps: TopKPerGroup path equals the window formulation") {
    val frame = spark.read.parquet(s"$sf/documents.parquet")
    val k = 20
    val got = Sampling.domainCaps(frame, "source", "doc_id", k).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // driver recomputation: per source, the k smallest (md5(id), id)
    val bySource = frame.select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.groupBy(_._1)
    val expected = bySource.toSeq.flatMap { case (src, rows) =>
      rows.map(_._2).sortBy(id => (md5hex(id.toString), id)).take(k)
        .map(src -> _)
    }.sorted
    assert(got == expected)
    assert(bySource.exists(_._2.size > k), "fixture never exercises the cap")
    // and the window-based sampler with a constant quota agrees exactly
    val windowed = Sampling.quotaSample(frame, "source", "doc_id", _ => lit(k))
      .select("source", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(got == windowed)
  }

  test("t08 gopher rules match a per-doc Scala recomputation") {
    val full = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val stop = TextOps.stopwords.toSet
    val expected = full.groupBy(_._1).map { case (lang, ds) =>
      val flags = ds.map { case (_, text) =>
        val toks = text.trim.split("\\s+").toSeq
        val nTok = toks.size.toDouble
        val meanTok = text.replaceAll("\\s+", "").length / nTok
        val alpha = text.count(_.isLetter).toDouble / text.length
        (!(nTok >= 30.0 && nTok <= 50000.0),
          !(meanTok >= 2.0 && meanTok <= 10.0),
          toks.count(stop) < 2,
          alpha < 0.6)
      }
      lang -> (ds.size.toLong, flags.count(_._1).toLong, flags.count(_._2).toLong,
        flags.count(_._3).toLong, flags.count(_._4).toLong,
        flags.count(f => !f._1 && !f._2 && !f._3 && !f._4).toLong)
    }
    val got = TextOps.gopherRules(spark, sf).collect().map { r =>
      r.getString(0) -> (r.getAs[Long]("n_docs"), r.getAs[Long]("n_fail_len"),
        r.getAs[Long]("n_fail_tok"), r.getAs[Long]("n_fail_stop"),
        r.getAs[Long]("n_fail_alpha"), r.getAs[Long]("n_pass"))
    }.toMap
    assert(got == expected)
    // the cascade must actually discriminate at this corpus: something
    // passes and something fails, or the gates are vacuous
    assert(got.values.map(_._6).sum > 0 && got.values.map(_._6).sum <
      got.values.map(_._1).sum)
  }

  test("t22 blocklist filter matches a per-doc Scala recomputation") {
    val terms = TextOps.blocklist.toSet
    val expected = docs.map { case (id, text) =>
      val toks = text.trim.split("\\s+").toSeq
      val flagged = toks.count(terms)
      val frac = r4(flagged.toDouble / toks.size)
      (id, toks.size.toLong, flagged.toLong, frac, frac < 0.05)
    }.sortBy(_._1)
    val got = TextOps.blocklistFilter(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4))).toSeq
    assert(got == expected)
    // the threshold must discriminate at this corpus, or keep is vacuous
    assert(got.exists(_._5) && got.exists(!_._5))
  }

  test("t23 boilerplate scrub drops ALL copies of repeated chunks and " +
    "reconstructs the survivors in order") {
    val width = 32
    val occ = docs.flatMap { case (id, text) =>
      val toks = text.trim.split("\\s+").toSeq
      val nc = 1 + (math.max(0, toks.size - width) + width - 1) / width
      (0 until nc).map { i =>
        (id, i.toLong, toks.slice(i * width, i * width + width).mkString(" "))
      }
    }
    val nOcc = occ.groupBy(_._3).map { case (txt, os) => txt -> os.size }
    val expected = occ.groupBy(_._1).toSeq.map { case (id, os) =>
      val kept = os.filter(o => nOcc(o._3) < 2).sortBy(_._2)
      (id, os.size.toLong, kept.size.toLong, kept.map(_._3).mkString(" "))
    }.sortBy(_._1)
    val got = TextOps.boilerplateScrub(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(got == expected)
    // a doc whose chunks all survive reconstructs its token stream
    val byId = docs.toMap
    val intact = got.filter(g => g._2 == g._3)
    assert(intact.nonEmpty)
    intact.foreach { g =>
      assert(g._4 == byId(g._1).trim.split("\\s+").mkString(" ")) }
    // and the scrub actually removed something somewhere
    assert(got.exists(g => g._3 < g._2))
  }

  test("t23 planted boilerplate loses EVERY copy (unlike t15's keep-first)") {
    import spark.implicits._
    val span = (1 to 32).map(i => s"w$i").mkString(" ")
    val other = (33 to 64).map(i => s"w$i").mkString(" ")
    val frame = Seq(
      (1L, span + " " + span), // two copies inside one doc
      (2L, span),              // a third copy in a later doc
      (3L, other)              // unique content
    ).toDF("doc_id", "text")
    val got = TextOps.boilerplateScrub(frame, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(got == Seq(
      (1L, 2L, 0L, ""), // both copies scrubbed — no first-occurrence grace
      (2L, 1L, 0L, ""),
      (3L, 1L, 1L, other)))
  }

  test("t24 incremental boilerplate ≡ the batch rows of the all-at-once " +
    "scrub (union-equivalence law); the store carries no text") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val splitAt = TextOps.T24SplitAt
    // law: probing the store gives EXACTLY what processing the whole
    // corpus at once would have given for the batch docs
    val allAtOnce = TextOps.boilerplateScrub(docs, "doc_id", "text")
      .filter(col("doc_id") >= splitAt).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    val incremental = TextOps.incrementalBoilerplate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(incremental == allAtOnce)
    assert(incremental.nonEmpty)
    // the persisted artifact is (fp, n_occ) — fingerprints, never text
    val store = TextOps.boilerplateStore(
      docs.filter(col("doc_id") < splitAt), "doc_id", "text")
    assert(store.columns.toSeq == Seq("fp", "n_occ"))
    assert(store.schema("fp").dataType.typeName == "string")
    assert(store.select(max(length(col("fp")))).head.getInt(0) == 32)
  }

  test("t24 planted cross-boundary span: one copy in the store + one in " +
    "the batch is caught") {
    import spark.implicits._
    val span = (1 to 32).map(i => s"w$i").mkString(" ")
    val other = (33 to 64).map(i => s"w$i").mkString(" ")
    val store = TextOps.boilerplateStore(
      Seq((1L, span)).toDF("doc_id", "text"), "doc_id", "text")
    val got = TextOps.incrementalBoilerplate(
        Seq((10L, span + " " + other)).toDF("doc_id", "text"),
        store, "doc_id", "text", width = 32, minDf = 2L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    // the straddling span is scrubbed; the batch-only chunk survives
    assert(got == Seq((10L, 2L, 1L, other)))
  }

  test("x15 quality classifier matches an integer-exact Scala recomputation") {
    val w = Curation.qualityModelMicro
    val expected = docs.map { case (id, text) =>
      val toks = text.trim.split("\\s+").toSeq
      val scoreMicro = toks.map { t =>
        w(Integer.parseInt(md5hex(t).substring(0, 2), 16)) }.sum
      val n = toks.size.toLong
      (id, n, scoreMicro,
        r4(scoreMicro.toDouble / 1e6 / n), scoreMicro > 0)
    }.sortBy(_._1)
    val got = Curation.qualityClassifier(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4))).toSeq
    assert(got == expected)
    // the model discriminates on this corpus, or keep is vacuous
    assert(got.exists(_._5) && got.exists(!_._5))
  }

  test("x26 quality fit: pure-Scala GD replay matches the engine " +
       "trajectory exactly; loss strictly decreases; the fitted serve " +
       "separates the planted labels and beats the base rate") {
    import graft.operators.Curation.{X26Rounds, X26LrDen, X26Scale,
      X26KeepMin, X26LabelMin}
    val labels: Map[Long, Boolean] =
      TextOps.qualityScore(spark, sf).select("doc_id", "quality")
        .collect().map(r => r.getLong(0) -> (r.getDouble(1) >= X26LabelMin))
        .toMap
    // milli-normalized hashed-bag features, pure Scala
    val ntoks: Map[Long, Long] = docs.map { case (id, text) =>
      id -> text.trim.split("\\s+").length.toLong }.toMap
    val feats: Map[Long, Map[Int, Long]] = docs.map { case (id, text) =>
      val raw = text.trim.split("\\s+").toSeq
        .groupBy(t => Integer.parseInt(md5hex(t).substring(0, 2), 16))
        .map { case (f, ts) => f -> ts.size.toLong }
      id -> raw.map { case (f, c) => f -> (c * 1000L / ntoks(id)) }
    }.toMap
    val n = docs.size.toLong
    def score(w: Array[Long], id: Long): Long =
      feats(id).iterator.map { case (f, c) => c * w(f) }.sum
    def target(id: Long): Long = if (labels(id)) X26Scale else 0L
    def lossOf(w: Array[Long]): Long =
      docs.iterator.map { case (id, _) =>
        val e = score(w, id) - target(id); e * e }.sum
    var w = Array.fill(256)(0L)
    val replayW = Seq.newBuilder[Seq[Long]]
    val replayLoss = Seq.newBuilder[Long]
    for (_ <- 1 to X26Rounds) {
      replayLoss += lossOf(w)
      val g = Array.fill(256)(0L)
      docs.foreach { case (id, _) =>
        val e = score(w, id) - target(id)
        feats(id).foreach { case (f, c) => g(f) += c * e }
      }
      w = Array.tabulate(256)(f =>
        w(f) - math.floor(g(f) * 1.0 / (n * X26LrDen)).toLong)
      replayW += w.toSeq
    }
    replayLoss += lossOf(w)
    // engine trajectory (weights AND losses) == pure-Scala replay
    val (engW, engLoss) = Curation.qualityFitTrajectory(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text",
      Curation.qualityLabels(spark, sf))
    assert(engW.map(_.toSeq) == replayW.result(), "weight trajectories differ")
    assert(engLoss == replayLoss.result(), "loss trajectories differ")
    // the documented learning rate is STABLE on this corpus: squared
    // loss strictly decreases through every round including the last
    assert(engLoss.sliding(2).forall(p => p(1) < p(0)),
      s"loss not strictly decreasing: $engLoss")
    // registered x26 face serves the final round's weights, 256 rows
    val fitRows = Curation.qualityFit(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(fitRows.map(_._1).toSeq == (0 until 256))
    assert(fitRows.map(_._2).toSeq == w.toSeq)
    // registered x26s face == x15-shaped serve of the fitted weights
    // over the fit features (pure-Scala recomputation)
    val expServe = docs.map { case (id, _) =>
      val s = score(w, id)
      (id, ntoks(id), s, r4(s.toDouble / 1e6), s >= X26KeepMin)
    }.sortBy(_._1)
    val serve = Curation.qualityFitServe(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4))).toSeq
    assert(serve == expServe)
    // planted separation: the fitted model moves the class means apart
    val (pos, neg) = docs.map(d => (labels(d._1), score(w, d._1)))
      .partition(_._1)
    assert(pos.nonEmpty && neg.nonEmpty, "labels degenerate at this SF")
    val gap = pos.map(_._2).sum.toDouble / pos.size -
      neg.map(_._2).sum.toDouble / neg.size
    assert(gap > 0, s"no separation: gap $gap")
    // and classifies better than always-majority (and usefully so)
    val acc = serve.count { case (id, _, _, _, keep) =>
      keep == labels(id) }.toDouble / n
    val base = math.max(pos.size, neg.size).toDouble / n
    assert(acc > base, s"fit no better than base rate: $acc <= $base")
    assert(acc >= 0.75, s"fit accuracy regressed: $acc")
  }

  test("x26 model lifecycle: save → load round-trips the fitted weights " +
       "exactly, and serve-from-store ≡ fit-inline serve") {
    import graft.operators.Curation
    val w = Curation.qualityFitWeights(spark, sf)
    val path = Files.createTempDirectory("graft-test").toString +
      "/quality_model"
    Curation.saveQualityModel(spark, w, path)
    val back = Curation.loadQualityModel(spark, path)
    assert(back.toSeq == w.toSeq) // int64 parquet round-trip is exact
    // the registered x26s face reads THROUGH the persisted model; its
    // output must equal serving the in-memory fit weights directly
    val fromStore = Curation.qualityFitServe(spark, sf).collect().toSeq
    val inline = Curation.normalizedClassifier(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text", w)
      .collect().toSeq
    assert(fromStore == inline)
  }

  test("x14 cluster sample: per-cell md5 pick over nearest pinned cells") {
    val cents = graft.operators.Pinned.ivfCentroids
    def dotd(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val assigned = embs.map { case (id, v) =>
      val nrm = math.sqrt(dotd(v, v))
      val sv = v.map(_ / nrm)
      val dots = cents.map(c => dotd(sv, c))
      // argmax, ties to the lower index — the engine's struct(-dot, i) sort
      val cell = dots.indices.minBy(i => (-dots(i), i))
      (id, cell)
    }
    val expected = assigned.groupBy(_._2).toSeq.flatMap { case (cell, vs) =>
      vs.map(_._1).sortBy(id => (md5hex(id.toString), id)).take(5).zipWithIndex
        .map { case (id, i) => (cell, (i + 1).toLong, id) }
    }.sortBy(x => (x._1, x._2))
    val got = Sampling.clusterSample(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // balance: never more than nPerCell from one cell, and full cells
    // contribute exactly nPerCell — the diversity contract
    val perCell = got.groupBy(_._1).map { case (c, rows) => c -> rows.size }
    assert(perCell.values.forall(_ <= 5))
    val popOf = assigned.groupBy(_._2).map { case (c, vs) => c -> vs.size }
    perCell.foreach { case (c, n) => assert(n == math.min(5, popOf(c))) }
  }

  test("x17 soft-dedup weights match a Scala recomputation and conserve family mass") {
    val fams = docs.groupBy { case (_, text) =>
      md5hex(text.trim.replaceAll("\\s+", " ").toLowerCase)
    }
    val sizeOf = fams.flatMap { case (_, ds) =>
      ds.map(d => d._1 -> ds.size.toLong)
    }
    val expected = docs.map { case (id, _) =>
      val n = sizeOf(id)
      (id, n, r4(1.0 / n.toDouble))
    }.sortBy(_._1)
    val got = Sampling.softDedupWeights(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected)
    // mass conservation: weights sum to the number of distinct
    // families (up to r4 rounding)
    val mass = got.map(_._3).sum
    assert(math.abs(mass - fams.size) < 0.01 * fams.size)
    // planted family law (sf0.001 happens to be dup-free): three
    // copies — whitespace/case variants land in ONE family at 1/3
    import spark.implicits._
    val planted = Seq((1L, "same doc here"), (2L, "  same   DOC here "),
      (3L, "same doc HERE"), (4L, "another one")).toDF("doc_id", "text")
    val w = Sampling.softDedupWeights(planted, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(Seq(1L, 2L, 3L).forall(id => w(id) == (3L, r4(1.0 / 3))))
    assert(w(4L) == (1L, 1.0))
  }

  test("t28 Zipf profile matches an independent least-squares recomputation") {
    val T = TextOps
    val counts = docs.flatMap(_._2.trim.split("\\s+"))
      .groupBy(identity).map { case (w, v) => (w, v.size.toLong) }.toSeq
    val ranked = counts.sortBy { case (w, n) => (-n, w) }.take(T.T28K)
    val xy = ranked.zipWithIndex.map { case ((_, n), i) =>
      (math.log((i + 1).toDouble), math.log(n.toDouble))
    }
    // rank-ordered left folds — the engine's exact accumulation order
    val kf = xy.size.toLong
    val sx = xy.foldLeft(0.0)((a, p) => a + p._1)
    val sy = xy.foldLeft(0.0)((a, p) => a + p._2)
    val sxy = xy.foldLeft(0.0)((a, p) => a + p._1 * p._2)
    val sxx = xy.foldLeft(0.0)((a, p) => a + p._1 * p._1)
    val syy = xy.foldLeft(0.0)((a, p) => a + p._2 * p._2)
    val kD = kf.toDouble
    val num = kD * sxy - sx * sy
    val den = kD * sxx - sx * sx
    val slope = num / den
    val expected = (counts.size.toLong, counts.map(_._2).sum, kf,
      r4(slope), r4((sy - slope * sx) / kD),
      r4((num * num) / (den * (kD * syy - sy * sy))))
    val got = TextOps.zipfProfile(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == Seq(expected))
    // Zipf law: frequency falls with rank, and the fit explains most
    // of the head's variance on any skewed corpus
    assert(got.head._4 < 0.0, s"non-negative Zipf slope: ${got.head}")
  }

  // Every segmentation of `word` into pieces of length 1..maxLen —
  // the brute-force oracle for the Viterbi kernel (words are ≤8
  // chars, so ≤108 compositions).
  private def allSegs(word: String, maxLen: Int): Seq[Seq[String]] =
    if (word.isEmpty) Seq(Seq.empty)
    else (1 to math.min(maxLen, word.length)).flatMap { l =>
      allSegs(word.drop(l), maxLen).map(word.take(l) +: _)
    }

  test("t27 Viterbi kernel laws: concat identity, max-score vs brute force, shorter-piece ties") {
    val pieces = Seq("a", "b", "c", "ab", "bc", "abc", "abcd")
    val scores = Seq(-3.0, -3.0, -3.0, -4.0, -4.0, -5.0, -6.0)
    val score = pieces.zip(scores).toMap
    for (w <- Seq("a", "ab", "abc", "abcd", "abcabc", "abcdabcd", "cab")) {
      val got = TextOps.unigramViterbiLocal(w, pieces, scores)
      assert(got.mkString == w, s"concat identity broken for $w: $got")
      val best = allSegs(w, TextOps.T27MaxPieceLen)
        .filter(_.forall(score.contains))
        .map(seg => seg.map(score).sum).max
      assert(math.abs(got.map(score).sum - best) < 1e-12,
        s"$w: kernel score ${got.map(score).sum} != brute-force best $best")
    }
    // exact tie: "ab"+"c" (−4 + −3) vs "abc" (−7) — the ascending-l
    // strict-> rule keeps the SHORTER last piece, so "abc" loses
    val tp = Seq("a", "b", "c", "ab", "abc")
    val ts = Seq(-2.0, -3.0, -3.0, -4.0, -7.0)
    assert(TextOps.unigramViterbiLocal("abc", tp, ts) == Seq("ab", "c"))
  }

  test("t29 unigram encode matches a brute-force recomputation under the pinned model") {
    val T = TextOps
    val model = T.pinnedUnigramPieces.zip(T.pinnedUnigramScores).toMap
    def lexLt(x: Seq[Int], y: Seq[Int]): Boolean =
      x.zip(y).find { case (a, b) => a != b } match {
        case Some((a, b)) => a < b
        case None => x.length < y.length
      }
    def nPieces(w: String): Long = {
      // valid: multi-char pieces must be in-vocab; single chars fall
      // back to the UNK score (the kernel's serve rule)
      def score(seg: Seq[String]): Option[Double] =
        seg.foldLeft(Option(0.0)) {
          case (None, _) => None
          case (Some(acc), p) if p.length == 1 =>
            Some(acc + model.getOrElse(p, T.T29UnkScore))
          case (Some(acc), p) => model.get(p).map(acc + _)
        }
      val scored = allSegs(w, T.T27MaxPieceLen)
        .flatMap(seg => score(seg).map(seg -> _))
      val best = scored.map(_._2).max
      scored.filter(_._2 == best).map(_._1)
        .reduceLeft { (a, b) =>
          if (lexLt(b.map(_.length).reverse, a.map(_.length).reverse)) b
          else a
        }.length.toLong
    }
    val expected = docs.map { case (id, text) =>
      val ws = text.trim.split("\\s+").toSeq
      (id, ws.size.toLong, ws.map(nPieces).sum)
    }.sortBy(_._1)
    val got = TextOps.unigramEncodePinned(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // learned multi-char pieces actually compress: fewer pieces than chars
    val totChars = docs.map(_._2.trim.split("\\s+").map(_.length).sum).sum
    assert(got.map(_._3).sum < totChars, "no compression over chars")
  }

  test("t29 serve kernel: out-of-vocab characters segment via UNK, never crash") {
    val T = TextOps
    val got = T.unigramViterbiLocal("zz~9x",
      T.pinnedUnigramPieces, T.pinnedUnigramScores, T.T29UnkScore)
    assert(got.mkString == "zz~9x", s"concat identity broken: $got")
    assert(got.forall(_.length == 1), "unk chars must stay single")
  }

  test("t27 unigram-LM training matches an independent brute-force EM recomputation") {
    val T = TextOps
    val words = docs.flatMap(_._2.trim.split("\\s+"))
      .groupBy(identity).map { case (w, v) => (w, v.size.toLong) }.toSeq
    // seed: weighted substring counts, singles + top-seedMulti multis
    val occ = words.flatMap { case (w, n) =>
      for { i <- 0 until w.length
            l <- 1 to math.min(T.T27MaxPieceLen, w.length - i) }
        yield (w.substring(i, i + l), n)
    }.groupBy(_._1).map { case (p, v) => (p, v.map(_._2).sum) }
    val singles = occ.filter(_._1.length == 1).toSeq
    val multis = occ.filter(_._1.length > 1).toSeq
      .sortBy { case (p, f) => (-f, p) }.take(T.T27SeedMulti)
    val vocab = (singles ++ multis).sortBy(_._1)
    val nV = vocab.size
    val tot0 = vocab.map(_._2).sum
    var sc: Map[String, Double] =
      vocab.map { case (p, f) => p -> math.log(f.toDouble / tot0.toDouble) }.toMap
    // strict lexicographic < on piece-length sequences
    def lexLt(x: Seq[Int], y: Seq[Int]): Boolean =
      x.zip(y).find { case (a, b) => a != b } match {
        case Some((a, b)) => a < b
        case None => x.length < y.length
      }
    def bestSeg(w: String): Seq[String] = {
      // brute force, tie-broken the kernel's way: the backtrack picks
      // the shortest piece at each END position, so among max-score
      // segmentations the winner has the lexicographically smallest
      // piece-length sequence read RIGHT to LEFT
      // exact-double comparison throughout: both engines sum each
      // segmentation's score left to right, so bit-identical values
      val cands = allSegs(w, T.T27MaxPieceLen).filter(_.forall(sc.contains))
      val best = cands.map(seg => seg.map(sc).sum).max
      cands.filter(seg => seg.map(sc).sum == best)
        .reduceLeft { (a, b) =>
          if (lexLt(b.map(_.length).reverse, a.map(_.length).reverse)) b
          else a
        }
    }
    var counts: Map[String, Long] = Map.empty
    for (_ <- 1 to T.T27Rounds) {
      counts = words.flatMap { case (w, n) => bestSeg(w).map(p => (p, n)) }
        .groupBy(_._1).map { case (p, v) => (p, v.map(_._2).sum) }
      val totC = counts.values.sum
      sc = vocab.map { case (p, _) =>
        p -> math.log((counts.getOrElse(p, 0L) + 1).toDouble /
          (totC + nV).toDouble)
      }.toMap
    }
    val totC = counts.values.sum
    val expected = counts.toSeq.sortBy { case (p, c) => (-c, p) }
      .take(T.T27K).zipWithIndex.map { case ((p, c), i) =>
        (i + 1, p, c,
          r4(math.log((c + 1).toDouble / (totC + nV).toDouble)))
      }
    val got = TextOps.unigramTrain(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == expected)
    // the learned inventory actually uses multi-char pieces
    assert(got.exists(_._2.length > 1), "no multi-char piece survived EM")
  }

  test("x20 waterfill: budget met within flooring slack, saturated rows " +
       "taken whole, unsaturated rows share one level") {
    val got = Sampling.mixtureWaterfill(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    val totalAvail = got.map(_._2).sum
    val budget = math.floor(totalAvail * Sampling.X20BudgetFrac).toLong
    val alloc = got.map(_._4).sum
    assert(alloc <= budget, s"overshoot: $alloc > $budget")
    assert(budget - alloc <= got.length, // < 1 lost per floored source
      s"undershoot beyond flooring slack: $alloc vs $budget")
    got.foreach { case (src, avail, _, a, sat) =>
      assert(a <= avail, s"$src allocated beyond availability")
      assert(sat == (a == avail), s"$src saturation flag wrong")
    }
    // unsaturated sources sit at a common level: alloc_i/w_i within 1/w
    val levels = got.filter(!_._5).map(t => t._4.toDouble / t._3)
    if (levels.length >= 2)
      assert(levels.max - levels.min <= 1.0,
        s"unsaturated levels diverge: ${levels.min} .. ${levels.max}")
    // saturated sources are exactly the cheap-ratio prefix
    val byRatio = got.sortBy(t => (t._2.toDouble / t._3, t._1))
    val firstUnsat = byRatio.indexWhere(!_._5)
    if (firstUnsat >= 0)
      assert(byRatio.drop(firstUnsat).forall(!_._5),
        "a saturated source ranked after an unsaturated one")
  }

  test("t30 kneser-ney: complete bigram matrix normalizes to exactly 1 " +
       "per context; real corpus masses stay ≤ 1") {
    import spark.implicits._
    // "a a a b b a b b" contains all four bigrams over {a,b} → every
    // w2 type continues every w1, so the seen-mass sums to 1 exactly
    val full = Seq("a a a b b a b b").toDF("text")
    val sums = TextOps.knTable(full, "text")
      .groupBy("w1").agg(org.apache.spark.sql.functions.sum("p_kn").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sums.keySet == Set("a", "b"))
    sums.values.foreach(s => assert(math.abs(s - 1.0) < 1e-12, s.toString))
    // on a real corpus the seen mass is ≤ 1 (the rest is backoff mass
    // reserved for unseen continuations)
    val corpus = Tables.t(spark, sf, "documents")
    val m = TextOps.knTable(corpus, "text")
      .groupBy("w1").agg(org.apache.spark.sql.functions.sum("p_kn").as("s"))
      .collect().map(_.getDouble(1))
    assert(m.nonEmpty && m.forall(_ <= 1.0 + 1e-9))
  }

  test("t30 kneser-ney: continuation mass beats raw frequency for " +
       "single-context words") {
    import spark.implicits._
    // 'z' is frequent but only ever follows 'q'; 'y' is rarer but
    // follows many contexts → P_cont(y) > P_cont(z) even though
    // count(z) > count(y). KN encodes that via N1+(·w).
    val docs = Seq("q z q z q z q z q z a y b y c y").toDF("text")
    // the direct check P(y|c) > P(z|c) would need both pairs seen;
    // instead pin the continuation counts via the table shape:
    val cont = TextOps.knTable(docs, "text")
      .select("w2").collect().map(_.getString(0))
    assert(cont.count(_ == "y") == 3 && cont.count(_ == "z") == 1,
      "y should appear in 3 contexts, z in 1")
  }

  test("d14 dup spans: per-doc spans are disjoint with token gaps, " +
       "each at least one window wide, and their union IS t26's coverage") {
    val spans = TextOps.dupSpans(spark, sf)
    val rows = spans.collect()
    assert(rows.nonEmpty, "no duplicated spans at smoke SF (suspicious)")
    rows.groupBy(_.getLong(0)).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.getInt(2))
      sorted.foreach { r =>
        assert(r.getInt(3) >= r.getInt(2) + TextOps.T26Width - 1,
          s"span narrower than a window: $r")
        assert(r.getInt(4) == r.getInt(3) - r.getInt(2) + 1)
      }
      sorted.sliding(2).foreach {
        case Array(p, n) =>
          assert(n.getInt(2) > p.getInt(3) + 1,
            s"adjacent spans failed to merge: $p | $n")
        case _ =>
      }
    }
    // cross-operator law: Σ span_tokens per doc == t26 covered_tokens
    val fromSpans = rows.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getInt(4).toLong).sum).toMap
    val fromCoverage = TextOps.spanCoverage(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    fromCoverage.foreach { case (doc, cov) =>
      assert(fromSpans.getOrElse(doc, 0L) == cov,
        s"doc $doc: spans say ${fromSpans.getOrElse(doc, 0L)}, t26 says $cov")
    }
  }

  test("x21 family split: a planted duplicate family NEVER straddles " +
       "splits (where the doc-keyed x01 rule does leak), and totals add up") {
    import spark.implicits._
    // 60 docs: 20 content families of 3 copies each, ids scattered so
    // a doc-keyed split will cut through some family
    val docs = (0 until 60).map { i =>
      (i.toLong, s"family ${i % 20} content payload")
    }.toDF("doc_id", "text")
    val assign = Sampling.familySplitAssignments(docs, "doc_id", "text")
    val straddle = assign.groupBy("fp")
      .agg(org.apache.spark.sql.functions.count_distinct(col("split"))
        .as("k"))
      .filter(col("k") > 1).count()
    assert(straddle == 0, "a family straddled splits")
    // the doc-keyed rule DOES leak on the same corpus — the law that
    // motivates x21 (if this ever stops leaking, the fixture is dead)
    val docKeyed = Sampling.deterministicSplit(
        docs.select(col("doc_id"),
          Sampling.contentFp(col("text")).as("fp")), "doc_id")
      .groupBy("fp")
      .agg(org.apache.spark.sql.functions.count_distinct(col("split"))
        .as("k"))
      .filter(col("k") > 1).count()
    assert(docKeyed > 0, "fixture no longer demonstrates doc-split leakage")
    // report totals == corpus
    val rep = Sampling.familySplit(docs, "doc_id", "text").collect()
    assert(rep.map(_.getLong(1)).sum == 60)
    assert(rep.map(_.getLong(2)).sum == 20)
  }

  test("x20 waterfill: monotone in the budget, degenerate budgets behave") {
    import spark.implicits._
    val docs = Seq(
      ("a", 1L, 100L), ("a", 2L, 100L), ("b", 3L, 50L), ("c", 4L, 1000L)
    ).toDF("source", "doc_id", "n_chars")
    def alloc(frac: Double): Map[String, Long] =
      Sampling.mixtureWaterfill(docs, "source", col("n_chars"), frac)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val lo = alloc(0.3)
    val hi = alloc(0.8)
    assert(lo.keySet == Set("a", "b", "c"))
    lo.keys.foreach(k => assert(lo(k) <= hi(k), s"$k shrank as budget grew"))
    // frac 1.0: everything saturates, alloc == avail
    val full = alloc(1.0)
    assert(full == Map("a" -> 200L, "b" -> 50L, "c" -> 1000L), full.toString)
  }

  test("x23 token-budget mixture: availability ≡ the pinned-tokenizer " +
       "fertility recomputation; budget and monotone laws hold; " +
       "fertility genuinely re-ranks vs word mass") {
    import spark.implicits._
    val got = Sampling.tokenBudgetMixture(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    // availability cross-law: per-source Σ n_pieces under the SAME
    // pinned unigram model, via the independently-oracled t29 encode
    val docs = Tables.t(spark, sf, "documents")
    val massWant = TextOps.unigramEncodeWith(docs, "doc_id", "text",
        TextOps.pinnedUnigramPieces, TextOps.pinnedUnigramScores)
      .join(docs.select("doc_id", "source"), "doc_id")
      .groupBy("source")
      .agg(org.apache.spark.sql.functions.sum("n_pieces").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (src, avail, _, _, _) =>
      assert(avail == massWant(src), s"$src avail $avail != t29 mass ${massWant(src)}")
    }
    // x20's budget law in model tokens
    val budget = math.floor(got.map(_._2).sum * Sampling.X20BudgetFrac).toLong
    val alloc = got.map(_._4).sum
    assert(alloc <= budget && budget - alloc <= got.length,
      s"alloc $alloc vs budget $budget (flooring slack ${got.length})")
    got.foreach { case (src, avail, _, a, sat) =>
      assert(a <= avail && sat == (a == avail), s"$src contract broken")
    }
    // monotone in the budget
    def allocAt(frac: Double): Map[String, Long] =
      Sampling.tokenBudgetMixture(docs, "source", "text", frac)
        .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val lo = allocAt(0.3)
    got.foreach { case (src, _, _, a, _) =>
      assert(lo(src) <= a, s"$src shrank as the budget grew") }
    // the CORRECTION is non-vacuous: on a corpus where fertility
    // differs by source, the token allocation must differ from the
    // word-mass allocation (else x23 restates x20)
    val skew = Seq(
      ("a", 1L, "aa bb aa bb aa bb aa bb"),    // short in-vocab-ish words
      ("b", 2L, "zzzzzzzq zzzzzzzq zzzzzzzq"), // long high-fertility words
      ("c", 3L, "aa bb cc dd")
    ).toDF("source", "doc_id", "text").withColumn("n_chars",
      org.apache.spark.sql.functions.length($"text").cast("long"))
    val words = Sampling.mixtureWaterfill(skew, "source",
      org.apache.spark.sql.functions.size(org.apache.spark.sql.functions
        .split(org.apache.spark.sql.functions.trim($"text"), "\\s+"))
        .cast("long"), 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val toks = Sampling.tokenBudgetMixture(skew, "source", "text", 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(words != toks,
      s"fertility correction changed nothing: words=$words tokens=$toks")
  }

  test("x24 decontaminated budgets: flagged-doc tokens vanish from " +
       "availability; contamination-free corpus collapses to x23; " +
       "planted contamination genuinely shifts the allocation") {
    import spark.implicits._
    // member cross-law on the real fixture: x24's per-source avail ==
    // x23-on-(train minus x05-flagged), recomputed from the members
    val docs = Tables.t(spark, sf, "documents")
    val got = Sampling.decontaminatedTokenBudget(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sh = Sampling.deterministicSplit(
      graft.operators.Dedup.docShingles(docs, "doc_id", "text"), "doc_id")
    val flagged = graft.operators.Dedup.decontaminate(
        sh.filter($"split" === "train"), sh.filter($"split" === "test"))
      .filter($"contamination" >= Sampling.X24ContaminationMin)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged.nonEmpty, "x24 fixture vacuous: nothing flagged")
    val clean = Sampling.deterministicSplit(docs, "doc_id")
      .filter($"split" === "train")
      .filter(!$"doc_id".isin(flagged.toSeq: _*))
    val want = Sampling.tokenBudgetMixture(clean, "source", "text",
        Sampling.X20BudgetFrac)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want, s"member recomposition mismatch: $got vs $want")
    // per-source avail never exceeds the un-decontaminated train avail
    val trainAvail = Sampling.tokenBudgetMixture(
        Sampling.deterministicSplit(docs, "doc_id")
          .filter($"split" === "train"), "source", "text",
        Sampling.X20BudgetFrac)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (src, a) =>
      assert(a <= trainAvail(src), s"$src avail grew after decontamination") }
    // constructed corpus: ids chosen so the md5-prefix split puts the
    // planted duplicate pair on opposite sides of the train/test line
    val ids = (1L to 400L)
    val split = Sampling.deterministicSplit(
      ids.toDF("doc_id"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val testId = ids.find(split(_) == "test").get
    val trainIds = ids.filter(split(_) == "train").take(3)
    assert(trainIds.size == 3)
    val leak = "unique leaked shingle content here now"
    val cleanTxt = Seq("alpha beta gamma delta", "epsilon zeta eta theta",
      "iota kappa lambda mu")
    val corpus = (Seq((testId, "bench", leak)) ++
      trainIds.zip(cleanTxt).map { case (id, t) => (id, s"src${id % 2}", t) })
      .toDF("doc_id", "source", "text")
    // plant: train doc 0 becomes a copy of the benchmark doc
    val planted = corpus.withColumn("text",
      org.apache.spark.sql.functions.when($"doc_id" === trainIds.head,
        leak).otherwise($"text"))
    val before = Sampling.decontaminatedTokenBudget(corpus, "doc_id",
      "source", "text", 0.5).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = Sampling.decontaminatedTokenBudget(planted, "doc_id",
      "source", "text", 0.5).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // the planted doc's source loses ITS ENTIRE doc from availability
    val plantedSrc = s"src${trainIds.head % 2}"
    assert(after(plantedSrc) < before(plantedSrc),
      s"planted contamination did not reduce $plantedSrc: $before -> $after")
    // and on the contamination-free corpus x24 == x23-on-train exactly
    val x23Train = Sampling.tokenBudgetMixture(
      Sampling.deterministicSplit(corpus, "doc_id")
        .filter($"split" === "train"), "source", "text", 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val x24NoLeak = Sampling.decontaminatedTokenBudget(corpus, "doc_id",
      "source", "text", 0.5).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(x24NoLeak == x23Train,
      "x24 on a contamination-free corpus must restate x23 on train")
  }

  test("x25 epoch budgets: alloc bounded by E x unique; epochs law; " +
       "E=1 restates the x23 level problem; planted scarcity repeats " +
       "the scarce source and only it") {
    import spark.implicits._
    val e = Sampling.X25MaxEpochs
    val got = Sampling.epochTokenBudget(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(got.nonEmpty)
    got.foreach { case (src, uniq, _, alloc, ep, sat) =>
      assert(alloc <= e * uniq, s"$src alloc exceeds E x unique")
      assert(ep <= e, s"$src epochs_used $ep > $e")
      assert(ep == math.ceil(alloc.toDouble / uniq).toLong, s"$src epochs law")
      assert(sat == (alloc == e * uniq), s"$src saturation law")
    }
    // the fixture exercises the repetition regime both ways
    assert(got.exists(_._5 > 1), "no source repeated — fixture vacuous")
    assert(got.exists(_._5 <= 1), "every source at max — fixture vacuous")
    // E=1 at the x20 fraction restates x23's allocation exactly
    val docs = Tables.t(spark, sf, "documents")
    val e1 = Sampling.epochTokenBudget(docs, "source", "text",
        Sampling.X20BudgetFrac, 1)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3)))
      .toMap
    val x23 = Sampling.tokenBudgetMixture(docs, "source", "text",
        Sampling.X20BudgetFrac)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3)))
      .toMap
    assert(e1 == x23, "E=1 must restate the x23 level problem")
    // planted scarcity: a high-weight tiny source gets repeated while
    // the low-weight abundant one is not (weights decay by name rank,
    // so 'a' outweighs 'z')
    val skew = Seq(
      ("a", 1L, "aa bb"),
      ("z", 2L, Seq.fill(200)("cc dd").mkString(" "))
    ).toDF("source", "doc_id", "text")
    // frac 0.2 of the x4-scaled supply = 0.8x the unique supply: the
    // tiny 'a' saturates its 4 epochs, the abundant 'z' stays under
    // one epoch — the regime split the operator exists to expose
    val plan = Sampling.epochTokenBudget(skew, "source", "text", 0.2, 4)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(plan("a") > 1, s"scarce high-weight source not repeated: $plan")
    assert(plan("z") <= 1, s"abundant source repeated needlessly: $plan")
  }

  test("x22 pack efficiency: conservation, only the tail partial, planted manifest") {
    val rep = Sampling.packEfficiency(spark, sf).collect()
    val totalTokens = docs.map(_._2.trim.split("\\s+").length.toLong).sum
    assert(rep.map(_.getLong(1)).sum == totalTokens,
      "filled tokens must equal corpus tokens (nothing lost or invented)")
    // every sequence but the last is exactly full
    val last = rep.map(_.getLong(0)).max
    rep.filter(_.getLong(0) < last).foreach { r =>
      assert(r.getBoolean(4) && r.getLong(1) == 256L,
        s"non-final seq ${r.getLong(0)} is partial")
    }
    assert(rep.last.getBoolean(4) == (totalTokens % 256 == 0))
    // planted: budget 10, docs of 4/4/4 tokens — doc 3 straddles seqs 0/1
    import spark.implicits._
    val m = Sampling.packManifest(
      Seq((1L, "a b c d"), (2L, "e f g h"), (3L, "i j k l"))
        .toDF("doc_id", "text"),
      "doc_id", size(split(trim(col("text")), "\\s+")).cast("long"), 10L)
    val eff = Sampling.packEfficiency(m, 10L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(eff.toSeq == Seq((0L, 10L, 3L, 1L, true), (1L, 2L, 1L, 1L, false)),
      eff.mkString(", "))
  }

  test("v05 vocab divergence: identical sources score 0, drifted source is positive and <= ln 2") {
    import spark.implicits._
    val same = Seq(
      ("a", "x y z x"), ("b", "x y z x"), ("c", "q r s t u v w")
    ).toDF("source", "text")
    val out = graft.operators.Checks.vocabDivergence(same, "source", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // a and b have identical distributions — but the GLOBAL mix includes
    // c, so they are equidistant from it and strictly positive
    assert(out("a") == out("b"), "identical sources must score identically")
    out.values.foreach { j =>
      assert(j >= 0.0 && j <= math.log(2.0) + 1e-9, s"jsd $j out of [0, ln 2]")
    }
    assert(out("c") > out("a"), "the disjoint-vocab source must drift more")
    // a single-source corpus IS the global distribution: jsd exactly 0
    val solo = graft.operators.Checks.vocabDivergence(
      Seq(("only", "x y z x y")).toDF("source", "text"), "source", "text")
      .collect()
    assert(solo.length == 1 && solo.head.getDouble(3) == 0.0)
    // registered query: one row per source, all in range
    val reg = graft.operators.Checks.vocabDivergence(spark, sf).collect()
    assert(reg.length == spark.read.parquet(s"$sf/documents.parquet")
      .select("source").distinct().count())
    reg.foreach(r => assert(r.getDouble(3) >= 0.0
      && r.getDouble(3) <= math.log(2.0) + 1e-9))
  }

  test("t31 memorization: verbatim copy scores 1000, novel text 0, partial in between") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ") // 40 tokens
    val novel = (1 to 40).map(i => s"new$i").mkString(" ")
    val half = (1 to 20).map(i => s"tok$i").mkString(" ") + " " +
      (1 to 20).map(i => s"odd$i").mkString(" ")
    val train = Seq((1L, base)).toDF("doc_id", "text")
    val eval = Seq((10L, base), (11L, novel), (12L, half))
      .toDF("doc_id", "text")
    val got = TextOps.memorization(train, eval, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(10L) == ((25L, 25L, 1000L)), got(10L).toString) // 40-16+1 windows
    assert(got(11L)._2 == 0L && got(11L)._3 == 0L)
    // half-copied doc: exactly the windows fully inside the copied
    // 20-token prefix are memorized — positions 0..4 of 25
    assert(got(12L) == ((25L, 5L, 200L)), got(12L).toString)
    // registered query: eval rows only, memorized <= windows
    val reg = TextOps.memorization(spark, sf).collect()
    reg.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 1000L)
    }
  }

  test("t32 fertility: >= 1000 everywhere; lang sums == t14's doc sums") {
    val rep = TextOps.bpeFertility(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rep.nonEmpty)
    rep.foreach { case (_, nw, nb, milli) =>
      assert(nb >= nw, "a word encodes to at least one token")
      assert(milli >= 1000L)
    }
    // cross-operator conservation: Σ_lang == Σ_doc (t14)
    val t14 = TextOps.bpeEncodePinned(spark, sf).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(rep.map(_._2).sum == t14.map(_._1).sum, "word totals diverge")
    assert(rep.map(_._3).sum == t14.map(_._2).sum, "token totals diverge")
  }

  test("v06 dedup impact: planted corpus hits every stage with exact accounting") {
    import spark.implicits._
    def words(a: Int, b: Int, p: String) =
      (a until b).map(i => s"$p$i").mkString(" ")
    val span = words(0, 16, "s") // a 16-token block repeated across docs
    val docs = Seq(
      // exact family: 3 identical docs (keeper 1; 2 copies removed)
      (1L, words(0, 10, "e")), (2L, words(0, 10, "e")), (3L, words(0, 10, "e")),
      // near family: J≈0.75 pair, doc 5 longer → keeper by n_chars
      (4L, words(0, 30, "n")), (5L, words(0, 30, "n") + " extra tail here"),
      // span family: the 16-token block inside two otherwise-unrelated docs
      (6L, span + " " + words(0, 10, "x")),
      (7L, words(0, 10, "y") + " " + span),
      (8L, words(0, 12, "z"))) // untouched
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    val got = Curation.dedupImpact(docs, "doc_id", "text").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // exact: docs 2,3 removed — 10 tokens each
    assert(got("exact_dedup") == ((2L, 20L)), got("exact_dedup").toString)
    // near: ALL of the exact family clusters too (J=1.0 ≥ 0.7) — docs
    // {1,2,3} cluster (keeper = 1 by doc_id tiebreak on equal n_chars),
    // docs {4,5} cluster (keeper = 5, longer): removed = 2,3 (10 tok
    // each) + 4 (30 tok)
    assert(got("near_dedup") == ((3L, 50L)), got("near_dedup").toString)
    // span: the 16-token block covers 16 tokens in docs 6 AND 7, and
    // the near pair's shared 30-token prefix is ALSO window-duplicated
    // (30 covered in each of 4 and 5 — the lenses overlap by design);
    // the exact triplet's 10-token bodies are below the window width
    // so they contribute nothing
    assert(got("span_dedup") == ((4L, 92L)), got("span_dedup").toString)
    // cross-operator law on the gate corpus: the span row IS the t26
    // coverage aggregate
    val viaT26 = TextOps.spanCoverage(spark, sf)
      .agg(sum(when(col("covered_tokens") > 0, 1L).otherwise(0L)),
        sum(col("covered_tokens"))).as[(Long, Long)].head()
    val reg = Curation.dedupImpact(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(reg("span_dedup") == viaT26,
      s"v06 span row ${reg("span_dedup")} != t26 aggregate $viaT26")
  }
  test("v09 tokenizer drift: registered form ≡ Scala recomputation; " +
       "constructed corpus exercises new-word and OOV-fertility signals") {
    import spark.implicits._
    // registered form vs a full Scala recomputation at the spec SF
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val cut = math.floor(docs.map(_._1).max * TextOps.V09SplitFrac).toLong
    val pieces = TextOps.pinnedUnigramPieces
    val scores = TextOps.pinnedUnigramScores
    def wordsOf(t: String): Seq[String] = t.trim.split("\\s+").toSeq
    def milli(num: Long, den: Long): Long =
      math.floor(num * 1000.0 / den + 0.5).toLong
    def statsOf(split: Seq[(Long, String)]): (Long, Long, Long) = {
      val ws = split.flatMap(d => wordsOf(d._2))
      val nSub = ws.map(w => TextOps
        .unigramViterbiLocal(w, pieces, scores, TextOps.T29UnkScore)
        .length.toLong).sum
      val whole = ws.count(pieces.toSet).toLong
      (ws.size.toLong, nSub, whole)
    }
    val ref = docs.filter(_._1 < cut).toSeq
    val cur = docs.filter(_._1 >= cut).toSeq
    val refW = ref.flatMap(d => wordsOf(d._2)).toSet
    val curW = cur.flatMap(d => wordsOf(d._2)).toSet
    val (rn, rp, rw) = statsOf(ref)
    val (cn, cp, cw) = statsOf(cur)
    val expected = Seq(
      ("1_ref", rn, milli(rp, rn), milli(rw, rn), 0L),
      ("2_cur", cn, milli(cp, cn), milli(cw, cn),
        milli((curW -- refW).size.toLong, curW.size.toLong)))
    val got = TextOps.tokenizerDrift(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)

    // constructed corpus: cur introduces NEW words and an OOV-char
    // word (every char outside the vocab alphabet -> one unk piece per
    // char, fertility = word length) - the drift signals must fire
    val refDf = Seq((0L, "a at join a"), (1L, "at a")).toDF("doc_id", "text")
    val curDf = Seq((10L, "zzz a"), (11L, "zzz qqq")).toDF("doc_id", "text")
    val rep = TextOps.tokenizerDrift(refDf, curDf, "text", pieces, scores,
        TextOps.T29UnkScore)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // ref: 6 words, all whole pieces (a/at/join in vocab), fertility 1000
    assert(rep("1_ref") == ((6L, 1000L, 1000L, 0L)))
    // cur: 4 words; zzz/qqq are 3-char all-OOV -> 3 pieces each (z and
    // q: q IS in vocab as a piece; z is not). zzz -> 3 unk singles;
    // qqq -> 3 q pieces. fertility = (3+1+3+3)/4 = 2500
    assert(rep("2_cur")._1 == 4L)
    assert(rep("2_cur")._2 == 2500L)
    // whole-piece: only 'a' of the 4 occurrences = 250
    assert(rep("2_cur")._3 == 250L)
    // new words: {zzz, qqq} of distinct {zzz, a, qqq} = 667
    assert(rep("2_cur")._4 == 667L)
  }
}

