package graft

import org.apache.spark.sql.functions._
import graft.operators.{MediaMeta, MediaRow, Multimodal}

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("decode kernel: 16-bin nibble histogram, L1-normalized") {
    val d = new Multimodal.FakeDecoder
    // 0x00 0x10 0x10 0xF0 → bins 0:1, 1:2, 15:1, each /4
    val f = d.decode(Array[Byte](0x00, 0x10, 0x10, 0xF0.toByte))
    assert(f.length == 16)
    assert(f(0) == 0.25f && f(1) == 0.5f && f(15) == 0.25f)
    assert(math.abs(f.sum - 1.0f) < 1e-6)
    assert(d.decode(Array.emptyByteArray).forall(_ == 0.0f))
  }

  test("decodeFeatures is a distributed batched map — no payload loss") {
    val rows = (0L until 200L).map { i =>
      MediaRow(i, "image", Array.fill(i.toInt % 7 + 1)(i.toByte),
        MediaMeta(64, 64, 16000, 1000, "png"))
    }
    val out = Multimodal.decodeFeatures(
      spark.createDataset(rows).repartition(4), batchSize = 16).collect()
    assert(out.length == 200)
    assert(out.forall(_.features.length == 16))
    assert(out.forall(f => f.n_bytes == f.media_id % 7 + 1))
  }

  test("resizeMeta rescales dimensions, never touches the payload") {
    val rows = Seq(
      MediaRow(1, "image", Array[Byte](1, 2, 3), MediaMeta(400, 200, 0, 0, "png")),
      MediaRow(2, "image", Array[Byte](9), MediaMeta(50, 50, 0, 0, "png")))
    val out = Multimodal.resizeMeta(spark.createDataset(rows), maxSide = 100)
      .orderBy("media_id").collect()
    assert(out(0).getStruct(3).getInt(0) == 100) // 400 → 100
    assert(out(0).getStruct(3).getInt(1) == 50)  // 200 → 50
    assert(out(0).getAs[Array[Byte]]("payload").toSeq == Seq[Byte](1, 2, 3))
    assert(out(1).getStruct(3).getInt(0) == 50)  // already under maxSide
  }

  test("frameSample: one row per stepMs, offsets within duration") {
    val rows = Seq(
      MediaRow(1, "video", Array[Byte](1), MediaMeta(0, 0, 0, 1200, "mp4")),
      MediaRow(2, "audio", Array[Byte](1), MediaMeta(0, 0, 16000, 9999, "wav")))
    val out = Multimodal.frameSample(spark.createDataset(rows), stepMs = 500)
      .orderBy("frame_idx").collect()
    assert(out.map(_.getLong(0)).forall(_ == 1L), "only video rows sampled")
    assert(out.map(_.getLong(2)).toSeq == Seq(0L, 500L, 1000L))
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
  }

  test("media table: deterministic kinds and metadata from documents") {
    val m = Multimodal.mediaStats(spark, sf).collect()
    assert(m.nonEmpty)
    m.foreach { r =>
      val id = r.getLong(0)
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      assert(r.getString(1) == kind)
    }
  }

  test("m06 payload dedup matches a driver md5 over the raw UTF-8 bytes") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(b).map("%02x".format(_)).mkString
    val expected = docs.groupBy(d => md5hex(d._2.getBytes("UTF-8")))
      .map { case (fp, g) =>
        (fp, g.map(_._1).min, g.length.toLong)
      }.toSeq.sortBy(_._2)
    val got = Multimodal.mediaDedup(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.map(_._3).sum == docs.length, "every payload accounted for")
  }

  test("m08 perceptual clusters match a driver quantized-histogram recomputation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def sig(text: String): String = {
      val b = text.getBytes("UTF-8")
      val bins = new Array[Long](16)
      b.foreach(x => bins((x & 0xF0) >>> 4) += 1)
      bins.map(c => (8 * c) / b.length).mkString("-")
    }
    val expected = docs.groupBy(d => sig(d._2))
      .map { case (s, g) => (s, g.map(_._1).min, g.length.toLong) }
      .toSeq.sortBy(_._2)
    val got = Multimodal.mediaDupClusters(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    assert(got.map(_._3).sum == docs.length, "every payload accounted for")
  }

  test("m08 law: a byte-permuted payload is a PERCEPTUAL dup that m06 separates") {
    // same byte multiset, different order: identical nibble histogram
    // → one m08 family; different md5 → two m06 families. The
    // exact-vs-perceptual distinction the pair of operators exists for.
    val a = "abcdef xyz 123"
    val b = new String(a.getBytes("UTF-8").reverse, "UTF-8")
    val frame = Seq((1L, a), (2L, b), (3L, "totally different payload density!!!!"))
      .toDF("doc_id", "text")
    // rebuild the signature over this planted frame via the same
    // expressions the operator uses
    val withH = frame.select(col("doc_id"),
        octet_length(col("text").cast("binary")).as("n"),
        graft.functions.VectorExprs.nibbleHistogram(
          col("text").cast("binary")).as("h"))
      .selectExpr("doc_id",
        "concat_ws('-', " + (0 until 16).map(i =>
          s"CAST((8 * element_at(h, ${i + 1})) div n AS STRING)")
          .mkString(", ") + ") AS sig")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(withH(1L) == withH(2L), "permuted payload left the bucket")
    assert(withH(1L) != withH(3L), "unrelated payload joined the bucket")
    val md5s = frame.select(col("doc_id"), md5(col("text").cast("binary")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(md5s(1L) != md5s(2L), "m06 would have caught this as exact")
  }

  test("m07 media similarity matches a driver nibble-histogram cosine top-k") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    def hist(b: Array[Byte]): Array[Double] = {
      val bins = new Array[Double](16)
      b.foreach(x => bins((x & 0xF0) >>> 4) += 1.0)
      bins
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val vs = docs.map { case (id, t) => (id, hist(t.getBytes("UTF-8"))) }
    val expected = vs.filter(_._1 < 3).sortBy(_._1).flatMap { case (q, qv) =>
      val qn = math.sqrt(dot(qv, qv))
      vs.filter(_._1 != q).map { case (n, v) =>
        val c = dot(qv, v) / (qn * math.sqrt(dot(v, v)))
        (n, BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.sortBy { case (n, c) => (-c, n) }.take(3).zipWithIndex
        .map { case ((n, c), i) => (q, i + 1, n, c) }
    }
    val got = Multimodal.mediaSimilar(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == expected)
  }

  test("m09 CDC chunks ≡ driver recomputation; chunks tile each payload; " +
    "shifted shared content re-syncs where a fixed grid cannot") {
    import graft.functions.Hashing
    val w = Multimodal.M09Window
    val d = Multimodal.M09Divisor
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    // driver recomputation straight from the kernel contract
    val perMedia = docs.map { case (id, t) =>
      (id, t.getBytes("UTF-8"), Hashing.cdcChunks(t.getBytes("UTF-8"), w, d)) }
    // tiling law: contiguous 1-based spans covering exactly n bytes
    perMedia.foreach { case (id, b, cs) =>
      assert(cs.head.start == 1 && cs.map(_.len).sum == b.length,
        s"chunks do not tile media $id")
      cs.sliding(2).foreach {
        case Array(a, c) => assert(c.start == a.start + a.len)
        case _ => ()
      }
    }
    val copies = perMedia.flatMap(_._3.map(_.fp))
      .groupBy(identity).map { case (f, xs) => f -> xs.size.toLong }
    val expected = perMedia.map { case (id, b, cs) =>
      val shared = cs.filter(c => copies(c.fp) > 1)
      (id, b.length.toLong, cs.length.toLong, shared.length.toLong,
        shared.map(_.len.toLong).sum,
        BigDecimal(shared.map(_.len).sum.toDouble / b.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1)
    val got = Multimodal.mediaCdcChunks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expected)
    // the data itself exercises sharing (else the accounting is vacuous)
    assert(got.exists(_._4 > 0), "no shared chunks anywhere in the corpus")
    // the CDC law: insert a prefix before a shared body — boundaries
    // re-synchronize after the edit, so the shifted copy still shares
    // most chunks; a fixed-size grid shares NONE (every grid cell is
    // offset by the insertion)
    val rnd = new scala.util.Random(7)
    val body = Array.fill(4096)((rnd.nextInt(256) - 128).toByte)
    val a = Hashing.cdcChunks(body, w, d)
    val shifted = Array.fill(11)((rnd.nextInt(256) - 128).toByte) ++ body
    val b2 = Hashing.cdcChunks(shifted, w, d)
    val sharedFps = a.map(_.fp).toSet intersect b2.map(_.fp).toSet
    val sharedBytes = a.filter(c => sharedFps(c.fp)).map(_.len).sum
    assert(sharedBytes > body.length / 2,
      s"CDC failed to re-sync after a prefix insert: $sharedBytes of ${body.length}")
    val gridShared = body.grouped(d).map(_.toSeq).toSet
      .intersect(shifted.grouped(d).map(_.toSeq).toSet)
    assert(gridShared.isEmpty, "the fixed grid accidentally survived the shift")
  }

  test("m13 scene cuts ≡ a driver recomputation of the sliced-window " +
       "histogram walk; row count = frames − 1 per video; thresholds " +
       "non-vacuous") {
    val sfDir = sf
    val got = Multimodal.sceneCuts(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    // driver recomputation straight from the documents fixture
    val docs = graft.Tables.t(spark, sfDir, "documents")
      .select("doc_id", "text", "n_chars").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
    var want = Map.empty[(Long, Long), (Long, Boolean)]
    var framesPerVideo = Map.empty[Long, Int]
    docs.foreach { case (id, (text, nChars)) =>
      if (id % 3 == 2 && nChars > 0) {
        val bytes = text.getBytes("UTF-8")
        val durMs = nChars * 10
        val offs = 0L.until(durMs, 500L)
        framesPerVideo += id -> offs.size
        def hist(off: Long): Array[Long] = {
          val h = new Array[Long](16)
          val from = (off / 10).toInt
          bytes.slice(from, from + Multimodal.M13Window)
            .foreach(b => h((b & 0xF0) >>> 4) += 1)
          h
        }
        offs.sliding(2).foreach {
          case Seq(a, b) =>
            val (ha, hb) = (hist(a), hist(b))
            val d = (0 until 16).map(i => math.abs(hb(i) - ha(i)).toLong).sum
            want += (id, b / 500) -> (d, d > Multimodal.M13CutDelta)
          case _ => ()
        }
      }
    }
    assert(got == want, s"m13 mismatch: ${got.size} vs ${want.size} rows")
    // one row per consecutive frame pair
    got.keys.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.size == framesPerVideo(id) - 1, s"video $id row count")
    }
    // the threshold separates (some cuts, some non-cuts) at this SF
    assert(got.values.exists(_._2), "no cut fired — threshold vacuous high")
    assert(got.values.exists(!_._2), "every frame a cut — threshold vacuous low")
  }

  test("m10 aspect buckets: one row per asset, cover-resize ≥ bucket, " +
       "crop on exactly one axis, and the chosen bucket is the argmin") {
    val got = Multimodal.aspectBuckets(spark, sf).collect()
    val media = Multimodal.media(spark, sf).collect()
      .map(m => m.media_id -> (m.meta.width.toLong, m.meta.height.toLong))
      .toMap
    assert(got.length == media.size)
    got.foreach { r =>
      val (bw, bh) = (r.getAs[Int]("bucket_w"), r.getAs[Int]("bucket_h"))
      val (rw, rh) = (r.getAs[Int]("resize_w"), r.getAs[Int]("resize_h"))
      val (cx, cy) = (r.getAs[Int]("crop_x"), r.getAs[Int]("crop_y"))
      assert(rw >= bw && rh >= bh, s"resize smaller than bucket: $r")
      assert(cx == rw - bw && cy == rh - bh, s"crop mismatch: $r")
      assert(cx == 0 || cy == 0, s"crop on both axes (not cover-resize): $r")
      // argmin law: no other bucket is strictly closer in log-aspect
      val (w, h) = media(r.getAs[Long]("media_id"))
      def dist(b: (Int, Int, Int)): Double =
        math.floor(math.abs(math.log((w * b._3).toDouble / (h * b._2)))
          * 1e6 + 0.5) / 1e6
      val chosen = Multimodal.M10Buckets
        .find(_._1 == r.getAs[Int]("bucket_id")).get
      val best = Multimodal.M10Buckets.minBy(b => (dist(b), b._1))
      assert(chosen == best, s"bucket not argmin for ${w}x$h: $r vs $best")
    }
  }

  test("m11 batch manifest: every asset placed once, slots dense per " +
       "batch, only the bucket tail is partial, `full` is exact") {
    val b = Multimodal.M11BatchSize
    val got = Multimodal.batchManifest(spark, sf).collect()
      .map(r => (r.getAs[Int]("bucket_id"), r.getAs[Int]("batch_idx"),
        r.getAs[Int]("slot"), r.getAs[Long]("media_id"),
        r.getAs[Boolean]("full")))
    val nAssets = Multimodal.aspectBuckets(spark, sf).count()
    assert(got.length.toLong == nAssets)
    assert(got.map(_._4).distinct.length == got.length, "asset placed twice")
    got.groupBy(t => (t._1, t._2)).foreach { case ((bk, bi), members) =>
      val slots = members.map(_._3).sorted
      assert(slots.sameElements(slots.indices.map(identity)),
        s"bucket $bk batch $bi slots not dense: ${slots.mkString(",")}")
      assert(members.forall(_._5 == (members.length == b)),
        s"full flag wrong in bucket $bk batch $bi")
    }
    // at most one partial batch per bucket, and it must be the LAST
    got.groupBy(_._1).foreach { case (bk, members) =>
      val partial = members.groupBy(_._2).filter(_._2.length < b)
      assert(partial.size <= 1, s"bucket $bk has ${partial.size} partials")
      partial.keys.foreach { bi =>
        assert(bi == members.map(_._2).max,
          s"bucket $bk partial batch $bi is not the tail")
      }
    }
  }
  test("s35 cross-modal: result ≡ a Scala recomputation of both towers, " +
       "projection, shortlist and re-rank; self-pair retrievable") {
    import graft.operators.Multimodal
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map(b => f"$b%02x").mkString
    }
    // media tower: high-nibble histogram of the UTF-8 payload bytes
    def mediaHist(text: String): Array[Double] = {
      val h = new Array[Double](16)
      text.getBytes("UTF-8").foreach(b => h((b & 0xF0) >>> 4) += 1.0)
      h
    }
    // text tower: first-md5-hex-digit token histogram
    def textHist(text: String): Array[Double] = {
      val h = new Array[Double](16)
      text.trim.split("\\s+").filter(_.nonEmpty).foreach { t =>
        h(Integer.parseInt(md5hex(t).substring(0, 1), 16)) += 1.0
      }
      h
    }
    val W = Multimodal.s35Projection
    def project(tq: Array[Double]): Array[Double] =
      Array.tabulate(16)(j => (0 until 16).map(i => tq(i) * W(i)(j)).sum)
    def sig(v: Array[Double]): Long = {
      val mean = v.sum / 16.0
      (0 until 16).map(i => if (v(i) > mean) 1L << i else 0L).sum
    }
    def nrm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    def r6(x: Double): Double = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val media = docs.map { case (id, t) =>
      val v = mediaHist(t); (id, v, sig(v), nrm(v)) }
    val expected = docs.filter(_._1 < Multimodal.S35NQueries).sortBy(_._1)
      .flatMap { case (qid, text) =>
        val pj = project(textHist(text))
        val qs = sig(pj); val qn = nrm(pj)
        val shortlist = media
          .map { case (id, _, s2, _) =>
            (id, java.lang.Long.bitCount(s2 ^ qs)) }
          .sortBy(t => (t._2, t._1)).take(Multimodal.S35NCand).toMap
        media.filter(m => shortlist.contains(m._1))
          .map { case (id, v, _, n) =>
            (id, shortlist(id),
              r6((0 until 16).map(i => pj(i) * v(i)).sum / (qn * n))) }
          .sortBy(t => (-t._3, t._1)).take(Multimodal.S35K).zipWithIndex
          .map { case ((id, ham, cos), i) => (qid, i + 1, id, ham, cos) }
      }.toSeq
    val got = Multimodal.crossModalRetrieve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getDouble(4))).toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.map(_._1).distinct.size ==
      Multimodal.S35NQueries)
  }

  test("m14 alignment gate ≡ a Scala recomputation of the s35 towers' " +
       "self-pair cosine; gate discriminates; m14h aggregates m14 exactly") {
    import graft.operators.Multimodal
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    def mediaHist(text: String): Array[Double] = {
      val h = new Array[Double](16)
      text.getBytes("UTF-8").foreach(b => h((b & 0xF0) >>> 4) += 1.0)
      h
    }
    def textHist(text: String): Array[Double] = {
      val h = new Array[Double](16)
      text.trim.split("\\s+").filter(_.nonEmpty).foreach { t =>
        h(Integer.parseInt(md5hex(t).substring(0, 1), 16)) += 1.0
      }
      h
    }
    val W = Multimodal.s35Projection
    def project(tq: Array[Double]): Array[Double] =
      Array.tabulate(16)(j => (0 until 16).map(i => tq(i) * W(i)(j)).sum)
    def nrm(v: Array[Double]): Double = math.sqrt(v.map(x => x * x).sum)
    def r6(x: Double): Double = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    val expected = docs.map { case (id, text, src) =>
      val v = mediaHist(text)
      val pj = project(textHist(text))
      val cos = r6((0 until 16).map(i => pj(i) * v(i)).sum /
        (nrm(pj) * nrm(v)))
      (id, src, cos, cos >= Multimodal.M14AlignMin)
    }.sortBy(_._1).toSeq
    val got = Multimodal.alignmentGate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getBoolean(3))).toSeq
    assert(got == expected)
    // the gate must discriminate at this SF, or keep is vacuous
    assert(got.exists(_._4) && got.exists(!_._4))
    // m14h is EXACTLY m14 aggregated into (source, width-0.1 bin)
    val expHist = expected
      .groupBy { case (_, src, cos, _) =>
        (src, math.min(Multimodal.M14HistBins - 1,
          math.floor((cos + 1.0) * (Multimodal.M14HistBins / 2.0)).toInt)) }
      .map { case ((src, bin), rows) =>
        (src, bin, rows.size.toLong, rows.count(_._4).toLong) }
      .toSeq.sortBy(t => (t._1, t._2))
    val gotHist = Multimodal.alignmentHistogram(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(gotHist == expHist)
    assert(gotHist.map(_._3).sum == docs.length.toLong)
  }

  test("m15 audio spectral stub ≡ a Scala recomputation; audio rows " +
       "only; centroid bounded; flux = 0 iff halves carry equal band mass") {
    import graft.operators.Multimodal
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.filter(_._1 % 3 == 1).map { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val half = bytes.length / 2
      def hist(lo: Int, hi: Int): Array[Long] = {
        val h = new Array[Long](16)
        (lo until hi).foreach(i => h(bytes(i) & 0x0F) += 1L)
        h
      }
      val h1 = hist(0, half)
      val h2 = hist(half, bytes.length)
      val wsum = (0 until 16).map(b => b.toLong * (h1(b) + h2(b))).sum
      val centroid = if (bytes.isEmpty) 0L else wsum * 1000L / bytes.length
      val flux = (0 until 16).map(b => math.abs(h1(b) - h2(b))).sum
      (id, bytes.length.toLong, centroid, flux)
    }.sortBy(_._1).toSeq
    val got = Multimodal.audioSpectralReport(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    // audio rows only (the kind axis), and the feature discriminates
    assert(got.nonEmpty && got.forall(_._1 % 3 == 1))
    assert(got.map(_._3).distinct.size > 1, "centroid is constant")
    // centroid is a band index in millis: 0..15000
    got.foreach { case (id, _, c, f) =>
      assert(c >= 0L && c <= 15000L, s"centroid out of range for $id")
      assert(f >= 0L)
    }
  }

  test("m14 degenerate docs: empty / whitespace-only / zero-payload " +
       "captions score cos = 0 (defined, not NaN) and never pass the gate") {
    import spark.implicits._
    import graft.operators.Multimodal
    val docs = Seq(
      (1L, "", "web"),            // zero payload AND zero token set
      (2L, "   \t  ", "web"),     // whitespace-only: tokens filter to none
      (3L, "a normal caption with words", "web"))
      .toDF("doc_id", "text", "source")
    val got = Multimodal.alignmentPairsFrame(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got(1L) == 0.0 && got(2L) == 0.0)
    assert(!got.values.exists(_.isNaN))
    assert(got(3L) != 0.0) // a real caption still scores
  }
}
