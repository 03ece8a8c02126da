package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.{Dedup, TextOps}

/** Dev tool: decompose the d12/d17/t34 second-decade growth (r16:
  * 3.4–4.5×/decade at fixed band/chunk geometry) into its terms —
  * store-side sketch build, candidate volume (band-bucket / chunk-key
  * collisions), and probe/re-rank — so the density dial targets the
  * term that actually grows.
  *
  * Usage: runMain graft.tools.StoreDialProbe <sfDir> [d12|d17|t34 ...]
  */
object StoreDialProbe {
  private def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime
    val r = f
    println(f"[dial] $label: ${(System.nanoTime - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("testdata-sf1")
    val which = if (args.length > 1) args.drop(1).toSet else Set("d12", "d17", "t34")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = t(spark, dir, "documents")
    val mx = docs.agg(max("doc_id")).head.getLong(0)

    if (which("d12")) {
      val wall = (1 to 2).map { _ =>
        val t0 = System.nanoTime
        Dedup.incrementalNearDup(spark, dir).collect()
        (System.nanoTime - t0) / 1e9
      }.min
      println(f"[dial] $dir d12 total: $wall%.2f s min-of-2")
      val cut = Dedup.D12SplitAt
      val bSh = timed(s"$dir d12 batch sketch")(
        Dedup.sketchDocs(docs.filter(col("doc_id") >= cut), "doc_id", "text")
          .localCheckpoint())
      val sSh = timed(s"$dir d12 store sketch")(
        Dedup.sketchDocs(docs.filter(col("doc_id") < cut), "doc_id", "text")
          .localCheckpoint())
      def banded(sh: DataFrame, as: String): DataFrame =
        sh.select(col("doc_id").as(as),
          posexplode(col("bands")).as(Seq("band", "key")))
      val nCand = timed(s"$dir d12 candidate join")(
        banded(bSh, "batch_id").join(banded(sSh, "store_id"),
          Seq("band", "key")).select("batch_id", "store_id")
          .distinct().count())
      println(s"[dial] $dir d12: batch=${bSh.count()} store=${sSh.count()} candidates=$nCand")
    }

    if (which("d17")) {
      val wall = (1 to 2).map { _ =>
        val t0 = System.nanoTime
        Dedup.incrementalSimhash(spark, dir).collect()
        (System.nanoTime - t0) / 1e9
      }.min
      println(f"[dial] $dir d17 total: $wall%.2f s min-of-2")
      val cut = Dedup.D12SplitAt // d17 shares d12's fixed split id
      val sig = timed(s"$dir d17 sig build")(
        Dedup.simhashStore(docs, "doc_id", "text").localCheckpoint())
      def chunks(df: DataFrame, as: String): DataFrame = df
        .select(col("doc_id").as(as), col("sig"),
          posexplode(array((0 until 4).map(j =>
            shiftrightunsigned(col("sig"), j * 16)
              .bitwiseAND(lit(0xFFFFL))): _*)).as(Seq("chunk", "key")))
        .select(col(as), col("chunk"), col("key"))
      val b = sig.filter(col("doc_id") >= cut)
      val st = sig.filter(col("doc_id") < cut)
      val cand = chunks(b, "batch_id")
        .join(chunks(st, "store_id"), Seq("chunk", "key"))
        .select("batch_id", "store_id").distinct()
      val nCand = timed(s"$dir d17 candidate join")(cand.count())
      println(s"[dial] $dir d17: batch=${b.count()} store=${st.count()} candidates=$nCand")
    }

    if (which("d17wide")) {
      // the DENSITY regime the registered fixture (store = 250 docs)
      // never reaches: a 50/50 split puts half the corpus in the
      // store, and the 16-bit chunk keyspace saturates — candidates
      // are birthday collisions, not similarity. The wide dial's
      // 32-bit chunks hold the candidate set to the true matches.
      val cut = math.floor(mx * 0.5).toLong
      val b64 = Dedup.simhashStore(docs.filter(col("doc_id") >= cut),
        "doc_id", "text").localCheckpoint()
      val s64 = Dedup.simhashStore(docs.filter(col("doc_id") < cut),
        "doc_id", "text").localCheckpoint()
      val w64 = (1 to 2).map { _ =>
        val t0 = System.nanoTime
        Dedup.incrementalSimhash(b64, s64).collect()
        (System.nanoTime - t0) / 1e9
      }.min
      val bW = Dedup.simhashStoreWide(docs.filter(col("doc_id") >= cut),
        "doc_id", "text").localCheckpoint()
      val sW = Dedup.simhashStoreWide(docs.filter(col("doc_id") < cut),
        "doc_id", "text").localCheckpoint()
      val wW = (1 to 2).map { _ =>
        val t0 = System.nanoTime
        Dedup.incrementalSimhashWide(bW, sW).collect()
        (System.nanoTime - t0) / 1e9
      }.min
      def cand64: Long = {
        val ch = (j: Int, c: org.apache.spark.sql.Column) =>
          shiftrightunsigned(c, j * 16).bitwiseAND(lit(0xFFFFL))
        val bx = b64.select(col("doc_id").as("batch_id"),
          posexplode(array((0 until 4).map(j => ch(j, col("sig"))): _*))
            .as(Seq("chunk", "key")))
        val sx = s64.select(col("doc_id").as("store_id"),
          posexplode(array((0 until 4).map(j => ch(j, col("sig"))): _*))
            .as(Seq("chunk", "key")))
        bx.join(sx, Seq("chunk", "key"))
          .select("batch_id", "store_id").distinct().count()
      }
      def candWide: Long = {
        val keys = (s0: org.apache.spark.sql.Column,
                    s1: org.apache.spark.sql.Column) => array(
          s0.bitwiseAND(lit(0xFFFFFFFFL)), shiftrightunsigned(s0, 32),
          s1.bitwiseAND(lit(0xFFFFFFFFL)), shiftrightunsigned(s1, 32))
        val bx = bW.select(col("doc_id").as("batch_id"),
          posexplode(keys(col("sig0"), col("sig1")))
            .as(Seq("chunk", "key")))
        val sx = sW.select(col("doc_id").as("store_id"),
          posexplode(keys(col("sig0"), col("sig1")))
            .as(Seq("chunk", "key")))
        bx.join(sx, Seq("chunk", "key"))
          .select("batch_id", "store_id").distinct().count()
      }
      println(f"[dial] $dir d17wide (50/50 split, store=${s64.count()}): " +
        f"64-bit $w64%.2f s / ${cand64} candidates vs " +
        f"128-bit $wW%.2f s / ${candWide} candidates")
    }

    if (which("t34")) {
      val wall = (1 to 2).map { _ =>
        val t0 = System.nanoTime
        TextOps.incrementalNovelty(spark, dir).collect()
        (System.nanoTime - t0) / 1e9
      }.min
      println(f"[dial] $dir t34 total: $wall%.2f s min-of-2")
      val cut = math.floor(mx * TextOps.T34SplitFrac).toLong
      val store = timed(s"$dir t34 store fps build")(
        TextOps.noveltyStore(docs.filter(col("doc_id") < cut),
          "doc_id", "text").localCheckpoint())
      val batch = timed(s"$dir t34 batch fps build")(
        TextOps.trigramFps(docs.filter(col("doc_id") >= cut),
          "doc_id", "text").localCheckpoint())
      val nHit = timed(s"$dir t34 probe join")(
        batch.join(store, Seq("fp"), "left_semi").count())
      println(s"[dial] $dir t34: store_fps=${store.count()} batch_fps=${batch.count()} hits=$nHit")
    }
    spark.stop()
  }
}
