package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("resize shrinks payloads by the stride factor and is deterministic") {
    val a = Multimodal.resize(spark, sf, 8).collect().sortBy(_.doc_id)
    a.foreach { r =>
      assert(r.thumb_bytes == (r.orig_bytes + 7) / 8,
        s"doc ${r.doc_id}: ${r.orig_bytes} -> ${r.thumb_bytes}")
    }
    val b = Multimodal.resize(spark, sf, 8).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
  }

  test("byte-payload near-dup finds planted corruption, skips distinct payloads") {
    import spark.implicits._
    // Deterministic pseudo-random payloads: A, a 5-byte corruption of
    // A (a near-dup a whole-payload hash cannot see), an identical
    // copy of A, and an unrelated payload.
    def payload(seed: Long, len: Int): Array[Byte] = {
      var x = seed
      Array.fill(len) {
        x = x * 6364136223846793005L + 1442695040888963407L
        (x >>> 33).toByte
      }
    }
    val a = payload(1L, 2000)
    val corrupted = a.clone()
    (500 until 505).foreach(i => corrupted(i) = (corrupted(i) ^ 0x5a).toByte)
    val rows = Seq((1L, a), (2L, corrupted), (3L, a.clone()),
      (4L, payload(99L, 2000)))
    val pairs = Multimodal.nearDupPairsOf(rows.toDF("doc_id", "payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong)).toSet
    // identical copy: Hamming 0; corruption: small but nonzero.
    assert(pairs.exists(p => p._1 == 1L && p._2 == 3L && p._3 == 0L), s"$pairs")
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 > 0L), s"$pairs")
    assert(pairs.exists(p => p._1 == 2L && p._2 == 3L), s"$pairs")
    // the unrelated payload pairs with nobody
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), s"$pairs")
  }

  test("payload simhash: identical bytes hash equal, window locality holds") {
    // High-entropy payload (an LCG stream — a patterned payload's
    // repeating windows give vote margins no single byte can move):
    // flipping one byte perturbs only the 8 windows covering it, a
    // ±16 vote swing against ~√1000 margins — the fingerprint moves
    // a few bits (4 for this payload, deterministic), far from the
    // ~32 of an unrelated payload.
    var x = 7L
    val p = Array.fill(1000) {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 33).toByte
    }
    assert(Multimodal.payloadSimhash(p) == Multimodal.payloadSimhash(p.clone()))
    val q = p.clone(); q(400) = (q(400) ^ 0x7f).toByte
    val d = java.lang.Long.bitCount(
      Multimodal.payloadSimhash(p) ^ Multimodal.payloadSimhash(q))
    assert(d == 4L, s"single-byte corruption moved $d bits")
  }

  test("native payload_simhash64 expression equals the reference implementation") {
    import spark.implicits._
    // The hot path is the native expression; the plain-Scala
    // payloadSimhash stays as the independent reference. Equality
    // over: empty, shorter-than-window, exactly-one-window, and
    // multi-window payloads.
    var x = 3L
    def lcg(len: Int): Array[Byte] = Array.fill(len) {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 33).toByte
    }
    val payloads = Seq(Array.emptyByteArray, lcg(3), lcg(8), lcg(9), lcg(2000))
    val viaExpr = payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("doc_id", "payload")
      .select(col("doc_id"),
        graft.functions.CatalystText.payload_simhash64(col("payload")).as("fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).map(_._2)
    val viaRef = payloads.map(Multimodal.payloadSimhash(_))
    assert(viaExpr.toSeq == viaRef, s"expr $viaExpr vs reference $viaRef")
  }

  test("feature extraction yields sane byte statistics") {
    val feats = Multimodal.extractFeatures(spark, sf).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.mean_byte > 0 && f.mean_byte < 255)
      assert(f.distinct_bytes > 0 && f.distinct_bytes <= 256)
      // entropy of text bytes: 0 < H <= log2(256) = 8
      assert(f.entropy_e4 > 0 && f.entropy_e4 <= 80000)
    }
  }

  test("VAD segments match a driver-side islands recomputation") {
    import org.apache.spark.sql.functions.col
    val thr = 600000000000000000L
    val frames = Multimodal.frameSampleDf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        java.lang.Long.parseLong(r.getString(2).take(15), 16)))
      .groupBy(_._1)
    val expect = frames.map { case (docId, fs) =>
      val actives = fs.sortBy(_._2).map(_._3 > thr)
      val runs = actives.foldLeft(List.empty[Int]) {
        case (acc, true) if acc.nonEmpty && acc.head > 0 => (acc.head + 1) :: acc.tail
        case (acc, true) => 1 :: acc
        case (acc, false) => 0 :: acc
      }.filter(_ > 0)
      docId -> ((fs.length.toLong, actives.count(identity).toLong,
        runs.length.toLong, if (runs.isEmpty) 0L else runs.max.toLong))
    }
    val got = Multimodal.vadSegments(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect, "vad segments diverge from the reference islands")
  }
}
