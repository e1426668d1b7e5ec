package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** The bucketed COW table's contract: merge semantics identical to
  * VersionedTable (spec-pinned equal), merge cost proportional to
  * TOUCHED buckets (untouched generations carry forward by
  * reference, files byte-untouched), manifest-resolved time travel,
  * and reference-counted vacuum.
  */
class BucketedTableSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_btab_$tag").toString

  private def rowsOf(v: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    v.select(col("k"), col("ord"), col("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("merge semantics equal VersionedTable's on every version") {
    import spark.implicits._
    val bd = tmp("sem_b"); val vd = tmp("sem_v")
    val batches = Seq(
      Seq((1L, 10L, 1.0), (2L, 11L, 2.0), (60L, 12L, 3.0)),
      Seq((1L, 5L, 9.0), (3L, 20L, 3.0), (3L, 21L, 4.0)),
      Seq((60L, 30L, 7.0), (4L, 31L, 8.0)))
    batches.foreach { b =>
      val df = b.toDF("k", "ord", "x")
      BucketedTable.merge(spark, bd, df, keys = Seq("k"), orderCol = "ord")
      VersionedTable.merge(spark, vd, df, keys = Seq("k"), orderCol = "ord")
    }
    for (v <- 0L to 2L)
      assert(rowsOf(BucketedTable.asOf(spark, bd, v)) ==
        rowsOf(VersionedTable.asOf(spark, vd, v)), s"version $v")
  }

  test("merge rewrites only touched buckets; untouched files stay byte-identical") {
    import spark.implicits._
    val d = tmp("cow")
    // 64 keys spread over the 16 buckets.
    BucketedTable.merge(spark, d,
      (1L to 64L).map(k => (k, k, k.toDouble)).toDF("k", "ord", "x"),
      keys = Seq("k"), orderCol = "ord")
    val man0 = BucketedTable.manifest(d, 0L)
    assert(man0.nonEmpty && man0.values.forall(_.contains("/v0/")))
    def fileState(path: String): Seq[(String, Long, Long)] = {
      val f = new java.io.File(path)
      if (!f.isDirectory) Seq.empty
      else f.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(p => (p.getName, p.length(), p.lastModified())).sorted.toSeq
    }
    val before = man0.map { case (k, p) => k -> fileState(p) }
    // Update ONE key: exactly one bucket rewrites.
    BucketedTable.merge(spark, d,
      Seq((7L, 100L, 99.0)).toDF("k", "ord", "x"),
      keys = Seq("k"), orderCol = "ord")
    val man1 = BucketedTable.manifest(d, 1L)
    val fresh = man1.filter(_._2.contains("/v1/"))
    assert(fresh.size == 1, s"expected 1 rewritten bucket, got $fresh")
    val carried = man1.filter(_._2.contains("/v0/"))
    assert(carried.size == man0.size - 1)
    // Carried-forward generations are the SAME paths with the SAME
    // bytes on disk — copy-on-write by reference, not by copy.
    carried.foreach { case (k, p) =>
      assert(p == man0(k)); assert(fileState(p) == before(k))
    }
    // And the logical content is the point update applied.
    val got = rowsOf(BucketedTable.latest(spark, d))
    assert(got == ((1L to 64L).filter(_ != 7L)
      .map(k => (k, k, k.toDouble)).toSet + ((7L, 100L, 99.0))))
    // Time travel still reads v0's generation mix.
    assert(rowsOf(BucketedTable.asOf(spark, d, 0L))
      .contains((7L, 7L, 7.0)))
  }

  test("vacuum drops unreferenced generations only; expired asOf fails loudly") {
    import spark.implicits._
    val d = tmp("vac")
    BucketedTable.merge(spark, d,
      (1L to 64L).map(k => (k, k, k.toDouble)).toDF("k", "ord", "x"),
      keys = Seq("k"), orderCol = "ord")
    BucketedTable.merge(spark, d,
      Seq((7L, 100L, 99.0)).toDF("k", "ord", "x"),
      keys = Seq("k"), orderCol = "ord")
    val keep = rowsOf(BucketedTable.latest(spark, d))
    intercept[IllegalArgumentException](BucketedTable.vacuum(d, keepLast = 0))
    assert(BucketedTable.vacuum(d, keepLast = 1) == Seq(0L))
    val e = intercept[IllegalArgumentException](
      BucketedTable.asOf(spark, d, 0L))
    assert(e.getMessage.contains("expired by vacuum"))
    // v1's manifest still references v0 generations for the 15
    // untouched buckets — those MUST survive the vacuum; only the
    // v0 generation of the rewritten bucket is unreferenced.
    assert(rowsOf(BucketedTable.latest(spark, d)) == keep)
    val man1 = BucketedTable.manifest(d, 1L)
    man1.values.foreach(p =>
      assert(new java.io.File(p).isDirectory, s"referenced $p deleted"))
    val v0dirs = new java.io.File(s"$d/data/v0").listFiles()
      .filter(_.getName.startsWith("__b=")).map(_.getName).toSet
    assert(v0dirs == man1.values.filter(_.contains("/v0/"))
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet,
      "exactly the unreferenced v0 generation should be gone")
  }

  test("vacuum keeps referenced generations on a checksum-less layout") {
    import spark.implicits._
    val d = tmp("vac_nocrc")
    BucketedTable.merge(spark, d,
      (1L to 64L).map(k => (k, k, k.toDouble)).toDF("k", "ord", "x"),
      keys = Seq("k"), orderCol = "ord")
    BucketedTable.merge(spark, d,
      Seq((7L, 100L, 99.0)).toDF("k", "ord", "x"),
      keys = Seq("k"), orderCol = "ord")
    val keep = rowsOf(BucketedTable.latest(spark, d))
    // Simulate a checksum-less filesystem/committer: strip every
    // Hadoop local-FS marker (.crc, _SUCCESS) so only __b=<k> bucket
    // generations and parquet data remain. The old version-dir sweep
    // ("all children start with _") only ever survived because the
    // .crc files failed its forall — without them it recursively
    // deleted v0 with its still-referenced generations inside.
    def stripMarkers(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(stripMarkers)
      else if (f.getName.endsWith(".crc") || f.getName == "_SUCCESS")
        f.delete(): Unit
    }
    stripMarkers(new java.io.File(s"$d/data"))
    BucketedTable.vacuum(d, keepLast = 1)
    val man1 = BucketedTable.manifest(d, 1L)
    man1.values.foreach(p =>
      assert(new java.io.File(p).isDirectory, s"referenced $p deleted"))
    assert(rowsOf(BucketedTable.latest(spark, d)) == keep)
  }

  test("row-level merge: answers equal the bucket-rewrite path on every version") {
    import spark.implicits._
    val bd = tmp("dv_b"); val rd = tmp("dv_r")
    val batches = Seq(
      Seq((1L, 10L, 1.0), (2L, 11L, 2.0), (60L, 12L, 3.0)),
      Seq((1L, 5L, 9.0), (3L, 20L, 3.0), (3L, 21L, 4.0)),
      Seq((60L, 30L, 7.0), (4L, 31L, 8.0)))
    batches.foreach { b =>
      val df = b.toDF("k", "ord", "x")
      BucketedTable.merge(spark, bd, df, keys = Seq("k"), orderCol = "ord")
      BucketedTable.mergeRowLevel(spark, rd, df, keys = Seq("k"), orderCol = "ord")
    }
    for (v <- 0L to 2L)
      assert(rowsOf(BucketedTable.asOf(spark, rd, v)) ==
        rowsOf(BucketedTable.asOf(spark, bd, v)), s"version $v")
    // and the cross-version updates-win check explicitly: key 1's
    // batch-1 row (ord 5 < ord 10) still supersedes batch 0's.
    assert(rowsOf(BucketedTable.latest(spark, rd)).contains((1L, 5L, 9.0)))
  }

  test("row-level merge commits O(batch) bytes: bases stay byte-untouched") {
    import spark.implicits._
    val d = tmp("dv_cost")
    BucketedTable.merge(spark, d,
      (1L to 64L).map(k => (k, k, k.toDouble)).toDF("k", "ord", "x"),
      keys = Seq("k"), orderCol = "ord")
    val man0 = BucketedTable.manifest(d, 0L)
    def fileState(path: String): Seq[(String, Long, Long)] = {
      val f = new java.io.File(path)
      if (!f.isDirectory) Seq.empty
      else f.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(p => (p.getName, p.length(), p.lastModified())).sorted.toSeq
    }
    val before = man0.map { case (k, p) => k -> fileState(p) }
    BucketedTable.mergeRowLevel(spark, d,
      Seq((7L, 100L, 99.0)).toDF("k", "ord", "x"),
      keys = Seq("k"), orderCol = "ord")
    // EVERY base generation carries forward by reference — the commit
    // wrote only the one-row delta (vs merge(), which rewrites the
    // touched bucket wholesale).
    val man1 = BucketedTable.manifest(d, 1L)
    assert(man1 == man0, "row-level merge must not move any base path")
    man0.foreach { case (k, p) => assert(fileState(p) == before(k)) }
    val deltaRows = spark.read.parquet(s"$d/data/v1/__delta").count()
    assert(deltaRows == 1L, s"delta generation should hold only the batch")
    // read resolution: point update applied, history intact
    assert(rowsOf(BucketedTable.latest(spark, d))
      == ((1L to 64L).filter(_ != 7L)
        .map(k => (k, k, k.toDouble)).toSet + ((7L, 100L, 99.0))))
    assert(rowsOf(BucketedTable.asOf(spark, d, 0L)).contains((7L, 7L, 7.0)))
  }

  test("bucket rewrite compacts the delta chain; vacuum keeps live deltas") {
    import spark.implicits._
    val d = tmp("dv_compact")
    BucketedTable.merge(spark, d,
      (1L to 64L).map(k => (k, k, k.toDouble)).toDF("k", "ord", "x"),
      keys = Seq("k"), orderCol = "ord")
    BucketedTable.mergeRowLevel(spark, d,
      Seq((7L, 100L, 99.0)).toDF("k", "ord", "x"),
      keys = Seq("k"), orderCol = "ord")
    BucketedTable.mergeRowLevel(spark, d,
      Seq((9L, 101L, 77.0)).toDF("k", "ord", "x"),
      keys = Seq("k"), orderCol = "ord")
    val keep = rowsOf(BucketedTable.latest(spark, d))
    // vacuum to the live manifest only: v0 bases referenced by v2's
    // manifest AND both delta generations must all survive.
    BucketedTable.vacuum(d, keepLast = 1)
    assert(rowsOf(BucketedTable.latest(spark, d)) == keep,
      "vacuum must keep bases and live delta generations")
    // a bucket rewrite folds the chains it touches: update key 7
    // through the rewrite path and its bucket's chain resets.
    BucketedTable.merge(spark, d,
      Seq((7L, 200L, 55.0)).toDF("k", "ord", "x"),
      keys = Seq("k"), orderCol = "ord")
    val manF = BucketedTable.manifestFull(d, 3L)
    val b7 = manF.buckets.values.filter(_._1.contains("/v3/"))
    assert(b7.size == 1 && b7.head._2.isEmpty,
      s"rewritten bucket must carry no delta chain: $b7")
    assert(rowsOf(BucketedTable.latest(spark, d))
      == (keep - ((7L, 100L, 99.0)) + ((7L, 200L, 55.0))))
  }

  test("over-long chains compact inline at MaxDeltaChain") {
    import spark.implicits._
    val d = tmp("dv_chain")
    // All updates hit ONE key → one bucket's chain grows each commit.
    BucketedTable.mergeRowLevel(spark, d,
      Seq((1L, 0L, 0.0)).toDF("k", "ord", "x"),
      keys = Seq("k"), orderCol = "ord")
    for (i <- 1 to BucketedTable.MaxDeltaChain + 2)
      BucketedTable.mergeRowLevel(spark, d,
        Seq((1L, i.toLong, i.toDouble)).toDF("k", "ord", "x"),
        keys = Seq("k"), orderCol = "ord")
    val vs = BucketedTable.versions(d)
    val chains = vs.map(v => BucketedTable.manifestFull(d, v)
      .buckets.values.map(_._2.size).max)
    assert(chains.max <= BucketedTable.MaxDeltaChain,
      s"chain lengths per version: $chains")
    assert(chains.exists(_ > 0), "chains should stack before compaction")
    val n = (BucketedTable.MaxDeltaChain + 2).toLong
    assert(rowsOf(BucketedTable.latest(spark, d)) == Set((1L, n, n.toDouble)))
  }

  test("empty-updates merge is a no-op, not a duplicate commit") {
    import spark.implicits._
    val d = tmp("noop")
    val v0 = BucketedTable.merge(spark, d,
      Seq((1L, 10L, 1.0), (2L, 11L, 2.0)).toDF("k", "ord", "x"),
      keys = Seq("k"), orderCol = "ord")
    val before = rowsOf(BucketedTable.latest(spark, d))
    val got = BucketedTable.merge(spark, d,
      Seq.empty[(Long, Long, Double)].toDF("k", "ord", "x"),
      keys = Seq("k"), orderCol = "ord")
    assert(got == v0, "empty merge must return the existing version")
    assert(BucketedTable.versions(d) == Seq(0L),
      "empty merge must not inflate version history")
    assert(rowsOf(BucketedTable.latest(spark, d)) == before)
  }
}
