package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding math composed from codegen'd builtins (`zip_with` +
  * `aggregate`): no UDF deserialization per row, stays inside
  * WholeStageCodegen.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double precision (cast first — float accumulation
    * drifts and would break oracle comparison). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision — native [[CosineSim]]
    * Catalyst expression (single loop per pair; the builtin
    * `zip_with`+`aggregate` composition pays interpreted-lambda cost
    * per element, which dominates bucket-join hot paths). */
  def cosine(a: Column, b: Column): Column = CatalystText.cosine_sim(a, b)

  /** Exact-integer squared L2 on the e16 quantization grid — the
    * bit-stable distance every Euclidean audit shares (native
    * [[CatalystText.QuantSqDist]] tight loop). */
  def quantSqDist(a: Column, b: Column): Column =
    CatalystText.quant_sq_dist(a, b)

  /** Raw ⟨a,b⟩ — native [[InnerProduct]] expression (the MIPS
    * scoring primitive; same accumulation as [[cosine]]'s dot). */
  def innerProduct(a: Column, b: Column): Column =
    CatalystText.inner_product(a, b)

  /** Banded sign-LSH keys (OR-of-ANDs): `bands` independent buckets,
    * each keyed by `rowsPerBand` random-hyperplane sign bits. Two
    * vectors are candidates when ANY band key matches — small bands
    * give high recall, multiple bands keep collisions (and so exact
    * re-checks) bounded. Hyperplanes are generated once on the driver
    * and inlined as plan literals — no shuffle, no state; candidate
    * generation becomes a band-key equi-join, the 100 TB path
    * (SURVEY §5).
    *
    * Hyperplane family (round 19 — the d_embed_dup determinization):
    * Rademacher (±1) components derived from the md5 bridge
    * ([[planeSigns]]) instead of seeded Gaussians. Sign-LSH needs
    * only a symmetric zero-mean projection (±1 entries are the
    * standard SimHash-for-cosine construction; collision probability
    * 1 − θ/π holds as for Gaussians), and ±1·float terms are EXACT
    * doubles, so the fold here and DuckDB's sequential
    * `list_dot_product` against the same literal plane produce
    * bit-identical sums — the sign, and with it every band key, is
    * oracle-stateable. scala.util.Random Gaussians exist in no SQL
    * engine.
    *
    * Returns array<struct<band:int, key:bigint>> to explode.
    *
    * Native [[CatalystText.sign_lsh_keys]] single-pass expression
    * since round 19: the `zip_with`+`aggregate` plane-dot composition
    * pays bands·rows interpreted lambda folds per vector, which
    * DOMINATED the at-scale kNN build once the sized banding reached
    * 16×13 (625 s at 262k vectors, banding alone). Each native term
    * adds ±x_d in the same order the fold did — keys bit-identical
    * (spec-pinned vs [[signLshBandsHof]]). */
  def signLshBands(v: Column, dim: Int, bands: Int, rowsPerBand: Int): Column =
    CatalystText.sign_lsh_keys(v, dim, bands, rowsPerBand)

  /** The interpreted HOF composition [[signLshBands]] replaced — kept
    * as the parity reference for the equality spec (the
    * wordShinglesHof convention). */
  private[graft] def signLshBandsHof(v: Column, dim: Int, bands: Int,
      rowsPerBand: Int): Column = {
    val bandCols = (0 until bands).map { b =>
      val bits = (0 until rowsPerBand).map { r =>
        val plane = array(planeSigns(b, r, dim).map(lit): _*)
        when(dot(v, plane) > 0.0, lit(1L << r)).otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(b).as("band"), bits.cast("long").as("key"))
    }
    array(bandCols: _*)
  }

  /** Component d of sign-LSH hyperplane (band, row): +1.0 when bit 0
    * of the 60-bit md5 bridge of "lsh:band:row:d" is set, else −1.0 —
    * the same oracle-stateable derivation as the MinHash seeds
    * (DuckDB: `('0x' || substr(md5('lsh:' || b || ':' || r || ':' ||
    * d), 1, 15))::BIGINT & 1`). Shared by the plan literals above and
    * the d_embed_dup oracle's inlined plane literals. */
  def planeSigns(band: Int, row: Int, dim: Int): Seq[Double] =
    (0 until dim).map { d =>
      if ((MinHashSig.bridge60(s"lsh:$band:$row:$d") & 1L) == 1L) 1.0
      else -1.0
    }
}
