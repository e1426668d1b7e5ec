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
    * re-checks) bounded. Hyperplanes are seeded-deterministic,
    * generated once on the driver and inlined as plan literals — no
    * shuffle, no state; candidate generation becomes a band-key
    * equi-join, the 100 TB path (SURVEY §5).
    *
    * Returns array<struct<band:int, key:bigint>> to explode.
    */
  def signLshBands(v: Column, dim: Int, bands: Int, rowsPerBand: Int,
      seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    val bandCols = (0 until bands).map { b =>
      val bits = (0 until rowsPerBand).map { r =>
        val plane = array(Seq.fill(dim)(rnd.nextGaussian()).map(lit): _*)
        when(dot(v, plane) > 0.0, lit(1L << r)).otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(b).as("band"), bits.as("key"))
    }
    array(bandCols: _*)
  }
}
