package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Compact custom Catalyst expressions for the two fingerprints that
  * builtins can't express cleanly (64-bit bit-vote and rolling
  * polynomial hashes). Both are deterministic, null-intolerant and
  * driver-free; CodegenFallback keeps them correct inside codegen'd
  * plans (they sit at the tail of projections, not in join/agg hot
  * paths).
  */
object Fnv {
  final val Offset = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L

  /** FNV-1a 64-bit over UTF-8 bytes. */
  def hash(bytes: Array[Byte]): Long = hash(bytes, 0, bytes.length)

  /** FNV-1a 64-bit over bytes(off until off+len) — the windowed form,
    * so sliding-window callers hash in place instead of allocating a
    * copy per window. */
  def hash(bytes: Array[Byte], off: Int, len: Int): Long = {
    var h = Offset
    var i = off
    val end = off + len
    while (i < end) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }
}

/** 64-bit SimHash over an array<string> of tokens: each token's hash
  * votes ±1 per bit; the sign of each bit-sum forms the fingerprint.
  * Near-duplicate documents land within small Hamming distance.
  *
  * Hash family (round 19 — the d_simhash determinization, extending
  * the round-18 md5-bridge family): the per-token 64-bit base is the
  * first 16 hex chars of md5, which DuckDB states exactly as two
  * 32-bit BIGINT halves (`('0x' || substr(md5(w), 1, 8))::BIGINT` and
  * chars 9-16) — bit b < 32 reads from the low half, b ≥ 32 from the
  * high, and the signed fingerprint reassembles as
  * Σ_{b<63} bit_b·2^b − bit_63·2^63 in HUGEINT cast back to BIGINT.
  * The previous FNV-1a base was not SQL-stateable (wrap-around 64-bit
  * multiplies); this one puts d_simhash AND the banded
  * d_simhash_pairs under the full DuckDB hash compare. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = MinHashSig.bridge64Bytes(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
}

/** Rabin–Karp rolling polynomial fingerprint of a string:
  * h = Σ codepoint_i · B^i mod 2^61−1 — an order-sensitive 64-bit
  * document fingerprint (unlike bag-of-words hashes).
  *
  * Round 19 (the t_fingerprint determinization): the polynomial runs
  * over UNICODE CODE POINTS in ASCENDING power order. Code points are
  * what both engines' character functions agree on (DuckDB
  * `unicode(c)` ≡ this loop's decoded code point; raw UTF-8 bytes are
  * not reachable from DuckDB SQL), and ascending powers make every
  * position's term independent of the string length, so the DuckDB
  * oracle states the SAME sum as Σ over an unnested character table
  * joined to a recursive B^i-mod-P powers CTE — order-free addition
  * of exact residues, no fold. Semantically unchanged as a
  * fingerprint: position-weighted, order-sensitive, collision-bounded
  * by the Mersenne prime. */
case class RollingHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private final val Mod = (1L << 61) - 1
  private final val Base = 257L
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var h = 0L
    var pw = 1L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      // term = cp · B^i mod P ; cp < 2^21 and pw < 2^61 → mulmodP.
      h += MinHashSig.mulmodP(cp.toLong, pw)
      if (h >= Mod) h -= Mod
      pw = MinHashSig.mulmodP(pw, Base)
      i += Character.charCount(cp)
    }
    java.lang.Long.valueOf(h)
  }
  override protected def withNewChildInternal(c: Expression): RollingHash64 = copy(c)
}

/** All sign-LSH band keys of one embedding in a single native pass
  * (round 19 — found by the at-scale ANN artifact: at the sized
  * 16-band × 13-bit depth the `zip_with`+`aggregate` hyperplane dot
  * composition pays 208 interpreted lambda folds of 64 elements PER
  * VECTOR, and banding alone dominated the 262k-vector kNN build at
  * 625 s). Planes are the md5-derived ±1 components of
  * [[graft.functions.VectorFunctions.planeSigns]], derived here from
  * the same bridge (no RNG, no constructor arrays — the expression
  * stays a value class over (dim, bands, rows)); each term adds
  * ±x_d in double exactly as the HOF fold did, so keys — and the
  * d_embed_dup oracle riding them — are bit-identical.
  * Returns array<struct<band:int, key:bigint>>. */
case class SignLshKeys(child: Expression, dim: Int, bands: Int, rows: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, StructField, StructType}
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("band", IntegerType, nullable = false),
      StructField("key", LongType, nullable = false))), containsNull = false)
  // signs(b*rows + r)(d) — +1 ⇔ bit 0 of bridge60("lsh:b:r:d").
  @transient private lazy val signs: Array[Array[Boolean]] =
    Array.tabulate(bands * rows) { p =>
      val b = p / rows; val r = p % rows
      Array.tabulate(dim)(d =>
        (MinHashSig.bridge60(s"lsh:$b:$r:$d") & 1L) == 1L)
    }
  @transient private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def nullSafeEval(input: Any): Any =
    SignLshKeys.compute(input.asInstanceOf[ArrayData], signs, dim, bands,
      rows, elemIsFloat)
  // Round 20 (VERDICT r19 item 3/"What's wrong" 3, guide §4): a real
  // doGenCode so the banding Project stays INSIDE WholeStageCodegen
  // instead of dropping the whole stage to interpreted mode
  // (CodegenFallback marks the plan unsupported for WSCG). The
  // generated code calls the SAME static loop nullSafeEval uses —
  // keys bit-identical by construction (the parity spec vs the HOF
  // composition still pins the fold order).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("lshSigns", signs, "boolean[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SignLshKeys$$.MODULE$$.compute($c, " +
        s"$signsRef, $dim, $bands, $rows, $elemIsFloat);")
  }
  override protected def withNewChildInternal(c: Expression): SignLshKeys =
    copy(child = c)
}

object SignLshKeys {
  /** The banding loop shared by interpreted eval and generated code —
    * one pass over the vector per (band, row) plane, ±x_d terms in
    * ascending dimension order (the HOF fold order the parity spec
    * pins). */
  def compute(a: ArrayData, signs: Array[Array[Boolean]], dim: Int,
      bands: Int, rows: Int, elemIsFloat: Boolean)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = math.min(a.numElements(), dim)
    val out = new Array[AnyRef](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var r = 0
      while (r < rows) {
        val s = signs(b * rows + r)
        var dot = 0.0
        var d = 0
        while (d < n) {
          val x = if (elemIsFloat) a.getFloat(d).toDouble else a.getDouble(d)
          dot += (if (s(d)) x else -x)
          d += 1
        }
        if (dot > 0.0) key |= (1L << r)
        r += 1
      }
      out(b) = org.apache.spark.sql.catalyst.InternalRow(b, key)
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** The 60-bit md5-prefix bridge as a first-class scalar — the exact
  * value of DuckDB's `('0x' || substr(md5(s), 1, 15))::BIGINT` (see
  * [[MinHashSig.bridge60Bytes]]). Round 19: replaces xxhash64 as the
  * winnowing k-gram hash so d_winnow's fingerprint selection is
  * oracle-stateable. */
case class Bridge60(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      MinHashSig.bridge60Bytes(input.asInstanceOf[UTF8String].getBytes))
  override protected def withNewChildInternal(c: Expression): Bridge60 = copy(c)
}

/** Word n-gram shingles in one native pass over the token array:
  * ["a","b","c","d"], n=3 → ["a b c", "b c d"]; fewer than n tokens
  * yield ONE shingle of the whole array. Replaces the
  * `transform(sequence(...), i -> concat_ws(" ", slice(t, i+1, n)))`
  * builtin composition, whose interpreted lambda costs a closure
  * call per shingle per document — on the corpus-wide n-gram
  * queries (crossdoc df, containment, decontamination, MinHash
  * shingling) that interpreted loop IS the scan cost. Null elements
  * are skipped exactly as `concat_ws` skips them. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"word_shingles: n must be >= 1, got $n")
  import org.apache.spark.sql.types.{ArrayType, StringType}
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val size = arr.numElements()
    val count = math.max(size - n, 0) + 1
    val out = new Array[AnyRef](count)
    var i = 0
    while (i < count) {
      val upper = math.min(i + n, size)
      var m = 0
      var j = i
      val parts = new Array[UTF8String](upper - i)
      while (j < upper) {
        if (!arr.isNullAt(j)) { parts(m) = arr.getUTF8String(j); m += 1 }
        j += 1
      }
      out(i) = UTF8String.concatWs(UTF8String.fromString(" "),
        java.util.Arrays.copyOf(parts, m): _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

/** MinHash signature in one native pass: k minimums over per-element
  * seeded hashes of an array<string>. Replaces the
  * `transform(sequence(1,k), seed -> aggregate(...))` builtin
  * composition, whose interpreted lambda evaluation costs
  * O(k·|shingles|) closure calls per row — the native loop is ~100×
  * faster at identical semantics and keeps near-dup candidate
  * generation cheap at 100 TB.
  *
  * Hash family (round 18 — the d_minhash_pairs determinization):
  * ORACLE-STATEABLE end to end. The per-shingle base is the 60-bit
  * md5 prefix (the validated `('0x' || substr(md5(s),1,15))::BIGINT`
  * bridge both engines share), and seed j's permutation is
  * Carter-Wegman h_j(x) = (a_j·x + b_j) mod P over the Mersenne
  * prime P = 2^61−1, with a_j/b_j themselves md5-derived constants
  * (no RNG state). DuckDB states the multiply exactly in HUGEINT
  * (a_j·x + b_j < 2^122 < 2^127) and this loop states it in 64-bit
  * via `multiplyHigh` + the 2^64 ≡ 2^3 (mod P) fold — bit-identical
  * values, so the banded pairs AND the e4 Jaccard estimates sit
  * under the DuckDB hash compare. The previous FNV+xorshift family
  * needed wrap-around 64-bit multiplies no SQL engine states. */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.types.ArrayType
  import MinHashSig.{mulmodP, P}
  private lazy val as: Array[Long] =
    Array.tabulate(k)(j => MinHashSig.bridge60(s"mh:a:$j") % (P - 1) + 1)
  private lazy val bs: Array[Long] =
    Array.tabulate(k)(j => MinHashSig.bridge60(s"mh:b:$j") % P)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val base = MinHashSig.bridge60Bytes(arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < k) {
          var h = mulmodP(as(j), base) + bs(j)
          if (h >= P) h -= P
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

object MinHashSig {
  /** Mersenne prime 2^61 − 1: a modulus whose products fit HUGEINT
    * on the DuckDB side and reduce in 64-bit here. */
  val P: Long = (1L << 61) - 1

  // One MessageDigest per thread: DigestUtils.md5 calls
  // MessageDigest.getInstance per invocation (provider lookup +
  // allocation), which at one md5 PER SHINGLE is a measurable slice
  // of the corpus hash pass; digest() leaves the instance reset.
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5 as a 60-bit non-negative Long — the
    * exact value of DuckDB's `('0x' || substr(md5(s),1,15))::BIGINT`
    * (the first 8 digest bytes big-endian, unsigned-shifted by the
    * one nibble the 15-char prefix drops). */
  def bridge60Bytes(bytes: Array[Byte]): Long = {
    val d = mdLocal.get().digest(bytes)
    var l = 0L
    var i = 0
    while (i < 8) { l = (l << 8) | (d(i) & 0xffL); i += 1 }
    l >>> 4
  }

  def bridge60(s: String): Long =
    bridge60Bytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** First 16 hex chars of md5 as the raw signed 64-bit value (the
    * first 8 digest bytes big-endian). DuckDB states it as two 32-bit
    * halves — `('0x' || substr(md5(s), 1, 8))::BIGINT` (bits 63-32)
    * and chars 9-16 (bits 31-0) — since the full 16-char parse can
    * overflow a signed BIGINT. Bit b here ≡ bit b of hi·2^32 + lo
    * there. */
  def bridge64Bytes(bytes: Array[Byte]): Long = {
    val d = mdLocal.get().digest(bytes)
    var l = 0L
    var i = 0
    while (i < 8) { l = (l << 8) | (d(i) & 0xffL); i += 1 }
    l
  }


  /** (a·b) mod P for a, b ∈ [0, P): 128-bit product via multiplyHigh,
    * folded with 2^64 ≡ 2^3 and 2^61 ≡ 1 (mod P). hi < 2^58 so hi·8
    * is exact; each fold term < 2^61, the sum < 2^63 — no overflow. */
  def mulmodP(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    var r = hi * 8 + (lo >>> 61) + (lo & P)
    while (r >= P) r -= P
    r
  }
}

/** Cosine similarity of two numeric arrays in one native loop
  * (double accumulation; float elements promote exactly, matching
  * the `zip_with`/`aggregate` composition and the DuckDB oracle
  * bit-for-bit). Used on the bucket-join hot path where interpreted
  * lambda evaluation would dominate — so unlike the per-document
  * fingerprint expressions (which ride CodegenFallback at the tail
  * of projections), this one implements doGenCode: the loop compiles
  * into the enclosing WholeStageCodegen stage instead of paying an
  * interpreted eval call + boxing per candidate pair. */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  // Analysis-time type check: a bad column type fails when the plan
  // resolves, not per-row at execution.
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float|double> inputs, got ${l.catalogString} / ${r.catalogString}")
  }
  override def nullable: Boolean = true
  // Strict: paths that bypass the analyzer (direct construction,
  // optimizer rules) must fail loudly, not reinterpret int bytes as
  // doubles via getDouble.
  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"cosine_sim requires array<float|double>, got ${other.catalogString}")
  }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val af = elemIsFloat(left); val bf = elemIsFloat(right)
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      // A null element poisons the sum in the zip_with/aggregate
      // composition this replaces → whole result null, same here.
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val anyNull = ctx.freshName("anyNull")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val getX = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
         |  final double $x = $getX;
         |  final double $y = $getY;
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |if ($anyNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** Raw inner product ⟨a,b⟩ — [[CosineSim]] without the normalization
  * (the MIPS scoring primitive; on non-unit vectors the two RANK
  * differently, which is the whole point of e_mips). Identical
  * accumulation order and float→double widening as CosineSim and as
  * DuckDB's `list_dot_product` over DOUBLE[] casts, so e4-rounded
  * scores hash-match across engines. */
case class InnerProduct(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"inner_product requires array<float|double> inputs, got ${l.catalogString} / ${r.catalogString}")
  }
  override def nullable: Boolean = true
  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"inner_product requires array<float|double>, got ${other.catalogString}")
  }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val af = elemIsFloat(left); val bf = elemIsFloat(right)
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      i += 1
    }
    java.lang.Double.valueOf(dot)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val anyNull = ctx.freshName("anyNull")
      val getX = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
         |  $dot += ($getX) * ($getY);
         |}
         |if ($anyNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): InnerProduct =
    copy(left = l, right = r)
}

/** Exact-integer squared Euclidean distance on the e16 quantization
  * grid (round 14): Σ (⌊a·65536+0.5⌋ − ⌊b·65536+0.5⌋)² as a BIGINT —
  * the [[CosineSim]] tight-loop shape applied to the repo's
  * bit-stable distance convention (e_outliers/e_kcenter quantize the
  * same way), so pairwise distances are reduction-order-free and the
  * oracle can state the identical value through the polarization
  * identity |qa|² + |qb|² − 2⟨qa,qb⟩ over exact-in-double quantized
  * ints. 64 dims × (2¹⁷)² keeps the sum far inside Long range. */
case class QuantSqDist(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType}
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"quant_sq_dist requires array<float|double> inputs, got ${l.catalogString} / ${r.catalogString}")
  }
  override def nullable: Boolean = true
  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"quant_sq_dist requires array<float|double>, got ${other.catalogString}")
  }
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val af = elemIsFloat(left); val bf = elemIsFloat(right)
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bf) b.getFloat(i).toDouble else b.getDouble(i)
      val d = math.floor(x * 65536d + 0.5d).toLong - math.floor(y * 65536d + 0.5d).toLong
      s += d * d
      i += 1
    }
    java.lang.Long.valueOf(s)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val anyNull = ctx.freshName("anyNull")
      val getX = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
         |  final long $d = (long) java.lang.Math.floor(($getX) * 65536.0 + 0.5)
         |    - (long) java.lang.Math.floor(($getY) * 65536.0 + 0.5);
         |  $s += $d * $d;
         |}
         |if ($anyNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantSqDist =
    copy(left = l, right = r)
}

/** One-deletion neighborhood of a string in one native pass:
  * "abc" → ["abc", "bc", "ac", "ab"] — the FastSS blocking key set
  * for edit-distance-1 joins (two strings within distance 1 share a
  * member). Replaces the `concat(array(s), transform(sequence(1,
  * length(s)), i -> concat(substring(...), substring(...))))`
  * builtin composition whose interpreted lambda costs a closure call
  * plus two substring evaluations per position per row — fine on a
  * dim table, a scan-dominating cost if the fuzzy join is pointed at
  * the corpus side. Character-based (code points), matching Spark's
  * `substring`/`length` semantics exactly. */
case class DeletionVariants(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.types.{ArrayType, StringType}
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numChars()
    val out = new Array[AnyRef](n + 1)
    out(0) = s
    var i = 0
    while (i < n) {
      out(i + 1) = UTF8String.concat(s.substring(0, i), s.substring(i + 1, n))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): DeletionVariants = copy(c)
}

/** Unit-normalize a numeric array (L2) in one native loop — the
  * `transform(x, e -> e / sqrt(aggregate(...)))` builtin composition
  * evaluates an interpreted closure per element, which dominates when
  * normalization feeds a multi-pass consumer like k-means. Division
  * by a zero norm follows IEEE semantics (NaN), matching the builtin
  * composition it replaces. */
case class L2Normalize(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  // Analysis-time type check: a bad column type fails when the plan
  // resolves, not per-row at execution.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"l2_normalize requires array<float|double> input, got ${other.catalogString}")
  }
  override def nullable: Boolean = true
  // Strict for analyzer-bypassing paths, like CosineSim.
  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"l2_normalize requires array<float|double>, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val af = elemIsFloat
    val n = a.numElements()
    val out = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) {
      // A null element nulls the aggregate norm in the transform/
      // aggregate composition this replaces, nulling every output
      // element — collapse that to a null result rather than reading
      // undefined values out of the null slot.
      if (a.isNullAt(i)) return null
      val x = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = x
      ss += x * x
      i += 1
    }
    val norm = math.sqrt(ss)
    i = 0
    while (i < n) { out(i) /= norm; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): L2Normalize = copy(c)
}

/** 64-bit byte-level SimHash over a BINARY payload: every sliding
  * `n`-byte window votes ±1 per bit via its FNV-1a hash — the byte
  * analogue of the token [[SimHash64]], content-aware where a
  * whole-payload hash is all-or-nothing. A payload shorter than one
  * window votes once on its entirety. Windows hash IN PLACE via the
  * offset/length FNV form: the typed-mapPartitions version this
  * replaces paid a per-window 8-byte copy AND an encoder round-trip
  * of every payload, breaking whole-stage codegen on the one scan
  * that touches all payload bytes. */
case class PayloadSimHash64(child: Expression, n: Int = 8)
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.BinaryType
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"payload_simhash64 requires binary input, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any = {
    val payload = input.asInstanceOf[Array[Byte]]
    val votes = new Array[Int](64)
    // Round-19 adjudication: this stays windowed FNV-1a, NOT the md5
    // bridge. The conversion was attempted (hash the uppercase-hex of
    // each window — DuckDB 1.0 has no md5(BLOB)/blob slicing, hex is
    // the lossless detour) and the restated oracle is CORRECT but
    // measured 443 s at sf0.1: one md5 per sliding byte window is
    // ~1.5M md5 calls inside one DuckDB query, which would dominate
    // the entire 382-query compare. Structurally rows-only, like
    // g_modularity — the per-window hash VOLUME, not the hash family,
    // is the blocker.
    def vote(h: Long): Unit = {
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    if (payload.length <= n) vote(Fnv.hash(payload))
    else {
      var i = 0
      while (i + n <= payload.length) {
        vote(Fnv.hash(payload, i, n))
        i += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }
  override protected def withNewChildInternal(c: Expression): PayloadSimHash64 =
    copy(child = c)
}

/** IVF residual: l2-normalize the input vector, assign it to its
  * home cell (argmin TRUE Euclidean distance to the coarse
  * centroids — for unit x̂, argmax 2·x̂·c − |c|²; sim ties break to
  * the LARGER cell index, mirroring the reverse-sorted ranking the
  * IVF search path uses), and emit struct(cell, x̂ − c_cell). The
  * residual is what production IVF-PQ quantizes (Jégou et al. 2011):
  * |r| ≪ |x̂|, so the same codebook budget spends on a much smaller
  * ball and the per-subspace quantization error shrinks. Centroids
  * ride the expression instance; one tight loop per row. */
case class IvfResidual(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType,
    IntegerType, StructField, StructType}
  private val dim = centroids(0).length
  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("res", ArrayType(DoubleType, containsNull = false))))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_residual requires array<float|double> input, got ${other.catalogString}")
  }
  override def nullable: Boolean = true
  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val af = elemIsFloat
    val n = a.numElements()
    if (n != dim) return null
    val x = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      x(i) = v; ss += v * v
      i += 1
    }
    val norm = math.sqrt(ss)
    i = 0
    while (i < n) { x(i) /= norm; i += 1 }
    var best = 0
    var bestSim = Double.NegativeInfinity
    var k = 0
    while (k < centroids.length) {
      val c = centroids(k)
      var d = 0.0
      var cc = 0.0
      var j = 0
      while (j < dim) { d += x(j) * c(j); cc += c(j) * c(j); j += 1 }
      val sim = 2.0 * d - cc
      if (sim >= bestSim) { bestSim = sim; best = k }
      k += 1
    }
    val c = centroids(best)
    val res = new Array[Double](dim)
    i = 0
    while (i < dim) { res(i) = x(i) - c(i); i += 1 }
    org.apache.spark.sql.catalyst.InternalRow(best,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(res))
  }
  override protected def withNewChildInternal(c: Expression): IvfResidual =
    copy(child = c)
}

/** Per-cell/code cross term of the residual SDC decomposition:
  * Σ_m tables[cell][m][codes[m]], with tables[cell][m][j] =
  * c_cell,sub[m]·cb[m][j] precomputed driver-side and riding the
  * expression — scoring touches only an int and a 16-int code
  * array. */
case class PqCellSim(left: Expression, right: Expression,
    tables: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_cell_sim requires (int cell, array<int> codes), got $other")
    }
  override def nullable: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any = {
    val cell = l.asInstanceOf[Int]
    val b = r.asInstanceOf[ArrayData]
    if (cell < 0 || cell >= tables.length ||
      b.numElements() != tables(cell).length) return null
    val t = tables(cell)
    var s = 0.0
    var m = 0
    while (m < t.length) {
      s += t(m)(b.getInt(m))
      m += 1
    }
    java.lang.Double.valueOf(s)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqCellSim = copy(left = l, right = r)
}

/** Product-quantization encoder: optionally l2-normalize the input
  * vector (raw corpus vectors yes; precomputed residuals NO — they
  * are deliberately short), then per subspace emit the index of the
  * Euclidean-nearest codebook centroid (ties to the smallest index —
  * deterministic). The codebooks ride the expression instance as
  * literals, so encoding is one tight loop per row; the `dot`-HOF
  * composition this replaced paid an interpreted per-element closure
  * for every (subspace, centroid) candidate — 512 per row at the
  * production shape. */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]],
    normalize: Boolean = true)
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType}
  private val subDim = codebooks(0)(0).length
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<float|double> input, got ${other.catalogString}")
  }
  override def nullable: Boolean = true
  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val af = elemIsFloat
    val n = a.numElements()
    if (n != codebooks.length * subDim) return null
    val x = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      x(i) = v; ss += v * v
      i += 1
    }
    if (normalize) {
      val norm = math.sqrt(ss)
      i = 0
      while (i < n) { x(i) /= norm; i += 1 }
    }
    val codes = new Array[Int](codebooks.length)
    var m = 0
    while (m < codebooks.length) {
      val cb = codebooks(m)
      val base = m * subDim
      var best = 0
      var bestD = Double.MaxValue
      var k = 0
      while (k < cb.length) {
        val c = cb(k)
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val diff = x(base + j) - c(j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = k }
        k += 1
      }
      codes(m) = best
      m += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }
  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
}

/** Symmetric PQ code distance (SDC): approximate similarity of two
  * ENCODED vectors as Σ_m table[m][codeA_m][codeB_m], where the
  * tables (centroid⋅centroid inner products per subspace) ride the
  * expression as literals — scoring a candidate pair touches only
  * two 16-int code arrays, never the vectors. The compressed-domain
  * pruning step of an IVF-PQ index. */
case class PqSdcSim(left: Expression, right: Expression,
    tables: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_sdc_sim requires two array<int> code inputs, got $other")
    }
  override def nullable: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != tables.length || b.numElements() != tables.length)
      return null
    var s = 0.0
    var m = 0
    while (m < tables.length) {
      s += tables(m)(a.getInt(m))(b.getInt(m))
      m += 1
    }
    java.lang.Double.valueOf(s)
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqSdcSim = copy(left = l, right = r)
}

/** Scalar (SQ8) quantization: per-dimension affine encode
  * code_i = round((x_i − mn_i)/s_i) clamped to [0, 255], with the
  * per-dimension mins and scales riding the expression as plan
  * literals (the PqEncode convention). Dequantization error is
  * bounded by s_i/2 per dimension by construction (spec-pinned).
  * Runs once per corpus row at index-build time — CodegenFallback
  * is fine here; the per-pair scoring hot path is [[CodeDot]]. */
case class Sq8Encode(child: Expression, mins: Array[Double],
    scales: Array[Double])
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType}
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sq8_encode requires array<float|double> input, got ${other.catalogString}")
  }
  override def nullable: Boolean = true
  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != mins.length) return null
    val af = elemIsFloat
    val codes = new Array[Int](mins.length)
    var i = 0
    while (i < mins.length) {
      if (a.isNullAt(i)) return null
      val v = if (af) a.getFloat(i).toDouble else a.getDouble(i)
      val c =
        if (scales(i) == 0.0) 0
        else math.round((v - mins(i)) / scales(i)).toInt
      codes(i) = math.max(0, math.min(255, c))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }
  override protected def withNewChildInternal(c: Expression): Sq8Encode =
    copy(child = c)
}

/** Weighted code dot product Σ w_i·code_i — the SQ8 asymmetric
  * scoring primitive: with per-query weights w_i = q_i·s_i and the
  * per-query constant Σ q_i·mn_i added outside, this IS q·x̂ for the
  * dequantized corpus vector, touching only the int codes. Codegen'd
  * — it runs per candidate pair. */
case class CodeDot(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"code_dot requires (array<int>, array<double>), got " +
          s"${l.catalogString} / ${r.catalogString}")
    }
  override def nullable: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getInt(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val anyNull = ctx.freshName("anyNull")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
         |  $acc += $a.getInt($i) * $b.getDouble($i);
         |}
         |if ($anyNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CodeDot =
    copy(left = l, right = r)
}

/** Count of positions where two long-array MinHash signatures agree —
  * the MinHash Jaccard estimator's numerator in one native loop.
  * Replaces the `zip_with`+`aggregate` composition on the candidate-
  * pair hot path (interpreted closure per element per pair — the
  * CLAUDE HOF rule); doGenCode keeps the loop inside the enclosing
  * WholeStageCodegen stage. Positions beyond the shorter signature
  * are ignored (the compositions' zip_with semantics). */
case class SigAgreeCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types.{ArrayType, IntegerType}
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sig_agree_count requires array<bigint> inputs, got " +
          s"${l.catalogString} / ${r.catalogString}")
    }
  override def nullable: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    java.lang.Integer.valueOf(c)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)
         |      && $a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SigAgreeCount =
    copy(left = l, right = r)
}

object CatalystText {
  import org.apache.spark.sql.graft.shim
  def simhash64(c: Column): Column = shim.column(SimHash64(shim.expression(c)))
  def payload_simhash64(c: Column, n: Int = 8): Column =
    shim.column(PayloadSimHash64(shim.expression(c), n))
  def rolling_hash64(c: Column): Column = shim.column(RollingHash64(shim.expression(c)))
  def bridge60(c: Column): Column = shim.column(Bridge60(shim.expression(c)))
  def sign_lsh_keys(c: Column, dim: Int, bands: Int, rows: Int): Column =
    shim.column(SignLshKeys(shim.expression(c), dim, bands, rows))
  def minhash_sig(c: Column, k: Int): Column = shim.column(MinHashSig(shim.expression(c), k))
  def sig_agree_count(a: Column, b: Column): Column =
    shim.column(SigAgreeCount(shim.expression(a), shim.expression(b)))
  def sq8_encode(c: Column, mins: Array[Double], scales: Array[Double]): Column =
    shim.column(Sq8Encode(shim.expression(c), mins, scales))
  def code_dot(codes: Column, weights: Column): Column =
    shim.column(CodeDot(shim.expression(codes), shim.expression(weights)))
  def word_shingles(tokens: Column, n: Int): Column =
    shim.column(WordShingles(shim.expression(tokens), n))
  def cosine_sim(a: Column, b: Column): Column =
    shim.column(CosineSim(shim.expression(a), shim.expression(b)))
  def inner_product(a: Column, b: Column): Column =
    shim.column(InnerProduct(shim.expression(a), shim.expression(b)))
  def quant_sq_dist(a: Column, b: Column): Column =
    shim.column(QuantSqDist(shim.expression(a), shim.expression(b)))
  def l2_normalize(c: Column): Column = shim.column(L2Normalize(shim.expression(c)))
  def deletion_variants(c: Column): Column =
    shim.column(DeletionVariants(shim.expression(c)))
  def pq_encode(c: Column, codebooks: Array[Array[Array[Double]]],
      normalize: Boolean = true): Column =
    shim.column(PqEncode(shim.expression(c), codebooks, normalize))
  def pq_sdc_sim(a: Column, b: Column, tables: Array[Array[Array[Double]]]): Column =
    shim.column(PqSdcSim(shim.expression(a), shim.expression(b), tables))
  def ivf_residual(c: Column, centroids: Array[Array[Double]]): Column =
    shim.column(IvfResidual(shim.expression(c), centroids))
  def pq_cell_sim(cell: Column, codes: Column,
      tables: Array[Array[Array[Double]]]): Column =
    shim.column(PqCellSim(shim.expression(cell), shim.expression(codes), tables))
}
