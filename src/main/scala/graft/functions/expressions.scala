package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (with codegen) for the hot paths Spark's
  * built-ins can't express in O(n): rolling document fingerprints and
  * float-vector similarity. Preference order per SURVEY.md §7: these beat
  * Scala UDFs (no ser/de, stay inside WholeStageCodegen).
  */

/** Rabin-Karp rolling polynomial hash over the UTF-8 bytes of a string:
  * `h = Σ byte·base^i mod m`, order-sensitive (transpositions change it,
  * unlike a bag-of-words hash). A built-in-only formulation needs a
  * per-character `substr` fold — O(n²) on UTF-8 — so this is a genuine
  * custom-Expression case, O(n) with codegen.
  */
case class RollingHashExpr(child: Expression, base: Long, mod: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHashExpr.hashBytes(
      input.asInstanceOf[UTF8String].getBytes, base, mod)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  ${ev.value} =
         |    (${ev.value} * ${base}L + ($bytes[$i] & 0xFF)) % ${mod}L;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): RollingHashExpr = copy(child = newChild)
}

object RollingHashExpr {
  def hashBytes(bytes: Array[Byte], base: Long, mod: Long): Long =
    hashBytesFrom(0L, bytes, base, mod)

  /** The same fold CONTINUED from a prior accumulator — lets a caller
    * hash a concatenation ("tok1 tok2") without building the string:
    * fold tok1, fold the joiner byte, fold tok2. */
  def hashBytesFrom(acc0: Long, bytes: Array[Byte], base: Long,
      mod: Long): Long = {
    var acc = acc0
    var i = 0
    while (i < bytes.length) {
      acc = (acc * base + (bytes(i) & 0xff)) % mod
      i += 1
    }
    acc
  }
}

/** Dot product of two `array<float>` columns, O(d) with codegen — the inner
  * loop of brute-force and LSH cosine search. The built-in
  * `aggregate(zip_with(...))` formulation allocates two intermediate arrays
  * per row-pair; this reads both `ArrayData`s in place.
  */
case class FloatVecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fvec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FloatVecDotExpr =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of an `array<float>` column. */
case class FloatVecNormExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fvec_norm"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    while (i < x.numElements()) {
      acc += x.getFloat(i).toDouble * x.getFloat(i).toDouble
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |double $acc = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $a.getFloat($i);
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): FloatVecNormExpr = copy(child = newChild)
}

/** 64-bit SimHash over an `array<string>` of tokens: per bit, the sign of
  * Σ±1 across the tokens' xxhash64 bits (same XXH64, seed 42, as Spark's
  * `xxhash64`, so signatures are consistent with an exploded formulation).
  * A built-in formulation needs explode + groupBy with 64 sums — a shuffle
  * of |tokens| rows; this is a per-row O(tokens·64) loop, map-only.
  */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  /** Per-row kernel, also called from generated code — keeps the
    * surrounding projection inside whole-stage codegen (a CodegenFallback
    * would force the WHOLE collapsed projection, including codegen-friendly
    * children, onto the interpreted path).
    */
  def kernel(input: Any): Long = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def nullSafeEval(input: Any): Any = kernel(input)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val self = ctx.addReferenceObj("simhashKernel", this,
        this.getClass.getName)
      s"${ev.value} = $self.kernel($c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64Expr = copy(child = newChild)
}

/** MinHash signature over an `array<string>` of shingles: `numHashes`
  * permutations h_k(x) = (a_k·x + b_k) mod p applied to each shingle's
  * xxhash64, keeping the minimum per permutation — all in ONE pass that
  * hashes each shingle exactly once (the built-in formulation
  * `array_min(transform(...))` × k re-evaluates the shingle array k times
  * after Catalyst's CollapseProject inlines it). p = 2^31-1 keeps
  * a·x + b < 2^62, no overflow. Coefficients are seeded and
  * data-independent.
  */
case class MinHashSigExpr(child: Expression, shingleWords: Int,
    numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  /** Per-row kernel, also called from generated code (see
    * [[SimHash64Expr.kernel]] for why). */
  def kernel(input: Any): ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      MinHashSigExpr.compute(input.asInstanceOf[ArrayData], shingleWords,
        numHashes))

  override protected def nullSafeEval(input: Any): Any = kernel(input)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val self = ctx.addReferenceObj("minhashKernel", this,
        this.getClass.getName)
      s"${ev.value} = $self.kernel($c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSigExpr = copy(child = newChild)
}

object MinHashSigExpr {
  val P: Long = 2147483647L // 2^31 - 1, Mersenne prime

  /** Distinct shingle hashes from a TOKEN array: each token is XXH64'd
    * once, each shingle hash is a polynomial combine of `shingleWords`
    * consecutive token hashes (wrapping arithmetic — only equality
    * matters). Building shingle STRINGS (slice+concat per position) costs
    * ~µs-scale UTF8 allocation per shingle and dominated the whole
    * pipeline; this is pure long arithmetic after one hash per token.
    */
  def shingleHashes(arr: ArrayData, shingleWords: Int): Array[Long] = {
    val n = arr.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = if (arr.isNullAt(i)) 0L
      else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      i += 1
    }
    val count = math.max(n - shingleWords + 1, if (n > 0) 1 else 0)
    val seen = new java.util.HashSet[java.lang.Long](count * 2)
    val out = new Array[Long](count)
    var m = 0
    i = 0
    while (i < count) {
      var acc = 0L
      var j = 0
      while (j < shingleWords && i + j < n) {
        acc = acc * 1000003L + th(i + j)
        j += 1
      }
      if (seen.add(acc)) { out(m) = acc; m += 1 }
      i += 1
    }
    if (m == count) out else java.util.Arrays.copyOf(out, m)
  }

  /** One pass over the shingle hashes, maintaining all permutation
    * minima. */
  def compute(tokens: ArrayData, shingleWords: Int,
      numHashes: Int): Array[Long] = {
    val hashes = shingleHashes(tokens, shingleWords)
    val as = coeffA(numHashes)
    val bs = coeffB(numHashes)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < hashes.length) {
      val x = ((hashes(i) % P) + P) % P
      var k = 0
      while (k < numHashes) {
        val v = (as(k) * x + bs(k)) % P
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    mins
  }

  /** Deterministic per-permutation coefficients (seed 42). */
  private def coeffs(n: Int): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(42)
    val as = new Array[Long](n)
    val bs = new Array[Long](n)
    var i = 0
    while (i < n) {
      as(i) = math.abs(rnd.nextLong()) % (P - 1) + 1
      bs(i) = math.abs(rnd.nextLong()) % P
      i += 1
    }
    (as, bs)
  }
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  def coeffA(n: Int): Array[Long] =
    cache.computeIfAbsent(n, coeffs(_))._1
  def coeffB(n: Int): Array[Long] =
    cache.computeIfAbsent(n, coeffs(_))._2
}

/** Fused MinHash + LSH banding over an `array<string>` of shingles: one
  * pass computes the `numHashes` permutation minima (see
  * [[MinHashSigExpr]]) and folds them into `bands` band hashes
  * (modular polynomial combine). Returned as one `array<long>` so a
  * downstream `posexplode` evaluates the whole thing exactly once per row —
  * a lambda-based banding over a separate signature column is re-evaluated
  * once per band after CollapseProject inlining.
  */
case class MinHashBandsExpr(child: Expression, shingleWords: Int,
    numHashes: Int, bands: Int)
    extends UnaryExpression {
  require(numHashes % bands == 0, "numHashes must be divisible by bands")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_bands"

  /** Per-row kernel, also called from generated code (see
    * [[SimHash64Expr.kernel]] for why). */
  def kernel(input: Any): ArrayData = {
    val mins = MinHashSigExpr.compute(input.asInstanceOf[ArrayData],
      shingleWords, numHashes)
    val rowsPerBand = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0L
      var r = 0
      while (r < rowsPerBand) {
        acc = (acc * 1000003L + mins(b * rowsPerBand + r)) % 8589934583L
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any = kernel(input)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val self = ctx.addReferenceObj("minhashBandsKernel", this,
        this.getClass.getName)
      s"${ev.value} = $self.kernel($c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): MinHashBandsExpr = copy(child = newChild)
}

/** Sorted distinct shingle hashes from an `array<string>` of TOKENS —
  * the per-document half of exact n-gram Jaccard. One XXH64 per token,
  * polynomial combine per shingle (see [[MinHashSigExpr.shingleHashes]]),
  * then an in-place sort so pair-level intersection is a linear merge
  * ([[SortedIntersectCountExpr]]) instead of a per-pair hash-set build.
  * Computed once per document (map-only); the O(pairs) stage then does
  * pure long comparisons — measured ~20× faster than per-pair
  * `array_intersect` on shingle strings at 500k pairs.
  */
case class ShingleHashSortedExpr(child: Expression, shingleWords: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes_sorted"

  /** Per-row kernel, also called from generated code (see
    * [[SimHash64Expr.kernel]] for why). */
  def kernel(input: Any): ArrayData = {
    val hs = MinHashSigExpr.shingleHashes(input.asInstanceOf[ArrayData],
      shingleWords)
    java.util.Arrays.sort(hs)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(hs)
  }

  override protected def nullSafeEval(input: Any): Any = kernel(input)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val self = ctx.addReferenceObj("shingleSortKernel", this,
        this.getClass.getName)
      s"${ev.value} = $self.kernel($c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashSortedExpr = copy(child = newChild)
}

/** |A ∩ B| of two SORTED `array<long>` columns by linear merge — O(|A|+|B|)
  * with no per-pair allocation (`array_intersect` builds a hash set per
  * invocation, which dominates all-pairs and candidate-verify loops).
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  /** Per-row kernel, also called from generated code (see
    * [[SimHash64Expr.kernel]] for why). */
  def kernel(a: Any, b: Any): Int = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { n += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    n
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = kernel(a, b)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val self = ctx.addReferenceObj("sortedIntersectKernel", this,
        this.getClass.getName)
      s"${ev.value} = $self.kernel($a, $b);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)
}

/** One-pass repetition statistics over an `array<string>` of tokens:
  * (n_tokens, n_distinct_tokens, n_bigrams, top_bigram_count). A
  * built-in formulation needs nested higher-order lambdas
  * (`array_max(transform(array_distinct(bg), b -> size(filter(bg, ...)))`)
  * whose inner array expressions are re-evaluated once per lambda
  * invocation — measured as a combinatorial blowup (~75M interpreted
  * regex evaluations at sf0.1). This kernel hashes each token once and
  * counts bigrams in a single HashMap pass.
  */
case class RepetitionStatsExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct_tokens", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("top_bigram_count", IntegerType, nullable = true)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "repetition_stats"

  /** Per-row kernel, also called from generated code (see
    * [[SimHash64Expr.kernel]] for why). */
  def kernel(input: Any): org.apache.spark.sql.catalyst.InternalRow = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // token identity via xxhash64 of the UTF8 bytes — collisions are
    // astronomically unlikely at document scale and only perturb counts
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = if (arr.isNullAt(i)) 0L
      else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      i += 1
    }
    val distinctTokens = new java.util.HashSet[java.lang.Long]()
    i = 0
    while (i < n) { distinctTokens.add(th(i)); i += 1 }
    val bigramCounts = new java.util.HashMap[java.lang.Long, Integer]()
    var top = 0
    i = 0
    while (i < n - 1) {
      val bg = th(i) * 1000003L + th(i + 1)
      val c = bigramCounts.merge(bg, 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      n, distinctTokens.size(), math.max(n - 1, 0),
      if (n >= 2) top else null)
  }

  override protected def nullSafeEval(input: Any): Any = kernel(input)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val self = ctx.addReferenceObj("repStatsKernel", this,
        this.getClass.getName)
      s"${ev.value} = $self.kernel($c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): RepetitionStatsExpr = copy(child = newChild)
}

/** Content-defined chunking of a token array in one pass: a chunk ENDS
  * at token i iff `(rollingHash(token_i)·48271) mod m mod divisor = 0`
  * (the Rabin–Karp byte fold of [[RollingHashExpr]] plus the Park–Miller
  * mix — raw rolling-hash residues are biased in the trailing byte); the
  * final partial chunk is kept. Boundaries depend only on token content,
  * so duplicated passages produce identical internal chunks at ANY
  * offset — the substring-dedup property (Lee et al. arXiv:2107.06499
  * motivate it; content-defined boundaries are the scalable stand-in for
  * their suffix array).
  *
  * A built-in formulation needs the per-token hash inside higher-order
  * function lambdas (filter/zip_with), which are codegen-fallback and
  * interpreted per element — measured ~7× the fixed-grid chunker's cost
  * at sf1. This kernel is one pass, one UTF8String build per chunk.
  */
case class CdcChunksExpr(child: Expression, divisor: Int,
    base: Long = 257L, mod: Long = 1000000007L)
    extends UnaryExpression {
  require(divisor > 1, s"divisor must be > 1, got $divisor")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cdc_chunks"

  private val space = UTF8String.fromString(" ")

  /** Per-row kernel, also called from generated code. ONE pass: each
    * token is materialized once, buffered into the current chunk, and
    * flushed through `concatWs` at each boundary. A null element is
    * never a boundary and is skipped by `concatWs` — the same
    * degradation the built-in `rolling_hash`/`array_join` formulation
    * had (token arrays from the dedup operators never contain nulls,
    * but this is a public column function).
    */
  def kernel(input: Any): ArrayData = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val chunks = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    val cur = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    var i = 0
    while (i < n) {
      val tok = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      cur += tok
      if (tok != null &&
          (RollingHashExpr.hashBytes(tok.getBytes, base, mod) * 48271L) %
            mod % divisor == 0L) {
        chunks += UTF8String.concatWs(space, cur.toArray[UTF8String]: _*)
        cur.clear()
      }
      i += 1
    }
    if (cur.nonEmpty)
      chunks += UTF8String.concatWs(space, cur.toArray[UTF8String]: _*)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      chunks.toArray[Any])
  }

  override protected def nullSafeEval(input: Any): Any = kernel(input)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val self = ctx.addReferenceObj("cdcChunksKernel", this,
        this.getClass.getName)
      s"${ev.value} = $self.kernel($c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): CdcChunksExpr = copy(child = newChild)
}

/** SQ8 scalar quantization of an `array<float>` embedding to a
  * `binary` code, one SIGNED byte per dimension: the vector is L2-
  * normalized, each component (now in [-1, 1]) rounds to
  * `round(x * 127)` clamped to [-127, 127]. Cosine similarity only
  * needs the direction, so normalize-then-quantize loses no range to
  * magnitude outliers and needs NO stored calibration (no per-index
  * min/max — codes from any two corpora are comparable by
  * construction). 4× smaller than the f32 array: the memory-bandwidth
  * lever for brute-force and re-rank ANN scans at 100 TB. A
  * zero-norm vector encodes as all-zero bytes (its cosine is
  * undefined anyway; scorers guard the zero norm).
  */
case class FloatVecSq8Expr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq8_encode"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = x.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    val nrm = math.sqrt(acc)
    val out = new Array[Byte](n)
    if (nrm > 0.0) {
      i = 0
      while (i < n) {
        val q = math.rint(x.getFloat(i).toDouble / nrm * 127.0)
        out(i) = math.max(-127.0, math.min(127.0, q)).toByte
        i += 1
      }
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nrm = ctx.freshName("nrm")
      val out = ctx.freshName("out")
      val q = ctx.freshName("q")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $a.getFloat($i);
         |}
         |double $nrm = java.lang.Math.sqrt($acc);
         |byte[] $out = new byte[$n];
         |if ($nrm > 0.0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $q = java.lang.Math.rint(
         |      (double) $a.getFloat($i) / $nrm * 127.0);
         |    $out[$i] = (byte) java.lang.Math.max(-127.0,
         |      java.lang.Math.min(127.0, $q));
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): FloatVecSq8Expr = copy(child = newChild)
}

/** Integer dot product of two SQ8 `binary` codes ([[FloatVecSq8Expr]]):
  * O(d) signed-byte multiply-adds with codegen, no allocation — at
  * d ≤ 2¹⁶ and |x| ≤ 127 the long accumulator cannot overflow. The
  * int8 scan is the hot loop of quantized brute-force/re-rank search;
  * it reads 4× fewer bytes than the f32 kernel.
  */
case class I8VecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "i8vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x(i).toLong * y(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.length, $b.length);
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += (long) $a[$i] * (long) $b[$i];
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): I8VecDotExpr =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of an SQ8 `binary` code — the denominator of the quantized
  * cosine (codes are near-unit × 127 by construction, but the exact
  * per-code norm keeps the estimate unbiased at low dimensions).
  */
case class I8VecNormExpr(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "i8vec_norm"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    var acc = 0L
    var i = 0
    while (i < x.length) {
      acc += x(i).toLong * x(i).toLong
      i += 1
    }
    math.sqrt(acc.toDouble)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |long $acc = 0L;
         |for (int $i = 0; $i < $a.length; $i++) {
         |  $acc += (long) $a[$i] * (long) $a[$i];
         |}
         |${ev.value} = java.lang.Math.sqrt((double) $acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): I8VecNormExpr = copy(child = newChild)
}

/** Column-level entry points. */
/** Hashed unigram+bigram feature buckets of a TOKEN array — DSIR's
  * bag-of-ngrams featurization (one `int` bucket per token and per
  * adjacent pair, unigrams first then bigrams, matching the
  * `concat(tokens, bigrams)` built-in order) in ONE pass that hashes
  * each token's bytes exactly once. The built-in formulation
  * (`transform(sequence(...), i -> concat(element_at(tk,i), ' ',
  * element_at(tk,i+1)))`) re-evaluates the token array inside
  * interpreted HOF lambdas and materializes every bigram string — the
  * [[CdcChunksExpr]] lesson, measured ~5x here at sf0.1. A bigram's
  * hash is the rolling byte fold CONTINUED through the joiner space
  * ([[RollingHashExpr.hashBytesFrom]]), bit-identical to hashing the
  * joined string, so the DuckDB oracle arithmetic is unchanged.
  */
case class NgramBucketsExpr(child: Expression, buckets: Int,
    base: Long = 257L, mod: Long = 1000000007L)
    extends UnaryExpression {
  require(buckets > 0, s"buckets must be > 0, got $buckets")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ngram_buckets"

  private def bucketOf(h: Long): Int =
    ((h * 48271L) % mod % buckets).toInt

  /** Per-row kernel, also called from generated code. */
  def kernel(input: Any): ArrayData = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // null tokens contribute nothing (token arrays here never hold
    // nulls, but this is a public column function)
    val hs = new Array[Long](n)
    val live = new Array[Boolean](n)
    val out = new scala.collection.mutable.ArrayBuffer[Any](
      n + math.max(0, n - 1))
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        hs(i) = RollingHashExpr.hashBytes(
          arr.getUTF8String(i).getBytes, base, mod)
        live(i) = true
        out += bucketOf(hs(i))
      }
      i += 1
    }
    i = 0
    while (i < n - 1) {
      if (live(i) && live(i + 1)) {
        val joined = RollingHashExpr.hashBytesFrom(
          (hs(i) * base + 0x20L) % mod,
          arr.getUTF8String(i + 1).getBytes, base, mod)
        out += bucketOf(joined)
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any = kernel(input)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val self = ctx.addReferenceObj("ngramBucketsKernel", this,
        this.getClass.getName)
      s"${ev.value} = $self.kernel($c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): NgramBucketsExpr = copy(child = newChild)
}

/** BPE subword encoding of a TOKEN array under a trained merge list
  * (Sennrich et al., "Neural Machine Translation of Rare Words with
  * Subword Units", arXiv:1508.07909 §3.2): each word starts as its
  * character symbols plus a SEPARATE trailing `</w>` end-of-word
  * symbol, then the lowest-RANK merge present in the word is applied
  * to all its occurrences left-to-right, repeatedly, until no learned
  * pair remains; the per-word subword runs concatenate in token order.
  * Greedy-by-rank application is the standard inference rule — the
  * ranks ARE the training order, so inference replays training's
  * merge history restricted to this word.
  *
  * The merge list is model-sized (a constructor argument riding the
  * expression into generated code via a reference object, the
  * [[CdcChunksExpr]] pattern) — the corpus side stays a map-only
  * projection, nothing joins. A built-in formulation would need an
  * unbounded iterate-until-fixpoint over array slices — a genuine
  * custom-Expression case.
  */
case class BpeEncodeExpr(child: Expression,
    merges: Seq[(String, String)]) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_encode"

  @transient private lazy val coder = new BpeEncodeExpr.Coder(merges)

  /** Per-row kernel, also called from generated code. */
  def kernel(input: Any): ArrayData = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0
    while (i < n) {
      // null tokens contribute nothing (the CdcChunksExpr degradation
      // rule: token arrays here never hold nulls, but this is public)
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i).toString
        if (w.nonEmpty)
          coder.wordSyms(w).foreach(s => out += UTF8String.fromString(s))
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any = kernel(input)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val self = ctx.addReferenceObj("bpeEncodeKernel", this,
        this.getClass.getName)
      s"${ev.value} = $self.kernel($c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): BpeEncodeExpr = copy(child = newChild)
}

/** [[BpeEncodeExpr]]'s count-only sibling: the SUBWORD COUNT of a
  * token array under the merges, without materializing a single
  * subword string — the token-accounting hot path (the refresh
  * tokenizer modality, model-token shard budgets) only ever consumes
  * `size(subwords)`, and building then discarding the strings is the
  * same waste class the DSIR ngram kernel eliminated.
  */
case class BpeCountExpr(child: Expression,
    merges: Seq[(String, String)]) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_count"

  @transient private lazy val coder = new BpeEncodeExpr.Coder(merges)

  /** Per-row kernel, also called from generated code. */
  def kernel(input: Any): Int = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var total = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i).toString
        if (w.nonEmpty) total += coder.wordSyms(w).length
      }
      i += 1
    }
    total
  }

  override protected def nullSafeEval(input: Any): Any = kernel(input)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val self = ctx.addReferenceObj("bpeCountKernel", this,
        this.getClass.getName)
      s"${ev.value} = $self.kernel($c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): BpeCountExpr = copy(child = newChild)
}

/** [[BpeEncodeExpr]]'s ID-emitting sibling: the subword stream as
  * VOCABULARY IDS (array<int>) — what a training run actually
  * consumes. Same [[BpeEncodeExpr.Coder]] segmentation, then a
  * symbol→id lookup under the deterministic
  * [[BpeEncodeExpr.vocabIds]] table; id 0 is reserved for
  * out-of-vocabulary symbols (a code point outside the training
  * alphabet — multi-char symbols are merge results and always in
  * vocabulary). Map-only: the model rides generated code as a
  * reference object, no join, no shuffle, no per-row driver contact.
  */
case class BpeEncodeIdsExpr(child: Expression, alphabet: Seq[String],
    merges: Seq[(String, String)]) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_encode_ids"

  @transient private lazy val coder = new BpeEncodeExpr.Coder(merges)
  @transient private lazy val ids: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    BpeEncodeExpr.vocabIds(alphabet, merges).foreach { case (s, i) =>
      m.put(s, i)
    }
    m
  }

  /** Per-row kernel, also called from generated code. */
  def kernel(input: Any): ArrayData = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i).toString
        if (w.nonEmpty) coder.wordSyms(w).foreach { s =>
          val id = ids.get(s)
          out += (if (id == null) 0 else id.intValue())
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any = kernel(input)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val self = ctx.addReferenceObj("bpeEncodeIdsKernel", this,
        this.getClass.getName)
      s"${ev.value} = $self.kernel($c);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): BpeEncodeIdsExpr = copy(child = newChild)
}

object BpeEncodeExpr {

  /** The deterministic symbol→id table shared by the ID kernel and
    * [[graft.operators.Bpe.vocab]] (ONE definition, so a stored vocab
    * and the generated ids can never disagree): id 0 is RESERVED for
    * out-of-vocabulary symbols (no string maps to it), the alphabet
    * takes ids 1..A in the given (sorted-at-training) order, merge
    * outputs follow in rank order — first occurrence wins when two
    * merge paths mint the same symbol string (e.g. (a,bc) and (ab,c)
    * both → "abc"), so every symbol has exactly one id. */
  def vocabIds(alphabet: Seq[String],
      merges: Seq[(String, String)]): Seq[(String, Int)] = {
    val seen = new java.util.LinkedHashMap[String, Int]()
    def add(s: String): Unit =
      if (!seen.containsKey(s)) seen.put(s, seen.size + 1)
    alphabet.foreach(add)
    merges.foreach { case (l, r) => add(l + r) }
    import scala.jdk.CollectionConverters._
    seen.asScala.toSeq
  }
  /** The end-of-word marker, a SEPARATE final symbol (one of Sennrich's
    * two stated variants; the separate-symbol form keeps every word
    * character symbol intact, so `concat(subwords) == word + "</w>"`
    * is an exact invariant the specs pin). The marker is UNREACHABLE
    * from corpus text: single characters can never equal it (it is 4
    * chars), and every multi-character symbol is a merge result, with
    * merges concatenating to it refused at training ([[graft.operators
    * .Bpe.trainOnTypes]]), persistence (`writeModel`), and kernel
    * construction ([[Coder]]) — so a standalone `</w>` symbol in the
    * stream is ALWAYS a word terminator, even for corpus words
    * containing the literal characters. */
  val Eow = "</w>"

  /** Symbols RESERVED by the stream/decode conventions — no merge may
    * CONCATENATE to any of them, or a corpus-derived in-vocabulary
    * symbol becomes indistinguishable from the convention it
    * collides with: `</w>` from the appended word terminator (the
    * flattened stream turns ambiguous at word boundaries), `<unk>`
    * from [[graft.operators.Bpe.OovSymbol]] (a decode audit's OOV
    * damage count conflates real corpus text with lost code points),
    * `<|endoftext|>` from [[graft.operators.Bpe.EosSymbol]] (decoded
    * output grows phantom document boundaries, and decodeWords
    * force-terminates the containing word). ML/web scrapes contain
    * the latter two literally all the time, so this is a realistic
    * corpus, not an adversarial one. The latter two strings are
    * re-stated by the Bpe decode constants; Bpe's object init
    * cross-checks the two sites can never drift. */
  val Reserved: Seq[String] = Seq(Eow, "<unk>", "<|endoftext|>")

  /** The shared greedy-by-rank merge machinery behind the encode and
    * count kernels — ONE definition, so the two can never disagree on
    * a word's segmentation. */
  final class Coder(merges: Seq[(String, String)])
      extends Serializable {
    // no merge may CONCATENATE to a reserved symbol ([[graft
    // .operators.Bpe.trainOnTypes]] never learns such a pair; this
    // refuses foreign/hand-built lists at kernel-construction time)
    require(merges.forall { case (l, r) => !Reserved.contains(l + r) },
      s"BPE merge list mints a reserved symbol " +
        s"(${Reserved.mkString("'", "', '", "'")} are convention " +
        "markers in the subword/decode stream) — ambiguous; retrain")
    private val table = merges.toIndexedSeq
    private val rank: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](table.size * 2)
      table.zipWithIndex.foreach { case ((l, r), i) =>
        // the " " separator never occurs inside a symbol (symbols
        // come from whitespace-split word characters and "</w>")
        m.put(l + " " + r, i)
      }
      m
    }

    /** The word's final symbol sequence under the merges: character
      * symbols (code-point-safe) + the `</w>` marker, then the
      * lowest-rank merge present applied to all its occurrences
      * left-to-right, repeatedly. */
    def wordSyms(w: String): scala.collection.mutable.ArrayBuffer[String] = {
      val syms =
        new scala.collection.mutable.ArrayBuffer[String](w.length + 1)
      var ci = 0
      while (ci < w.length) {
        val cp = w.codePointAt(ci)
        val n = Character.charCount(cp)
        syms += w.substring(ci, ci + n)
        ci += n
      }
      syms += Eow
      var done = false
      while (!done) {
        var bestRank = Int.MaxValue
        var i = 0
        while (i < syms.length - 1) {
          val r = rank.get(syms(i) + " " + syms(i + 1))
          if (r != null && r < bestRank) bestRank = r
          i += 1
        }
        if (bestRank == Int.MaxValue) done = true
        else {
          val (l, r) = table(bestRank)
          i = 0
          while (i < syms.length - 1) {
            if (syms(i) == l && syms(i + 1) == r) {
              syms(i) = l + r
              syms.remove(i + 1)
            } else i += 1
          }
        }
      }
      syms
    }
  }
}

object native {
  import org.apache.spark.sql.graftshim.ColumnBridge
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  def rolling_hash(text: Column, base: Long = 257L,
      mod: Long = 1000000007L): Column =
    c(RollingHashExpr(e(text), base, mod))

  def cdc_chunks(tokens: Column, divisor: Int): Column =
    c(CdcChunksExpr(e(tokens), divisor))

  def fvec_dot(a: Column, b: Column): Column = c(FloatVecDotExpr(e(a), e(b)))

  def fvec_norm(a: Column): Column = c(FloatVecNormExpr(e(a)))

  def fvec_cosine(a: Column, b: Column): Column =
    fvec_dot(a, b) / (fvec_norm(a) * fvec_norm(b))

  def simhash64(tokens: Column): Column = c(SimHash64Expr(e(tokens)))

  /** MinHash signature from a TOKEN array (shingling happens inside the
    * kernel as hash combines — no shingle strings are materialized). */
  def minhash_sig(tokens: Column, shingleWords: Int = 3,
      numHashes: Int = 32): Column =
    c(MinHashSigExpr(e(tokens), shingleWords, numHashes))

  def minhash_bands(tokens: Column, shingleWords: Int = 3,
      numHashes: Int = 32, bands: Int = 8): Column =
    c(MinHashBandsExpr(e(tokens), shingleWords, numHashes, bands))

  def repetition_stats(tokens: Column): Column =
    c(RepetitionStatsExpr(e(tokens)))

  /** BPE subword stream from a TOKEN array under a trained merge
    * list — map-only, the merges ride the expression. */
  def bpe_encode(tokens: Column, merges: Seq[(String, String)]): Column =
    c(BpeEncodeExpr(e(tokens), merges))

  /** BPE subword stream as VOCABULARY IDS from a TOKEN array — the
    * training artifact's unit (id 0 = out-of-vocabulary). */
  def bpe_encode_ids(tokens: Column, alphabet: Seq[String],
      merges: Seq[(String, String)]): Column =
    c(BpeEncodeIdsExpr(e(tokens), alphabet, merges))

  /** Hashed unigram+bigram feature buckets from a TOKEN array (DSIR
    * featurization) — one pass, no ngram strings materialized. */
  def ngram_buckets(tokens: Column, buckets: Int): Column =
    c(NgramBucketsExpr(e(tokens), buckets))

  /** BPE subword COUNT from a TOKEN array — the encode kernel's
    * segmentation without materializing the subword strings. */
  def bpe_count(tokens: Column, merges: Seq[(String, String)]): Column =
    c(BpeCountExpr(e(tokens), merges))

  /** Sorted distinct shingle hashes from a TOKEN array, for merge-based
    * exact Jaccard via [[sorted_intersect_count]]. */
  def shingle_hashes_sorted(tokens: Column, shingleWords: Int = 3): Column =
    c(ShingleHashSortedExpr(e(tokens), shingleWords))

  def sorted_intersect_count(a: Column, b: Column): Column =
    c(SortedIntersectCountExpr(e(a), e(b)))

  def sq8_encode(vec: Column): Column = c(FloatVecSq8Expr(e(vec)))

  def i8vec_dot(a: Column, b: Column): Column =
    c(I8VecDotExpr(e(a), e(b)))

  def i8vec_norm(a: Column): Column = c(I8VecNormExpr(e(a)))

  /** Quantized-cosine estimate from two SQ8 codes: dot over the codes'
    * own norms; NULL-safe like every composed cosine here, 0.0 where a
    * zero-norm code makes the measure undefined. */
  def i8vec_cosine(a: Column, b: Column): Column = {
    val denom = i8vec_norm(a) * i8vec_norm(b)
    org.apache.spark.sql.functions.when(denom === 0, 0.0)
      .otherwise(i8vec_dot(a, b) / denom)
  }
}
