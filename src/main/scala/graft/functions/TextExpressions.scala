package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the LLM-pipeline text operators that
  * built-in functions can't express efficiently (SURVEY.md §7.5).
  *
  * Both are deterministic pure functions evaluated per-row inside the
  * executor (no UDF serialization overhead, null-safe, usable from SQL
  * after [[TextExpressions.register]]).
  */

/** 64-bit SimHash of a token array: each token is xxhash64'd, bit
  * positions vote +1/-1 weighted by occurrence, the sign forms the output
  * bit. Near-duplicate documents differ in few bits (compare via
  * hamming distance on the result). */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** MinHash signature of a shingle array: each shingle is xxhash64'd once,
  * then `numPerm` permutations are derived with a multiply-add universal
  * hash family (odd multiplier + offset per permutation); the output is
  * the array of per-permutation minima.
  *
  * A single tight loop per row — O(shingles) string hashes +
  * O(shingles * numPerm) long arithmetic. The equivalent built-in
  * higher-order-function expression tree re-evaluates the inner lambda
  * per permutation in interpreted mode, which is catastrophically slower;
  * this is exactly the "custom Expression beats composition" case. */
case class MinHashSignature(child: Expression, numPerm: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  private val B = -7046029254386353131L

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var p = 0
        while (p < numPerm) {
          val v = h * (2L * p + 1L) + p * B
          if (v < mins(p)) mins(p) = v
          p += 1
        }
      }
      i += 1
    }
    ArrayData.toArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Fused shingle+MinHash: slides a `shingleN`-token window over the token
  * array, materializes each shingle string ONCE, hashes it once, and folds
  * the `numPerm` permuted minima — no intermediate shingle array, no
  * per-permutation lambda re-evaluation. This is the hot path of MinHash
  * dedup (one evaluation per document), hence a single tight loop. */
case class MinHashShingles(child: Expression, shingleN: Int, numPerm: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_shingles"

  private val B = -7046029254386353131L
  private val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i + shingleN <= n) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](shingleN)
      var j = 0
      var ok = true
      while (j < shingleN) {
        if (toks.isNullAt(i + j)) ok = false
        else parts(j) = toks.getUTF8String(i + j)
        j += 1
      }
      if (ok) {
        val shingle = org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*)
        val h = XxHash64Function.hash(shingle, StringType, 42L)
        var p = 0
        while (p < numPerm) {
          val v = h * (2L * p + 1L) + p * B
          if (v < mins(p)) mins(p) = v
          p += 1
        }
      }
      i += 1
    }
    ArrayData.toArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashShingles =
    copy(child = newChild)
}

/** Word n-gram shingles (n consecutive tokens joined by a space) as one
  * tight loop per row. The built-in equivalent —
  * `transform(sequence(0, size-n), i -> concat_ws(' ', slice(toks, i+1, n)))`
  * — is a higher-order function with no codegen: it re-evaluates an
  * interpreted lambda per start offset, which dominates corpus-wide
  * shingle scans (measured ~3.4 s of a 3.6 s query at sf0.1). Null
  * tokens are skipped within a shingle, matching concat_ws. */
case class WordShingles(child: Expression, shingleN: Int)
    extends UnaryExpression with CodegenFallback {
  require(shingleN >= 1, s"word_shingles: n must be >= 1, got $shingleN")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  private val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val out = math.max(0, n - shingleN + 1)
    val res = new Array[Any](out)
    var i = 0
    while (i < out) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](shingleN)
      var j = 0
      while (j < shingleN) {
        parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      res(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(res)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Karp-Rabin polynomial rolling hash over a string's UTF-8 bytes:
  * h = sum(byte_i * B^i) in wrapping 64-bit arithmetic, B = 1000003.
  * A cheap order-sensitive document fingerprint. */
case class RollingHash(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val B = 1000003L
    var h = 0L
    var pow = 1L
    var i = 0
    while (i < bytes.length) {
      h += (bytes(i) & 0xffL) * pow
      pow *= B
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object TextExpressions {
  import org.apache.spark.sql.graftx.{toColumn, toExpression}

  def simhash64(c: Column): Column = toColumn(SimHash64(toExpression(c)))
  def rolling_hash(c: Column): Column = toColumn(RollingHash(toExpression(c)))
  def minhash_signature(c: Column, numPerm: Int): Column =
    toColumn(MinHashSignature(toExpression(c), numPerm))
  def minhash_shingles(tokens: Column, shingleN: Int, numPerm: Int): Column =
    toColumn(MinHashShingles(toExpression(tokens), shingleN, numPerm))
  def word_shingles(tokens: Column, shingleN: Int): Column =
    toColumn(WordShingles(toExpression(tokens), shingleN))

  /** Register both for use inside SQL / expr() strings. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("rolling_hash", es => RollingHash(es.head), "scala_udf")
  }
}
