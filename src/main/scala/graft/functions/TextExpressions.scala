package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the LLM-pipeline text operators that
  * built-in functions can't express efficiently (SURVEY.md §7.5).
  *
  * All are deterministic pure functions evaluated per-row inside the
  * executor (no UDF serialization overhead, null-safe, usable from SQL
  * after [[TextExpressions.register]]). Each implements `doGenCode` as a
  * static call into [[HashOps]], so the surrounding Project/Filter stays
  * inside whole-stage codegen — CodegenFallback would instead pay an
  * interpreted Expression.eval dispatch per row in the corpus-scan hot
  * path. Interpreted eval delegates to the SAME kernel, so both paths
  * are one implementation. */

/** 64-bit SimHash of a token array: each token is xxhash64'd, bit
  * positions vote +1/-1 weighted by occurrence, the sign forms the output
  * bit. Near-duplicate documents differ in few bits (compare via
  * hamming distance on the result). */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(HashOps.simhash64(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.simhash64($c)")

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
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    HashOps.minhashSignature(input.asInstanceOf[ArrayData], numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashOps.minhashSignature($c, $numPerm)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Fused shingle+MinHash: slides a `shingleN`-token window over the token
  * array, materializes each shingle string ONCE, hashes it once, and folds
  * the `numPerm` permuted minima — no intermediate shingle array, no
  * per-permutation lambda re-evaluation. This is the hot path of MinHash
  * dedup (one evaluation per document), hence a single tight loop. */
case class MinHashShingles(child: Expression, shingleN: Int, numPerm: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_shingles"

  override def nullSafeEval(input: Any): Any =
    HashOps.minhashShingles(input.asInstanceOf[ArrayData], shingleN, numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashOps.minhashShingles($c, $shingleN, $numPerm)")

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
    extends UnaryExpression {
  require(shingleN >= 1, s"word_shingles: n must be >= 1, got $shingleN")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    HashOps.wordShingles(input.asInstanceOf[ArrayData], shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashOps.wordShingles($c, $shingleN)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** LSH band hashes over a MinHash signature — a kernel expression so the
  * deliberately-wrapping 64-bit fold is independent of
  * spark.sql.ansi.enabled (the SQL aggregate/multiply form throws
  * ARITHMETIC_OVERFLOW under ANSI, which Spark 4 enables by default),
  * and the per-band fold stays one static call inside codegen instead
  * of an interpreted higher-order aggregate per band. */
case class LshBands(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  require(bands >= 1 && rowsPerBand >= 1,
    s"lsh_bands: bands/rowsPerBand must be >= 1, got $bands/$rowsPerBand")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_bands"

  override def nullSafeEval(input: Any): Any =
    HashOps.lshBands(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashOps.lshBands($c, $bands, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): LshBands =
    copy(child = newChild)
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD via java.text.Normalizer) —
  * the corpus-cleaning step that folds visually-identical byte sequences
  * together BEFORE fingerprinting/dedup (decomposed vs precomposed
  * accents would otherwise defeat exact-hash dedup). Spark has no
  * built-in for this; already-normalized strings (the overwhelming case
  * in a clean corpus) return the input buffer untouched. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unicode_normalize: unknown form $form")
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(input: Any): Any =
    HashOps.unicodeNormalize(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.HashOps.unicodeNormalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

/** ftfy-style mojibake repair (cp1252/UTF-8 double-encoding) — see
  * [[HashOps.fixMojibake]] for the detector-is-the-repair scheme. The
  * web-scrape cleaning step that rescues "Ã©"-infested documents
  * instead of letting the quality filter discard them. */
case class FixMojibake(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "fix_mojibake"

  override def nullSafeEval(input: Any): Any =
    HashOps.fixMojibake(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.fixMojibake($c)")

  override protected def withNewChildInternal(newChild: Expression): FixMojibake =
    copy(child = newChild)
}

/** Karp-Rabin polynomial rolling hash over a string's UTF-8 bytes:
  * h = sum(byte_i * B^i) in wrapping 64-bit arithmetic, B = 1000003.
  * A cheap order-sensitive document fingerprint. */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(HashOps.rollingHash(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.rollingHash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** DEFLATE compression ratio — see [[HashOps.deflateRatio]]. The
  * repetition/boilerplate signal that needs no tokenization: template
  * spam compresses to a fraction of what natural prose does. */
case class DeflateRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(HashOps.deflateRatio(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.deflateRatio($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

/** Gopher repetition n-gram stats [top_chars, dup_chars] over a token
  * array — see [[HashOps.ngramRepStats]] for the exact DataTrove
  * semantics (count>1 top guard, non-overlapping skip-n dup scan). The
  * scan is sequential with a hash set, which no codegen'd built-in
  * composition expresses; as a kernel it is one static call per row. */
case class NgramRepStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"ngram_rep_stats: n must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_rep_stats"

  override def nullSafeEval(input: Any): Any =
    HashOps.ngramRepStats(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.ngramRepStats($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramRepStats =
    copy(child = newChild)
}

/** Winnowing fingerprints of a text (Schleimer-Wilkerson-Aiken 2003 —
  * the MOSS local-fingerprint scheme; see
  * [[HashOps.winnowFingerprints]]): array<struct<pos, hash>> of the
  * per-window minima over k-gram md5-prefix hashes. The window scan is
  * sequential with positional state — no built-in composition
  * expresses it; as a kernel it is one static call per row. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1,
    s"winnow_fingerprints: k/w must be >= 1, got $k/$w")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("hash", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    HashOps.winnowFingerprints(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashOps.winnowFingerprints($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** Clipped n-gram matches of candidate vs reference token arrays — the
  * BLEU "modified precision" / ROUGE-N numerator, one hash-map sweep
  * per row (see [[HashOps.clippedNgramMatches]]). A binary kernel so
  * corpus-scale generation eval stays inside whole-stage codegen. */
case class ClippedNgramMatches(left: Expression, right: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(n >= 1, s"clipped_ngram_matches: n must be >= 1, got $n")
  override def dataType: DataType = LongType
  override def prettyName: String = "clipped_ngram_matches"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(HashOps.clippedNgramMatches(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HashOps.clippedNgramMatches($a, $b, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ClippedNgramMatches =
    copy(left = newLeft, right = newRight)
}

/** Longest-common-subsequence length of two token arrays — the ROUGE-L
  * kernel (see [[HashOps.lcsLength]]): classic two-row O(m*n) DP as
  * one static call per row. */
case class LcsLength(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "lcs_length"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(HashOps.lcsLength(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HashOps.lcsLength($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsLength =
    copy(left = newLeft, right = newRight)
}

/** Flesch vowel-group syllable sum over a token array — see
  * [[HashOps.syllableRunsSum]]: one byte scan per token instead of an
  * interpreted per-word lambda running regexp_extract_all (the data
  * card's dominant per-row cost; value-identical by the ASCII-class
  * byte-run argument). */
case class SyllableRunsSum(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "syllable_runs_sum"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      HashOps.syllableRunsSum(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.syllableRunsSum($c)")

  override protected def withNewChildInternal(newChild: Expression): SyllableRunsSum =
    copy(child = newChild)
}

/** Count of maximal `[.!?]+` runs — the Flesch sentence estimate as one
  * byte scan; see [[HashOps.sentenceRuns]]. */
case class SentenceRuns(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sentence_runs"

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(HashOps.sentenceRuns(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.sentenceRuns($c)")

  override protected def withNewChildInternal(newChild: Expression): SentenceRuns =
    copy(child = newChild)
}

/** Non-overlapping match count of a constant regex — see
  * [[HashOps.regexpCountCompiled]]: the same count as
  * size(regexp_extract_all(child, pattern)) (Spark's regexp_count is
  * RuntimeReplaceable sugar for exactly that form), without
  * materializing the matched substrings into an array per row. The
  * pattern compiles once per operator instance.
  *
  * NULL input yields NULL (UnaryExpression's null-intolerant default)
  * — an INTENTIONAL divergence from the builtin composition, whose
  * size(NULL) answers -1 under this engine's legacy sizeOfNull (ansi
  * off): that sentinel silently subtracted from sums it rode into,
  * where null rows simply drop out. Pinned in
  * KernelEquivalenceSpec's null-text case. */
case class RegexCount(child: Expression, pattern: String)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "regex_count"

  @transient private lazy val compiled: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(pattern)

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(HashOps.regexpCountCompiled(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], compiled))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("regexCountPattern", compiled,
      "java.util.regex.Pattern")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashOps.regexpCountCompiled($c, $pRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): RegexCount =
    copy(child = newChild)
}

/** `arrays_overlap(child, lit(grams))` with the constant side's hash set
  * built ONCE per operator instance instead of per row: Spark's
  * ArraysOverlap rebuilds the smaller array's set on every invocation,
  * so a row-local gate against a 10^4-gram benchmark literal paid a
  * full set construction (and a probe of the 10^4 literal elements)
  * per document. Here the document's grams probe a prebuilt set —
  * O(|doc grams|) lookups per row. Child arrays must be null-free
  * (wordShingles guarantees containsNull=false); with that, the result
  * is boolean-identical to arrays_overlap against a null-free literal. */
/** Position-agreement count of two long arrays (the MinHash
  * signature-agreement estimator) — value-identical to
  * aggregate(zip_with(a, b, (x, y) -> if(x = y, 1, 0)), 0, +), but a
  * tight codegen'd loop: the higher-order-function composition is
  * CodegenFallback (interpreted lambda evaluation with boxing per
  * element, numPerm iterations x 2 HOFs per candidate pair) — the
  * estimate stage's per-row cost at document scale. Pinned
  * value-identical in KernelEquivalenceSpec. */
case class SigAgreement(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sig_agreement"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(HashOps.sigAgreement(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HashOps.sigAgreement($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgreement =
    copy(left = newLeft, right = newRight)
}

case class OverlapsConstSet(child: Expression, grams: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "overlaps_const_set"

  @transient private lazy val set
      : java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
      math.max(16, grams.size * 2))
    grams.foreach(g =>
      s.add(org.apache.spark.unsafe.types.UTF8String.fromString(g)): Unit)
    s
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(
      HashOps.overlapsSet(input.asInstanceOf[ArrayData], set))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("overlapsConstSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.overlapsSet($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): OverlapsConstSet =
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
  def unicode_normalize(c: Column, form: String = "NFC"): Column =
    toColumn(UnicodeNormalize(toExpression(c), form))
  def lsh_bands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    toColumn(LshBands(toExpression(sig), bands, rowsPerBand))
  def fix_mojibake(c: Column): Column =
    toColumn(FixMojibake(toExpression(c)))
  def deflate_ratio(c: Column): Column =
    toColumn(DeflateRatio(toExpression(c)))
  def ngram_rep_stats(tokens: Column, n: Int): Column =
    toColumn(NgramRepStats(toExpression(tokens), n))
  def clipped_ngram_matches(cand: Column, ref: Column, n: Int): Column =
    toColumn(ClippedNgramMatches(toExpression(cand), toExpression(ref), n))
  def winnow_fingerprints(text: Column, k: Int, w: Int): Column =
    toColumn(WinnowFingerprints(toExpression(text), k, w))
  def lcs_length(a: Column, b: Column): Column =
    toColumn(LcsLength(toExpression(a), toExpression(b)))
  def overlaps_const_set(c: Column, grams: Seq[String]): Column =
    toColumn(OverlapsConstSet(toExpression(c), grams))
  def sig_agreement(a: Column, b: Column): Column =
    toColumn(SigAgreement(toExpression(a), toExpression(b)))
  def syllable_runs_sum(tokens: Column): Column =
    toColumn(SyllableRunsSum(toExpression(tokens)))
  def regex_count(c: Column, pattern: String): Column =
    toColumn(RegexCount(toExpression(c), pattern))
  def sentence_runs(c: Column): Column =
    toColumn(SentenceRuns(toExpression(c)))

  /** Register both for use inside SQL / expr() strings. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("rolling_hash", es => RollingHash(es.head), "scala_udf")
  }
}
