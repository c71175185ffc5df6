package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding tokenization (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016) — the
  * token-counting story upgraded from whitespace/regex heuristics to a
  * REAL learned subword vocabulary.
  *
  * Scale split: the corpus-bound half (word counting) is one Spark
  * aggregation — corpus in, Zipf-bounded vocab out; the merge loop then
  * runs DRIVER-side on the collected (word, count) table, which is the
  * standard practice (HF/sentencepiece train from word counts in
  * memory) and touches no corpus row again. Encoding distributes as a
  * single projection with the learned merge ranks riding along as a
  * codegen reference object (the [[graft.vec.PqEncodeExpr]] discipline).
  */
object Bpe {

  /** Code-point symbols of a word (never split surrogate pairs — the
    * same rule as the encode kernel). */
  private def codePointSymbols(w: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** Learn `numMerges` merges from the corpus. Deterministic: candidate
    * pairs rank by (count desc, pair lexicographic asc) — a fixed total
    * order, so the learned merge list is reproducible across runs,
    * partitionings and engines. Words are symbol sequences of their
    * characters (no end-of-word marker; merges never cross words).
    * `maxVocabWords` caps the driver-side table at the top words by
    * (count desc, word asc) — at 100 TB the full vocab is still
    * Zipf-shaped, but the cap bounds the worst case. Training stops
    * early when no pair occurs twice. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            maxVocabWords: Int = 100000): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(maxVocabWords >= 1, s"maxVocabWords must be >= 1, got $maxVocabWords")
    val wordCounts = docs
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w")).limit(maxVocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var words: Array[(Array[String], Long)] =
      wordCounts.map { case (w, n) => (codePointSymbols(w), n) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, n) <- words; j <- 0 until syms.length - 1)
        pairCounts.updateWith((syms(j), syms(j + 1)))(c => Some(c.getOrElse(0L) + n))
      if (pairCounts.isEmpty || pairCounts.valuesIterator.max < 2) exhausted = true
      else {
        val best = pairCounts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        words = words.map { case (syms, n) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == best._1 && syms(j + 1) == best._2) {
              out += syms(j) + syms(j + 1); j += 2
            } else { out += syms(j); j += 1 }
          }
          (out.toArray, n)
        }
        i += 1
      }
    }
    merges.toSeq
  }

  /** Encode a token array to BPE subwords under `merges` (earlier merge
    * = higher priority, the HF greedy rule). One projection; the rank
    * map is a codegen reference object. Zero merges degrade to
    * per-character splitting — the SQL-expressible case the oracle
    * gates. */
  def encode(tokens: Column, merges: Seq[(String, String)]): Column = {
    import org.apache.spark.sql.graftx.{toColumn, toExpression}
    toColumn(BpeEncodeExpr(toExpression(tokens), merges))
  }

  /** Subword count per document under a learned vocabulary. */
  def tokenCount(tokens: Column, merges: Seq[(String, String)]): Column =
    size(encode(tokens, merges)).cast("long")

  /** Persist the learned merge list — one "left right" pair per line in
    * rank order, the merges.txt convention. Symbols never contain
    * whitespace ([[TextOps.tokens]] splits on it), so the space
    * delimiter is unambiguous. */
  def saveMerges(merges: Seq[(String, String)], path: String): Unit = {
    val lines = merges.map { case (a, b) => s"$a $b" }
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      String.join("\n", lines: _*).getBytes("UTF-8")): Unit
  }

  def loadMerges(path: String): Seq[(String, String)] =
    new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      .split("\n").toSeq.filter(_.nonEmpty).map { line =>
        val i = line.indexOf(' ')
        require(i > 0 && i < line.length - 1, s"malformed merge line: $line")
        (line.substring(0, i), line.substring(i + 1))
      }
}

object BpeKernels {
  /** Greedy BPE over each token: repeatedly merge the lowest-rank
    * adjacent pair until none applies; subwords of all tokens are
    * emitted flattened in order. */
  def bpeEncode(toks: ArrayData, ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var t = 0
    while (t < toks.numElements()) {
      if (!toks.isNullAt(t)) {
        val word = toks.getUTF8String(t).toString
        val syms = scala.collection.mutable.ArrayBuffer.empty[String]
        // iterate CODE POINTS, not UTF-16 chars: an astral-plane symbol
        // (emoji, rare CJK) would otherwise split into two lone
        // surrogates and corrupt every subword it touches
        var ci = 0
        while (ci < word.length) {
          val cp = word.codePointAt(ci)
          syms += new String(Character.toChars(cp))
          ci += Character.charCount(cp)
        }
        var done = syms.length < 2
        while (!done) {
          var bestRank = Int.MaxValue
          var bestI = -1
          var j = 0
          while (j < syms.length - 1) {
            val r = ranks.get(syms(j) + " " + syms(j + 1))
            if (r != null && r < bestRank) { bestRank = r; bestI = j }
            j += 1
          }
          if (bestI < 0) done = true
          else {
            syms(bestI) = syms(bestI) + syms(bestI + 1)
            syms.remove(bestI + 1)
            if (syms.length < 2) done = true
          }
        }
        syms.foreach(s => out += UTF8String.fromString(s))
      }
      t += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** The encode expression: merge ranks ride as a reference object (never
  * inlined into generated source), interpreted eval and codegen share
  * the [[BpeKernels]] implementation. */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), r) => m.put(a + " " + b, r) }
    m
  }

  override def nullSafeEval(input: Any): Any =
    BpeKernels.bpeEncode(input.asInstanceOf[ArrayData], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.text.BpeKernels.bpeEncode($c, $ranksRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeExpr =
    copy(child = newChild)
}
