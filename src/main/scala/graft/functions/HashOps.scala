package graft.functions

import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** The evaluation kernels behind the custom text expressions, as static
  * methods so `doGenCode` can call them directly from generated Java
  * (a standalone Scala object emits static forwarders): whole-stage
  * codegen keeps the surrounding operator fused and pays one static
  * call per row instead of CodegenFallback's interpreted
  * Expression.eval dispatch. */
object HashOps {

  private final val B = -7046029254386353131L
  private val space = UTF8String.fromString(" ")

  def simhash64(arr: ArrayData): Long = {
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
    out
  }

  def minhashSignature(arr: ArrayData, numPerm: Int): ArrayData = {
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

  def minhashShingles(toks: ArrayData, shingleN: Int, numPerm: Int): ArrayData = {
    val n = toks.numElements()
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i + shingleN <= n) {
      val parts = new Array[UTF8String](shingleN)
      var j = 0
      var ok = true
      while (j < shingleN) {
        if (toks.isNullAt(i + j)) ok = false
        else parts(j) = toks.getUTF8String(i + j)
        j += 1
      }
      if (ok) {
        val shingle = UTF8String.concatWs(space, parts: _*)
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

  def wordShingles(toks: ArrayData, shingleN: Int): ArrayData = {
    val n = toks.numElements()
    val out = math.max(0, n - shingleN + 1)
    val res = new Array[Any](out)
    var i = 0
    while (i < out) {
      val parts = new Array[UTF8String](shingleN)
      var j = 0
      while (j < shingleN) {
        parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      res(i) = UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    new GenericArrayData(res)
  }

  /** LSH band hashes: the signature cut into `bands` bands of
    * `rowsPerBand` longs, each folded with an LCG-style polynomial mix
    * seeded by the band index. WRAPPING 64-bit arithmetic by intent —
    * as a Java kernel it is immune to spark.sql.ansi.enabled, which
    * would throw ARITHMETIC_OVERFLOW on the same fold written as SQL
    * aggregate/multiply (Spark 4 defaults ANSI on). */
  def lshBands(sig: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val out = new Array[Long](bands)
    val n = sig.numElements()
    var j = 0
    while (j < bands) {
      var acc = j.toLong + 1442695040888963407L
      var i = j * rowsPerBand
      val end = math.min(n, (j + 1) * rowsPerBand)
      while (i < end) {
        acc = acc * 6364136223846793005L + sig.getLong(i)
        i += 1
      }
      out(j) = acc
      j += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Unicode normalization via java.text.Normalizer. The form is passed
    * as its enum NAME so generated code stays a plain static call; the
    * valueOf lookup is cached by the JVM enum machinery. */
  def unicodeNormalize(s: UTF8String, form: String): UTF8String = {
    val str = s.toString
    val f = java.text.Normalizer.Form.valueOf(form)
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }

  /** Repair cp1252/UTF-8 double-encoding ("mojibake": UTF-8 bytes
    * misread as cp1252 once or twice — "Ã©" for "é"). The detector IS
    * the repair: re-encode the string as cp1252 (strict — any char
    * outside cp1252 aborts) and strictly decode the bytes as UTF-8; a
    * success that SHRINKS the string is accepted (real mojibake always
    * inflates, 2-4 chars per original), anything else returns the input
    * unchanged — plain ASCII round-trips to itself at equal length and
    * genuine "café" fails the strict UTF-8 decode, so both pass
    * through. Whole-string semantics (a document mixing mojibake with
    * chars outside cp1252 is left alone); up to two rounds for
    * double-encoded text. */
  def fixMojibake(s: UTF8String): UTF8String = {
    var cur = s.toString
    var rounds = 0
    var done = false
    var changed = false
    while (rounds < 2 && !done) {
      try {
        val bytes = java.nio.charset.Charset.forName("windows-1252")
          .newEncoder()
          .encode(java.nio.CharBuffer.wrap(cur))
        val decoded = java.nio.charset.StandardCharsets.UTF_8
          .newDecoder()
          .decode(bytes).toString
        if (decoded.length < cur.length) { cur = decoded; changed = true; rounds += 1 }
        else done = true
      } catch { case _: java.nio.charset.CharacterCodingException => done = true }
    }
    if (changed) UTF8String.fromString(cur) else s
  }

  def rollingHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    val P = 1000003L
    var h = 0L
    var pow = 1L
    var i = 0
    while (i < bytes.length) {
      h += (bytes(i) & 0xffL) * pow
      pow *= P
      i += 1
    }
    h
  }

  /** DEFLATE compression ratio of a string's UTF-8 bytes (level 6,
    * default strategy): compressed/raw, lower = more compressible.
    * Boilerplate and template spam compress far below natural prose —
    * the cheap repetition/quality signal several production corpus
    * filters cut on. Deterministic for a given zlib build (ships with
    * the JDK); empty input returns 1.0. */
  def deflateRatio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(6, false)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](1024)
      var compressed = 0L
      while (!d.finished()) compressed += d.deflate(buf)
      compressed.toDouble / raw.length
    } finally d.end()
  }

  /** Gopher repetition n-gram statistics (Rae et al. arXiv:2112.11446
    * App. A.1.1; the non-overlapping dup scan follows DataTrove's
    * find_all_duplicate) over a token array, one O(tokens) pass per
    * call:
    *
    *   [0] top: char mass of the most-repeated word n-gram — its
    *       SPACE-INCLUSIVE char length x occurrence count, 0 unless it
    *       occurs at least twice. The count>1 guard is a DELIBERATE
    *       deviation from DataTrove's find_top_duplicate (which scores
    *       a singleton most-frequent n-gram too) — see the known-
    *       deviations list in [[graft.text.TextOps.gopherRepetitionFlags]];
    *       kernel, oracle SQL and specs all apply it consistently;
    *   [1] dup: chars inside duplicated n-grams counted NON-overlapping:
    *       scan left to right, and on hitting an n-gram seen before, add
    *       its char length and jump n tokens (skipped positions are
    *       neither counted nor added to the seen set) — so the mass is
    *       bounded by the document's length, as the paper's thresholds
    *       assume.
    *
    * A kernel rather than a higher-order-function fold because the exact
    * skip-ahead scan is inherently sequential with a hash set — as a
    * Column expression it would be an O(tokens^2) growing-map aggregate,
    * and the sorted-run formulation it replaced could not express the
    * skip (it counted every overlapping repeat, inflating the stat past
    * the published thresholds). Char lengths are code points, matching
    * both Spark's and DuckDB's length(). */
  def ngramRepStats(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array(0L, 0L))
    val k = m - n + 1
    val grams = new Array[String](k)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < k) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        if (!toks.isNullAt(i + j)) sb.append(toks.getUTF8String(i + j).toString)
        j += 1
      }
      grams(i) = sb.toString
      i += 1
    }
    def chars(s: String): Long = s.codePointCount(0, s.length).toLong
    val counts = new java.util.HashMap[String, Integer](k * 2)
    i = 0
    while (i < k) {
      val c = counts.get(grams(i))
      counts.put(grams(i), if (c == null) 1 else c + 1)
      i += 1
    }
    var top = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue > 1) {
        val mass = chars(e.getKey) * e.getValue
        if (mass > top) top = mass
      }
    }
    val seen = new java.util.HashSet[String]()
    var dup = 0L
    i = 0
    while (i < k) {
      val g = grams(i)
      if (seen.contains(g)) { dup += chars(g); i += n }
      else { seen.add(g); i += 1 }
    }
    new GenericArrayData(Array(top, dup))
  }

  /** Clipped n-gram matches — the BLEU/ROUGE-N numerator (Papineni et
    * al. 2002 "modified n-gram precision"): each candidate n-gram
    * counts at most as often as it appears in the reference. One hash
    * map of reference n-grams, one decrementing sweep over candidate
    * n-grams — O(|cand| + |ref|) per row. Null tokens fold like
    * concat_ws (skipped inside the joined gram), matching
    * [[wordShingles]]. */
  def clippedNgramMatches(cand: ArrayData, ref: ArrayData, n: Int): Long = {
    val nc = cand.numElements() - n + 1
    val nr = ref.numElements() - n + 1
    if (nc <= 0 || nr <= 0) return 0L
    def gram(toks: ArrayData, i: Int): UTF8String = {
      if (n == 1) {
        if (toks.isNullAt(i)) UTF8String.EMPTY_UTF8 else toks.getUTF8String(i)
      } else {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) {
          parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
          j += 1
        }
        UTF8String.concatWs(space, parts: _*)
      }
    }
    val counts = new java.util.HashMap[UTF8String, Integer](nr * 2)
    var i = 0
    while (i < nr) {
      val g = gram(ref, i)
      val c = counts.get(g)
      counts.put(g, if (c == null) 1 else c + 1)
      i += 1
    }
    var m = 0L
    i = 0
    while (i < nc) {
      val g = gram(cand, i)
      val c = counts.get(g)
      if (c != null && c > 0) { m += 1; counts.put(g, c - 1) }
      i += 1
    }
    m
  }

  /** Winnowing fingerprints (Schleimer-Wilkerson-Aiken SIGMOD 2003 —
    * the MOSS scheme): hash every k-char gram of the text (60-bit
    * md5-prefix, so any SQL engine can replay it), then in each window
    * of `w` consecutive hashes select the minimum, rightmost on ties;
    * the distinct selected (pos, hash) pairs are the fingerprints.
    * Guarantee: any shared substring of length >= w + k - 1 shares a
    * fingerprint. Density ~ 2/(w+1). Texts with fewer than w grams
    * form one whole-text window. Returns array<struct<pos int,
    * hash long>> in position order. */
  def winnowFingerprints(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val p = s.length - k + 1
    if (p < 1) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val hashes = new Array[Long](p)
    var i = 0
    while (i < p) {
      val d = md.digest(s.substring(i, i + k).getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars = first 7.5 bytes, matching
      // CAST('0x' || substr(md5(g), 1, 15) AS UBIGINT) in SQL
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      hashes(i) = (h << 4) | ((d(7) & 0xf0L) >> 4)
      md.reset()
      i += 1
    }
    val nWin = math.max(1, p - w + 1)
    val selPos = new java.util.TreeSet[Integer]()
    var j = 0
    while (j < nWin) {
      val end = math.min(j + w, p)
      var best = j
      var m = j + 1
      while (m < end) { if (hashes(m) <= hashes(best)) best = m; m += 1 }
      selPos.add(best)
      j += 1
    }
    val out = new Array[Any](selPos.size())
    val it = selPos.iterator()
    i = 0
    while (it.hasNext) {
      val pos = it.next().intValue()
      out(i) = org.apache.spark.sql.catalyst.InternalRow(pos + 1, hashes(pos))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Longest common subsequence length of two token arrays — the
    * ROUGE-L kernel. Classic O(m*n) two-row DP as a tight loop; the
    * higher-order-function composition of the same DP is interpreted
    * per element and catastrophically slower on corpus-wide scans
    * (the MinHashSignature argument). Null tokens equal only null. */
  def lcsLength(a: ArrayData, b: ArrayData): Long = {
    val m = a.numElements(); val n = b.numElements()
    if (m == 0 || n == 0) return 0L
    val bs = new Array[UTF8String](n)
    var j = 0
    while (j < n) {
      bs(j) = if (b.isNullAt(j)) null else b.getUTF8String(j); j += 1
    }
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var i = 0
    while (i < m) {
      val ai = if (a.isNullAt(i)) null else a.getUTF8String(i)
      j = 0
      while (j < n) {
        val eq = if (ai == null) bs(j) == null else ai.equals(bs(j))
        cur(j + 1) = if (eq) prev(j) + 1
          else { val u = prev(j + 1); val l = cur(j); if (u >= l) u else l }
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(n).toLong
  }

  /** Sum over tokens of max(1, number of maximal `[aeiouy]+` runs) —
    * the Flesch vowel-group syllable estimate as ONE byte scan per
    * token. Byte-level run counting is exact for an ASCII char class:
    * every byte of a multi-byte UTF-8 char is >= 0x80 and so never
    * matches a vowel, hence maximal runs of vowel BYTES coincide with
    * maximal runs of vowel CHARS. Replaces
    * `aggregate(transform(toks, w -> size(regexp_extract_all(w,
    * "[aeiouy]+"))))` — an interpreted higher-order lambda running a
    * regex (and materializing its match array) per WORD, the data
    * card's dominant per-row cost. Null tokens contribute the same
    * min-1 as the regex form (size(null-safe extract over null) -> the
    * lambda yields greatest(..., 1)). */
  def syllableRunsSum(toks: ArrayData): Long = {
    val n = toks.numElements()
    var total = 0L
    var i = 0
    while (i < n) {
      var runs = 0L
      if (!toks.isNullAt(i)) {
        val b = toks.getUTF8String(i).getBytes
        var j = 0
        var inRun = false
        while (j < b.length) {
          val c = b(j)
          val v = c == 'a' || c == 'e' || c == 'i' || c == 'o' ||
            c == 'u' || c == 'y'
          if (v && !inRun) { runs += 1L; inRun = true }
          else if (!v) inRun = false
          j += 1
        }
      }
      total += (if (runs < 1L) 1L else runs)
      i += 1
    }
    total
  }

  /** Number of maximal `[.!?]+` runs in the text — the Flesch sentence
    * estimate as one byte scan (same ASCII-class argument as
    * [[syllableRunsSum]]). Replaces size(regexp_extract_all(text,
    * "[.!?]+")). */
  def sentenceRuns(text: UTF8String): Long = {
    val b = text.getBytes
    var runs = 0L
    var inRun = false
    var j = 0
    while (j < b.length) {
      val c = b(j)
      val v = c == '.' || c == '!' || c == '?'
      if (v && !inRun) { runs += 1L; inRun = true }
      else if (!v) inRun = false
      j += 1
    }
    runs
  }

  /** Count of non-overlapping matches of a PRECOMPILED regex — the
    * value regexp_count/size(regexp_extract_all(...)) computes (same
    * java.util.regex engine, same find() traversal), but Spark's
    * RegExpCount is RuntimeReplaceable sugar for the extract-all form
    * and materializes every matched substring into an array just to
    * take its size. Here the matcher only advances. */
  def regexpCountCompiled(text: UTF8String,
                          p: java.util.regex.Pattern): Long = {
    val m = p.matcher(text.toString)
    var n = 0L
    while (m.find()) n += 1L
    n
  }

  /** Membership probe of an array's elements against a PREBUILT hash set
    * (see [[TextExpressions]]' OverlapsConstSet): true iff any non-null
    * element is in the set. The set is built once per operator instance
    * by the expression, not per row — Spark's ArraysOverlap instead
    * rebuilds the smaller side's set on EVERY invocation, which makes a
    * row-local n-gram gate against a 10^4-gram benchmark O(rows x set)
    * in set construction alone. Null elements never match (the call
    * sites feed null-free arrays — wordShingles containsNull=false). */
  /** Count of positions where two long arrays agree — the MinHash
    * signature-agreement estimator's core. Value-identical to
    * aggregate(zip_with(a, b, (x, y) -> if(x = y, 1, 0)), 0, +):
    * zip_with pads the shorter side with nulls and a null comparison
    * contributes 0, so only the overlapping prefix's equal non-null
    * positions count. */
  def sigAgreement(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        c += 1L
      i += 1
    }
    c
  }

  def overlapsSet(arr: ArrayData,
                  set: java.util.HashSet[UTF8String]): Boolean = {
    if (set.isEmpty) return false
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) return true
      i += 1
    }
    false
  }
}
