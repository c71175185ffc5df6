package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 optimization kernels must be VALUE-IDENTICAL to the built-in
  * expression forms they replaced — each test evaluates both forms over
  * adversarial rows (unicode, empties, boundary runs) and asserts
  * equality row by row. A kernel that drifts from its regex twin would
  * silently change oracle-gated outputs, so these are the guard. */
class KernelEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private val texts = Seq(
    "The quick brown fox. Jumps!! Over?? the lazy dog...",
    "",
    "   ",
    "no sentence punctuation here",
    "a e i o u y aeiouy bcdfg",
    "café naïve déjà-vu ÆON æon Ωmega",                  // multi-byte chars
    "y", "Y", "xyzzy", "rhythm", "AEIOUY upper vowels", // case sensitivity
    "dots.everywhere.but.no.runs",
    "multi!?.!runs?.!in.a!row",
    "Contact a@b.co or http://x.y/z?a=1 from 10.0.0.1 call +1 (555) 123-4567",
    "emails a@b.co c@d.ef overlap http://u.v a@b.co",
    "日本語テキスト with mixed ascii vowels aei",
    "tab\tand\nnewline\nseparated tokens")

  test("syllable_runs_sum == aggregate(transform(w, greatest(size(regexp_extract_all([aeiouy]+)), 1)))") {
    val df = texts.toDF("text")
    val w = graft.text.TextOps.tokens(col("text"))
    val rows = df.select(
      TextExpressions.syllable_runs_sum(w).as("kernel"),
      aggregate(transform(w,
          x => greatest(size(regexp_extract_all(x, lit("[aeiouy]+"), lit(0))), lit(1))),
        lit(0L), (acc, x) => acc + x.cast("long")).as("regex")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("sentence_runs == size(regexp_extract_all([.!?]+))") {
    val rows = texts.toDF("text").select(
      TextExpressions.sentence_runs(col("text")).as("kernel"),
      size(regexp_extract_all(col("text"), lit("[.!?]+"), lit(0)))
        .cast("long").as("regex")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("regex_count == size(regexp_extract_all) for every PII pattern and the anchor pattern") {
    import graft.text.TextOps
    val pats = Seq(TextOps.urlPattern, TextOps.emailPattern,
      TextOps.ipv4Pattern, TextOps.phonePattern, "(?i)<a\\b")
    val df = (texts :+ "<A href=x><a><p><a  ></a>").toDF("text")
    pats.foreach { p =>
      val rows = df.select(
        TextExpressions.regex_count(col("text"), p).as("kernel"),
        size(regexp_extract_all(col("text"), lit(p), lit(0)))
          .cast("long").as("regex")).collect()
      rows.foreach(r => assert(r.getLong(0) == r.getLong(1), s"$p: $r"))
    }
    // NULL text: the two forms DIVERGE by design, pinned here so the
    // difference stays documented instead of latent. regex_count is
    // null-in/null-out (a count of matches in no string is undefined);
    // the builtin under this engine's legacy sizeOfNull (ansi off)
    // answers size(NULL) = -1 — a sentinel that silently SUBTRACTED
    // from every sum() it rode into (DataCard pii_sum added -1 per
    // pattern per null-text row), where null is simply dropped by
    // sum(). No oracled dataset carries null text (the r15 kernel swap
    // passed hash-identical), so this pins semantics, not results.
    val nullRow = Seq((null: String)).toDF("text").select(
      TextExpressions.regex_count(col("text"), pats.head).as("kernel"),
      size(regexp_extract_all(col("text"), lit(pats.head), lit(0)))
        .cast("long").as("regex")).collect().head
    assert(nullRow.isNullAt(0), "regex_count(NULL) must be NULL")
    assert(nullRow.getLong(1) == -1L,
      "builtin size(regexp_extract_all(NULL)) is -1 under legacy sizeOfNull")
  }

  test("sig_agreement == aggregate(zip_with(a, b, (x,y) -> if(x=y,1,0)), 0, +)") {
    // equal-length signatures (the MinHash case), unequal lengths
    // (zip_with pads with nulls -> count 0 on the tail), empties, and
    // arrays with null ELEMENTS (null comparison contributes 0)
    val rows = Seq(
      (Seq[java.lang.Long](1L, 2L, 3L, 4L), Seq[java.lang.Long](1L, 9L, 3L, 4L)),
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](1L, 2L, 3L)),
      (Seq[java.lang.Long](), Seq[java.lang.Long](5L)),
      (Seq[java.lang.Long](null, 7L, null), Seq[java.lang.Long](null, 7L, 8L)),
      (Seq[java.lang.Long](Long.MaxValue, Long.MinValue),
        Seq[java.lang.Long](Long.MaxValue, Long.MinValue)))
      .toDF("a", "b")
    val got = rows.select(
      TextExpressions.sig_agreement(col("a"), col("b")).as("kernel"),
      aggregate(zip_with(col("a"), col("b"),
          (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).cast("long").as("builtin")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("overlaps_const_set == arrays_overlap against the same null-free literal") {
    val grams = Seq("quick brown fox", "lazy dog end", "no match gram",
      "café naïve déjà-vu")
    val df = texts.toDF("text")
    val docGrams = graft.text.TextOps.wordShingles(
      graft.text.TextOps.tokens(col("text")), 3)
    val rows = df.select(
      TextExpressions.overlaps_const_set(docGrams, grams).as("kernel"),
      arrays_overlap(docGrams, typedlit(grams)).as("builtin")).collect()
    rows.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1), r.toString))
    // empty literal set: arrays_overlap(x, []) is false — kernel agrees
    val e = df.select(
      TextExpressions.overlaps_const_set(docGrams, Seq.empty).as("kernel"))
      .collect()
    e.foreach(r => assert(!r.getBoolean(0)))
    // null text -> null through both forms
    val n = Seq((null: String)).toDF("text").select(
      TextExpressions.overlaps_const_set(graft.text.TextOps.wordShingles(
        graft.text.TextOps.tokens(col("text")), 3), grams).as("k")).collect()
    assert(n.head.isNullAt(0))
  }

  test("verify-stage union arithmetic: |A|+|B|-|A∩B| == size(array_union) on distinct arrays") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a"), Seq("a")),
      (Seq("a", "b"), Seq("c", "d")),
      (Seq.empty[String], Seq("x")),
      (Seq.empty[String], Seq.empty[String])).toDF("a", "b")
    val rows = df.select(
      (size(col("a")) + size(col("b")) -
        size(array_intersect(col("a"), col("b")))).as("arith"),
      size(array_union(col("a"), col("b"))).as("builtin")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }
}
