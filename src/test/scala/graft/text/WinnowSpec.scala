package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Winnowing fingerprints: the SIGMOD'03 guarantee (shared substrings
  * of length >= w+k-1 share a fingerprint), rightmost tie-break vs a
  * driver-side reference, density bounds, and the overlap report. */
class WinnowSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val K = 8
  private val W = 4

  /** Driver-side reference implementation (same hash prefix). */
  private def ref(text: String, k: Int = K, w: Int = W): Set[(Int, Long)] = {
    val t = text.toLowerCase.replaceAll("\\s+", " ").trim
    val p = t.length - k + 1
    if (p < 1) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = (0 until p).map { i =>
      val d = md.digest(t.substring(i, i + k).getBytes("UTF-8"))
      md.reset()
      java.lang.Long.parseLong(
        d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    val sel = scala.collection.mutable.Set[Int]()
    for (j <- 0 until math.max(1, p - w + 1)) {
      val end = math.min(j + w, p)
      var best = j
      for (m <- j + 1 until end) if (hs(m) <= hs(best)) best = m
      sel += best
    }
    sel.map(i => (i + 1, hs(i))).toSet
  }

  test("kernel matches the reference implementation on varied texts") {
    val texts = Seq(
      (1L, "The quick brown fox jumps over the lazy dog"),
      (2L, "aaaaaaaaaaaaaaaaaaaa"), // degenerate: all grams identical
      (3L, "short"), // < k chars -> no fingerprints
      (4L, "exactly8!"), // 2 grams < w -> one whole-text window
      (5L, "Spaces   collapse\tand CASE folds before hashing"))
    val got = Winnow.fingerprints(texts.toDF("doc_id", "text"), "doc_id", "text")
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(r => (r.getInt(1), r.getLong(2))).toSet }
    texts.foreach { case (id, t) =>
      assert(got.getOrElse(id, Set.empty) == ref(t), s"doc $id") }
  }

  test("winnowing guarantee: shared substring >= w+k-1 chars shares a fingerprint") {
    val shared = "unmistakable common passage here"
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta epsilon zeta"),
      (2L, s"completely different framing text then $shared and more"),
      // gibberish: shares no 8-char substring with docs 1/2 (a shared
      // SHORT gram can legitimately be selected on both sides — the
      // guarantee is one-directional)
      (3L, "zq xv jk wp mn bt lr dsfghjkl qwertyuiop zxcvbnm"))
      .toDF("doc_id", "text")
    val fp = Winnow.fingerprints(docs, "doc_id", "text")
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(2)).toSet }
    assert((fp(1L) intersect fp(2L)).nonEmpty)
    assert((fp(1L) intersect fp(3L)).isEmpty)
    assert((fp(2L) intersect fp(3L)).isEmpty)
  }

  test("density: at least one fingerprint per w-window, far fewer than grams") {
    val text = (1 to 60).map(i => s"w$i").mkString(" ")
    val norm = text.toLowerCase
    val p = norm.length - K + 1
    val n = Winnow.fingerprints(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text").count()
    assert(n >= (p.toDouble / W).floor.toLong / 2) // coverage lower bound
    assert(n < p) // winnowed well below one-per-gram
  }

  test("overlap report surfaces the shared-passage pair only") {
    val shared = "identical boilerplate disclaimer sentence repeated verbatim"
    val docs = Seq(
      (1L, s"doc one begins $shared and ends with its own words"),
      (2L, s"doc two disagrees entirely but quotes $shared near the end"),
      (3L, "doc three shares nothing at all with the other documents zz"))
      .toDF("doc_id", "text")
    val pairs = Winnow.overlap(docs, "doc_id", "text", minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.length == 1)
    assert(pairs.head._1 == 1L && pairs.head._2 == 2L && pairs.head._3 >= 2L)
  }

  test("boilerplate cap: a hash shared by too many docs stops pairing") {
    val boiler = "the exact same boilerplate footer text everywhere"
    // per-doc prefixes share no 8-char gram with each other, so every
    // shared hash is boilerplate shared by ALL six docs
    // distinct last letters too — the gram spanning "<prefix> the ex"
    // must differ per doc
    val uniq = Vector("kumquat orchard", "veldt grazing", "fjord iceboat",
      "zephyr quill", "mbira rhythm", "gnocchi plates")
    val docs = (1L to 6L).map(i => (i, s"${uniq(i.toInt - 1)} $boiler"))
      .toDF("doc_id", "text")
    // the boiler CORE is selected in all 6 docs; one boundary-adjacent
    // gram happens to be selected in 3 (selection near the prefix edge
    // depends on neighboring hashes) — cap 2 excludes both classes
    val capped = Winnow.overlap(docs, "doc_id", "text",
      minShared = 1, maxDocsPerHash = 2)
    assert(capped.count() == 0)
    val uncapped = Winnow.overlap(docs, "doc_id", "text",
      minShared = 1, maxDocsPerHash = 50)
    assert(uncapped.count() == 15) // all C(6,2) pairs share the footer
  }

  test("fingerprinting is shuffle-free: one kernel scan + one explode (plan guard)") {
    val docs = (1L to 30L).map(i => (i, s"document $i body text " * 3))
      .toDF("doc_id", "text")
    val plan = Winnow.fingerprints(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
  }
}
