package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** FIM splits and block span corruption: partition invariants,
  * determinism, reassembly, rate-by-construction, short-doc pass-
  * through. */
class CorruptionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "tiny"),
    (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi " +
      "omega one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen")) // 42 tokens
    .toDF("doc_id", "text")

  test("fimSplit: parts reassemble the text, cuts are in range, deterministic") {
    val rows = Corruption.fimSplit(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = rows(1L)
    val (c1, c2) = (r1.getLong(1), r1.getLong(2))
    val (p, m, s) = (r1.getString(3), r1.getString(4), r1.getString(5))
    val t = "the quick brown fox jumps over the lazy dog again and again"
    assert(p + m + s == t)
    assert(c1 >= 1 && c1 < c2 && c2 <= t.length - 1)
    assert(p.nonEmpty && m.nonEmpty && s.nonEmpty)
    assert(r1.getString(6) == s"<PRE>$p<SUF>$s<MID>$m")
    // layout invariance / determinism
    val again = Corruption.fimSplit(docs.repartition(7), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(6)).toMap
    assert(again(1L) == r1.getString(6))
  }

  test("fimSplit: short docs pass through unsplit") {
    val r = Corruption.fimSplit(docs, "doc_id", "text")
      .where($"doc_id" === 2L).head()
    assert(r.getString(3) == "tiny" && r.getString(4) == ""
      && r.getString(5) == "")
    assert(r.getString(6) == "<PRE>tiny<SUF><MID>")
  }

  test("spanCorrupt: rate by construction, sentinels align, spans recoverable") {
    val r = Corruption.spanCorrupt(docs, "doc_id", "text",
        blockSize = 10, spanLen = 3)
      .collect().map(x => x.getLong(0) -> x).toMap
    val d3 = r(3L) // 42 tokens -> 4 full blocks, 2 trailing unmasked
    assert(d3.getLong(1) == 42 && d3.getLong(2) == 12)
    val inputs = d3.getString(3).split(" ")
    val targets = d3.getString(4).split(" ")
    // 4 sentinels in inputs, in block order
    assert((0 to 3).forall(b => inputs.contains(s"<extra_id_$b>")))
    assert(inputs.length == 42 - 12 + 4)
    // targets: 4 groups of (sentinel + 3 tokens)
    assert(targets.length == 4 * 4)
    assert(targets(0) == "<extra_id_0>" && targets(4) == "<extra_id_1>")
    // reconstruct: replacing each sentinel in inputs with its target
    // span yields the original token stream
    val spans = targets.mkString(" ").split("<extra_id_\\d+> ?").filter(_.nonEmpty)
      .map(_.trim.split(" ").toSeq)
    val rebuilt = inputs.toSeq.flatMap { tok =>
      if (tok.startsWith("<extra_id_"))
        spans(tok.stripPrefix("<extra_id_").stripSuffix(">").toInt)
      else Seq(tok)
    }
    val origToks = docs.where($"doc_id" === 3L)
      .select(TextOps.tokens($"text")).head().getSeq[String](0)
    assert(rebuilt == origToks)
  }

  test("spanCorrupt: docs shorter than one block pass through") {
    val r = Corruption.spanCorrupt(docs, "doc_id", "text",
        blockSize = 10, spanLen = 3)
      .where($"doc_id" === 2L).head()
    assert(r.getLong(1) == 1 && r.getLong(2) == 0)
    assert(r.getString(3) == "tiny" && r.getString(4) == "")
  }

  test("spanCorrupt is deterministic across layouts") {
    val a = Corruption.spanCorrupt(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> (x.getString(3), x.getString(4))).toMap
    val b = Corruption.spanCorrupt(docs.repartition(5), "doc_id", "text")
      .collect().map(x => x.getLong(0) -> (x.getString(3), x.getString(4))).toMap
    assert(a == b)
  }

  test("both transforms are shuffle-free single projections (plan guard)") {
    val many = (1L to 40L).map(i =>
      (i, s"tok$i " + ("a b c d e f g h " * 4))).toDF("doc_id", "text")
    val fPlan = Corruption.fimSplit(many, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!fPlan.contains("Exchange"), fPlan.take(800))
    assert(!fPlan.contains("Generate"), fPlan.take(800))
    val sPlan = Corruption.spanCorrupt(many, "doc_id", "text",
        blockSize = 8, spanLen = 2)
      .queryExecution.executedPlan.toString
    assert(!sPlan.contains("Exchange"), sPlan.take(800))
  }
}
