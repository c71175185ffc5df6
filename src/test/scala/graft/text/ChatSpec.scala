package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class ChatSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val good =
    """{"messages":[{"role":"system","content":"be brief"},
      {"role":"user","content":"what is spark"},
      {"role":"assistant","content":"a distributed engine"}]}"""
  private val badRole =
    """{"messages":[{"role":"user","content":"hi"},{"role":"bot","content":"yo"}]}"""
  private val emptyContent =
    """{"messages":[{"role":"user","content":"hi"},{"role":"assistant","content":""}]}"""
  private val noAssistant =
    """{"messages":[{"role":"system","content":"x"},{"role":"user","content":"hi"}]}"""
  private val oneTurn = """{"messages":[{"role":"user","content":"hi"}]}"""
  private val malformed = """{"messages": [{"role": "user", "#"""

  test("parseTurns: typed rows in order; malformed JSON yields no rows") {
    val docs = Seq((1L, good), (2L, malformed)).toDF("id", "js")
    val got = Chat.parseTurns(docs, "id", "js")
      .as[(Long, Long, String, String)].collect().sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      (1L, 0L, "system", "be brief"),
      (1L, 1L, "user", "what is spark"),
      (1L, 2L, "assistant", "a distributed engine")))
  }

  test("schemaValid: each contract clause has a dedicated negative") {
    val docs = Seq(good, badRole, emptyContent, noAssistant, oneTurn, malformed)
      .zipWithIndex.map { case (j, i) => (i.toLong, j) }.toDF("id", "js")
    val got = docs.select($"id", Chat.schemaValid($"js").as("v"))
      .as[(Long, Boolean)].collect().toMap
    assert(got(0L))            // good
    assert(!got(1L))           // unknown role
    assert(!got(2L))           // empty assistant content
    assert(!got(3L))           // no assistant turn
    assert(!got(4L))           // single turn
    assert(!got(5L))           // malformed JSON
  }

  test("stats: counts, whitespace tokens, malformed reports zeros") {
    val docs = Seq((1L, good), (2L, malformed)).toDF("id", "js")
    val got = Chat.stats(docs, "id", "js")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 1L, 1L, 8L, true))) // 2 + 3 + 3 tokens
    assert(got(2L) == ((2L, 0L, 0L, 0L, 0L, false)))
  }

  test("stats/render: a turn with null content counts 0 tokens and keeps its role marker") {
    // real transcripts ship turns missing the content key; size(split(NULL))
    // is -1 under Spark's default sizeOfNull — must not decrement n_tokens
    val nullContent = """{"messages":[{"role":"user","content":"two words"},
      {"role":"assistant"}]}"""
    val docs = Seq((1L, nullContent)).toDF("id", "js")
    val st = Chat.stats(docs, "id", "js")
      .as[(Long, Long, Long, Long, Long, Boolean)].head()
    assert(st == ((1L, 2L, 1L, 1L, 2L, false))) // 2 tokens, not 1; invalid
    val r = docs.select(Chat.render($"js")).as[String].head()
    assert(r == "<|user|>two words<|assistant|>") // marker survives
  }

  test("render: role-tagged flattening in order; malformed renders empty") {
    val docs = Seq((1L, good), (2L, malformed)).toDF("id", "js")
    val got = docs.select($"id", Chat.render($"js").as("r"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "<|system|>be brief<|user|>what is spark" +
      "<|assistant|>a distributed engine")
    assert(got(2L) == "")
  }

  test("chat ops are shuffle-free projections (explode only where asked)") {
    val docs = (1L to 40L).map(i => (i, good)).toDF("id", "js")
    val statsPlan = Chat.stats(docs, "id", "js")
      .queryExecution.executedPlan.toString
    assert(!statsPlan.contains("Exchange"), statsPlan)
    assert(!statsPlan.contains("Generate"), statsPlan)
    val renderPlan = docs.select(Chat.render($"js"))
      .queryExecution.executedPlan.toString
    assert(!renderPlan.contains("Exchange"), renderPlan)
  }
}
