package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // separable corpora: "reference" docs draw from one vocabulary,
  // "crawl" docs from another, with a shared filler token
  private def doc(vocab: Seq[String], seed: Long): String =
    (0 until 12).map(j => vocab(((seed * 31 + j * 5) % vocab.size).toInt.abs))
      .mkString(" ")
  private val goodVocab = Seq("theorem", "analysis", "method", "result",
    "evidence", "study", "common")
  private val junkVocab = Seq("click", "winner", "free", "casino",
    "pills", "prize", "common")

  private lazy val pos = (0L until 200L).map(i => (i, doc(goodVocab, i)))
    .toDF("doc_id", "text")
  private lazy val neg = (0L until 200L).map(i => (i + 1000L, doc(junkVocab, i)))
    .toDF("doc_id", "text")

  test("train/score separates held-out reference from crawl docs") {
    val model = QualityClassifier.train(
      pos.where($"doc_id" < 150), neg.where($"doc_id" < 1150),
      "doc_id", "text", dim = 1 << 12, epochs = 10)
    val heldOut = pos.where($"doc_id" >= 150).union(neg.where($"doc_id" >= 1150))
    val scored = QualityClassifier.score(heldOut, "doc_id", "text", model)
      .as[(Long, Double)].collect()
    val (p, n) = scored.partition(_._1 < 1000L)
    assert(p.length == 50 && n.length == 50)
    // hard separation on held-out synthetic data
    assert(p.map(_._2).min > 0.5, s"worst positive ${p.map(_._2).min}")
    assert(n.map(_._2).max < 0.5, s"best negative ${n.map(_._2).max}")
  }

  test("training is deterministic: same inputs, bit-identical weights") {
    def m = QualityClassifier.train(pos, neg, "doc_id", "text",
      dim = 1 << 10, epochs = 3)
    val (a, b) = (m, m)
    assert(a.bias == b.bias)
    assert(java.util.Arrays.equals(a.weights, b.weights))
    // and invariant to input partitioning (collect is id-ordered)
    val c = QualityClassifier.train(pos.repartition(7), neg.repartition(5),
      "doc_id", "text", dim = 1 << 10, epochs = 3)
    assert(java.util.Arrays.equals(a.weights, c.weights) && a.bias == c.bias)
  }

  test("scoring is a shuffle-free codegen projection") {
    val model = QualityClassifier.train(pos.limit(20), neg.limit(20),
      "doc_id", "text", dim = 1 << 8, epochs = 1)
    val scored = QualityClassifier.score(
      spark.range(100).select(col("id").as("doc_id"),
        concat(lit("theorem study common "), col("id")).as("text")),
      "doc_id", "text", model)
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1000))
    // "*(1)" marks the whole-stage-codegen span: the margin expression
    // must NOT fall back to interpreted eval
    assert(plan.contains("*(1) Project"), plan.take(1000))
    // empty docs score sigmoid(bias), not NaN
    val empty = QualityClassifier.score(
      Seq((1L, "")).toDF("doc_id", "text"), "doc_id", "text", model)
      .as[(Long, Double)].head()
    assert(!empty._2.isNaN)
  }

  test("maxTrainDocs guards against corpus-scale collects") {
    intercept[IllegalArgumentException] {
      QualityClassifier.train(pos, neg, "doc_id", "text",
        dim = 1 << 8, maxTrainDocs = 10)
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.train(pos.where(lit(false)), neg,
        "doc_id", "text", dim = 1 << 8)
    }
  }
}
