package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Annotation/preference analytics: consensus + agreement, annotator
  * reliability, Cohen's and Fleiss' kappa against hand-computed
  * values, Bradley-Terry ratings against the closed-form 2-player
  * solution and invariance properties. */
class LabelsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def annots(rows: (Long, Long, Long)*) =
    rows.toDF("item", "annotator", "label")

  test("majorityVote picks the modal label, breaks ties low, reports agreement") {
    val df = annots(
      (1L, 1L, 0L), (1L, 2L, 0L), (1L, 3L, 1L),            // 2-1 for 0
      (2L, 1L, 2L), (2L, 2L, 1L),                          // 1-1 tie -> 1
      (3L, 1L, 1L), (3L, 2L, 1L), (3L, 3L, 1L), (3L, 4L, 1L))
    val got = Labels.majorityVote(df, "item", "annotator", "label")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 0L, 3L, 2L, 0.6667)))
    assert(got(2L)._2 == 1L && got(2L)._5 == 0.5)
    assert(got(3L) == ((3L, 1L, 4L, 4L, 1.0)))
  }

  test("majorityVote ignores duplicate (item, annotator) rows") {
    val df = annots((1L, 1L, 0L), (1L, 1L, 0L), (1L, 2L, 1L))
    val got = Labels.majorityVote(df, "item", "annotator", "label")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(got._3 == 2L, "dup annotator row must count once")
  }

  test("majorityVote handles STRING labels: modal label wins, ties break to the smallest string") {
    val df = Seq(
      (1L, 1L, "spam"), (1L, 2L, "spam"), (1L, 3L, "ham"),  // 2-1 spam
      (2L, 1L, "ham"), (2L, 2L, "spam"),                    // tie -> "ham"
      (3L, 1L, "ok"), (3L, 2L, "ok"))
      .toDF("item", "annotator", "label")
    val got = Labels.majorityVote(df, "item", "annotator", "label")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._2 == "spam" && got(1L)._5 == 0.6667)
    assert(got(2L)._2 == "ham", "string tie must break to smallest label")
    assert(got(3L)._2 == "ok" && got(3L)._5 == 1.0)
    // accuracy + kappa inherit the same base and must not throw on strings
    val acc = Labels.annotatorAccuracy(df, "item", "annotator", "label")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r._4).toMap
    assert(acc(1L) == 1.0 && acc(3L) == 0.0)
    assert(Labels.cohenKappa(df, "item", "annotator", "label").count() == 3)
  }

  test("conflicting re-annotations by one annotator resolve deterministically to the min label") {
    // annotator 1 labeled item 1 twice with different labels: the
    // smaller label ("a") must win on every run, so consensus is a 2-1
    // for "a" rather than depending on physical row order.
    val df = Seq(
      (1L, 1L, "b"), (1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "b"))
      .toDF("item", "annotator", "label")
    val got = Labels.majorityVote(df, "item", "annotator", "label")
      .as[(Long, String, Long, Long, Double)].collect().head
    assert(got._2 == "a" && got._3 == 3L && got._4 == 2L)
  }

  test("annotatorAccuracy scores each annotator against the consensus") {
    val df = annots(
      (1L, 1L, 0L), (1L, 2L, 0L), (1L, 3L, 1L),
      (2L, 1L, 2L), (2L, 2L, 2L), (2L, 3L, 2L))
    val got = Labels.annotatorAccuracy(df, "item", "annotator", "label")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 2L, 1.0)))
    assert(got(2L) == ((2L, 2L, 2L, 1.0)))
    assert(got(3L) == ((3L, 2L, 1L, 0.5)))
  }

  test("confusionMatrix localizes each annotator's errors") {
    val df = annots(
      (1L, 1L, 0L), (1L, 2L, 0L), (1L, 3L, 1L),   // consensus 0
      (2L, 1L, 2L), (2L, 2L, 2L), (2L, 3L, 2L))   // consensus 2
    val got = Labels.confusionMatrix(df, "item", "annotator", "label")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 0L, 0L, 1L), (1L, 2L, 2L, 1L),
      (2L, 0L, 0L, 1L), (2L, 2L, 2L, 1L),
      (3L, 0L, 1L, 1L), (3L, 2L, 2L, 1L)))
  }

  test("cohenKappa matches the hand-computed 2x2 case") {
    // classic example: 50 items, a/b agree on 20 yes + 15 no,
    // disagree 10 (a yes) + 5 (b yes): po=0.7, pe=0.5*0.6+0.5*0.4=0.5
    val rows =
      Seq.fill(20)((0L, 1L, 1L)) ++ Seq.fill(15)((0L, 0L, 0L)) ++
      Seq.fill(10)((0L, 1L, 0L)) ++ Seq.fill(5)((0L, 0L, 1L))
    val df = rows.zipWithIndex.flatMap { case ((_, la, lb), i) =>
      Seq((i.toLong, 1L, la), (i.toLong, 2L, lb))
    }.toDF("item", "annotator", "label")
    val got = Labels.cohenKappa(df, "item", "annotator", "label")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(got.length == 1)
    val (a, b, n, po, pe, kappa) = got.head
    assert((a, b, n) == ((1L, 2L, 50L)))
    assert(po == 0.7 && pe == 0.5 && kappa == 0.4)
  }

  test("cohenKappa emits one row per annotator pair, perfect agreement = 1") {
    val df = annots(
      (1L, 1L, 0L), (1L, 2L, 0L), (1L, 3L, 0L),
      (2L, 1L, 1L), (2L, 2L, 1L), (2L, 3L, 1L))
    val got = Labels.cohenKappa(df, "item", "annotator", "label")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(got.length == 3) // pairs (1,2) (1,3) (2,3)
    assert(got.forall(_._6 == 1.0))
  }

  test("cohenKappa keeps pairs with fully disjoint label usage (pe = 0, kappa = po)") {
    // annotators 1 and 2 never use a common label: pe has no shared
    // term and must be 0, not a silently dropped pair
    val df = annots((1L, 1L, 0L), (1L, 2L, 1L), (2L, 1L, 0L), (2L, 2L, 2L))
    val got = Labels.cohenKappa(df, "item", "annotator", "label")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(got.length == 1)
    assert(got.head == ((1L, 2L, 2L, 0.0, 0.0, 0.0)))
  }

  test("fleissKappa matches a hand-computed example and is 1 on unanimity") {
    // 4 items, 3 annotators each.
    // item1: 3x0 -> pi=1; item2: 2x0,1x1 -> pi=(5-3)/6=1/3
    // item3: 3x1 -> pi=1; item4: 1x0,2x1 -> pi=1/3
    // pbar = (1 + 1/3 + 1 + 1/3)/4 = 2/3
    // p0 = 6/12, p1 = 6/12 -> pe = 0.5 ; kappa = (2/3-1/2)/(1/2) = 1/3
    val df = annots(
      (1L, 1L, 0L), (1L, 2L, 0L), (1L, 3L, 0L),
      (2L, 1L, 0L), (2L, 2L, 0L), (2L, 3L, 1L),
      (3L, 1L, 1L), (3L, 2L, 1L), (3L, 3L, 1L),
      (4L, 1L, 0L), (4L, 2L, 1L), (4L, 3L, 1L))
    val got = Labels.fleissKappa(df, "item", "annotator", "label")
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(got._1 == 4L && got._2 == 2L)
    assert(got._3 == 0.666667 && got._4 == 0.5 && got._5 == 0.333333)
    val uni = Labels.fleissKappa(
      annots((1L, 1L, 2L), (1L, 2L, 2L), (2L, 1L, 0L), (2L, 2L, 0L)),
      "item", "annotator", "label")
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(uni._5 == 1.0)
  }

  test("fleissKappa drops single-annotation items from both pbar and pe") {
    val withSingleton = annots(
      (1L, 1L, 0L), (1L, 2L, 0L), (2L, 1L, 1L), (2L, 2L, 1L),
      (9L, 1L, 2L)) // item 9 has one annotation -> excluded
    val base = annots(
      (1L, 1L, 0L), (1L, 2L, 0L), (2L, 1L, 1L), (2L, 2L, 1L))
    val a = Labels.fleissKappa(withSingleton, "item", "annotator", "label")
      .as[(Long, Long, Double, Double, Double)].collect().head
    val b = Labels.fleissKappa(base, "item", "annotator", "label")
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(a == b)
  }

  test("krippendorffAlpha matches a hand-computed unequal-m example") {
    // u1: {0,0}  u2: {0,1}  u3: {1,1,1}  -> n=7
    // Do = (1/7) * [0 + (4-2)/1 + 0] = 2/7
    // n_0=3, n_1=4 -> De = (3*4 + 4*3)/(7*6) = 4/7 -> alpha = 0.5
    val df = annots(
      (1L, 1L, 0L), (1L, 2L, 0L),
      (2L, 1L, 0L), (2L, 2L, 1L),
      (3L, 1L, 1L), (3L, 2L, 1L), (3L, 3L, 1L))
    val got = Labels.krippendorffAlpha(df, "item", "annotator", "label")
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(got._1 == 3L && got._2 == 7L)
    assert(got._3 == 0.285714 && got._4 == 0.571429 && got._5 == 0.5)
  }

  test("krippendorffAlpha: perfect agreement = 1, single-annotation items excluded, constant labels -> null") {
    val perfect = Labels.krippendorffAlpha(
      annots((1L, 1L, 0L), (1L, 2L, 0L), (2L, 1L, 1L), (2L, 2L, 1L),
             (9L, 1L, 2L)), // singleton item excluded
      "item", "annotator", "label")
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(perfect._1 == 2L && perfect._2 == 4L && perfect._5 == 1.0)
    val constant = Labels.krippendorffAlpha(
      annots((1L, 1L, 0L), (1L, 2L, 0L)), "item", "annotator", "label")
      .select("alpha").collect().head
    assert(constant.isNullAt(0))
  }

  test("bradleyTerry matches the closed-form two-player solution") {
    // A beats B 3 times, B beats A once: MM fixed point has
    // pA/pB = 3 -> normalized pA = 0.75, pB = 0.25.
    val pairs = (Seq.fill(3)(("A", "B")) ++ Seq(("B", "A")))
      .toDF("winner", "loser")
    val got = Labels.bradleyTerry(pairs, "winner", "loser", iters = 30)
      .as[(String, Long, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("A")._2 == 3L && got("A")._3 == 4L)
    assert(got("B")._2 == 1L && got("B")._3 == 4L)
    assert(math.abs(got("A")._4 - 0.75) < 1e-4)
    assert(math.abs(got("B")._4 - 0.25) < 1e-4)
    assert(got("A")._5 == 1L && got("B")._5 == 2L)
  }

  test("bradleyTerry ranks a transitive tournament in order and excludes self-games") {
    // A>B x4, B>C x4, A>C x4 (+ 1 upset each to keep it connected
    // both ways), plus self-games that must be ignored.
    val pairs = (
      Seq.fill(4)(("A", "B")) ++ Seq.fill(4)(("B", "C")) ++
      Seq.fill(4)(("A", "C")) ++
      Seq(("B", "A"), ("C", "B"), ("C", "A"), ("A", "A"), ("C", "C"))
    ).toDF("winner", "loser")
    val got = Labels.bradleyTerry(pairs, "winner", "loser")
      .as[(String, Long, Long, Double, Long)].collect()
      .sortBy(_._5)
    assert(got.map(_._1).toSeq == Seq("A", "B", "C"))
    assert(got.map(_._4).sliding(2).forall(w => w(0) > w(1)))
    // self-games dropped: A played 4+1 vs B and 4+1 vs C
    assert(got.head._3 == 10L)
    // ratings normalized to ~1
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-4)
  }
}
