package graft.text

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property tests for the round-8 operator families: randomized checks
  * of the structural claims behind HTML extraction, window packing and
  * chat parsing — shapes hand-picked fixtures miss. Batched: each
  * property runs a handful of Spark jobs over locally-generated
  * frames. */
class Round8PropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val words =
    Vector("the", "cat", "sat", "xyzzy", "of", "qq", "and", "lattice")

  test("stripTags: random markup leaves no live tag opens; text nodes survive in order") {
    val genPara = Gen.listOfN(4, Gen.oneOf(words)).map(_.mkString(" "))
    val genDoc = Gen.listOfN(5, genPara).map(_.zipWithIndex.map { case (p, i) =>
      val tag = Seq("p", "div", "li", "h2")(i % 4)
      s"<$tag class='c$i'>$p</$tag>"
    }.mkString(s"<script>var x = ${"1 < 2"};</script>", "<!-- c -->", "<br>"))
    val docs = Gen.listOfN(12, genDoc).sample.get.zipWithIndex
      .map { case (d, i) => (i.toLong, d) }
    val out = docs.toDF("id", "h")
      .select($"id", Html.stripTags($"h").as("t"))
      .as[(Long, String)].collect().toMap
    for ((id, html) <- docs) {
      val t = out(id)
      // no tag-shaped residue (a '<' may appear only via decoded
      // entities, which this generator never emits)
      assert(!t.matches("(?s).*<[a-zA-Z!/].*"), s"live tag in: $t")
      // every text node survives, in document order
      val nodes = "(?<=>)[a-z ]+(?=<)".r.findAllIn(html).map(_.trim)
        .filter(_.nonEmpty).toList
      val pos = nodes.map(t.indexOf(_: String))
      assert(pos.forall(_ >= 0), s"lost node in: $t")
      assert(pos == pos.sorted, s"order broken in: $t")
    }
  }

  test("packSegments/packWindows: random doc lengths tile exactly at any ctxLen") {
    val lens = Gen.listOfN(60, Gen.choose(0, 9)).sample.get
    val docs = lens.zipWithIndex.map { case (n, i) =>
      ((i + 1).toLong, (1 to n).map(j => s"w${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    for (ctx <- Seq(1, 3, 7)) {
      val segs = Packing.packSegments(docs, "doc_id", "text", ctx)
        .as[(Long, Long, Long, Long, Long)].collect()
      val total = lens.filter(_ > 0).map(_.toLong).sum
      assert(segs.map(_._5).sum == total, s"ctx=$ctx token conservation")
      // windows 0..last-1 hold exactly ctx tokens
      val byWin = segs.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
      val last = if (byWin.isEmpty) -1L else byWin.keys.max
      byWin.foreach { case (w, fill) =>
        if (w != last) assert(fill == ctx, s"ctx=$ctx window $w fill $fill")
      }
      // materialized windows agree with the segment map's arithmetic
      val win = Packing.packWindows(docs, "doc_id", "text", ctx)
        .as[(Long, Long, Long, String)].collect()
      assert(win.map(_._3).sum == total)
      win.foreach { case (w, _, n, txt) =>
        val k = if (txt.isEmpty) 0 else txt.split(" ").length
        assert(k == n, s"ctx=$ctx window $w text/count mismatch")
      }
    }
  }

  test("chat: parseTurns round-trips synthesized conversations verbatim") {
    val genContent = Gen.listOfN(3, Gen.oneOf(words)).map(_.mkString(" "))
    val genConv = Gen.listOfN(4, genContent).map { cs =>
      cs.zipWithIndex.map { case (c, i) =>
        val role = Seq("system", "user", "assistant", "user")(i)
        (role, c)
      }
    }
    val convs = Gen.listOfN(10, genConv).sample.get.zipWithIndex
      .map { case (turns, i) => (i.toLong, turns) }
    val docs = convs.map { case (id, turns) =>
      val ms = turns.map { case (r, c) =>
        s"""{"role":"$r","content":"$c"}""" }.mkString(",")
      (id, s"""{"messages":[$ms]}""")
    }.toDF("id", "js")
    val got = Chat.parseTurns(docs, "id", "js")
      .as[(Long, Long, String, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq)
      .toMap
    convs.foreach { case (id, turns) => assert(got(id) == turns) }
    // and every one of these is schema-valid (roles known, contents
    // nonempty, has user + assistant)
    val valid = docs.select(Chat.schemaValid($"js")).as[Boolean].collect()
    assert(valid.forall(identity))
  }
}
