package graft.io

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property test: arbitrary sheet matrices survive the write/read
  * round-trip cell-for-cell (as strings), including XML-special and
  * multibyte characters, sparse nulls and ragged rows. */
class XlsxPropertySpec extends AnyFunSuite {

  // cell text draws from XML-hostile and unicode alphabets; None = gap
  private val genCell: Gen[Option[String]] = Gen.frequency(
    3 -> Gen.const(None),
    5 -> Gen.nonEmptyListOf(Gen.alphaNumChar).map(cs => Some(cs.mkString)),
    4 -> Gen.nonEmptyListOf(Gen.oneOf(
      'a', '<', '>', '&', '"', '\'', ' ', 'é', '中', '€', ';', ','))
      .map(cs => Some(cs.mkString)),
    // XML-1.0-illegal control chars (scraped free text) must _xHHHH_-encode
    // on write and decode on read; a literal escape-lookalike must survive
    2 -> Gen.nonEmptyListOf(Gen.oneOf(
      ' ', '\u0000', '\u0001', '\u000B', '\u001F', 'a'))
      .map(cs => Some(cs.mkString)),
    1 -> Gen.const(Some("_x0041_ literal not an A")))

  private val genSheet: Gen[List[List[Option[String]]]] = for {
    nRows <- Gen.choose(1, 8)
    rows <- Gen.listOfN(nRows,
      Gen.choose(0, 6).flatMap(w => Gen.listOfN(w, genCell)))
  } yield rows

  test("write/read round-trip preserves every cell") {
    val dir = Files.createTempDirectory("graft_xlsx_prop_")
    var i = 0
    val prop = Prop.forAll(genSheet) { rows =>
      i += 1
      val path = dir.resolve(s"p$i.xlsx").toString
      Xlsx.write(path, Seq("s" -> rows.map(_.map(_.orNull))))
      val got = Xlsx.read(path)("s")
      // expected shape: trailing gaps truncate (width reaches the last
      // non-empty cell), interior gaps read back as ""
      val expected = rows.map { r =>
        val vals = r.map(_.getOrElse(""))
        val lastNonEmpty = vals.lastIndexWhere(_.nonEmpty)
        vals.take(lastNonEmpty + 1).toVector
      }.toVector
      got == expected
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(result.passed, result.status.toString)
  }
}
