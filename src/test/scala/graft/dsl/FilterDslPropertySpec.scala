package graft.dsl

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.dsl.FilterDsl._

/** Property tests (raw ScalaCheck runner — the scalatest bridge artifact
  * is not in the offline cache): the DSL compiler agrees with a direct
  * in-memory evaluator on arbitrary generated filters. */
case class DslPropRec(year: Int, fuel: String, value: Double)

class FilterDslPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private type Rec = DslPropRec
  private val Rec = DslPropRec
  private val data: Seq[Rec] = for {
    y <- 2018 to 2022
    f <- Seq("Gas", "gas", "Coal", "Oil", "Wind")
  } yield Rec(y, f, y * 10.0 + f.length)

  private lazy val df = data.toDF()

  private val genOp: Gen[Op] = Gen.oneOf(Eq, Neq, Lt, Lte, Gt, Gte)
  private val genYearFilter: Gen[FieldFilter] = for {
    op <- genOp; v <- Gen.choose(2017L, 2023L)
  } yield FieldFilter("year", op, v)
  private val genFuelFilter: Gen[FieldFilter] = for {
    op <- Gen.oneOf[Op](Eq, Neq, Like)
    v <- Gen.oneOf("Gas", "coal", "OIL", "W%", "%a%")
  } yield FieldFilter("fuel", op, if (op == Like) v else v.replace("%", ""))
  private val genGroup: Gen[Group] = for {
    n <- Gen.choose(0, 3)
    fs <- Gen.listOfN(n, Gen.oneOf(genYearFilter, genFuelFilter))
  } yield Group(fs.toVector)
  private val genQuery: Gen[FilterQuery] = for {
    base <- genGroup
    nOrs <- Gen.choose(0, 2)
    ors <- Gen.listOfN(nOrs, genGroup)
  } yield FilterQuery(base, ors.toVector.filter(_.fields.nonEmpty))

  /** Reference evaluator mirroring the documented semantics. */
  private def evalField(r: Rec, f: FieldFilter): Boolean = {
    def cmpYear(op: Op, v: Long): Boolean = op match {
      case Eq => r.year == v; case Neq => r.year != v
      case Lt => r.year < v; case Lte => r.year <= v
      case Gt => r.year > v; case Gte => r.year >= v
      case _ => false
    }
    def cmpFuel(op: Op, v: String): Boolean = {
      val a = r.fuel.toLowerCase; val b = v.toLowerCase
      op match {
        case Eq => a == b; case Neq => a != b
        case Like =>
          val re = java.util.regex.Pattern.quote(b).replace("%", "\\E.*\\Q")
          a.matches(re)
        case Lt => a < b; case Lte => a <= b; case Gt => a > b; case Gte => a >= b
      }
    }
    f.column match {
      case "year" => cmpYear(f.op, f.value.asInstanceOf[Long])
      case "fuel" => cmpFuel(f.op, f.value.asInstanceOf[String])
      case _ => false
    }
  }
  private def evalQuery(r: Rec, q: FilterQuery): Boolean = {
    val base = q.base.fields.forall(evalField(r, _))
    val ors = q.ors.isEmpty || q.ors.exists(_.fields.forall(evalField(r, _)))
    base && ors
  }

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("compiled Column predicate agrees with the reference evaluator") {
    check(Prop.forAll(genQuery) { q =>
      val validated = validate(q, df.schema)
      val got = df.where(compile(validated, df.schema))
        .select("year", "fuel", "value").as[(Int, String, Double)]
        .collect().toSet
      val expected = data.filter(evalQuery(_, q))
        .map(r => (r.year, r.fuel, r.value)).toSet
      got == expected
    }, n = 40)
  }

  test("parse -> normalize handles arbitrary flat json filters") {
    val genJson = for {
      y <- Gen.choose(2000, 2030)
      f <- Gen.alphaStr.map(_.take(8))
    } yield s"""{"year": $y, "fuel": ${"\"" + f + "\""}}"""
    check(Prop.forAll(genJson) { js =>
      val q = parseJson(js)
      q.base.fields.length == 2 && q.base.fields.forall(_.op == Eq)
    }, n = 20)
  }
}
