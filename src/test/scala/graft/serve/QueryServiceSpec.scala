package graft.serve

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.store.Store

/** End-to-end query lifecycle (reference: facade.py:112-164,
  * app.py:42-185; the §7.2 minimum slice). */
class QueryServiceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val service: QueryService = {
    val root = Files.createTempDirectory("graft_qs_").toString
    val st = new Store(spark, root, "dukes")
    st.initialize()
    val df = Seq(
      (0, "Coal", 2019, "Gas", Some(1.0), None: Option[String]),
      (1, "Coal", 2020, "Gas", Some(2.0), None),
      (2, "Oil", 2020, "Coal", Some(3.0), None),
      (3, "Oil", 2021, "coal", None, None))
      .toDF("row", "label", "year", "fuel", "value", "sector")
    st.ingest(df, "1.1", ingestTs = Timestamp.valueOf("2026-01-01 00:00:00"))
    st.stage()
    new QueryService(spark, st)
  }

  test("filters + mandatory table predicate + service/all-null column drop") {
    val page = service.query("1.1",
      """{"year": {"gte": 2020}, "fuel": {"like": "%coal%"}}""")
    val rows = page.data.collect()
    assert(rows.length == 2)
    // service columns and the all-null 'sector' dimension are hidden
    assert(!page.data.columns.contains("ingest_id"))
    assert(!page.data.columns.contains("row_uid"))
    assert(!page.data.columns.contains("sector"))
    assert(page.nextCursor.isEmpty)
  }

  test("keyset pagination pages in row_uid order with a cursor") {
    val p1 = service.query("1.1", "{}", limit = 2)
    assert(p1.data.count() == 2 && p1.nextCursor.isDefined)
    val p2 = service.query("1.1", "{}", limit = 2, cursor = p1.nextCursor)
    assert(p2.data.count() == 2)
    val all = p1.data.select("row").as[Int].collect().toSet ++
      p2.data.select("row").as[Int].collect().toSet
    assert(all == Set(0, 1, 2, 3))
  }

  test("queries see fresh data after a re-stage (no stale file listing)") {
    val root = Files.createTempDirectory("graft_qs_restage_").toString
    val st = new Store(spark, root, "dukes")
    st.initialize()
    val f = new Facade(spark, root, "dukes")
    def frame(v: Double) = Seq((0, "Coal", 2019, "Gas", Some(v)))
      .toDF("row", "label", "year", "fuel", "value")
    st.ingest(frame(1.0), "1.1", ingestTs = Timestamp.valueOf("2026-01-01 00:00:00"))
    f.stage()
    assert(f.query("1.1").data.select("value").collect().head.getDouble(0) == 1.0)
    st.ingest(frame(2.0), "1.1", ingestTs = Timestamp.valueOf("2026-01-02 00:00:00"))
    f.stage()
    assert(f.query("1.1").data.select("value").collect().head.getDouble(0) == 2.0)
  }

  test("column projection narrows the page, filters still see all columns") {
    val page = service.query("1.1", """{"fuel": "gas", "year": {"gte": 2020}}""",
      cols = Some(Seq("label", "year")))
    assert(page.data.columns.contains("label"))
    assert(!page.data.columns.contains("fuel"))
    assert(page.data.count() == 1) // only (Coal, 2020, Gas) passes both filters
    intercept[IllegalArgumentException](
      service.query("1.1", "{}", cols = Some(Seq("nope"))))
  }

  test("unknown table rejected") {
    val e = intercept[IllegalArgumentException](service.query("9.9"))
    assert(e.getMessage.contains("not staged"))
  }

  test("filter on an unknown column rejected") {
    intercept[graft.dsl.FilterDsl.DslException](
      service.query("1.1", """{"bogus": 1}"""))
  }
}
