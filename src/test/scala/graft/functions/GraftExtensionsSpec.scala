package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions hook: custom expressions usable from SQL. */
class GraftExtensionsSpec extends AnyFunSuite {

  // a dedicated session: extensions bind at session-creation time, so the
  // shared test session must not be returned by getOrCreate here
  private lazy val spark: SparkSession = {
    val shared = graft.SparkTestSession.spark // materialize the shared one first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // other suites keep using the shared session as default
    SparkSession.setDefaultSession(shared)
    s
  }

  test("simhash64 / rolling_hash / minhash callable from SQL") {
    import spark.implicits._
    Seq(("a b c d e"), ("a b c d e"), ("x y z w v"))
      .toDF("text").createOrReplaceTempView("docs")
    val rows = spark.sql(
      """SELECT simhash64(split(text, ' ')) AS sh,
                rolling_hash(text) AS rh,
                minhash(split(text, ' '), 2, 16) AS mh
         FROM docs""").collect()
    assert(rows(0).getLong(0) == rows(1).getLong(0)) // identical docs agree
    assert(rows(0).getLong(0) != rows(2).getLong(0))
    assert(rows(0).getLong(1) == rows(1).getLong(1))
    assert(rows(0).getSeq[Long](2).length == 16)
    assert(rows(0).getSeq[Long](2) == rows(1).getSeq[Long](2))
  }

  test("minhash rejects non-literal parameters") {
    import spark.implicits._
    Seq("a b").toDF("text").createOrReplaceTempView("docs2")
    val e = intercept[Exception](
      spark.sql("SELECT minhash(split(text,' '), length(text), 16) FROM docs2").collect())
    assert(e.getMessage.contains("integer literal"))
  }
}
