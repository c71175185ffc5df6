package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Reshape / clean / window / projection operator contracts
  * (reference: tests/test_transformations.py, FIXTURES.md §3-§5). */
class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("melt: n_ids x n_value_cols records, values preserved") {
    val wide = Seq(("la", 1.0, 2.0), ("lb", 3.0, 4.0))
      .toDF("label", "2019", "2020")
    val long = Reshape.melt(wide, Seq("label"), Seq("2019", "2020"), "year", "value")
    assert(long.count() == 4)
    val la2020 = long.filter($"label" === "la" && $"year" === "2020")
      .select("value").as[Double].head()
    assert(la2020 == 2.0)
  }

  test("sheetUnion stamps the sheet name as a dimension") {
    val a = Seq(("x", 1.0)).toDF("label", "value")
    val b = Seq(("y", 2.0)).toDF("label", "value")
    val u = Reshape.sheetUnion(Seq("2019" -> a, "2020" -> b), "year")
    assert(u.select("year").as[String].collect().sorted.toSeq == Seq("2019", "2020"))
  }

  test("transposeSmall flips a ragged matrix with padding") {
    val m = Vector(Vector("h", "a", "b"), Vector("r1", "1"))
    assert(Reshape.transposeSmall(m) ==
      Vector(Vector("h", "r1"), Vector("a", "1"), Vector("b", "")))
  }

  test("note tags cleaned everywhere except label") {
    val df = Seq(("AA [note 1]", "BB [Note 22] x", 1.0))
      .toDF("label", "fuel", "value")
    val cleaned = Clean.cleanStringColumns(df)
    val row = cleaned.head()
    assert(row.getString(0) == "AA [note 1]") // label untouched
    assert(row.getString(1) == "BB  x")       // tag stripped + trimmed
  }

  test("numeric coercion: suppression symbols become null") {
    val df = Seq("1.5", "..", "-", "2").toDF("v")
    val got = df.select(Clean.coerceDouble($"v").as("d")).as[Option[Double]]
      .collect().toSeq
    assert(got == Seq(Some(1.5), None, None, Some(2.0)))
  }

  test("unit extraction from parentheses") {
    val df = Seq("Natural gas (GWh)").toDF("s")
    val r = df.select(Clean.unitFromParens($"s"), Clean.beforeParens($"s")).head()
    assert(r.getString(0) == "GWh" && r.getString(1) == "Natural gas")
  }

  test("ffill carries last non-null down the partition with default head") {
    val df = Seq(
      ("u", 1, None: Option[Double]), ("u", 2, Some(5.0)),
      ("u", 3, None), ("u", 4, None), ("v", 1, None))
      .toDF("k", "ord", "v")
    val got = Windows.ffill(df, "v", Seq("k"), Seq("ord"), Some(lit(-1.0)))
      .orderBy("k", "ord").select("v").as[Double].collect().toSeq
    assert(got == Seq(-1.0, 5.0, 5.0, 5.0, -1.0))
  }

  test("latestPerGroup keeps exactly the max-order row per key") {
    val df = Seq(("a", 1, "old"), ("a", 2, "new"), ("b", 9, "only"))
      .toDF("k", "ver", "payload")
    val got = Windows.latestPerGroup(df, Seq("k"), Seq(col("ver")))
      .select("k", "payload").as[(String, String)].collect().toSet
    assert(got == Set(("a", "new"), ("b", "only")))
  }

  test("keyset pagination: cursor exclusive, ordered, limited") {
    val df = (1 to 100).toDF("id")
    val page = Windows.keysetPage(df, "id", Some(40L), 10)
      .select("id").as[Int].collect().toSeq
    assert(page == (41 to 50))
  }

  test("dropAllNullColumns prunes only fully-null columns") {
    val df = Seq((1, None: Option[String], Some("x")), (2, None, None))
      .toDF("id", "empty", "sparse")
    assert(Projection.dropAllNullColumns(df).columns.toSeq == Seq("id", "sparse"))
  }

  test("saltedJoin equals the plain join for inner and left, including unmatched rows") {
    import spark.implicits._
    val fact = Seq((1L, "a", 10.0), (1L, "b", 20.0), (2L, "c", 30.0), (9L, "d", 40.0))
      .toDF("k", "tag", "v")
    val dim = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("k", "name")
    for (jt <- Seq("inner", "left")) {
      val got = Skew.saltedJoin(fact, dim, "k", saltFrom = col("tag"),
          saltBuckets = 4, joinType = jt)
        .select("k", "tag", "v", "name")
        .as[(Long, String, Double, Option[String])].collect().toSet
      val want = fact.join(dim, Seq("k"), jt)
        .select("k", "tag", "v", "name")
        .as[(Long, String, Double, Option[String])].collect().toSet
      assert(got == want, s"joinType=$jt")
    }
  }

  test("saltedJoin spreads a hot key over multiple salt buckets") {
    import spark.implicits._
    // 100 rows of one hot key: the salt derived from row identity must
    // split them across buckets — that is the entire point
    val fact = (0 until 100).map(i => (1L, s"row$i")).toDF("k", "rid")
    val dim = Seq((1L, "one")).toDF("k", "name")
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col("rid")), lit(8L)))
    val nBuckets = salted.select("__salt").distinct().count()
    assert(nBuckets > 4, s"hot key landed in only $nBuckets/8 buckets")
    // and the join result is still exactly 100 rows
    assert(Skew.saltedJoin(fact, dim, "k", col("rid"), 8).count() == 100L)
  }

  test("topKPerGroup: exactly k per group under the total order, plans WindowGroupLimit") {
    import spark.implicits._
    // spark.range-based frame so ConvertToLocalRelation can't fold the
    // window away (plan-shape assertions need an executed-plan shape)
    val df = spark.range(100)
      .select((col("id") % 4).as("g"), col("id").as("v"))
    val got = Windows.topKPerGroup(df, Seq("g"), Seq(col("v").desc), k = 3)
      .as[(Long, Long)].collect().toSet
    val want = (0L to 3L).flatMap(g =>
      (0L until 100L).filter(_ % 4 == g).sortBy(-_).take(3).map(g -> _)).toSet
    assert(got == want)
    // the map-side partial limit must be in the physical plan: without
    // it every row shuffles and the "top-k before exchange" claim is false
    val plan = Windows.topKPerGroup(df, Seq("g"), Seq(col("v").desc), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
    intercept[IllegalArgumentException] {
      Windows.topKPerGroup(df, Seq("g"), Seq(col("v")), k = 0)
    }
  }

  test("rollingAgg: RANGE frame over gaps and ties, per key") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 10.0), ("a", 5L, 20.0), ("a", 6L, 30.0), ("a", 20L, 40.0),
      ("b", 2L, 1.0), ("b", 2L, 3.0))  // tie: both rows see both values
      .toDF("k", "t", "v")
    val got = Windows.rollingAgg(df, Seq("k"), "t", "v", lookback = 5)
      .select("k", "t", "rolling_sum", "rolling_n")
      .as[(String, Long, Double, Long)].collect().toSet
    assert(got == Set(
      ("a", 1L, 10.0, 1L), ("a", 5L, 30.0, 2L),
      ("a", 6L, 60.0, 3L), ("a", 20L, 40.0, 1L),
      ("b", 2L, 4.0, 2L), ("b", 2L, 4.0, 2L)))
  }

  test("saltedJoin rejects join types whose semantics replication would break") {
    val df = Seq((1L, "x")).toDF("k", "a")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(df, df, "k", col("a"), 4, joinType = "full_outer")
    }
  }
}
