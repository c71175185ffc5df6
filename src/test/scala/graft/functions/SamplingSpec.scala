package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bottom-k sample is bounded, deterministic, partition-invariant") {
    val df = (1 to 1000).map(i => s"v$i").toDF("s")
    def sample(parts: Int): Seq[String] =
      df.repartition(parts)
        .agg(Sampling.bottomKSample($"s", 5).as("smp"))
        .as[Seq[String]].head()
    val one = sample(1)
    assert(one.length == 5)
    assert(sample(7) == one)   // merge order does not matter
    assert(sample(13) == one)
    assert(one.forall(_.startsWith("v")))
  }

  test("groups smaller than k return all distinct values") {
    val df = Seq(("a", "x"), ("a", "y"), ("a", "x"), ("b", "z"))
      .toDF("g", "s")
    val got = df.groupBy($"g")
      .agg(Sampling.bottomKSample($"s", 10).as("smp"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("a").toSet == Set("x", "y"))
    assert(got("b") == Seq("z"))
  }

  test("stratified sample: k per stratum, partition-invariant, nested in k") {
    val df = (1 to 300).map(i => (s"s${i % 3}", i.toLong)).toDF("g", "id")
    def ids(parts: Int, k: Int): Set[Long] =
      Sampling.stratifiedSample(df.repartition(parts), Seq("g"), "id", k)
        .select("id").as[Long].collect().toSet
    val k5 = ids(1, 5)
    assert(k5.size == 15)                       // 5 per each of 3 strata
    assert(ids(11, 5) == k5)                    // layout-independent
    val k8 = ids(4, 8)
    assert(k8.size == 24 && k5.subsetOf(k8))    // bottom-k sets are nested
  }

  test("trainingMix: per-stratum targets, whitelist semantics, nested draws") {
    val df = (1 to 300).map(i => (s"s${i % 3}", i.toLong)).toDF("g", "id")
    val got = Sampling.trainingMix(df, "g", "id", Map("s0" -> 5, "s1" -> 2))
      .select("g", "id").as[(String, Long)].collect().groupBy(_._1)
    assert(got.keySet == Set("s0", "s1"))           // s2 absent -> dropped
    assert(got("s0").length == 5 && got("s1").length == 2)
    // same md5 bottom-k discipline as stratifiedSample, so draws compose
    val k5 = Sampling.stratifiedSample(df, Seq("g"), "id", 5)
      .where($"g" === "s0").select("id").as[Long].collect().toSet
    assert(got("s0").map(_._2).toSet == k5)
    val grown = Sampling.trainingMix(df, "g", "id", Map("s0" -> 9))
      .select("id").as[Long].collect().toSet
    assert(k5.subsetOf(grown))
  }

  test("weighted sample: deterministic, nested, weight-sensitive, zero-weight excluded") {
    // 50 strata, each one heavy doc (w=50) among 49 light (w=1):
    // P(heavy wins the single slot) = 50/99 per stratum — assert a loose
    // band around it, plus the deterministic-machinery guarantees
    val df = (0 until 50).flatMap { s =>
      (0 until 50).map(i => (s"g$s", (s * 100 + i).toLong, if (i == 0) 50.0 else 1.0))
    }.toDF("g", "id", "wt")
    def ids(parts: Int, k: Int): Set[Long] =
      Sampling.weightedSample(df.repartition(parts), Seq("g"), "id", "wt", k)
        .select("id").as[Long].collect().toSet
    val one = ids(1, 1)
    assert(ids(13, 1) == one)                      // layout-invariant
    assert(one.size == 50)                         // one per stratum
    val heavyWins = one.count(_ % 100 == 0)
    assert(heavyWins > 10 && heavyWins < 45, s"heavy won $heavyWins/50")
    assert(one.subsetOf(ids(7, 3)))                // nested in k
    val zeroed = df.withColumn("wt", when($"id" % 100 === 0, 0.0).otherwise($"wt"))
    val noHeavy = Sampling.weightedSample(zeroed, Seq("g"), "id", "wt", 3)
      .select("id").as[Long].collect()
    assert(!noHeavy.exists(_ % 100 == 0))          // w <= 0 never selected
  }

  test("stratified sample works when the input has a __rn column, rejects its own temp name") {
    val df = Seq(("a", 1L, 9), ("a", 2L, 8)).toDF("g", "id", "__rn")
    val got = Sampling.stratifiedSample(df, Seq("g"), "id", 1)
    assert(got.columns.toSeq == Seq("g", "id", "__rn") && got.count() == 1)
    val clash = df.withColumnRenamed("__rn", "__graft_stratified_rn")
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(clash, Seq("g"), "id", 1)
    }
  }

  test("stratified sample returns whole strata smaller than k") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "id")
    val got = Sampling.stratifiedSample(df, Seq("g"), "id", 10)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L))
  }

  test("columnStats with sampleK attaches sample values in the one pass") {
    val df = Seq(("1.1", 2019, "Gas"), ("1.1", 2020, "Coal"))
      .toDF("table_name", "year", "fuel")
    val root = java.nio.file.Files.createTempDirectory("graft_smp_").toString
    val st = new graft.store.Store(spark, root, "t")
    val stats = st.columnStats(df, sampleK = 3)
    val fuelSamples = stats.filter($"column_name" === "fuel")
      .select("sample_values").as[Seq[String]].head()
    assert(fuelSamples.toSet == Set("Gas", "Coal"))
  }

  test("columnStats with quantiles: numeric quartiles in the same pass, null for text") {
    val df = (1 to 100).map(i => ("1.1", i, s"v$i")).toDF("table_name", "year", "fuel")
    val root = java.nio.file.Files.createTempDirectory("graft_q_").toString
    val st = new graft.store.Store(spark, root, "t")
    val stats = st.columnStats(df, quantiles = true)
    val yearQ = stats.filter($"column_name" === "year")
      .select("quartiles").as[Seq[Double]].head()
    assert(yearQ.length == 3)
    assert(yearQ(0) >= 20 && yearQ(0) <= 30)   // ~p25 of 1..100
    assert(yearQ(1) >= 45 && yearQ(1) <= 55)   // ~median
    assert(yearQ(2) >= 70 && yearQ(2) <= 80)   // ~p75
    assert(stats.filter($"column_name" === "fuel")
      .select("quartiles").as[Option[Seq[Double]]].head().isEmpty)
    // default off: schema unchanged for the metadata write path
    assert(!st.columnStats(df).columns.contains("quartiles"))
  }

  test("tokenBudgetMix: prefix rule in tokens, whitelist, nested under a growing budget") {
    // stratum s0: ids 1..100, each 10 tokens -> budget 55 keeps the first
    // 5 rows of the md5 order (50 tokens; row 6 would hit 60 > 55)
    val df = (1 to 300).map(i => (s"s${i % 3}", i.toLong, 10L))
      .toDF("g", "id", "n_tok")
    def ids(parts: Int, budgets: Map[String, Long]): Map[String, Set[Long]] =
      Sampling.tokenBudgetMix(df.repartition(parts), "g", "id", "n_tok", budgets)
        .select("g", "id").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = ids(1, Map("s0" -> 55L, "s1" -> 20L))
    assert(got.keySet == Set("s0", "s1"))              // s2 absent -> dropped
    assert(got("s0").size == 5 && got("s1").size == 2)
    assert(ids(13, Map("s0" -> 55L, "s1" -> 20L)) == got)  // layout-invariant
    // equal budget/size -> same set as the count-based mix (10 tokens each)
    val byCount = Sampling.trainingMix(df, "g", "id", Map("s0" -> 5))
      .select("id").as[Long].collect().toSet
    assert(got("s0") == byCount)
    // growing the budget only EXTENDS the prefix
    val grown = ids(7, Map("s0" -> 200L))("s0")
    assert(got("s0").subsetOf(grown) && grown.size == 20)
    // a row longer than the remaining budget blocks everything after it
    val mixed = Seq(("a", 1L, 3L), ("a", 2L, 100L), ("a", 3L, 3L)).toDF("g", "id", "n_tok")
    val prefix = Sampling.tokenBudgetMix(mixed, "g", "id", "n_tok", Map("a" -> 10L))
      .select("id").as[Long].collect().toSet
    // md5 order of ids 1,2,3 is fixed; whichever prefix fits, the cumsum
    // never skips over an overflowing row to pick up a later small one
    assert(prefix.size <= 1)
  }

  test("splitAssign: stable per-id under corpus growth, fractions hold, rejects bad input") {
    val df = (1L to 2000L).toDF("id")
    val full = Sampling.splitAssign(df, "id").select("id", "split")
      .as[(Long, String)].collect().toMap
    assert(full.values.toSet == Set("train", "val", "test"))
    // THE property: a doc's split depends on its id alone — any subset
    // (a smaller/older corpus) assigns identically
    val subset = Sampling.splitAssign(df.where($"id" % 7 === 0), "id")
      .select("id", "split").as[(Long, String)].collect()
    assert(subset.forall { case (id, s) => full(id) == s })
    // 90/5/5 within a loose band on 2000 ids
    val n = full.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(n("train") > 1700 && n("val") > 50 && n("test") > 50)
    assert(n.values.sum == 2000)
    // custom fractions route through the same thresholds the oracle uses
    val custom = Sampling.splitAssign(df, "id", Seq("a" -> 0.5, "b" -> 0.5))
    assert(custom.where($"split" === "a").count() > 800)
    intercept[IllegalArgumentException](
      Sampling.splitAssign(df, "id", Seq("a" -> 0.5, "a" -> 0.5)))
    intercept[IllegalArgumentException](
      Sampling.splitAssign(df, "id", Seq("a" -> 0.5, "b" -> 0.6)))
    intercept[IllegalArgumentException](
      Sampling.splitAssign(custom, "id"))
  }

  test("splitAssignByCluster: near-dup clusters land in one split, unpaired docs unchanged") {
    val df = (1L to 500L).toDF("id")
    // chains: (10,11,12), (20,21), (30,31) — plus 494 unpaired docs
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L), (31L, 30L))
      .toDF("id_a", "id_b")
    val got = Sampling.splitAssignByCluster(df, pairs, "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(got.size == 500)
    // every cluster member shares its cluster's split
    assert(got(10L) == got(11L) && got(11L) == got(12L))
    assert(got(20L) == got(21L))
    assert(got(30L) == got(31L))
    // cluster split = the min-id member's OWN splitAssign label, so
    // unpaired docs and cluster reps match plain splitAssign exactly
    val plain = Sampling.splitAssign(df, "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    val clustered = Set(11L, 12L, 21L, 31L)
    assert(got.filterNot(kv => clustered(kv._1)) ==
      plain.filterNot(kv => clustered(kv._1)))
    // living-corpus stability: adding docs never moves existing ones
    val grown = Sampling.splitAssignByCluster((1L to 900L).toDF("id"), pairs, "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(got.forall { case (id, s) => grown(id) == s })
  }

  test("temperatureMix: alpha interpolates targets between uniform and proportional") {
    // counts 36 ("big") and 4 ("small"): exact shares at every alpha below
    val df = ((1 to 36).map(i => (i.toLong, "big")) ++
        (1 to 4).map(i => (100L + i, "small")))
      .toDF("doc_id", "lang")
    def targetsAt(alpha: Double, total: Int): Map[String, Long] =
      Sampling.temperatureMix(df, "lang", "doc_id", total, alpha)
        .groupBy("lang").count()
        .as[(String, Long)].collect().toMap
    // alpha=0.5: sqrt 6 vs 2 -> shares 0.75/0.25 of 8 = 6/2
    assert(targetsAt(0.5, 8) == Map("big" -> 6L, "small" -> 2L))
    // alpha=1: proportional 0.9/0.1 of 10 = 9/1
    assert(targetsAt(1.0, 10) == Map("big" -> 9L, "small" -> 1L))
    // alpha=0: uniform 0.5/0.5 of 4 = 2/2 — low-resource fully leveled
    assert(targetsAt(0.0, 4) == Map("big" -> 2L, "small" -> 2L))
  }

  test("temperatureMix: strata smaller than their target return whole; draw is deterministic") {
    val df = ((1 to 50).map(i => (i.toLong, "en")) ++ (1 to 2).map(i => (1000L + i, "rare")))
      .toDF("doc_id", "lang")
    // alpha=0 with total=20 wants 10 per stratum; rare has only 2 rows
    val got = Sampling.temperatureMix(df, "lang", "doc_id", total = 20, alpha = 0.0)
    assert(got.where($"lang" === "rare").count() == 2L)
    assert(got.where($"lang" === "en").count() == 10L)
    val again = Sampling.temperatureMix(df, "lang", "doc_id", total = 20, alpha = 0.0)
    assert(got.select("doc_id").as[Long].collect().sorted.toSeq ==
      again.select("doc_id").as[Long].collect().sorted.toSeq)
  }
}
