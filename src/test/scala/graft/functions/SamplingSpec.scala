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
}
