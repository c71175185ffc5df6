package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Multilingual composition: planted rotation end-to-end — alignment
  * recovers the map, mining finds the planted parallel pairs,
  * decontamination drops benchmark-overlapping pairs, packing assigns
  * contiguous offsets. */
class MultilingPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vec(seed: Int): Array[Float] = {
    val rng = new scala.util.Random(seed)
    val v = Array.fill(8)(rng.nextGaussian().toFloat)
    val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
    v.map(_ / n)
  }

  test("planted rotation: mined pairs survive alignment, contamination drops a pair, packing is contiguous") {
    val r0 = graft.vec.Align.givens(8, Seq((0, 1, 0.6), (2, 3, 1.2)))
    // source docs 0..9; their true translations are 100..109 with the
    // SAME vector rotated into the target space
    val src = (0L until 10L).map(i => (i, vec(i.toInt)))
      .toDF("vec_id", "embedding")
    val tgtRaw = (0L until 10L).map(i => (i + 100L, vec(i.toInt)))
      .toDF("vec_id", "embedding")
    val tgt = graft.vec.Align.applyMap(tgtRaw, "embedding", "__r", r0)
      .select($"vec_id", $"__r".as("embedding"))
    val seeds = graft.vec.Align.applyMap(src, "embedding", "__y", r0)
      .select($"embedding".as("__x"), $"__y")
    val leak = "the eval benchmark sentence that disqualifies a pair"
    val docs = ((0L until 10L).map(i =>
        (i, if (i == 3L) s"src doc $i containing $leak"
            else s"src doc $i body alpha beta gamma delta " * 3)) ++
      (100L until 110L).map(i => (i, s"tgt doc $i corpo uno due tre " * 3)))
      .toDF("doc_id", "text")
    val bench = Seq((999L, leak)).toDF("doc_id", "text")
    val out = MultilingPipeline.run(src, tgt, seeds, docs, bench,
      dims = 8, k = 3, minMargin = 1.0, ngramN = 5, ctxLen = 64)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3))).sortBy(_._4)
    // every pair i <-> i+100 except the contaminated src 3
    assert(rows.map(r => (r._1, r._2)).toSet ==
      (0L until 10L).filter(_ != 3L).map(i => (i, i + 100L)).toSet)
    // packing: offsets are an exclusive prefix sum in src_id order
    var expect = 0L
    rows.sortBy(_._1).foreach { case (_, _, n, off) =>
      assert(off == expect); expect += n
    }
  }
}
