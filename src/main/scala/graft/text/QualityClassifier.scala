package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.{toColumn, toExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** fastText-style hashed-feature linear quality classifier — the
  * "looks like a reference corpus vs looks like raw crawl" scorer
  * (GPT-3 / LLaMA / CCNet all gate CommonCrawl this way). Features are
  * the hashing trick: token -> xxhash64 -> bucket in [0, dim); a
  * document's margin is the mean bucket weight plus a bias, its score
  * the sigmoid of the margin.
  *
  * Split of labor, sized to where the data is: TRAINING runs on a
  * labeled sample that is small by construction (tens of thousands of
  * docs — the labeled side of this problem is never corpus-scale), so
  * it collects hashed features once and runs deterministic driver-side
  * SGD. SCORING is the corpus-scale side: the trained weight vector
  * rides into a custom Catalyst expression as a codegen REFERENCE
  * OBJECT (the [[graft.vec.PqEncodeExpr]] discipline — never a literal
  * array, never a join against a weight table), so scoring 100 TB is a
  * shuffle-free whole-stage-codegen projection over the corpus scan.
  */
object QualityKernels {
  /** Mean hashed-bucket weight over the token array, plus bias. Shared
    * by interpreted eval, generated code, AND driver-side training —
    * one implementation, so train and serve can never disagree on the
    * hash or the mean. Empty/all-null arrays score exactly `bias`. */
  def margin(toks: ArrayData, weights: Array[Double], bias: Double): Double = {
    val dim = weights.length
    var s = 0.0
    var n = 0
    var i = 0
    while (i < toks.numElements()) {
      if (!toks.isNullAt(i)) {
        val h = XxHash64Function.hash(toks.getUTF8String(i), StringType, 42L)
        s += weights(java.lang.Math.floorMod(h, dim.toLong).toInt)
        n += 1
      }
      i += 1
    }
    if (n == 0) bias else s / n + bias
  }

  /** The bucket a single token hashes to (training-side feature
    * extraction goes through this, matching [[margin]] bit-for-bit). */
  def bucket(token: String, dim: Int): Int =
    java.lang.Math.floorMod(
      XxHash64Function.hash(UTF8String.fromString(token), StringType, 42L),
      dim.toLong).toInt
}

/** Margin of a token-array column under a trained model: mean
  * hashed-bucket weight + bias, one tight loop per row inside
  * whole-stage codegen. */
case class LinearTextMarginExpr(child: Expression, weights: Array[Double],
                                bias: Double) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "linear_text_margin"

  override def nullSafeEval(input: Any): Any =
    QualityKernels.margin(input.asInstanceOf[ArrayData], weights, bias)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("qcWeights", weights, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.text.QualityKernels.margin($c, $wRef, $bias)")
  }

  override protected def withNewChildInternal(newChild: Expression): LinearTextMarginExpr =
    copy(child = newChild)
}

/** A trained model: `dim` hash buckets, their weights, a bias. */
case class QualityModel(dim: Int, weights: Array[Double], bias: Double) {
  require(weights.length == dim, s"QualityModel: ${weights.length} weights for dim $dim")
}

object QualityClassifier {

  /** Train by logistic SGD on the labeled frames. Deterministic: docs
    * are collected in `idCol` order, epochs visit them in a fixed
    * seeded shuffle, so the same inputs always yield the same weights
    * (bit-for-bit) — the reproducibility discipline every other
    * selector in this engine follows (md5 sampling, hash splits).
    *
    * `maxTrainDocs` is a hard guard against misuse at corpus scale:
    * training COLLECTS — it must only ever see the labeled sample. */
  def train(pos: DataFrame, neg: DataFrame, idCol: String, textCol: String,
            dim: Int = 1 << 16, epochs: Int = 10, lr: Double = 0.5,
            l2: Double = 1e-6, maxTrainDocs: Int = 100000): QualityModel = {
    require(dim >= 2 && epochs >= 1, s"train: bad dim=$dim/epochs=$epochs")
    def features(d: DataFrame): Array[Array[Int]] = d
      .select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("t"))
      .orderBy(col("id"))
      .limit(maxTrainDocs + 1)
      .collect()
      .map(_.getSeq[String](1).filter(_.nonEmpty)
        .map(QualityKernels.bucket(_, dim)).toArray)
    val fp = features(pos)
    val fn = features(neg)
    require(fp.length + fn.length <= maxTrainDocs,
      s"train: labeled sample exceeds maxTrainDocs=$maxTrainDocs — " +
        "training collects to the driver; sample the labels first")
    require(fp.nonEmpty && fn.nonEmpty, "train: both classes must be non-empty")
    val docs = fp.map((_, 1.0)) ++ fn.map((_, 0.0))
    val w = new Array[Double](dim)
    var b = 0.0
    val order = docs.indices.toArray
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until epochs) {
      // deterministic per-epoch reshuffle (fixed seed, fixed base order)
      var i = order.length - 1
      while (i > 0) { val j = rnd.nextInt(i + 1)
        val t = order(i); order(i) = order(j); order(j) = t; i -= 1 }
      order.foreach { k =>
        val (idx, y) = docs(k)
        if (idx.nonEmpty) {
          var s = 0.0
          idx.foreach(s += w(_))
          val p = 1.0 / (1.0 + math.exp(-(s / idx.length + b)))
          val g = p - y
          val step = lr * g / idx.length
          idx.foreach { j => w(j) -= step + lr * l2 * w(j) }
          b -= lr * g
        }
      }
    }
    QualityModel(dim, w, b)
  }

  /** Raw margin column over a token-array column. */
  def marginCol(toks: Column, model: QualityModel): Column =
    toColumn(LinearTextMarginExpr(toExpression(toks), model.weights, model.bias))

  /** Score `docs`: (id, quality_score) with the score in (0, 1) — the
    * sigmoid of the margin, rounded to 4 places. A shuffle-free
    * projection; compose with `.where($"quality_score" >= cut)` and the
    * filter runs at scan speed too. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: QualityModel): DataFrame =
    docs.select(col(idCol),
      round(lit(1.0) /
        (lit(1.0) + exp(-marginCol(TextOps.tokens(col(textCol)), model))), 4)
        .as("quality_score"))

  /** The DISTRIBUTED trainer — full-batch gradient descent where the
    * labeled set never leaves the cluster, the scale path past
    * [[train]]'s collect-and-SGD (which is the right tool up to
    * `maxTrainDocs` and refuses beyond it). Model identical in form to
    * [[train]]'s: margin = mean bucket weight + bias under the SAME
    * xxhash64(42) bucketing (Spark's builtin `xxhash64` seeds at 42,
    * matching [[QualityKernels.bucket]] bit-for-bit — asserted in the
    * spec), so [[score]]/[[marginCol]] serve either model unchanged.
    *
    * Per iteration (the classic distributed-LR shape):
    *  1. margins: the cached (doc, bucket) feature frame joins the
    *     dim-bounded weight frame (broadcast — it is at most
    *     min(dim, vocab) rows) and aggregates per doc;
    *  2. per-doc residuals g = sigmoid(margin) - y (docs with zero
    *     tokens contribute margin = bias, matching the scoring kernel);
    *  3. gradient: features join the doc-keyed residuals and aggregate
    *     per bucket — dL/dw_j = sum_d g_d * c_dj / n_d — and only this
    *     model-sized (<= vocab) vector collects to the driver, which
    *     applies w -= lr * (grad + l2 * w), b -= lr * sum(g).
    * Two shuffles per iteration over a localCheckpoint'd feature frame;
    * nothing per-document ever collects. Deterministic up to float
    * summation order (the agg-of-doubles caveat every distributed
    * trainer carries; the spec pins layout-invariance at 1e-9).
    *
    * `idCol` must be unique WITHIN each of `pos` and `neg` (duplicate
    * ids would merge documents in the per-doc aggs); sharing ids
    * across the two frames is fine — the internal doc key is
    * (label, id). */
  def trainFullBatch(pos: DataFrame, neg: DataFrame, idCol: String,
                     textCol: String, dim: Int = 1 << 16, iters: Int = 30,
                     lr: Double = 0.5, l2: Double = 0.0): QualityModel = {
    require(dim >= 2 && iters >= 1,
      s"trainFullBatch: bad dim=$dim/iters=$iters")
    require(lr > 0 && l2 >= 0, s"trainFullBatch: bad lr=$lr/l2=$l2")
    val spark = pos.sparkSession
    import spark.implicits._
    def side(d: DataFrame, y: Double): DataFrame = d
      .select(concat(lit(y.toInt), lit("_"), col(idCol).cast("string")).as("__k"),
        lit(y).as("__y"), TextOps.tokens(col(textCol)).as("__t"))
    val docs = side(pos, 1.0).unionByName(side(neg, 0.0))
      .select(col("__k"), col("__y"), col("__t"),
        size(col("__t")).cast("double").as("__n"))
      .transform(graft.ops.Pins.pin)
    // (doc, bucket, occurrences/n): the per-occurrence gradient weight
    // 1/n is folded into the count so each iteration is pure join+agg
    val feats = docs.where(col("__n") > 0)
      .select(col("__k"), col("__n"), explode(col("__t")).as("__tok"))
      .select(col("__k"), col("__n"),
        pmod(xxhash64(col("__tok")), lit(dim.toLong)).cast("int").as("__j"))
      .groupBy(col("__k"), col("__n"), col("__j"))
      .agg((count(lit(1)).cast("double") / col("__n")).as("__cn"))
      .select(col("__k"), col("__j"), col("__cn"))
      .transform(graft.ops.Pins.pin)
    val used = feats.select(col("__j")).distinct().as[Int].collect().sorted
    val w = new Array[Double](dim)
    var b = 0.0
    for (_ <- 0 until iters) {
      val wDf = broadcast(used.map(j => (j, w(j))).toSeq.toDF("__j", "__w"))
      val margins = feats.join(wDf, Seq("__j"))
        .groupBy(col("__k")).agg(sum(col("__cn") * col("__w")).as("__s"))
      val resid = docs.join(margins, Seq("__k"), "left")
        .select(col("__k"),
          (lit(1.0) / (lit(1.0) + exp(-(coalesce(col("__s"), lit(0.0)) + b)))
            - col("__y")).as("__g"))
        .localCheckpoint(eager = false)
      val grads = feats.join(resid, Seq("__k"))
        .groupBy(col("__j")).agg(sum(col("__cn") * col("__g")).as("__grad"))
        .as[(Int, Double)].collect()
      val gb = resid.agg(sum(col("__g"))).head().getDouble(0)
      if (l2 > 0) { var j = 0; while (j < dim) { w(j) -= lr * l2 * w(j); j += 1 } }
      grads.foreach { case (j, g) => w(j) -= lr * g }
      b -= lr * gb
    }
    QualityModel(dim, w, b)
  }

  /** One full-batch gradient step as a DataFrame — the oracle-gateable
    * kernel of [[trainFullBatch]]: given token arrays, labels and an
    * initial model, returns the updated weights (bucket, weight) for
    * every bucket in [0, dim) plus a bucket = -1 bias row. The same
    * join+agg shapes as the trainer, end-to-end in the plan (no driver
    * arithmetic), weights rounded to 6. */
  def gradientStepFrame(labeled: DataFrame, toksCol: String, labelCol: String,
                        model: QualityModel, lr: Double): DataFrame = {
    val spark = labeled.sparkSession
    import spark.implicits._
    val dim = model.dim
    val wDf = broadcast(model.weights.toSeq.zipWithIndex
      .map { case (wj, j) => (j, wj) }.toDF("__j", "__w"))
    val docs = labeled.select(
        monotonically_increasing_id().as("__k"),
        col(labelCol).cast("double").as("__y"), col(toksCol).as("__t"))
      .withColumn("__n", size(col("__t")).cast("double"))
      .transform(graft.ops.Pins.pin)
    val feats = docs.where(col("__n") > 0)
      .select(col("__k"), col("__n"), explode(col("__t")).as("__tok"))
      .select(col("__k"), col("__n"),
        pmod(xxhash64(col("__tok")), lit(dim.toLong)).cast("int").as("__j"))
      .groupBy(col("__k"), col("__n"), col("__j"))
      .agg((count(lit(1)).cast("double") / col("__n")).as("__cn"))
      .select(col("__k"), col("__j"), col("__cn"))
    val margins = feats.join(wDf, Seq("__j"))
      .groupBy(col("__k")).agg(sum(col("__cn") * col("__w")).as("__s"))
    val resid = docs.join(margins, Seq("__k"), "left")
      .select(col("__k"),
        (lit(1.0) / (lit(1.0) + exp(-(coalesce(col("__s"), lit(0.0)) + model.bias)))
          - col("__y")).as("__g"))
    val grads = feats.join(resid, Seq("__k"))
      .groupBy(col("__j")).agg(sum(col("__cn") * col("__g")).as("__grad"))
    val biasRow = resid.agg((lit(-1)).as("__j"),
      (round(lit(model.bias) - lit(lr) * sum(col("__g")), 6) + lit(0.0))
        .as("weight"))
    spark.range(dim).select(col("id").cast("int").as("__j"))
      .join(grads, Seq("__j"), "left")
      .join(wDf, Seq("__j"))
      .select(col("__j"),
        (round(col("__w") - lit(lr) * coalesce(col("__grad"), lit(0.0)), 6)
          + lit(0.0)).as("weight"))
      .unionByName(biasRow)
      .withColumnRenamed("__j", "bucket")
  }
}
