package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql(...)` users get
  * them without touching the Scala API:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   ...
  * spark.sql("SELECT simhash64(split(text, ' ')), rolling_hash(text) FROM docs")
  * spark.sql("SELECT minhash(split(text, ' '), 3, 64) FROM docs")
  * }}}
  *
  * Also injectable via the config
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[Expression]) => RollingHash(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("minhash"),
      new ExpressionInfo(classOf[MinHashShingles].getName, "minhash"),
      (children: Seq[Expression]) => MinHashShingles(children.head,
        intArg(children(1), "shingleN"), intArg(children(2), "numPerm"))))
    ext.injectFunction((
      new FunctionIdentifier("fix_mojibake"),
      new ExpressionInfo(classOf[FixMojibake].getName, "fix_mojibake"),
      (children: Seq[Expression]) => FixMojibake(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[Expression]) => WordShingles(children.head,
        intArg(children(1), "shingleN"))))
    ext.injectFunction((
      new FunctionIdentifier("lsh_bands"),
      new ExpressionInfo(classOf[LshBands].getName, "lsh_bands"),
      (children: Seq[Expression]) => LshBands(children.head,
        intArg(children(1), "bands"), intArg(children(2), "rowsPerBand"))))
    ext.injectFunction((
      new FunctionIdentifier("deflate_ratio"),
      new ExpressionInfo(classOf[DeflateRatio].getName, "deflate_ratio"),
      (children: Seq[Expression]) => DeflateRatio(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      (children: Seq[Expression]) => UnicodeNormalize(children.head,
        children.lift(1).map {
          case Literal(s, _) => String.valueOf(s)
          case other => throw new IllegalArgumentException(
            s"form must be a string literal, got: $other")
        }.getOrElse("NFC"))))
    // the HTML extractors are Column COMPOSITIONS (regexp_replace
    // chains + array lambdas), not custom expressions — bridge through
    // the Column API so SQL users get the same codegen'd plan
    import org.apache.spark.sql.graftx.{toAnalyzableExpression, toColumn}
    ext.injectFunction((
      new FunctionIdentifier("html_text"),
      new ExpressionInfo(graft.text.Html.getClass.getName, "html_text"),
      (children: Seq[Expression]) =>
        toAnalyzableExpression(graft.text.Html.stripTags(toColumn(children.head)))))
    ext.injectFunction((
      new FunctionIdentifier("html_main"),
      new ExpressionInfo(graft.text.Html.getClass.getName, "html_main"),
      (children: Seq[Expression]) =>
        toAnalyzableExpression(graft.text.Html.mainText(toColumn(children.head),
          children.lift(1).map(intArg(_, "minChars")).getOrElse(30),
          children.lift(2).map {
            case Literal(d: Double, _) => d
            case Literal(f: Float, _) => f.toDouble
            // SQL `0.6` parses as a DecimalType literal backed by
            // Catalyst's Decimal, not java.math.BigDecimal
            case Literal(d: org.apache.spark.sql.types.Decimal, _) => d.toDouble
            case Literal(d: java.math.BigDecimal, _) => d.doubleValue
            case Literal(i: Int, _) => i.toDouble
            case Literal(l: Long, _) => l.toDouble
            case other => throw new IllegalArgumentException(
              s"minStopRatio must be a numeric literal, got: $other")
          }.getOrElse(0.05)))))
    ext.injectFunction((
      new FunctionIdentifier("html_link_count"),
      new ExpressionInfo(graft.text.Html.getClass.getName, "html_link_count"),
      (children: Seq[Expression]) =>
        toAnalyzableExpression(graft.text.Html.linkCount(toColumn(children.head)))))
    ext.injectFunction((
      new FunctionIdentifier("chat_valid"),
      new ExpressionInfo(graft.text.Chat.getClass.getName, "chat_valid"),
      (children: Seq[Expression]) =>
        toAnalyzableExpression(graft.text.Chat.schemaValid(toColumn(children.head)))))
    ext.injectFunction((
      new FunctionIdentifier("chat_render"),
      new ExpressionInfo(graft.text.Chat.getClass.getName, "chat_render"),
      (children: Seq[Expression]) =>
        toAnalyzableExpression(graft.text.Chat.render(toColumn(children.head)))))
    ext.injectFunction((
      new FunctionIdentifier("token_jaccard"),
      new ExpressionInfo(graft.text.Preference.getClass.getName, "token_jaccard"),
      (children: Seq[Expression]) =>
        toAnalyzableExpression(graft.text.Preference.tokenJaccard(
          toColumn(children.head), toColumn(children(1))))))
    ext.injectFunction((
      new FunctionIdentifier("sentences"),
      new ExpressionInfo(graft.text.TextOps.getClass.getName, "sentences"),
      (children: Seq[Expression]) =>
        toAnalyzableExpression(graft.text.TextOps.sentences(toColumn(children.head)))))
    // round-10 kernels: generation-eval + winnowing as SQL functions
    ext.injectFunction((
      new FunctionIdentifier("clipped_ngram_matches"),
      new ExpressionInfo(classOf[ClippedNgramMatches].getName, "clipped_ngram_matches"),
      (children: Seq[Expression]) => ClippedNgramMatches(children.head,
        children(1), intArg(children(2), "n"))))
    ext.injectFunction((
      new FunctionIdentifier("lcs_length"),
      new ExpressionInfo(classOf[LcsLength].getName, "lcs_length"),
      (children: Seq[Expression]) => LcsLength(children.head, children(1))))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fingerprints"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "winnow_fingerprints"),
      (children: Seq[Expression]) => WinnowFingerprints(children.head,
        children.lift(1).map(intArg(_, "k")).getOrElse(8),
        children.lift(2).map(intArg(_, "w")).getOrElse(4))))
    // shard_of(id [, nShards]): the audit/writer shard assignment rule
    ext.injectFunction((
      new FunctionIdentifier("shard_of"),
      new ExpressionInfo(graft.text.Sharding.getClass.getName, "shard_of"),
      (children: Seq[Expression]) =>
        toAnalyzableExpression(graft.text.Sharding.shardOf(
          toColumn(children.head),
          children.lift(1).map(intArg(_, "nShards")).getOrElse(8)))))
    // URL-curation kernels: canonical crawl-dedup key + eTLD+1
    ext.injectFunction((
      new FunctionIdentifier("url_canonicalize"),
      new ExpressionInfo(graft.text.UrlOps.getClass.getName, "url_canonicalize"),
      (children: Seq[Expression]) =>
        toAnalyzableExpression(graft.text.UrlOps.canonicalizeUrl(
          toColumn(children.head)))))
    ext.injectFunction((
      new FunctionIdentifier("url_host"),
      new ExpressionInfo(graft.text.UrlOps.getClass.getName, "url_host"),
      (children: Seq[Expression]) =>
        toAnalyzableExpression(graft.text.UrlOps.hostOf(toColumn(children.head)))))
    ext.injectFunction((
      new FunctionIdentifier("registrable_domain"),
      new ExpressionInfo(graft.text.UrlOps.getClass.getName, "registrable_domain"),
      (children: Seq[Expression]) =>
        toAnalyzableExpression(graft.text.UrlOps.registrableDomain(
          toColumn(children.head)))))
    // rp_project(vec [, inDim, outDim, seed]): dense-sign random
    // projection — dims/seed must be literals (they parameterize the
    // driver-built sign matrix embedded in the plan)
    ext.injectFunction((
      new FunctionIdentifier("rp_project"),
      new ExpressionInfo(graft.vec.Reduce.getClass.getName, "rp_project"),
      (children: Seq[Expression]) => {
        val inDim = children.lift(1).map(intArg(_, "inDim")).getOrElse(64)
        val outDim = children.lift(2).map(intArg(_, "outDim")).getOrElse(16)
        val seed = children.lift(3).map(intArg(_, "seed")).getOrElse(7)
        toAnalyzableExpression(
          graft.vec.Reduce.projectColumn(toColumn(children.head),
            inDim, outDim, seed))
      }))
  }
}
