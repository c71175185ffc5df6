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

  test("unicode_normalize: NFC composes, NFD decomposes, NFKC folds compatibility forms") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val decomposed = "cafe\u0301"  // e + combining acute
    val composed = "caf\u00e9"     // precomposed e-acute
    val ligature = "\ufb01le"      // fi-ligature + "le"
    val df = Seq(decomposed, ligature).toDF("s")
    def norm(form: String) =
      df.select(TextExpressions.unicode_normalize(col("s"), form).as("n"))
        .as[String].collect().toSeq
    assert(norm("NFC") == Seq(composed, ligature)) // e1 composes, ligature kept
    assert(norm("NFKC") == Seq(composed, "file"))  // ligature folds
    assert(norm("NFD").head == decomposed)         // already decomposed
    // null-safe + already-normalized strings pass through
    val withNull = Seq(Some("plain"), None).toDF("s")
    assert(withNull.select(TextExpressions.unicode_normalize(col("s")).as("n"))
      .as[Option[String]].collect().toSet == Set(Some("plain"), None))
    intercept[IllegalArgumentException] {
      TextExpressions.unicode_normalize(col("s"), "NFX")
    }
  }

  test("unicode_normalize callable from SQL with and without a form argument") {
    import spark.implicits._
    Seq("caf\u00e9").toDF("s").createOrReplaceTempView("udocs")
    val r = spark.sql(
      "SELECT unicode_normalize(s), unicode_normalize(s, 'NFD') FROM udocs").head()
    assert(r.getString(0) == "caf\u00e9" && r.getString(1) == "cafe\u0301")
  }
  test("fix_mojibake repairs single and double cp1252/UTF-8 encoding, leaves clean text") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val clean = "caf\u00e9 costs \u20ac5"
    val once = new String(clean.getBytes("UTF-8"), "windows-1252")
    val twice = new String(once.getBytes("UTF-8"), "windows-1252")
    val df = Seq(clean, once, twice, "plain ascii text").toDF("s")
    val got = df.select(
        graft.functions.TextExpressions.fix_mojibake(col("s")).as("f"))
      .as[String].collect().toSeq
    assert(got == Seq(clean, clean, clean, "plain ascii text"))
  }

  test("fix_mojibake / word_shingles / lsh_bands callable from SQL \u2014 the full LSH chain") {
    import spark.implicits._
    val once = new String("caf\u00e9".getBytes("UTF-8"), "windows-1252")
    Seq(("a b c d e", once), ("a b c d e", "x"), ("p q r s t", "y"))
      .toDF("text", "moji").createOrReplaceTempView("docs3")
    val rows = spark.sql(
      """SELECT fix_mojibake(moji) AS fixed,
                word_shingles(split(text, ' '), 3) AS sh,
                lsh_bands(minhash(split(text, ' '), 3, 16), 4, 4) AS bands
         FROM docs3""").collect()
    assert(rows(0).getString(0) == "caf\u00e9")
    assert(rows(0).getSeq[String](1).length == 3)   // 5 tokens, n=3 -> 3 shingles
    assert(rows(0).getSeq[Long](2).length == 4)     // 4 bands
    assert(rows(0).getSeq[Long](2) == rows(1).getSeq[Long](2)) // same text, same bands
    assert(rows(0).getSeq[Long](2) != rows(2).getSeq[Long](2))
  }

  test("deflate_ratio: template spam compresses far below prose; empty=1; SQL-callable") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val spam = "buy now " * 200
    val prose = "The committee reviewed quarterly statistics on fuel " +
      "consumption across regions, noting divergent seasonal patterns " +
      "and revising projections where the observed variance warranted it."
    val df = Seq(spam, prose, "").toDF("s")
    val got = df.select(
        graft.functions.TextExpressions.deflate_ratio(col("s")).as("r"))
      .as[Double].collect().toSeq
    assert(got(0) < 0.1, s"spam ratio ${got(0)}")         // repetition collapses
    assert(got(1) > 0.5 && got(1) <= 1.2, s"prose ratio ${got(1)}")
    assert(got(2) == 1.0)
    // deterministic and identical through the SQL surface
    Seq(spam).toDF("s").createOrReplaceTempView("dr1")
    val viaSql = spark.sql("SELECT deflate_ratio(s) AS r FROM dr1")
      .as[Double].head()
    assert(viaSql == got(0))
  }

  test("html_text / html_main / html_link_count callable from SQL, match the Column API") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val page = "<h1>Hi</h1><p>the quick brown fox is one of a kind and it " +
      "jumps for joy</p><div class=\"nav\"><a href=\"/\">home</a> " +
      "<a href=\"/l\">login</a></div>"
    val df = Seq(page).toDF("h")
    df.createOrReplaceTempView("pages")
    val viaSql = spark.sql(
      """SELECT html_text(h) AS t, html_main(h) AS m,
                html_main(h, 10, 0.6D) AS strictm,
                html_link_count(h) AS lc FROM pages""").head()
    val viaCol = df.select(
      graft.text.Html.stripTags(col("h")),
      graft.text.Html.mainText(col("h")),
      graft.text.Html.mainText(col("h"), 10, 0.6),
      graft.text.Html.linkCount(col("h"))).head()
    assert(viaSql.getString(0) == viaCol.getString(0))
    assert(viaSql.getString(1) == viaCol.getString(1))
    assert(viaSql.getString(1).startsWith("the quick brown fox"))
    assert(viaSql.getString(2) == viaCol.getString(2)) // 0.6 ratio drops all
    assert(viaSql.getString(2).isEmpty)
    assert(viaSql.getLong(3) == 2L)
    // parameters must be literals, like every other injected function
    val e = intercept[Exception](
      spark.sql("SELECT html_main(h, length(h)) FROM pages").collect())
    assert(e.getMessage.contains("integer literal"))
  }

  test("html_main accepts plain SQL decimal and integer ratio literals") {
    import spark.implicits._
    val page = "<p>the quick brown fox is one of a kind and it " +
      "jumps for joy</p>"
    Seq(page).toDF("h").createOrReplaceTempView("pages2")
    // `0.6` parses as DecimalType, not DoubleType — must still work
    val viaDecimal = spark.sql(
      "SELECT html_main(h, 10, 0.6) AS m FROM pages2").head().getString(0)
    val viaDouble = spark.sql(
      "SELECT html_main(h, 10, 0.6D) AS m FROM pages2").head().getString(0)
    assert(viaDecimal == viaDouble)
    // integer literal ratio (0 = keep everything long enough)
    val viaInt = spark.sql(
      "SELECT html_main(h, 10, 0) AS m FROM pages2").head().getString(0)
    assert(viaInt.startsWith("the quick brown fox"))
  }

  test("chat_valid / chat_render / token_jaccard callable from SQL") {
    import spark.implicits._
    val good = """{"messages":[{"role":"user","content":"hi"},
      {"role":"assistant","content":"hello there"}]}"""
    Seq((good, "a b c d", "a c"), ("{bad", "x", "x")).toDF("js", "t1", "t2")
      .createOrReplaceTempView("convs")
    val rows = spark.sql(
      """SELECT chat_valid(js) AS v, chat_render(js) AS r,
                token_jaccard(t1, t2) AS j FROM convs""").collect()
    assert(rows(0).getBoolean(0))
    assert(rows(0).getString(1) == "<|user|>hi<|assistant|>hello there")
    assert(rows(0).getDouble(2) == 0.5)
    assert(!rows(1).getBoolean(0) && rows(1).getString(1).isEmpty)
    assert(rows(1).getDouble(2) == 1.0)
  }

  test("sentences / rp_project callable from SQL, match the Column/library API") {
    import spark.implicits._
    Seq(("One two. Three four! five",
        Array(1.0f, 2.0f, 3.0f, 4.0f, 5.0f, 6.0f, 7.0f, 8.0f)))
      .toDF("text", "vec").createOrReplaceTempView("r9docs")
    val row = spark.sql(
      "SELECT sentences(text) AS s, rp_project(vec, 8, 3, 7) AS p FROM r9docs")
      .head()
    assert(row.getSeq[String](0) == Seq("one two.", "three four!", "five"))
    val viaLib = graft.vec.Reduce.randomProject(
        Seq(Tuple1(Array(1.0f, 2.0f, 3.0f, 4.0f, 5.0f, 6.0f, 7.0f, 8.0f)))
          .toDF("vec"), "vec", "p", inDim = 8, outDim = 3, seed = 7)
      .select("p").as[Seq[Double]].head()
    assert(row.getSeq[Double](1) == viaLib)
    // dims must be literals — a column there is an analysis error
    val err = intercept[Exception] {
      spark.sql("SELECT rp_project(vec, length(text), 3) FROM r9docs").collect()
    }
    assert(err.getMessage.toLowerCase.contains("literal"))
  }

  test("round-10 kernels callable from SQL, match the Column/library API") {
    import spark.implicits._
    Seq((1L, "the cat sat on the mat", "the dog sat on a mat"))
      .toDF("id", "cand", "ref").createOrReplaceTempView("r10pairs")
    val row = spark.sql(
      """SELECT clipped_ngram_matches(split(cand, ' '), split(ref, ' '), 2) AS m2,
                lcs_length(split(cand, ' '), split(ref, ' ')) AS lcs,
                size(winnow_fingerprints(cand, 8, 4)) AS nfp,
                shard_of(id, 4) AS shard
         FROM r10pairs""").head()
    // bigrams shared: "sat on" -> 1; LCS = the, sat, on, mat -> 4
    assert(row.getLong(0) == 1L && row.getLong(1) == 4L)
    val viaLib = graft.text.Winnow.fingerprints(
      Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text"),
      "doc_id", "text").count()
    assert(row.getInt(2).toLong == viaLib)
    val shardLib = graft.text.Sharding.assign(
        Seq((1L, "x")).toDF("id", "t"), "id", 4)
      .select("shard").as[Int].head()
    assert(row.getInt(3) == shardLib)
  }

  test("url_canonicalize / url_host / registrable_domain callable from SQL") {
    import spark.implicits._
    Seq("HTTPS://WWW.News.BBC.co.uk:443/Story/?utm_source=x&b=2&a=1#top")
      .toDF("url").createOrReplaceTempView("urls")
    val row = spark.sql(
      """SELECT url_canonicalize(url) AS canon,
                url_host(url) AS host,
                registrable_domain(url_host(url)) AS dom
         FROM urls""").head()
    assert(row.getString(0) == "https://news.bbc.co.uk/Story?a=1&b=2")
    assert(row.getString(1) == "news.bbc.co.uk")
    assert(row.getString(2) == "bbc.co.uk")
  }
}
