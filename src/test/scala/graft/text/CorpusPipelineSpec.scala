package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class CorpusPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("stages drop the right documents in the right order") {
    val docs = Seq(
      (1L, "the cat and the dog is in the house with the mouse"),   // clean en
      (2L, "the cat and  the dog is in the house with the mouse"),  // exact dup of 1 (ws)
      (3L, "le chat et le chien est pour la maison"),               // french -> language
      (4L, "a b"),                                                  // too short -> quality
      (5L, "spam spam spam spam spam spam spam spam is the"),       // repetitive -> quality
      (6L, "the big cat and the dog is in the house with the mouse"), // near-dup of 1
      (7L, "completely different english text that is about the weather for today"),
      (8L, "the benchmark sentence that is in the eval set for it"))
      .toDF("doc_id", "text")
    val bench = Seq("the  BENCHMARK sentence that is in the eval set for it").toDF("text")
    val (clean, audit) = CorpusPipeline.preprocess(
      docs, "doc_id", "text", benchmark = Some(bench),
      CorpusPipeline.Thresholds(nearDupThreshold = 0.4))
    val kept = clean.select("id").as[Long].collect().toSet
    // 3 language, 4+5 quality, 2 exact-dup, 6 near-dup cluster, 8 decontam
    assert(kept == Set(1L, 7L))
    val a = audit.toMap
    assert(a("input") == 8 && a("language") == 7 && a("quality") == 5)
    assert(a("exact_dedup") == 4 && a("near_dedup") == 3 && a("decontaminate") == 2)
  }

  test("v2 stages: unicode normalize feeds dedup, gopher and line dedup audit in order") {
    // doc 2 is doc 1 with every 'a' DECOMPOSED (a + combining acute vs
    // precomposed): only NFC normalization ahead of the fingerprint lets
    // the exact collapse see them as duplicates
    val composed = "the c\u00e1t and the dog is in the house with the mouse"
    val decomposed = "the ca\u0301t and the dog is in the house with the mouse"
    val shortDoc = "the cat with it"  // passes quality minTokens, fails gopher minWords
    val docs = Seq(
      (1L, composed),
      (2L, decomposed),
      (3L, shortDoc),
      (4L, "completely different english text that is about the weather for today"))
      .toDF("doc_id", "text")
    val (clean, audit) = CorpusPipeline.preprocess(
      docs, "doc_id", "text", benchmark = None,
      CorpusPipeline.Thresholds(
        unicodeForm = Some("NFC"),
        gopherMinWords = Some(10),
        minTokens = 3))
    val a = audit.toMap
    assert(a("input") == 4 && a("quality") == 4)
    assert(a("gopher") == 3, s"gopher stage should drop the short doc: $audit")
    assert(a("exact_dedup") == 2,
      s"NFC must fold decomposed onto composed before the fingerprint: $audit")
    assert(clean.select("id").as[Long].collect().toSet == Set(1L, 4L))
    // audit keys appear in pipeline order
    assert(audit.map(_._1) ==
      Seq("input", "language", "quality", "gopher", "exact_dedup", "near_dedup"))
  }

  test("v2 line dedup stage: boilerplate lines drop, emptied docs leave the corpus") {
    val docs = Seq(
      (1L, "the cat and the dog is here\nthe shared boilerplate line with it"),
      (2L, "the shared boilerplate line with it"), // empties out entirely
      (3L, "completely different english text that is about the weather for today"))
      .toDF("doc_id", "text")
    val (clean, audit) = CorpusPipeline.preprocess(
      docs, "doc_id", "text", benchmark = None,
      CorpusPipeline.Thresholds(lineDedupSep = Some("\n"), minTokens = 3))
    val a = audit.toMap
    assert(a("quality") == 3 && a("line_dedup") == 2,
      s"doc 2 should empty out and drop: $audit")
    assert(clean.select("id").as[Long].collect().toSet == Set(1L, 3L))
    // doc 1 keeps its first-occurrence copy of the shared line
    val t1 = clean.where($"id" === 1L).select("text").as[String].head()
    assert(t1.contains("the shared boilerplate line with it"))
  }

  test("decontamination catches a benchmark twin containing a URL/email") {
    // regression: the corpus text is redacted BEFORE decontamination, so
    // the benchmark side must be redacted identically or a contaminated
    // doc whose benchmark twin contains a URL/email escapes removal
    val docs = Seq(
      (1L, "visit https://eval.example.com for the benchmark answer key in the set"),
      (2L, "completely different english text that is about the weather for today"))
      .toDF("doc_id", "text")
    val bench = Seq(
      "visit https://eval.example.com for the benchmark answer key in the set")
      .toDF("text")
    val (clean, audit) = CorpusPipeline.preprocess(
      docs, "doc_id", "text", benchmark = Some(bench))
    assert(clean.select("id").as[Long].collect().toSet == Set(2L))
    assert(audit.toMap.apply("decontaminate") == 1)
  }

  test("decontamination catches a decomposed-unicode benchmark twin under NFC") {
    // the corpus is NFC-normalized upstream, so the benchmark side must
    // pass through the SAME normalization before the fingerprint compare
    // — a decomposed benchmark twin of a precomposed corpus doc would
    // otherwise fingerprint differently and escape removal
    val composed = "the cát and the dog is in the house with the mouse"
    val decomposed = "the cát and the dog is in the house with the mouse"
    val docs = Seq(
      (1L, composed),
      (2L, "completely different english text that is about the weather for today"))
      .toDF("doc_id", "text")
    val bench = Seq(decomposed).toDF("text")
    val (clean, audit) = CorpusPipeline.preprocess(
      docs, "doc_id", "text", benchmark = Some(bench),
      CorpusPipeline.Thresholds(unicodeForm = Some("NFC")))
    assert(clean.select("id").as[Long].collect().toSet == Set(2L),
      s"decomposed benchmark twin must be caught under NFC: $audit")
    assert(audit.toMap.apply("decontaminate") == 1)
  }

  test("optional n-gram stage drops partial-overlap contamination the others pass") {
    // doc 1 embeds one benchmark 5-gram inside otherwise-unique text:
    // fingerprints differ, doc-level Jaccard is far below the near-dup
    // threshold — only the n-gram stage catches it
    val docs = Seq(
      (1L, "the story continues and it mentions secret benchmark answer phrase four of the many puzzles in that archive"),
      (2L, "completely different english text that is about the weather for today"))
      .toDF("doc_id", "text")
    val bench = Seq(
      "the eval set contains secret benchmark answer phrase four among its questions")
      .toDF("text")
    val off = CorpusPipeline.preprocess(docs, "doc_id", "text",
      benchmark = Some(bench))
    assert(off._1.select("id").as[Long].collect().toSet == Set(1L, 2L))
    val (clean, audit) = CorpusPipeline.preprocess(docs, "doc_id", "text",
      benchmark = Some(bench),
      t = CorpusPipeline.Thresholds(ngramOverlapN = Some(5)))
    assert(clean.select("id").as[Long].collect().toSet == Set(2L))
    val m = audit.toMap
    assert(m("decontaminate") == 2 && m("decontaminate_ngram") == 1)
  }

  test("dedup guarantee: no high-similarity pair survives, no family drops to zero") {
    // 8 families of 5 near-identical variants (pairwise Jaccard ~0.9,
    // far above the LSH detection floor, so recall is deterministic-1):
    // after the pipeline, survivors must be pairwise dissimilar by a
    // brute-force shingle check, and every family must keep >= 1 doc
    val families = (0 until 8).map(f =>
      s"family $f document is about the topic number $f with shared words " +
        s"alpha$f beta$f gamma$f delta$f epsilon$f zeta$f eta$f theta$f")
    val docs = (for { f <- 0 until 8; v <- 0 until 5 } yield
      ((f * 10 + v).toLong, families(f) + s" variant$v")).toDF("doc_id", "text")
    val (clean, _) = CorpusPipeline.preprocess(docs, "doc_id", "text")
    val survivors = clean.select("id", "text").as[(Long, String)].collect()
    // every family keeps at least one representative (no over-dedup)
    assert((0 until 8).forall(f => survivors.exists(_._1 / 10 == f)))
    // no surviving pair is still a near-duplicate (brute-force verify,
    // independent of the MinHash machinery under test)
    def shingles(t: String): Set[String] = {
      val toks = t.toLowerCase.split("\\s+").toSeq
      toks.sliding(3).map(_.mkString(" ")).toSet
    }
    for {
      (ida, ta) <- survivors; (idb, tb) <- survivors if ida < idb
      sa = shingles(ta); sb = shingles(tb)
    } {
      val j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(j < 0.8, s"survivors $ida and $idb still near-identical (jaccard $j)")
    }
  }

  test("audit rides the checkpoint: the input parquet is scanned exactly once") {
    // the round-8 one-pass audit: keep-flags as columns + observe()
    // before the filter means language/quality predicates run on the
    // ONE scan that feeds the exact-collapse checkpoint — a second
    // SQL execution scanning the source (the old separate audit agg)
    // fails this test
    val dir = java.nio.file.Files.createTempDirectory("graft_cp_scan_").toString
    // per-doc token runs keep pairwise Jaccard low — every doc survives,
    // so the count below also guards against over-dedup
    (0 until 50).map(i =>
        (i.toLong, s"the document $i " +
          s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i " +
          s"iota$i kappa$i lambda$i and the english text"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)
    val scans = new java.util.concurrent.atomic.AtomicInteger(0)
    val pat = java.util.regex.Pattern.compile(java.util.regex.Pattern.quote(dir))
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(event: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        event match {
          case e: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            val m = pat.matcher(e.physicalPlanDescription)
            while (m.find()) scans.incrementAndGet()
          case _ =>
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val (clean, audit) = CorpusPipeline.preprocess(docs, "doc_id", "text")
      assert(clean.count() == 50)
      assert(audit.toMap.apply("input") == 50)
      // listener delivery is async — give the bus a moment to drain
      val deadline = System.nanoTime() + 5_000_000_000L
      while (scans.get() < 1 && System.nanoTime() < deadline) Thread.sleep(50)
      Thread.sleep(500)
      assert(scans.get() == 1, s"input scanned ${scans.get()} times, expected 1")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("redaction is applied to the surviving text") {
    val docs = Seq(
      (1L, "mail a.user@example.com about the cat and the dog in the house"))
      .toDF("doc_id", "text")
    val (clean, _) = CorpusPipeline.preprocess(docs, "doc_id", "text")
    assert(clean.select("text").as[String].head().contains("<EMAIL>"))
  }

  test("preprocessHtml: crawl pages extract, then flow through the same stages") {
    // the same corpus shape as the first test, wrapped in markup with
    // link-dense nav chrome that extraction must strip before any
    // language/quality/dedup stage sees the text
    val texts = Seq(
      (1L, "the cat and the dog is in the house with the mouse"),
      (2L, "the cat and  the dog is in the house with the mouse"),
      (3L, "le chat et le chien est pour la maison"),
      (6L, "the big cat and the dog is in the house with the mouse"),
      (7L, "completely different english text that is about the weather for today"))
    val pages = texts.map { case (id, t) =>
      (id, s"<html><head><script>nav();</script></head><body><p>$t</p>" +
        "<div class=\"nav\"><a href=\"/\">home</a> <a href=\"/x\">login menu</a>" +
        "</div></body></html>")
    }.toDF("doc_id", "html")
    val (clean, audit) = CorpusPipeline.preprocessHtml(
      pages, "doc_id", "html",
      t = CorpusPipeline.Thresholds(nearDupThreshold = 0.4),
      minParaStopRatio = 0.1)
    val kept = clean.select("id").as[Long].collect().toSet
    // same verdicts as the plain-text pipeline: 3 language, 2 exact-dup,
    // 6 near-dup; the nav chrome influenced nothing
    assert(kept == Set(1L, 7L))
    val a = audit.toMap
    assert(a("input") == 5 && a("language") == 4)
    // and the surviving text is the EXTRACTED prose, not markup
    val t1 = clean.where($"id" === 1L).select("text").as[String].head()
    assert(t1 == "the cat and the dog is in the house with the mouse")
  }

  private def conv(turns: (String, String)*): String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    turns.map { case (r, c) => s"""{"role":"${esc(r)}","content":"${esc(c)}"}""" }
      .mkString("""{"messages":[""", ",", "]}")
  }

  test("preprocessChat: parse, schema filter, per-turn scrub, render, dedup") {
    val docs = Seq(
      (1L, conv("user" -> "mail me at a.user@example.com please",
        "assistant" -> "sent to https://ex.com/inbox now")),
      (2L, conv("user" -> "mail me at a.user@example.com  please",   // ws-variant: same render post-normalize? no - render keeps raw spacing
        "assistant" -> "sent to https://ex.com/inbox now")),
      (3L, conv("user" -> "hello", "bot" -> "unknown role")),        // schema: bad role
      (4L, conv("user" -> "only a user turn no assistant")),         // schema: no assistant
      (5L, "{not valid json"),                                       // schema: malformed
      (6L, conv("user" -> "mail me at a.user@example.com please",    // exact dup of 1
        "assistant" -> "sent to https://ex.com/inbox now")))
      .toDF("doc_id", "js")
    val (clean, audit) = CorpusPipeline.preprocessChat(docs, "doc_id", "js")
    val kept = clean.select("id", "text").as[(Long, String)].collect().toMap
    val a = audit.toMap
    assert(a("input") == 6 && a("schema_valid") == 3) // 1, 2, 6 pass schema
    // 6 collapses into 1 (identical render); 2 differs only by inner
    // double-space, which the FINGERPRINT normalizes away -> collapses too
    assert(a("exact_dedup") == 1 && kept.keySet == Set(1L))
    // PII scrubbed INSIDE the turns, role markers intact
    val t1 = kept(1L)
    assert(t1 == "<|user|>mail me at <EMAIL> please" +
      "<|assistant|>sent to <URL> now")
  }

  test("preprocessChat: pseudonymize keeps entity linkage across conversations") {
    val docs = Seq(
      (1L, conv("user" -> "write to a@x.com and b@y.org",
        "assistant" -> "done")),
      (2L, conv("user" -> "again a@x.com please", "assistant" -> "ok")))
      .toDF("doc_id", "js")
    val (clean, _) = CorpusPipeline.preprocessChat(
      docs, "doc_id", "js", pseudonymize = true)
    val got = clean.select("id", "text").as[(Long, String)].collect().toMap
    val tag = "<EMAIL:h[0-9a-f]{7}>".r
    val tags1 = tag.findAllIn(got(1L)).toSeq
    val tags2 = tag.findAllIn(got(2L)).toSeq
    assert(tags1.size == 2 && tags1.distinct.size == 2) // two entities, two tags
    assert(tags2.size == 1 && tags2.head == tags1.head) // SAME entity -> SAME tag
  }

  test("preprocessChat with ctxLen: packed segments tile the deduped renders exactly") {
    val docs = (1L to 6L).map(i => (i,
      conv("user" -> s"question number $i about the weather today",
        "assistant" -> s"answer number $i with several more words attached")))
      .toDF("doc_id", "js")
    val (segs, audit) = CorpusPipeline.preprocessChat(
      docs, "doc_id", "js", ctxLen = Some(16))
    assert(audit.toMap.apply("exact_dedup") == 6)
    val rows = segs.select("seq_id", "id", "seq_start", "n_tokens")
      .as[(Long, Long, Long, Long)].collect()
    // per window, segments tile [0, ctxLen) contiguously
    rows.groupBy(_._1).foreach { case (seq, ss) =>
      val sorted = ss.sortBy(_._3)
      assert(sorted.head._3 == 0L)
      sorted.sliding(2).foreach {
        case Array(x, y) => assert(x._3 + x._4 == y._3, s"window $seq gap")
        case _ =>
      }
    }
    // per doc, segment token counts sum to the doc's token count
    val perDoc = rows.groupBy(_._2).view.mapValues(_.map(_._4).sum)
    assert(perDoc.values.forall(_ > 0) && perDoc.size == 6)
  }
}
