package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.TextExpressions

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("word shingles: n-grams in order, short docs yield empty") {
    val df = Seq("a b c d", "a").toDF("text")
    val got = df.select(
      TextOps.wordShingles(TextOps.tokens($"text"), 3).as("sh"))
      .as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1).isEmpty)
  }

  test("minhash: identical docs identical sigs; disjoint docs differ") {
    val df = Seq("the quick brown fox jumps", "the quick brown fox jumps",
      "zz yy xx ww vv").toDF("text")
    val sigs = df.select(TextOps.minhashSignature(
        TextOps.wordShingles(TextOps.tokens($"text"), 2), 32).as("sig"))
      .as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
    assert(sigs(0).length == 32)
  }

  test("minhashDedupPairs finds near-duplicates, skips unrelated") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),   // near-dup of 1
      (3L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val pairs = TextOps.minhashDedupPairs(docs, "doc_id", "text",
        shingleN = 2, numPerm = 64, bands = 32, threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("containmentPairs: quoted-whole doc flags asymmetrically; Jaccard would miss it") {
    val small = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, small),                                             // 6 tokens, 5 2-shingles
      (2L, small + " one two three four five six seven eight " +
        "nine ten eleven twelve thirteen fourteen"),           // contains 1 whole
      (3L, "red orange yellow green blue indigo violet"))
      .toDF("doc_id", "text")
    val got = TextOps.containmentPairs(docs, "doc_id", "text",
        shingleN = 2, threshold = 0.9, exhaustive = true)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == Seq((1L, 2L)))
    val (_, _, aInB, bInA) = got.head
    assert(aInB == 1.0)            // every shingle of 1 appears in 2
    assert(bInA < 0.3)             // Jaccard ~= bInA: symmetric detectors miss
    // the LSH candidate mode catches the same pair at this size ratio
    val lsh = TextOps.containmentPairs(docs, "doc_id", "text",
        shingleN = 2, threshold = 0.9, numPerm = 64, bands = 32)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(lsh == Seq((1L, 2L)))
  }

  test("containmentPairs: identical docs contain each other both ways") {
    val docs = Seq(
      (1L, "p q r s t u v w"), (2L, "p q r s t u v w"))
      .toDF("doc_id", "text")
    val got = TextOps.containmentPairs(docs, "doc_id", "text",
        shingleN = 2, threshold = 0.9, exhaustive = true)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 1.0, 1.0)))
  }

  test("nearDupPipeline: exact groups collapse, near-dups found between reps") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (5L, "alpha  beta gamma delta epsilon zeta eta theta"),  // exact dup of 1 (ws-normalized)
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),    // near-dup of 1
      (3L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val (groups, pairs) = TextOps.nearDupPipeline(docs, "doc_id", "text",
      shingleN = 2, numPerm = 64, bands = 32, threshold = 0.3)
    val g = groups.select("keep_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(g == Set((1L, 2L), (2L, 1L), (3L, 1L)))   // 1 absorbs 5; min id kept
    val p = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(p == Set((1L, 2L)))                       // between representatives only
  }

  test("minhashCrossDupPairs pairs across corpora, never within one") {
    val left = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta kappa lambda mu nu"),
      (3L, "one two three four five six seven eight nine ten eleven twelve"),
      (5L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text") // 3 and 5 are dups WITHIN left: must not pair
    val right = Seq(
      (2L, "alpha beta gamma delta epsilon zeta eta theta kappa lambda mu xi"),
      (4L, "totally unrelated content about completely different things here"))
      .toDF("doc_id", "text")
    val got = TextOps.minhashCrossDupPairs(left, right, "doc_id", "text",
        shingleN = 2, numPerm = 64, bands = 32, threshold = 0.3)
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("bigramLogProbScores: hand-computed add-k score, short docs dropped") {
    // "a b c b c": bigrams (a b):1 (b c):2 (c b):1; left counts a:1 b:2 c:1;
    // V=3, k=0.5 -> avg = (ln(1.5/2.5) + 2*ln(2.5/3.5) + ln(1.5/2.5))/4
    val docs = Seq((1L, "a b c b c"), (2L, "solo")).toDF("doc_id", "text")
    val got = TextOps.bigramLogProbScores(docs, "doc_id", "text", k = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(got.toSeq == Seq((1L, 4L, -0.4236)))
    // higher-probability transitions score higher: a doc of common
    // transitions beats a doc of singleton transitions
    val corpus = (Seq.fill(5)("x y") ++ Seq("p q")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val scores = TextOps.bigramLogProbScores(corpus, "doc_id", "text")
      .select("id", "avg_logprob").as[(Long, Double)].collect().toMap
    assert(scores(0L) > scores(5L))
  }

  test("frozen bigram LM: in-domain text outscores out-of-domain, OOV gets smoothing mass") {
    val corpus = Seq.tabulate(5)(i => (i.toLong, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val lm = TextOps.bigramLmTrain(corpus, "doc_id", "text")
    val probe = Seq(
      (100L, "the cat sat on the mat"),     // in-domain
      (101L, "zz qq ww ee rr tt"))          // fully OOV
      .toDF("doc_id", "text")
    val scores = TextOps.bigramLmScore(probe, "doc_id", "text", lm)
      .select("id", "avg_logprob").as[(Long, Double)].collect().toMap
    assert(scores(100L) > scores(101L))
    // OOV bigram AND context: every term is the pure smoothing mass
    // ln(k / (k * V)) = -ln(V); V = 4 contexts (the, cat, sat, on)
    assert(math.abs(scores(101L) - (-math.log(lm.vocabSize))) < 1e-3)
  }

  test("ngramOverlapIds flags any shared n-gram; decontaminate removes those docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a quick brown fox appears in completely new text here"), // shares one 3-gram
      (3L, "nothing in common with anything else at all"))
      .toDF("doc_id", "text")
    val bench = Seq("the quick brown fox runs far away").toDF("btext")
    val idsDf = TextOps.ngramOverlapIds(docs, bench, "doc_id", "text", "btext", n = 3)
    assert(idsDf.as[Long].collect().toSet == Set(1L, 2L))
    // the benchmark gram set must broadcast: corpus side streams, no wide join
    val plan = idsDf.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan)
    val kept = TextOps.decontaminateNgramOverlap(docs, bench, "doc_id", "text", "btext", n = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L))
  }

  test("repeatedPassages flags shared n-gram positions, singletons stay silent") {
    // docs 1 and 2 share the passage "x y z" at different positions;
    // doc 3 repeats a gram only WITHIN itself (1 distinct doc -> silent)
    val docs = Seq(
      (1L, "a b x y z c"),
      (2L, "x y z d e f"),
      (3L, "p q r p q r"))
      .toDF("doc_id", "text")
    val got = TextOps.repeatedPassages(docs, "doc_id", "text", n = 3, minDocs = 2)
      .select("id", "pos").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (2L, 0L)))
  }

  test("dedupIncremental: batch collapse, exact-vs-corpus, near-vs-corpus") {
    val existing = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta kappa lambda mu nu"),
      (2L, "the quick brown fox jumps over the lazy dog every single day"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta kappa lambda mu nu"), // exact corpus dup
      (11L, "alpha beta gamma delta epsilon zeta eta theta kappa lambda mu xi"), // near corpus dup
      (12L, "entirely fresh content about something completely different here"),
      (13L, "entirely  fresh content about something COMPLETELY different here"), // ws/case dup of 12
      (14L, "another genuinely novel document with its own unique words"))
      .toDF("doc_id", "text")
    val kept = TextOps.dedupIncremental(batch, existing, "doc_id", "text",
        shingleN = 2, threshold = 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(12L, 14L))
  }

  test("clipRepeated keeps one canonical copy of a repeated passage (min-id doc)") {
    val docs = Seq(
      (1L, "a b x y z w c"),     // min-id owner of "x y z w": keeps it
      (2L, "x y z w d e f"),     // repeated occurrence: clipped
      (3L, "p q r s t u v"))     // untouched, passes through normalized
      .toDF("doc_id", "text")
    val got = TextOps.clipRepeated(docs, "doc_id", "text", n = 3, minDocs = 2)
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "a b x y z w c")
    assert(got(2L) == "d e f")
    assert(got(3L) == "p q r s t u v")
  }

  test("repeatedSpans chains consecutive flagged positions into one maximal span") {
    // shared passage "x y z w" = two overlapping 3-grams at consecutive
    // positions -> ONE span of 2 grams covering tokens [2, 6) in doc 1
    val docs = Seq(
      (1L, "a b x y z w c"),
      (2L, "x y z w d e f"))
      .toDF("doc_id", "text")
    val got = TextOps.repeatedSpans(docs, "doc_id", "text", n = 3, minDocs = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 6L, 2L), (2L, 0L, 4L, 2L)))
  }

  test("decontaminateNearDup drops exact AND near matches of the benchmark") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta kappa lambda mu nu"),  // near-dup of bench
      (2L, "quick   brown fox jumps over the lazy dog daily says me"),           // exact (ws-normalized)
      (3L, "one two three four five six seven eight nine ten eleven twelve"))    // unrelated
      .toDF("doc_id", "text")
    val bench = Seq(
      "alpha beta gamma delta epsilon zeta eta theta kappa lambda mu xi",
      "quick brown fox jumps over the lazy dog daily says me").toDF("q")
    val kept = TextOps.decontaminateNearDup(docs, bench, "doc_id", "text", "q",
        shingleN = 2, threshold = 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L))
  }

  test("dedup path leaves no Dataset-cache entries behind (no persist leak)") {
    // regression: withSig/reps used Dataset.persist without unpersist —
    // CacheManager entries are strongly held, so every pipeline call from
    // a long-lived serving session leaked cached blocks. They are now
    // localCheckpoints (ContextCleaner-managed); after materializing both
    // outputs the session-level cache must not have grown.
    import org.apache.spark.sql.graftx.datasetCacheIsEmpty
    val before = datasetCacheIsEmpty(spark)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val (groups, pairs) = TextOps.nearDupPipeline(docs, "doc_id", "text",
      shingleN = 2, numPerm = 64, bands = 32, threshold = 0.3)
    groups.count(); pairs.count()
    assert(before && datasetCacheIsEmpty(spark),
      "nearDupPipeline must not register CacheManager entries")
  }

  test("simhash: near-dup docs have small hamming distance") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val df = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "the quick brown fox jumps over the lazy cat again and again",
      "completely unrelated words about spark catalyst expressions here")
      .toDF("text")
    val sigs = df.select(TextExpressions.simhash64(TextOps.tokens($"text")).as("s"))
      .as[Long].collect()
    assert(ham(sigs(0), sigs(1)) < ham(sigs(0), sigs(2)))
  }

  test("simhashNearDupPairs: total recall within the hamming radius") {
    // identical texts -> hamming 0 (must be found: the pigeonhole chunk
    // guarantee, not luck); disjoint texts -> effectively random 64-bit
    // signatures, far outside radius 3
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (7L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val got = TextOps.simhashNearDupPairs(docs, "doc_id", "text",
        shingleN = 2, maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 0), (1L, 7L, 0), (2L, 7L, 0)))
  }

  test("simhashNearDupPairs: maxHamming=0 finds exact-signature twins") {
    // width=64 is the full-signature chunk: the mask must be all-ones
    // (a naive (1L << 64) - 1 wraps to 0 and collapses every bucket)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val got = TextOps.simhashNearDupPairs(docs, "doc_id", "text",
        shingleN = 2, maxHamming = 0)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 0)))
  }

  test("minhashCrossDupPairs: checkpointLeft=true matches the streaming default") {
    val left = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta kappa lambda mu nu"),
      (3L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val right = Seq(
      (2L, "alpha beta gamma delta epsilon zeta eta theta kappa lambda mu xi"),
      (4L, "totally unrelated content about completely different things here"))
      .toDF("doc_id", "text")
    def run(ckpt: Boolean) = TextOps.minhashCrossDupPairs(
        left, right, "doc_id", "text",
        shingleN = 2, numPerm = 64, bands = 32, threshold = 0.3,
        checkpointLeft = ckpt)
      .select("id_l", "id_r", "jaccard").as[(Long, Long, Double)].collect().toSet
    val streamed = run(false)
    assert(streamed == run(true))
    assert(streamed.map(p => (p._1, p._2)) == Set((1L, 2L)))
  }

  test("simhashNearDupPairs rejects radii that don't divide the signature") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextOps.simhashNearDupPairs(docs, "doc_id", "text", maxHamming = 4)
    }
  }

  test("rolling hash is order-sensitive, md5 fingerprint normalizes whitespace") {
    val df = Seq(("a b c", "c b a", "a  b   c")).toDF("x", "y", "z")
    val r = df.select(
      TextExpressions.rolling_hash($"x"), TextExpressions.rolling_hash($"y"),
      TextOps.fingerprintMd5($"x"), TextOps.fingerprintMd5($"z")).head()
    assert(r.getLong(0) != r.getLong(1))      // order matters
    assert(r.getString(2) == r.getString(3))  // whitespace normalized away
  }

  test("bm25: term-dense docs rank first, term-free docs are absent") {
    val docs = Seq(
      (1L, "spark spark spark catalyst"),          // dense in 'spark'
      (2L, "spark runs on a cluster of machines"), // one hit, longer doc
      (3L, "nothing relevant here at all"))
      .toDF("doc_id", "text")
    val got = TextOps.bm25TopK(docs, "doc_id", "text",
        queries = Seq("q1" -> "spark"), k = 10)
      .orderBy("rank")
      .select("id", "rank").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 2L)))  // 3 never scored
  }

  test("bm25: multi-term queries sum per-term contributions") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha gamma"), (3L, "beta gamma"))
      .toDF("doc_id", "text")
    val scores = TextOps.bm25TopK(docs, "doc_id", "text",
        queries = Seq("q" -> "alpha beta"), k = 10)
      .select("id", "score").as[(Long, Double)].collect().toMap
    // doc 1 matches both terms: strictly higher than single-term matches,
    // which tie with each other by symmetry
    assert(scores(1L) > scores(2L) && scores(2L) == scores(3L))
  }

  test("langId picks the language with the strongest stopword signal") {
    val df = Seq("the cat and the dog is in the house",
      "le chat et le chien est pour la maison",
      "qwerty zxcvb").toDF("text")
    val got = df.select(TextOps.langId(TextOps.tokens($"text")).as("l"))
      .as[String].collect().toSeq
    assert(got == Seq("en", "fr", "und"))
  }

  test("redact scrubs urls (first, whole) and emails with typed placeholders") {
    val df = Seq(
      "mail me at a.user+tag@example.co.uk please",
      "see https://ex.com/p?user=x@y.com for info",
      "clean text stays").toDF("text")
    val got = df.select(TextOps.redact($"text").as("r")).as[String].collect().toSeq
    assert(got == Seq(
      "mail me at <EMAIL> please",
      "see <URL> for info",   // the @ inside the URL never leaks as <EMAIL>
      "clean text stays"))
  }

  test("contaminationReport: per-benchmark hit counts, clean items reported at 0") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the dog"),
      (2L, "a quick brown fox jumps over me"),
      (3L, "completely unrelated corpus content here")).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "quick brown fox jumps over everything"),
      (200L, "nothing shared with anyone at all")).toDF("doc_id", "text")
    val got = TextOps.contaminationReport(corpus, bench,
        "doc_id", "text", "doc_id", "text", n = 4)
      .as[(Long, Long)].collect().toMap
    // "quick brown fox jumps" is a shared 4-gram in docs 1 and 2
    assert(got == Map(100L -> 2L, 200L -> 0L))
  }

  test("redactAll: full rule chain with load-bearing order (url > email > ip > phone)") {
    val df = Seq(
      "server at 192.168.1.100 went down",
      "call +1 (555) 123-4567 or 555 867 5309 now",
      "visit http://10.0.0.1/admin today",         // IP inside URL -> one <URL>
      "mail ops@ex.com from 10.1.2.3",
      "clean text stays").toDF("text")
    val got = df.select(TextOps.redactAll($"text").as("r")).as[String].collect().toSeq
    assert(got == Seq(
      "server at <IP> went down",
      "call <PHONE> or <PHONE> now",
      "visit <URL> today",
      "mail <EMAIL> from <IP>",
      "clean text stays"))
    // custom rule lists run in caller order
    val custom = df.limit(1).select(TextOps.redactAll($"text",
      Seq("\\d+" -> "#")).as("r")).as[String].head()
    assert(custom == "server at #.#.#.# went down")
    intercept[IllegalArgumentException] { TextOps.redactAll($"text", Nil) }
  }

  test("repetition ratio flags degenerate docs, zero for all-distinct") {
    val df = Seq("spam spam spam spam", "all words are different").toDF("text")
    val got = df.select(
      TextOps.repetitionRatio(TextOps.tokens($"text")).as("r")).as[Double].collect()
    assert(got(0) == 0.75 && got(1) == 0.0)
  }

  test("decontamination: normalized exact matches flagged and removable") {
    val docs = Seq((1L, "The  Quick fox"), (2L, "unrelated text"),
      (3L, "other content here")).toDF("doc_id", "text")
    val bench = Seq("the quick fox", "benchmark only").toDF("q")
    val flags = TextOps.contaminationFlags(docs, bench, "doc_id", "text", "q")
      .as[(Long, Int)].collect().toMap
    assert(flags == Map(1L -> 1, 2L -> 0, 3L -> 0)) // ws/case-insensitive hit
    val clean = TextOps.decontaminate(docs, bench, "text", "q")
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(2L, 3L))
    // the bloom-prefiltered path returns EXACTLY the broadcast path's rows
    val cleanBloom = TextOps.decontaminateBloom(docs, bench, "text", "q")
      .select("doc_id").as[Long].collect().toSet
    assert(cleanBloom == clean)
    assert(TextOps.decontaminateBloom(docs, bench, "text", "q")
      .columns.toSeq == docs.columns.toSeq) // helper columns dropped
  }

  test("splitLeakage reports only pairs that straddle the split") {
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val asg = Seq((1L, "train"), (2L, "test"),   // leak
                  (3L, "train"), (4L, "train"),  // same split
                  (5L, "test"), (6L, "train"))   // leak (reversed)
      .toDF("doc_id", "split")
    val got = TextOps.splitLeakage(pairs, asg, "doc_id", "split")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (5L, 6L)))
  }

  test("quality features: counts and ratios") {
    val df = Seq("The cat, the dog!").toDF("text")
    val f = TextOps.qualityFeatures($"text")
    val r = df.select(f("n_chars").as("c"), f("n_tokens").as("t"),
      f("punct_ratio").as("p"), f("stopword_ratio").as("s")).head()
    assert(r.getLong(0) == 17 && r.getLong(1) == 4)
    assert(r.getDouble(2) > 0 && r.getDouble(3) == 0.5)
  }

  test("chunkDocs: overlapping windows, stride arithmetic, short docs") {
    val doc = (1 to 10).map(i => s"w$i").mkString(" ") // 10 tokens
    val df = Seq((1L, doc), (2L, "a b")).toDF("doc_id", "text")
    val got = TextOps.chunkDocs(df, "doc_id", "text", chunkSize = 4, overlap = 1)
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    // doc 1: stride 3, nChunks = 1 + ceil((10-4)/3) = 3 -> starts 0,3,6
    assert(got(1L).map(_._3) == Seq("w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    assert(got(1L).map(_._4) == Seq(4L, 4L, 4L))
    // short doc: one partial chunk
    assert(got(2L) == Seq((2L, 0L, "a b", 2L)))
    // boundary tokens shared: consecutive chunks overlap by exactly 1
    assert(got(1L)(0)._3.split(" ").last == got(1L)(1)._3.split(" ").head)
    intercept[IllegalArgumentException] {
      TextOps.chunkDocs(df, "doc_id", "text", chunkSize = 4, overlap = 4)
    }
  }

  test("dedupLines: first occurrence survives, later copies drop, docs reassemble in order") {
    val df = Seq(
      (1L, "alpha\nshared\nomega"),
      (2L, "shared\nunique"),   // "shared" first seen in doc 1 -> dropped here
      (3L, "rep\nrep"),         // within-doc repeat: second copy drops
      (4L, "alpha\nshared"))    // every line already seen -> empty text
      .toDF("doc_id", "text")
    val got = TextOps.dedupLines(df, "doc_id", "text")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, "alpha\nshared\nomega"),
      (2L, "unique"),
      (3L, "rep"),
      (4L, "")))
  }

  test("scriptProfile: dominant script per Unicode block, 'other' below the floor") {
    val df = Seq(
      (1L, "hello latin words here"),
      (2L, "你好世界大家"),          // CJK
      (3L, "привет мир"), // cyrillic
      (4L, "안녕하세요"),                 // hangul
      (5L, "12345 67890 !!!"))                                // no script wins
      .toDF("doc_id", "text")
    val got = TextOps.scriptProfile(df, "doc_id", "text")
      .select("doc_id", "dominant_script").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "latin", 2L -> "cjk", 3L -> "cyrillic",
      4L -> "hangul", 5L -> "other"))
    // ratios are fractions of non-space chars
    val r = TextOps.scriptProfile(df, "doc_id", "text")
      .where($"doc_id" === 1L).select("r_latin").as[Double].head()
    assert(r == 1.0)
  }

  test("gopherQualityFlags: each rule trips on its own pathology") {
    val good = (Seq("the", "with", "have") ++
      (1 to 47).map(i => s"word$i")).mkString(" ")      // 50 words, stopwords ok
    val short = "the with word"                          // fails word count
    val symbols = (Seq("the", "with") ++
      (1 to 40).map(_ => "###") ++ (1 to 8).map(i => s"w$i")).mkString(" ")
    val numeric = (Seq("the", "with") ++
      (1 to 48).map(i => s"$i$i")).mkString(" ")         // words without letters
    val noStop = (1 to 50).map(i => s"word$i").mkString(" ")
    val df = Seq((1L, good), (2L, short), (3L, symbols), (4L, numeric), (5L, noStop))
      .toDF("doc_id", "text")
    val got = TextOps.gopherQualityFlags(df, "doc_id", "text")
      .select("doc_id", "pass_words", "pass_symbols", "pass_alpha",
        "pass_stopwords", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, true, true, true, true, true)))
    assert(!got(2L)._2 && !got(2L)._6)  // short: word count fails
    assert(!got(3L)._3 && !got(3L)._6)  // symbol ratio fails
    assert(!got(4L)._4 && !got(4L)._6)  // alpha-word ratio fails
    assert(!got(5L)._5 && !got(5L)._6)  // stopword floor fails
  }

  test("dedupLines: blank lines always survive, even repeated") {
    val df = Seq((1L, "a\n\nb"), (2L, "\n\nc")).toDF("doc_id", "text")
    val got = TextOps.dedupLines(df, "doc_id", "text")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a\n\nb"), (2L, "\n\nc")))
  }

  test("minhash dedup survives spark.sql.ansi.enabled=true (Spark 4's default)") {
    // the band fold wraps 64-bit arithmetic by intent; as SQL
    // aggregate/multiply it threw ARITHMETIC_OVERFLOW under ANSI — the
    // kernel expression must be immune
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val df = Seq(
        (1L, "the quick brown fox jumps over the lazy dog tonight"),
        (2L, "the quick brown fox jumps over the lazy dog today"),
        (3L, "completely different text with no overlap at all here"))
        .toDF("doc_id", "text")
      val pairs = TextOps.minhashDedupPairs(df, "doc_id", "text",
          shingleN = 2, threshold = 0.3)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(pairs == Set((1L, 2L)))
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("dedupLines: regex-metachar separators are treated literally") {
    val df = Seq((1L, "x|shared|y"), (2L, "shared|z")).toDF("doc_id", "text")
    val got = TextOps.dedupLines(df, "doc_id", "text", sep = "|")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "x|shared|y"), (2L, "z")))
  }

  test("pseudonymize: stable per-entity tags, longest match wins, linkage survives") {
    val df = Seq(
      (1L, "mail bob@x.com and abob@x.com plus bob@x.com again"),
      (2L, "bob@x.com appears here too"),
      (3L, "no addresses at all")).toDF("id", "text")
    val got = df.select($"id",
        TextOps.pseudonymize($"text", TextOps.emailPattern, "EMAIL").as("t"))
      .as[(Long, String)].collect().toMap
    // same entity -> same tag, within and ACROSS documents
    val tag = "<EMAIL:h([0-9a-f]{7})>".r
    val tags1 = tag.findAllMatchIn(got(1L)).map(_.group(1)).toSeq
    assert(tags1.length == 3 && tags1(0) == tags1(2) && tags1(0) != tags1(1))
    assert(tag.findAllMatchIn(got(2L)).map(_.group(1)).toSeq.head == tags1(0))
    // the longer address was not corrupted by its embedded substring
    assert(!got(1L).contains("a<EMAIL:"))
    assert(got(3L) == "no addresses at all")
    // and no raw address survives
    assert(!got(1L).contains("@") && !got(2L).contains("@"))
  }

  test("pseudonymizeAll: rule order matches redactAll — urls swallow credentials first") {
    val df = Seq("see https://u:p@host.com/a and mail me@y.org at 10.0.0.1")
      .toDF("text")
    val out = df.select(TextOps.pseudonymizeAll($"text").as("t")).as[String].head()
    assert(out.contains("<URL:") && out.contains("<EMAIL:") && out.contains("<IP:"))
    // the in-url credential was consumed by the URL rule, not the email rule
    assert(!out.contains("u:p@host"))
    assert(!out.contains("me@y.org") && !out.contains("10.0.0.1"))
  }
}
