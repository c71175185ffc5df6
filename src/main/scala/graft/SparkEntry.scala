package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dsl.FilterDsl
import graft.ops.{Clean, Projection, Reshape, Windows}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, with a DuckDB-equivalent `oracleSql` where the operator is
  * SQL-expressible. Operator IDs (S*, P*, J*, A*, W*, R*, O*, F*, X*) refer
  * to SURVEY.md §2's inventory tables.
  */
object SparkEntry {

  /** Table loader. The driver has shipped `events.ts` as both INT64
    * TIMESTAMP(NANOS) (arrives as long under
    * spark.sql.legacy.parquet.nanosAsLong, converted here with floor
    * ns->us division — identical to DuckDB's TIMESTAMP_NS -> TIMESTAMP
    * cast) and TIMESTAMP(MICROS) with no tz (arrives as TIMESTAMP_NTZ,
    * passed through; NTZ-rejecting call sites like unix_micros cast to
    * TIMESTAMP locally, a wall-clock identity under the pinned UTC
    * session timezone). Oracle comparisons stay exact either way. */
  private def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (df.schema.fields.exists(f => f.name == "ts" &&
        f.dataType == org.apache.spark.sql.types.LongType))
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }

  private val xxh64TokenOracleCommon: String =
    """WITH tok AS (SELECT doc_id, unnest(generate_series(0, 9)) AS i FROM documents),
         ts AS (SELECT doc_id, 't' || doc_id || '_' || i || repeat('p', i::INT) AS t FROM tok),
         hb AS (SELECT doc_id, len(t)::HUGEINT AS n,
             [unicode(substr(t, k, 1))::HUGEINT for k in generate_series(1, len(t))] AS bs
           FROM ts),
         lanes AS (SELECT doc_id, n,
             [bs[(8*c+1)::INT] + bs[(8*c+2)::INT]*256 + bs[(8*c+3)::INT]*65536
              + bs[(8*c+4)::INT]*16777216 + bs[(8*c+5)::INT]*4294967296
              + bs[(8*c+6)::INT]*1099511627776 + bs[(8*c+7)::INT]*281474976710656
              + bs[(8*c+8)::INT]*72057594037927936
              for c in generate_series(0, (n//8)::BIGINT - 1)] AS l8,
             CASE WHEN n % 8 >= 4 THEN
               [bs[((n//8)*8+1)::INT] + bs[((n//8)*8+2)::INT]*256
                + bs[((n//8)*8+3)::INT]*65536 + bs[((n//8)*8+4)::INT]*16777216]
             ELSE CAST([] AS HUGEINT[]) END AS l4,
             list_slice(bs, ((n//8)*8 + CASE WHEN n % 8 >= 4 THEN 4 ELSE 0 END + 1)::INT, len(bs)) AS tl
           FROM hb),
         s8 AS (SELECT doc_id, l4, tl,
             list_reduce([(42 + 2870177450012600261 + n) % 18446744073709551616] || l8,
               (h, l) -> (((((((xor(h, (((((((((l) % 4294967296) * (14029467366897019727) + ((((l) // 4294967296) * (14029467366897019727)) % 4294967296) * 4294967296) % 18446744073709551616) * 2147483648) % 18446744073709551616 + (((((l) % 4294967296) * (14029467366897019727) + ((((l) // 4294967296) * (14029467366897019727)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * (11400714785074694791) + ((((((((((l) % 4294967296) * (14029467366897019727) + ((((l) // 4294967296) * (14029467366897019727)) % 4294967296) * 4294967296) % 18446744073709551616) * 2147483648) % 18446744073709551616 + (((((l) % 4294967296) * (14029467366897019727) + ((((l) // 4294967296) * (14029467366897019727)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) // 4294967296) * (11400714785074694791)) % 4294967296) * 4294967296) % 18446744073709551616)) * 134217728) % 18446744073709551616 + ((xor(h, (((((((((l) % 4294967296) * (14029467366897019727) + ((((l) // 4294967296) * (14029467366897019727)) % 4294967296) * 4294967296) % 18446744073709551616) * 2147483648) % 18446744073709551616 + (((((l) % 4294967296) * (14029467366897019727) + ((((l) // 4294967296) * (14029467366897019727)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * (11400714785074694791) + ((((((((((l) % 4294967296) * (14029467366897019727) + ((((l) // 4294967296) * (14029467366897019727)) % 4294967296) * 4294967296) % 18446744073709551616) * 2147483648) % 18446744073709551616 + (((((l) % 4294967296) * (14029467366897019727) + ((((l) // 4294967296) * (14029467366897019727)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) // 4294967296) * (11400714785074694791)) % 4294967296) * 4294967296) % 18446744073709551616)) // 137438953472))) % 4294967296) * (11400714785074694791) + (((((((xor(h, (((((((((l) % 4294967296) * (14029467366897019727) + ((((l) // 4294967296) * (14029467366897019727)) % 4294967296) * 4294967296) % 18446744073709551616) * 2147483648) % 18446744073709551616 + (((((l) % 4294967296) * (14029467366897019727) + ((((l) // 4294967296) * (14029467366897019727)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * (11400714785074694791) + ((((((((((l) % 4294967296) * (14029467366897019727) + ((((l) // 4294967296) * (14029467366897019727)) % 4294967296) * 4294967296) % 18446744073709551616) * 2147483648) % 18446744073709551616 + (((((l) % 4294967296) * (14029467366897019727) + ((((l) // 4294967296) * (14029467366897019727)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) // 4294967296) * (11400714785074694791)) % 4294967296) * 4294967296) % 18446744073709551616)) * 134217728) % 18446744073709551616 + ((xor(h, (((((((((l) % 4294967296) * (14029467366897019727) + ((((l) // 4294967296) * (14029467366897019727)) % 4294967296) * 4294967296) % 18446744073709551616) * 2147483648) % 18446744073709551616 + (((((l) % 4294967296) * (14029467366897019727) + ((((l) // 4294967296) * (14029467366897019727)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) % 4294967296) * (11400714785074694791) + ((((((((((l) % 4294967296) * (14029467366897019727) + ((((l) // 4294967296) * (14029467366897019727)) % 4294967296) * 4294967296) % 18446744073709551616) * 2147483648) % 18446744073709551616 + (((((l) % 4294967296) * (14029467366897019727) + ((((l) // 4294967296) * (14029467366897019727)) % 4294967296) * 4294967296) % 18446744073709551616) // 8589934592))) // 4294967296) * (11400714785074694791)) % 4294967296) * 4294967296) % 18446744073709551616)) // 137438953472))) // 4294967296) * (11400714785074694791)) % 4294967296) * 4294967296) % 18446744073709551616 + 9650029242287828579) % 18446744073709551616) AS h FROM lanes),
         s4 AS (SELECT doc_id, tl,
             list_reduce([h] || l4,
               (h, l) -> (((((((xor(h, (((l) % 4294967296) * (11400714785074694791) + ((((l) // 4294967296) * (11400714785074694791)) % 4294967296) * 4294967296) % 18446744073709551616)) * 8388608) % 18446744073709551616 + ((xor(h, (((l) % 4294967296) * (11400714785074694791) + ((((l) // 4294967296) * (11400714785074694791)) % 4294967296) * 4294967296) % 18446744073709551616)) // 2199023255552))) % 4294967296) * (14029467366897019727) + (((((((xor(h, (((l) % 4294967296) * (11400714785074694791) + ((((l) // 4294967296) * (11400714785074694791)) % 4294967296) * 4294967296) % 18446744073709551616)) * 8388608) % 18446744073709551616 + ((xor(h, (((l) % 4294967296) * (11400714785074694791) + ((((l) // 4294967296) * (11400714785074694791)) % 4294967296) * 4294967296) % 18446744073709551616)) // 2199023255552))) // 4294967296) * (14029467366897019727)) % 4294967296) * 4294967296) % 18446744073709551616 + 1609587929392839161) % 18446744073709551616) AS h FROM s8),
         sb AS (SELECT doc_id,
             list_reduce([h] || tl,
               (h, l) -> ((((((xor(h, (l * 2870177450012600261) % 18446744073709551616)) * 2048) % 18446744073709551616 + ((xor(h, (l * 2870177450012600261) % 18446744073709551616)) // 9007199254740992))) % 4294967296) * (11400714785074694791) + (((((((xor(h, (l * 2870177450012600261) % 18446744073709551616)) * 2048) % 18446744073709551616 + ((xor(h, (l * 2870177450012600261) % 18446744073709551616)) // 9007199254740992))) // 4294967296) * (11400714785074694791)) % 4294967296) * 4294967296) % 18446744073709551616) AS h FROM s4),
         av AS (SELECT doc_id, xor(h, h // 8589934592) AS a1 FROM sb),
         av2 AS (SELECT doc_id, (((a1) % 4294967296) * (14029467366897019727) + ((((a1) // 4294967296) * (14029467366897019727)) % 4294967296) * 4294967296) % 18446744073709551616 AS a2 FROM av),
         av3 AS (SELECT doc_id, xor(a2, a2 // 536870912) AS a3 FROM av2),
         av4 AS (SELECT doc_id, (((a3) % 4294967296) * (1609587929392839161) + ((((a3) // 4294967296) * (1609587929392839161)) % 4294967296) * 4294967296) % 18446744073709551616 AS a4 FROM av3),
         fin AS (SELECT doc_id, xor(a4, a4 // 4294967296) AS h FROM av4)"""

  /** Shared DuckDB prefix for the q_x_html_* oracles: synthesizes the
    * SAME page as [[synthHtml]] and mirrors [[graft.text.Html.stripTags]]
    * rule for rule (same RE2-safe patterns, same order), ending at the
    * `ex(doc_id, html, txt)` CTE the per-query SELECTs build on. */
  /** Shared DuckDB prefix for the q_x_kcenter* oracles: unrolls the
    * k-center greedy recurrence (seed = min vec_id; each step argmax of
    * the running least squared-L2 distance, ties to the smaller id) to
    * `k` center CTEs c1..ck, ending with `cs(sel_rank, cid, cv, d)`. */
  private def kcenterOracleCommon(k: Int): String = {
    def l2(a: String, b: String) =
      s"list_sum(list_transform(generate_series(1, 64), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])))"
    val sb = new StringBuilder(
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         c1 AS (SELECT vec_id, v, 0.0 AS d FROM e ORDER BY vec_id LIMIT 1),
         d1 AS (SELECT e.vec_id, e.v, """ + l2("e.v", "c1.v") +
        """ AS d FROM e CROSS JOIN c1 WHERE e.vec_id <> c1.vec_id)""")
    for (i <- 2 to k) {
      sb.append(s""",
         c$i AS (SELECT vec_id, v, d FROM d${i - 1} ORDER BY d DESC, vec_id LIMIT 1)""")
      if (i < k) sb.append(s""",
         d$i AS (SELECT p.vec_id, p.v, least(p.d, ${l2("p.v", s"c$i.v")}) AS d
           FROM d${i - 1} p CROSS JOIN c$i WHERE p.vec_id <> c$i.vec_id)""")
    }
    sb.append((1 to k).map(i =>
      s""",
         x$i AS (SELECT $i AS sel_rank, vec_id AS cid, v AS cv, d FROM c$i)""").mkString)
    sb.append(s""",
         cs AS (${(1 to k).map(i => s"SELECT * FROM x$i").mkString(" UNION ALL ")})""")
    sb.toString
  }

  private val htmlOracleCommon: String = raw"""WITH h AS (SELECT doc_id,
         '<html><head><title>Doc ' || doc_id || '</title><script type="text/javascript">var x = 1 < 2;</script><style>.nav{color:red}</style></head><body><h1>'
         || substr(text, 1, 30) || '</h1><p>' || text ||
         ' &amp; more</p><!-- hidden --><div class="nav"><a href="/">home</a> <a href="/login">login menu</a></div></body></html>' AS html
       FROM documents),
       s1 AS (SELECT doc_id, html, regexp_replace(regexp_replace(regexp_replace(html,
            '(?i)<script\b[^>]*>[\s\S]*?</script>', '', 'g'),
            '(?i)<style\b[^>]*>[\s\S]*?</style>', '', 'g'),
            '<!--[\s\S]*?-->', '', 'g') AS t FROM h),
       s2 AS (SELECT doc_id, html, regexp_replace(regexp_replace(t,
            '(?i)</?(?:p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|header|footer|nav|blockquote|pre)\b[^>]*>', chr(10), 'g'),
            '<[^>]+>', ' ', 'g') AS t FROM s1),
       s3 AS (SELECT doc_id, html, regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
            '&nbsp;', ' ', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'),
            '&quot;', '"', 'g'), '&#39;', '''', 'g'), '&amp;', '&', 'g') AS t FROM s2),
       ex AS (SELECT doc_id, html,
            trim(regexp_replace(regexp_replace(t, '[ \t\r]+', ' ', 'g'), ' ?\n[ \n]*', chr(10), 'g')) AS txt
       FROM s3)"""

  /** A JSONL row synthesized from documents fields; every 3rd row
    * carries an `extra` key (Spark side: to_json's default
    * ignoreNullFields drops the null branch; oracle side: explicit
    * CASE) — the fixture for the JSON-profiling queries. */
  private def synthJsonl: org.apache.spark.sql.Column =
    to_json(struct(col("doc_id").as("id"), col("lang"), col("text"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit("x"))
        .otherwise(lit(null).cast("string")).as("extra")))

  /** A chat transcript synthesized from documents row fields: system
    * turn, user turn (first 8 tokens), assistant turn (the rest) —
    * with every 7th conversation given an unknown role and short docs
    * an empty assistant turn, so the validity verdict has real
    * negatives. The oracle builds the same conversation with DuckDB's
    * JSON functions; queries compare PARSED fields, so engine-specific
    * JSON spacing cannot matter. */
  private def synthChat: org.apache.spark.sql.Column = {
    val tk = graft.text.TextOps.tokens(col("text"))
    to_json(struct(array(
      struct(lit("system").as("role"), lit("be helpful").as("content")),
      struct(lit("user").as("role"),
        array_join(slice(tk, 1, 8), " ").as("content")),
      struct(when(pmod(col("doc_id"), lit(7)) === 0, "bot")
          .otherwise("assistant").as("role"),
        array_join(slice(tk, lit(9), greatest(size(tk) - 8, lit(0))), " ")
          .as("content"))).as("messages")))
  }

  /** [[synthChat]] with PII planted per turn — an email in the user
    * content, a URL in the assistant content — so the chat PIPELINE's
    * per-turn scrub stage has real work to hash-gate. Validity
    * negatives survive: every 7th conversation still carries the
    * unknown role, and one-token docs yield a NULL assistant content
    * (element_at past the end), both dropped by the schema filter. */
  private def synthChatPii: org.apache.spark.sql.Column = {
    val tk = graft.text.TextOps.tokens(col("text"))
    to_json(struct(array(
      struct(lit("system").as("role"), lit("be helpful").as("content")),
      struct(lit("user").as("role"),
        concat(array_join(slice(tk, 1, 8), " "), lit(" mail "),
          element_at(tk, 1), lit("@example.com")).as("content")),
      struct(when(pmod(col("doc_id"), lit(7)) === 0, "bot")
          .otherwise("assistant").as("role"),
        concat(array_join(slice(tk, lit(9), greatest(size(tk) - 8, lit(0))), " "),
          lit(" see https://ex.com/"), element_at(tk, 2)).as("content")))
      .as("messages")))
  }

  /** Shared DuckDB prefix for the q_x_chat_* oracles — the same
    * conversation as [[synthChat]], ending at `conv(doc_id, js)`. */
  private val chatOracleCommon: String = """WITH toks AS (SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
       FROM documents),
       conv AS (SELECT doc_id, to_json(struct_pack(
           messages := [
             struct_pack(role := 'system', content := 'be helpful'),
             struct_pack(role := 'user', content := array_to_string(tk[1:8], ' ')),
             struct_pack(role := CASE WHEN doc_id % 7 = 0 THEN 'bot' ELSE 'assistant' END,
                         content := array_to_string(tk[9:len(tk)], ' '))
           ])) AS js FROM toks)"""

  /** A web page synthesized from documents row fields — script + style
    * + comment + entity + link-dense nav chrome around the row's text.
    * The oracle SQL builds the SAME string, so the q_x_html_* queries
    * hash-gate the extraction chain end to end (the fakePng discipline
    * applied to markup). */
  private def synthHtml: org.apache.spark.sql.Column = concat(
    lit("<html><head><title>Doc "), col("doc_id").cast("string"),
    lit("</title><script type=\"text/javascript\">var x = 1 < 2;</script>" +
      "<style>.nav{color:red}</style></head><body><h1>"),
    substring(col("text"), 1, 30),
    lit("</h1><p>"), col("text"),
    lit(" &amp; more</p><!-- hidden --><div class=\"nav\">" +
      "<a href=\"/\">home</a> <a href=\"/login\">login menu</a>" +
      "</div></body></html>"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Pricing-summary style aggregation: scan -> pushed filter -> hash agg. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_a1_pricing_summary")(spark, "/root/testdata/sf0.001")

  // ------------------------------------------------------------------
  // Parity queries (SURVEY.md §2). Aliases match oracleSql exactly —
  // the driver's compare sorts columns by name and hashes values.
  // ------------------------------------------------------------------

  /** Build a map from pairs, throwing on duplicate keys — a plain Map
    * literal silently keeps the LAST duplicate, which once shipped an
    * old query under a new oracle (both named q_x_contamination_report)
    * and dropped the other entirely. */
  /** One-time [[graft.text.DedupIndex]] build per sf dir for
    * q_x_dedup_incremental_idx: the index is PERSISTENT state in
    * production — built once, probed every batch — so repeated query
    * runs measure the recurring per-batch probe, with the one-time
    * build amortized exactly as it is in steady state. */
  private val dedupIdxCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** q_x_dedup_incremental_idx's MinHash/banding config: maxBucket
    * uncapped so the probe matches the (uncapped) exact-semantics
    * oracle; production keeps the default cap. */
  private val dedupIdxParams: graft.text.DedupIndex.Params =
    graft.text.DedupIndex.Params(maxBucket = 1 << 20)

  /** The per-dir persisted index for q_x_dedup_incremental_idx, built
    * on first use (index state is persistent in production — built
    * once, probed every batch — so repeated runs measure the recurring
    * probe with the build amortized exactly as in steady state). */
  private def dedupIdxFor(s: SparkSession, dir: String): String =
    dedupIdxCache.computeIfAbsent(dir, _ => {
      val d = java.nio.file.Files.createTempDirectory("graft_didx_q_")
        .resolve("index").toString
      val ex = t(s, dir, "documents")
        .where(pmod(col("doc_id"), lit(10)) =!= 3)
        .select(col("doc_id"), col("text"))
      graft.text.DedupIndex.buildFrom(ex, d, "doc_id", "text", dedupIdxParams)
      d
    })

  /** True once [[prewarm]] (or a first run of
    * q_x_dedup_incremental_idx) has built the index for `dir` — the
    * bench asserts this before its timed runs so the one-time build can
    * never bleed into a timed probe. */
  def dedupIdxWarm(dir: String): Boolean = dedupIdxCache.containsKey(dir)


  /** Copy a parquet input (single file at testdata scale, a directory
    * of part files for synthesized 10x corpora) into a streaming
    * source dir — stream queries read it as a file stream. */
  private def copyParquetInput(srcPath: String, dstDir: java.nio.file.Path): Unit = {
    val src = java.nio.file.Paths.get(srcPath)
    if (java.nio.file.Files.isDirectory(src)) {
      val listing = java.nio.file.Files.list(src)
      try {
        val it = listing.iterator()
        var i = 0
        while (it.hasNext) {
          val f = it.next()
          if (f.getFileName.toString.endsWith(".parquet")) {
            java.nio.file.Files.copy(f, dstDir.resolve(f"part_$i%05d.parquet"))
            i += 1
          }
        }
      } finally listing.close()
    } else java.nio.file.Files.copy(src, dstDir.resolve(src.getFileName))
  }

  /** Stream-built index dirs for the stream-proof queries, built once
    * per (dir) — the same steady-state amortization as [[winnowIdxFor]]
    * / the dedup prewarm (r8 protocol): production builds state once
    * and probes it every batch, so timed runs measure the probe; the
    * full stream-build still runs (and is oracle-gated) on the first
    * use and in every Verify run. */
  private val streamWinnowIdxCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val streamAnnIdxCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The documents stream-read schema shared by every file-stream
    * query (readStream needs an explicit schema). */
  private val docsStreamSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")

  private val winnowIdxCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The per-dir persisted winnow index for q_x_winnow_probe_idx
    * (corpus side = ids >= 50), built on first use — same steady-state
    * amortization as [[dedupIdxFor]]: the index is built once in
    * production and probed every batch, so timed runs measure the
    * recurring probe. */
  private def winnowIdxFor(s: SparkSession, dir: String): String =
    winnowIdxCache.computeIfAbsent(dir, _ => {
      val d = java.nio.file.Files.createTempDirectory("graft_widx_q_")
        .resolve("index").toString
      graft.text.WinnowIndex.ingestBatch(s, d,
        t(s, dir, "documents").where(col("doc_id") >= 50),
        "doc_id", "text")
      d
    })

  /** PCA model for q_x_pca_trace / q_x_pca_project, fitted once per
    * (dir, dims) — PCA is served-model state in production (fit on a
    * corpus snapshot, project every later batch), so repeated runs
    * measure the projection with the fit amortized exactly as in
    * steady state. The fit itself stays a timed, oracle-gated cost via
    * q_x_cov_matrix (the same single aggregation). */
  private val pcaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), graft.vec.Reduce.PcaModel]()
  private def pcaFor(s: SparkSession, dir: String, dims: Int): graft.vec.Reduce.PcaModel =
    pcaCache.computeIfAbsent((dir, dims), _ =>
      graft.vec.Reduce.pca(t(s, dir, "embeddings"), "embedding", dims))

  /** Queries the bench SKIPS (and names in its JSON under
    * `verify_only_skipped` — never silently): correctness-machinery
    * proofs whose runtime is deliberately-redundant maintenance
    * (mid-stream compaction + checkpoint restart), not an operator's
    * throughput. They still run — and hash-match — under the Verify
    * correctness gate on every round. */
  val benchVerifyOnly: Set[String] = Set("q_x_stream_pipeline_compacted",
    "q_x_stream_pipeline_neardup_compacted", "q_x_stream_pipeline_managed",
    "q_store_lease_writer", "q_x_substr_index")

  /** One-time bench warm-up for queries with PERSISTENT setup state:
    * builds the [[graft.text.DedupIndex]] for `dir` (the steady-state
    * amortized cost) and pages its fp/sig/bands tables in with a count
    * each, so timed runs of q_x_dedup_incremental_idx measure the
    * recurring per-batch probe and nothing else. Idempotent and cheap
    * when already warm. */
  def prewarm(s: SparkSession, dir: String): Unit = {
    val idx = dedupIdxFor(s, dir)
    Seq("fp", "sig", "bands").foreach { tbl =>
      val p = s"$idx/$tbl"
      if (new java.io.File(p).isDirectory) s.read.parquet(p).count(): Unit
    }
    val widx = winnowIdxFor(s, dir)
    if (new java.io.File(s"$widx/fp").isDirectory)
      s.read.parquet(s"$widx/fp").count(): Unit
  }

  /** Shared DuckDB prefix for the q_x_rank_* oracles: rebuilds the
    * brute-force top-10 run and the label-proximity qrels, then the
    * per-query metric math (discounts written ln(x)/ln(2) to match
    * Spark's log(2, x) bit for bit), ending at
    * `perq(query_id, n_rel, n_hit, rr, dcg, idcg, ndcg, recall)`. */
  private val rankOracleCommon: String =
    """WITH q AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < 8),
       scored AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           CAST(list_cosine_similarity(c.embedding, q.embedding) AS DOUBLE) AS cos
         FROM embeddings c, q WHERE c.vec_id <> q.vec_id),
       run AS (SELECT query_id, cand_id, rk FROM (SELECT query_id, cand_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, cand_id) AS rk
         FROM scored) WHERE rk <= 10),
       qrel AS (SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
           CASE WHEN q.label = c.label THEN 2 ELSE 1 END AS rel
         FROM embeddings c, q
         WHERE c.vec_id <> q.vec_id AND abs(q.label - c.label) <= 1),
       ideal AS (SELECT query_id, count(*) AS n_rel,
           sum(CASE WHEN ir <= 10
             THEN (power(2.0, rel) - 1) / (ln(ir + 1.0) / ln(2.0))
             ELSE 0 END) AS idcg
         FROM (SELECT query_id, rel, row_number() OVER (
             PARTITION BY query_id ORDER BY rel DESC, doc_id) AS ir FROM qrel)
         GROUP BY query_id),
       hits AS (SELECT r.query_id, count(*) AS n_hit, min(r.rk) AS frk,
           sum((power(2.0, g.rel) - 1) / (ln(r.rk + 1.0) / ln(2.0))) AS dcg
         FROM run r JOIN qrel g
           ON g.query_id = r.query_id AND g.doc_id = r.cand_id
         GROUP BY r.query_id),
       perq AS (SELECT i.query_id,
           CAST(i.n_rel AS BIGINT) AS n_rel,
           CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
           round(coalesce(CAST(1.0 AS DOUBLE) / h.frk, 0), 6) + 0.0 AS rr,
           round(coalesce(h.dcg, 0), 6) + 0.0 AS dcg,
           round(i.idcg, 6) + 0.0 AS idcg,
           round(coalesce(h.dcg, 0) / i.idcg, 6) + 0.0 AS ndcg,
           round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / i.n_rel, 6) + 0.0 AS recall
         FROM ideal i LEFT JOIN hits h USING (query_id))"""

  /** Shared DuckDB prefix for the q_x_rouge_n / q_x_bleu oracles:
    * rebuilds the shifted-window (candidate, reference) pairs — the
    * array_to_string/string_split round-trip reproduces Spark's
    * join-then-retokenize exactly, including the ['']-on-empty quirk —
    * ending at `p(doc_id, c, r)` with token lists. */
  private val genEvalOracleCommon: String =
    raw"""WITH tok AS (SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
       FROM documents),
       p AS (SELECT doc_id,
           string_split(array_to_string(w[1:20], ' '), ' ') AS c,
           string_split(array_to_string(w[5:30], ' '), ' ') AS r
         FROM tok)"""

  /** Clipped n-gram match CTEs for order `n` over `p`: candidate-side
    * counts `cg$n`, reference-side counts `rg$n`, per-doc clipped sum
    * `m$n(doc_id, nm)`. */
  private def clippedCtes(n: Int): String = {
    def grams(src: String) =
      if (n == 1) s"unnest($src) AS g"
      else s"""unnest(list_transform(generate_series(1, len($src) - ${n - 1}),
           i -> array_to_string($src[i:i + ${n - 1}], ' '))) AS g"""
    s""",
       cg$n AS (SELECT doc_id, g, count(*) AS cc
         FROM (SELECT doc_id, ${grams("c")} FROM p) GROUP BY doc_id, g),
       rg$n AS (SELECT doc_id, g, count(*) AS rc
         FROM (SELECT doc_id, ${grams("r")} FROM p) GROUP BY doc_id, g),
       m$n AS (SELECT cg$n.doc_id, sum(least(cc, rc)) AS nm
         FROM cg$n JOIN rg$n ON rg$n.doc_id = cg$n.doc_id AND rg$n.g = cg$n.g
         GROUP BY cg$n.doc_id)"""
  }

  /** The q_x_chrf oracle, generated: character streams of the two
    * windows (spaces gone by construction — tokens concatenate), the
    * same clipped CTEs per order 1..6, then the per-doc chrF2 fold in
    * Spark's association order. */
  private def chrfOracle: String = {
    val prefix = raw"""WITH tok AS (SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
       FROM documents),
       p AS (SELECT doc_id,
           list_transform(generate_series(1, len(cs)), i -> cs[i:i]) AS c,
           list_transform(generate_series(1, len(rs)), i -> rs[i:i]) AS r
         FROM (SELECT doc_id, array_to_string(w[1:20], '') AS cs,
             array_to_string(w[5:30], '') AS rs FROM tok))"""
    def fN(n: Int): String = {
      val m = s"CAST(coalesce(m$n.nm, 0) AS DOUBLE)"
      val tc = s"greatest(lc - ${n - 1}, 0)"
      val tr = s"greatest(lr - ${n - 1}, 0)"
      val p = s"CASE WHEN $tc > 0 THEN $m / $tc ELSE 0.0 END"
      val r = s"CASE WHEN $tr > 0 THEN $m / $tr ELSE 0.0 END"
      s"""(CASE WHEN CAST(4.0 AS DOUBLE) * ($p) + ($r) > 0
         THEN CAST(5.0 AS DOUBLE) * ($p) * ($r)
              / (CAST(4.0 AS DOUBLE) * ($p) + ($r))
         ELSE 0.0 END)"""
    }
    val joins = (1 to 6)
      .map(n => s"LEFT JOIN m$n ON m$n.doc_id = b.doc_id").mkString(" ")
    prefix + (1 to 6).map(clippedCtes).mkString + s""",
       base AS (SELECT doc_id, len(c) AS lc, len(r) AS lr FROM p)
       SELECT b.doc_id,
         round((${(1 to 6).map(fN).mkString(" + ")}) / 6, 6) + 0.0 AS chrf
       FROM base b $joins"""
  }

  /** Shared DuckDB prefix for the q_x_winnow* oracles: k=8 char-gram
    * md5-prefix hashes (the exact kernel hash — first 15 hex chars as
    * UBIGINT), windows of w=4 via a range join, rightmost-min pick per
    * window, ending at `fp(doc_id, pos, hash)`. Truncated final
    * windows cannot occur for p >= w; docs with fewer grams form the
    * one j=1 window (greatest(p-3, 1)), exactly the kernel rule. */
  private val winnowOracleCommon: String =
    raw"""WITH n AS (SELECT doc_id,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
       FROM documents),
       g0 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 7),
           i -> struct_pack(i := i, h := CAST(CAST(concat('0x',
             substr(md5(substr(t, i, 8)), 1, 15)) AS UBIGINT) AS BIGINT)))) AS s
         FROM n WHERE len(t) >= 8),
       g AS (SELECT doc_id, s.i AS i, s.h AS h FROM g0),
       pc AS (SELECT doc_id, max(i) AS p FROM g GROUP BY doc_id),
       win AS (SELECT doc_id, unnest(generate_series(1, greatest(p - 3, 1))) AS j
         FROM pc),
       cand AS (SELECT w.doc_id, w.j, g.i, g.h
         FROM win w JOIN g ON g.doc_id = w.doc_id
           AND g.i >= w.j AND g.i < w.j + 4),
       pick AS (SELECT doc_id, j, i, h, row_number() OVER (
           PARTITION BY doc_id, j ORDER BY h ASC, i DESC) AS rn FROM cand),
       fp AS (SELECT DISTINCT doc_id, i AS pos, h AS hash
         FROM pick WHERE rn = 1)"""

  /** Shared input for the q_x_rouge_n / q_x_bleu queries: per-doc
    * (candidate, reference) pairs as two overlapping token windows of
    * the same document — realistic partial n-gram overlap at every
    * order, deterministically rebuildable in SQL. */
  private def genEvalPairs(s: SparkSession, dir: String): DataFrame = {
    val tok = graft.text.TextOps.tokens(col("text"))
    t(s, dir, "documents").select(col("doc_id"),
      array_join(slice(tok, 1, 20), " ").as("cand"),
      array_join(slice(tok, 5, 26), " ").as("ref"))
  }

  /** Shared DuckDB prefix for the q_x_bitext_* oracles: exhaustive
    * even/odd cosine pairs (DOUBLE[] casts so DuckDB computes the
    * cosine in double like the Spark kernel — at 10k+ output rows the
    * FLOAT overload's 1e-7 error would flip roundings), per-side top-4
    * ranks (ties by the opposite id), neighborhood means, ratio
    * margins over the fwd/bwd union — ending at
    * `m(src_id, tgt_id, cos, margin)`. */
  private val bitextOracleCommon: String =
    """WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
         FROM embeddings WHERE vec_id % 2 = 0 AND vec_id < 400),
       tt AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
         FROM embeddings WHERE vec_id % 2 = 1),
       p AS (SELECT s.vec_id AS src_id, tt.vec_id AS tgt_id,
           list_cosine_similarity(s.embedding, tt.embedding) AS cos
         FROM s, tt),
       r AS (SELECT src_id, tgt_id, cos,
           row_number() OVER (PARTITION BY src_id
             ORDER BY cos DESC, tgt_id) AS rf,
           row_number() OVER (PARTITION BY tgt_id
             ORDER BY cos DESC, src_id) AS rb
         FROM p),
       af AS (SELECT src_id, avg(cos) AS af FROM r WHERE rf <= 4
         GROUP BY src_id),
       ab AS (SELECT tgt_id, avg(cos) AS ab FROM r WHERE rb <= 4
         GROUP BY tgt_id),
       m AS (SELECT r.src_id, r.tgt_id, r.cos,
           r.cos / ((af.af + ab.ab) / 2) AS margin
         FROM r JOIN af USING (src_id) JOIN ab USING (tgt_id)
         WHERE rf <= 4 OR rb <= 4)"""

  /** One unrolled label-propagation round for the q_x_label_prop
    * oracle: votes from round i-1's labels over the symmetrized edges,
    * per-node argmax (count DESC, label ASC), seeds clamped. */
  private def labelPropRound(i: Int): String = s""",
         v$i AS (SELECT e.dst AS id, l.lab AS lab, count(*) AS n
           FROM edu e JOIN l${i - 1} l ON l.id = e.src
           GROUP BY e.dst, l.lab),
         p$i AS (SELECT id, lab FROM (SELECT id, lab,
             row_number() OVER (PARTITION BY id ORDER BY n DESC, lab) AS rn
           FROM v$i) WHERE rn = 1),
         l$i AS (SELECT * FROM l0 UNION ALL
           SELECT p.id, p.lab FROM p$i p
           WHERE NOT EXISTS (SELECT 1 FROM l0 WHERE l0.id = p.id))"""

  /** Shared DuckDB prefix for the q_x_wordpiece / q_x_tok_fertility
    * oracles: the greedy longest-match WordPiece encode (vocab = top-30
    * words + character alphabet) as a recursive CTE, ending at
    * `done(doc_id, widx, pieces)`; `tok(doc_id, w)` stays visible for
    * word counts. */
  private val wordpieceOracleCommon: String =
    raw"""WITH RECURSIVE
         tok AS (SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
           FROM documents),
         words0 AS (SELECT doc_id,
             unnest(list_transform(generate_series(1, len(w)),
               i -> struct_pack(i := i, word := w[i]))) AS s
           FROM tok),
         words AS (SELECT doc_id, s.i AS widx, s.word AS word FROM words0),
         wf AS (SELECT word, count(*) AS c FROM words GROUP BY word),
         topw AS (SELECT word AS piece FROM wf ORDER BY c DESC, word LIMIT 30),
         chars0 AS (SELECT DISTINCT unnest(string_split(word, '')) AS ch
           FROM (SELECT DISTINCT word FROM words)),
         v AS (
           SELECT DISTINCT piece, cont FROM (
             SELECT piece, FALSE AS cont FROM topw
             UNION ALL SELECT ch, FALSE FROM chars0
             UNION ALL SELECT ch, TRUE FROM chars0)),
         r AS (
           SELECT doc_id, widx, word, 1 AS pos,
                  CAST([] AS VARCHAR[]) AS pieces
           FROM words
           UNION ALL
           SELECT doc_id, widx, word, pos + len(best),
             list_append(pieces,
               CASE WHEN pos = 1 THEN best ELSE '##' || best END)
           FROM (
             SELECT r.doc_id, r.widx, r.word, r.pos, r.pieces,
               (SELECT p.piece FROM v p
                WHERE p.cont = (r.pos > 1)
                  AND substr(r.word, r.pos, len(p.piece)) = p.piece
                ORDER BY len(p.piece) DESC, p.piece LIMIT 1) AS best
             FROM r WHERE r.pos <= len(word)) t
           WHERE best IS NOT NULL),
         done AS (SELECT doc_id, widx, pieces FROM r WHERE pos = len(word) + 1)"""

  /** Shared inputs for the q_x_rank_* queries: a brute-force cosine
    * top-10 run for the 8 probe queries, and graded qrels derived from
    * label proximity (rel 2 = same label, 1 = adjacent label) — the
    * deterministic stand-in for human judgments. */
  private def rankEvalRun(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    graft.vec.VectorOps.bruteForceTopK(emb, emb.where(col("vec_id") < 8),
      "vec_id", "embedding", k = 10)
  }
  private def rankEvalQrels(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    emb.select(col("vec_id").as("neighbor_id"), col("label").as("__dl"))
      .crossJoin(broadcast(emb.where(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("label").as("__ql"))))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("rel", when(col("__ql") === col("__dl"), lit(2))
        .when(abs(col("__ql") - col("__dl")) === 1, lit(1)))
      .where(col("rel").isNotNull)
      .select(col("query_id"), col("neighbor_id"), col("rel"))
  }

  /** Deterministic synthetic annotation table for the label-QA family:
    * 5 annotators per document, truth = doc_id % 3, annotator `a`
    * flips to (truth + 1 + a%2) % 3 exactly on rows where
    * (doc_id + a*a) % (a + 5) == 0 — pure integer arithmetic so the
    * DuckDB oracles reproduce it verbatim. Annotator 1 is the noisiest
    * (1/6 flip rate), annotator 5 the cleanest (1/10). */
  private def synthAnnots(s: SparkSession, dir: String): DataFrame = {
    val truth = pmod(col("doc_id"), lit(3L))
    t(s, dir, "documents")
      .select(col("doc_id"),
        explode(sequence(lit(1L), lit(5L))).as("annotator"))
      .select(col("doc_id"), col("annotator"),
        when(pmod(col("doc_id") + col("annotator") * col("annotator"),
                  col("annotator") + lit(5L)) === 0,
          pmod(truth + 1 + pmod(col("annotator"), lit(2L)), lit(3L)))
          .otherwise(truth).as("label"))
  }

  /** Deterministic pairwise preference outcomes for Bradley-Terry:
    * consecutive documents play a "game"; the longer document's source
    * wins (ties go to the earlier doc). Self-games (same source on
    * both sides) are kept here and excluded inside bradleyTerry — the
    * oracle mirrors that. */
  private def synthPrefGames(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val a = d.select(col("doc_id").as("__i"), col("source").as("__sa"),
                     col("n_chars").as("__na"))
    val b = d.select((col("doc_id") - 1).as("__i"), col("source").as("__sb"),
                     col("n_chars").as("__nb"))
    a.join(b, "__i").select(
      when(col("__nb") > col("__na"), col("__sb")).otherwise(col("__sa"))
        .as("winner"),
      when(col("__nb") > col("__na"), col("__sa")).otherwise(col("__sb"))
        .as("loser"))
  }

  /** Deterministic synthetic crawl URLs (one per document) exercising
    * every canonicalization rule: uppercase scheme/host, www + mobile
    * subdomains, default port, duplicate-producing path/query
    * variants, tracking params, fragments. Mirrored verbatim in the
    * URL oracles. */
  private def synthUrl: Column = {
    val id = col("doc_id")
    concat(lit("HTTPS://"),
      when(pmod(id, lit(2L)) === 0, lit("WWW.")).otherwise(lit("")),
      when(pmod(id, lit(7L)) === 0, lit("m.")).otherwise(lit("")),
      lit("Site"), pmod(id, lit(5L)).cast("string"), lit("."),
      when(pmod(id, lit(3L)) === 0, lit("com"))
        .when(pmod(id, lit(3L)) === 1, lit("co.uk")).otherwise(lit("org")),
      lit(":443/Path/"), pmod(id, lit(10L)).cast("string"),
      when(pmod(id, lit(4L)) === 0, lit("/")).otherwise(lit("")),
      lit("?utm_source=feed&b=1&a="), pmod(id, lit(2L)).cast("string"),
      when(pmod(id, lit(2L)) === 1, lit("&fbclid=XY")).otherwise(lit("")),
      lit("#frag"))
  }

  /** Quasi-identifier sets for the privacy-audit queries. */
  private def privacyQuasi(width: Double): Seq[(String, Column)] = Seq(
    "c_mktsegment" -> col("c_mktsegment"),
    "acct_bucket" -> graft.ops.Privacy.generalizeNum(col("c_acctbal"), width))

  private def uniqueMap[V](pairs: (String, V)*): Map[String, V] = {
    val dups = pairs.groupBy(_._1).filter(_._2.length > 1).keys
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    pairs.toMap
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = uniqueMap(

    // S3 + P1/P2/P4: parquet scan with pushed filter + projection
    "q_s3_scan_filter" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_quantity") >= 30 && col("l_returnflag") === "A")
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
    }),

    // P4: comparison predicate conjunction (eq/neq/lt/gte)
    "q_p4_predicates" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_quantity") >= 10 && col("l_quantity") <= 20 &&
          col("l_discount") > 0.05 && col("l_returnflag") =!= "N")
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity"), col("l_discount"))
    }),

    // P5: case-insensitive TEXT comparison (reference COLLATE NOCASE)
    "q_p5_ci_like" -> ((s, dir) => {
      t(s, dir, "part")
        .where(lower(col("p_type")).like("%om%") || lower(col("p_brand")) === "brand#13")
        .select(col("p_partkey"), col("p_type"), col("p_brand"))
    }),

    // P6/P7/P8/P9: the JSON filter DSL compiled to Column predicates:
    // base AND ($or group OR group), case-insensitive text, value casting
    "q_p6_dsl_or" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val filters = """{"l_quantity": {"gte": "30"},
                        "$or": [{"l_returnflag": "a"},
                                {"l_linestatus": {"like": "f%"}}]}"""
      li.where(FilterDsl.compileJson(filters, li.schema))
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
    }),

    // P3: drop all-null columns (presentation-time sparse-dim pruning)
    "q_p3_drop_null_cols" -> ((s, dir) => {
      val df = t(s, dir, "region")
        .withColumn("empty_dim", lit(null).cast("string"))
        .withColumn("full_dim", lit("x"))
      Projection.dropAllNullColumns(df)
    }),

    // A1-ish flagship: pricing summary (scan -> filter -> hash agg)
    "q_a1_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // A1: group-by MAX (the versioning core's aggregate shape)
    "q_a1_groupby_max" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(max(col("event_id")).as("max_event_id"),
          count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("sum_value"))
    }),

    // A2: per-column stats — n_non_nulls + n_unique in ONE pass (metadata op)
    // A: grouped EXACT percentiles (sort-based `percentile`, linear
    // interpolation — same definition as DuckDB quantile_cont); the
    // approx scale path is percentile_approx, already covered by the
    // perplexity-bucket operators
    "q_a9_grouped_percentiles" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
          round(expr("percentile(l_quantity, 0.9)"), 4).as("p90_qty"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("median_price"))
    }),

    // A: exact top-k frequent values per column — the profiling pass
    // next to column_stats; one melt + one (col, value) hash agg +
    // per-column top-k window
    "q_x_top_values" -> ((s, dir) => {
      graft.ops.Projection.topValuesPerColumn(t(s, dir, "lineitem"),
        Seq("l_returnflag", "l_linestatus", "l_linenumber"), k = 5)
    }),

    "q_a2_column_stats" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(
        count(col("l_orderkey")).as("nn_orderkey"),
        countDistinct(col("l_orderkey")).as("nu_orderkey"),
        count(col("l_returnflag")).as("nn_returnflag"),
        countDistinct(col("l_returnflag")).as("nu_returnflag"),
        count(col("l_quantity")).as("nn_quantity"),
        countDistinct(col("l_quantity")).as("nu_quantity"))
    }),

    // A3: grouped min/max/count (info report shape)
    "q_a3_minmax" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(min(year(col("o_orderdate"))).cast("long").as("min_year"),
          max(year(col("o_orderdate"))).cast("long").as("max_year"),
          count(lit(1)).as("n"))
    }),

    // A4/R4: pivot / cross-tab with explicit value list
    "q_a4_pivot" -> ((s, dir) => {
      Reshape.pivotWide(t(s, dir, "orders"), Seq("o_orderpriority"),
          "o_orderstatus", Seq("O", "F", "P"), count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("O"), lit(0L)).as("n_open"),
          coalesce(col("F"), lit(0L)).as("n_finished"),
          coalesce(col("P"), lit(0L)).as("n_pending"))
    }),

    // A5: duplicate-key detection (validation contract)
    "q_a5_dup_detect" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(count(lit(1)).as("n"))
        .where(col("n") > 1)
    }),

    // A6: null-count checks (nullability validation shape)
    "q_a6_null_counts" -> ((s, dir) => {
      t(s, dir, "events").agg(
        count(lit(1)).as("n_rows"),
        count(col("value")).as("n_value"),
        (count(lit(1)) - count(col("value"))).as("n_null_value"))
    }),

    // A7: DISTINCT projection
    "q_a7_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem").select(col("l_returnflag"), col("l_linestatus")).distinct()
    }),

    // A8 (beyond-parity): ROLLUP hierarchy totals in one pass
    "q_a8_rollup" -> ((s, dir) => {
      t(s, dir, "orders")
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
    }),

    // A2b: approx_count_distinct — the 100 TB swap for exact stats;
    // sketch values are engine-specific -> rows-only
    "q_a2b_column_stats_approx" -> ((s, dir) => {
      t(s, dir, "lineitem").agg(
        approx_count_distinct(col("l_orderkey")).as("nu_orderkey_approx"),
        approx_count_distinct(col("l_partkey")).as("nu_partkey_approx"),
        count(lit(1)).as("n_rows"))
    }),

    // J1: broadcast equi-join (template-join shape: fact x small dim)
    "q_j1_broadcast_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part")
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n"))
    }),

    // J2: modular-arithmetic join (stacked-block key: row % n)
    "q_j2_mod_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").withColumn("nk", pmod(col("l_orderkey"), lit(25)))
      val n = t(s, dir, "nation")
      li.join(broadcast(n), col("nk") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("sum_qty"))
    }),

    // J3/W3: staging snapshot — latest row per group via window dedup
    "q_j3_snapshot_latest" -> ((s, dir) => {
      Windows.latestPerGroup(t(s, dir, "events"),
          Seq("user_id"), Seq(col("ts"), col("event_id")))
        .select(col("user_id"), col("event_id").as("latest_event_id"),
          col("event_type"), round(col("value"), 2).as("value"))
    }),

    // J4: left-semi probe (staged-table existence shape)
    "q_j4_semi" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer").where(col("c_acctbal") > 5000)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left_semi")
        .select(col("o_orderkey"), col("o_custkey"))
    }),

    // J4b: left-anti (NOT EXISTS)
    "q_j4_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // W1: forward-fill down a partition (ffill + leading default)
    "q_w1_ffill" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .withColumn("v", when(col("event_type") === "click", col("value")))
      Windows.ffill(e, "v", Seq("user_id"), Seq("ts", "event_id"),
          default = Some(lit(-1.0)))
        .select(col("user_id"), col("event_id"), round(col("v"), 2).as("v"))
    }),

    // W2: row numbering with a total order
    "q_w2_row_number" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .select(col("o_custkey"), col("o_orderkey"), col("rn"))
    }),

    // R1: melt / unpivot wide->long (the ETL's core reshape)
    "q_r1_melt" -> ((s, dir) => {
      Reshape.melt(
          t(s, dir, "lineitem").where(pmod(col("l_orderkey"), lit(10)) === 0),
          idCols = Seq("l_orderkey", "l_linenumber"),
          valueCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
          varName = "measure", valueName = "val")
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("measure"), round(col("val"), 2).as("val"))
    }),

    // R3: sheet union (vertical concat with provenance column)
    "q_r3_union" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      Reshape.sheetUnion(Seq(
          "open" -> o.where(col("o_orderstatus") === "O").select(col("o_orderkey"), col("o_totalprice")),
          "finished" -> o.where(col("o_orderstatus") === "F").select(col("o_orderkey"), col("o_totalprice"))),
        sheetCol = "bucket")
    }),

    // R5: rename + constant stamp
    "q_r5_rename_const" -> ((s, dir) => {
      Reshape.renameAndStamp(t(s, dir, "region"),
        renames = Map("r_name" -> "region_name"),
        constants = Map("source" -> "tpch", "unit" -> "n/a"))
    }),

    // §2.9 beyond-parity: set operations (the reference only has union)
    "q_set_ops" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val topQty = li.where(col("l_quantity") >= 45).select(col("l_orderkey")).distinct()
      val discounted = li.where(col("l_discount") >= 0.08).select(col("l_orderkey")).distinct()
      val both = topQty.intersect(discounted)
        .withColumn("set_op", lit("intersect"))
      val onlyTop = topQty.except(discounted)
        .withColumn("set_op", lit("except"))
      both.unionByName(onlyTop)
    }),

    // O1/O2: ORDER BY + LIMIT on a unique key
    "q_o1_order_limit" -> ((s, dir) => {
      t(s, dir, "orders").orderBy(col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice")).limit(100)
    }),

    // O3: keyset (cursor) pagination
    "q_o3_keyset_page" -> ((s, dir) => {
      Windows.keysetPage(t(s, dir, "orders"), "o_orderkey", Some(500L), 100)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    // O4: top-k (TakeOrderedAndProject)
    "q_o4_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice")).limit(50)
    }),

    // F1: note-tag cleaning (regexp_replace + trim; label untouched rule
    // is exercised in the ScalaTest suite)
    "q_f1_note_clean" -> ((s, dir) => {
      t(s, dir, "part")
        .select(col("p_partkey"),
          Clean.removeNoteTags(
            concat(col("p_name"), lit(" [note 3] tail [NOTE 12]"))).as("cleaned"))
    }),

    // F2/F3: split/extract around delimiters + literal replace
    "q_f2_split_extract" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          regexp_extract(col("o_orderpriority"), "^(\\d+)", 1).as("prio_num"),
          regexp_replace(col("o_orderpriority"), "NOT SPECIFIED", "NONE").as("prio_clean"))
    }),

    // F5: numeric coercion with null-on-failure (to_numeric coerce) + JSON
    "q_f5_coerce" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"),
          expr("try_cast(event_type AS double)").as("not_a_number"))
    }),

    // F7: timestamp parse + date parts
    "q_f7_timestamp" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
    }),

    // F8: modulo block-cycling key
    "q_f8_pmod" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          pmod(col("l_orderkey"), lit(7)).as("block"))
    }),

    // F9: conditional tagging (when/otherwise)
    "q_f9_case" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("bucket",
          when(col("o_totalprice") > 300000, lit("high"))
            .when(col("o_totalprice") > 100000, lit("mid"))
            .otherwise(lit("low")))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    }),

    // W4: tumbling time-window aggregation (batch form of the streaming op)
    "q_w4_time_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").getField("start").as("hour_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(date_format(col("hour_start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("event_type"), col("n"), col("sum_value"))
    }),

    // K1/K2/J3 end-to-end: ingest two versions through the store, stage,
    // and read back the snapshot — the versioning core as one round trip
    "q_store_roundtrip" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_store_").toString
      val store = new graft.store.Store(s, tmp, "demo")
      store.initialize()
      val r = t(s, dir, "region").select(col("r_regionkey"), col("r_name"))
      store.ingest(r.withColumn("version", lit(1L)), "regions",
        ingestTs = java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
      store.ingest(r.withColumn("version", lit(2L)), "regions",
        ingestTs = java.sql.Timestamp.valueOf("2026-01-02 00:00:00"))
      store.snapshot()
        .select(col("r_regionkey"), col("r_name"), col("version"))
    }),

    // K: SCD2 validity-interval history over the same RAW zone the as-of
    // snapshot reads — unchanged re-publishes COALESCE into the current
    // interval (the third ingest below is identical to the second and
    // must leave no trace), changed rows open a new one
    "q_store_history" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_hist_").toString
      val store = new graft.store.Store(s, tmp, "hist")
      store.initialize()
      val r = t(s, dir, "region").select(col("r_regionkey"))
      def vals(shifted: Boolean) = r.withColumn("val",
        (if (shifted)
           when(col("r_regionkey") % 2 === 1, col("r_regionkey") * 10 + 100)
             .otherwise(col("r_regionkey") * 10)
         else col("r_regionkey") * 10).cast("long"))
      store.ingest(vals(shifted = false), "regions",
        ingestTs = java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
      store.ingest(vals(shifted = true), "regions",
        ingestTs = java.sql.Timestamp.valueOf("2026-01-02 00:00:00"))
      store.ingest(vals(shifted = true), "regions",
        ingestTs = java.sql.Timestamp.valueOf("2026-01-03 00:00:00"))
      store.history("regions", Seq("r_regionkey"), Seq("val"))
    }),

    // K + lease (round 15): the parity store's writer verbs run HOLDING
    // the durable root `_lease` — the reference's documented
    // single-writer assumption (utils.py:194) enforced ACROSS processes
    // instead of by call discipline. This round trip drives the write
    // path THROUGH the lease machinery and asserts its contract inline:
    // a crashed writer's STALE lease is reclaimed by the first verb
    // (initialize), every verb releases on the way out (no wedged
    // marker), and a LIVE foreign lease refuses maintenance without
    // touching the data.
    // Output = the staged PROD snapshot, hash-matched against the same
    // as-of winner in SQL.
    "q_store_lease_writer" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_lease_store_").toString
      // a crashed writer left a stale root lease: old mtime AND old
      // content epoch (staleness reads max of the two)
      val leaseP = java.nio.file.Paths.get(tmp, "_lease")
      val old = System.currentTimeMillis() - 3600000L // 1 h >> 10 min TTL
      java.nio.file.Files.write(leaseP,
        s"99999@crashed-host\n$old".getBytes("UTF-8"))
      java.nio.file.Files.setLastModifiedTime(leaseP,
        java.nio.file.attribute.FileTime.fromMillis(old))
      val store = new graft.store.Store(s, tmp, "demo")
      store.initialize()
      val n = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      store.ingest(n.withColumn("version", lit(1L)), "nations",
        ingestTs = java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))
      require(!java.nio.file.Files.exists(leaseP),
        "ingest must reclaim the stale lease and release it on the way out")
      store.ingest(n.withColumn("version", lit(2L)), "nations",
        ingestTs = java.sql.Timestamp.valueOf("2026-01-02 00:00:00"))
      store.stage()
      require(!java.nio.file.Files.exists(leaseP),
        "stage must release the lease on the way out")
      // a second process's LIVE lease refuses the next writer verb
      java.nio.file.Files.write(leaseP,
        s"99999@other-host\n${System.currentTimeMillis()}".getBytes("UTF-8"))
      val refused =
        try { store.vacuum(1); false }
        catch { case _: IllegalStateException => true }
      require(refused, "a live foreign lease must refuse store maintenance")
      require(java.nio.file.Files.readAllLines(leaseP).get(0)
        .contains("other-host"), "the refusal must not clobber the holder")
      java.nio.file.Files.delete(leaseP)
      store.readProd()
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
          col("version"))
    }),

    // X: exact deduplication — hash-groupBy on content digest
    "q_x_dedup_exact" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
    }),

    // X: content fingerprint of normalized text
    "q_x_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.text.TextOps.fingerprintMd5(col("text")).as("fp"))
    }),

    // X: token counting — whitespace + BPE-ish pre-tokenizer
    "q_x_token_count" -> ((s, dir) => {
      import graft.text.TextOps
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_ws"),
          size(TextOps.bpeishTokens(col("text"))).cast("long").as("n_bpeish"))
    }),

    // X: sequence packing, the per-(window, doc) SEGMENT map — which
    // token slice of which doc lands where in each context window.
    // Global token offsets via the distributed prefix scan (no
    // single-partition window anywhere in the plan).
    "q_x_pack_segments" -> ((s, dir) => {
      graft.text.Packing.packSegments(
        t(s, dir, "documents"), "doc_id", "text", ctxLen = 128)
    }),

    // X: sequence packing, MATERIALIZED windows — every window except
    // the last is exactly ctxLen tokens; the groupBy key is the window
    // id, so groups are bounded by ctxLen regardless of document skew
    "q_x_pack_windows" -> ((s, dir) => {
      graft.text.Packing.packWindows(
        t(s, dir, "documents"), "doc_id", "text", ctxLen = 128)
    }),

    // X: raw-JSONL triage — top-level key coverage over a synthesized
    // JSONL corpus whose every 3rd row carries an extra key (Spark's
    // to_json drops null fields; the oracle branches explicitly)
    "q_x_json_key_profile" -> ((s, dir) => {
      graft.ops.JsonProfile.keyProfile(
        t(s, dir, "documents").withColumn("__js", synthJsonl), "__js")
    }),

    // X: known-key field stats — presence + mean extracted length in
    // one scan (per-key extracts ride one array-of-structs projection)
    "q_x_json_field_stats" -> ((s, dir) => {
      graft.ops.JsonProfile.fieldStats(
        t(s, dir, "documents").withColumn("__js", synthJsonl), "__js",
        Seq("lang", "text", "extra"))
    }),

    // X: deterministic pseudonymization — synthesized emails replaced
    // by stable per-entity tags (same address -> same tag, so entity
    // counting survives anonymization); longest-first fold guards the
    // embedded-match case
    "q_x_pseudonymize" -> ((s, dir) => {
      import graft.text.TextOps
      val tk = TextOps.tokens(col("text"))
      val synth = concat(col("text"), lit(" contact "),
        element_at(tk, 1), lit("@example.com or "),
        element_at(tk, 2), lit("@example.com mail "),
        element_at(tk, 1), lit("@example.com"))
      t(s, dir, "documents").select(col("doc_id"),
        TextOps.pseudonymize(synth, TextOps.emailPattern, "EMAIL").as("txt"))
    }),

    // X: embedding-space drift between snapshots (even vs odd vec_ids
    // as the two "versions"): centroid cosine + mean per-dim shift —
    // the vector counterpart of token drift
    "q_x_embed_drift" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.vec.VectorOps.embeddingDrift(
        emb.where(pmod(col("vec_id"), lit(2)) === 0),
        emb.where(pmod(col("vec_id"), lit(2)) === 1))
    }),

    // X: source forensics — per-source duplicate mass over a 3-token
    // prefix fingerprint (the sf corpus has no verbatim dups; the
    // prefix synthesizes realistic collision structure both engines
    // reproduce identically)
    "q_x_dup_by_source" -> ((s, dir) => {
      import graft.text.TextOps
      graft.text.SnapshotOps.dupBySource(
        t(s, dir, "documents").withColumn("__pfx",
          array_join(slice(TextOps.tokens(col("text")), 1, 3), " ")),
        "doc_id", "__pfx", "source")
    }),

    // X: cross-source content overlap — the mirror/syndication map
    "q_x_source_overlap" -> ((s, dir) => {
      import graft.text.TextOps
      graft.text.SnapshotOps.sourceOverlap(
        t(s, dir, "documents").withColumn("__pfx",
          array_join(slice(TextOps.tokens(col("text")), 1, 3), " ")),
        "doc_id", "__pfx", "source")
    }),

    // X: DPO preference-pair hygiene — prompt = first 6 tokens, chosen
    // = the rest, rejected = every 2nd chosen token: token counts,
    // chosen/rejected token-set Jaccard, identical/keep verdicts
    "q_x_pref_pairs" -> ((s, dir) => {
      import graft.text.TextOps
      val tk = TextOps.tokens(col("text"))
      val rest = slice(tk, lit(7), greatest(size(tk) - 6, lit(0)))
      graft.text.Preference.pairStats(
        t(s, dir, "documents")
          .withColumn("__prompt", array_join(slice(tk, 1, 6), " "))
          .withColumn("__chosen", array_join(rest, " "))
          .withColumn("__rejected",
            array_join(filter(rest, (_, i) => i % 2 === 0), " ")),
        "doc_id", "__prompt", "__chosen", "__rejected")
    }),

    // X: SFT conversation parse — transcript JSON to typed turns, the
    // exploded audit view per-turn filters run on
    "q_x_chat_turns" -> ((s, dir) => {
      graft.text.Chat.parseTurns(
        t(s, dir, "documents").withColumn("__js", synthChat),
        "doc_id", "__js")
    }),

    // X: per-conversation stats + schema-contract verdict: every 7th
    // conversation has an unknown role, short docs an empty assistant
    // turn — both must land valid=false
    "q_x_chat_stats" -> ((s, dir) => {
      graft.text.Chat.stats(
        t(s, dir, "documents").withColumn("__js", synthChat),
        "doc_id", "__js")
    }),

    // X: chat-template render — turns flattened to the single training
    // string a tokenizer consumes
    "q_x_chat_render" -> ((s, dir) => {
      t(s, dir, "documents").withColumn("__js", synthChat)
        .select(col("doc_id"),
          graft.text.Chat.render(col("__js")).as("rendered"))
    }),

    // X: the chat pipeline END TO END — parse -> schema filter ->
    // per-turn PII scrub -> render -> fingerprint dedup -> sequence
    // packing, one composition (the r8 families individually oracled;
    // this hash-gates their composition). Output is the (window, doc)
    // segment map over the deduped rendered corpus.
    "q_x_chat_pipeline" -> ((s, dir) => {
      val (out, _) = graft.text.CorpusPipeline.preprocessChat(
        t(s, dir, "documents").withColumn("__js", synthChatPii),
        "doc_id", "__js", ctxLen = Some(128))
      out
    }),

    // X: HTML -> text extraction. The fixture page is synthesized from
    // row fields IDENTICALLY in Spark and the oracle SQL (the fakePng
    // discipline for markup), so the whole regex chain — script/style/
    // comment blocks, block-tag paragraph breaks, entity decode,
    // whitespace collapse — is hash-gated rule for rule.
    "q_x_html_extract" -> ((s, dir) => {
      val d = t(s, dir, "documents").withColumn("__html", synthHtml)
      d.select(col("doc_id"),
        graft.text.Html.stripTags(col("__html")).as("txt"),
        graft.text.Html.linkCount(col("__html")).as("links"))
    }),

    // X: JusText-lite paragraph classification over the stripped page —
    // the audit view (one row per paragraph with the keep verdict)
    "q_x_html_paragraphs" -> ((s, dir) => {
      graft.text.Html.paragraphs(
        t(s, dir, "documents").withColumn("__html", synthHtml),
        "doc_id", "__html", minChars = 30, minStopRatio = 0.03)
    }),

    // X: main-text extraction — boilerplate dropped inside array
    // lambdas, no explode, single codegen projection
    "q_x_html_main" -> ((s, dir) => {
      t(s, dir, "documents").withColumn("__html", synthHtml)
        .select(col("doc_id"),
          graft.text.Html.mainText(col("__html"), 30, 0.03).as("main"))
    }),

    // X: REAL BPE — merges learned from the corpus itself (deterministic
    // tie-breaks), then every doc encoded to subwords. Approximation-free
    // but not SQL-expressible (iterative merges) -> rows-only; the
    // plumbing is oracle-gated by q_x_bpe_chars below
    "q_x_bpe_tokens" -> ((s, dir) => {
      import graft.text.{Bpe, TextOps}
      val docs = t(s, dir, "documents")
      val merges = Bpe.train(docs, "text", numMerges = 100)
      docs.select(col("doc_id"),
        Bpe.tokenCount(TextOps.tokens(col("text")), merges).as("n_subwords"),
        array_join(slice(Bpe.encode(TextOps.tokens(col("text")), merges),
          1, 12), " ").as("head_subwords"))
    }),

    // X: the zero-merge degenerate case IS SQL-expressible — subword
    // count must equal the character count of the concatenated tokens,
    // gating the whole tokenize/encode/count path against DuckDB
    "q_x_bpe_chars" -> ((s, dir) => {
      import graft.text.{Bpe, TextOps}
      t(s, dir, "documents").select(col("doc_id"),
        Bpe.tokenCount(TextOps.tokens(col("text")), Nil).as("n_chars_bpe"))
    }),

    // X: WordPiece greedy longest-match encode (the BERT-family
    // tokenizer, complementing BPE's bottom-up merges) — vocab = top-30
    // words + character alphabet, derived deterministically from the
    // corpus; encoding is a row-local aggregate() fold, hash-gated
    // against a DuckDB recursive CTE running the identical greedy scan
    "q_x_wordpiece" -> ((s, dir) => {
      import graft.text.Wordpiece
      val docs = t(s, dir, "documents")
      val vocab = Wordpiece.buildVocab(docs, "text", topWords = 30)
      Wordpiece.encode(docs, "doc_id", "text", vocab)
    }),

    // X: tokenizer fertility — per-language pieces-per-word for the
    // WordPiece encode (the pick-a-tokenizer eval before a full-corpus
    // encode); piece strings never cross a shuffle (per-doc counts
    // aggregate first)
    "q_x_tok_fertility" -> ((s, dir) => {
      import graft.text.Wordpiece
      val docs = t(s, dir, "documents")
      val vocab = Wordpiece.buildVocab(docs, "text", topWords = 30)
      Wordpiece.fertility(Wordpiece.encode(docs, "doc_id", "text", vocab),
        docs, "doc_id", "text", Seq("lang"))
    }),

    // X: Unigram-LM (SentencePiece-family) Viterbi segmentation — the
    // globally-optimal tokenizer completing the BPE/WordPiece trio;
    // empirical piece scores (deterministic), DP as a row-local fold
    // carrying the best[0..j] table, hash-gated against a DuckDB
    // recursive CTE running the identical DP
    "q_x_unigram" -> ((s, dir) => {
      import graft.text.Unigram
      val docs = t(s, dir, "documents")
      val model = Unigram.train(docs, "text", topWords = 30)
      Unigram.encode(docs, "doc_id", "text", model)
    }),

    // X: DSIR importance weights (Xie et al. 2023, arXiv:2302.03169) —
    // target = the src1 slice, raw = the rest; exact unigram+bigram
    // add-k model over the joint vocabulary, per-doc log weight = sum
    // of feature log ratios. Two vocab-keyed count aggs + one feature-
    // keyed scoring join, nothing but three scalars on the driver
    "q_x_dsir_weights" -> ((s, dir) => {
      import graft.text.Dsir
      val docs = t(s, dir, "documents").repartition(col("doc_id"))
      val m = Dsir.fit(docs.where(col("source") === "src1"),
        docs.where(col("source") =!= "src1"), "text", "doc_id")
      Dsir.logWeights(docs, "doc_id", "text", m)
    }),

    // X: DSIR selection — Gumbel top-k over the importance weights
    // (importance sampling without replacement, made deterministic by
    // the md5(id) uniform); one global top-n, no sort, no rand()
    "q_x_dsir_sample" -> ((s, dir) => {
      import graft.text.Dsir
      val docs = t(s, dir, "documents").repartition(col("doc_id"))
      val m = Dsir.fit(docs.where(col("source") === "src1"),
        docs.where(col("source") =!= "src1"), "text", "doc_id")
      Dsir.resample(docs, "doc_id", "text", m, n = 200,
        passCols = Seq("source"))
    }),

    // X: one full-batch logistic-regression gradient step of the
    // DISTRIBUTED trainer (QualityClassifier.trainFullBatch), entirely
    // in the plan: dim=8, the q_x_quality_margin_fixed init model and
    // synthesized tokens, labels doc_id % 2, lr=0.5 — the update the
    // oracle replays through the HUGEINT XXH64 re-implementation
    "q_x_logreg_step" -> ((s, dir) => {
      import graft.text.{QualityClassifier, QualityModel}
      val model = QualityModel(8,
        Array(0.25, -0.5, 0.125, 0.75, -0.25, 0.0625, -0.125, 0.5), 0.0625)
      val labeled = t(s, dir, "documents")
        .withColumn("__toks", expr(
          "transform(sequence(0, 9), i -> concat('t', CAST(doc_id AS string), '_', CAST(i AS string), repeat('p', i)))"))
        .withColumn("__y", pmod(col("doc_id"), lit(2)).cast("double"))
      QualityClassifier.gradientStepFrame(labeled, "__toks", "__y",
        model, lr = 0.5)
    }),

    // X: ROC AUC of the self-trained bigram LM score as an English
    // detector — Mann-Whitney with average-rank ties over the distinct-
    // score domain (window bounded by score resolution, not corpus)
    "q_x_auc" -> ((s, dir) => {
      import graft.text.{Eval, TextOps}
      val docs = t(s, dir, "documents").repartition(col("doc_id"))
      val scored = TextOps.bigramLogProbScores(docs, "doc_id", "text", k = 0.5)
        .withColumnRenamed("id", "doc_id")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .withColumn("__y", (col("lang") === "en").cast("double"))
      Eval.auc(scored, "avg_logprob", "__y")
    }),

    // X: reliability bins of the fixed-model quality score against the
    // lang='en' label — one bins-keyed agg; ECE is a spec-side fold
    "q_x_calibration" -> ((s, dir) => {
      import graft.text.{Eval, QualityClassifier, QualityModel}
      val model = QualityModel(8,
        Array(0.25, -0.5, 0.125, 0.75, -0.25, 0.0625, -0.125, 0.5), 0.0625)
      val scored = t(s, dir, "documents")
        .withColumn("__toks", expr(
          "transform(sequence(0, 9), i -> concat('t', CAST(doc_id AS string), '_', CAST(i AS string), repeat('p', i)))"))
        .select(col("doc_id"), col("lang"),
          (lit(1.0) / (lit(1.0)
            + exp(-QualityClassifier.marginCol(col("__toks"), model))))
            .as("p"))
        .withColumn("__y", (col("lang") === "en").cast("double"))
      Eval.calibration(scored, "p", "__y", bins = 10)
    }),

    // X: precision/recall at a k=500 selection budget under the LM
    // score — one global top-k (per-partition heaps) + one label count
    "q_x_pr_at_k" -> ((s, dir) => {
      import graft.text.{Eval, TextOps}
      val docs = t(s, dir, "documents").repartition(col("doc_id"))
      val scored = TextOps.bigramLogProbScores(docs, "doc_id", "text", k = 0.5)
        .withColumnRenamed("id", "doc_id")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .withColumn("__y", (col("lang") === "en").cast("double"))
      Eval.prAtK(scored, "doc_id", "avg_logprob", "__y", k = 500)
    }),

    // X: per-query ranked-retrieval metrics (TREC conventions) over a
    // brute-force cosine run — RR, DCG@10/ideal/nDCG@10 (Järvelin
    // 2^rel-1 gains), recall@10; graded qrels from label proximity
    "q_x_rank_metrics" -> ((s, dir) => {
      graft.text.Eval.rankMetrics(rankEvalRun(s, dir), rankEvalQrels(s, dir),
        "query_id", "neighbor_id", "rank", "rel", k = 10)
    }),

    // X: macro-averaged MRR / mean nDCG@10 / mean recall@10 over the
    // same run — the one-line retrieval scoreboard
    "q_x_rank_summary" -> ((s, dir) => {
      graft.text.Eval.rankSummary(rankEvalRun(s, dir), rankEvalQrels(s, dir),
        "query_id", "neighbor_id", "rank", "rel", k = 10)
    }),

    // X: per-pair ROUGE-2 (Lin 2004) — clipped bigram matches via the
    // codegen ClippedNgramMatches kernel, P/R/F1; pairs are shifted
    // token windows of each doc (overlapping but not identical)
    "q_x_rouge_n" -> ((s, dir) => {
      graft.text.GenEval.rougeN(genEvalPairs(s, dir),
        "doc_id", "cand", "ref", n = 2)
    }),

    // X: per-pair ROUGE-L — LCS via the codegen two-row DP kernel; ref
    // drops every 'e'-bearing token so the subsequence is non-trivial.
    // The ORACLE RUNS THE SAME DP as a DuckDB recursive CTE (prefix-max
    // row recurrence), integer-exact
    "q_x_rouge_l" -> ((s, dir) => {
      val tok = graft.text.TextOps.tokens(col("text"))
      val pairs = t(s, dir, "documents").select(col("doc_id"),
        array_join(slice(tok, 1, 20), " ").as("cand"),
        array_join(filter(slice(tok, 1, 24),
          t => !t.contains("e")), " ").as("ref"))
      graft.text.GenEval.rougeL(pairs, "doc_id", "cand", "ref")
    }),

    // X: corpus BLEU-4 (Papineni 2002) — per-pair clipped counts pooled
    // by ONE global agg (corpus BLEU, not mean sentence BLEU), modified
    // precisions p1..p4, brevity penalty, geometric mean
    "q_x_bleu" -> ((s, dir) => {
      graft.text.GenEval.bleu(genEvalPairs(s, dir), "cand", "ref", maxN = 4)
    }),

    // X: per-pair chrF (Popović 2015) — character n-gram F2 averaged
    // over orders 1..6 on the whitespace-stripped char stream; same
    // clipped-matches kernel, character tokens
    "q_x_chrf" -> ((s, dir) => {
      graft.text.GenEval.chrF(genEvalPairs(s, dir), "doc_id", "cand", "ref")
    }),

    // X: fill-in-the-middle split (Bavarian'22) — md5-derived character
    // cuts, PSM rendering; row-local, deterministic across engines
    "q_x_fim" -> ((s, dir) => {
      graft.text.Corruption.fimSplit(t(s, dir, "documents"),
        "doc_id", "text", minChars = 16)
    }),

    // X: T5 span corruption (Raffel'20), BLOCK formulation — one
    // md5-placed span per fixed token block, sentinel inputs/targets;
    // zero sequential dependency (the i.i.d.-span walk is sequential;
    // blocks mask the same expected fraction embarrassingly parallel)
    "q_x_span_corrupt" -> ((s, dir) => {
      graft.text.Corruption.spanCorrupt(t(s, dir, "documents"),
        "doc_id", "text", blockSize = 20, spanLen = 3)
    }),

    // X: winnowing fingerprints (Schleimer-Wilkerson-Aiken'03, the MOSS
    // scheme) — per-window rightmost-min of k-gram md5-prefix hashes,
    // one sequential kernel scan per doc, no shuffle
    "q_x_winnow" -> ((s, dir) => {
      graft.text.Winnow.fingerprints(t(s, dir, "documents"),
        "doc_id", "text", k = 8, w = 4)
    }),

    // X: winnowed overlap report — the MOSS match list: pairs ranked by
    // distinct shared fingerprints; only fingerprints (~2/(w+1) of the
    // grams) cross the shuffle, boilerplate hashes capped
    "q_x_winnow_overlap" -> ((s, dir) => {
      graft.text.Winnow.overlap(t(s, dir, "documents"), "doc_id", "text",
        k = 8, w = 4, minShared = 2, maxDocsPerHash = 50)
    }),

    // X: persisted winnow-index probe — corpus fingerprints ingested
    // ONCE (ids >= 50), the batch (ids < 50) probes the hash-sorted
    // fingerprint table (mod partition pruning always; page-level
    // point-set pruning once the table clears the ScanPrune gate); the
    // corpus is never re-fingerprinted. The oracle replays the same
    // split, cap and pair count relationally
    "q_x_winnow_probe_idx" -> ((s, dir) => {
      graft.text.WinnowIndex.probeBatch(s, winnowIdxFor(s, dir),
        t(s, dir, "documents").where(col("doc_id") < 50), "doc_id", "text",
        minShared = 2, maxDocsPerHash = 50)
    }),

    // X: margin-based bitext margin scores (Artetxe-Schwenk'19) —
    // cosine relative to both sides' top-k neighborhood means over the
    // even/odd embedding split; exhaustive candidates = the oracle-
    // gateable validation mode (the scale path feeds marginScoresOver
    // from the ANN tier, BitextSpec proves the equivalence)
    "q_x_bitext_margin" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.vec.Bitext.marginScores(
          emb.where(col("vec_id") % 2 === 0 && col("vec_id") < 400),
          emb.where(col("vec_id") % 2 === 1), "vec_id", "embedding", k = 4)
        .select(col("src_id"), col("tgt_id"),
          (round(col("cos"), 6) + lit(0.0)).as("cos"),
          (round(col("margin"), 6) + lit(0.0)).as("margin"))
    }),

    // X: mined parallel pairs — mutual-best-by-margin (intersection
    // strategy) above the mining threshold; at most one pair per side
    "q_x_bitext_pairs" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.vec.Bitext.minePairs(
          emb.where(col("vec_id") % 2 === 0 && col("vec_id") < 400),
          emb.where(col("vec_id") % 2 === 1), "vec_id", "embedding",
          k = 4, minMargin = 1.0)
        .select(col("src_id"), col("tgt_id"),
          (round(col("cos"), 6) + lit(0.0)).as("cos"),
          (round(col("margin"), 6) + lit(0.0)).as("margin"))
    }),

    // X: the FULL multilingual mining chain, composed and hash-gated —
    // the tgt side lives in a rotated space (a planted literal Givens
    // composition standing in for a different encoder); Procrustes
    // learns the map from 50 seed pairs, the aligned src mines against
    // the rotated tgt. Cosine is rotation-invariant, so the mined
    // pairs EQUAL the unrotated mining run — the q_x_bitext_pairs
    // oracle gates the whole align -> mine composition
    "q_x_bitext_aligned" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val r0 = graft.vec.Align.givens(64,
        Seq((0, 1, math.Pi / 6), (2, 3, math.Pi / 3), (4, 5, 1.1)))
      val src = emb.where(col("vec_id") % 2 === 0 && col("vec_id") < 400)
      val tgt = graft.vec.Align.applyMap(
          emb.where(col("vec_id") % 2 === 1), "embedding", "__rot", r0)
        .select(col("vec_id"), col("__rot").as("embedding"))
      // seeds need >= d linearly-independent pairs for a full-rank
      // cross-covariance (procrustes REJECTS fewer — a 50-pair seed
      // set at d=64 throws rank-deficient, by design); use the whole
      // src side (200+ pairs)
      val seeds = graft.vec.Align.applyMap(src, "embedding", "__y", r0)
        .select(col("embedding").as("__x"), col("__y"))
      val w = graft.vec.Align.procrustes(seeds, "__x", "__y", dims = 64)
      val alignedSrc = graft.vec.Align.applyMap(src, "embedding", "__a", w)
        .select(col("vec_id"), col("__a").as("embedding"))
      graft.vec.Bitext.minePairs(alignedSrc, tgt, "vec_id", "embedding",
          k = 4, minMargin = 1.0)
        .select(col("src_id"), col("tgt_id"),
          (round(col("cos"), 6) + lit(0.0)).as("cos"),
          (round(col("margin"), 6) + lit(0.0)).as("margin"))
    }),

    // X: multilingual END-TO-END composition — Procrustes-align a
    // rotated target space (planted rotation, learned back from seed
    // pairs), margin-mine bitext in the aligned space, drop mined pairs
    // whose EITHER side shares a 5-gram with the eval slice
    // (decontamination), pack the survivors into fixed 512-token
    // sequences. Gated end to end: cosine rotation-invariance makes the
    // mining SQL-replayable (the q_x_bitext_aligned trick); the
    // decontamination and packing replay as their standalone oracles
    // do. Output is id/count-typed only, so the ~1e-12 SVD recovery
    // error cannot perturb the hash.
    "q_x_multiling_pipeline" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val docs = t(s, dir, "documents")
      val r0 = graft.vec.Align.givens(64,
        Seq((0, 1, math.Pi / 6), (2, 3, math.Pi / 3), (4, 5, 1.1)))
      val src = emb.where(col("vec_id") % 2 === 0 && col("vec_id") < 400)
      val tgt = graft.vec.Align.applyMap(
          emb.where(col("vec_id") % 2 === 1), "embedding", "__rot", r0)
        .select(col("vec_id"), col("__rot").as("embedding"))
      val seeds = graft.vec.Align.applyMap(src, "embedding", "__y", r0)
        .select(col("embedding").as("__x"), col("__y"))
      graft.text.MultilingPipeline.run(src, tgt, seeds, docs,
        docs.where(pmod(col("doc_id"), lit(37)) === 0))
    }),

    // X: corpus diversity report — per-language distinct-n (Li'16) and
    // n-gram entropy for orders 1..3; one stacked scan, one
    // (lang, n, gram)-keyed agg, vocabulary-sized reduction
    "q_x_diversity" -> ((s, dir) => {
      graft.text.GenEval.diversity(t(s, dir, "documents"), "text",
        ns = Seq(1, 2, 3), groupCols = Seq("lang"))
    }),

    // X: shard audit — deterministic md5-of-id shard assignment,
    // per-shard doc/token counts and an order-independent XOR content
    // hash: one scan, one shard-keyed agg; re-auditable from any copy
    // of the corpus (the tamper-evidence companion of q_x_shard_manifest's
    // writer round trip)
    "q_x_shard_audit" -> ((s, dir) => {
      graft.text.Sharding.audit(t(s, dir, "documents"),
        "doc_id", "text", nShards = 8)
    }),

    // X: Procrustes cross-covariance M = X^T Y over consecutive-id
    // seed pairs — the one data-sized agg behind alignment (dim-pair
    // keyed, d^2 key space, the covMatrix discipline)
    "q_x_xcov" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val pairs = emb.where(col("vec_id") % 2 === 0)
        .select(col("vec_id"), col("embedding").as("__x"))
        .join(emb.select((col("vec_id") - 1).as("vec_id"),
          col("embedding").as("__y")), "vec_id")
      graft.vec.Align.crossCov(pairs, "__x", "__y", dims = 16)
        .select(col("i"), col("j"),
          (round(col("sxy"), 6) + lit(0.0)).as("sxy"))
    }),

    // X: end-to-end Procrustes alignment against a PLANTED rotation —
    // seed pairs are (x, x·R0) for a literal Givens composition, so
    // the analytic solution is W = R0 exactly and the ORACLE replays
    // the aligned output with literal trig entries (the SVD itself is
    // driver-side d×d and spec-gated; this gates the whole
    // xcov -> SVD -> row-local-apply path end to end)
    "q_x_procrustes_align" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val r0 = graft.vec.Align.givens(64,
        Seq((0, 1, math.Pi / 6), (2, 3, math.Pi / 3)))
      val pairs = graft.vec.Align.applyMap(emb, "embedding", "__y", r0)
        .select(col("embedding").as("__x"), col("__y"))
      val w = graft.vec.Align.procrustes(pairs, "__x", "__y", dims = 64)
      graft.vec.Align.applyMap(emb, "embedding", "__a", w)
        .select(col("vec_id"), posexplode(col("__a")))
        .select(col("vec_id"), col("pos").as("i"),
          (round(col("col"), 6) + lit(0.0)).as("v"))
    }),

    // X: k-center greedy coreset (Gonzalez 1985 / Sener-Savarese
    // coresets) — k sequential steps, each one row-local min-dist
    // projection over literal centers + one global top-1; the oracle
    // unrolls the identical recurrence
    "q_x_kcenter" -> ((s, dir) => {
      graft.vec.Coreset.kCenterGreedy(t(s, dir, "embeddings"),
        "vec_id", "embedding", k = 6)
    }),

    // X: coverage assignment to the selected coreset — row-local argmin
    // over the k centers as plan literals, ties to the earlier center
    "q_x_kcenter_assign" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val centers = graft.vec.Coreset.kCenterGreedyCenters(
        emb, "vec_id", "embedding", k = 6)
      graft.vec.Coreset.assign(emb, "vec_id", "embedding", centers)
    }),

    // X: graph-based ANN — beam search over the exact kNN graph (the
    // NSW/DiskANN navigation pattern), fully oracle-gated: min-id entry,
    // 2 synchronous expansion rounds, beam 4, top-3 of the visited set.
    // The search itself is deterministic, so the ORACLE REPLAYS THE WALK
    // (not just an exhaustive twin); recall floor vs brute lives in
    // GraphAnnSpec
    "q_x_graph_ann" -> ((s, dir) => {
      import graft.vec.{GraphAnn, VectorOps}
      val emb = t(s, dir, "embeddings").where(col("vec_id") < 500)
      val edges = VectorOps.knnGraph(emb, "vec_id", "embedding",
          k = 4, nlist = 1, nassign = 1, kmeansIters = 0)
        .select(col("src_id"), col("dst_id"))
      GraphAnn.beamSearch(emb, edges, emb.where(col("vec_id") < 8),
        "vec_id", "embedding", k = 3, beam = 4, iters = 2)
    }),

    // X: semi-supervised label propagation (Zhu-Ghahramani'02) over
    // the exact kNN graph — clamped seeds, synchronous majority rounds
    // with smallest-label ties; the oracle UNROLLS the three rounds
    // over the same relationally-rebuilt edges
    "q_x_label_prop" -> ((s, dir) => {
      import graft.vec.{LabelProp, VectorOps}
      val emb = t(s, dir, "embeddings").where(col("vec_id") < 500)
      val edges = VectorOps.knnGraph(emb, "vec_id", "embedding",
          k = 4, nlist = 1, nassign = 1, kmeansIters = 0)
        .select(col("src_id"), col("dst_id"))
      LabelProp.propagate(edges,
        emb.where(col("vec_id") < 50).select(col("vec_id"), col("label")),
        "vec_id", "label", rounds = 3)
    }),

    // X: top-k per group — map-side WindowGroupLimit keeps each task's
    // local top-k before the shuffle (plan-guarded in OpsSpec)
    "q_x_topk_per_group" -> ((s, dir) => {
      graft.ops.Windows.topKPerGroup(t(s, dir, "lineitem"),
          Seq("l_returnflag"),
          Seq(col("l_extendedprice").desc, col("l_orderkey").asc,
            col("l_linenumber").asc), k = 3)
        .select(col("l_returnflag"),
          round(col("l_extendedprice"), 2).as("price"),
          col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"))
    }),

    // X: Gopher rule-based quality filter (word bounds, mean word length,
    // symbol ratio, alphabetic-word ratio, required stopwords)
    "q_x_gopher_quality" -> ((s, dir) => {
      graft.text.TextOps.gopherQualityFlags(
        t(s, dir, "documents"), "doc_id", "text", minWords = 40)
    }),

    // X: Gopher repetition-removal signals (dup line/para fractions,
    // top/dup n-gram char fractions) — row-local projection, no shuffle
    "q_x_gopher_repetition" -> ((s, dir) => {
      graft.text.TextOps.gopherRepetitionFlags(
        t(s, dir, "documents"), "doc_id", "text")
    }),

    // X: quality scoring (length / punctuation / stopword features)
    "q_x_quality" -> ((s, dir) => {
      val f = graft.text.TextOps.qualityFeatures(col("text"))
      t(s, dir, "documents").repartition(col("doc_id"))
        .select(col("doc_id"), f("n_chars").as("n_chars"),
          f("n_tokens").as("n_tokens"), f("punct_ratio").as("punct_ratio"),
          f("stopword_ratio").as("stopword_ratio"),
          f("mean_word_len").as("mean_word_len"))
    }),

    // X: DEFLATE compression-ratio quality signal — rows-only (the ratio
    // is a zlib artifact DuckDB cannot reproduce); monotonicity and
    // determinism are spec-gated (GraftExtensionsSpec). A shuffle-free
    // codegen projection over the corpus scan.
    "q_x_compress_ratio" -> ((s, dir) => {
      t(s, dir, "documents").repartition(col("doc_id"))
        .select(col("doc_id"),
          graft.functions.TextExpressions.deflate_ratio(col("text"))
            .as("deflate_ratio"))
        .withColumn("repetitive", col("deflate_ratio") < 0.35)
    }),

    // X: self-trained bigram LM scoring — the perplexity-filter analogue;
    // all statistics from one exploded bigram frame
    "q_x_lm_score" -> ((s, dir) => {
      graft.text.TextOps.bigramLogProbScores(
          t(s, dir, "documents").repartition(col("doc_id")),
          "doc_id", "text", k = 0.5)
        .withColumnRenamed("id", "doc_id")
    }),

    // X: RefinedWeb-style per-source quota — keep the 10 longest docs per
    // source, one streaming window on the source key
    "q_x_source_cap" -> ((s, dir) => {
      graft.text.Curation.sourceCap(t(s, dir, "documents"),
          "doc_id", "source", "n_chars", cap = 10)
        .select(col("doc_id"), col("source"), col("n_chars"))
    }),

    // X: CCNet-style perplexity terciles over the self-trained bigram LM.
    // exactRank mode (global ntile) so the bucketing itself is
    // oracle-gated; the approx percentile-cut scale path is spec-gated
    // against this one in CurationSpec
    "q_x_perplexity_buckets" -> ((s, dir) => {
      graft.text.Curation.perplexityBuckets(
        t(s, dir, "documents").repartition(col("doc_id")),
        "doc_id", "text", k = 0.5, nBuckets = 3, exactRank = true)
    }),

    // X: CCNet-faithful PER-LANGUAGE perplexity terciles — cut points
    // within each language, so low-resource languages aren't consigned
    // to the tail by a pooled cut; exactRank mode for the oracle, the
    // approx per-group percentile mode is spec-gated against it
    "q_x_perplexity_buckets_by" -> ((s, dir) => {
      graft.text.Curation.perplexityBucketsBy(
        t(s, dir, "documents").repartition(col("doc_id")),
        "doc_id", "text", byCol = "lang", k = 0.5, nBuckets = 3,
        exactRank = true)
        .select(col("doc_id"), col("lang"), col("n_bigrams"),
          col("avg_logprob"), col("bucket"))
    }),

    // X: one-call corpus health report — the pre-promotion audit frame
    // (docs/tokens/dup mass/short mass/language entropy), exact by
    // design; distinct runs on fingerprints, never text
    "q_x_health_report" -> ((s, dir) => {
      graft.text.SnapshotOps.healthReport(
        t(s, dir, "documents"), "doc_id", "text", "lang")
    }),

    // X: per-stratum token drift — which language moved between the two
    // corpus halves; one-sided strata pin to the ln(2)/2 ceiling
    "q_x_token_drift_by" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      graft.text.SnapshotOps.tokenDriftBy(
        d.where(pmod(col("doc_id"), lit(2)) === 0),
        d.where(pmod(col("doc_id"), lit(2)) === 1), "text", "lang")
    }),

    // X: C4 line-level cleaning (word floor + blocklist + brace filter;
    // punct requirement off — the synthetic corpus is unpunctuated).
    // Shuffle-free stream-through projection
    "q_x_c4_line_filter" -> ((s, dir) => {
      graft.text.Curation.c4LineFilter(t(s, dir, "documents"),
        "doc_id", "text", minLineWords = 20, requireTerminalPunct = false,
        blocklist = Seq("javascript", "cookie", "lorem ipsum"),
        dropBraces = true, minKeptLines = 1)
    }),

    // X: the full corpus-preprocessing composition (language -> quality ->
    // redact -> exact dedup -> near-dup clusters -> decontaminate), audited
    // per stage. Oracle-gated end-to-end: every stage is SQL-expressible
    // (the near-dup stage via brute-force Jaccard + recursive-CTE
    // components, exactly like q_x_dedup_clusters), so the DuckDB oracle
    // recomputes the whole composition INCLUDING stage ordering — a wrong
    // order (e.g. decontaminating against un-redacted benchmark text)
    // changes the audit counts and fails the hash.
    "q_x_corpus_pipeline" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val (_, audit) = graft.text.CorpusPipeline.preprocess(
        docs, "doc_id", "text",
        benchmark = Some(docs.where(pmod(col("doc_id"), lit(97)) === 0)))
      audit.toDF("stage", "n_rows")
    }),

    // X: corpus pipeline with every round-6 stage enabled (NFC
    // normalization, Gopher rules, C4 line dedup, n-gram
    // decontamination) — the oracle recomputes the ENTIRE 9-stage
    // composition in DuckDB (round 8), chaining each stage's standalone
    // oracle fragment in pipeline order
    "q_x_corpus_pipeline_v2" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val (_, audit) = graft.text.CorpusPipeline.preprocess(
        docs, "doc_id", "text",
        benchmark = Some(docs.where(pmod(col("doc_id"), lit(97)) === 0)),
        graft.text.CorpusPipeline.Thresholds(
          unicodeForm = Some("NFC"),
          gopherMinWords = Some(10),
          // the synthetic corpus's register uses one canonical stopword
          gopherMinStopwords = 1,
          lineDedupSep = Some("\n"),
          ngramOverlapN = Some(5)))
      audit.toDF("stage", "n_rows")
    }),

    // X: benchmark decontamination flags (normalized exact match against
    // a stand-in eval set: every 97th document)
    "q_x_decontaminate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.text.TextOps.contaminationFlags(
          docs, docs.where(pmod(col("doc_id"), lit(97)) === 0),
          "doc_id", "text", "text")
        .select(col("id").as("doc_id"), col("contaminated"))
    }),

    // X: n-gram-overlap decontamination (the GPT-3 scheme): docs sharing
    // ANY 5-gram with the benchmark subset — broadcast benchmark grams,
    // corpus side streams through one scan
    "q_x_decontaminate_ngram" -> ((s, dir) => {
      // spread the single-file scan before the CPU-bound shingle explode
      val docs = t(s, dir, "documents").repartition(col("doc_id"))
      graft.text.TextOps.ngramOverlapIds(
        docs, docs.where(pmod(col("doc_id"), lit(37)) === 0),
        "doc_id", "text", "text", n = 5)
    }),

    // X: PII-ish redaction (urls then emails -> typed placeholders)
    "q_x_redact" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.text.TextOps.redact(col("text")).as("redacted"))
    }),

    // X: token repetition ratio (degenerate-document quality flag)
    "q_x_repetition" -> ((s, dir) => {
      import graft.text.TextOps
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.repetitionRatio(TextOps.tokens(col("text"))).as("rep_ratio"))
    }),

    // X: language identification (stopword-marker heuristic)
    "q_x_lang_id" -> ((s, dir) => {
      import graft.text.TextOps
      val toks = TextOps.tokens(col("text"))
      t(s, dir, "documents").repartition(col("doc_id"))
        .select(col("doc_id"), TextOps.langId(toks).as("lang_pred"),
          round(TextOps.langScore(toks, "en"), 4).as("s_en"))
    }),

    // X: deterministic stratified sampling — bottom-k md5 rank per
    // stratum: uniform, engine-reproducible (oracle computes the exact
    // same set), and nested across k. The balanced-slice draw of a
    // training-mix builder.
    "q_x_stratified_sample" -> ((s, dir) => {
      graft.functions.Sampling.stratifiedSample(
          t(s, dir, "orders"), Seq("o_orderpriority"), "o_orderkey", k = 10)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    }),

    // X: weighted stratified sample (Efraimidis-Spirakis A-Res on an
    // md5-derived uniform), quality-weighted by doc length — rows-only:
    // selection order depends on unrounded pow(), which differs by ulps
    // across libm implementations; the machinery is oracle-gated by the
    // unit-weight variant below and spec'd for weight sensitivity
    "q_x_weighted_sample" -> ((s, dir) => {
      graft.functions.Sampling.weightedSample(
          t(s, dir, "documents")
            .withColumn("wt", coalesce(col("n_chars"), lit(1L)).cast("double")),
          Seq("lang"), "doc_id", "wt", k = 20)
        .select(col("lang"), col("doc_id"), col("n_chars"))
    }),

    // X: unit-weight A-Res — key reduces to the md5-derived uniform
    // itself, so the selection is exactly the top-k by hex prefix and
    // DuckDB reproduces it bit-for-bit (no transcendentals in play)
    "q_x_weighted_sample_unit" -> ((s, dir) => {
      graft.functions.Sampling.weightedSample(
          t(s, dir, "documents").withColumn("wt", lit(1.0)),
          Seq("lang"), "doc_id", "wt", k = 20)
        .select(col("lang"), col("doc_id"), col("n_chars"))
    }),

    // X: deterministic corpus shuffle — global rank by md5(doc_id) via
    // the two-phase distributed scan, never a single-partition window
    "q_x_global_shuffle" -> ((s, dir) => {
      graft.ops.Scans.globalRowNumber(
          t(s, dir, "documents")
            .select(col("doc_id"), md5(col("doc_id").cast("string")).as("k")),
          "k", "shuffle_pos")
        .select(col("doc_id"), col("shuffle_pos"))
    }),

    // X: weighted training-mix draw — per-language target counts, md5
    // bottom-k per stratum; absent strata are whitelisted out
    "q_x_training_mix" -> ((s, dir) => {
      graft.functions.Sampling.trainingMix(
          t(s, dir, "documents"), "lang", "doc_id",
          Map("en" -> 50, "de" -> 20, "zh" -> 10))
        .select(col("lang"), col("doc_id"), col("source"))
    }),

    // X: deterministic hash split — assignment is a pure projection on
    // doc_id, stable under corpus growth/re-partitioning
    "q_x_split_assign" -> ((s, dir) => {
      graft.functions.Sampling.splitAssign(
          t(s, dir, "documents"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("split")).agg(count(lit(1)).as("n_docs"))
    }),

    // X: token-BUDGET mix — per-language budgets in TOKENS (the unit a
    // pre-training mix is specified in), deterministic md5 prefix rule
    "q_x_token_budget_mix" -> ((s, dir) => {
      import graft.text.TextOps
      val d = t(s, dir, "documents")
        .withColumn("n_tokens", size(TextOps.tokens(col("text"))).cast("long"))
      graft.functions.Sampling.tokenBudgetMix(d, "lang", "doc_id", "n_tokens",
          Map("en" -> 5000L, "de" -> 2000L, "zh" -> 1000L))
        .select(col("lang"), col("doc_id"), col("n_tokens"))
    }),

    // X: temperature-scaled mix — per-language targets total*sqrt(n)/sum,
    // shares snapped to 6 decimals on both sides so the floor agrees
    "q_x_temperature_mix" -> ((s, dir) => {
      graft.functions.Sampling.temperatureMix(
          t(s, dir, "documents"), "lang", "doc_id",
          total = 200, alpha = 0.5)
        .select(col("lang"), col("doc_id"), col("source"))
    }),

    // X: BM25 ranked retrieval — the lexical search used to pull topical
    // slices from a corpus; postings pruned by a broadcast query-term
    // semi-join BEFORE the corpus-wide shuffle. Scores rounded before
    // ranking (ties by doc id) so the ranking is engine-reproducible.
    "q_x_bm25" -> ((s, dir) => {
      graft.text.TextOps.bm25TopK(
          t(s, dir, "documents"), "doc_id", "text",
          queries = Seq(
            "qa" -> "hash join merge",
            "qb" -> "stream window batch",
            "qc" -> "vector column scan"),
          k = 10)
        .withColumnRenamed("id", "doc_id")
    }),

    // X: concat-and-chunk sequence packing — the global token-stream
    // prefix sum done as a two-phase distributed scan (range shuffle +
    // per-partition windows + tiny driver prefix), never a
    // single-partition window
    "q_x_pack_sequences" -> ((s, dir) => {
      import graft.text.{Packing, TextOps}
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      Packing.packSequences(docs, "doc_id", "n_tokens", ctxLen = 512)
    }),

    // X: document-boundary next-fit bin packing (T5-style: docs never
    // split across sequences) — deterministic parallel packing via
    // fixed-size rank chunks; single chunk here so the sequential
    // oracle recursion reproduces it exactly
    "q_x_pack_bins" -> ((s, dir) => {
      graft.text.Packing.packBinsNextFit(t(s, dir, "documents"),
        "doc_id", "n_chars", capacity = 1200)
    }),

    // X: full PII rule-chain redaction (url -> email -> ipv4 -> phone,
    // order load-bearing) — one codegen'd projection, zero shuffles
    "q_x_redact_full" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.text.TextOps.redactAll(col("text")).as("redacted"))
    }),

    // X: snapshot diff between two corpus versions (added / removed /
    // changed / unchanged by normalized fingerprint) — fingerprints
    // leave the scan, one full-outer sort-merge join on the id
    "q_x_corpus_diff" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val oldSnap = d.where(pmod(col("doc_id"), lit(10)) =!= 0)
      val newSnap = d.where(pmod(col("doc_id"), lit(13)) =!= 0)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(col("text"), lit(" drifted extra tokens")))
            .otherwise(col("text")))
      graft.text.SnapshotOps.corpusDiff(oldSnap, newSnap, "doc_id", "text")
    }),

    // X: token-distribution drift (Jensen-Shannon divergence) between
    // two corpus halves — per-side hash aggregates, vocabulary-sized
    // join, one global sum; corpus text scanned once per side
    "q_x_token_drift" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      graft.text.SnapshotOps.tokenDrift(
        d.where(pmod(col("doc_id"), lit(2)) === 0),
        d.where(pmod(col("doc_id"), lit(2)) === 1), "text")
    }),

    // X: near-dup-aware split assignment — synthetic dup chains (len 2
    // at doc_id%25, len 3 at doc_id%50) cluster via connected
    // components; every cluster hashes to one split on its min-id, so
    // near-dups cannot straddle train/test by construction
    "q_x_split_by_cluster" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val ids = d.select(col("doc_id"))
      def chain(startMod: Int, offset: Int) = ids.as("x")
        .join(ids.as("y"), col("y.doc_id") === col("x.doc_id") + 1)
        .where(pmod(col("x.doc_id") - offset, lit(startMod)) === 0)
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      val pairs = chain(25, 0).union(chain(50, 1))
      graft.functions.Sampling.splitAssignByCluster(d, pairs, "doc_id",
          splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))
    }),

    // X: per-benchmark contamination attribution — distinct corpus docs
    // sharing any 5-gram with each benchmark doc (0 = still-trustworthy
    // eval items); benchmark grams broadcast, corpus streams once.
    // Complements q_x_contamination_report (per-SOURCE rates): this one
    // answers "which eval items are compromised", that one "how dirty
    // is each corpus source"
    "q_x_bench_contamination" -> ((s, dir) => {
      val d = t(s, dir, "documents").repartition(col("doc_id"))
      graft.text.TextOps.contaminationReport(
        d.where(pmod(col("doc_id"), lit(37)) =!= 0),
        d.where(pmod(col("doc_id"), lit(37)) === 0),
        "doc_id", "text", "doc_id", "text", n = 5)
    }),

    // X: hashed-feature linear quality classifier (fastText-style):
    // train driver-side on the labeled sample (en vs zh docs), score
    // the corpus as a shuffle-free codegen projection with the weights
    // riding a codegen reference object. Scores are deterministic
    // (seeded SGD over id-ordered docs) but float-path-dependent, so
    // this is a rows-only check; QualityClassifierSpec owns accuracy
    "q_x_quality_score" -> ((s, dir) => {
      import graft.text.QualityClassifier
      val d = t(s, dir, "documents")
      val model = QualityClassifier.train(
        d.where(col("lang") === "en"), d.where(col("lang") === "zh"),
        "doc_id", "text", dim = 1 << 14, epochs = 5)
      QualityClassifier.score(d, "doc_id", "text", model)
    }),

    // X: the quality classifier's SCORING KERNEL oracle-gated with a
    // FIXED model (trained-weight runs stay rows-only — SGD is not SQL):
    // dim=8 (a power of two, so signed floorMod == unsigned % in the
    // oracle's HUGEINT arithmetic), weights all exact binary fractions
    // (so the mean is order-independent in doubles), tokens synthesized
    // per row exactly as in q_x_simhash_sig — the XXH64(42) hash,
    // bucketing, mean and bias must reproduce DuckDB bit for bit
    "q_x_quality_margin_fixed" -> ((s, dir) => {
      import graft.text.{QualityClassifier, QualityModel}
      val model = QualityModel(8,
        Array(0.25, -0.5, 0.125, 0.75, -0.25, 0.0625, -0.125, 0.5), 0.0625)
      t(s, dir, "documents")
        .withColumn("__toks", expr(
          "transform(sequence(0, 9), i -> concat('t', CAST(doc_id AS string), '_', CAST(i AS string), repeat('p', i)))"))
        .select(col("doc_id"),
          QualityClassifier.marginCol(col("__toks"), model).as("margin"))
    }),

    // X: incremental corpus dedup — a new batch (doc_id%10=3) against
    // the rest as the existing corpus: in-batch exact collapse, exact
    // anti-join vs corpus fingerprints, near-dup removal via the
    // cross-corpus MinHash path (corpus streams, batch broadcasts)
    "q_x_dedup_incremental" -> ((s, dir) => {
      val docs = t(s, dir, "documents").repartition(col("doc_id"))
      val nw = docs.where(pmod(col("doc_id"), lit(10)) === 3)
        .select(col("doc_id"), col("text"))
      val ex = docs.where(pmod(col("doc_id"), lit(10)) =!= 3)
        .select(col("doc_id"), col("text"))
      graft.text.TextOps.dedupIncremental(nw, ex, "doc_id", "text")
    }),

    // X: incremental corpus dedup, INDEXED — the recurring-batch
    // production form: the corpus is signed ONCE into a persisted
    // DedupIndex (amortized exactly as in steady state, hence the
    // per-dir build cache), then each batch is a pure probe whose cost
    // is bounded by the batch and its candidates — flat as the corpus
    // grows, where the scan form above re-signs the whole corpus per
    // batch. maxBucket is uncapped here to match the (uncapped)
    // exact-semantics oracle; production keeps the default cap.
    "q_x_dedup_incremental_idx" -> ((s, dir) => {
      val docs = t(s, dir, "documents").repartition(col("doc_id"))
      val nw = docs.where(pmod(col("doc_id"), lit(10)) === 3)
        .select(col("doc_id"), col("text"))
      val ex = docs.where(pmod(col("doc_id"), lit(10)) =!= 3)
        .select(col("doc_id"), col("text"))
      val idx = dedupIdxFor(s, dir)
      graft.text.TextOps.dedupIncremental(nw, ex, "doc_id", "text", idx,
        dedupIdxParams)
    }),

    // X: repeated verbatim passages (exact-substring-dedup core): every
    // position of a 10-gram appearing in >= 2 distinct docs
    "q_x_repeated_passages" -> ((s, dir) => {
      val docs = t(s, dir, "documents").repartition(col("doc_id"))
      graft.text.TextOps.repeatedPassages(docs, "doc_id", "text",
          n = 10, minDocs = 2)
        .withColumnRenamed("id", "doc_id")
    }),

    // X: maximal repeated spans — gaps-and-islands collapse of the
    // flagged positions; the clip list exact-substring dedup consumes
    "q_x_repeated_spans" -> ((s, dir) => {
      val docs = t(s, dir, "documents").repartition(col("doc_id"))
      graft.text.TextOps.repeatedSpans(docs, "doc_id", "text",
          n = 10, minDocs = 2)
        .withColumnRenamed("id", "doc_id")
    }),

    // X: exact-substring dedup applied — repeated 10-grams clipped
    // everywhere except the gram's min-id doc (one canonical copy
    // survives corpus-wide)
    "q_x_clip_repeated" -> ((s, dir) => {
      val docs = t(s, dir, "documents").repartition(col("doc_id"))
      graft.text.TextOps.clipRepeated(docs, "doc_id", "text", n = 10, minDocs = 2)
    }),

    // X: per-source contamination report — the audit a data lead reads
    // before a training run; composes the n-gram guard with a grouped
    // rate rollup
    "q_x_contamination_report" -> ((s, dir) => {
      val docs = t(s, dir, "documents").repartition(col("doc_id"))
      val hits = graft.text.TextOps.ngramOverlapIds(
          docs, docs.where(pmod(col("doc_id"), lit(37)) === 0),
          "doc_id", "text", "text", n = 5)
        .withColumn("hit", lit(1))
      docs.join(hits, Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          count(col("hit")).cast("long").as("n_contaminated"),
          round(count(col("hit")).cast("double") / count(lit(1)), 4).as("rate"))
    }),

    // X: token-length distribution per language — corpus shape stats
    // (exact interpolated percentiles match DuckDB's quantile_cont)
    "q_x_token_dist" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      docs.select(col("lang"),
          size(graft.text.TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          min(col("n_tokens")).as("min_tokens"),
          max(col("n_tokens")).as("max_tokens"),
          round(avg(col("n_tokens")), 4).as("avg_tokens"),
          round(expr("percentile(n_tokens, 0.5)"), 4).as("p50_tokens"),
          round(expr("percentile(n_tokens, 0.9)"), 4).as("p90_tokens"))
    }),

    // X: frozen-LM cross scoring (the CCNet shape): train the bigram LM
    // on the corpus (doc_id%10<>3), score the held-out batch against it;
    // unseen bigrams fall back to the pure smoothing mass
    "q_x_lm_score_cross" -> ((s, dir) => {
      val docs = t(s, dir, "documents").repartition(col("doc_id"))
      val lm = graft.text.TextOps.bigramLmTrain(
        docs.where(pmod(col("doc_id"), lit(10)) =!= 3), "doc_id", "text")
      graft.text.TextOps.bigramLmScore(
          docs.where(pmod(col("doc_id"), lit(10)) === 3), "doc_id", "text",
          lm, k = 0.5)
        .withColumnRenamed("id", "doc_id")
    }),

    // X: binned range join — lineitems shipping within 7 days of a probe
    // set of order dates; the equi-join rewrite of a non-equi condition
    // Spark would otherwise plan as BroadcastNestedLoop
    "q_x_range_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(col("l_orderkey"),
        col("l_linenumber"),
        datediff(to_date(col("l_shipdate")), lit("1992-01-01")).cast("long").as("pd"))
      val iv = t(s, dir, "orders")
        .where(pmod(col("o_orderkey"), lit(1000)) === 0)
        .select(col("o_orderkey"),
          datediff(to_date(col("o_orderdate")), lit("1992-01-01")).cast("long").as("s0"))
        .withColumn("e0", col("s0") + 7)
      graft.ops.RangeJoin.pointInInterval(li, iv, "pd", "s0", "e0", binSize = 7)
        .select(col("l_orderkey"), col("l_linenumber"), col("o_orderkey"), col("pd"))
    }),

    // X: rolling RANGE-frame aggregate — trailing-30-day revenue per
    // customer (value-based frame: gaps and ties per the SQL standard)
    "q_x_rolling_agg" -> ((s, dir) => {
      val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1992-01-01")).cast("long").as("d"),
        col("o_totalprice"))
      graft.ops.Windows.rollingAgg(o, Seq("o_custkey"), "d", "o_totalprice",
          lookback = 30)
        // rolling_avg stays out of the compared columns: the mean of
        // 2-decimal prices lands ON .005 rounding boundaries where the
        // two engines' division ulps legitimately differ; sum+count pin
        // the same arithmetic without the boundary flake
        .select(col("o_orderkey"), col("o_custkey"), col("d"),
          round(col("rolling_sum"), 2).as("rolling_sum"), col("rolling_n"))
    }),

    // X: interval-interval overlap join — same binning rewrite, pairs
    // emitted exactly once from their canonical first shared bin
    "q_x_interval_overlap" -> ((s, dir) => {
      val a = t(s, dir, "orders")
        .where(pmod(col("o_orderkey"), lit(100)) === 0)
        .select(col("o_orderkey"),
          datediff(to_date(col("o_orderdate")), lit("1992-01-01")).cast("long").as("ls"))
        .withColumn("le", col("ls") + 7)
      val b = t(s, dir, "lineitem")
        .where(pmod(col("l_orderkey"), lit(100)) === 0)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          datediff(to_date(col("l_shipdate")), lit("1992-01-01")).cast("long").as("rs"))
        .withColumn("re", col("rs") + 3)
      graft.ops.RangeJoin.intervalOverlap(a, b, "ls", "le", "rs", "re", binSize = 7)
        .select(col("o_orderkey"), col("l_orderkey"), col("l_linenumber"),
          col("ls"), col("rs"))
    }),

    // X: Bloom-prefiltered semi join — exact EXISTS semantics, corpus
    // side pruned at the scan by the reference side's Bloom filter
    "q_x_bloom_semi" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val p = t(s, dir, "part").where(col("p_size") >= 45)
      // expectedItems passed explicitly: skips the sizing count() pass
      graft.ops.BloomJoin.semiJoin(li, p, "l_partkey", "p_partkey",
        expectedItems = 20000)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_partkey"))
    }),

    // X: Bloom-prefiltered anti join — filter-cleared rows are kept
    // without joining; only possible-members pay the exact anti join
    "q_x_bloom_anti" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer").where(col("c_acctbal") > 9000)
      graft.ops.BloomJoin.antiJoin(o, c, "o_custkey", "c_custkey",
        expectedItems = 20000)
        .select(col("o_orderkey"), col("o_custkey"))
    }),

    // X: z-order clustering — layout rewrite preserves content exactly;
    // the multi-dim filter that the layout would prune at the footer
    "q_x_zorder" -> ((s, dir) => {
      val z = graft.ops.Zorder.cluster(
        t(s, dir, "lineitem"), Seq("l_partkey", "l_suppkey"), numPartitions = 8)
      z.where(col("l_partkey") < 200 && col("l_suppkey") < 40)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_partkey"), col("l_suppkey"))
    }),

    // X: small-files compaction — a REAL write/compact/read round trip:
    // documents sprayed into 32 tiny files, compacted to ~half the bytes
    // per file, read back and aggregated; the oracle aggregates the
    // original table, so any row lost or duplicated in the rewrite+swap
    // fails the hash
    "q_x_compact" -> ((s, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft_q_compact_")
        .toString + "/docs"
      t(s, dir, "documents").repartition(32).write.mode("overwrite").parquet(tmp)
      val bytes = new java.io.File(tmp).listFiles()
        .filter(f => f.isFile && !f.getName.startsWith("_")).map(_.length).sum
      graft.ops.Compaction.compact(s, tmp, math.max(1L, bytes / 2))
      s.read.parquet(tmp)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_id"),
          sum(col("n_chars")).as("sum_chars"))
    }),

    // X: deterministic training-shard write — REAL shard+manifest round
    // trip: the manifest (counted from the PUBLISHED files) must equal
    // the pmod grouping computed by the oracle on the source table
    "q_x_shard_manifest" -> ((s, dir) => {
      val out = java.nio.file.Files.createTempDirectory("graft_q_shards_")
        .toString + "/c"
      val docs = t(s, dir, "documents")
        .withColumn("n_tokens",
          size(graft.text.TextOps.tokens(col("text"))).cast("long"))
      graft.etl.Shards.write(docs, "doc_id", "n_tokens", out, nShards = 8)
        .select(col("shard").cast("long").as("shard"), col("n_docs"),
          col("n_tokens"))
    }),

    // X: KLL quantile sketch — mergeable percentiles (rows-only: KLL
    // compaction is randomized, estimates vary within the rank-error
    // bound run to run; the bound itself is spec-asserted)
    "q_x_kll_quantiles" -> ((s, dir) => {
      import s.implicits._
      val sk = graft.functions.Sketches.kllBytes(
        t(s, dir, "lineitem"), "l_extendedprice")
      Seq((
        graft.functions.Sketches.kllQuantile(sk, 0.5),
        graft.functions.Sketches.kllQuantile(sk, 0.95),
        graft.functions.Sketches.kllQuantile(sk, 0.99)))
        .toDF("p50", "p95", "p99")
    }),

    // X: the KLL path under an EXACT config — the sketch performs no
    // compaction while n <= k, so over a FIXED orderkey range (~8k rows
    // at any scale factor; k = 32767 covers it with margin) its
    // quantiles are exact order statistics and the whole sketch
    // machinery (per-partition build, merge, inclusive-rank query) is
    // hash-gated against SQL order statistics. The production config
    // above stays rows-only by design (randomized compaction).
    "q_x_kll_quantiles_exact" -> ((s, dir) => {
      import s.implicits._
      val in = t(s, dir, "lineitem").where(col("l_orderkey") < 8000)
      val sk = graft.functions.Sketches.kllBytes(in, "l_extendedprice",
        k = 32767)
      Seq((
        math.rint(graft.functions.Sketches.kllQuantile(sk, 0.5) * 100) / 100,
        math.rint(graft.functions.Sketches.kllQuantile(sk, 0.95) * 100) / 100,
        math.rint(graft.functions.Sketches.kllQuantile(sk, 0.99) * 100) / 100))
        .toDF("p50", "p95", "p99")
    }),

    // X: exact heavy hitters in two narrow passes (Misra-Gries candidate
    // sweep, then one tiny agg over candidates — no full-key shuffle)
    "q_x_heavy_hitters" -> ((s, dir) => {
      graft.functions.Sketches.heavyHitters(
        t(s, dir, "lineitem"), "l_suppkey", support = 0.0105)
    }),

    // X: HLL distinct per group — sparse-mode sketches are exact at this
    // cardinality, so the estimate hash-matches DuckDB's exact distinct
    "q_x_hll_distinct" -> ((s, dir) => {
      import graft.functions.Sketches
      Sketches.hllSketches(t(s, dir, "lineitem"), Seq("l_returnflag"), "l_suppkey")
        .select(col("l_returnflag"),
          hll_sketch_estimate(col("hll")).as("distinct_supp"))
    }),

    // X: sliding-window chunking — context-window prep; overlapping
    // 64-token windows at stride 48, >= 1 chunk per doc
    "q_x_chunk_docs" -> ((s, dir) => {
      graft.text.TextOps.chunkDocs(t(s, dir, "documents"),
        "doc_id", "text", chunkSize = 64, overlap = 16)
    }),

    // X: sentence-boundary-aware chunking — the RAG chunker: greedy
    // whole-sentence fill to 40 tokens, never splitting a sentence; the
    // row-local aggregate() fold is oracle-gated against a DuckDB
    // recursive CTE running the identical greedy recurrence
    "q_x_chunk_sentences" -> ((s, dir) => {
      graft.text.TextOps.chunkSentences(t(s, dir, "documents"),
        "doc_id", "text", maxTokens = 40)
    }),

    // X: dense-sign random projection (Achlioptas'03) 64 -> 8 dims — the
    // md5-derived sign matrix is data-independent, so the oracle rebuilds
    // it verbatim in SQL; exploded to scalars for the hash compare
    "q_x_random_proj" -> ((s, dir) => {
      graft.vec.Reduce.randomProject(t(s, dir, "embeddings"),
          "embedding", "proj", inDim = 64, outDim = 8)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("dim", "comp")))
        .select(col("vec_id"), col("dim").cast("long").as("dim"),
          // + 0.0 folds IEEE -0.0 to +0.0 (values rounding to zero from
          // below would otherwise hash-differ from the oracle's +0.0)
          (round(col("comp"), 4) + lit(0.0)).as("comp"))
    }),

    // X: one-pass distributed covariance over the first 16 dims, upper
    // triangle — ONE agg keyed by the dimension pair (schema-sized key
    // space), explicit-sums form matching the oracle bit-for-bit class
    "q_x_cov_matrix" -> ((s, dir) => {
      graft.vec.Reduce.covMatrix(t(s, dir, "embeddings"), "embedding", dims = 16)
        .select(col("i"), col("j"),
          (round(col("cov"), 6) + lit(0.0)).as("cov"))
    }),

    // X: hard-negative mining (DPR/ANCE recipe) — per query the top-5
    // most-similar DIFFERENT-label vectors, the contrastive-training
    // negatives that sit on the decision boundary
    "q_x_hard_negatives" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.vec.VectorOps.hardNegatives(
        emb, emb.where(col("vec_id") < 8), "vec_id", "embedding", "label", k = 5)
    }),

    // X: curriculum ordering — global (score, id) rank via the two-phase
    // distributed scan (never a single-partition sort) sliced into 8
    // bands; score = whitespace token count (the short-to-long
    // length-curriculum schedule)
    "q_x_curriculum" -> ((s, dir) => {
      val d = t(s, dir, "documents").withColumn("score",
        size(graft.text.TextOps.tokens(col("text"))).cast("long"))
      graft.etl.Shards.curriculum(d, "score", "doc_id", nBands = 8)
        .select(col("doc_id"), col("score"),
          col("curriculum_rank"), col("band"))
    }),

    // X: embedding-dimension correlation matrix — the isotropy audit
    // (a sound embedder yields near-zero off-diagonals; structure here
    // means dims are redundant and PCA will compress well); same
    // single pair-keyed aggregation as q_x_cov_matrix plus two
    // broadcast diagonal joins
    "q_x_embed_corr" -> ((s, dir) => {
      graft.vec.Reduce.corrMatrix(t(s, dir, "embeddings"), "embedding", dims = 12)
        .select(col("i"), col("j"),
          (round(col("corr"), 5) + lit(0.0)).as("corr"))
    }),

    // X: PCA spectrum invariants — trace (sum of eigenvalues == sum of
    // per-dim variances) and Frobenius (sum of squared eigenvalues ==
    // squared Frobenius norm of the covariance) identities oracle-gate
    // the driver-side Jacobi eigensolver without SQL needing one
    "q_x_pca_trace" -> ((s, dir) => {
      import s.implicits._
      val model = pcaFor(s, dir, dims = 16)
      Seq((16L, model.eigenvalues.sum, model.eigenvalues.map(x => x * x).sum))
        .toDF("dims", "eigen_sum", "eigen_sumsq")
        .select(col("dims"), round(col("eigen_sum"), 6).as("eigen_sum"),
          round(col("eigen_sumsq"), 6).as("eigen_sumsq"))
    }),

    // X: PCA projection onto the top-4 components (rows-only BY DESIGN:
    // an eigensolver has no SQL twin; the kernel is gated by the
    // hash-matched q_x_pca_trace invariants plus ReduceSpec
    // orthonormality / diagonalization / per-component-variance checks)
    "q_x_pca_project" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val model = pcaFor(s, dir, dims = 16)
      graft.vec.Reduce.pcaProject(emb, "embedding", "proj", model, k = 4)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("dim", "comp")))
        .select(col("vec_id"), col("dim").cast("long").as("dim"),
          round(col("comp"), 4).as("comp"))
    }),

    // X: pcaProject's projection arithmetic gated END TO END with a
    // PLANTED model (the q_x_procrustes_align trick): md5-sign unit
    // components + literal means + power-of-2 whiten scales, all
    // rebuildable in SQL — everything q_x_pca_project exercises except
    // the (trace/Frobenius/spec-gated) eigensolver itself
    "q_x_pca_project_planted" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val model = graft.vec.Reduce.PcaModel(
        means = Array.tabulate(16)(i => i / 32.0),
        components = graft.vec.Reduce.signMatrix(16, 4, seed = 11)
          .map(_.map(_ / 4.0)),
        // whiten scales 1/sqrt(ev) = 0.5, 1, 2, 4 — exact powers of two
        // so Spark's 1.0/math.sqrt(ev) and the oracle's power(2, c-1)
        // are the same double bit for bit
        eigenvalues = Array(4.0, 1.0, 0.25, 0.0625))
      graft.vec.Reduce.pcaProject(emb, "embedding", "proj", model,
          k = 4, whiten = true)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("dim", "comp")))
        .select(col("vec_id"), col("dim").cast("long").as("dim"),
          (round(col("comp"), 4) + lit(0.0)).as("comp"))
    }),

    // X: script detection by Unicode block — the corpus is ASCII, so the
    // query first swaps two common words for Cyrillic/CJK equivalents
    // (same literal replaces in the oracle); ratios + dominant script
    "q_x_script_profile" -> ((s, dir) => {
      val multi = t(s, dir, "documents").select(col("doc_id"),
        regexp_replace(regexp_replace(col("text"),
          "table", "таблица"),
          "value", "值值值").as("text"))
      graft.text.TextOps.scriptProfile(multi, "doc_id", "text")
    }),

    // X: mojibake repair — the query INJECTS cp1252-misread bytes
    // (every 'a' becomes "Ã¡", the mojibake of a-acute) and
    // the repair must reconstruct the clean text the oracle builds
    // directly ('a' -> "á")
    "q_x_fix_mojibake" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        graft.functions.TextExpressions.fix_mojibake(
          regexp_replace(col("text"), "a", "\u00c3\u00a1")).as("fixed_text"))
    }),

    // X: unicode NFC normalization (custom expression; Spark has no
    // built-in) — the corpus is ASCII, so the query first decomposes
    // every 'a' into 'a' + combining acute (U+0301) and the normalizer
    // must recompose it; the oracle does the same via nfc_normalize
    "q_x_unicode_normalize" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        graft.functions.TextExpressions.unicode_normalize(
          regexp_replace(col("text"), "a", "a\u0301"), "NFC").as("norm_text"))
    }),

    // X: C4-style global line dedup — the test corpus has no newlines, so
    // the query first folds every 10 tokens into a line (same regex in
    // the oracle); first occurrence corpus-wide survives, later copies
    // drop, docs reassemble in order (empty docs kept)
    "q_x_dedup_lines" -> ((s, dir) => {
      val multi = t(s, dir, "documents").select(col("doc_id"),
        regexp_replace(col("text"), "((\\S+ ){9}\\S+) ", "$1\n").as("text"))
      graft.text.TextOps.dedupLines(multi, "doc_id", "text")
        .select(col("id").as("doc_id"), col("text"))
    }),

    // X: exact substring dedup (Lee et al. ACL'22 ExactSubstr re-expressed
    // distributed): duplicated >=20-token spans survive only at their
    // first (doc_id, pos) occurrence; affected docs reassemble from the
    // surviving tokens, untouched docs keep their text verbatim
    "q_x_dedup_substrings" -> ((s, dir) => {
      graft.text.TextOps.dedupSubstrings(
          t(s, dir, "documents"), "doc_id", "text", minTokens = 20)
        .select(col("id").as("doc_id"), col("text"))
    }),

    // X: corpus-level effect summary of the same substring cut — size the
    // cut before committing to one
    "q_x_substring_stats" -> ((s, dir) => {
      graft.text.TextOps.substringDedupStats(
        t(s, dir, "documents"), "doc_id", "text", minTokens = 20)
    }),

    // X: persisted substring-dedup index — the continuous-ingest form of
    // q_x_dedup_substrings: the corpus arrives in two id-ordered batches,
    // each cut against everything ingested before it; the unioned output
    // hash-matches the one-shot batch operator (the sequential-ingest
    // equivalence documented on graft.text.SubstrIndex). Inline requires
    // prove the replay contract on live data: re-ingesting batch 2
    // returns the identical cut and appends nothing.
    "q_x_substr_index" -> ((s, dir) => {
      import graft.text.SubstrIndex
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val half = docs.agg(max(col("doc_id"))).head().getLong(0) / 2 + 1
      val idx = java.nio.file.Files
        .createTempDirectory("graft_substr_idx_q_").toString
      val p = SubstrIndex.Params(minTokens = 20)
      val cut1 = SubstrIndex.ingestBatch(
        docs.where(col("doc_id") < half), idx, params = p).transform(graft.ops.Pins.pin)
      val cut2 = SubstrIndex.ingestBatch(
        docs.where(col("doc_id") >= half), idx, params = p).transform(graft.ops.Pins.pin)
      val grams = s.read.parquet(s"$idx/grams").count()
      val replay = SubstrIndex.ingestBatch(
        docs.where(col("doc_id") >= half), idx, params = p)
      require(replay.exceptAll(cut2).isEmpty && cut2.exceptAll(replay).isEmpty,
        "q_x_substr_index: a replayed batch must return the identical cut")
      require(s.read.parquet(s"$idx/grams").count() == grams,
        "q_x_substr_index: a replayed batch must append nothing")
      cut1.unionByName(cut2).select(col("id").as("doc_id"), col("text"))
    }),

    // X: n-gram Jaccard similarity — exact pairwise over a probe subset
    "q_x_jaccard_pairs" -> ((s, dir) => {
      import graft.text.TextOps
      val sub = t(s, dir, "documents")
        .where(pmod(col("doc_id"), lit(50)) === 0)
        .select(col("doc_id"),
          array_distinct(TextOps.tokens(col("text"))).as("st"))
      // |A ∪ B| = |A| + |B| - |A ∩ B| (array_distinct'ed token sets):
      // one hash-set pass per pair instead of two across the quadratic
      // probe-pair space
      sub.as("a").join(sub.as("b"), col("a.doc_id") < col("b.doc_id"))
        .withColumn("__inter", size(array_intersect(col("a.st"), col("b.st"))))
        .withColumn("jaccard",
          col("__inter").cast("double") /
            (size(col("a.st")) + size(col("b.st")) - col("__inter")).cast("double"))
        .where(col("jaccard") >= 0.4)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          round(col("jaccard"), 4).as("jaccard"))
    }),

    // X: split-leakage guard — near-dup pairs (probe-subset Jaccard, same
    // definition as q_x_jaccard_pairs) straddling a deterministic
    // train/test split
    "q_x_split_leakage" -> ((s, dir) => {
      import graft.text.TextOps
      val docs = t(s, dir, "documents")
      val sub = docs.where(pmod(col("doc_id"), lit(50)) === 0)
        .select(col("doc_id"),
          array_distinct(TextOps.tokens(col("text"))).as("st"))
      // same union-size arithmetic as q_x_jaccard_pairs
      val pairs = sub.as("a").join(sub.as("b"), col("a.doc_id") < col("b.doc_id"))
        .withColumn("__inter", size(array_intersect(col("a.st"), col("b.st"))))
        .withColumn("jaccard",
          col("__inter").cast("double") /
            (size(col("a.st")) + size(col("b.st")) - col("__inter")).cast("double"))
        .where(col("jaccard") >= 0.3)
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      val assignments = docs.select(col("doc_id"),
        when(pmod(col("doc_id"), lit(10)) < 8, lit("train"))
          .otherwise(lit("test")).as("split"))
      TextOps.splitLeakage(pairs, assignments, "doc_id", "split")
        .select(col("id_a"), col("id_b"), col("split_a"), col("split_b"))
    }),

    // X: MinHash + LSH near-duplicate pairs (banded candidate join +
    // exact-Jaccard verify). Oracle-gated: the exact-Jaccard verify makes
    // the OUTPUT equal "all pairs with exact shingle-Jaccard >= t"
    // whenever LSH recall is total — and the synthetic near-dup pairs all
    // sit at J >= 0.9 (recall 1-4e-8 per pair at r=4,b=16) with nothing
    // between 0.35 and 0.9, so DuckDB's brute-force all-pairs Jaccard is
    // a deterministic ground truth for the whole banding machinery.
    "q_x_dedup_minhash" -> ((s, dir) => {
      graft.text.TextOps.minhashDedupPairs(
        t(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, numPerm = 64, bands = 16, threshold = 0.5)
    }),

    // X: asymmetric containment pairs (near-SUBSET dedup) — exhaustive
    // validation mode over a 500-doc cap (constant cost across SFs),
    // oracle = the same brute-force containment in SQL; the LSH-candidate
    // production mode is q_x_containment_lsh (rows-only) + spec
    "q_x_containment" -> ((s, dir) => {
      graft.text.TextOps.containmentPairs(
        t(s, dir, "documents").where(col("doc_id") < 500), "doc_id", "text",
        shingleN = 3, threshold = 0.8, exhaustive = true)
    }),

    // X: containment via capped-LSH candidates — the scale path; recall
    // at the low-Jaccard corner is the documented trade (bands dial)
    "q_x_containment_lsh" -> ((s, dir) => {
      graft.text.TextOps.containmentPairs(
        t(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, threshold = 0.8, numPerm = 64, bands = 32)
    }),

    // X: the LSH containment path under a DETERMINISTIC-recall config —
    // the q_x_dedup_minhash_identical trick one step further: group
    // members are a 3-token period repeated 2 or 5 times, so their
    // TEXTS differ but their distinct 3-shingle SETS are identical
    // (cyclic), hence identical MinHash signatures, hence every band
    // collides — banding recall is total BY CONSTRUCTION and the whole
    // candidate+verify machinery is hash-gated (shingle+minhash fused
    // expression, band fold, bucket grouping, pair gen, containment
    // join arithmetic, rounding). Containment is 1.0 both ways (equal
    // sets); the asymmetric VALUES are gated by q_x_containment's
    // exhaustive oracle on real text.
    "q_x_containment_lsh_identical" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val nGroups = math.max(docs.count() / 5, 1L)
      val reps = when(pmod(col("doc_id"), lit(2)) === 0, lit(2)).otherwise(lit(5))
      val src = docs
        .withColumn("grp", pmod(col("doc_id"), lit(nGroups)))
        .withColumn("text", concat_ws(" ",
          flatten(transform(sequence(lit(1), reps),
            _ => transform(sequence(lit(0), lit(2)),
              i => concat(lit("c"), col("grp"), lit("_"), i))))))
      graft.text.TextOps.containmentPairs(src, "doc_id", "text",
        shingleN = 3, threshold = 0.8, numPerm = 64, bands = 32)
    }),

    // X: MinHash+LSH on groups of IDENTICAL synthesized texts — jaccard
    // is exactly 1.0 and token sets are disjoint across groups, so LSH
    // detection is deterministic (identical signatures share every band
    // bucket) and the expected pair set is SQL-computable. Oracle-gates
    // the full machinery: fused shingle+hash expression, banding, bucket
    // grouping, pair generation, estimate prefilter, exact verify.
    "q_x_dedup_minhash_identical" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      // ~5 docs per group at any scale factor (bucket cap is 100)
      val nGroups = math.max(docs.count() / 5, 1L)
      val src = docs
        .withColumn("grp", pmod(col("doc_id"), lit(nGroups)))
        .withColumn("text", concat_ws(" ",
          transform(sequence(lit(0), lit(9)),
            i => concat(lit("t"), col("grp"), lit("_"), i))))
      graft.text.TextOps.minhashDedupPairs(src, "doc_id", "text",
        shingleN = 3, numPerm = 64, bands = 16, threshold = 0.9)
    }),

    // X: cross-corpus MinHash near-dup pairs (incremental dedup: new data
    // vs an existing index, banding BETWEEN the corpora). Oracle-gated
    // like the self-join path: exact-verify makes the output equal
    // brute-force cross-side Jaccard when banding recall is total.
    "q_x_dedup_cross" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.text.TextOps.minhashCrossDupPairs(
        docs.where(pmod(col("doc_id"), lit(2)) === 0),
        docs.where(pmod(col("doc_id"), lit(2)) === 1),
        "doc_id", "text", shingleN = 3, numPerm = 64, bands = 16,
        threshold = 0.5)
    }),

    // X: near-dup-level benchmark decontamination — exact fingerprint
    // matches AND MinHash near-dups of the benchmark are dropped (the
    // every-50th-doc benchmark includes a doc with a near-dup twin in the
    // corpus, so both removal paths are exercised and oracle-checked)
    "q_x_decontaminate_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.text.TextOps.decontaminateNearDup(
          docs, docs.where(pmod(col("doc_id"), lit(50)) === 0),
          "doc_id", "text", "text", shingleN = 3, threshold = 0.5)
        .select(col("doc_id"))
    }),

    // X: staged dedup pipeline — exact-collapse then MinHash over unique
    // representatives (the web-corpus shape). Oracle-gated: every output
    // number is SQL-derivable (md5 fingerprint groups + brute-force
    // exact-Jaccard pairs among min-id representatives).
    "q_x_dedup_pipeline" -> ((s, dir) => {
      val (groups, pairs) = graft.text.TextOps.nearDupPipeline(
        t(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, numPerm = 64, bands = 16, threshold = 0.5)
      // one frame for the gate: group stats + near-dup pair count
      groups.agg(
        count(lit(1)).as("n_unique_texts"),
        sum(col("n_copies")).as("n_docs"),
        max(col("n_copies")).as("max_copies"))
        .crossJoin(pairs.agg(count(lit(1)).as("n_near_dup_pairs")))
    }),

    // X: near-dup pairs -> connected components -> dedup clusters (the
    // keep/drop step of a real dedup pipeline). Oracle-gated per-document:
    // DuckDB recomputes the pair graph by brute-force exact Jaccard and
    // closes it with a recursive CTE, so every (id, cluster_id, keep)
    // verdict — not just the counts — is checked.
    "q_x_dedup_clusters" -> ((s, dir) => {
      val pairs = graft.text.TextOps.minhashDedupPairs(
        t(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, numPerm = 64, bands = 16, threshold = 0.5)
      graft.ops.ConnectedComponents.keepList(pairs, "id_a", "id_b")
        .orderBy("id")
    }),

    // X: connected components (star contraction) over a deterministic
    // synthetic graph — 5 stars (nation -> region hub) + a 500-node chain
    // (consecutive custkeys), the two adversarial shapes — oracle-checked
    // against a DuckDB recursive-CTE min-label closure
    "q_x_cc_oracle" -> ((s, dir) => {
      val stars = t(s, dir, "nation")
        .select((col("n_nationkey") + 100).cast("long").as("id_a"),
          col("n_regionkey").cast("long").as("id_b"))
      val chain = t(s, dir, "customer")
        .where(col("c_custkey") < 500)
        .select((col("c_custkey") + 1000).cast("long").as("id_a"),
          (col("c_custkey") + 1001).cast("long").as("id_b"))
      graft.ops.ConnectedComponents.clusters(stars.union(chain), "id_a", "id_b")
        .orderBy("id")
    }),

    // X: SimHash signatures via a custom Catalyst expression — rows-only
    // over the REAL corpus (CJK tokens are multi-byte, out of reach of
    // the codepoint-as-byte oracle); the kernel itself — per-token
    // XxHash64(seed 42) + 64-bit majority vote — is hash-matched by
    // q_x_simhash_sig below on synthesized ASCII tokens
    "q_x_simhash" -> ((s, dir) => {
      import graft.functions.TextExpressions
      t(s, dir, "documents").repartition(col("doc_id"))
        .select(col("doc_id"),
          TextExpressions.simhash64(
            graft.text.TextOps.tokens(col("text"))).as("sig"))
    }),

    // X: the SimHash KERNEL oracle-gated bit-for-bit: per doc, 10
    // synthesized ASCII tokens "t<doc_id>_<i>" + i*'p' (lengths 4..16
    // bytes, so the XXH64 8-byte-lane, 4-byte-lane, AND tail-byte
    // finalize paths are all exercised), signed by the real Catalyst
    // expression; the DuckDB side re-implements XXH64(seed 42) from the
    // public spec in HUGEINT mod-2^64 arithmetic plus the majority vote
    // — an INDEPENDENT reconstruction, so a seed drift, lane-order bug,
    // or vote-tie mistake in either engine breaks the hash match
    "q_x_simhash_sig" -> ((s, dir) => {
      import graft.functions.TextExpressions
      t(s, dir, "documents").repartition(col("doc_id"))
        .withColumn("toks", expr(
          "transform(sequence(0, 9), i -> concat('t', doc_id, '_', i, repeat('p', i)))"))
        .select(col("doc_id"), TextExpressions.simhash64(col("toks")).as("sig"))
    }),

    // X: SimHash hamming-radius dedup on groups of IDENTICAL synthesized
    // texts: within a group the signatures are equal (hamming 0, always
    // within radius 3 -> caught via the pigeonhole chunk guarantee);
    // across groups the token sets are disjoint so signatures are
    // effectively independent 64-bit values (P(hamming <= 3) ~ 2e-15) —
    // the expected pair set is SQL-computable, oracle-gating the chunk
    // banding, bucket pair generation, and exact bit_count verify.
    "q_x_simhash_dedup_identical" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"))
      val nGroups = math.max(docs.count() / 5, 1L)
      val src = docs
        .withColumn("grp", pmod(col("doc_id"), lit(nGroups)))
        .withColumn("text", concat_ws(" ",
          transform(sequence(lit(0), lit(9)),
            i => concat(lit("t"), col("grp"), lit("_"), i))))
      graft.text.TextOps.simhashNearDupPairs(src, "doc_id", "text",
        shingleN = 3, maxHamming = 3)
    }),

    // X: rolling-hash fingerprint via a custom Catalyst expression —
    // oracle-gated: the Karp-Rabin polynomial in wrapping 64-bit
    // arithmetic is reproduced in SQL with a recursive CTE over character
    // positions and HUGEINT mod-2^64 emulation (driver text is ASCII, so
    // codepoints equal UTF-8 bytes)
    "q_x_rolling_fingerprint" -> ((s, dir) => {
      import graft.functions.TextExpressions
      t(s, dir, "documents")
        .select(col("doc_id"),
          TextExpressions.rolling_hash(
            graft.text.TextOps.normalizeText(col("text"))).as("fp"))
    }),

    // X: brute-force cosine top-k similarity search
    "q_x_ann_brute" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.vec.VectorOps.bruteForceTopK(
        emb, emb.where(col("vec_id") < 8), "vec_id", "embedding", k = 5)
    }),

    // X: SQ8 scalar-quantization reconstruction audit — per-vector L2
    // error of the 1-byte-per-dim round trip (4x compression); fully
    // deterministic, so the whole train/quantize/dequantize path is
    // hash-gated (rare for ANN-adjacent code)
    "q_x_sq8_recon" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val model = graft.vec.Quantize.sq8Train(emb, "embedding", dims = 64)
      graft.vec.Quantize.sq8ReconError(emb, "vec_id", "embedding", model)
        .select(col("vec_id"), round(col("l2_err"), 6).as("l2_err"))
    }),

    // X: asymmetric SQ8 top-k (faiss ADC discipline: full-precision
    // queries against dequantized 1-byte candidates) — deterministic
    // quantization makes even the APPROXIMATE search hash-matchable
    "q_x_ann_sq8" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val model = graft.vec.Quantize.sq8Train(emb, "embedding", dims = 64)
      graft.vec.Quantize.sq8TopK(
        emb, emb.where(col("vec_id") < 8), "vec_id", "embedding", k = 5, model)
    }),

    // X: PERSISTED SQ8 index (4x-compressed lists of 1-byte codes,
    // partition-pruned probes) — deterministic quantization means the
    // exhaustive probe of the COMPRESSED layout hash-matches the same
    // SQL as q_x_ann_sq8: the only compressed ANN path gated directly
    // rather than through an uncompressed twin
    "q_x_ann_vecidx_sq8_exhaustive" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val idx = java.nio.file.Files
        .createTempDirectory("graft_vecidx_sq8_q_").toString
      graft.vec.VecIndex.buildSq8(emb, idx, nlist = 16, kmeansIters = 2)
      graft.vec.VecIndex.topKSq8(emb.where(col("vec_id") < 8), idx,
        k = 5, nprobe = 16)
    }),

    // X: Matryoshka truncation audit — top-10 agreement between
    // full-64-dim and first-16-dim cosine retrieval, per query: what a
    // 4x cheaper truncated index would cost on THIS corpus
    "q_x_matryoshka" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.vec.Quantize.truncationOverlap(
        emb, emb.where(col("vec_id") < 8), "vec_id", "embedding",
        k = 10, keepDims = 16)
    }),

    // X: MMR diversified top-k (Carbonell-Goldstein) — the RAG reranker
    // that stops a context window being k near-copies; greedy argmax as
    // a row-local aggregate() fold over a bounded candidate pool, gated
    // against a DuckDB oracle unrolling the identical recurrence
    "q_x_mmr" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.vec.Mmr.mmrTopK(
        emb, emb.where(col("vec_id") < 8), "vec_id", "embedding",
        k = 3, lambda = 0.7, pool = 10)
    }),

    // X: IVF-partitioned approximate top-k (the scale path) — rows-only
    "q_x_ann_ivf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.vec.VectorOps.ivfTopK(
        emb, emb.where(col("vec_id") < 8), "vec_id", "embedding", k = 5)
    }),

    // X: IVF with nprobe = nlist — exhaustive probing must reproduce the
    // exact brute-force top-k, which oracle-gates the whole IVF machinery
    // (centroid seeding, k-means refinement, assignment, probe join)
    // against the same SQL as q_x_ann_brute
    "q_x_ann_ivf_exhaustive" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.vec.VectorOps.ivfTopK(
        emb, emb.where(col("vec_id") < 8), "vec_id", "embedding", k = 5,
        nlist = 16, nprobe = 16)
    }),

    // X: PERSISTED IVF index (build once to parquet, probe with
    // partition-pruned list reads) — exhaustive probe equals brute
    // force, so the stateful path is oracle-gated end to end
    "q_x_ann_vecidx_exhaustive" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val idx = java.nio.file.Files
        .createTempDirectory("graft_vecidx_q_").toString
      graft.vec.VecIndex.build(emb, idx, nlist = 16, kmeansIters = 2)
      graft.vec.VecIndex.topK(emb.where(col("vec_id") < 8), idx,
        k = 5, nprobe = 16)
    }),

    // X: product-quantization ANN (8 subspaces, 64-entry codebooks, ADC
    // lookup search) — approximate by design, rows-only; the machinery is
    // oracle-gated by the exhaustive variant below
    "q_x_ann_pq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val model = graft.vec.VectorOps.pqTrain(
        emb, "vec_id", "embedding", m = 8, ksub = 64, iters = 2)
      graft.vec.VectorOps.pqTopK(
        emb, emb.where(col("vec_id") < 8), "vec_id", "embedding", k = 5, model)
    }),

    // X: PQ with ksub = N and zero refinement sweeps — every candidate
    // sub-vector IS a codebook entry, so encoding is lossless and the ADC
    // distance equals the exact squared L2: the whole train/encode/table/
    // lookup/rank machinery must reproduce the brute-force L2 top-k,
    // which DuckDB computes directly (same subspace-grouped summation so
    // the doubles agree bit-for-bit)
    // (candidates capped at 500 ids so the deliberately-quadratic
    // lossless encode — O(N * ksub) with ksub = N — stays constant-cost
    // across scale factors; the cap is mirrored in the oracle SQL)
    // X: IVF-PQ (IVFADC) — the billion-scale ANN shape: coarse lists +
    // PQ-coded residuals + per-(query,list) ADC tables
    "q_x_ann_ivfpq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.vec.VectorOps.ivfPqTopK(
        emb, emb.where(col("vec_id") < 8), "vec_id", "embedding", k = 5)
    }),

    // X: IVFADC exhaustive gate — nprobe=nlist + lossless residual
    // codebooks: ADC must equal exact squared L2 bit-for-bit
    "q_x_ann_ivfpq_exhaustive" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").where(col("vec_id") < 500)
      val n = emb.count().toInt
      graft.vec.VectorOps.ivfPqTopK(
        emb, emb.where(col("vec_id") < 8), "vec_id", "embedding", k = 5,
        nlist = 4, nprobe = 4, m = 8, ksub = n, kmeansIters = 0, pqIters = 0)
    }),

    // X: PERSISTED IVF-PQ index — build to parquet (PQ-coded residual
    // lists, 32x smaller than float lists), probe with partition-pruned
    // code reads + exact re-rank against the caller's vector table
    "q_x_ann_vecidx_pq" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val idx = java.nio.file.Files
        .createTempDirectory("graft_vecidxpq_q_").toString
      graft.vec.VecIndex.buildPq(emb, idx, nlist = 16, kmeansIters = 2,
        m = 8, ksub = 64, pqIters = 2)
      graft.vec.VecIndex.topKPq(emb.where(col("vec_id") < 8), idx,
        k = 5, nprobe = 4, refineWith = Some(emb))
    }),

    // X: persisted IVF-PQ exhaustive gate — same lossless construction
    // as q_x_ann_ivfpq_exhaustive but through the parquet round-trip:
    // a serialization bug in codebooks/lists/params fails the hash
    "q_x_ann_vecidx_pq_exhaustive" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").where(col("vec_id") < 500)
      val n = emb.count().toInt
      val idx = java.nio.file.Files
        .createTempDirectory("graft_vecidxpq_q_").toString
      graft.vec.VecIndex.buildPq(emb, idx, nlist = 4, kmeansIters = 0,
        m = 8, ksub = n, pqIters = 0)
      graft.vec.VecIndex.topKPq(emb.where(col("vec_id") < 8), idx,
        k = 5, nprobe = 4)
    }),

    // X: prototypicality pruning (D4): drop the 20% closest-to-centroid
    // per embedding cluster. kmeansIters=0 pins centroids to the
    // deterministic seed vectors so the WHOLE operator (assignment,
    // per-cluster ranking, ceil drop budget) is SQL-expressible — the
    // refined-centroid production mode is spec-gated (VectorOpsSpec)
    "q_x_proto_prune" -> ((s, dir) => {
      graft.vec.VectorOps.protoPrune(t(s, dir, "embeddings"),
          "vec_id", "embedding", nlist = 8, dropFraction = 0.2,
          kmeansIters = 0)
        .withColumnRenamed("id", "vec_id")
    }),

    // X: cluster-balanced subsample — stratifiedSample's semantic-space
    // form: cap each embedding cluster at 10 members by the md5 bottom-k
    // rule (deterministic, nested under growing caps)
    "q_x_cluster_cap" -> ((s, dir) => {
      graft.vec.VectorOps.clusterCapSample(t(s, dir, "embeddings"),
          "vec_id", "embedding", cap = 10, nlist = 8, kmeansIters = 0)
        .withColumnRenamed("id", "vec_id")
    }),

    // X: kNN graph at nlist=1 — the exact all-pairs top-k self-join,
    // which oracle-gates the whole join/dedup/rank machinery; the
    // clustered approximate mode is the scale path (recall spec-gated).
    // Capped at 500 ids so the deliberately-quadratic exact mode stays
    // constant-cost across scale factors (the q_x_ann_pq_exhaustive
    // discipline; cap mirrored in the oracle SQL)
    "q_x_knn_graph" -> ((s, dir) => {
      graft.vec.VectorOps.knnGraph(
        t(s, dir, "embeddings").where(col("vec_id") < 500),
        "vec_id", "embedding", k = 5, nlist = 1, nassign = 1,
        kmeansIters = 0)
    }),

    // X: clustered kNN graph (production shape) — rows-only: approximate
    // by design; the machinery is oracle-gated by q_x_knn_graph and the
    // recall floor lives in VectorOpsSpec. nlist grows with the corpus
    // (~250 vectors per list) so the within-list self-join stays LINEAR
    // in N — fixed nlist measured quadratic: 173 s at 10x vs 9 s scaled
    "q_x_knn_graph_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val nlist = math.max(8, (emb.count() / 250).toInt)
      graft.vec.VectorOps.knnGraph(emb,
        "vec_id", "embedding", k = 5, nlist = nlist, nassign = 2)
    }),

    // X: hybrid retrieval — BM25 lexical top-10 and embedding cosine
    // top-10 fused by reciprocal-rank fusion (the calibration-free
    // standard combiner); embeddings.vec_id IS documents.doc_id, so the
    // two searchers rank the same corpus
    "q_x_hybrid_rrf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val bm = graft.text.TextOps.bm25TopK(
          t(s, dir, "documents"), "doc_id", "text",
          queries = Seq(
            "qa" -> "hash join merge",
            "qb" -> "stream window batch",
            "qc" -> "vector column scan"),
          k = 10)
        .select(col("query_id"), col("id"), col("rank"))
      val ann = graft.vec.VectorOps.bruteForceTopK(
          emb, emb.where(col("vec_id") < 3), "vec_id", "embedding", k = 10)
        .select(
          when(col("query_id") === 0, "qa")
            .when(col("query_id") === 1, "qb").otherwise("qc").as("query_id"),
          col("neighbor_id").as("id"), col("rank"))
      graft.ops.Fusion.rrf(Seq(bm, ann), k = 10)
        .withColumnRenamed("id", "doc_id")
    }),

    // X: PageRank centrality over the exact kNN similarity graph —
    // semantic hubs rank high, outliers low; fixed-iteration power
    // method so the DuckDB oracle reruns the identical recursion
    // (edge CTE copied from q_x_knn_graph, double-precision cosine)
    // (500-id cap: constant-cost exact edge set across scale factors,
    // mirrored in the oracle)
    "q_x_pagerank" -> ((s, dir) => {
      val edges = graft.vec.VectorOps.knnGraph(
          t(s, dir, "embeddings").where(col("vec_id") < 500),
          "vec_id", "embedding", k = 5, nlist = 1, nassign = 1,
          kmeansIters = 0)
        .select(col("src_id").as("src"), col("dst_id").as("dst"))
      graft.ops.Graph.pagerank(edges, iters = 3, damping = 0.85)
    }),

    // X: keep-BEST dedup collapse — near-dup clusters keep their
    // longest member (n_chars as the quality signal) instead of the
    // min id; the oracle recomputes pairs + components + argmax
    "q_x_dedup_keep_best" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = graft.text.TextOps.minhashDedupPairs(
        docs, "doc_id", "text",
        shingleN = 3, numPerm = 64, bands = 16, threshold = 0.5)
      graft.ops.ConnectedComponents.keepBest(pairs, "id_a", "id_b",
          docs.select(col("doc_id"), col("n_chars")), "doc_id", "n_chars")
        .orderBy("id")
    }),

    "q_x_ann_pq_exhaustive" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").where(col("vec_id") < 500)
      val n = emb.count().toInt
      val model = graft.vec.VectorOps.pqTrain(
        emb, "vec_id", "embedding", m = 8, ksub = n, iters = 0)
      graft.vec.VectorOps.pqTopK(
        emb, emb.where(col("vec_id") < 8), "vec_id", "embedding", k = 5, model)
    }),

    // X: PQ + exact re-rank, oracle-gated the inverse way of the
    // exhaustive query: the model is deliberately LOSSY (ksub=16) but the
    // ADC shortlist covers every candidate, so the exact re-rank must
    // reproduce the true L2 top-k bit-for-bit — a wrong metric, dropped
    // candidate, or bad tie-break in the refine stage fails the hash
    "q_x_ann_pq_refined" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").where(col("vec_id") < 500)
      val model = graft.vec.VectorOps.pqTrain(
        emb, "vec_id", "embedding", m = 8, ksub = 16, iters = 0)
      graft.vec.VectorOps.pqTopKRefined(
        emb, emb.where(col("vec_id") < 8), "vec_id", "embedding",
        k = 5, model, refine = 100)
    }),

    // X: gap sessionization, batch path (gaps-and-islands windows; the
    // streaming path keeps flatMapGroupsWithState) — closed sessions only;
    // oracle is the same SQL formulation
    // X: fixed-grid resample with gap buckets + forward fill — the
    // monitoring time series; per-key sequence() grid, one (key, bucket)
    // aggregation, ffill window on the same partitioning
    "q_x_resample" -> ((s, dir) => {
      graft.ops.EventOps.resample(t(s, dir, "events"),
          "event_type", "ts", "value", intervalSec = 3600L)
        .withColumnRenamed("key", "event_type")
    }),

    // X: ordered funnel (signup -> view -> click -> purchase, each step
    // STRICTLY after the previous in event time) — one user shuffle +
    // per-user fold; the oracle runs the naive chained-join form the
    // fold replaces, gating the state machine end to end
    "q_x_funnel" -> ((s, dir) => {
      graft.ops.EventOps.funnel(t(s, dir, "events"),
          "user_id", "ts", "event_type",
          steps = Seq("signup", "view", "click", "purchase"))
        .withColumnRenamed("user", "user_id")
    }),

    // X: rolling z-score anomaly detection — each event scored against
    // the mean/variance of its user's PRIOR 20 values; moment sums over
    // an exact integer (cents) column keep the score bit-identical to
    // the DuckDB oracle despite being floating-point
    "q_x_anomaly" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("event_id"), col("user_id"),
        col("ts"), round(col("value") * 100).cast("long").as("cents"))
      graft.ops.EventOps.rollingZScore(ev, "user_id",
          Seq("ts", "event_id"), "cents", lookback = 20, minPoints = 10)
        .where(abs(col("z")) >= lit(2.0))
        .select(col("event_id"), col("user_id"), col("cents"),
          col("n_prior"), (round(col("z"), 4) + lit(0.0)).as("z"))
    }),

    // X: weekly cohort retention triangle — cohort = ISO week of first
    // event; two user-keyed aggregations
    "q_x_cohort_retention" -> ((s, dir) => {
      graft.ops.EventOps.cohortRetention(t(s, dir, "events"),
        "user_id", "ts")
    }),

    // X: blocked fuzzy record linkage — self-ER over part names: block
    // on (brand, size), levenshtein verify <= 5, best match per part;
    // the blocking equi-join is the only wide op, never a cross join
    "q_x_record_linkage" -> ((s, dir) => {
      val p = t(s, dir, "part")
      graft.ops.Linkage.fuzzyBestMatch(p, p,
        blockCols = Seq("p_brand", "p_size"),
        leftId = "p_partkey", leftText = "p_name",
        rightId = "p_partkey", rightText = "p_name",
        maxDist = 5, k = 1)
    }),

    // X: first-order Markov transitions over event types — one user
    // shuffle, lead() on that partitioning, then a type-domain-sized agg
    "q_x_transitions" -> ((s, dir) => {
      graft.ops.EventOps.transitions(t(s, dir, "events"),
        "user_id", Seq("ts", "event_id"), "event_type")
    }),

    // X: top-10 opening 3-step paths — entry-flow report; (ts, event_id)
    // makes the per-user order total, so path strings are reproducible
    "q_x_top_paths" -> ((s, dir) => {
      graft.ops.EventOps.topPaths(t(s, dir, "events"),
        "user_id", Seq("ts", "event_id"), "event_type", pathLen = 3, k = 10)
    }),

    // X: pairwise Pearson matrix — all 6 corr aggregates in ONE scan
    "q_x_corr_matrix" -> ((s, dir) => {
      graft.functions.Stats.correlationMatrix(t(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    }),

    // X: per-type OLS trend of value over time — x in days since
    // 2026-01-01 via exact micros so both engines divide identical longs
    "q_x_trend" -> ((s, dir) => {
      val ev = t(s, dir, "events").withColumn("x",
        unix_micros(col("ts").cast("timestamp")).cast("double") / lit(8.64e10) - lit(20454.0))
      graft.functions.Stats.groupedTrend(ev, Seq("event_type"), "x", "value")
    }),

    // X: theta-sketch corpus overlap (clickers vs purchasers) — no join,
    // one narrow scan per side; exact below 2^lgK keys, which is what
    // lets the COUNT(DISTINCT) oracle gate it at test scale
    "q_x_corpus_overlap" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.functions.Sketches.thetaOverlap(
        ev.where(col("event_type") === "click"),
        ev.where(col("event_type") === "purchase"), "user_id")
    }),

    "q_x_sessionize" -> ((s, dir) => {
      graft.streaming.StreamOps.sessionizeBatch(
          t(s, dir, "events"), gapMs = 30 * 60 * 1000L)
        .select(col("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"), col("sum_value"))
    }),

    // W5: gap-based sessions via the BUILT-IN session_window — the
    // declarative sibling of the stateful sessionize above. Boundary
    // semantics are IDENTICAL to sessionize: windows merge while
    // next <= prev + gap (MergingSessionsIterator merges on
    // start <= prev_end), i.e. the break needs diff STRICTLY > gap —
    // pinned on a boundary-exact fixture in StreamOpsSpec, since this
    // events data has no exactly-at-gap pair for the oracle to see
    "q_w5_session_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("user_id"),
          date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n_events"), col("sum_value"))
    }),

    // X: Bloom-prefiltered decontamination — identical results to the
    // broadcast fingerprint anti-join, for benchmark sides too large to
    // broadcast; the corpus scan drops cleared rows before any join
    "q_x_decontaminate_bloom" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.text.TextOps.decontaminateBloom(docs,
          docs.where(pmod(col("doc_id"), lit(97)) === 0), "text", "text",
          expectedItems = 2000)
        .select(col("doc_id"), col("source"))
    }),

    // X: point-in-time (as-of) join — each event joined to the latest
    // order of its customer at or before the event time; the leakage-free
    // feature-join primitive
    // X: last-touch attribution — each purchase credited to the same
    // user's LAST click within a 7-day lookback (the as-of join's
    // tolerance form); unattributed purchases keep a null click (the
    // report must show unexplained conversions, not drop them)
    "q_x_attribution" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("p_ts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"))
      graft.ops.AsOf.join(purchases, clicks,
          leftKey = "user_id", rightKey = "c_user",
          leftTime = "p_ts", rightTime = "c_ts",
          leftId = Seq("purchase_id"), rightTiebreak = Seq("click_id"),
          tolerance = Some(expr("interval 7 days")))
        .select(col("purchase_id"), col("user_id"), col("click_id"))
    }),

    "q_x_asof_join" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val o = t(s, dir, "orders")
      graft.ops.AsOf.join(e, o,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          leftId = Seq("event_id"), rightTiebreak = Seq("o_orderkey"))
        .select(col("event_id"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("asof_date"))
    }),

    // X: the as-of join again, through the CUSTOM LogicalPlan + Strategy +
    // sort-merge SparkPlan (O(1) state per partition, for unbounded
    // history) — same oracle as the composed form
    "q_x_asof_custom_plan" -> ((s, dir) => {
      graft.ops.AsOf.joinExact(
          t(s, dir, "events"), t(s, dir, "orders"),
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          rightTiebreak = Some("o_orderkey"))
        .select(col("event_id"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("asof_date"))
    }),

    // X: salted two-phase aggregation — the hot-key mitigation pattern;
    // semantics-preserving, so the oracle is the plain GROUP BY
    "q_x_salted_agg" -> ((s, dir) => {
      graft.ops.Skew.saltedSumCount(
          t(s, dir, "lineitem"), Seq("l_returnflag"),
          "l_quantity", saltFrom = col("l_orderkey"), saltBuckets = 16)
        .select(col("l_returnflag"),
          round(col("sum_l_quantity"), 2).as("sum_qty"), col("n"))
    }),

    // X: salted equi-join (hot-fact-key mitigation) — results must equal
    // the plain join, which is exactly what the oracle checks
    "q_x_salted_join" -> ((s, dir) => {
      val fact = t(s, dir, "lineitem")
        .select(col("l_partkey").as("partkey"), col("l_orderkey"), col("l_quantity"))
      val dim = t(s, dir, "part")
        .select(col("p_partkey").as("partkey"), col("p_brand"))
      graft.ops.Skew.saltedJoin(fact, dim, "partkey",
          saltFrom = col("l_orderkey"), saltBuckets = 8)
        .groupBy(col("p_brand"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n"))
    }),

    // X: random-hyperplane LSH cosine buckets + exact verify — oracle-gated
    // (the deterministic sign pattern is reproduced in SQL)
    "q_x_ann_lsh_pairs" -> ((s, dir) => {
      graft.vec.VectorOps.lshCosinePairs(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        dim = 64, nBits = 8, threshold = 0.25)
    }),

    // X: corpus word frequencies — explode + hash agg + top-k
    "q_x_word_freq" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(graft.text.TextOps.tokens(col("text"))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word")).limit(20)
    }),

    // X: top-3 TF-IDF terms per document — postings agg + vocab-sized
    // df join + per-doc window; scores rounded before ranking so the
    // selected term set is engine-reproducible
    "q_x_tfidf_top" -> ((s, dir) => {
      graft.text.TextOps.tfidfTopTerms(
          t(s, dir, "documents"), "doc_id", "text", k = 3)
        .withColumnRenamed("id", "doc_id")
    }),

    // X: per-node triangle counts over the embedding similarity graph —
    // degree-ordered wedge join (out-degree bounded O(sqrt m)), every
    // triangle found once; the local-clustering curation signal
    "q_x_triangles" -> ((s, dir) => {
      import graft.vec.VectorOps
      val sub = t(s, dir, "embeddings")
        .where(pmod(col("vec_id"), lit(3)) === 0)
        .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
        .repartition(col("vec_id"))
      val a = sub.select(col("vec_id").as("src"), col("v").as("va"))
      val b = sub.select(col("vec_id").as("dst"), col("v").as("vb"))
      val edges = a.join(broadcast(b), col("src") < col("dst"))
        .withColumn("cos", VectorOps.cosine(col("va"), col("vb")))
        .where(col("cos") >= 0.2)
        .select(col("src"), col("dst"))
      graft.ops.Graph.triangles(edges)
    }),

    // X: embedding-cosine near-duplicate pairs over a probe subset
    "q_x_embed_dup" -> ((s, dir) => {
      import graft.vec.VectorOps
      val sub = t(s, dir, "embeddings")
        .where(pmod(col("vec_id"), lit(5)) === 0)
        .select(col("vec_id"), VectorOps.asDouble(col("embedding")).as("v"))
        .repartition(col("vec_id"))
      val a = sub.select(col("vec_id").as("id_a"), col("v").as("va"))
      val b = sub.select(col("vec_id").as("id_b"), col("v").as("vb"))
      a.join(broadcast(b), col("id_a") < col("id_b"))
        .withColumn("cos", VectorOps.cosine(col("va"), col("vb")))
        .where(col("cos") >= 0.3)
        .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
    }),

    // X: semantic (embedding-space) decontamination — the paraphrase
    // catcher; benchmark = every 97th vector, broadcast with norms
    "q_x_semantic_decontaminate" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.vec.VectorOps.semanticContaminatedIds(
        emb, emb.where(pmod(col("vec_id"), lit(97)) === 0),
        "vec_id", "embedding", threshold = 0.3)
    }),

    // X: SemDeDup — k-means-clustered semantic dedup, oracle-gated at
    // kmeansIters=0 where the rank-seeded assignment is SQL-expressible
    // (argmax cosine over the nlist smallest-id vectors, tie -> smaller
    // centroid id; within-cluster pairs only)
    "q_x_semdedup" -> ((s, dir) => {
      graft.vec.VectorOps.semDedup(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        nlist = 8, threshold = 0.3, kmeansIters = 0)
        .select(col("id"), col("cluster"), col("keep"))
    }),

    // X: SemDeDup with k-means refinement — the realistic configuration
    // (refined centroids are not SQL-expressible -> rows-only; the
    // machinery is oracle-gated by q_x_semdedup above)
    "q_x_semdedup_refined" -> ((s, dir) => {
      graft.vec.VectorOps.semDedup(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        nlist = 16, threshold = 0.3, kmeansIters = 2)
        .select(col("id"), col("cluster"), col("keep"))
    }),

    // X: Structured Streaming executed for real — file stream -> watermark
    // -> tumbling window agg -> memory sink; same oracle as the batch form
    "q_x_stream_window" -> ((s, dir) => {
      import graft.streaming.StreamOps
      val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_q_")
      copyParquetInput(s"$dir/events.parquet", streamDir)
      val agg = StreamOps.windowedCounts(
        StreamOps.readEventsStream(s, streamDir.toString))
      // stateful: state-store partitions sized by the scale-adaptive
      // knob (conf-overridable), not the batch shuffle default — see
      // StreamOps.statePartitions
      val q = StreamOps.withStatePartitions(s) {
        agg.writeStream.outputMode("complete")
          .format("memory").queryName("graft_stream_win").start()
      }
      try q.processAllAvailable() finally q.stop()
      s.table("graft_stream_win")
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("event_type"), col("n"), col("sum_value"))
    }),

    // X: streaming funnel with drop-off, executed for REAL (file stream
    // -> flatMapGroupsWithState + EventTimeTimeout -> memory sink):
    // completions emit in-batch; stalled funnels whose 30-min deadline
    // sits below the final watermark (max ts - 10 min) emit as drop-off
    // rows in the no-data batch — all deterministic in event time, so
    // the whole outcome table is oracle-checkable
    "q_x_stream_funnel" -> ((s, dir) => {
      import graft.streaming.StreamOps
      val streamDir = java.nio.file.Files.createTempDirectory("graft_funnel_q_")
      copyParquetInput(s"$dir/events.parquet", streamDir)
      // stateful (flatMapGroupsWithState): scale-adaptive state-store
      // partition count, see StreamOps.statePartitions
      val q = StreamOps.withStatePartitions(s) {
        StreamOps.funnelStream(
            StreamOps.readEventsStream(s, streamDir.toString),
            Seq("signup", "view", "click"),
            maxSpanMs = 30 * 60 * 1000L, watermark = "10 minutes")
          .writeStream.outputMode("append")
          .format("memory").queryName("graft_stream_funnel").start()
      }
      try { q.processAllAvailable(); q.processAllAvailable() } finally q.stop()
      s.table("graft_stream_funnel")
    }),

    // X: streaming corpus health monitor executed for REAL (file stream
    // of documents with synthetic event time -> windowed audit rows ->
    // memory sink); the exact columns are oracle-gated, the HLL
    // approx_dup_mass column is spec-gated (a sketch by design — a
    // stream gets one stateful pass)
    // X: LIVE uniform corpus sample executed for REAL (file stream ->
    // per-batch bottom-k md5-priority partials -> exact-k render) —
    // the deterministic streaming reservoir equivalent; the oracle is
    // the same bottom-k over the full table in SQL
    "q_x_stream_sample" -> ((s, dir) => {
      import graft.streaming.StreamOps
      val streamDir = java.nio.file.Files.createTempDirectory("graft_samp_q_")
      // source in a SUBDIR, checkpoint beside it: whether the file
      // stream's listing descends into subdirectories is
      // version-dependent, so a ck/ inside the watched dir risks
      // checkpoint metadata being read as data after a Spark upgrade
      val srcDir = java.nio.file.Files.createDirectories(streamDir.resolve("src"))
      copyParquetInput(s"$dir/documents.parquet", srcDir)
      val sampleDir = java.nio.file.Files
        .createTempDirectory("graft_samp_out_").toString
      val schema = docsStreamSchema
      val docs = s.readStream.schema(schema).parquet(srcDir.toString)
      val q = StreamOps.sampleStream(docs, sampleDir, "doc_id", k = 100)
        .option("checkpointLocation", streamDir.resolve("ck").toString)
        .start()
      try q.processAllAvailable() finally q.stop()
      StreamOps.sampleRender(s, sampleDir, k = 100)
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    // X: LIVE per-source cap / stratified sample (grouped bottom-k by
    // md5 priority — deterministic keep rule, mergeable partials); the
    // oracle is the same per-source window rank in SQL
    "q_x_stream_source_cap" -> ((s, dir) => {
      import graft.streaming.StreamOps
      val streamDir = java.nio.file.Files.createTempDirectory("graft_scap_q_")
      // source in a subdir, ck beside it (see q_x_stream_sample)
      val srcDir = java.nio.file.Files.createDirectories(streamDir.resolve("src"))
      copyParquetInput(s"$dir/documents.parquet", srcDir)
      val sampleDir = java.nio.file.Files
        .createTempDirectory("graft_scap_out_").toString
      val schema = docsStreamSchema
      val docs = s.readStream.schema(schema).parquet(srcDir.toString)
      val q = StreamOps.sampleByStream(docs, sampleDir, "source",
          "doc_id", k = 20)
        .option("checkpointLocation", streamDir.resolve("ck").toString)
        .start()
      try q.processAllAvailable() finally q.stop()
      StreamOps.sampleByRender(s, sampleDir, "source", k = 20)
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    // X: the LIVE decontamination gate executed for REAL (file stream
    // -> the stateless row-local arrays_overlap form of
    // StreamOps.decontaminateStream -> memory sink); the oracle is the
    // batch NOT-IN form of the same 5-gram overlap
    "q_x_stream_decontaminate" -> ((s, dir) => {
      import graft.streaming.StreamOps
      val streamDir = java.nio.file.Files.createTempDirectory("graft_sdec_q_")
      copyParquetInput(s"$dir/documents.parquet", streamDir)
      val bench = t(s, dir, "documents")
        .where(pmod(col("doc_id"), lit(37)) === 0).transform(graft.ops.Pins.pin)
      val schema = docsStreamSchema
      val docs = s.readStream.schema(schema).parquet(streamDir.toString)
      val q = StreamOps.decontaminateStream(docs, bench, "text", "text",
          n = 5)
        .select(col("doc_id"), col("lang"), col("source"))
        .writeStream.outputMode("append")
        .format("memory").queryName("graft_stream_decontaminate").start()
      try q.processAllAvailable() finally q.stop()
      s.table("graft_stream_decontaminate")
    }),

    // X: the LIVE data card executed for REAL (file stream ->
    // replay-proof batch_id partials -> render); the oracle is the
    // SAME SQL as the batch card — the partials must reduce to it
    "q_x_stream_data_card" -> ((s, dir) => {
      import graft.streaming.StreamOps
      val streamDir = java.nio.file.Files.createTempDirectory("graft_sdc_q_")
      // source in a subdir, ck beside it (see q_x_stream_sample)
      val srcDir = java.nio.file.Files.createDirectories(streamDir.resolve("src"))
      copyParquetInput(s"$dir/documents.parquet", srcDir)
      val cardDir = java.nio.file.Files
        .createTempDirectory("graft_sdc_card_").toString
      val schema = docsStreamSchema
      val docs = s.readStream.schema(schema).parquet(srcDir.toString)
      val q = StreamOps.dataCardStream(docs, cardDir)
        .option("checkpointLocation", streamDir.resolve("ck").toString)
        .start()
      try q.processAllAvailable() finally q.stop()
      StreamOps.dataCardRender(s, cardDir)
    }),

    // X: the END-TO-END live curation pipeline executed for REAL — one
    // file stream through gated decontamination, then per micro-batch
    // of survivors: live data-card partials + per-source cap partials +
    // exact-dedup corpus ingest; ONE render row per source audits all
    // four stages. The oracle is the identical composition in batch SQL
    // (decontaminated set -> card aggregates, window-rank cap, distinct
    // fingerprints) — every stage is order-independent at render time,
    // so the stream must hash-match it
    "q_x_stream_pipeline" -> ((s, dir) => {
      import graft.streaming.StreamOps
      val streamDir = java.nio.file.Files.createTempDirectory("graft_spipe_q_")
      val srcDir = streamDir.resolve("src")
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
        .repartition(4).write.parquet(srcDir.toString)
      val pipeDir = streamDir.resolve("pipe").toString
      val bench = t(s, dir, "documents")
        .where(pmod(col("doc_id"), lit(37)) === 0).transform(graft.ops.Pins.pin)
      val docs = s.readStream.schema(docsStreamSchema)
        .option("maxFilesPerTrigger", "2").parquet(srcDir.toString)
      val q = StreamOps.curationPipelineStream(docs, pipeDir, bench,
          "text", n = 5, capK = 20)
        .option("checkpointLocation", streamDir.resolve("ck").toString)
        .start()
      try q.processAllAvailable() finally q.stop()
      StreamOps.curationRender(s, pipeDir, capK = 20)
    }),

    // X: the SAME live pipeline with MAINTENANCE run mid-stream — the
    // first half of the corpus streams in, the query stops, every
    // partials family compacts (compactPartials) and the dedup corpus
    // folds (compactCorpus), then the stream RESTARTS from its
    // checkpoint and consumes the second half. Same oracle SQL as
    // q_x_stream_pipeline: compaction + restart must be invisible to
    // the rendered audit, proven end to end by the hash match
    "q_x_stream_pipeline_compacted" -> ((s, dir) => {
      import graft.streaming.StreamOps
      val streamDir = java.nio.file.Files.createTempDirectory("graft_spipec_q_")
      val srcDir = java.nio.file.Files.createDirectories(streamDir.resolve("src"))
      val pipeDir = streamDir.resolve("pipe").toString
      // 1/3 subset (matches the oracle's injected source): this twin
      // proves maintenance invisibility, not full-corpus throughput
      val subset = t(s, dir, "documents")
        .where(pmod(col("doc_id"), lit(3)) === 0)
      val bench = subset
        .where(pmod(col("doc_id"), lit(37)) === 0).transform(graft.ops.Pins.pin)
      val base = subset
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
      def land(half: DataFrame, tag: String, files: Int): Unit = {
        val staging = streamDir.resolve(s"stage_$tag")
        half.repartition(files).write.parquet(staging.toString)
        val listing = java.nio.file.Files.list(staging)
        try {
          val it = listing.iterator(); var i = 0
          while (it.hasNext) {
            val f = it.next()
            if (f.getFileName.toString.endsWith(".parquet")) {
              java.nio.file.Files.copy(f,
                srcDir.resolve(f"${tag}_$i%05d.parquet"))
              i += 1
            }
          }
        } finally listing.close()
      }
      def run(filesPerTrigger: Int): Unit = {
        val docs = s.readStream.schema(docsStreamSchema)
          .option("maxFilesPerTrigger", filesPerTrigger.toString)
          .parquet(srcDir.toString)
        val q = StreamOps.curationPipelineStream(docs, pipeDir, bench,
            "text", n = 5, capK = 20)
          .option("checkpointLocation", streamDir.resolve("ck").toString)
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      // half A in THREE micro-batches so the partials have >= 2 foldable
      // batch_id subdirs below the max — compactPartials must actually
      // act for this twin to prove anything, so its effect is asserted
      land(base.where(pmod(col("doc_id"), lit(2)) === 0), "a", files = 3)
      run(filesPerTrigger = 1)
      Seq("card/stats", "card/langs", "card/fps", "cap/bkg").foreach { d =>
        require(StreamOps.compactPartials(s, s"$pipeDir/$d") > 0,
          s"compacted-twin degenerated: nothing folded under $d")
      }
      require(StreamOps.compactCorpus(s, s"$pipeDir/corpus",
          targetFiles = 2, sortCol = Some("__fp")) > 0,
        "compacted-twin degenerated: corpus had nothing to fold")
      // half B lands in one batch after a checkpoint RESTART over the
      // compacted state
      land(base.where(pmod(col("doc_id"), lit(2)) === 1), "b", files = 2)
      run(filesPerTrigger = 2)
      StreamOps.curationRender(s, pipeDir, capK = 20)
    }),

    // X: the live pipeline through the MANAGED lifecycle
    // (curationPipelineStart): the writer lease is taken before start
    // (the cross-process single-writer + quiesced-maintenance
    // enforcement), heartbeated through the run, and the due
    // maintenance auto-runs exactly once AFTER termination under the
    // still-held lease — lease removal is the all-clear the render
    // waits on. Same oracle SQL shape as the plain pipeline (1/5
    // subset): the whole managed lifecycle — lease, listener,
    // auto-compaction — must be invisible to the rendered audit,
    // proven end to end by the hash match.
    "q_x_stream_pipeline_managed" -> ((s, dir) => {
      import graft.streaming.StreamOps
      val streamDir = java.nio.file.Files.createTempDirectory("graft_spipem_q_")
      val srcDir = streamDir.resolve("src")
      val subset = t(s, dir, "documents")
        .where(pmod(col("doc_id"), lit(5)) === 0)
      // three files + one-file triggers -> three micro-batches -> three
      // batch_id subdirs per family: maxSubdirs = 3 makes the policy
      // DUE at stop, so the auto-compaction must actually act (and
      // re-arm: post-fold 2 subdirs < 3)
      subset.select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
        .repartition(3).write.parquet(srcDir.toString)
      val pipeDir = streamDir.resolve("pipe").toString
      val bench = subset
        .where(pmod(col("doc_id"), lit(37)) === 0).transform(graft.ops.Pins.pin)
      val docs = s.readStream.schema(docsStreamSchema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
      val q = StreamOps.curationPipelineStart(docs, pipeDir, bench,
        streamDir.resolve("ck").toString, "text", n = 5, capK = 20,
        maxSubdirs = 3)
      try q.processAllAvailable() finally q.stop()
      // the release happens AFTER the auto-compact (the lease keeps
      // excluding every other process through the fold): its removal
      // is the deterministic all-clear
      val lease = java.nio.file.Paths.get(pipeDir, "_lease")
      val deadline = System.currentTimeMillis() + 120000L
      while (java.nio.file.Files.exists(lease) &&
          System.currentTimeMillis() < deadline) Thread.sleep(100L)
      require(!java.nio.file.Files.exists(lease),
        "managed stop did not release the writer lease")
      require(StreamOps.maintenanceDue(s, pipeDir, maxSubdirs = 3)
          .where(col("due")).count() == 0L,
        "managed stop did not run the due auto-compaction")
      StreamOps.curationRender(s, pipeDir, capK = 20)
    }),

    // X: the live curation pipeline with the NEAR-dup corpus stage —
    // per micro-batch the persisted DedupIndex drops exact (fp probe)
    // and near (banded LSH -> signature estimate -> exact-Jaccard
    // verify) duplicates of everything already admitted; survivors
    // append to corpus + index and the per-batch cost never re-signs
    // the corpus. Two controlled batches (the even half seeds the
    // index, the odd half probes it) make the greedy cross-batch
    // semantics deterministic, so the admitted ID set hash-matches a
    // brute-force exact-Jaccard SQL twin (banding recall is total on
    // this data at threshold 0.5 — the q_x_dedup_minhash precedent,
    // hash-matched at both sf gates)
    "q_x_stream_pipeline_neardup" -> ((s, dir) => {
      import graft.streaming.StreamOps
      val streamDir = java.nio.file.Files.createTempDirectory("graft_spipen_q_")
      val srcDir = java.nio.file.Files.createDirectories(streamDir.resolve("src"))
      val pipeDir = streamDir.resolve("pipe").toString
      val base = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
      val bench = t(s, dir, "documents")
        .where(pmod(col("doc_id"), lit(37)) === 0).transform(graft.ops.Pins.pin)
      def land(half: DataFrame, tag: String, files: Int): Unit = {
        val staging = streamDir.resolve(s"stage_$tag")
        half.repartition(files).write.parquet(staging.toString)
        val listing = java.nio.file.Files.list(staging)
        try {
          val it = listing.iterator(); var i = 0
          while (it.hasNext) {
            val f = it.next()
            if (f.getFileName.toString.endsWith(".parquet")) {
              java.nio.file.Files.copy(f,
                srcDir.resolve(f"${tag}_$i%05d.parquet"))
              i += 1
            }
          }
        } finally listing.close()
      }
      def run(): Unit = {
        val docs = s.readStream.schema(docsStreamSchema)
          .option("maxFilesPerTrigger", "4").parquet(srcDir.toString)
        val q = StreamOps.curationPipelineStream(docs, pipeDir, bench,
            "text", n = 5, capK = 20,
            nearDedup = Some(graft.text.DedupIndex.Params()))
          .option("checkpointLocation", streamDir.resolve("ck").toString)
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      // batch 1: even half (seeds corpus + index); batch 2 (after a
      // checkpoint restart): odd half, probed against the seeded index
      land(base.where(pmod(col("doc_id"), lit(2)) === 0), "a", files = 2)
      run()
      land(base.where(pmod(col("doc_id"), lit(2)) === 1), "b", files = 2)
      run()
      s.read.parquet(s"$pipeDir/corpus").select(col("doc_id"), col("source"))
    }),

    // X: the SAME near-dup pipeline with MAINTENANCE between its two
    // batches — after the even half seeds corpus + index, the stream
    // stops, the corpus folds (compactCorpus, id-sorted layout kept)
    // and the DedupIndex compacts (distinct rewrite, probe-key sorts
    // kept), then the stream restarts from its checkpoint and the odd
    // half probes the COMPACTED state. Same oracle SQL as
    // q_x_stream_pipeline_neardup: maintenance must be invisible to
    // the admitted set, proven end to end by the hash match.
    // Deliberately redundant with that query's throughput — declared
    // verify-only (benchVerifyOnly), never silently skipped
    "q_x_stream_pipeline_neardup_compacted" -> ((s, dir) => {
      import graft.streaming.StreamOps
      val streamDir = java.nio.file.Files.createTempDirectory("graft_spipenc_q_")
      val srcDir = java.nio.file.Files.createDirectories(streamDir.resolve("src"))
      val pipeDir = streamDir.resolve("pipe").toString
      val base = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
      val bench = t(s, dir, "documents")
        .where(pmod(col("doc_id"), lit(37)) === 0).transform(graft.ops.Pins.pin)
      def land(half: DataFrame, tag: String, files: Int): Unit = {
        val staging = streamDir.resolve(s"stage_$tag")
        half.repartition(files).write.parquet(staging.toString)
        val listing = java.nio.file.Files.list(staging)
        try {
          val it = listing.iterator(); var i = 0
          while (it.hasNext) {
            val f = it.next()
            if (f.getFileName.toString.endsWith(".parquet")) {
              java.nio.file.Files.copy(f,
                srcDir.resolve(f"${tag}_$i%05d.parquet"))
              i += 1
            }
          }
        } finally listing.close()
      }
      def run(): Unit = {
        val docs = s.readStream.schema(docsStreamSchema)
          .option("maxFilesPerTrigger", "4").parquet(srcDir.toString)
        val q = StreamOps.curationPipelineStream(docs, pipeDir, bench,
            "text", n = 5, capK = 20,
            nearDedup = Some(graft.text.DedupIndex.Params()))
          .option("checkpointLocation", streamDir.resolve("ck").toString)
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      land(base.where(pmod(col("doc_id"), lit(2)) === 0), "a", files = 2)
      run()
      // quiesced maintenance on the seeded state. The INDEX compaction
      // must ACT (distinct + probe-key-sorted rewrite of fp/sig/bands —
      // the state the odd half's probes depend on); the corpus fold is
      // attempted too but a one-batch seed writes a single file, so it
      // is legitimately a no-op here — corpus-fold invisibility is the
      // exact twin's proof (q_x_stream_pipeline_compacted, whose
      // 3-batch structure gives it something to fold)
      val idxStats = graft.text.DedupIndex.compact(s, s"$pipeDir/dedup_idx")
      require(idxStats.keySet == Set("fp", "sig", "bands"),
        s"neardup-compacted twin degenerated: index compacted $idxStats")
      StreamOps.compactCorpus(s, s"$pipeDir/corpus",
        sortCol = Some("doc_id")): Unit
      land(base.where(pmod(col("doc_id"), lit(2)) === 1), "b", files = 2)
      run() // checkpoint restart over the compacted state
      s.read.parquet(s"$pipeDir/corpus").select(col("doc_id"), col("source"))
    }),

    // X: LIVE Bradley-Terry ratings executed for REAL (the synthetic
    // game log streamed in multiple micro-batches -> per-batch win
    // partials -> render solve); same oracle as the batch solve — the
    // win matrix reduced from partials must be identical
    "q_x_stream_bradley_terry" -> ((s, dir) => {
      import graft.streaming.StreamOps
      val streamDir = java.nio.file.Files.createTempDirectory("graft_sbt_q_")
      val gamesDir = streamDir.resolve("games")
      synthPrefGames(s, dir).repartition(4).write.parquet(gamesDir.toString)
      val ratingsDir = java.nio.file.Files
        .createTempDirectory("graft_sbt_r_").toString
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "winner STRING, loser STRING")
      val games = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "2").parquet(gamesDir.toString)
      val q = StreamOps.bradleyTerryStream(games, ratingsDir)
        .option("checkpointLocation", streamDir.resolve("ck").toString)
        .start()
      try q.processAllAvailable() finally q.stop()
      StreamOps.bradleyTerryRender(s, ratingsDir, iters = 8)
    }),

    // X: stream-built winnow index probed for REAL — the corpus slice
    // (ids >= 50) arrives through winnowIndexIngestStream in multiple
    // micro-batches, then the batch probe (ids < 50) runs against the
    // LIVE index; same oracle as the batch-built q_x_winnow_probe_idx,
    // so the stream-built index is hash-proven indistinguishable
    "q_x_stream_winnow_probe" -> ((s, dir) => {
      import graft.streaming.StreamOps
      val idxDir = streamWinnowIdxCache.computeIfAbsent(dir, _ => {
        val streamDir = java.nio.file.Files.createTempDirectory("graft_swp_q_")
        val corpusDir = streamDir.resolve("corpus")
        t(s, dir, "documents").where(col("doc_id") >= 50)
          .repartition(4).write.parquet(corpusDir.toString)
        val d = java.nio.file.Files
          .createTempDirectory("graft_swp_idx_").toString
        val docs = s.readStream.schema(docsStreamSchema)
          .option("maxFilesPerTrigger", "2").parquet(corpusDir.toString)
        val q = StreamOps.winnowIndexIngestStream(docs, d)
          .option("checkpointLocation", streamDir.resolve("ck").toString)
          .start()
        try q.processAllAvailable() finally q.stop()
        d
      })
      graft.text.WinnowIndex.probeBatch(s, idxDir,
        t(s, dir, "documents").where(col("doc_id") < 50), "doc_id", "text",
        minShared = 2, maxDocsPerHash = 50)
    }),

    // X: stream-grown ANN index probed for REAL — seed the VecIndex
    // from vec_id < 100, stream the rest through vecIndexIngestStream
    // in micro-batches, then probe EXHAUSTIVELY (nprobe = nlist): the
    // result must equal the exact top-k, same oracle as the
    // batch-built q_x_ann_vecidx_exhaustive
    "q_x_stream_ann_probe" -> ((s, dir) => {
      import graft.streaming.StreamOps
      val emb = t(s, dir, "embeddings")
      val idx = streamAnnIdxCache.computeIfAbsent(dir, _ => {
        val streamDir = java.nio.file.Files.createTempDirectory("graft_sann_q_")
        val restDir = streamDir.resolve("rest")
        emb.where(col("vec_id") >= 100)
          .repartition(4).write.parquet(restDir.toString)
        val d = java.nio.file.Files
          .createTempDirectory("graft_sann_idx_").toString
        graft.vec.VecIndex.build(emb.where(col("vec_id") < 100), d,
          nlist = 16, kmeansIters = 2)
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "vec_id LONG, embedding ARRAY<FLOAT>, label INT")
        val rest = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "2").parquet(restDir.toString)
        val q = StreamOps.vecIndexIngestStream(rest, d)
          .option("checkpointLocation", streamDir.resolve("ck").toString)
          .start()
        try q.processAllAvailable() finally q.stop()
        d
      })
      graft.vec.VecIndex.topK(emb.where(col("vec_id") < 8), idx,
        k = 5, nprobe = 16)
    }),

    "q_x_stream_health" -> ((s, dir) => {
      import graft.streaming.StreamOps
      val streamDir = java.nio.file.Files.createTempDirectory("graft_health_q_")
      copyParquetInput(s"$dir/documents.parquet", streamDir)
      val schema = docsStreamSchema
      val docs = s.readStream.schema(schema).parquet(streamDir.toString)
        .withColumn("ts", expr(
          "timestampadd(MINUTE, doc_id, TIMESTAMP'2026-01-01 00:00:00')"))
      // stateful (windowed agg): scale-adaptive state-store partition
      // count, see StreamOps.statePartitions
      val q = StreamOps.withStatePartitions(s) {
        StreamOps.healthStream(docs)
          .writeStream.outputMode("complete")
          .format("memory").queryName("graft_stream_health").start()
      }
      try q.processAllAvailable() finally q.stop()
      s.table("graft_stream_health")
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss")
            .as("hour_start"),
          col("n_docs"), col("n_tokens"), col("mean_doc_tokens"),
          col("pct_short"))
    }),

    // X: watermarked interval stream-stream join executed for REAL (two
    // file streams -> inner join bounded both ways in event time ->
    // memory sink); the oracle is the same interval join in SQL
    "q_x_stream_interval_join" -> ((s, dir) => {
      import graft.streaming.StreamOps
      val streamDir = java.nio.file.Files.createTempDirectory("graft_stream_ij_")
      copyParquetInput(s"$dir/events.parquet", streamDir)
      val s1 = StreamOps.readEventsStream(s, streamDir.toString)
      val s2 = StreamOps.readEventsStream(s, streamDir.toString)
      val joined = StreamOps.intervalJoinStream(
        s1.where(col("event_type") === "click"),
        s2.where(col("event_type") === "purchase"),
        maxDelayMs = 30 * 60 * 1000L)
      // a streaming job sizes its state-store partition count to the
      // stream rate, not the batch default: 32 HDFS-backed stores per
      // side doubled the wall time of this join (measured 10.8 -> 5.9 s
      // at 8). The r15 hard-coded "8" is now the scale-adaptive knob
      // (same value at local[32], conf-overridable, grows with the
      // cluster) — see StreamOps.statePartitions.
      val q = StreamOps.withStatePartitions(s) {
        joined.writeStream.outputMode("append")
          .format("memory").queryName("graft_stream_ij").start()
      }
      try q.processAllAvailable() finally q.stop()
      s.table("graft_stream_ij").select(col("l_event_id"), col("r_event_id"))
    }),

    // X: multimodal column plumbing — binary payload + typed metadata,
    // batched per-partition feature extraction (decode stubbed)
    "q_x_multimodal" -> ((s, dir) => {
      import graft.multimodal.Multimodal
      Multimodal.extractFeatures(
        Multimodal.documentsAsMedia(s,
          t(s, dir, "documents").repartition(col("doc_id")))).toDF()
    }),

    // X: REAL image-header metadata decode — documents wrapped in actual
    // PNG containers whose dimensions derive from row fields; the parser
    // must read back exactly what the header encodes (no pixel decode)
    // X: REAL WAV/RIFF header parse — audio analog of q_x_image_meta;
    // every field (codec, channels, rate, duration) is header math the
    // oracle reproduces from the same row fields
    "q_x_audio_meta" -> ((s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      val media = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
        .map { case (id, nChars) =>
          Multimodal.MediaRow(id,
            Multimodal.fakeWav((1 + id % 2).toInt, (8000 * (1 + id % 3)).toInt,
              16, (nChars % 4096).toInt),
            "audio/wav", "synth")
        }
      Multimodal.extractAudioMeta(media).toDF()
        .select(col("media_id"), col("codec"),
          col("channels").cast("long").as("channels"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("duration_ms"))
    }),

    // X: MP4/ISO-BMFF header metadata — the video member of the media
    // family (image PNG/JPEG/GIF, audio WAV, video MP4): REAL container
    // bytes synthesized from row fields, parsed back by box walk
    "q_x_video_meta" -> ((s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      val media = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
        .map { case (id, nChars) =>
          Multimodal.MediaRow(id,
            Multimodal.fakeMp4((600 * (1 + id % 5)).toInt, nChars * 37),
            "video/mp4", "synth")
        }
      Multimodal.extractVideoMeta(media).toDF()
        .select(col("media_id"), col("brand"),
          col("timescale").cast("long").as("timescale"),
          col("duration_ms"))
    }),

    "q_x_image_meta" -> ((s, dir) => {
      import s.implicits._
      import graft.multimodal.Multimodal
      val media = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("n_chars")).as[(Long, String, Long)]
        .map { case (id, text, nChars) =>
          Multimodal.MediaRow(id,
            Multimodal.fakePng((1 + nChars % 512).toInt, (1 + id % 512).toInt,
              text.getBytes("UTF-8")),
            "image/png", "synth")
        }
      Multimodal.extractImageMeta(media).toDF()
        .select(col("media_id"), col("format"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"))
    }),

    // X: label-QA — per-item majority-vote consensus with agreement
    "q_x_label_consensus" -> ((s, dir) => {
      graft.text.Labels.majorityVote(synthAnnots(s, dir),
        "doc_id", "annotator", "label")
    }),

    // X: label-QA — per-annotator reliability vs the consensus
    "q_x_annotator_accuracy" -> ((s, dir) => {
      graft.text.Labels.annotatorAccuracy(synthAnnots(s, dir),
        "doc_id", "annotator", "label")
    }),

    // X: label-QA — Cohen's kappa for every annotator pair
    "q_x_cohen_kappa" -> ((s, dir) => {
      graft.text.Labels.cohenKappa(synthAnnots(s, dir),
        "doc_id", "annotator", "label")
    }),

    // X: label-QA — Fleiss' kappa over the full annotator pool
    "q_x_fleiss_kappa" -> ((s, dir) => {
      graft.text.Labels.fleissKappa(synthAnnots(s, dir),
        "doc_id", "annotator", "label")
    }),

    // X: Krippendorff's alpha — agreement under VARYING annotations
    // per item (annotator 5 skips every 4th doc)
    "q_x_kripp_alpha" -> ((s, dir) => {
      graft.text.Labels.krippendorffAlpha(
        synthAnnots(s, dir).where(!(col("annotator") === 5 &&
          pmod(col("doc_id"), lit(4L)) === 0)),
        "doc_id", "annotator", "label")
    }),

    // X: Bradley-Terry skill ratings from pairwise preference games
    // (8 fixed MM iterations; matrix is |sources|^2, solved on driver)
    "q_x_bradley_terry" -> ((s, dir) => {
      graft.text.Labels.bradleyTerry(synthPrefGames(s, dir),
        "winner", "loser", iters = 8)
    }),

    // X: k-anonymity audit — per equivalence class over
    // (mktsegment, 1000-wide acctbal bucket), k = 10
    "q_x_k_anonymity" -> ((s, dir) => {
      graft.ops.Privacy.kAnonymity(t(s, dir, "customer"),
        privacyQuasi(1000.0), k = 10)
    }),

    // X: l-diversity audit — same classes, sensitive = c_nationkey,
    // l = 5 distinct values required per class
    "q_x_l_diversity" -> ((s, dir) => {
      graft.ops.Privacy.lDiversity(t(s, dir, "customer"),
        privacyQuasi(1000.0), "c_nationkey", l = 5)
    }),

    // X: the anonymity ladder — k-anonymity reports at three
    // generalization levels; the release gate reads where risk_ratio
    // first clears the bar
    "q_x_k_anon_ladder" -> ((s, dir) => {
      graft.ops.Privacy.anonymityLadder(t(s, dir, "customer"), Seq(
        "l0_nation_acct100" ->
          (privacyQuasi(100.0) :+ ("c_nationkey" -> col("c_nationkey"))),
        "l1_nation_acct1k" ->
          (privacyQuasi(1000.0) :+ ("c_nationkey" -> col("c_nationkey"))),
        "l2_acct5k" -> privacyQuasi(5000.0)), k = 10)
    }),

    // X: URL canonicalization — the crawl-dedup key, row-local
    "q_x_url_canonical" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        synthUrl.as("url"),
        graft.text.UrlOps.canonicalizeUrl(synthUrl).as("canonical"))
    }),

    // X: registrable-domain (eTLD+1) extraction + per-domain counts
    "q_x_url_domain" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(graft.text.UrlOps.registrableDomain(
          graft.text.UrlOps.hostOf(synthUrl)).as("domain"))
        .groupBy(col("domain"))
        .agg(count(lit(1)).cast("long").as("n_urls"))
    }),

    // X: per-domain URL dedup stats — canonical-key collapse rates
    "q_x_url_dedup" -> ((s, dir) => {
      graft.text.UrlOps.urlDedupStats(
        t(s, dir, "documents").select(col("doc_id"),
          synthUrl.as("url")), "url")
    }),

    // X: Flesch readability — row-local register/complexity signal
    "q_x_readability" -> ((s, dir) => {
      graft.text.Readability.flesch(t(s, dir, "documents"),
        "doc_id", "text")
    }),

    // X: key-skew diagnostic — profile a prospective shuffle key
    // (events.user_id) before committing the 100 TB shuffle
    "q_x_skew_report" -> ((s, dir) => {
      graft.ops.Skew.skewReport(t(s, dir, "events"),
        Seq("user_id"), targetRowsPerTask = 1000L)
    }),

    // X: centroid silhouette — are the label clusters real in
    // embedding space (gates cluster-keyed curation)
    "q_x_silhouette" -> ((s, dir) => {
      graft.vec.ClusterEval.silhouette(t(s, dir, "embeddings"),
        "vec_id", "embedding", "label", dims = 64)
    }),

    // X: the corpus data card — per-source datasheet (volume, dup
    // ratio, PII density, readability, language mode) in ONE pass
    "q_x_data_card" -> ((s, dir) => {
      graft.text.DataCard.perSource(t(s, dir, "documents"),
        "doc_id", "text", "lang", "source")
    }),

    // X: t-closeness — per-class sensitive-distribution drift from
    // the global one (the leak l-diversity misses); nation bucket as
    // the sensitive attribute
    "q_x_t_closeness" -> ((s, dir) => {
      graft.ops.Privacy.tCloseness(
        t(s, dir, "customer").withColumn("__nat3",
          pmod(col("c_nationkey"), lit(3))),
        Seq("c_mktsegment" -> col("c_mktsegment")), "__nat3", t = 0.1)
    }),

    // X: per-annotator confusion matrix vs the consensus — where the
    // errors go, not just how many
    "q_x_confusion_matrix" -> ((s, dir) => {
      graft.text.Labels.confusionMatrix(synthAnnots(s, dir),
        "doc_id", "annotator", "label")
    }),

    // X: Zipf rank-frequency fit — the corpus naturalness audit
    "q_x_zipf" -> ((s, dir) => {
      graft.text.CorpusStats.zipfFit(t(s, dir, "documents"),
        "text", topK = 100)
    }),

    // X: per-doc trigram novelty — the gram-level memorization audit
    "q_x_novelty" -> ((s, dir) => {
      graft.text.CorpusStats.ngramNovelty(t(s, dir, "documents"),
        "doc_id", "text", n = 3)
    }),

    // X: top PMI collocations — multiword-expression / boilerplate
    // phrase detection
    "q_x_collocations" -> ((s, dir) => {
      graft.text.CorpusStats.collocations(t(s, dir, "documents"),
        "text", minCount = 5, topK = 20)
    })
  )

  // ------------------------------------------------------------------
  // DuckDB oracle SQL — identical aliases, identical semantics.
  // ------------------------------------------------------------------

  /** Shared by q_x_data_card (batch) and q_x_stream_data_card (the
    * live partials+render path must reduce to the SAME card). */
  private val dataCardOracleSql: String =
    """WITH b AS (SELECT source, lang,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) END AS ntok,
           len(regexp_extract_all(text, 'https?://[^\s]+'))
             + len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             + len(regexp_extract_all(text, '\b(\d{1,3}\.){3}\d{1,3}\b'))
             + len(regexp_extract_all(text, '\+?\d[\d()\-\s]{6,}\d')) AS pii,
           CASE WHEN trim(text) = '' THEN NULL ELSE
             206.835
             - 1.015 * (len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))::DOUBLE
                        / greatest(len(regexp_extract_all(text, '[.!?]+')), 1))
             - 84.6 * (list_sum(list_transform(
                         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                         w -> greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1)))::DOUBLE
                       / len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')))
           END AS ease,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
         FROM documents),
         m AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ntok) AS BIGINT) AS n_tokens,
           round(AVG(ntok), 4) AS mean_tokens,
           round((COUNT(*) - COUNT(DISTINCT fp))::DOUBLE / COUNT(*), 4) AS dup_ratio,
           round(SUM(pii)::DOUBLE / COUNT(*), 4) AS pii_per_doc,
           round(AVG(ease), 4) + 0.0 AS mean_reading_ease
         FROM b GROUP BY source),
         lc AS (SELECT source, lang, COUNT(*) AS n FROM b GROUP BY source, lang),
         lt AS (SELECT source, lang AS top_lang, n,
                  ROW_NUMBER() OVER (PARTITION BY source ORDER BY n DESC, lang DESC) AS rn,
                  SUM(n) OVER (PARTITION BY source) AS tot
                FROM lc)
         SELECT m.*, lt.top_lang, round(lt.n::DOUBLE / lt.tot, 4) AS top_lang_share
         FROM m JOIN lt ON m.source = lt.source AND lt.rn = 1"""

  /** Shared by q_x_winnow_probe_idx (batch-built index) and
    * q_x_stream_winnow_probe (stream-built index): a corpus ingested
    * through the streaming sink must produce a hash-identical probe. */
  private lazy val winnowProbeIdxOracleSql: String =
    winnowOracleCommon + """,
         fpd AS (SELECT DISTINCT doc_id, hash FROM fp),
         hc AS (SELECT hash FROM (SELECT hash, count(*) AS nd
             FROM fpd WHERE doc_id >= 50 GROUP BY hash)
           WHERE nd <= 50),
         pr AS (SELECT b.doc_id AS batch_id, c.doc_id AS corpus_id,
             count(*) AS n_shared
           FROM fpd b JOIN fpd c ON b.hash = c.hash
           JOIN hc ON hc.hash = b.hash
           WHERE b.doc_id < 50 AND c.doc_id >= 50
           GROUP BY b.doc_id, c.doc_id)
         SELECT batch_id, corpus_id, CAST(n_shared AS BIGINT) AS n_shared
         FROM pr WHERE n_shared >= 2"""

  /** Shared by q_x_ann_vecidx_exhaustive (batch-built index) and
    * q_x_stream_ann_probe (seed + streamed appends): an exhaustive
    * probe over a stream-grown index must equal the exact top-k. */
  private val vecIdxExhaustiveOracleSql: String =
    """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
         scored AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                      CAST(list_cosine_similarity(c.embedding, q.embedding) AS DOUBLE) AS cos
                    FROM embeddings c, q WHERE c.vec_id <> q.vec_id),
         r AS (SELECT query_id, cand_id, cos,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, cand_id) AS rank
               FROM scored)
         SELECT query_id, CAST(rank AS BIGINT) AS rank,
                cand_id AS neighbor_id, round(cos, 4) + 0.0 AS cos
         FROM r WHERE rank <= 5"""

  /** The substring-cut oracle, shared VERBATIM by `q_x_dedup_substrings`
    * (one-shot batch operator) and `q_x_substr_index` (sequential
    * id-ordered ingest through the persisted index) — the two are
    * semantically identical by the first-occurrence argument documented
    * on [[graft.text.SubstrIndex]], and sharing the SQL makes the gate
    * prove it. */
  private val SubstrCutSql: String =
    """WITH d AS (SELECT doc_id, text,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
         FROM documents),
         g AS (SELECT doc_id, s.pos AS pos, md5(s.gram) AS gk
           FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 19),
               i -> {'pos': i - 1, 'gram': array_to_string(list_slice(toks, i, i + 19), ' ')})) AS s
             FROM d WHERE len(toks) >= 20)),
         m AS (SELECT doc_id, pos FROM (
             SELECT doc_id, pos, row_number() OVER (PARTITION BY gk ORDER BY doc_id, pos) AS rn
             FROM g) WHERE rn > 1),
         u AS (SELECT doc_id, s.pos AS pos, 1 AS kind, s.tok AS tok
           FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks)),
                   i -> {'pos': i - 1, 'tok': toks[i]})) AS s FROM d)
           UNION ALL
           SELECT doc_id, pos, 0 AS kind, NULL AS tok FROM m),
         c AS (SELECT doc_id, pos, kind, tok,
             max(CASE WHEN kind = 0 THEN pos + 20 END)
               OVER (PARTITION BY doc_id ORDER BY pos, kind
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS covend
           FROM u),
         r AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS newtext
           FROM c WHERE kind = 1 AND (covend IS NULL OR pos >= covend) GROUP BY doc_id),
         ch AS (SELECT DISTINCT doc_id FROM m)
         SELECT d.doc_id,
           CASE WHEN ch.doc_id IS NOT NULL THEN coalesce(r.newtext, '') ELSE d.text END AS text
         FROM d LEFT JOIN r ON d.doc_id = r.doc_id LEFT JOIN ch ON d.doc_id = ch.doc_id"""

  def oracleSql: Map[String, String] = {
    val dup = oracleSqlHead.keySet.intersect(oracleSqlTail.keySet)
    require(dup.isEmpty,
      s"oracle defined in both map halves (tail would silently shadow " +
        s"head): ${dup.mkString(", ")}")
    oracleSqlHead ++ oracleSqlTail
  }

  private lazy val oracleSqlHead: Map[String, String] = uniqueMap(
    "q_s3_scan_filter" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         l_quantity, l_extendedprice
         FROM lineitem WHERE l_quantity >= 30 AND l_returnflag = 'A'""",

    "q_p4_predicates" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         l_quantity, l_discount
         FROM lineitem
         WHERE l_quantity >= 10 AND l_quantity <= 20
           AND l_discount > 0.05 AND l_returnflag <> 'N'""",

    "q_p5_ci_like" ->
      """SELECT p_partkey, p_type, p_brand FROM part
         WHERE lower(p_type) LIKE '%om%' OR lower(p_brand) = 'brand#13'""",

    "q_p6_dsl_or" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         l_returnflag, l_linestatus, l_quantity
         FROM lineitem
         WHERE l_quantity >= 30
           AND (lower(l_returnflag) = 'a' OR lower(l_linestatus) LIKE 'f%')""",

    "q_p3_drop_null_cols" ->
      """SELECT r_regionkey, r_name, 'x' AS full_dim FROM region""",

    "q_a1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
         round(avg(l_quantity), 4) AS avg_qty,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus""",

    "q_a1_groupby_max" ->
      """SELECT event_type, max(event_id) AS max_event_id, count(*) AS n,
         round(sum(value), 2) AS sum_value
         FROM events GROUP BY event_type""",

    "q_a2_column_stats" ->
      """SELECT count(l_orderkey) AS nn_orderkey,
         count(DISTINCT l_orderkey) AS nu_orderkey,
         count(l_returnflag) AS nn_returnflag,
         count(DISTINCT l_returnflag) AS nu_returnflag,
         count(l_quantity) AS nn_quantity,
         count(DISTINCT l_quantity) AS nu_quantity
         FROM lineitem""",

    "q_a3_minmax" ->
      """SELECT o_orderpriority,
         CAST(min(year(o_orderdate)) AS BIGINT) AS min_year,
         CAST(max(year(o_orderdate)) AS BIGINT) AS max_year,
         count(*) AS n
         FROM orders GROUP BY o_orderpriority""",

    "q_a4_pivot" ->
      """SELECT o_orderpriority,
         count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
         count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
         count(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
         FROM orders GROUP BY o_orderpriority""",

    "q_a5_dup_detect" ->
      """SELECT l_partkey, l_suppkey, count(*) AS n
         FROM lineitem GROUP BY l_partkey, l_suppkey HAVING count(*) > 1""",

    "q_a6_null_counts" ->
      """SELECT count(*) AS n_rows, count(value) AS n_value,
         count(*) - count(value) AS n_null_value FROM events""",

    "q_a7_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem""",

    "q_a8_rollup" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
         round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""",

    "q_j1_broadcast_join" ->
      """SELECT p_brand,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
         count(*) AS n
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand""",

    "q_j2_mod_join" ->
      """SELECT n_name, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
         FROM lineitem JOIN nation ON l_orderkey % 25 = n_nationkey
         GROUP BY n_name""",

    "q_j3_snapshot_latest" ->
      """SELECT user_id, event_id AS latest_event_id, event_type,
         round(value, 2) AS value
         FROM (SELECT *, row_number() OVER
                 (PARTITION BY user_id
                  ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
               FROM events) WHERE rn = 1""",

    "q_j4_semi" ->
      """SELECT o_orderkey, o_custkey FROM orders
         WHERE EXISTS (SELECT 1 FROM customer
                       WHERE c_custkey = o_custkey AND c_acctbal > 5000)""",

    "q_j4_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",

    "q_w1_ffill" ->
      """SELECT user_id, event_id,
         round(coalesce(
           last_value(v IGNORE NULLS) OVER
             (PARTITION BY user_id
              ORDER BY CAST(ts AS TIMESTAMP), event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           -1.0), 2) AS v
         FROM (SELECT *, CASE WHEN event_type = 'click' THEN value END AS v
               FROM events)""",

    "q_w2_row_number" ->
      """SELECT o_custkey, o_orderkey,
         CAST(row_number() OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn
         FROM orders""",

    "q_r1_melt" ->
      """WITH f AS (SELECT * FROM lineitem WHERE l_orderkey % 10 = 0)
         SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                'l_quantity' AS measure, round(l_quantity, 2) AS val FROM f
         UNION ALL
         SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
                'l_extendedprice', round(l_extendedprice, 2) FROM f
         UNION ALL
         SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
                'l_discount', round(l_discount, 2) FROM f
         UNION ALL
         SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
                'l_tax', round(l_tax, 2) FROM f""",

    "q_r3_union" ->
      """SELECT o_orderkey, o_totalprice, 'open' AS bucket
         FROM orders WHERE o_orderstatus = 'O'
         UNION ALL
         SELECT o_orderkey, o_totalprice, 'finished' AS bucket
         FROM orders WHERE o_orderstatus = 'F'""",

    "q_r5_rename_const" ->
      """SELECT r_regionkey, r_name AS region_name, 'tpch' AS source,
         'n/a' AS unit FROM region""",

    "q_set_ops" ->
      """WITH a AS (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_quantity >= 45),
            b AS (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_discount >= 0.08)
         SELECT l_orderkey, 'intersect' AS set_op FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
         UNION ALL
         SELECT l_orderkey, 'except' AS set_op FROM (SELECT * FROM a EXCEPT SELECT * FROM b)""",

    "q_o1_order_limit" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_orderkey LIMIT 100""",

    "q_o3_keyset_page" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_orderkey > 500 ORDER BY o_orderkey LIMIT 100""",

    "q_o4_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""",

    "q_f1_note_clean" ->
      """SELECT p_partkey,
         trim(regexp_replace(p_name || ' [note 3] tail [NOTE 12]',
              '(?i)\[\s*note\s+\d+\s*\]', '', 'g')) AS cleaned
         FROM part""",

    "q_f2_split_extract" ->
      """SELECT o_orderkey,
         regexp_extract(o_orderpriority, '^(\d+)', 1) AS prio_num,
         regexp_replace(o_orderpriority, 'NOT SPECIFIED', 'NONE') AS prio_clean
         FROM orders""",

    "q_f5_coerce" ->
      """SELECT event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         TRY_CAST(event_type AS DOUBLE) AS not_a_number
         FROM events""",

    "q_f7_timestamp" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS y,
         CAST(month(o_orderdate) AS BIGINT) AS m,
         strftime(o_orderdate, '%Y-%m-%d') AS d FROM orders""",

    "q_f8_pmod" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         l_orderkey % 7 AS block FROM lineitem""",

    "q_f9_case" ->
      """SELECT CASE WHEN o_totalprice > 300000 THEN 'high'
                     WHEN o_totalprice > 100000 THEN 'mid'
                     ELSE 'low' END AS bucket, count(*) AS n
         FROM orders GROUP BY 1""",

    "q_w4_time_window" ->
      """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
                         '%Y-%m-%d %H:%M:%S') AS hour_start,
         event_type, count(*) AS n, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2""",

    "q_store_roundtrip" ->
      """SELECT r_regionkey, r_name, CAST(2 AS BIGINT) AS version FROM region""",

    "q_store_lease_writer" ->
      """SELECT n_nationkey, n_name, n_regionkey,
           CAST(2 AS BIGINT) AS version FROM nation""",

    "q_store_history" ->
      """SELECT r_regionkey, CAST(r_regionkey * 10 AS BIGINT) AS val,
           TIMESTAMP '2026-01-01 00:00:00' AS valid_from,
           CASE WHEN r_regionkey % 2 = 1
                THEN TIMESTAMP '2026-01-02 00:00:00' END AS valid_to
         FROM region
         UNION ALL
         SELECT r_regionkey, CAST(r_regionkey * 10 + 100 AS BIGINT),
           TIMESTAMP '2026-01-02 00:00:00', NULL
         FROM region WHERE r_regionkey % 2 = 1""",

    "q_x_dedup_exact" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n_dups
         FROM documents GROUP BY md5(text)""",

    "q_x_fingerprint" ->
      """SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
         FROM documents""",

    "q_x_decontaminate" ->
      """WITH f AS (SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
         FROM documents),
         b AS (SELECT DISTINCT fp FROM f WHERE doc_id % 97 = 0)
         SELECT f.doc_id,
           CAST(b.fp IS NOT NULL AS INT) AS contaminated
         FROM f LEFT JOIN b ON f.fp = b.fp""",

    "q_x_decontaminate_ngram" ->
      """WITH tok AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
         FROM documents),
         g AS (SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(w) - 4, 0)),
             i -> array_to_string(list_slice(w, i, i + 4), ' '))) AS ng
         FROM tok),
         bg AS (SELECT DISTINCT ng FROM g WHERE doc_id % 37 = 0)
         SELECT DISTINCT g.doc_id FROM g JOIN bg USING (ng)""",

    "q_x_redact" ->
      """SELECT doc_id,
         regexp_replace(
           regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g'),
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g')
           AS redacted
         FROM documents""",

    "q_x_repetition" ->
      """WITH t AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
         FROM documents)
         SELECT doc_id,
           round(1.0 - len(list_distinct(toks))::DOUBLE / greatest(len(toks), 1), 4)
             AS rep_ratio
         FROM t""",

    "q_x_token_count" ->
      """SELECT doc_id,
         CAST(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_ws,
         CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_bpeish
         FROM documents""",

    "q_x_pack_segments" ->
      """WITH t AS (SELECT doc_id,
              string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
            FROM documents
            WHERE trim(regexp_replace(lower(text), '\s+', ' ', 'g')) <> ''),
         l AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n FROM t),
         o AS (SELECT doc_id, n,
              CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
            FROM l),
         m AS (SELECT doc_id, n, off,
              unnest(generate_series(off // 128, (off + n - 1) // 128)) AS seq_id
            FROM o)
         SELECT seq_id, doc_id,
           greatest(off, seq_id * 128) - off AS doc_start,
           greatest(off, seq_id * 128) - seq_id * 128 AS seq_start,
           least(off + n, (seq_id + 1) * 128) - greatest(off, seq_id * 128) AS n_tokens
         FROM m""",

    "q_x_pseudonymize" ->
      """WITH t AS (SELECT doc_id, text,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
         FROM documents),
         s AS (SELECT doc_id,
           text || ' contact ' || tk[1] || '@example.com or ' || tk[2]
             || '@example.com mail ' || tk[1] || '@example.com' AS txt
         FROM t)
         SELECT doc_id, list_reduce(
           [txt] || [r.b for r in list_sort([{a: -len(m), b: m} for m in
               list_distinct(regexp_extract_all(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))])],
           (acc, m) -> replace(acc, m, '<EMAIL:h' || substr(md5(m), 1, 7) || '>')) AS txt
         FROM s""",

    "q_x_embed_drift" ->
      """WITH ex AS (SELECT vec_id,
           unnest(embedding) AS v,
           unnest(range(len(embedding)::BIGINT)) AS dim
         FROM embeddings),
         ma AS (SELECT dim, avg(v) AS mu_a, count(*) AS n_a
           FROM ex WHERE vec_id % 2 = 0 GROUP BY dim),
         mb AS (SELECT dim, avg(v) AS mu_b, count(*) AS n_b
           FROM ex WHERE vec_id % 2 = 1 GROUP BY dim)
         SELECT CAST(max(n_a) AS BIGINT) AS n_a, CAST(max(n_b) AS BIGINT) AS n_b,
           CAST(COUNT(*) AS BIGINT) AS dims,
           round(SUM(mu_a * mu_b) /
             (sqrt(SUM(mu_a * mu_a)) * sqrt(SUM(mu_b * mu_b))), 4) + 0.0 AS centroid_cos,
           round(avg(abs(mu_a - mu_b)), 4) AS mean_abs_diff
         FROM ma JOIN mb USING (dim)""",

    "q_x_dup_by_source" ->
      """WITH fp AS (SELECT source,
           md5(array_to_string(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')[1:3], ' ')) AS f
         FROM documents),
         c AS (SELECT f, count(*) AS n FROM fp GROUP BY f)
         SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
           round(SUM(CASE WHEN c.n > 1 THEN 1 ELSE 0 END)::DOUBLE / COUNT(*), 4) AS dup_ratio
         FROM fp JOIN c USING (f) GROUP BY source""",

    "q_x_source_overlap" ->
      """WITH fp AS (SELECT DISTINCT source,
           md5(array_to_string(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')[1:3], ' ')) AS f
         FROM documents)
         SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared
         FROM fp a JOIN fp b ON a.f = b.f AND a.source < b.source
         GROUP BY a.source, b.source""",

    "q_x_pref_pairs" ->
      """WITH t AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk FROM documents),
         p AS (SELECT doc_id,
           array_to_string(tk[1:6], ' ') AS prompt,
           array_to_string(tk[7:len(tk)], ' ') AS chosen,
           array_to_string([tk[7:len(tk)][i] for i in generate_series(1, len(tk[7:len(tk)])) if i % 2 = 1], ' ') AS rejected
         FROM t),
         s AS (SELECT doc_id, prompt, chosen, rejected,
           list_distinct(string_split(chosen, ' ')) AS da,
           list_distinct(string_split(rejected, ' ')) AS db
         FROM p)
         SELECT doc_id,
           CAST(CASE WHEN trim(prompt) = '' THEN 0 ELSE len(string_split(prompt, ' ')) END AS BIGINT) AS n_prompt,
           CAST(CASE WHEN trim(chosen) = '' THEN 0 ELSE len(string_split(chosen, ' ')) END AS BIGINT) AS n_chosen,
           CAST(CASE WHEN trim(rejected) = '' THEN 0 ELSE len(string_split(rejected, ' ')) END AS BIGINT) AS n_rejected,
           CASE WHEN trim(chosen) = '' AND trim(rejected) = '' THEN 1.0
                WHEN trim(chosen) = '' OR trim(rejected) = '' THEN 0.0
                ELSE round(len(list_intersect(da, db))::DOUBLE / len(list_distinct(list_concat(da, db))), 4) END AS jaccard,
           (chosen = rejected) AS identical,
           (CASE WHEN trim(chosen) = '' THEN 0 ELSE len(string_split(chosen, ' ')) END > 0
            AND CASE WHEN trim(rejected) = '' THEN 0 ELSE len(string_split(rejected, ' ')) END > 0
            AND NOT (chosen = rejected)
            AND (CASE WHEN trim(chosen) = '' AND trim(rejected) = '' THEN 1.0
                WHEN trim(chosen) = '' OR trim(rejected) = '' THEN 0.0
                ELSE round(len(list_intersect(da, db))::DOUBLE / len(list_distinct(list_concat(da, db))), 4) END) < 0.9) AS keep
         FROM s""",

    "q_x_json_key_profile" ->
      """WITH j AS (SELECT doc_id, to_json(CASE WHEN doc_id % 3 = 0
           THEN struct_pack(id := doc_id, lang := lang, text := text, extra := 'x')::JSON
           ELSE struct_pack(id := doc_id, lang := lang, text := text)::JSON END) AS js
         FROM documents),
         k AS (SELECT doc_id, unnest(json_keys(js)) AS key FROM j)
         SELECT key, CAST(COUNT(*) AS BIGINT) AS n_docs,
           round(COUNT(*)::DOUBLE / (SELECT COUNT(*) FROM j), 4) AS coverage
         FROM k GROUP BY key""",

    "q_x_json_field_stats" ->
      """WITH j AS (SELECT doc_id, to_json(CASE WHEN doc_id % 3 = 0
           THEN struct_pack(id := doc_id, lang := lang, text := text, extra := 'x')::JSON
           ELSE struct_pack(id := doc_id, lang := lang, text := text)::JSON END) AS js
         FROM documents)
         SELECT key, CAST(COUNT(v) AS BIGINT) AS n_present,
           round(avg(len(v)), 4) AS avg_len
         FROM (
           SELECT 'lang' AS key, json_extract_string(js, '$.lang') AS v FROM j
           UNION ALL SELECT 'text', json_extract_string(js, '$.text') FROM j
           UNION ALL SELECT 'extra', json_extract_string(js, '$.extra') FROM j)
         GROUP BY key""",

    "q_x_chat_turns" ->
      (chatOracleCommon + """
         , x AS (SELECT doc_id, js,
              unnest(range(json_array_length(js, '$.messages')::BIGINT)) AS i
            FROM conv)
         SELECT doc_id, CAST(i AS BIGINT) AS turn_idx,
           json_extract_string(js, '$.messages[' || i || '].role') AS role,
           json_extract_string(js, '$.messages[' || i || '].content') AS content
         FROM x"""),

    "q_x_chat_stats" ->
      (chatOracleCommon + """
         , n AS (SELECT doc_id, js,
              json_array_length(js, '$.messages')::BIGINT AS n FROM conv),
         r AS (SELECT doc_id, n,
              [json_extract_string(js, '$.messages[' || i || '].role') for i in range(n)] AS roles,
              [json_extract_string(js, '$.messages[' || i || '].content') for i in range(n)] AS cts
            FROM n)
         SELECT doc_id, n AS n_turns,
           CAST(len(list_filter(roles, r -> r = 'user')) AS BIGINT) AS n_user,
           CAST(len(list_filter(roles, r -> r = 'assistant')) AS BIGINT) AS n_assistant,
           CAST(COALESCE(list_sum([CASE WHEN trim(c) = '' THEN 0 ELSE len(string_split_regex(trim(c), '\s+')) END for c in cts]), 0) AS BIGINT) AS n_tokens,
           (n >= 2
             AND len(list_filter(roles, r -> r IN ('system', 'user', 'assistant'))) = n
             AND len(list_filter(cts, c -> c IS NOT NULL AND len(c) > 0)) = n
             AND list_contains(roles, 'user')
             AND list_contains(roles, 'assistant')) AS valid
         FROM r"""),

    "q_x_chat_render" ->
      (chatOracleCommon + """
         SELECT doc_id,
           array_to_string([
               '<|' || json_extract_string(js, '$.messages[' || i || '].role')
               || '|>' || json_extract_string(js, '$.messages[' || i || '].content')
             for i in range(json_array_length(js, '$.messages')::BIGINT)], '') AS rendered
         FROM conv"""),

    // The pipeline oracle rebuilds the PII conversation DIRECTLY from
    // the turn contents (to_json/from_json round-trips content exactly,
    // so the JSON layer can be skipped), then replays schema filter ->
    // per-turn redact -> render -> md5 dedup -> the pack_segments
    // window math over the deduped rendered corpus.
    "q_x_chat_pipeline" ->
      raw"""WITH toks AS (SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
           FROM documents),
         conv AS (SELECT doc_id,
             array_to_string(tk[1:8], ' ') || ' mail ' || tk[1] || '@example.com' AS c_usr,
             array_to_string(tk[9:len(tk)], ' ') || ' see https://ex.com/' || tk[2] AS c_asst,
             (doc_id % 7 <> 0) AS role_ok
           FROM toks),
         valid AS (SELECT doc_id, c_usr, c_asst FROM conv
           WHERE role_ok AND c_usr IS NOT NULL AND len(c_usr) > 0
             AND c_asst IS NOT NULL AND len(c_asst) > 0),
         red AS (SELECT doc_id,
             '<|system|>be helpful<|user|>' ||
             regexp_replace(regexp_replace(c_usr,
                 'https?://[^\s]+', '<URL>', 'g'),
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') ||
             '<|assistant|>' ||
             regexp_replace(regexp_replace(c_asst,
                 'https?://[^\s]+', '<URL>', 'g'),
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g')
             AS rendered
           FROM valid),
         kept AS (SELECT doc_id AS id, rendered FROM (
             SELECT doc_id, rendered,
               row_number() OVER (PARTITION BY md5(rendered) ORDER BY doc_id) AS rn
             FROM red) WHERE rn = 1),
         t AS (SELECT id,
             string_split(trim(regexp_replace(lower(rendered), '\s+', ' ', 'g')), ' ') AS ptoks
           FROM kept
           WHERE trim(regexp_replace(lower(rendered), '\s+', ' ', 'g')) <> ''),
         l AS (SELECT id, CAST(len(ptoks) AS BIGINT) AS n FROM t),
         o AS (SELECT id, n,
             CAST(COALESCE(SUM(n) OVER (ORDER BY id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
           FROM l),
         m AS (SELECT id, n, off,
             unnest(generate_series(off // 128, (off + n - 1) // 128)) AS seq_id
           FROM o)
         SELECT seq_id, id,
           greatest(off, seq_id * 128) - off AS doc_start,
           greatest(off, seq_id * 128) - seq_id * 128 AS seq_start,
           least(off + n, (seq_id + 1) * 128) - greatest(off, seq_id * 128) AS n_tokens
         FROM m""",

    "q_x_html_extract" ->
      (htmlOracleCommon + """
         SELECT doc_id, txt,
           CAST(len(regexp_extract_all(html, '(?i)<a\b')) AS BIGINT) AS links
         FROM ex"""),

    "q_x_html_paragraphs" ->
      (htmlOracleCommon + raw"""
         , p AS (SELECT doc_id,
              unnest(string_split(txt, chr(10))) AS para,
              unnest(range(len(string_split(txt, chr(10))))) AS para_idx
            FROM ex)
         SELECT doc_id, CAST(para_idx AS BIGINT) AS para_idx,
           CAST(len(para) AS BIGINT) AS n_chars,
           round(len(list_filter(string_split_regex(trim(lower(para)), '\s+'),
               x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x)))::DOUBLE
             / greatest(len(string_split_regex(trim(lower(para)), '\s+')), 1), 4) AS stop_ratio,
           (len(para) >= 30 AND round(len(list_filter(string_split_regex(trim(lower(para)), '\s+'),
               x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x)))::DOUBLE
             / greatest(len(string_split_regex(trim(lower(para)), '\s+')), 1), 4) >= 0.03) AS keep
         FROM p WHERE len(trim(para)) > 0"""),

    "q_x_html_main" ->
      (htmlOracleCommon + raw"""
         SELECT doc_id, COALESCE(array_to_string(list_filter(string_split(txt, chr(10)),
             p -> len(p) >= 30 AND round(len(list_filter(string_split_regex(trim(lower(p)), '\s+'),
               x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x)))::DOUBLE
             / greatest(len(string_split_regex(trim(lower(p)), '\s+')), 1), 4) >= 0.03), chr(10)), '') AS main
         FROM ex"""),

    "q_x_pack_windows" ->
      """WITH t AS (SELECT doc_id,
              string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
            FROM documents
            WHERE trim(regexp_replace(lower(text), '\s+', ' ', 'g')) <> ''),
         l AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM t),
         o AS (SELECT doc_id, toks, n,
              CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
            FROM l),
         m AS (SELECT doc_id, toks, n, off,
              unnest(generate_series(off // 128, (off + n - 1) // 128)) AS seq_id
            FROM o),
         seg AS (SELECT seq_id, doc_id, toks,
              greatest(off, seq_id * 128) - off AS doc_start,
              greatest(off, seq_id * 128) - seq_id * 128 AS seq_start,
              least(off + n, (seq_id + 1) * 128) - greatest(off, seq_id * 128) AS n_tok
            FROM m)
         SELECT seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           string_agg(array_to_string(list_slice(toks, doc_start + 1, doc_start + n_tok), ' '),
                      ' ' ORDER BY seq_start) AS seq_text
         FROM seg GROUP BY seq_id""",

    // DSIR: the identical add-k smoothed unigram+bigram log-ratio model
    // over the joint vocabulary; weights = per-doc sum of ratios
    "q_x_dsir_weights" ->
      """WITH tok AS (SELECT doc_id, source,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
         FROM documents),
         f AS (SELECT doc_id, source,
             unnest(w || list_transform(generate_series(1, len(w) - 1),
               i -> w[i] || ' ' || w[i + 1])) AS feat
           FROM tok WHERE len(w) >= 1),
         ct AS (SELECT feat, count(*) AS c_t FROM f WHERE source = 'src1' GROUP BY feat),
         cr AS (SELECT feat, count(*) AS c_r FROM f WHERE source <> 'src1' GROUP BY feat),
         j AS (SELECT coalesce(ct.feat, cr.feat) AS feat,
             coalesce(c_t, 0) AS c_t, coalesce(c_r, 0) AS c_r
           FROM ct FULL JOIN cr ON ct.feat = cr.feat),
         s AS (SELECT count(*) AS v, sum(c_t) AS nt, sum(c_r) AS nr FROM j),
         r AS (SELECT feat,
             ln((c_t + 0.5) / (nt + 0.5 * v)) - ln((c_r + 0.5) / (nr + 0.5 * v)) AS lr
           FROM j CROSS JOIN s)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
           round(sum(lr), 4) + 0.0 AS log_weight
         FROM f JOIN r USING (feat)
         GROUP BY doc_id""",

    // DSIR selection: the same weights, drawn by Gumbel top-k with the
    // md5(id)-derived uniform (13 hex digits over 16^13)
    "q_x_dsir_sample" ->
      """WITH tok AS (SELECT doc_id, source,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
         FROM documents),
         f AS (SELECT doc_id, source,
             unnest(w || list_transform(generate_series(1, len(w) - 1),
               i -> w[i] || ' ' || w[i + 1])) AS feat
           FROM tok WHERE len(w) >= 1),
         ct AS (SELECT feat, count(*) AS c_t FROM f WHERE source = 'src1' GROUP BY feat),
         cr AS (SELECT feat, count(*) AS c_r FROM f WHERE source <> 'src1' GROUP BY feat),
         j AS (SELECT coalesce(ct.feat, cr.feat) AS feat,
             coalesce(c_t, 0) AS c_t, coalesce(c_r, 0) AS c_r
           FROM ct FULL JOIN cr ON ct.feat = cr.feat),
         s AS (SELECT count(*) AS v, sum(c_t) AS nt, sum(c_r) AS nr FROM j),
         r AS (SELECT feat,
             ln((c_t + 0.5) / (nt + 0.5 * v)) - ln((c_r + 0.5) / (nr + 0.5 * v)) AS lr
           FROM j CROSS JOIN s),
         lw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
             round(sum(lr), 4) + 0.0 AS log_weight
           FROM f JOIN r USING (feat)
           GROUP BY doc_id),
         g AS (SELECT doc_id, n_feats, log_weight,
             log_weight - ln(-ln(
               CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS UBIGINT)
                 / power(16.0, 13))) AS gk
           FROM lw)
         SELECT g.doc_id, n_feats, log_weight, d.source
         FROM g JOIN documents d ON g.doc_id = d.doc_id
         ORDER BY gk DESC, md5(CAST(g.doc_id AS VARCHAR)), g.doc_id
         LIMIT 200""",

    // one full-batch LR gradient step: the same xxh64 token synthesis as
    // q_x_quality_margin_fixed; per-(doc,bucket) counts / 10 mirror the
    // Spark trainer's count/n division exactly
    "q_x_logreg_step" ->
      (xxh64TokenOracleCommon + """,
         wv AS (SELECT unnest(generate_series(0, 7)) AS bucket),
         w AS (SELECT bucket, CASE bucket WHEN 0 THEN 0.25 WHEN 1 THEN -0.5
                WHEN 2 THEN 0.125 WHEN 3 THEN 0.75 WHEN 4 THEN -0.25
                WHEN 5 THEN 0.0625 WHEN 6 THEN -0.125 ELSE 0.5 END AS wj
           FROM wv),
         fb AS (SELECT doc_id, (h % 8)::INT AS bucket, count(*) / 10.0 AS cn
           FROM fin GROUP BY doc_id, (h % 8)::INT),
         m AS (SELECT doc_id, sum(cn * wj) AS s
           FROM fb JOIN w USING (bucket) GROUP BY doc_id),
         g AS (SELECT doc_id,
             1.0 / (1.0 + exp(-(s + 0.0625))) - (doc_id % 2) AS gd FROM m),
         gr AS (SELECT bucket, sum(cn * gd) AS grad
           FROM fb JOIN g USING (doc_id) GROUP BY bucket)
         SELECT CAST(w.bucket AS INT) AS bucket,
           round(wj - 0.5 * coalesce(grad, 0), 6) + 0.0 AS weight
         FROM w LEFT JOIN gr USING (bucket)
         UNION ALL
         SELECT -1 AS bucket,
           round(0.0625 - 0.5 * (SELECT sum(gd) FROM g), 6) + 0.0 AS weight"""),

    // Mann-Whitney AUC with average-rank ties over the LM score
    "q_x_auc" ->
      """WITH tok AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
         FROM documents),
         p0 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
             i -> struct_pack(w1 := w[i], bg := w[i] || ' ' || w[i + 1]))) AS s
           FROM tok WHERE len(w) >= 2),
         p AS (SELECT doc_id, s.w1 AS w1, s.bg AS bg FROM p0),
         b AS (SELECT bg, count(*) AS c_bg FROM p GROUP BY bg),
         u AS (SELECT w1, count(*) AS c_w1 FROM p GROUP BY w1),
         v AS (SELECT count(*) AS nv FROM u),
         sc AS (SELECT doc_id,
             round(avg(ln((c_bg + 0.5) / (c_w1 + 0.5 * v.nv))), 4) AS s
           FROM p JOIN b USING (bg) JOIN u USING (w1) CROSS JOIN v
           GROUP BY doc_id),
         lab AS (SELECT sc.doc_id, s,
             CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END AS y
           FROM sc JOIN documents d ON sc.doc_id = d.doc_id),
         grp AS (SELECT s, sum(y) AS p, count(*)::DOUBLE AS t
           FROM lab GROUP BY s),
         r AS (SELECT p, t, coalesce(sum(t) OVER (ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
           FROM grp),
         a AS (SELECT sum(p * (c + (t + 1) / 2)) AS rp, sum(p) AS np,
             sum(t - p) AS nn FROM r)
         SELECT round((rp - np * (np + 1) / 2) / (np * nn), 6) + 0.0 AS auc,
           CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg
         FROM a""",

    // reliability bins of the fixed-model sigmoid score vs lang='en'
    "q_x_calibration" ->
      (xxh64TokenOracleCommon + """,
         m AS (SELECT doc_id,
             avg(CASE h % 8 WHEN 0 THEN 0.25 WHEN 1 THEN -0.5
                 WHEN 2 THEN 0.125 WHEN 3 THEN 0.75 WHEN 4 THEN -0.25
                 WHEN 5 THEN 0.0625 WHEN 6 THEN -0.125 ELSE 0.5 END)
               + 0.0625 AS margin
           FROM fin GROUP BY doc_id),
         sc AS (SELECT m.doc_id, 1.0 / (1.0 + exp(-margin)) AS p,
             CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END AS y
           FROM m JOIN documents d ON m.doc_id = d.doc_id)
         SELECT CAST(least(floor(p * 10), 9) AS INT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(p), 6) + 0.0 AS avg_score,
           round(avg(y), 6) + 0.0 AS frac_pos
         FROM sc GROUP BY 1"""),

    // precision/recall at the k=500 budget: deterministic top-k
    // (score desc, doc_id asc) + one label count
    "q_x_pr_at_k" ->
      """WITH tok AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
         FROM documents),
         p0 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
             i -> struct_pack(w1 := w[i], bg := w[i] || ' ' || w[i + 1]))) AS s
           FROM tok WHERE len(w) >= 2),
         p AS (SELECT doc_id, s.w1 AS w1, s.bg AS bg FROM p0),
         b AS (SELECT bg, count(*) AS c_bg FROM p GROUP BY bg),
         u AS (SELECT w1, count(*) AS c_w1 FROM p GROUP BY w1),
         v AS (SELECT count(*) AS nv FROM u),
         sc AS (SELECT doc_id,
             round(avg(ln((c_bg + 0.5) / (c_w1 + 0.5 * v.nv))), 4) AS s
           FROM p JOIN b USING (bg) JOIN u USING (w1) CROSS JOIN v
           GROUP BY doc_id),
         lab AS (SELECT sc.doc_id, s,
             CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END AS y
           FROM sc JOIN documents d ON sc.doc_id = d.doc_id),
         top AS (SELECT y FROM lab ORDER BY s DESC, doc_id LIMIT 500),
         tp AS (SELECT sum(y) AS tp, count(*)::DOUBLE AS k FROM top),
         ap AS (SELECT sum(y) AS ap FROM lab)
         SELECT CAST(k AS BIGINT) AS k, CAST(tp AS BIGINT) AS n_pos_topk,
           round(tp / k, 6) + 0.0 AS precision,
           round(tp / ap, 6) + 0.0 AS recall
         FROM tp CROSS JOIN ap""",

    // ranked-retrieval metrics: brute cosine run + label-proximity
    // qrels replayed relationally (see rankOracleCommon)
    "q_x_rank_metrics" ->
      (rankOracleCommon + """
         SELECT query_id, n_rel, n_hit, rr, dcg, idcg, ndcg, recall
         FROM perq"""),

    "q_x_rank_summary" ->
      (rankOracleCommon + """
         SELECT CAST(10 AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS n_queries,
           round(avg(rr), 6) + 0.0 AS mrr,
           round(avg(ndcg), 6) + 0.0 AS mean_ndcg,
           round(avg(recall), 6) + 0.0 AS mean_recall
         FROM perq"""),

    // ROUGE-2: clipped bigram matches, relational form of the kernel's
    // hash-map clip (per-doc per-gram least of the two counts)
    "q_x_rouge_n" ->
      (genEvalOracleCommon + clippedCtes(2) + """,
         base AS (SELECT doc_id, greatest(len(c) - 1, 0) AS n_cand,
             greatest(len(r) - 1, 0) AS n_ref FROM p),
         j AS (SELECT b.doc_id, coalesce(m2.nm, 0) AS nm, n_cand, n_ref,
             CASE WHEN n_cand > 0
               THEN CAST(coalesce(m2.nm, 0) AS DOUBLE) / n_cand
               ELSE 0.0 END AS pr,
             CASE WHEN n_ref > 0
               THEN CAST(coalesce(m2.nm, 0) AS DOUBLE) / n_ref
               ELSE 0.0 END AS rc
           FROM base b LEFT JOIN m2 ON m2.doc_id = b.doc_id)
         SELECT doc_id, CAST(nm AS BIGINT) AS n_match,
           CAST(n_cand AS BIGINT) AS n_cand, CAST(n_ref AS BIGINT) AS n_ref,
           round(pr, 6) + 0.0 AS precision, round(rc, 6) + 0.0 AS recall,
           round(CASE WHEN pr + rc > 0
             THEN CAST(2.0 AS DOUBLE) * pr * rc / (pr + rc)
             ELSE 0.0 END, 6) + 0.0 AS f1
         FROM j"""),

    // ROUGE-L: the identical LCS DP as a recursive CTE — row i of the
    // DP table from row i-1 via the prefix-max recurrence
    // new[j] = max(prev[j], max_{j'<=j}(prev[j'-1] + eq(i, j'))),
    // integer-exact, ending where the Spark kernel ends
    "q_x_rouge_l" ->
      raw"""WITH RECURSIVE tok AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
         FROM documents),
         p AS (SELECT doc_id,
             string_split(array_to_string(w[1:20], ' '), ' ') AS c,
             string_split(array_to_string(
               list_filter(w[1:24], t -> NOT contains(t, 'e')), ' '), ' ') AS r
           FROM tok),
         dp AS (
           SELECT doc_id, c, r, 0 AS i,
             list_transform(generate_series(0, len(r)), x -> 0) AS row
           FROM p
           UNION ALL
           SELECT doc_id, c, r, i + 1,
             list_prepend(0, list_transform(generate_series(1, len(r)), j ->
               greatest(row[j + 1],
                 list_max(list_transform(generate_series(1, j), jj ->
                   row[jj] + CASE WHEN c[i + 1] = r[jj] THEN 1 ELSE 0 END)))))
           FROM dp WHERE i < len(c)),
         lcs AS (SELECT doc_id, row[len(r) + 1] AS lcs,
             len(c) AS n_cand, len(r) AS n_ref
           FROM dp WHERE i = len(c)),
         j AS (SELECT doc_id, lcs, n_cand, n_ref,
             CASE WHEN n_cand > 0 THEN CAST(lcs AS DOUBLE) / n_cand
               ELSE 0.0 END AS pr,
             CASE WHEN n_ref > 0 THEN CAST(lcs AS DOUBLE) / n_ref
               ELSE 0.0 END AS rc
           FROM lcs)
         SELECT doc_id, CAST(lcs AS BIGINT) AS lcs,
           CAST(n_cand AS BIGINT) AS n_cand, CAST(n_ref AS BIGINT) AS n_ref,
           round(pr, 6) + 0.0 AS precision, round(rc, 6) + 0.0 AS recall,
           round(CASE WHEN pr + rc > 0
             THEN CAST(2.0 AS DOUBLE) * pr * rc / (pr + rc)
             ELSE 0.0 END, 6) + 0.0 AS f1
         FROM j""",

    // corpus BLEU-4: clipped counts pooled across pairs BEFORE the
    // precision ratios; ln-sum geometric mean in Spark's fold order
    "q_x_bleu" ->
      (genEvalOracleCommon +
        (1 to 4).map(clippedCtes).mkString +
        (1 to 4).map(n => s""",
         s$n AS (SELECT CAST(coalesce((SELECT sum(nm) FROM m$n), 0) AS DOUBLE) AS m,
             CAST((SELECT sum(greatest(len(c) - ${n - 1}, 0)) FROM p) AS DOUBLE) AS t)""").mkString + """,
         lens AS (SELECT CAST(sum(len(c)) AS DOUBLE) AS lc,
             CAST(sum(len(r)) AS DOUBLE) AS lr FROM p),
         ps AS (SELECT lc, lr,
             CASE WHEN s1.t > 0 THEN s1.m / s1.t ELSE 0.0 END AS p1,
             CASE WHEN s2.t > 0 THEN s2.m / s2.t ELSE 0.0 END AS p2,
             CASE WHEN s3.t > 0 THEN s3.m / s3.t ELSE 0.0 END AS p3,
             CASE WHEN s4.t > 0 THEN s4.m / s4.t ELSE 0.0 END AS p4,
             CASE WHEN lc >= lr THEN CAST(1.0 AS DOUBLE)
               ELSE exp(CAST(1.0 AS DOUBLE) - lr / lc) END AS bp
           FROM lens, s1, s2, s3, s4)
         SELECT CAST(lc AS BIGINT) AS cand_tokens,
           CAST(lr AS BIGINT) AS ref_tokens,
           round(p1, 6) + 0.0 AS p1, round(p2, 6) + 0.0 AS p2,
           round(p3, 6) + 0.0 AS p3, round(p4, 6) + 0.0 AS p4,
           round(bp, 6) + 0.0 AS bp,
           round(CASE WHEN p1 > 0 AND p2 > 0 AND p3 > 0 AND p4 > 0
             THEN bp * exp((((ln(p1) + ln(p2)) + ln(p3)) + ln(p4)) / 4)
             ELSE 0.0 END, 6) + 0.0 AS bleu
         FROM ps"""),

    // chrF: character-stream clipped matches, orders 1..6, F2 fold
    // (see chrfOracle — fully generated to mirror Spark's association)
    "q_x_chrf" -> chrfOracle,

    // FIM: identical md5-channel cuts (c1 in [1,L-2], c2 in [c1+1,L-1])
    // and substring partition, short docs pass through
    "q_x_fim" ->
      raw"""WITH n AS (SELECT doc_id,
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
         FROM documents),
         c AS (SELECT doc_id, t, len(t) AS L,
             CAST(CAST(concat('0x', substr(md5('fim:1:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) AS h1,
             CAST(CAST(concat('0x', substr(md5('fim:2:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) AS h2
           FROM n),
         d AS (SELECT doc_id, t, L,
             CASE WHEN L >= 16 THEN h1 % (L - 2) + 1 ELSE L END AS c1
           FROM c),
         e AS (SELECT d.doc_id, d.t AS t, d.L AS L, d.c1 AS c1,
             CASE WHEN d.L >= 16 THEN d.c1 + c.h2 % (d.L - 1 - d.c1) + 1 ELSE d.L END AS c2
           FROM d JOIN c ON c.doc_id = d.doc_id)
         SELECT doc_id, CAST(c1 AS BIGINT) AS cut1, CAST(c2 AS BIGINT) AS cut2,
           substr(t, 1, c1) AS prefix,
           substr(t, c1 + 1, c2 - c1) AS middle,
           substr(t, c2 + 1, L) AS suffix,
           '<PRE>' || substr(t, 1, c1) || '<SUF>' || substr(t, c2 + 1, L)
             || '<MID>' || substr(t, c1 + 1, c2 - c1) AS psm
         FROM e""",

    // span corruption: same md5 span starts per block, same sentinel
    // walk, relational (list_transform over blocks + flatten)
    "q_x_span_corrupt" ->
      raw"""WITH tok AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
         FROM documents),
         b AS (SELECT doc_id, w, len(w) // 20 AS nb FROM tok),
         s AS (SELECT doc_id, w, nb,
             list_transform(generate_series(0, nb - 1), bb ->
               CAST(CAST(concat('0x', substr(md5('span:' || CAST(doc_id AS VARCHAR) || ':' || CAST(bb AS VARCHAR)), 1, 15)) AS UBIGINT) % 18 AS INT)) AS st
           FROM b)
         SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
           CAST(nb * 3 AS BIGINT) AS n_masked,
           array_to_string(flatten(list_concat(
             list_transform(generate_series(1, nb), i -> flatten([
               w[(i - 1) * 20 + 1 : (i - 1) * 20 + st[i]],
               ['<extra_id_' || CAST(i - 1 AS VARCHAR) || '>'],
               w[(i - 1) * 20 + st[i] + 4 : (i - 1) * 20 + 20]])),
             [w[nb * 20 + 1 : len(w)]])), ' ') AS inputs,
           coalesce(array_to_string(flatten(
             list_transform(generate_series(1, nb), i -> flatten([
               ['<extra_id_' || CAST(i - 1 AS VARCHAR) || '>'],
               w[(i - 1) * 20 + st[i] + 1 : (i - 1) * 20 + st[i] + 3]]))), ' '), '') AS targets
         FROM s""",

    // winnowing: the identical hash (md5-prefix as UBIGINT) and the
    // identical rightmost-min window rule, relationally (windows ⋈
    // grams, per-window rank by (hash ASC, pos DESC))
    "q_x_winnow" -> (winnowOracleCommon + """
         SELECT doc_id, CAST(pos AS INT) AS pos, hash FROM fp"""),

    "q_x_winnow_overlap" -> (winnowOracleCommon + """,
         fpd AS (SELECT DISTINCT doc_id, hash FROM fp),
         hc AS (SELECT hash, count(*) AS nd FROM fpd GROUP BY hash),
         ok AS (SELECT f.doc_id, f.hash FROM fpd f JOIN hc USING (hash)
           WHERE nd BETWEEN 2 AND 50),
         pr AS (SELECT a.doc_id AS left_id, b.doc_id AS right_id,
             count(*) AS n_shared
           FROM ok a JOIN ok b ON a.hash = b.hash AND a.doc_id < b.doc_id
           GROUP BY a.doc_id, b.doc_id)
         SELECT left_id, right_id, CAST(n_shared AS BIGINT) AS n_shared
         FROM pr WHERE n_shared >= 2"""),

    // winnow index probe: same fingerprints, batch (< 50) x corpus
    // (>= 50) pairs, cap computed on the CORPUS side only
    "q_x_winnow_probe_idx" -> winnowProbeIdxOracleSql,

    "q_x_stream_winnow_probe" -> winnowProbeIdxOracleSql,

    // bitext margins: same cosine, same top-k neighborhood means
    // (ties by opposite id), same ratio margin over the fwd/bwd union
    "q_x_bitext_margin" ->
      (bitextOracleCommon + """
         SELECT src_id, tgt_id, round(cos, 6) + 0.0 AS cos,
           round(margin, 6) + 0.0 AS margin
         FROM m"""),

    // mined pairs: per-side argmax by margin (ties by opposite id),
    // intersection + threshold
    "q_x_bitext_pairs" ->
      (bitextOracleCommon + """,
         sel AS (SELECT src_id, tgt_id, cos, margin,
             row_number() OVER (PARTITION BY src_id
               ORDER BY margin DESC, tgt_id) AS bf,
             row_number() OVER (PARTITION BY tgt_id
               ORDER BY margin DESC, src_id) AS bb
           FROM m)
         SELECT src_id, tgt_id, round(cos, 6) + 0.0 AS cos,
           round(margin, 6) + 0.0 AS margin
         FROM sel WHERE bf = 1 AND bb = 1 AND margin >= 1.0"""),

    // shard audit: same md5 shard rule, same 60-bit fingerprints,
    // same XOR fold (order-independent, so no ORDER BY needed)
    "q_x_shard_audit" ->
      raw"""WITH d AS (SELECT doc_id,
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
         FROM documents),
         f AS (SELECT doc_id,
             CAST(CAST(concat('0x', substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS UBIGINT) AS BIGINT) % 8 AS shard,
             len(string_split(t, ' ')) AS nt,
             CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':' || t), 1, 15)) AS UBIGINT) AS BIGINT) AS fp
           FROM d)
         SELECT CAST(shard AS INT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS n_tokens,
           bit_xor(fp) AS content_hash,
           min(doc_id) AS min_id, max(doc_id) AS max_id
         FROM f GROUP BY shard""",

    // xcov: the same uncentered X^T Y sums over the same pairs
    "q_x_xcov" ->
      """WITH pr AS (SELECT CAST(a.embedding AS DOUBLE[]) AS x,
             CAST(b.embedding AS DOUBLE[]) AS y
           FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
           WHERE a.vec_id % 2 = 0),
         g AS (SELECT i.i AS i, j.j AS j, x[i.i + 1] * y[j.j + 1] AS xy
           FROM pr, generate_series(0, 15) i(i), generate_series(0, 15) j(j))
         SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           round(sum(xy), 6) + 0.0 AS sxy
         FROM g GROUP BY i, j""",

    // procrustes: the planted Givens composition applied with literal
    // trig entries — W = R0 analytically, so x·W replays exactly
    "q_x_procrustes_align" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x
           FROM embeddings),
         g AS (SELECT vec_id, i.i AS i,
             CASE i.i
               WHEN 0 THEN cos(pi() / 6) * x[1] - sin(pi() / 6) * x[2]
               WHEN 1 THEN sin(pi() / 6) * x[1] + cos(pi() / 6) * x[2]
               WHEN 2 THEN cos(pi() / 3) * x[3] - sin(pi() / 3) * x[4]
               WHEN 3 THEN sin(pi() / 3) * x[3] + cos(pi() / 3) * x[4]
               ELSE x[i.i + 1] END AS v
           FROM e, generate_series(0, 63) i(i))
         SELECT vec_id, CAST(i AS INT) AS i, round(v, 6) + 0.0 AS v
         FROM g""",

    // the align -> mine composition: rotation-invariance of cosine
    // means the mined pairs equal the unrotated run — SAME ORACLE as
    // q_x_bitext_pairs (the rounding tolerance absorbs the ~1e-12 SVD
    // recovery error in W vs the exact R0)
    // align -> mine -> decontaminate (either side 5-gram-overlaps the
    // doc_id%37 eval slice) -> pack: mining replays rotation-invariant,
    // decontamination and packing replay their standalone oracle forms
    "q_x_multiling_pipeline" ->
      (bitextOracleCommon + """,
         sel AS (SELECT src_id, tgt_id, margin,
             row_number() OVER (PARTITION BY src_id
               ORDER BY margin DESC, tgt_id) AS bf,
             row_number() OVER (PARTITION BY tgt_id
               ORDER BY margin DESC, src_id) AS bb
           FROM m),
         mined AS (SELECT src_id, tgt_id FROM sel
           WHERE bf = 1 AND bb = 1 AND margin >= 1.0),
         tok AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
         FROM documents),
         g AS (SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(w) - 4, 0)),
             i -> array_to_string(list_slice(w, i, i + 4), ' '))) AS ng
         FROM tok),
         bg AS (SELECT DISTINCT ng FROM g WHERE doc_id % 37 = 0),
         dirty AS (SELECT DISTINCT g.doc_id FROM g JOIN bg USING (ng)),
         clean AS (SELECT src_id, tgt_id FROM mined
           WHERE src_id NOT IN (SELECT doc_id FROM dirty)
             AND tgt_id NOT IN (SELECT doc_id FROM dirty)),
         nt AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n FROM tok),
         sized AS (SELECT c.src_id, c.tgt_id,
             ns.n + ntg.n AS pair_tokens
           FROM clean c JOIN nt ns ON ns.doc_id = c.src_id
                        JOIN nt ntg ON ntg.doc_id = c.tgt_id),
         packed AS (SELECT src_id, tgt_id, pair_tokens AS n_tokens,
             CAST(sum(pair_tokens) OVER (ORDER BY src_id
               ROWS UNBOUNDED PRECEDING) - pair_tokens AS BIGINT)
               AS start_offset
           FROM sized WHERE pair_tokens > 0)
         SELECT src_id, tgt_id, n_tokens, start_offset,
           start_offset // 512 AS seq_first,
           (start_offset + n_tokens - 1) // 512 AS seq_last
         FROM packed"""),

    "q_x_bitext_aligned" ->
      (bitextOracleCommon + """,
         sel AS (SELECT src_id, tgt_id, cos, margin,
             row_number() OVER (PARTITION BY src_id
               ORDER BY margin DESC, tgt_id) AS bf,
             row_number() OVER (PARTITION BY tgt_id
               ORDER BY margin DESC, src_id) AS bb
           FROM m)
         SELECT src_id, tgt_id, round(cos, 6) + 0.0 AS cos,
           round(margin, 6) + 0.0 AS margin
         FROM sel WHERE bf = 1 AND bb = 1 AND margin >= 1.0"""),

    // diversity: same stacked grams, same one-pass entropy identity
    // ln(T) - sum(c ln c)/T
    "q_x_diversity" ->
      raw"""WITH tok AS (SELECT lang,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
         FROM documents),
         g AS (SELECT lang, n.n AS n,
             unnest(list_transform(generate_series(1, len(w) - n.n + 1),
               i -> array_to_string(w[i:i + n.n - 1], ' '))) AS g
           FROM tok, (VALUES (1), (2), (3)) n(n)),
         c AS (SELECT lang, n, g, count(*) AS c FROM g GROUP BY lang, n, g)
         SELECT lang, n, CAST(sum(c) AS BIGINT) AS n_grams,
           CAST(count(*) AS BIGINT) AS n_distinct,
           round(CAST(count(*) AS DOUBLE) / sum(c), 6) + 0.0 AS distinct_ratio,
           round(ln(CAST(sum(c) AS DOUBLE))
             - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
               / CAST(sum(c) AS DOUBLE), 6) + 0.0 AS entropy
         FROM c GROUP BY lang, n""",

    // k-center greedy: the unrolled recurrence (see kcenterOracleCommon)
    "q_x_kcenter" ->
      (kcenterOracleCommon(6) + """
         SELECT CAST(sel_rank AS BIGINT) AS rank, cid AS vec_id,
           round(d, 4) + 0.0 AS dist
         FROM cs"""),

    // coverage assignment: argmin over the same six centers, ties to
    // the earlier-selected center (sel_rank)
    "q_x_kcenter_assign" ->
      (kcenterOracleCommon(6) + """,
         a0 AS (SELECT e.vec_id AS id, cs.cid, cs.sel_rank,
             list_sum(list_transform(generate_series(1, 64),
               i -> (e.v[i] - cs.cv[i]) * (e.v[i] - cs.cv[i]))) AS d
           FROM e CROSS JOIN cs),
         a1 AS (SELECT id, cid, d, row_number() OVER (
             PARTITION BY id ORDER BY d, sel_rank) AS rn FROM a0)
         SELECT id, cid AS center_id, round(d, 4) + 0.0 AS dist
         FROM a1 WHERE rn = 1"""),

    // graph ANN: the beam-search walk replayed step by step — exact kNN
    // edges (degree 4), min-id entry, two expansion rounds, top-3 of
    // everything visited, the query's own node excluded at output
    // label propagation: same exact-kNN edge rebuild as q_x_graph_ann,
    // symmetrized, then the three rounds unrolled (labelPropRound)
    "q_x_label_prop" ->
      ("""WITH sc AS (SELECT a.vec_id AS src, b.vec_id AS dst,
             list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])) AS cos
           FROM embeddings a CROSS JOIN embeddings b
           WHERE a.vec_id <> b.vec_id AND a.vec_id < 500 AND b.vec_id < 500),
         er AS (SELECT src, dst, row_number() OVER (PARTITION BY src
             ORDER BY cos DESC, dst) AS rk FROM sc),
         ed AS (SELECT src, dst FROM er WHERE rk <= 4),
         edu AS (SELECT src, dst FROM ed UNION SELECT dst, src FROM ed),
         l0 AS (SELECT vec_id AS id, label AS lab FROM embeddings
           WHERE vec_id < 50)""" +
        (1 to 3).map(labelPropRound).mkString + """
         SELECT id AS vec_id, lab AS label, id < 50 AS is_seed FROM l3"""),

    "q_x_graph_ann" ->
      """WITH sc AS (SELECT a.vec_id AS src, b.vec_id AS dst,
             list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])) AS cos
           FROM embeddings a CROSS JOIN embeddings b
           WHERE a.vec_id <> b.vec_id AND a.vec_id < 500 AND b.vec_id < 500),
         er AS (SELECT src, dst, row_number() OVER (PARTITION BY src
             ORDER BY cos DESC, dst) AS rk FROM sc),
         ed AS (SELECT src, dst FROM er WHERE rk <= 4),
         q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < 8),
         n AS (SELECT vec_id AS node, CAST(embedding AS DOUBLE[]) AS nv
           FROM embeddings WHERE vec_id < 500),
         ent AS (SELECT min(node) AS node FROM n),
         v0 AS (SELECT q.query_id, n.node,
             list_cosine_similarity(q.qv, n.nv) AS cos
           FROM q CROSS JOIN ent JOIN n ON n.node = ent.node),
         f1 AS (SELECT DISTINCT v0.query_id, ed.dst AS node
           FROM v0 JOIN ed ON ed.src = v0.node),
         x1 AS (SELECT f1.query_id, f1.node,
             list_cosine_similarity(q.qv, n.nv) AS cos
           FROM f1 JOIN n USING (node) JOIN q USING (query_id)
           WHERE NOT EXISTS (SELECT 1 FROM v0
             WHERE v0.query_id = f1.query_id AND v0.node = f1.node)),
         v1 AS (SELECT * FROM v0 UNION ALL SELECT * FROM x1),
         c1 AS (SELECT query_id, node FROM (SELECT query_id, node,
             row_number() OVER (PARTITION BY query_id
               ORDER BY cos DESC, node) AS rn FROM v1) WHERE rn <= 4),
         f2 AS (SELECT DISTINCT c1.query_id, ed.dst AS node
           FROM c1 JOIN ed ON ed.src = c1.node),
         x2 AS (SELECT f2.query_id, f2.node,
             list_cosine_similarity(q.qv, n.nv) AS cos
           FROM f2 JOIN n USING (node) JOIN q USING (query_id)
           WHERE NOT EXISTS (SELECT 1 FROM v1
             WHERE v1.query_id = f2.query_id AND v1.node = f2.node)),
         v2 AS (SELECT * FROM v1 UNION ALL SELECT * FROM x2)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, node AS neighbor_id,
           round(cos, 4) + 0.0 AS cos
         FROM (SELECT query_id, node, cos, row_number() OVER (
             PARTITION BY query_id ORDER BY cos DESC, node) AS rank
           FROM v2 WHERE node <> query_id)
         WHERE rank <= 3""",

    "q_x_topk_per_group" ->
      """SELECT l_returnflag, round(l_extendedprice, 2) AS price,
           l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber
         FROM (SELECT *, row_number() OVER (
                 PARTITION BY l_returnflag
                 ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
               FROM lineitem)
         WHERE rn <= 3""",

    "q_x_gopher_quality" ->
      """WITH b AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
         FROM documents),
         f AS (SELECT doc_id,
           CAST(len(w) AS BIGINT) AS n_words,
           round(CAST(list_sum(list_transform(w, t -> len(t))) AS DOUBLE)
                 / greatest(len(w), 1), 4) AS mean_word_len,
           round(CAST(len(list_filter(w, t -> contains(t, '#')
                   OR contains(t, '...') OR contains(t, chr(8230)))) AS DOUBLE)
                 / greatest(len(w), 1), 4) AS symbol_ratio,
           round(CAST(len(list_filter(w, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
                 / greatest(len(w), 1), 4) AS alpha_ratio,
           CAST(len(list_intersect(list_distinct(w),
             ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS n_stopwords
         FROM b)
         SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_ratio,
           n_stopwords,
           (n_words >= 40 AND n_words <= 100000) AS pass_words,
           (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS pass_word_len,
           (symbol_ratio <= 0.1) AS pass_symbols,
           (alpha_ratio >= 0.8) AS pass_alpha,
           (n_stopwords >= 2) AS pass_stopwords,
           (n_words >= 40 AND n_words <= 100000
            AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
            AND symbol_ratio <= 0.1 AND alpha_ratio >= 0.8
            AND n_stopwords >= 2) AS keep
         FROM f""",

    // Paper/DataTrove normalization throughout: every char fraction
    // divides by the FULL document length; top-gram mass requires the
    // gram to repeat (c > 1); dup-gram mass is the non-overlapping
    // skip-n scan, expressed as a recursive CTE walking each (doc, n)
    // gram list left to right with a seen-list — sequential by nature,
    // fine at oracle scale (docs are <= ~100 tokens at sf0.01).
    "q_x_gopher_repetition" ->
      """WITH RECURSIVE d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
         tl AS (SELECT doc_id, greatest(length(text), 1)::DOUBLE AS tlen FROM d),
         lels AS (SELECT doc_id,
           list_filter(string_split(text, chr(10)), x -> trim(x) != '') AS els
           FROM d),
         pels AS (SELECT doc_id,
           list_filter(regexp_split_to_array(text, '\n{2,}'), x -> trim(x) != '') AS els
           FROM d),
         lstat AS (SELECT l.doc_id,
           round((len(els) - len(list_distinct(els)))::DOUBLE
                 / greatest(len(els), 1), 4) AS dup_line_frac,
           round((coalesce(list_sum(list_transform(els, e -> length(e))), 0)
                  - coalesce(list_sum(list_transform(list_distinct(els), e -> length(e))), 0))::DOUBLE
                 / t.tlen, 4) AS dup_line_char_frac
           FROM lels l JOIN tl t USING (doc_id)),
         pstat AS (SELECT p.doc_id,
           round((len(els) - len(list_distinct(els)))::DOUBLE
                 / greatest(len(els), 1), 4) AS dup_para_frac,
           round((coalesce(list_sum(list_transform(els, e -> length(e))), 0)
                  - coalesce(list_sum(list_transform(list_distinct(els), e -> length(e))), 0))::DOUBLE
                 / t.tlen, 4) AS dup_para_char_frac
           FROM pels p JOIN tl t USING (doc_id)),
         toks AS (SELECT doc_id,
           list_filter(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
             t -> t != '') AS w
           FROM d),
         topg AS (SELECT doc_id, ns.n AS n,
           unnest(CASE WHEN len(w) >= ns.n
             THEN list_transform(range(1, len(w) - ns.n + 2),
                    i -> array_to_string(list_slice(w, i, i + ns.n - 1), ' '))
             ELSE []::VARCHAR[] END) AS gram
           FROM toks CROSS JOIN (SELECT unnest([2,3,4]) AS n) ns),
         gcnt AS (SELECT doc_id, n, gram, count(*) AS c
           FROM topg GROUP BY doc_id, n, gram),
         gagg AS (SELECT doc_id, n,
             max(CASE WHEN c > 1 THEN c * length(gram) ELSE 0 END) AS best
           FROM gcnt GROUP BY doc_id, n),
         gram5 AS (SELECT doc_id, ns.n AS n,
           CASE WHEN len(w) >= ns.n
             THEN list_transform(range(1, len(w) - ns.n + 2),
                    i -> array_to_string(list_slice(w, i, i + ns.n - 1), ' '))
             ELSE []::VARCHAR[] END AS gl
           FROM toks CROSS JOIN (SELECT unnest([5,6,7,8,9,10]) AS n) ns),
         scan AS (
           SELECT doc_id, n, 1 AS i, []::VARCHAR[] AS seen, 0::BIGINT AS chars
           FROM gram5
           UNION ALL
           SELECT s.doc_id, s.n,
             CASE WHEN list_contains(s.seen, g.gl[s.i])
                  THEN s.i + s.n ELSE s.i + 1 END AS i,
             CASE WHEN list_contains(s.seen, g.gl[s.i])
                  THEN s.seen ELSE list_append(s.seen, g.gl[s.i]) END AS seen,
             s.chars + CASE WHEN list_contains(s.seen, g.gl[s.i])
                            THEN length(g.gl[s.i]) ELSE 0 END AS chars
           FROM scan s JOIN gram5 g ON s.doc_id = g.doc_id AND s.n = g.n
           WHERE s.i <= len(g.gl)),
         dupagg AS (SELECT doc_id, n, max(chars) AS dup
           FROM scan GROUP BY doc_id, n),
         piv AS (SELECT t.doc_id,
           round(coalesce(max(CASE WHEN a.n = 2 THEN a.best END), 0) / t.tlen, 4) AS top_2gram_char_frac,
           round(coalesce(max(CASE WHEN a.n = 3 THEN a.best END), 0) / t.tlen, 4) AS top_3gram_char_frac,
           round(coalesce(max(CASE WHEN a.n = 4 THEN a.best END), 0) / t.tlen, 4) AS top_4gram_char_frac,
           round(coalesce(max(CASE WHEN u.n = 5 THEN u.dup END), 0) / t.tlen, 4) AS dup_5gram_char_frac,
           round(coalesce(max(CASE WHEN u.n = 6 THEN u.dup END), 0) / t.tlen, 4) AS dup_6gram_char_frac,
           round(coalesce(max(CASE WHEN u.n = 7 THEN u.dup END), 0) / t.tlen, 4) AS dup_7gram_char_frac,
           round(coalesce(max(CASE WHEN u.n = 8 THEN u.dup END), 0) / t.tlen, 4) AS dup_8gram_char_frac,
           round(coalesce(max(CASE WHEN u.n = 9 THEN u.dup END), 0) / t.tlen, 4) AS dup_9gram_char_frac,
           round(coalesce(max(CASE WHEN u.n = 10 THEN u.dup END), 0) / t.tlen, 4) AS dup_10gram_char_frac
           FROM tl t
           LEFT JOIN gagg a ON t.doc_id = a.doc_id
           LEFT JOIN dupagg u ON t.doc_id = u.doc_id
           GROUP BY t.doc_id, t.tlen)
         SELECT l.doc_id, dup_line_frac, dup_line_char_frac,
           dup_para_frac, dup_para_char_frac,
           top_2gram_char_frac, top_3gram_char_frac, top_4gram_char_frac,
           dup_5gram_char_frac, dup_6gram_char_frac, dup_7gram_char_frac,
           dup_8gram_char_frac, dup_9gram_char_frac, dup_10gram_char_frac,
           (dup_line_frac <= 0.30 AND dup_line_char_frac <= 0.20
            AND dup_para_frac <= 0.30 AND dup_para_char_frac <= 0.20
            AND top_2gram_char_frac <= 0.20 AND top_3gram_char_frac <= 0.18
            AND top_4gram_char_frac <= 0.16
            AND dup_5gram_char_frac <= 0.15 AND dup_6gram_char_frac <= 0.14
            AND dup_7gram_char_frac <= 0.13 AND dup_8gram_char_frac <= 0.12
            AND dup_9gram_char_frac <= 0.11 AND dup_10gram_char_frac <= 0.10) AS keep
         FROM lstat l JOIN pstat p USING (doc_id) JOIN piv USING (doc_id)""",

    "q_x_bpe_chars" ->
      """SELECT doc_id,
         CAST(len(replace(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ', '')) AS BIGINT)
           AS n_chars_bpe
         FROM documents""",

    // the identical greedy longest-match recurrence as a recursive CTE:
    // each step appends the longest vocab piece matching at pos (scalar
    // subquery argmax), advancing pos by its length — terminates because
    // the single-character alphabet always matches
    "q_x_wordpiece" ->
      (wordpieceOracleCommon + """,
         ex AS (SELECT doc_id, widx,
             unnest(list_transform(generate_series(1, len(pieces)),
               j -> struct_pack(j := j, piece := pieces[j]))) AS s
           FROM done)
         SELECT doc_id, CAST(widx AS BIGINT) AS widx,
           CAST(s.j AS BIGINT) AS pidx, s.piece AS piece FROM ex"""),

    // tokenizer fertility: per-language pieces-per-word aggregated from
    // the SAME greedy-encode recurrence's done(doc_id, widx, pieces)
    "q_x_tok_fertility" ->
      (wordpieceOracleCommon + """,
         np AS (SELECT doc_id, CAST(sum(len(pieces)) AS BIGINT) AS n_pieces
           FROM done GROUP BY doc_id),
         nw AS (SELECT d.doc_id, d.lang, len(t.w) AS n_words
           FROM documents d JOIN tok t ON t.doc_id = d.doc_id)
         SELECT lang, CAST(sum(n_words) AS BIGINT) AS n_words,
           CAST(sum(coalesce(np.n_pieces, 0)) AS BIGINT) AS n_pieces,
           round(CAST(sum(coalesce(np.n_pieces, 0)) AS DOUBLE)
             / sum(n_words), 6) + 0.0 AS fertility
         FROM nw LEFT JOIN np ON np.doc_id = nw.doc_id
         GROUP BY lang"""),

    // identical Viterbi DP as a recursive CTE carrying best[0..j] as a
    // list of (score, pieces) structs; the argmax rides two scalar
    // subqueries with the same ORDER BY (a correlated struct literal
    // inside one subquery fails to bind). DP runs per DISTINCT word
    // (same result; the single-threaded oracle needs the dedup),
    // joined back to instances at the end
    "q_x_unigram" ->
      """WITH RECURSIVE
         tok AS (SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
           FROM documents),
         words0 AS (SELECT doc_id,
             unnest(list_transform(generate_series(1, len(w)),
               i -> struct_pack(i := i, word := w[i]))) AS s
           FROM tok),
         words AS (SELECT doc_id, s.i AS widx, s.word AS word FROM words0),
         wf AS (SELECT word, count(*) AS c FROM words GROUP BY word),
         topw AS (SELECT word AS piece, c FROM wf ORDER BY c DESC, word LIMIT 30),
         ch0 AS (SELECT unnest(string_split(word, '')) AS ch FROM words),
         chf AS (SELECT ch AS piece, count(*) AS c FROM ch0 GROUP BY ch),
         vocab0 AS (
           SELECT piece, c FROM topw
           UNION ALL
           SELECT piece, c FROM chf
           WHERE piece NOT IN (SELECT piece FROM topw)),
         tot AS (SELECT SUM(c) AS t FROM vocab0),
         v AS (SELECT piece, ln(c::DOUBLE / tot.t::DOUBLE) AS lp
               FROM vocab0, tot),
         dw AS (SELECT DISTINCT word FROM words),
         r AS (
           SELECT word, 0 AS j,
             [{'score': CAST(0.0 AS DOUBLE),
               'pieces': CAST([] AS VARCHAR[])}] AS best
           FROM dw
           UNION ALL
           SELECT word, j + 1, list_append(best,
             {'score': (
                SELECT t.best[t.j + 2 - len(p.piece)].score + p.lp
                FROM v p
                WHERE len(p.piece) <= t.j + 1
                  AND substr(t.word, t.j + 2 - len(p.piece), len(p.piece)) = p.piece
                ORDER BY t.best[t.j + 2 - len(p.piece)].score + p.lp DESC,
                         len(p.piece) DESC, p.piece LIMIT 1),
              'pieces': (
                SELECT list_append(t.best[t.j + 2 - len(p.piece)].pieces, p.piece)
                FROM v p
                WHERE len(p.piece) <= t.j + 1
                  AND substr(t.word, t.j + 2 - len(p.piece), len(p.piece)) = p.piece
                ORDER BY t.best[t.j + 2 - len(p.piece)].score + p.lp DESC,
                         len(p.piece) DESC, p.piece LIMIT 1)})
           FROM r t WHERE t.j < len(t.word)),
         seg AS (SELECT word, best[len(word) + 1].pieces AS pieces
           FROM r WHERE j = len(word)),
         ex AS (SELECT w.doc_id, w.widx,
             unnest(list_transform(generate_series(1, len(g.pieces)),
               k -> struct_pack(k := k, piece := g.pieces[k]))) AS s
           FROM words w JOIN seg g ON g.word = w.word)
         SELECT doc_id, CAST(widx AS BIGINT) AS widx,
           CAST(s.k AS BIGINT) AS pidx, s.piece AS piece FROM ex""",

    "q_x_quality" ->
      """WITH t AS (SELECT doc_id, text,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
         FROM documents)
         SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           round((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))::DOUBLE
                 / greatest(length(text), 1), 4) AS punct_ratio,
           round(len(list_filter(toks, x -> x IN
               ('the','a','of','and','to','in','is','that','it','for')))::DOUBLE
                 / greatest(len(toks), 1), 4) AS stopword_ratio,
           round(length(text)::DOUBLE / greatest(len(toks), 1), 4) AS mean_word_len
         FROM t""",

    "q_x_lm_score" ->
      """WITH tok AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
         FROM documents),
         p0 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
             i -> struct_pack(w1 := w[i], bg := w[i] || ' ' || w[i + 1]))) AS s
           FROM tok WHERE len(w) >= 2),
         p AS (SELECT doc_id, s.w1 AS w1, s.bg AS bg FROM p0),
         b AS (SELECT bg, count(*) AS c_bg FROM p GROUP BY bg),
         u AS (SELECT w1, count(*) AS c_w1 FROM p GROUP BY w1),
         v AS (SELECT count(*) AS nv FROM u)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln((c_bg + 0.5) / (c_w1 + 0.5 * v.nv))), 4) AS avg_logprob
         FROM p JOIN b USING (bg) JOIN u USING (w1) CROSS JOIN v
         GROUP BY doc_id""",

    "q_x_source_cap" ->
      """WITH r AS (SELECT doc_id, source, n_chars,
           row_number() OVER (PARTITION BY source
                              ORDER BY n_chars DESC, doc_id) AS rn
         FROM documents)
         SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
         FROM r WHERE rn <= 10""",

    "q_x_perplexity_buckets" ->
      """WITH tok AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
         FROM documents),
         p0 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
             i -> struct_pack(w1 := w[i], bg := w[i] || ' ' || w[i + 1]))) AS s
           FROM tok WHERE len(w) >= 2),
         p AS (SELECT doc_id, s.w1 AS w1, s.bg AS bg FROM p0),
         b AS (SELECT bg, count(*) AS c_bg FROM p GROUP BY bg),
         u AS (SELECT w1, count(*) AS c_w1 FROM p GROUP BY w1),
         v AS (SELECT count(*) AS nv FROM u),
         sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             round(avg(ln((c_bg + 0.5) / (c_w1 + 0.5 * v.nv))), 4) AS avg_logprob
           FROM p JOIN b USING (bg) JOIN u USING (w1) CROSS JOIN v
           GROUP BY doc_id)
         SELECT doc_id, n_bigrams, avg_logprob,
           CAST(ntile(3) OVER (ORDER BY avg_logprob DESC, doc_id) AS BIGINT)
             AS bucket
         FROM sc""",

    "q_x_perplexity_buckets_by" ->
      """WITH tok AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
         FROM documents),
         p0 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
             i -> struct_pack(w1 := w[i], bg := w[i] || ' ' || w[i + 1]))) AS s
           FROM tok WHERE len(w) >= 2),
         p AS (SELECT doc_id, s.w1 AS w1, s.bg AS bg FROM p0),
         b AS (SELECT bg, count(*) AS c_bg FROM p GROUP BY bg),
         u AS (SELECT w1, count(*) AS c_w1 FROM p GROUP BY w1),
         v AS (SELECT count(*) AS nv FROM u),
         sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             round(avg(ln((c_bg + 0.5) / (c_w1 + 0.5 * v.nv))), 4) AS avg_logprob
           FROM p JOIN b USING (bg) JOIN u USING (w1) CROSS JOIN v
           GROUP BY doc_id)
         SELECT sc.doc_id, d.lang, sc.n_bigrams, sc.avg_logprob,
           CAST(ntile(3) OVER (PARTITION BY d.lang
                               ORDER BY sc.avg_logprob DESC, sc.doc_id) AS BIGINT)
             AS bucket
         FROM sc JOIN documents d ON d.doc_id = sc.doc_id""",

    "q_x_health_report" ->
      """WITH tok AS (SELECT doc_id, lang,
           CAST(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_toks,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
         FROM documents),
         g AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_toks) AS BIGINT) AS n_tokens,
             avg(n_toks) AS mean_toks,
             CAST(count(DISTINCT fp) AS BIGINT) AS n_fp,
             CAST(sum(CASE WHEN n_toks < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_short
           FROM tok),
         le AS (SELECT sum((c * 1.0 / t.n_docs) * -ln(c * 1.0 / t.n_docs)) AS ent
           FROM (SELECT lang, count(*) AS c FROM tok GROUP BY lang), g t)
         SELECT 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM g
         UNION ALL SELECT 'n_tokens', CAST(n_tokens AS DOUBLE) FROM g
         UNION ALL SELECT 'mean_doc_tokens', round(mean_toks, 4) FROM g
         UNION ALL SELECT 'pct_exact_dup', round(1.0 - n_fp * 1.0 / n_docs, 4) FROM g
         UNION ALL SELECT 'pct_short', round(n_short * 1.0 / n_docs, 4) FROM g
         UNION ALL SELECT 'lang_entropy', round(ent, 4) FROM le""",

    "q_x_token_drift_by" ->
      """WITH wa AS (SELECT lang AS g,
           unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
           FROM documents WHERE doc_id % 2 = 0),
         wb AS (SELECT lang AS g,
           unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
           FROM documents WHERE doc_id % 2 = 1),
         ca AS (SELECT g, w, count(*) AS na FROM wa WHERE w <> '' GROUP BY g, w),
         cb AS (SELECT g, w, count(*) AS nb FROM wb WHERE w <> '' GROUP BY g, w),
         j AS (SELECT COALESCE(ca.g, cb.g) AS g,
             COALESCE(ca.na, 0) AS na, COALESCE(cb.nb, 0) AS nb
           FROM ca FULL OUTER JOIN cb ON ca.g = cb.g AND ca.w = cb.w),
         tot AS (SELECT g, CAST(sum(na) AS BIGINT) AS ta,
             CAST(sum(nb) AS BIGINT) AS tb, CAST(count(*) AS BIGINT) AS vu
           FROM j GROUP BY g),
         e AS (SELECT j.g, na, nb, ta, tb, vu,
             CASE WHEN ta > 0 THEN na * 1.0 / ta ELSE 0 END AS p,
             CASE WHEN tb > 0 THEN nb * 1.0 / tb ELSE 0 END AS q
           FROM j JOIN tot ON tot.g = j.g)
         SELECT g AS lang, ta AS n_tokens_a, tb AS n_tokens_b,
           vu AS vocab_union,
           round(sum(
             0.5 * CASE WHEN na > 0 AND ta > 0
               THEN p * ln(p / ((p + q) / 2)) ELSE 0 END +
             0.5 * CASE WHEN nb > 0 AND tb > 0
               THEN q * ln(q / ((p + q) / 2)) ELSE 0 END), 4) AS js_divergence
         FROM e GROUP BY g, ta, tb, vu""",

    "q_x_c4_line_filter" ->
      """WITH l AS (SELECT doc_id, string_split(text, chr(10)) AS ls
         FROM documents
         WHERE NOT contains(text, '{') AND NOT contains(text, '}')),
         k AS (SELECT doc_id, len(ls) AS total_lines,
             list_filter(ls, x ->
               len(string_split(trim(regexp_replace(x, '\s+', ' ', 'g')), ' ')) >= 20
               AND trim(x) <> ''
               AND NOT contains(lower(x), 'javascript')
               AND NOT contains(lower(x), 'cookie')
               AND NOT contains(lower(x), 'lorem ipsum')) AS keep
           FROM l)
         SELECT doc_id, array_to_string(keep, chr(10)) AS text_clean,
           CAST(total_lines AS BIGINT) AS total_lines,
           CAST(len(keep) AS BIGINT) AS kept_lines
         FROM k WHERE len(keep) >= 1""",

    "q_x_lm_score_cross" ->
      """WITH tok AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
         FROM documents),
         pc0 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
             i -> struct_pack(w1 := w[i], bg := w[i] || ' ' || w[i + 1]))) AS s
           FROM tok WHERE doc_id % 10 <> 3 AND len(w) >= 2),
         pc AS (SELECT doc_id, s.w1 AS w1, s.bg AS bg FROM pc0),
         b AS (SELECT bg, count(*) AS c_bg FROM pc GROUP BY bg),
         u AS (SELECT w1, count(*) AS c_w1 FROM pc GROUP BY w1),
         v AS (SELECT count(*) AS nv FROM u),
         pn0 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
             i -> struct_pack(w1 := w[i], bg := w[i] || ' ' || w[i + 1]))) AS s
           FROM tok WHERE doc_id % 10 = 3 AND len(w) >= 2),
         pn AS (SELECT doc_id, s.w1 AS w1, s.bg AS bg FROM pn0)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln((coalesce(c_bg, 0) + 0.5)
                        / (coalesce(c_w1, 0) + 0.5 * v.nv))), 4) AS avg_logprob
         FROM pn LEFT JOIN b USING (bg) LEFT JOIN u USING (w1) CROSS JOIN v
         GROUP BY doc_id""",

    "q_x_lang_id" ->
      """WITH t AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
         FROM documents),
         s AS (SELECT doc_id,
           len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','that','it','for')))::DOUBLE / greatest(len(toks), 1) AS s_en,
           len(list_filter(toks, x -> x IN ('le','la','les','de','et','un','une','que','est','pour')))::DOUBLE / greatest(len(toks), 1) AS s_fr,
           len(list_filter(toks, x -> x IN ('el','la','los','de','y','un','una','que','es','para')))::DOUBLE / greatest(len(toks), 1) AS s_es,
           len(list_filter(toks, x -> x IN ('der','die','das','und','ein','eine','ist','zu','den','von')))::DOUBLE / greatest(len(toks), 1) AS s_de,
           len(list_filter(toks, x -> x IN ('de5','shi4','le5','zai4','he2','you3','wo3','ta1','zhe4','bu4')))::DOUBLE / greatest(len(toks), 1) AS s_zh
         FROM t)
         SELECT doc_id,
           CASE WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de AND s_en >= s_zh AND s_en > 0 THEN 'en'
                WHEN s_fr >= s_en AND s_fr >= s_es AND s_fr >= s_de AND s_fr >= s_zh AND s_fr > 0 THEN 'fr'
                WHEN s_es >= s_en AND s_es >= s_fr AND s_es >= s_de AND s_es >= s_zh AND s_es > 0 THEN 'es'
                WHEN s_de >= s_en AND s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh AND s_de > 0 THEN 'de'
                WHEN s_zh >= s_en AND s_zh >= s_fr AND s_zh >= s_es AND s_zh >= s_de AND s_zh > 0 THEN 'zh'
                ELSE 'und' END AS lang_pred,
           round(s_en, 4) AS s_en
         FROM s""",

    "q_x_stratified_sample" ->
      """WITH r AS (SELECT o_orderpriority, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_orderpriority
                              ORDER BY md5(CAST(o_orderkey AS VARCHAR)),
                                       o_orderkey) AS rn
         FROM orders)
         SELECT o_orderpriority, o_orderkey, o_totalprice
         FROM r WHERE rn <= 10""",

    "q_x_weighted_sample_unit" ->
      """WITH r AS (SELECT lang, doc_id, n_chars,
           row_number() OVER (PARTITION BY lang
             ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 13) DESC,
                      md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
         FROM documents)
         SELECT lang, doc_id, n_chars FROM r WHERE rn <= 20""",

    "q_x_global_shuffle" ->
      """SELECT doc_id,
           CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)))
                AS BIGINT) AS shuffle_pos
         FROM documents""",

    "q_x_training_mix" ->
      """WITH r AS (SELECT lang, doc_id, source,
           row_number() OVER (PARTITION BY lang
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
         FROM documents WHERE lang IN ('en', 'de', 'zh'))
         SELECT lang, doc_id, source FROM r
         WHERE rn <= CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 20 ELSE 10 END""",

    "q_x_split_assign" -> {
      // thresholds from the SAME Scala doubles splitAssign folds over, so
      // a last-ulp sum difference cannot shift a boundary between engines
      val cums = Seq(0.8, 0.1, 0.1).scanLeft(0.0)(_ + _).tail
      val t1 = graft.functions.Sampling.hexThreshold(cums(0))
      val t2 = graft.functions.Sampling.hexThreshold(cums(1))
      s"""WITH a AS (SELECT CASE
           WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 13) < '$t1' THEN 'train'
           WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 13) < '$t2' THEN 'val'
           ELSE 'test' END AS split FROM documents)
         SELECT split, CAST(count(*) AS BIGINT) AS n_docs FROM a GROUP BY split"""
    },

    "q_x_token_budget_mix" ->
      """WITH d AS (SELECT lang, doc_id,
           CAST(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens
         FROM documents WHERE lang IN ('en', 'de', 'zh')),
         r AS (SELECT lang, doc_id, n_tokens,
           sum(n_tokens) OVER (PARTITION BY lang
                               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
         FROM d)
         SELECT lang, doc_id, n_tokens FROM r
         WHERE cum <= CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2000 ELSE 1000 END""",

    "q_x_temperature_mix" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         s AS (SELECT sum(sqrt(n)) AS ps FROM c),
         tgt AS (SELECT lang,
           CAST(floor(200 * round(sqrt(n) / ps, 6) + 1e-9) AS BIGINT) AS k
         FROM c, s),
         r AS (SELECT lang, doc_id, source,
           row_number() OVER (PARTITION BY lang
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
         FROM documents)
         SELECT r.lang, r.doc_id, r.source
         FROM r JOIN tgt USING (lang) WHERE rn <= k""",

    "q_x_bm25" ->
      """WITH q(query_id, term) AS (VALUES
           ('qa', 'hash'), ('qa', 'join'), ('qa', 'merge'),
           ('qb', 'stream'), ('qb', 'window'), ('qb', 'batch'),
           ('qc', 'vector'), ('qc', 'column'), ('qc', 'scan')),
         base AS (SELECT doc_id AS id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
         FROM documents),
         d AS (SELECT id, len(toks)::DOUBLE AS dl, unnest(toks) AS term FROM base),
         tf AS (SELECT id, term, dl, count(*)::DOUBLE AS tf
                FROM d WHERE term IN (SELECT DISTINCT term FROM q)
                GROUP BY id, term, dl),
         stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(len(toks)::DOUBLE) AS avgdl
                   FROM base),
         dfreq AS (SELECT term, count(DISTINCT id)::DOUBLE AS df FROM tf GROUP BY term),
         scored AS (SELECT q.query_id, tf.id,
             round(sum(ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
                       * tf.tf * 2.2
                       / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl))), 4) AS score
           FROM tf JOIN q ON tf.term = q.term
           JOIN dfreq f ON f.term = tf.term, stats s
           GROUP BY q.query_id, tf.id),
         r AS (SELECT query_id, id, score,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY score DESC, id) AS rank
               FROM scored)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, id AS doc_id, score
         FROM r WHERE rank <= 10""",

    "q_x_repeated_passages" ->
      """WITH tok AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
         FROM documents),
         g0 AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(w) - 9, 0)),
             i -> struct_pack(pos := i - 1, ng := array_to_string(list_slice(w, i, i + 9), ' ')))) AS s
           FROM tok),
         g AS (SELECT doc_id, CAST(s.pos AS BIGINT) AS pos, s.ng AS ng FROM g0),
         hot AS (SELECT ng FROM (SELECT DISTINCT ng, doc_id FROM g)
                 GROUP BY ng HAVING count(*) >= 2)
         SELECT g.doc_id, g.pos, md5(g.ng) AS gram_md5
         FROM g JOIN hot USING (ng)""",

    "q_x_dedup_incremental" ->
      """WITH d AS (SELECT doc_id, text,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
         FROM documents),
         newd AS (SELECT * FROM d WHERE doc_id % 10 = 3),
         ex AS (SELECT * FROM d WHERE doc_id % 10 <> 3),
         batch AS (SELECT doc_id, text, w, fp FROM (
             SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
             FROM newd) WHERE rn = 1),
         s1 AS (SELECT b.doc_id, b.text, b.w FROM batch b
                WHERE NOT EXISTS (SELECT 1 FROM ex e WHERE e.fp = b.fp)),
         sn AS (SELECT doc_id, text,
             list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
               i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS st FROM s1),
         se AS (SELECT doc_id,
             list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
               i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS st FROM ex),
         hits AS (SELECT DISTINCT n.doc_id FROM sn n, se e
                  WHERE len(n.st) > 0 AND len(e.st) > 0
                    AND len(list_intersect(n.st, e.st))::DOUBLE
                        / len(list_distinct(n.st || e.st)) >= 0.5)
         SELECT s.doc_id, s.text FROM sn s
         LEFT JOIN hits h ON s.doc_id = h.doc_id
         WHERE h.doc_id IS NULL""",

    // identical survivor semantics to the scan form — the index is a
    // materialization of the same compare, not a different algorithm
    "q_x_dedup_incremental_idx" ->
      """WITH d AS (SELECT doc_id, text,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
         FROM documents),
         newd AS (SELECT * FROM d WHERE doc_id % 10 = 3),
         ex AS (SELECT * FROM d WHERE doc_id % 10 <> 3),
         batch AS (SELECT doc_id, text, w, fp FROM (
             SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
             FROM newd) WHERE rn = 1),
         s1 AS (SELECT b.doc_id, b.text, b.w FROM batch b
                WHERE NOT EXISTS (SELECT 1 FROM ex e WHERE e.fp = b.fp)),
         sn AS (SELECT doc_id, text,
             list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
               i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS st FROM s1),
         se AS (SELECT doc_id,
             list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 0)),
               i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS st FROM ex),
         hits AS (SELECT DISTINCT n.doc_id FROM sn n, se e
                  WHERE len(n.st) > 0 AND len(e.st) > 0
                    AND len(list_intersect(n.st, e.st))::DOUBLE
                        / len(list_distinct(n.st || e.st)) >= 0.5)
         SELECT s.doc_id, s.text FROM sn s
         LEFT JOIN hits h ON s.doc_id = h.doc_id
         WHERE h.doc_id IS NULL""",

    "q_x_repeated_spans" ->
      """WITH tok AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
         FROM documents),
         g0 AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(w) - 9, 0)),
             i -> struct_pack(pos := i - 1, ng := array_to_string(list_slice(w, i, i + 9), ' ')))) AS s
           FROM tok),
         g AS (SELECT doc_id, CAST(s.pos AS BIGINT) AS pos, s.ng AS ng FROM g0),
         hot AS (SELECT ng FROM (SELECT DISTINCT ng, doc_id FROM g)
                 GROUP BY ng HAVING count(*) >= 2),
         flagged AS (SELECT g.doc_id, g.pos FROM g JOIN hot USING (ng)),
         isl AS (SELECT doc_id, pos,
                   pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
                 FROM flagged)
         SELECT doc_id, min(pos) AS start_token, max(pos) + 10 AS end_token,
           CAST(count(*) AS BIGINT) AS n_grams
         FROM isl GROUP BY doc_id, island""",

    "q_x_clip_repeated" ->
      """WITH tok AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
         FROM documents),
         g0 AS (SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(w) - 9, 0)),
             i -> struct_pack(pos := i - 1, ng := array_to_string(list_slice(w, i, i + 9), ' ')))) AS s
           FROM tok),
         g AS (SELECT doc_id, CAST(s.pos AS BIGINT) AS pos, s.ng AS ng FROM g0),
         hot AS (SELECT ng, min(doc_id) AS mind
                 FROM (SELECT DISTINCT ng, doc_id FROM g)
                 GROUP BY ng HAVING count(*) >= 2),
         clips AS (SELECT g.doc_id, g.pos FROM g JOIN hot USING (ng)
                   WHERE g.doc_id <> hot.mind),
         agg AS (SELECT doc_id, list(pos) AS ps FROM clips GROUP BY doc_id)
         SELECT t.doc_id,
           CASE WHEN t.w IS NULL THEN NULL ELSE
             coalesce(array_to_string(list_transform(list_filter(generate_series(1, len(w)),
               i -> len(list_filter(coalesce(a.ps, []::BIGINT[]),
                          p -> i - 1 >= p AND i - 1 < p + 10)) = 0),
               i -> w[i]), ' '), '') END AS text
         FROM tok t LEFT JOIN agg a USING (doc_id)""",

    "q_x_contamination_report" ->
      """WITH tok AS (SELECT doc_id, source,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
         FROM documents),
         g AS (SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(w) - 4, 0)),
             i -> array_to_string(list_slice(w, i, i + 4), ' '))) AS ng
         FROM tok),
         bg AS (SELECT DISTINCT ng FROM g WHERE doc_id % 37 = 0),
         hits AS (SELECT DISTINCT g.doc_id FROM g JOIN bg USING (ng))
         SELECT t.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(h.doc_id) AS BIGINT) AS n_contaminated,
           round(count(h.doc_id)::DOUBLE / count(*), 4) AS rate
         FROM tok t LEFT JOIN hits h ON t.doc_id = h.doc_id
         GROUP BY t.source""",

    "q_x_token_dist" ->
      """WITH tok AS (SELECT lang,
           CAST(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens
         FROM documents)
         SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens,
           round(avg(n_tokens), 4) AS avg_tokens,
           round(quantile_cont(n_tokens, 0.5), 4) AS p50_tokens,
           round(quantile_cont(n_tokens, 0.9), 4) AS p90_tokens
         FROM tok GROUP BY lang""",

    "q_x_pack_sequences" ->
      """WITH tok AS (SELECT doc_id,
           CAST(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens
         FROM documents),
         c AS (SELECT doc_id, n_tokens,
           CAST(sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                - n_tokens AS BIGINT) AS start_offset
         FROM tok WHERE n_tokens > 0)
         SELECT doc_id, n_tokens, start_offset,
           start_offset // 512 AS seq_first,
           (start_offset + n_tokens - 1) // 512 AS seq_last
         FROM c""",

    "q_x_pack_bins" ->
      """WITH RECURSIVE d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n,
           row_number() OVER (ORDER BY doc_id) AS rn
         FROM documents WHERE n_chars > 0),
         s AS (
           SELECT rn, doc_id, n, doc_id AS bin_id,
             CAST(0 AS BIGINT) AS off, n AS fill
           FROM d WHERE rn = 1
           UNION ALL
           SELECT d.rn, d.doc_id, d.n,
             CASE WHEN s.fill + d.n <= 1200 THEN s.bin_id ELSE d.doc_id END,
             CASE WHEN s.fill + d.n <= 1200 THEN s.fill ELSE CAST(0 AS BIGINT) END,
             CASE WHEN s.fill + d.n <= 1200 THEN s.fill + d.n ELSE d.n END
           FROM s JOIN d ON d.rn = s.rn + 1)
         SELECT doc_id, n AS n_units, bin_id, off AS offset_in_bin FROM s""",

    "q_x_redact_full" ->
      """SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
           'https?://[^\s]+', '<URL>', 'g'),
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
           '\+?\d[\d()\-\s]{6,}\d', '<PHONE>', 'g') AS redacted
         FROM documents""",

    "q_x_corpus_diff" ->
      """WITH o AS (SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
         FROM documents WHERE doc_id % 10 <> 0),
         n0 AS (SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 THEN text || ' drifted extra tokens'
                ELSE text END AS text
         FROM documents WHERE doc_id % 13 <> 0),
         n AS (SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
         FROM n0)
         SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.fp = n.fp THEN 'unchanged'
                ELSE 'changed' END AS status
         FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id""",

    "q_x_split_by_cluster" -> {
      val cums = Seq(0.8, 0.1, 0.1).scanLeft(0.0)(_ + _).tail
      val t1 = graft.functions.Sampling.hexThreshold(cums(0))
      val t2 = graft.functions.Sampling.hexThreshold(cums(1))
      s"""WITH RECURSIVE p AS (
           SELECT a.doc_id AS u, b.doc_id AS v
           FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
           WHERE a.doc_id % 25 = 0
           UNION ALL
           SELECT a.doc_id, b.doc_id
           FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
           WHERE (a.doc_id - 1) % 50 = 0
         ),
         edges AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
         reach AS (
           SELECT u AS id, v AS lab FROM edges
           UNION
           SELECT e.u, r.lab FROM edges e JOIN reach r ON r.id = e.v
         ),
         cl AS (SELECT id, least(MIN(lab), id) AS cluster_id FROM reach GROUP BY id),
         k AS (SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS skey
           FROM documents d LEFT JOIN cl ON cl.id = d.doc_id)
         SELECT doc_id, CASE
           WHEN substring(md5(CAST(skey AS VARCHAR)), 1, 13) < '$t1' THEN 'train'
           WHEN substring(md5(CAST(skey AS VARCHAR)), 1, 13) < '$t2' THEN 'val'
           ELSE 'test' END AS split
         FROM k"""
    },

    "q_x_bench_contamination" ->
      """WITH tok AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
         FROM documents),
         g AS (SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(w) - 4, 0)),
             i -> array_to_string(list_slice(w, i, i + 4), ' '))) AS ng
         FROM tok),
         bg AS (SELECT DISTINCT doc_id AS bench_id, ng FROM g WHERE doc_id % 37 = 0),
         cg AS (SELECT DISTINCT doc_id, ng FROM g WHERE doc_id % 37 <> 0),
         h AS (SELECT bench_id, count(DISTINCT cg.doc_id) AS n
           FROM bg JOIN cg USING (ng) GROUP BY bench_id)
         SELECT b.bench_id, CAST(COALESCE(h.n, 0) AS BIGINT) AS n_contaminating_docs
         FROM (SELECT DISTINCT doc_id AS bench_id FROM documents WHERE doc_id % 37 = 0) b
         LEFT JOIN h USING (bench_id)""",

    "q_x_token_drift" ->
      """WITH wa AS (SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
           FROM documents WHERE doc_id % 2 = 0),
         wb AS (SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
           FROM documents WHERE doc_id % 2 = 1),
         ca AS (SELECT w, count(*) AS na FROM wa WHERE w <> '' GROUP BY w),
         cb AS (SELECT w, count(*) AS nb FROM wb WHERE w <> '' GROUP BY w),
         j AS (SELECT COALESCE(ca.na, 0) AS na, COALESCE(cb.nb, 0) AS nb
           FROM ca FULL OUTER JOIN cb ON ca.w = cb.w),
         tot AS (SELECT CAST(sum(na) AS BIGINT) AS ta,
             CAST(sum(nb) AS BIGINT) AS tb,
             CAST(count(*) AS BIGINT) AS vu,
             CAST(sum(CASE WHEN na > 0 THEN 1 ELSE 0 END) AS BIGINT) AS va,
             CAST(sum(CASE WHEN nb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vb
           FROM j)
         SELECT ta AS n_tokens_a, tb AS n_tokens_b, va AS vocab_a,
           vb AS vocab_b, vu AS vocab_union,
           round(sum(
             0.5 * CASE WHEN na > 0 THEN (na * 1.0 / ta) *
               ln((na * 1.0 / ta) / ((na * 1.0 / ta + nb * 1.0 / tb) / 2))
               ELSE 0 END +
             0.5 * CASE WHEN nb > 0 THEN (nb * 1.0 / tb) *
               ln((nb * 1.0 / tb) / ((na * 1.0 / ta + nb * 1.0 / tb) / 2))
               ELSE 0 END), 4) AS js_divergence
         FROM j CROSS JOIN tot
         GROUP BY ta, tb, va, vb, vu""",

    "q_x_range_join" ->
      """WITH p AS (SELECT l_orderkey, l_linenumber,
           CAST(datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS pd
         FROM lineitem),
         iv AS (SELECT o_orderkey,
           CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS s0
         FROM orders WHERE o_orderkey % 1000 = 0)
         SELECT p.l_orderkey, p.l_linenumber, iv.o_orderkey, p.pd
         FROM p JOIN iv ON p.pd >= iv.s0 AND p.pd < iv.s0 + 7""",

    "q_x_rolling_agg" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
           CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
           o_totalprice
         FROM orders)
         SELECT o_orderkey, o_custkey, d,
           round(sum(o_totalprice) OVER w, 2) AS rolling_sum,
           count(o_totalprice) OVER w AS rolling_n
         FROM o
         WINDOW w AS (PARTITION BY o_custkey ORDER BY d
                      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)""",

    "q_x_interval_overlap" ->
      """WITH a AS (SELECT o_orderkey,
           CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS ls
         FROM orders WHERE o_orderkey % 100 = 0),
         b AS (SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           CAST(datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS rs
         FROM lineitem WHERE l_orderkey % 100 = 0)
         SELECT a.o_orderkey, b.l_orderkey, b.l_linenumber, a.ls, b.rs
         FROM a JOIN b ON a.ls < b.rs + 3 AND b.rs < a.ls + 7""",

    "q_x_bloom_semi" ->
      """SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
         WHERE EXISTS (SELECT 1 FROM part
                       WHERE p_partkey = l_partkey AND p_size >= 45)""",

    "q_x_bloom_anti" ->
      """SELECT o_orderkey, o_custkey FROM orders
         WHERE NOT EXISTS (SELECT 1 FROM customer
                           WHERE c_custkey = o_custkey AND c_acctbal > 9000)""",

    "q_x_zorder" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM lineitem
         WHERE l_partkey < 200 AND l_suppkey < 40""",

    // exact order statistics under the inclusive-rank rule: the
    // quantile at q is the smallest value whose 1-based rank reaches
    // ceil(q * n) — what an uncompacted KLL sketch returns verbatim
    "q_x_kll_quantiles_exact" ->
      """WITH r AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v,
             row_number() OVER (ORDER BY l_extendedprice) AS rn,
             count(*) OVER () AS n
           FROM lineitem WHERE l_orderkey < 8000)
         SELECT
           round((SELECT min(v) FROM r WHERE rn >= ceil(0.50 * n)), 2) AS p50,
           round((SELECT min(v) FROM r WHERE rn >= ceil(0.95 * n)), 2) AS p95,
           round((SELECT min(v) FROM r WHERE rn >= ceil(0.99 * n)), 2) AS p99""",

    "q_x_heavy_hitters" ->
      """SELECT l_suppkey AS k, count(*) AS cnt FROM lineitem
         WHERE l_suppkey IS NOT NULL
         GROUP BY 1
         HAVING count(*) > 0.0105 * (SELECT count(*) FROM lineitem)""",

    "q_x_hll_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_suppkey) AS distinct_supp
         FROM lineitem GROUP BY 1""",

    "q_x_chunk_docs" ->
      """WITH t AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
         FROM documents),
         n AS (SELECT doc_id, toks,
           1 + greatest(0, CAST(ceil((len(toks) - 64) / 48.0) AS BIGINT)) AS nc
         FROM t),
         c AS (SELECT doc_id, toks, unnest(range(0, nc)) AS chunk_id FROM n)
         SELECT doc_id, chunk_id,
           array_to_string(toks[chunk_id*48+1 : chunk_id*48+64], ' ') AS chunk_text,
           CAST(len(toks[chunk_id*48+1 : chunk_id*48+64]) AS BIGINT) AS chunk_tokens
         FROM c""",

    "q_x_chunk_sentences" ->
      """WITH RECURSIVE d AS (
           SELECT doc_id,
             string_split(regexp_replace(
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
               '([.!?]) ', '\1' || chr(1), 'g'), chr(1)) AS sents
           FROM documents),
         s AS (SELECT doc_id, unnest(range(1, len(sents) + 1)) AS sidx, sents FROM d),
         t AS (SELECT doc_id, sidx, sents[sidx] AS sent,
             CASE WHEN sents[sidx] = '' THEN 0
                  ELSE len(string_split(sents[sidx], ' ')) END AS n
           FROM s),
         r AS (
           SELECT doc_id, sidx, sent, n, 0 AS chunk, n AS cum FROM t WHERE sidx = 1
           UNION ALL
           SELECT t.doc_id, t.sidx, t.sent, t.n,
             CASE WHEN r.cum > 0 AND r.cum + t.n > 40 THEN r.chunk + 1 ELSE r.chunk END,
             CASE WHEN r.cum > 0 AND r.cum + t.n > 40 THEN t.n ELSE r.cum + t.n END
           FROM r JOIN t ON t.doc_id = r.doc_id AND t.sidx = r.sidx + 1)
         SELECT doc_id, CAST(chunk AS BIGINT) AS chunk_id,
           string_agg(sent, ' ' ORDER BY sidx) AS chunk_text,
           CAST(SUM(n) AS BIGINT) AS chunk_tokens
         FROM r GROUP BY doc_id, chunk""",

    "q_x_random_proj" ->
      """WITH r AS (
           SELECT j, list(CASE WHEN strpos('01234567',
                 substr(md5('rp:7:' || i || ':' || j), 1, 1)) > 0
               THEN 1.0 ELSE -1.0 END ORDER BY i) AS rv
           FROM generate_series(0, 63) g1(i), generate_series(0, 7) g2(j)
           GROUP BY j)
         SELECT e.vec_id, CAST(r.j AS BIGINT) AS dim,
           round(list_dot_product(CAST(e.embedding AS DOUBLE[]), r.rv)
                 / sqrt(8.0), 4) + 0.0 AS comp
         FROM embeddings e CROSS JOIN r""",

    "q_x_cov_matrix" ->
      """SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           round((SUM(CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[j+1] AS DOUBLE))
                  - SUM(CAST(embedding[i+1] AS DOUBLE))
                    * SUM(CAST(embedding[j+1] AS DOUBLE)) / COUNT(*)) / COUNT(*), 6)
             + 0.0 AS cov
         FROM embeddings,
              generate_series(0, 15) g1(i), generate_series(0, 15) g2(j)
         WHERE j >= i GROUP BY i, j""",

    "q_x_hard_negatives" ->
      """WITH q AS (SELECT vec_id, embedding, label FROM embeddings WHERE vec_id < 8),
         scored AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             c.label AS neighbor_label,
             CAST(list_cosine_similarity(c.embedding, q.embedding) AS DOUBLE) AS cos
           FROM embeddings c, q
           WHERE c.vec_id <> q.vec_id AND c.label <> q.label),
         r AS (SELECT query_id, cand_id, neighbor_label, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, cand_id) AS rank
           FROM scored)
         SELECT query_id, CAST(rank AS BIGINT) AS rank,
           cand_id AS neighbor_id, neighbor_label, round(cos, 4) + 0.0 AS cos
         FROM r WHERE rank <= 5""",

    "q_x_curriculum" ->
      """WITH t AS (SELECT doc_id,
           CAST(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS BIGINT) AS score
         FROM documents),
         r AS (SELECT doc_id, score,
             row_number() OVER (ORDER BY score, doc_id) AS rk,
             COUNT(*) OVER () AS n
           FROM t)
         SELECT doc_id, score, CAST(rk AS BIGINT) AS curriculum_rank,
           CAST(((rk - 1) * 8) // n AS BIGINT) AS band
         FROM r""",

    "q_x_embed_corr" ->
      """SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
           round(corr(CAST(embedding[i+1] AS DOUBLE),
                      CAST(embedding[j+1] AS DOUBLE)), 5) + 0.0 AS corr
         FROM embeddings,
              generate_series(0, 11) g1(i), generate_series(0, 11) g2(j)
         WHERE j >= i GROUP BY i, j""",

    "q_x_pca_trace" ->
      """WITH c AS (
           SELECT i, j,
             (SUM(CAST(embedding[i+1] AS DOUBLE) * CAST(embedding[j+1] AS DOUBLE))
              - SUM(CAST(embedding[i+1] AS DOUBLE))
                * SUM(CAST(embedding[j+1] AS DOUBLE)) / COUNT(*)) / COUNT(*) AS cov
           FROM embeddings,
                generate_series(0, 15) g1(i), generate_series(0, 15) g2(j)
           WHERE j >= i GROUP BY i, j)
         SELECT CAST(16 AS BIGINT) AS dims,
           round(SUM(CASE WHEN i = j THEN cov ELSE 0 END), 6) AS eigen_sum,
           round(SUM(CASE WHEN i = j THEN cov * cov ELSE 2 * cov * cov END), 6) AS eigen_sumsq
         FROM c""",

    // planted model: components = md5-sign/4 (unit norm), means = i/32,
    // whiten scale = power(2, c-1) in {0.5, 1, 2, 4} — all exact doubles
    "q_x_pca_project_planted" ->
      """WITH pc AS (
           SELECT c,
             list(CASE WHEN strpos('01234567',
                   substr(md5('rp:11:' || i || ':' || c), 1, 1)) > 0
                 THEN 0.25 ELSE -0.25 END ORDER BY i) AS pcv,
             list(i / 32.0 ORDER BY i) AS mv
           FROM generate_series(0, 15) g1(i), generate_series(0, 3) g2(c)
           GROUP BY c)
         SELECT e.vec_id, CAST(pc.c AS BIGINT) AS dim,
           round((list_dot_product(CAST(e.embedding[1:16] AS DOUBLE[]), pcv)
                  - list_dot_product(mv, pcv)) * power(2.0, pc.c - 1), 4)
             + 0.0 AS comp
         FROM embeddings e CROSS JOIN pc""",

    "q_x_script_profile" ->
      """WITH m AS (SELECT doc_id,
           replace(replace(text, 'table', 'таблица'), 'value', '值值值') AS t
         FROM documents),
         r AS (SELECT doc_id,
           greatest(len(regexp_replace(t, '\s', '', 'g')), 1) AS nz,
           len(regexp_replace(t, '[^A-Za-z]', '', 'g')) AS c_latin,
           len(regexp_replace(t, '[^\x{4E00}-\x{9FFF}]', '', 'g')) AS c_cjk,
           len(regexp_replace(t, '[^\x{0400}-\x{04FF}]', '', 'g')) AS c_cyr,
           len(regexp_replace(t, '[^\x{0600}-\x{06FF}]', '', 'g')) AS c_ar,
           len(regexp_replace(t, '[^\x{0900}-\x{097F}]', '', 'g')) AS c_dev,
           len(regexp_replace(t, '[^\x{AC00}-\x{D7AF}]', '', 'g')) AS c_han
         FROM m),
         x AS (SELECT doc_id,
           round(c_latin::DOUBLE / nz, 4) AS r_latin,
           round(c_cjk::DOUBLE / nz, 4) AS r_cjk,
           round(c_cyr::DOUBLE / nz, 4) AS r_cyrillic,
           round(c_ar::DOUBLE / nz, 4) AS r_arabic,
           round(c_dev::DOUBLE / nz, 4) AS r_devanagari,
           round(c_han::DOUBLE / nz, 4) AS r_hangul
         FROM r),
         y AS (SELECT *, list_sort([
             {'negr': -r_latin, 's': 'latin'},
             {'negr': -r_cjk, 's': 'cjk'},
             {'negr': -r_cyrillic, 's': 'cyrillic'},
             {'negr': -r_arabic, 's': 'arabic'},
             {'negr': -r_devanagari, 's': 'devanagari'},
             {'negr': -r_hangul, 's': 'hangul'}])[1] AS top
         FROM x)
         SELECT doc_id, r_latin, r_cjk, r_cyrillic, r_arabic,
           r_devanagari, r_hangul,
           CASE WHEN -(top.negr) >= 0.5 THEN top.s ELSE 'other' END
             AS dominant_script
         FROM y""",

    "q_x_fix_mojibake" ->
      """SELECT doc_id, replace(text, 'a', '\u00e1') AS fixed_text
         FROM documents""",

    "q_x_unicode_normalize" ->
      """SELECT doc_id,
         nfc_normalize(replace(text, 'a', 'a' || chr(769))) AS norm_text
         FROM documents""",

    "q_x_dedup_lines" ->
      """WITH m AS (SELECT doc_id,
           regexp_replace(text, '((\S+ ){9}\S+) ', '\1' || chr(10), 'g') AS t
         FROM documents),
         x AS (SELECT doc_id,
           unnest(list_transform(generate_series(1, len(string_split(t, chr(10)))),
             i -> {'pos': i, 'line': string_split(t, chr(10))[i]})) AS s
         FROM m),
         k AS (SELECT doc_id, s.pos AS pos, s.line AS line,
           row_number() OVER (PARTITION BY s.line ORDER BY doc_id, s.pos) AS rn
         FROM x),
         r AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
               FROM k WHERE rn = 1 OR trim(line) = '' GROUP BY doc_id)
         SELECT m.doc_id, coalesce(r.text, '') AS text
         FROM m LEFT JOIN r ON m.doc_id = r.doc_id""",

    "q_x_dedup_substrings" -> SubstrCutSql,

    // the persisted-index form is semantically IDENTICAL to the batch
    // operator (sequential id-ordered ingest == global first-occurrence
    // rule), so it shares the oracle verbatim
    "q_x_substr_index" -> SubstrCutSql,

    "q_x_substring_stats" ->
      """WITH d AS (SELECT doc_id, text,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
         FROM documents),
         g AS (SELECT doc_id, s.pos AS pos, md5(s.gram) AS gk
           FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 19),
               i -> {'pos': i - 1, 'gram': array_to_string(list_slice(toks, i, i + 19), ' ')})) AS s
             FROM d WHERE len(toks) >= 20)),
         m AS (SELECT doc_id, pos FROM (
             SELECT doc_id, pos, row_number() OVER (PARTITION BY gk ORDER BY doc_id, pos) AS rn
             FROM g) WHERE rn > 1),
         u AS (SELECT doc_id, s.pos AS pos, 1 AS kind, s.tok AS tok
           FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks)),
                   i -> {'pos': i - 1, 'tok': toks[i]})) AS s FROM d)
           UNION ALL
           SELECT doc_id, pos, 0 AS kind, NULL AS tok FROM m),
         c AS (SELECT doc_id, pos, kind,
             max(CASE WHEN kind = 0 THEN pos + 20 END)
               OVER (PARTITION BY doc_id ORDER BY pos, kind
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS covend
           FROM u),
         k AS (SELECT doc_id, count(*)::BIGINT AS kept
           FROM c WHERE kind = 1 AND (covend IS NULL OR pos >= covend) GROUP BY doc_id),
         ch AS (SELECT DISTINCT doc_id FROM m),
         cd AS (SELECT count(*)::BIGINT AS docs_changed,
                  sum(len(d.toks) - coalesce(k.kept, 0))::BIGINT AS tokens_removed
                FROM ch JOIN d ON ch.doc_id = d.doc_id
                LEFT JOIN k ON ch.doc_id = k.doc_id)
         SELECT (SELECT count(*)::BIGINT FROM d) AS docs, cd.docs_changed,
           (SELECT sum(len(toks))::BIGINT FROM d) AS tokens_total,
           coalesce(cd.tokens_removed, 0)::BIGINT AS tokens_removed,
           (SELECT count(*)::BIGINT FROM m) AS windows_marked
         FROM cd""",

    "q_x_jaccard_pairs" ->
      """WITH s AS (SELECT doc_id,
           list_distinct(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS st
         FROM documents WHERE doc_id % 50 = 0)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.st, b.st))::DOUBLE
                 / len(list_distinct(a.st || b.st)), 4) AS jaccard
         FROM s a, s b
         WHERE a.doc_id < b.doc_id
           AND len(list_intersect(a.st, b.st))::DOUBLE
               / len(list_distinct(a.st || b.st)) >= 0.4""",

    "q_x_split_leakage" ->
      """WITH s AS (SELECT doc_id,
           list_distinct(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS st
         FROM documents WHERE doc_id % 50 = 0),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
               FROM s a, s b
               WHERE a.doc_id < b.doc_id
                 AND len(list_intersect(a.st, b.st))::DOUBLE
                     / len(list_distinct(a.st || b.st)) >= 0.3),
         asg AS (SELECT doc_id,
                   CASE WHEN doc_id % 10 < 8 THEN 'train' ELSE 'test' END AS split
                 FROM documents)
         SELECT p.id_a, p.id_b, a1.split AS split_a, a2.split AS split_b
         FROM p
         JOIN asg a1 ON p.id_a = a1.doc_id
         JOIN asg a2 ON p.id_b = a2.doc_id
         WHERE a1.split <> a2.split""",

    "q_x_cc_oracle" ->
      """WITH RECURSIVE pairs AS (
           SELECT CAST(n_nationkey + 100 AS BIGINT) AS u,
                  CAST(n_regionkey AS BIGINT) AS v
           FROM nation
           UNION ALL
           SELECT CAST(c_custkey + 1000 AS BIGINT),
                  CAST(c_custkey + 1001 AS BIGINT)
           FROM customer WHERE c_custkey < 500
         ),
         edges AS (
           SELECT u, v FROM pairs WHERE u <> v
           UNION
           SELECT v, u FROM pairs WHERE u <> v
         ),
         reach AS (
           SELECT u AS id, v AS lab FROM edges
           UNION
           SELECT e.u, r.lab FROM edges e JOIN reach r ON r.id = e.v
         )
         SELECT id, least(MIN(lab), id) AS cluster_id
         FROM reach GROUP BY id ORDER BY id""",

    "q_x_ann_brute" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
         scored AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                      CAST(list_cosine_similarity(c.embedding, q.embedding) AS DOUBLE) AS cos
                    FROM embeddings c, q WHERE c.vec_id <> q.vec_id),
         r AS (SELECT query_id, cand_id, cos,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, cand_id) AS rank
               FROM scored)
         SELECT query_id, CAST(rank AS BIGINT) AS rank,
                cand_id AS neighbor_id, round(cos, 4) + 0.0 AS cos
         FROM r WHERE rank <= 5""",

    "q_x_sq8_recon" ->
      """WITH mm AS (
           SELECT i, min(CAST(embedding[i+1] AS DOUBLE)) AS mn,
                  max(CAST(embedding[i+1] AS DOUBLE)) AS mx
           FROM embeddings, generate_series(0, 63) g(i) GROUP BY i),
         x AS (
           SELECT e.vec_id, g.i, CAST(e.embedding[g.i+1] AS DOUBLE) AS x,
                  mm.mn, mm.mx
           FROM embeddings e CROSS JOIN generate_series(0, 63) g(i)
           JOIN mm ON mm.i = g.i),
         d AS (SELECT vec_id, x,
           CASE WHEN mx = mn THEN mn
                ELSE mn + round((x - mn)/(mx - mn)*255.0) * (mx - mn)/255.0
           END AS dq
           FROM x)
         SELECT vec_id, round(sqrt(SUM((x-dq)*(x-dq))), 6) AS l2_err
         FROM d GROUP BY vec_id""",

    "q_x_ann_sq8" ->
      """WITH mm AS (
           SELECT i, min(CAST(embedding[i+1] AS DOUBLE)) AS mn,
                  max(CAST(embedding[i+1] AS DOUBLE)) AS mx
           FROM embeddings, generate_series(0, 63) g(i) GROUP BY i),
         x AS (
           SELECT e.vec_id, g.i, CAST(e.embedding[g.i+1] AS DOUBLE) AS x,
                  mm.mn, mm.mx
           FROM embeddings e CROSS JOIN generate_series(0, 63) g(i)
           JOIN mm ON mm.i = g.i),
         dq AS (SELECT vec_id, list(CASE WHEN mx = mn THEN mn
             ELSE mn + round((x - mn)/(mx - mn)*255.0) * (mx - mn)/255.0
             END ORDER BY i) AS dvec
           FROM x GROUP BY vec_id),
         q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 8),
         scored AS (SELECT q.vec_id AS query_id, d.vec_id AS cand_id,
             list_cosine_similarity(d.dvec, q.qv) AS cos
           FROM dq d CROSS JOIN q WHERE d.vec_id <> q.vec_id),
         r AS (SELECT query_id, cand_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, cand_id) AS rank
           FROM scored)
         SELECT query_id, CAST(rank AS BIGINT) AS rank,
           cand_id AS neighbor_id, round(cos, 4) + 0.0 AS cos
         FROM r WHERE rank <= 5""",

    // identical dequantized-candidate oracle as q_x_ann_sq8: the
    // persisted compressed layout must reproduce it through the
    // parquet code round-trip
    "q_x_ann_vecidx_sq8_exhaustive" ->
      """WITH mm AS (
           SELECT i, min(CAST(embedding[i+1] AS DOUBLE)) AS mn,
                  max(CAST(embedding[i+1] AS DOUBLE)) AS mx
           FROM embeddings, generate_series(0, 63) g(i) GROUP BY i),
         x AS (
           SELECT e.vec_id, g.i, CAST(e.embedding[g.i+1] AS DOUBLE) AS x,
                  mm.mn, mm.mx
           FROM embeddings e CROSS JOIN generate_series(0, 63) g(i)
           JOIN mm ON mm.i = g.i),
         dq AS (SELECT vec_id, list(CASE WHEN mx = mn THEN mn
             ELSE mn + round((x - mn)/(mx - mn)*255.0) * (mx - mn)/255.0
             END ORDER BY i) AS dvec
           FROM x GROUP BY vec_id),
         q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 8),
         scored AS (SELECT q.vec_id AS query_id, d.vec_id AS cand_id,
             list_cosine_similarity(d.dvec, q.qv) AS cos
           FROM dq d CROSS JOIN q WHERE d.vec_id <> q.vec_id),
         r AS (SELECT query_id, cand_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, cand_id) AS rank
           FROM scored)
         SELECT query_id, CAST(rank AS BIGINT) AS rank,
           cand_id AS neighbor_id, round(cos, 4) + 0.0 AS cos
         FROM r WHERE rank <= 5""",

    "q_x_matryoshka" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
         fr AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(c.embedding, q.embedding) DESC,
                        c.vec_id) AS rk
           FROM embeddings c, q WHERE c.vec_id <> q.vec_id),
         f AS (SELECT query_id, cand_id FROM fr WHERE rk <= 10),
         tr AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(c.embedding[1:16],
                                               q.embedding[1:16]) DESC,
                        c.vec_id) AS rk
           FROM embeddings c, q WHERE c.vec_id <> q.vec_id),
         t AS (SELECT query_id, cand_id FROM tr WHERE rk <= 10)
         SELECT f.query_id, CAST(16 AS BIGINT) AS kept_dims,
           round(SUM(CASE WHEN t.cand_id IS NOT NULL THEN 1 ELSE 0 END)
                 / 10.0, 4) AS overlap
         FROM f LEFT JOIN t ON t.query_id = f.query_id
                           AND t.cand_id = f.cand_id
         GROUP BY f.query_id""",

    "q_x_mmr" ->
      """WITH q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 8),
         p0 AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             CAST(c.embedding AS DOUBLE[]) AS cvec,
             list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), q.qv) AS rel,
             row_number() OVER (PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                               q.qv) DESC, c.vec_id) AS rn
           FROM embeddings c CROSS JOIN q WHERE c.vec_id <> q.vec_id),
         p AS (SELECT * FROM p0 WHERE rn <= 10),
         s1 AS (SELECT query_id, cand_id, cvec, 0.7 * rel AS mmr,
             row_number() OVER (PARTITION BY query_id
               ORDER BY 0.7 * rel DESC, cand_id) AS rk
           FROM p),
         x1 AS (SELECT query_id, cand_id, cvec, mmr FROM s1 WHERE rk = 1),
         s2 AS (SELECT p.query_id, p.cand_id, p.cvec,
             0.7 * p.rel
               - (1.0 - 0.7) * list_cosine_similarity(p.cvec, x1.cvec) AS mmr,
             row_number() OVER (PARTITION BY p.query_id ORDER BY
               0.7 * p.rel
                 - (1.0 - 0.7) * list_cosine_similarity(p.cvec, x1.cvec) DESC,
               p.cand_id) AS rk
           FROM p JOIN x1 ON x1.query_id = p.query_id
                         AND p.cand_id <> x1.cand_id),
         x2 AS (SELECT query_id, cand_id, cvec, mmr FROM s2 WHERE rk = 1),
         s3 AS (SELECT p.query_id, p.cand_id,
             0.7 * p.rel - (1.0 - 0.7) * greatest(
               list_cosine_similarity(p.cvec, x1.cvec),
               list_cosine_similarity(p.cvec, x2.cvec)) AS mmr,
             row_number() OVER (PARTITION BY p.query_id ORDER BY
               0.7 * p.rel - (1.0 - 0.7) * greatest(
                 list_cosine_similarity(p.cvec, x1.cvec),
                 list_cosine_similarity(p.cvec, x2.cvec)) DESC,
               p.cand_id) AS rk
           FROM p JOIN x1 ON x1.query_id = p.query_id
                  JOIN x2 ON x2.query_id = p.query_id
           WHERE p.cand_id <> x1.cand_id AND p.cand_id <> x2.cand_id),
         x3 AS (SELECT query_id, cand_id, mmr FROM s3 WHERE rk = 1)
         SELECT query_id, CAST(1 AS BIGINT) AS rank, cand_id AS neighbor_id,
                round(mmr, 4) + 0.0 AS mmr FROM x1
         UNION ALL SELECT query_id, CAST(2 AS BIGINT), cand_id,
                round(mmr, 4) + 0.0 FROM x2
         UNION ALL SELECT query_id, CAST(3 AS BIGINT), cand_id,
                round(mmr, 4) + 0.0 FROM x3""",

    "q_x_proto_prune" ->
      """WITH c AS (SELECT vec_id AS cid, embedding AS cvec
           FROM embeddings ORDER BY vec_id LIMIT 8),
         a0 AS (SELECT e.vec_id AS id, c.cid,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.cvec AS DOUBLE[])) AS cos,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                             CAST(c.cvec AS DOUBLE[])) DESC, c.cid) AS rn
           FROM embeddings e CROSS JOIN c),
         a AS (SELECT id, cid AS cluster, cos AS proto_cos FROM a0 WHERE rn = 1),
         r AS (SELECT id, cluster, proto_cos,
             count(*) OVER (PARTITION BY cluster) AS n,
             row_number() OVER (PARTITION BY cluster
                                ORDER BY proto_cos DESC, id) AS rnk
           FROM a)
         SELECT id AS vec_id, cluster, round(proto_cos, 4) + 0.0 AS proto_cos,
                rnk > CAST(ceil(n * 0.2) AS BIGINT) AS keep
         FROM r""",

    "q_x_cluster_cap" ->
      """WITH c AS (SELECT vec_id AS cid, embedding AS cvec
           FROM embeddings ORDER BY vec_id LIMIT 8),
         a0 AS (SELECT e.vec_id AS id, c.cid,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                             CAST(c.cvec AS DOUBLE[])) DESC, c.cid) AS rn
           FROM embeddings e CROSS JOIN c),
         a AS (SELECT id, cid AS cluster FROM a0 WHERE rn = 1),
         r AS (SELECT id, cluster,
             row_number() OVER (PARTITION BY cluster
               ORDER BY md5(CAST(id AS VARCHAR)), id) AS rn
           FROM a)
         SELECT id AS vec_id, cluster, rn <= 10 AS keep FROM r""",

    "q_x_knn_graph" ->
      """WITH scored AS (SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
             list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS cos
           FROM embeddings a CROSS JOIN embeddings b
           WHERE a.vec_id <> b.vec_id
             AND a.vec_id < 500 AND b.vec_id < 500),
         r AS (SELECT src_id, dst_id, cos,
             row_number() OVER (PARTITION BY src_id
                                ORDER BY cos DESC, dst_id) AS rank
           FROM scored)
         SELECT src_id, CAST(rank AS BIGINT) AS rank, dst_id,
                round(cos, 4) + 0.0 AS cos
         FROM r WHERE rank <= 5""",

    "q_x_pagerank" ->
      """WITH scored AS (SELECT a.vec_id AS src_id, b.vec_id AS dst_id,
             list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS cos
           FROM embeddings a CROSS JOIN embeddings b
           WHERE a.vec_id <> b.vec_id
             AND a.vec_id < 500 AND b.vec_id < 500),
         kr AS (SELECT src_id, dst_id,
             row_number() OVER (PARTITION BY src_id
                                ORDER BY cos DESC, dst_id) AS rank
           FROM scored),
         knn AS (SELECT src_id AS src, dst_id AS dst FROM kr WHERE rank <= 5),
         nodes AS (SELECT DISTINCT node FROM
           (SELECT src AS node FROM knn UNION ALL SELECT dst FROM knn)),
         nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
         od AS (SELECT src, count(*)::DOUBLE AS outdeg FROM knn GROUP BY src),
         e AS (SELECT knn.src, knn.dst, od.outdeg FROM knn JOIN od USING (src)),
         r0 AS (SELECT nd.node, CAST(1.0 AS DOUBLE) / nn.n AS rank
                FROM nodes nd CROSS JOIN nn),
         c1 AS (SELECT e.dst AS node, sum(r0.rank / e.outdeg) AS s
                FROM e JOIN r0 ON r0.node = e.src GROUP BY e.dst),
         i1 AS (SELECT nd.node,
             (CAST(1.0 AS DOUBLE) - 0.85) / nn.n
               + 0.85 * coalesce(c1.s, CAST(0 AS DOUBLE)) AS rank
           FROM nodes nd CROSS JOIN nn LEFT JOIN c1 ON c1.node = nd.node),
         c2 AS (SELECT e.dst AS node, sum(i1.rank / e.outdeg) AS s
                FROM e JOIN i1 ON i1.node = e.src GROUP BY e.dst),
         i2 AS (SELECT nd.node,
             (CAST(1.0 AS DOUBLE) - 0.85) / nn.n
               + 0.85 * coalesce(c2.s, CAST(0 AS DOUBLE)) AS rank
           FROM nodes nd CROSS JOIN nn LEFT JOIN c2 ON c2.node = nd.node),
         c3 AS (SELECT e.dst AS node, sum(i2.rank / e.outdeg) AS s
                FROM e JOIN i2 ON i2.node = e.src GROUP BY e.dst),
         i3 AS (SELECT nd.node,
             (CAST(1.0 AS DOUBLE) - 0.85) / nn.n
               + 0.85 * coalesce(c3.s, CAST(0 AS DOUBLE)) AS rank
           FROM nodes nd CROSS JOIN nn LEFT JOIN c3 ON c3.node = nd.node)
         SELECT node, round(rank, 6) AS pagerank FROM i3""",

    "q_x_resample" ->
      """WITH e AS (SELECT event_type,
           CAST(to_timestamp(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) * 3600)
                AS TIMESTAMP) AS bucket,
           value
         FROM events),
         a AS (SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n_events,
                 round(sum(value), 2) AS sum_value
               FROM e GROUP BY 1, 2),
         b AS (SELECT event_type, min(bucket) AS b0, max(bucket) AS b1 FROM a GROUP BY 1),
         g AS (SELECT event_type, b0 + INTERVAL 1 HOUR * i AS bucket
               FROM b, unnest(range(0,
                 CAST((epoch(b1) - epoch(b0)) / 3600 AS BIGINT) + 1)) AS t(i)),
         j AS (SELECT g.event_type, g.bucket,
                 coalesce(a.n_events, 0) AS n_events, a.sum_value
               FROM g LEFT JOIN a USING (event_type, bucket))
         SELECT event_type, bucket, n_events, sum_value,
           last_value(sum_value IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
         FROM j""",

    "q_x_funnel" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
         u AS (SELECT DISTINCT user_id FROM e),
         t1 AS (SELECT user_id, min(ts) AS ts1 FROM e
                WHERE event_type = 'signup' GROUP BY 1),
         t2 AS (SELECT e.user_id, min(e.ts) AS ts2 FROM e JOIN t1 USING (user_id)
                WHERE e.event_type = 'view' AND e.ts > t1.ts1 GROUP BY 1),
         t3 AS (SELECT e.user_id, min(e.ts) AS ts3 FROM e JOIN t2 USING (user_id)
                WHERE e.event_type = 'click' AND e.ts > t2.ts2 GROUP BY 1),
         t4 AS (SELECT e.user_id, min(e.ts) AS ts4 FROM e JOIN t3 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts > t3.ts3 GROUP BY 1)
         SELECT u.user_id,
           CAST(CASE WHEN ts4 IS NOT NULL THEN 4 WHEN ts3 IS NOT NULL THEN 3
                     WHEN ts2 IS NOT NULL THEN 2 WHEN ts1 IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS steps_completed
         FROM u LEFT JOIN t1 USING (user_id) LEFT JOIN t2 USING (user_id)
           LEFT JOIN t3 USING (user_id) LEFT JOIN t4 USING (user_id)""",

    "q_x_cohort_retention" ->
      """WITH e AS (SELECT user_id,
           date_trunc('week', CAST(ts AS TIMESTAMP)) AS week FROM events),
         c AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1),
         a AS (SELECT DISTINCT user_id, week FROM e)
         SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', cohort_week, week) / 7 AS BIGINT) AS week_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
         FROM a JOIN c USING (user_id) GROUP BY 1, 2""",

    "q_a9_grouped_percentiles" ->
      """SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
           round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price
         FROM lineitem GROUP BY 1""",

    "q_x_record_linkage" ->
      """WITH p AS (SELECT p_partkey, p_brand, p_size, p_name FROM part),
         d AS (SELECT a.p_partkey AS left_id, b.p_partkey AS right_id,
                 CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
               FROM p a JOIN p b USING (p_brand, p_size)
               WHERE a.p_partkey <> b.p_partkey),
         r AS (SELECT *, row_number() OVER (PARTITION BY left_id
                 ORDER BY dist, right_id) AS rank
               FROM d WHERE dist <= 5)
         SELECT left_id, right_id, dist, CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= 1""",

    "q_x_transitions" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
           CAST(ts AS TIMESTAMP) AS ts FROM events),
         l AS (SELECT event_type AS from_type,
                 lead(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS to_type
               FROM e),
         c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
               FROM l WHERE to_type IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, n,
           round(n / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 4) AS p
         FROM c""",

    "q_x_top_paths" ->
      """WITH r AS (SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
             ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
         FROM events),
         p AS (SELECT user_id,
                 string_agg(event_type, ' > ' ORDER BY rn) AS path,
                 count(*) AS len
               FROM r WHERE rn <= 3 GROUP BY user_id)
         SELECT path, CAST(count(*) AS BIGINT) AS n_keys
         FROM p WHERE len = 3
         GROUP BY path ORDER BY n_keys DESC, path LIMIT 10""",

    "q_x_corr_matrix" ->
      """SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
           round(corr(l_quantity, l_extendedprice), 4) + 0.0 AS r FROM lineitem
         UNION ALL SELECT 'l_quantity', 'l_discount',
           round(corr(l_quantity, l_discount), 4) + 0.0 FROM lineitem
         UNION ALL SELECT 'l_quantity', 'l_tax',
           round(corr(l_quantity, l_tax), 4) + 0.0 FROM lineitem
         UNION ALL SELECT 'l_extendedprice', 'l_discount',
           round(corr(l_extendedprice, l_discount), 4) + 0.0 FROM lineitem
         UNION ALL SELECT 'l_extendedprice', 'l_tax',
           round(corr(l_extendedprice, l_tax), 4) + 0.0 FROM lineitem
         UNION ALL SELECT 'l_discount', 'l_tax',
           round(corr(l_discount, l_tax), 4) + 0.0 FROM lineitem""",

    "q_x_trend" ->
      """WITH e AS (SELECT event_type, value,
           CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE) / 86400000000.0
             - 20454.0 AS x
         FROM events)
         SELECT event_type,
           round(regr_slope(value, x), 4) + 0.0 AS slope,
           round(regr_intercept(value, x), 4) + 0.0 AS intercept,
           round(regr_r2(value, x), 4) + 0.0 AS r2,
           CAST(regr_count(value, x) AS BIGINT) AS n
         FROM e GROUP BY 1""",

    "q_x_corpus_overlap" ->
      """WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
         i AS (SELECT count(*) AS n FROM (SELECT * FROM a INTERSECT SELECT * FROM b)),
         u AS (SELECT count(*) AS n FROM (SELECT * FROM a UNION SELECT * FROM b))
         SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_a,
           (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_b,
           (SELECT CAST(n AS BIGINT) FROM i) AS n_intersect,
           (SELECT CAST(n AS BIGINT) FROM u) AS n_union,
           (SELECT CAST(i.n AS DOUBLE) / CAST(u.n AS DOUBLE) FROM i, u) AS jaccard""",

    "q_x_top_values" ->
      """WITH m AS (
           SELECT 'l_returnflag' AS col_name, CAST(l_returnflag AS VARCHAR) AS value
           FROM lineitem WHERE l_returnflag IS NOT NULL
           UNION ALL
           SELECT 'l_linestatus', CAST(l_linestatus AS VARCHAR)
           FROM lineitem WHERE l_linestatus IS NOT NULL
           UNION ALL
           SELECT 'l_linenumber', CAST(l_linenumber AS VARCHAR)
           FROM lineitem WHERE l_linenumber IS NOT NULL),
         c AS (SELECT col_name, value, CAST(count(*) AS BIGINT) AS n
               FROM m GROUP BY 1, 2),
         r AS (SELECT col_name, value, n,
             row_number() OVER (PARTITION BY col_name
                                ORDER BY n DESC, value) AS rank
           FROM c)
         SELECT col_name, value, n, CAST(rank AS BIGINT) AS rank
         FROM r WHERE rank <= 5""",

    "q_x_containment" ->
      """WITH s AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
         FROM documents WHERE doc_id < 500),
         sh AS (SELECT doc_id,
           list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk)-1)]) AS ss
         FROM s WHERE len(tk) >= 3),
         p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.ss, b.ss))::DOUBLE AS inter,
             len(a.ss)::DOUBLE AS la, len(b.ss)::DOUBLE AS lb
           FROM sh a, sh b WHERE a.doc_id < b.doc_id)
         SELECT id_a, id_b,
           round(inter / la, 4) AS cont_a_in_b,
           round(inter / lb, 4) AS cont_b_in_a
         FROM p WHERE greatest(inter / la, inter / lb) >= 0.8""",

    "q_x_dedup_keep_best" ->
      """WITH RECURSIVE s AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
         FROM documents),
         sh AS (SELECT doc_id,
           list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk)-1)]) AS ss
         FROM s WHERE len(tk) >= 3),
         p AS (SELECT a.doc_id AS u, b.doc_id AS v
               FROM sh a, sh b
               WHERE a.doc_id < b.doc_id
                 AND len(list_intersect(a.ss, b.ss))::DOUBLE
                     / len(list_distinct(a.ss || b.ss)) >= 0.5),
         edges AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
         reach AS (
           SELECT u AS id, v AS lab FROM edges
           UNION
           SELECT e.u, r.lab FROM edges e JOIN reach r ON r.id = e.v
         ),
         c AS (SELECT id, least(MIN(lab), id) AS cluster_id
               FROM reach GROUP BY id),
         j AS (SELECT c.id, c.cluster_id, d.n_chars
               FROM c JOIN documents d ON d.doc_id = c.id),
         rr AS (SELECT id, cluster_id,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY n_chars DESC, id) AS rn
           FROM j)
         SELECT id, cluster_id, rn = 1 AS keep FROM rr ORDER BY id""",

    "q_x_hybrid_rrf" ->
      """WITH q(query_id, term) AS (VALUES
           ('qa', 'hash'), ('qa', 'join'), ('qa', 'merge'),
           ('qb', 'stream'), ('qb', 'window'), ('qb', 'batch'),
           ('qc', 'vector'), ('qc', 'column'), ('qc', 'scan')),
         base AS (SELECT doc_id AS id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
         FROM documents),
         d AS (SELECT id, len(toks)::DOUBLE AS dl, unnest(toks) AS term FROM base),
         tf AS (SELECT id, term, dl, count(*)::DOUBLE AS tf
                FROM d WHERE term IN (SELECT DISTINCT term FROM q)
                GROUP BY id, term, dl),
         stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(len(toks)::DOUBLE) AS avgdl
                   FROM base),
         dfreq AS (SELECT term, count(DISTINCT id)::DOUBLE AS df FROM tf GROUP BY term),
         bscored AS (SELECT q.query_id, tf.id,
             round(sum(ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
                       * tf.tf * 2.2
                       / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / s.avgdl))), 4) AS score
           FROM tf JOIN q ON tf.term = q.term
           JOIN dfreq f ON f.term = tf.term, stats s
           GROUP BY q.query_id, tf.id),
         bm AS (SELECT query_id, id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, id) AS rank
           FROM bscored QUALIFY rank <= 10),
         vq AS (SELECT vec_id AS qid, embedding FROM embeddings WHERE vec_id < 3),
         vs AS (SELECT vq.qid, c.vec_id AS id,
             list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), CAST(vq.embedding AS DOUBLE[])) AS cos
           FROM embeddings c CROSS JOIN vq WHERE c.vec_id <> vq.qid),
         ann AS (SELECT CASE qid WHEN 0 THEN 'qa' WHEN 1 THEN 'qb'
                        ELSE 'qc' END AS query_id, id,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos DESC, id) AS rank
           FROM vs QUALIFY rank <= 10),
         allr AS (SELECT query_id, id,
             CAST(1.0 AS DOUBLE) / (60 + rank) AS part FROM bm
           UNION ALL SELECT query_id, id,
             CAST(1.0 AS DOUBLE) / (60 + rank) FROM ann),
         f AS (SELECT query_id, id, sum(part) AS rrf
               FROM allr GROUP BY query_id, id),
         fr AS (SELECT query_id, id, rrf,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY rrf DESC, id) AS rank
           FROM f)
         SELECT query_id, CAST(rank AS BIGINT) AS rank, id AS doc_id,
                round(rrf, 4) AS rrf_score
         FROM fr WHERE rank <= 10""",

    "q_x_rolling_fingerprint" ->
      """WITH RECURSIVE s AS (
           SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
           FROM documents
         ),
         r AS (
           SELECT doc_id, t, 1 AS i, CAST(0 AS HUGEINT) AS h,
                  CAST(1 AS HUGEINT) AS pow
           FROM s
           UNION ALL
           SELECT doc_id, t, i + 1,
                  (h + unicode(substr(t, i, 1)) * pow)
                    % CAST('18446744073709551616' AS HUGEINT),
                  (pow * 1000003) % CAST('18446744073709551616' AS HUGEINT)
           FROM r WHERE i <= len(t)
         )
         SELECT doc_id,
           CAST(CASE WHEN h >= CAST('9223372036854775808' AS HUGEINT)
                     THEN h - CAST('18446744073709551616' AS HUGEINT)
                     ELSE h END AS BIGINT) AS fp
         FROM r WHERE i = len(t) + 1""",

    "q_x_dedup_minhash_identical" ->
      """WITH n AS (SELECT GREATEST(count(*) // 5, 1) AS g FROM documents),
         d AS (SELECT doc_id, doc_id % (SELECT g FROM n) AS grp FROM documents)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                CAST(1.0 AS DOUBLE) AS jaccard
         FROM d a JOIN d b ON a.grp = b.grp AND a.doc_id < b.doc_id""",

    "q_x_simhash_dedup_identical" ->
      """WITH n AS (SELECT GREATEST(count(*) // 5, 1) AS g FROM documents),
         d AS (SELECT doc_id, doc_id % (SELECT g FROM n) AS grp FROM documents)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                CAST(0 AS INT) AS hamming
         FROM d a JOIN d b ON a.grp = b.grp AND a.doc_id < b.doc_id""",

    // texts differ (2 vs 5 period repeats) but distinct shingle sets are
    // equal, so every intra-group pair is found with containment 1.0
    // both ways — deterministic LSH recall by construction
    "q_x_containment_lsh_identical" ->
      """WITH n AS (SELECT GREATEST(count(*) // 5, 1) AS g FROM documents),
         d AS (SELECT doc_id, doc_id % (SELECT g FROM n) AS grp FROM documents)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                CAST(1.0 AS DOUBLE) AS cont_a_in_b,
                CAST(1.0 AS DOUBLE) AS cont_b_in_a
         FROM d a JOIN d b ON a.grp = b.grp AND a.doc_id < b.doc_id""",

    // XXH64(seed 42) re-implemented from the public spec in HUGEINT
    // mod-2^64 arithmetic (mulmod splits the left operand at 2^32 so no
    // intermediate exceeds 2^97; rotations are a shift-pair), then the
    // 64-bit majority vote — fully independent of the JVM kernel
    "q_x_quality_margin_fixed" ->
      (xxh64TokenOracleCommon + """
         SELECT doc_id,
           avg(CASE h % 8 WHEN 0 THEN 0.25 WHEN 1 THEN -0.5
               WHEN 2 THEN 0.125 WHEN 3 THEN 0.75 WHEN 4 THEN -0.25
               WHEN 5 THEN 0.0625 WHEN 6 THEN -0.125 ELSE 0.5 END)
             + 0.0625 AS margin
         FROM fin GROUP BY doc_id"""),

    "q_x_simhash_sig" ->
      (xxh64TokenOracleCommon + """,
         grp AS (SELECT doc_id, list(h) AS hs FROM fin GROUP BY doc_id)
         SELECT doc_id,
           CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
                     THEN u - 18446744073709551616::HUGEINT ELSE u END AS BIGINT) AS sig
         FROM (SELECT doc_id,
             list_sum([CASE WHEN 2 * len(list_filter(hs,
                    h -> (h // power(2::HUGEINT, b)::HUGEINT) % 2 = 1)) > len(hs)
                  THEN power(2::HUGEINT, b)::HUGEINT ELSE 0::HUGEINT END
               for b in generate_series(0, 63)])::HUGEINT AS u FROM grp) z"""),

    // brute-force exact 3-shingle Jaccard over all pairs: ground truth for
    // the LSH path (the exact-verify step makes the Spark output equal
    // this set whenever banding recall is total — see the query comment)
    "q_x_dedup_minhash" ->
      """WITH s AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
         FROM documents),
         sh AS (SELECT doc_id,
           list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk)-1)]) AS ss
         FROM s WHERE len(tk) >= 3)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.ss, b.ss))::DOUBLE
                 / len(list_distinct(a.ss || b.ss)), 4) AS jaccard
         FROM sh a, sh b
         WHERE a.doc_id < b.doc_id
           AND len(list_intersect(a.ss, b.ss))::DOUBLE
               / len(list_distinct(a.ss || b.ss)) >= 0.5""",

    // brute-force exact Jaccard BETWEEN the two parity halves
    "q_x_dedup_cross" ->
      """WITH s AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
         FROM documents),
         sh AS (SELECT doc_id,
           list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk)-1)]) AS ss
         FROM s WHERE len(tk) >= 3)
         SELECT a.doc_id AS id_l, b.doc_id AS id_r,
           round(len(list_intersect(a.ss, b.ss))::DOUBLE
                 / len(list_distinct(a.ss || b.ss)), 4) AS jaccard
         FROM sh a, sh b
         WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
           AND len(list_intersect(a.ss, b.ss))::DOUBLE
               / len(list_distinct(a.ss || b.ss)) >= 0.5""",

    // exact fingerprint matches of the benchmark plus brute-force
    // cross-side near-dups of it, both removed
    "q_x_decontaminate_neardup" ->
      """WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),
         ek AS (SELECT d.doc_id, d.text FROM documents d
                WHERE md5(trim(regexp_replace(lower(d.text), '\s+', ' ', 'g'))) NOT IN
                  (SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) FROM bench)),
         esh AS (SELECT doc_id,
             list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk)-1)]) AS ss
           FROM (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk FROM ek)
           WHERE len(tk) >= 3),
         bsh AS (SELECT doc_id,
             list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk)-1)]) AS ss
           FROM (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk FROM bench)
           WHERE len(tk) >= 3),
         hits AS (SELECT DISTINCT a.doc_id FROM esh a, bsh b
                  WHERE len(list_intersect(a.ss, b.ss))::DOUBLE
                        / len(list_distinct(a.ss || b.ss)) >= 0.5)
         SELECT doc_id FROM ek
         WHERE doc_id NOT IN (SELECT doc_id FROM hits)""",

    // same pair graph closed with a recursive CTE -> per-doc cluster and
    // keep/drop verdict (min id per component is kept)
    "q_x_dedup_clusters" ->
      """WITH RECURSIVE s AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
         FROM documents),
         sh AS (SELECT doc_id,
           list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk)-1)]) AS ss
         FROM s WHERE len(tk) >= 3),
         p AS (SELECT a.doc_id AS u, b.doc_id AS v
               FROM sh a, sh b
               WHERE a.doc_id < b.doc_id
                 AND len(list_intersect(a.ss, b.ss))::DOUBLE
                     / len(list_distinct(a.ss || b.ss)) >= 0.5),
         edges AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
         reach AS (
           SELECT u AS id, v AS lab FROM edges
           UNION
           SELECT e.u, r.lab FROM edges e JOIN reach r ON r.id = e.v
         ),
         c AS (SELECT id, least(MIN(lab), id) AS cluster_id
               FROM reach GROUP BY id)
         SELECT id, cluster_id, id = cluster_id AS keep
         FROM c ORDER BY id""",

    // the WHOLE preprocessing composition recomputed in SQL: language and
    // quality flags on raw text, redaction, md5-fingerprint exact collapse
    // on redacted text, near-dup components via brute-force Jaccard +
    // recursive CTE, then decontamination against the REDACTED benchmark
    // fingerprints — stage ordering included
    "q_x_corpus_pipeline" ->
      """WITH RECURSIVE base AS (
           SELECT doc_id AS id, text,
             string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
           FROM documents
         ),
         sc AS (
           SELECT id, text, toks,
             len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','that','it','for')))::DOUBLE / greatest(len(toks),1) AS s_en,
             len(list_filter(toks, x -> x IN ('le','la','les','de','et','un','une','que','est','pour')))::DOUBLE / greatest(len(toks),1) AS s_fr,
             len(list_filter(toks, x -> x IN ('el','la','los','de','y','un','una','que','es','para')))::DOUBLE / greatest(len(toks),1) AS s_es,
             len(list_filter(toks, x -> x IN ('der','die','das','und','ein','eine','ist','zu','den','von')))::DOUBLE / greatest(len(toks),1) AS s_de,
             len(list_filter(toks, x -> x IN ('de5','shi4','le5','zai4','he2','you3','wo3','ta1','zhe4','bu4')))::DOUBLE / greatest(len(toks),1) AS s_zh
           FROM base
         ),
         flags AS (
           SELECT id, text,
             (s_en >= s_fr AND s_en >= s_es AND s_en >= s_de AND s_en >= s_zh AND s_en > 0) AS lang_ok,
             (CAST(len(toks) AS BIGINT) >= 5
              AND round((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))::DOUBLE / greatest(length(text),1), 4) <= 0.3
              AND round(1.0 - len(list_distinct(toks))::DOUBLE / greatest(len(toks),1), 4) <= 0.6) AS qual_ok
           FROM sc
         ),
         red AS (
           SELECT id,
             regexp_replace(regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g'),
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS rtext
           FROM flags WHERE lang_ok AND qual_ok
         ),
         rfp AS (SELECT id, rtext,
                   md5(trim(regexp_replace(lower(rtext), '\s+', ' ', 'g'))) AS f
                 FROM red),
         reps AS (SELECT f, min(id) AS id FROM rfp GROUP BY f),
         rept AS (SELECT r.id, rfp.rtext FROM reps r JOIN rfp ON rfp.id = r.id),
         rsh AS (SELECT id,
           list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk)-1)]) AS ss
           FROM (SELECT id, string_split(trim(regexp_replace(lower(rtext), '\s+', ' ', 'g')), ' ') AS tk FROM rept)
           WHERE len(tk) >= 3),
         p AS (SELECT a.id AS u, b.id AS v FROM rsh a, rsh b
               WHERE a.id < b.id
                 AND len(list_intersect(a.ss, b.ss))::DOUBLE
                     / len(list_distinct(a.ss || b.ss)) >= 0.5),
         edges AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
         reach AS (SELECT u AS id, v AS lab FROM edges
                   UNION
                   SELECT e.u, r.lab FROM edges e JOIN reach r ON r.id = e.v),
         dropped AS (SELECT id FROM (SELECT id, least(MIN(lab), id) AS cid
                                     FROM reach GROUP BY id) t
                     WHERE id <> cid),
         nearkept AS (SELECT r.id, rfp.f FROM reps r JOIN rfp ON rfp.id = r.id
                      WHERE r.id NOT IN (SELECT id FROM dropped)),
         bench AS (SELECT DISTINCT md5(trim(regexp_replace(lower(
             regexp_replace(regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g'),
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g')
           ), '\s+', ' ', 'g'))) AS f
           FROM documents WHERE doc_id % 97 = 0)
         SELECT 'input' AS stage, (SELECT count(*) FROM base) AS n_rows
         UNION ALL SELECT 'language', (SELECT count(*) FROM flags WHERE lang_ok)
         UNION ALL SELECT 'quality', (SELECT count(*) FROM flags WHERE lang_ok AND qual_ok)
         UNION ALL SELECT 'exact_dedup', (SELECT count(*) FROM reps)
         UNION ALL SELECT 'near_dedup', (SELECT count(*) FROM nearkept)
         UNION ALL SELECT 'decontaminate',
           (SELECT count(*) FROM nearkept WHERE f NOT IN (SELECT f FROM bench))""",

    // the FULL v2 composition (NFC -> language -> quality -> Gopher ->
    // redact -> C4 line dedup -> exact collapse -> near-dup CC ->
    // fingerprint decontamination -> 5-gram decontamination) recomputed
    // independently: each stage reuses its standalone oracle's SQL
    // fragment, chained in pipeline order on the same intermediate text.
    // LSH recall is exact at this scale (the v1 oracle already proves
    // banded MinHash == exhaustive Jaccard >= 0.5 on this corpus), so
    // near-dup pairs are the exhaustive J >= 0.5 set.
    "q_x_corpus_pipeline_v2" ->
      """WITH RECURSIVE nrm AS (
           SELECT doc_id AS id, nfc_normalize(text) AS text FROM documents
         ),
         base AS (
           SELECT id, text,
             string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
           FROM nrm
         ),
         sc AS (
           SELECT id, text, toks,
             len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','that','it','for')))::DOUBLE / greatest(len(toks),1) AS s_en,
             len(list_filter(toks, x -> x IN ('le','la','les','de','et','un','une','que','est','pour')))::DOUBLE / greatest(len(toks),1) AS s_fr,
             len(list_filter(toks, x -> x IN ('el','la','los','de','y','un','una','que','es','para')))::DOUBLE / greatest(len(toks),1) AS s_es,
             len(list_filter(toks, x -> x IN ('der','die','das','und','ein','eine','ist','zu','den','von')))::DOUBLE / greatest(len(toks),1) AS s_de,
             len(list_filter(toks, x -> x IN ('de5','shi4','le5','zai4','he2','you3','wo3','ta1','zhe4','bu4')))::DOUBLE / greatest(len(toks),1) AS s_zh
           FROM base
         ),
         flags AS (
           SELECT id, text,
             (s_en >= s_fr AND s_en >= s_es AND s_en >= s_de AND s_en >= s_zh AND s_en > 0) AS lang_ok,
             (CAST(len(toks) AS BIGINT) >= 5
              AND round((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))::DOUBLE / greatest(length(text),1), 4) <= 0.3
              AND round(1.0 - len(list_distinct(toks))::DOUBLE / greatest(len(toks),1), 4) <= 0.6) AS qual_ok,
             (CAST(len(toks) AS BIGINT) >= 10 AND CAST(len(toks) AS BIGINT) <= 100000
              AND round(CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE) / greatest(len(toks), 1), 4) >= 3.0
              AND round(CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE) / greatest(len(toks), 1), 4) <= 10.0
              AND round(CAST(len(list_filter(toks, t -> contains(t, '#') OR contains(t, '...') OR contains(t, chr(8230)))) AS DOUBLE) / greatest(len(toks), 1), 4) <= 0.1
              AND round(CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE) / greatest(len(toks), 1), 4) >= 0.8
              AND CAST(len(list_intersect(list_distinct(toks),
                ['the','be','to','of','and','that','have','with'])) AS BIGINT) >= 1) AS gopher_ok
           FROM sc
         ),
         red AS (
           SELECT id,
             regexp_replace(regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g'),
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS rtext
           FROM flags WHERE lang_ok AND qual_ok AND gopher_ok
         ),
         lx AS (SELECT id,
           unnest(list_transform(generate_series(1, len(string_split(rtext, chr(10)))),
             i -> {'pos': i, 'line': string_split(rtext, chr(10))[i]})) AS s
           FROM red),
         lk AS (SELECT id, s.pos AS pos, s.line AS line,
           row_number() OVER (PARTITION BY s.line ORDER BY id, s.pos) AS rn
           FROM lx),
         lr AS (SELECT id, string_agg(line, chr(10) ORDER BY pos) AS rtext
                FROM lk WHERE rn = 1 OR trim(line) = '' GROUP BY id),
         ldk AS (SELECT red.id, coalesce(lr.rtext, '') AS rtext
                 FROM red LEFT JOIN lr ON red.id = lr.id
                 WHERE length(trim(coalesce(lr.rtext, ''))) > 0),
         rfp AS (SELECT id, rtext,
                   md5(trim(regexp_replace(lower(rtext), '\s+', ' ', 'g'))) AS f
                 FROM ldk),
         reps AS (SELECT f, min(id) AS id FROM rfp GROUP BY f),
         rsh AS (SELECT id,
           list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk)-1)]) AS ss
           FROM (SELECT r.id, string_split(trim(regexp_replace(lower(rfp.rtext), '\s+', ' ', 'g')), ' ') AS tk
                 FROM reps r JOIN rfp ON rfp.id = r.id)
           WHERE len(tk) >= 3),
         p AS (SELECT a.id AS u, b.id AS v FROM rsh a, rsh b
               WHERE a.id < b.id
                 AND len(list_intersect(a.ss, b.ss))::DOUBLE
                     / len(list_distinct(a.ss || b.ss)) >= 0.5),
         edges AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
         reach AS (SELECT u AS id, v AS lab FROM edges
                   UNION
                   SELECT e.u, r.lab FROM edges e JOIN reach r ON r.id = e.v),
         dropped AS (SELECT id FROM (SELECT id, least(MIN(lab), id) AS cid
                                     FROM reach GROUP BY id) t
                     WHERE id <> cid),
         nearkept AS (SELECT r.id, rfp.f, rfp.rtext
                      FROM reps r JOIN rfp ON rfp.id = r.id
                      WHERE r.id NOT IN (SELECT id FROM dropped)),
         bench AS (SELECT
             regexp_replace(regexp_replace(nfc_normalize(text), 'https?://[^\s]+', '<URL>', 'g'),
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS btext
           FROM documents WHERE doc_id % 97 = 0),
         bfp AS (SELECT DISTINCT md5(trim(regexp_replace(lower(btext), '\s+', ' ', 'g'))) AS f
                 FROM bench),
         dec AS (SELECT id, rtext FROM nearkept WHERE f NOT IN (SELECT f FROM bfp)),
         bg AS (SELECT DISTINCT
             unnest(list_transform(generate_series(1, greatest(len(w) - 4, 0)),
               i -> array_to_string(list_slice(w, i, i + 4), ' '))) AS ng
           FROM (SELECT string_split(trim(regexp_replace(lower(btext), '\s+', ' ', 'g')), ' ') AS w
                 FROM bench)),
         dg AS (SELECT id,
             unnest(list_transform(generate_series(1, greatest(len(w) - 4, 0)),
               i -> array_to_string(list_slice(w, i, i + 4), ' '))) AS ng
           FROM (SELECT id, string_split(trim(regexp_replace(lower(rtext), '\s+', ' ', 'g')), ' ') AS w
                 FROM dec)),
         hit AS (SELECT DISTINCT dg.id FROM dg JOIN bg USING (ng))
         SELECT 'input' AS stage, (SELECT count(*) FROM base) AS n_rows
         UNION ALL SELECT 'language', (SELECT count(*) FROM flags WHERE lang_ok)
         UNION ALL SELECT 'quality', (SELECT count(*) FROM flags WHERE lang_ok AND qual_ok)
         UNION ALL SELECT 'gopher', (SELECT count(*) FROM flags WHERE lang_ok AND qual_ok AND gopher_ok)
         UNION ALL SELECT 'line_dedup', (SELECT count(*) FROM ldk)
         UNION ALL SELECT 'exact_dedup', (SELECT count(*) FROM reps)
         UNION ALL SELECT 'near_dedup', (SELECT count(*) FROM nearkept)
         UNION ALL SELECT 'decontaminate', (SELECT count(*) FROM dec)
         UNION ALL SELECT 'decontaminate_ngram',
           (SELECT count(*) FROM dec) - (SELECT count(*) FROM hit)""",

    // fingerprint-group stats + exact-Jaccard pairs among min-id
    // representatives reproduce all four pipeline counters
    "q_x_dedup_pipeline" ->
      """WITH fp AS (SELECT doc_id, text,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS f
         FROM documents),
         g AS (SELECT f, min(doc_id) AS id, count(*) AS n_copies
               FROM fp GROUP BY f),
         rt AS (SELECT g.id, fp.text FROM g JOIN fp ON fp.doc_id = g.id),
         s AS (SELECT id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
         FROM rt),
         sh AS (SELECT id,
           list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk)-1)]) AS ss
         FROM s WHERE len(tk) >= 3),
         np AS (SELECT count(*) AS n FROM sh a, sh b
                WHERE a.id < b.id
                  AND len(list_intersect(a.ss, b.ss))::DOUBLE
                      / len(list_distinct(a.ss || b.ss)) >= 0.5)
         SELECT (SELECT count(*) FROM g) AS n_unique_texts,
                (SELECT CAST(sum(n_copies) AS BIGINT) FROM g) AS n_docs,
                (SELECT max(n_copies) FROM g) AS max_copies,
                (SELECT n FROM np) AS n_near_dup_pairs""",

    // hyperplane-LSH buckets are pure deterministic arithmetic (sign
    // pattern from ((p*dim+i) * 2654435761) >> 16 & 1), so the whole
    // bucket+verify path is SQL-expressible
    "q_x_ann_lsh_pairs" ->
      """WITH planes AS (
           SELECT p.range AS p, i.range AS i,
                  CASE WHEN ((p.range * 64 + i.range) * 2654435761 >> 16) & 1 = 1
                       THEN 1.0 ELSE -1.0 END AS s
           FROM range(8) p, range(64) i
         ),
         proj AS (
           SELECT e.vec_id, pl.p,
                  SUM(CAST(e.embedding[pl.i + 1] AS DOUBLE) * pl.s) AS d
           FROM embeddings e, planes pl
           GROUP BY e.vec_id, pl.p
         ),
         sigs AS (
           SELECT vec_id,
                  SUM(CASE WHEN d >= 0 THEN CAST(1 << p AS BIGINT) ELSE 0 END) AS bucket
           FROM proj GROUP BY vec_id
         ),
         sized AS (
           SELECT vec_id, bucket, COUNT(*) OVER (PARTITION BY bucket) AS bn FROM sigs
         ),
         keep AS (SELECT vec_id, bucket FROM sized WHERE bn <= 200)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                round(CAST(list_cosine_similarity(ea.embedding, eb.embedding) AS DOUBLE), 4) AS cos
         FROM keep a JOIN keep b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         JOIN embeddings ea ON ea.vec_id = a.vec_id
         JOIN embeddings eb ON eb.vec_id = b.vec_id
         WHERE CAST(list_cosine_similarity(ea.embedding, eb.embedding) AS DOUBLE) >= 0.25""",

    // exhaustive PQ must equal the exact squared-L2 ranking; the nested
    // comprehension mirrors the subspace-grouped summation order so the
    // double arithmetic matches Spark's bit-for-bit
    "q_x_ann_ivfpq_exhaustive" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
         scored AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             list_sum([ list_sum([ (c.embedding[(j*8)+i]::DOUBLE
                                    - q.embedding[(j*8)+i]::DOUBLE)^2
                                   for i in range(1, 9) ])
                        for j in range(0, 8) ]) AS d
           FROM embeddings c, q
           WHERE c.vec_id < 500 AND c.vec_id <> q.vec_id),
         r AS (SELECT query_id, cand_id, d,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY d, cand_id) AS rank
               FROM scored)
         SELECT query_id, CAST(rank AS BIGINT) AS rank,
                cand_id AS neighbor_id, round(d, 4) AS dist
         FROM r WHERE rank <= 5""",

    // identical exact-L2 oracle as the in-memory IVFADC gate: the
    // persisted path must reproduce it through the parquet round-trip
    "q_x_ann_vecidx_pq_exhaustive" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
         scored AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             list_sum([ list_sum([ (c.embedding[(j*8)+i]::DOUBLE
                                    - q.embedding[(j*8)+i]::DOUBLE)^2
                                   for i in range(1, 9) ])
                        for j in range(0, 8) ]) AS d
           FROM embeddings c, q
           WHERE c.vec_id < 500 AND c.vec_id <> q.vec_id),
         r AS (SELECT query_id, cand_id, d,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY d, cand_id) AS rank
               FROM scored)
         SELECT query_id, CAST(rank AS BIGINT) AS rank,
                cand_id AS neighbor_id, round(d, 4) AS dist
         FROM r WHERE rank <= 5""",

    "q_x_ann_pq_refined" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
         scored AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             list_sum([ list_sum([ (c.embedding[(j*8)+i]::DOUBLE
                                    - q.embedding[(j*8)+i]::DOUBLE)^2
                                   for i in range(1, 9) ])
                        for j in range(0, 8) ]) AS d
           FROM embeddings c, q
           WHERE c.vec_id < 500 AND c.vec_id <> q.vec_id),
         r AS (SELECT query_id, cand_id, d,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY d, cand_id) AS rank
               FROM scored)
         SELECT query_id, CAST(rank AS BIGINT) AS rank,
                cand_id AS neighbor_id, round(d, 4) AS dist
         FROM r WHERE rank <= 5""",

    "q_x_ann_pq_exhaustive" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
         scored AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
             list_sum([ list_sum([ (c.embedding[(j*8)+i]::DOUBLE
                                    - q.embedding[(j*8)+i]::DOUBLE)^2
                                   for i in range(1, 9) ])
                        for j in range(0, 8) ]) AS d
           FROM embeddings c, q
           WHERE c.vec_id < 500 AND c.vec_id <> q.vec_id),
         r AS (SELECT query_id, cand_id, d,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY d, cand_id) AS rank
               FROM scored)
         SELECT query_id, CAST(rank AS BIGINT) AS rank,
                cand_id AS neighbor_id, round(d, 4) AS dist
         FROM r WHERE rank <= 5""",

    // exhaustive IVF must equal the exact brute-force ranking
    "q_x_ann_ivf_exhaustive" ->
      """WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 8),
         scored AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                      CAST(list_cosine_similarity(c.embedding, q.embedding) AS DOUBLE) AS cos
                    FROM embeddings c, q WHERE c.vec_id <> q.vec_id),
         r AS (SELECT query_id, cand_id, cos,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, cand_id) AS rank
               FROM scored)
         SELECT query_id, CAST(rank AS BIGINT) AS rank,
                cand_id AS neighbor_id, round(cos, 4) + 0.0 AS cos
         FROM r WHERE rank <= 5""",

    "q_x_ann_vecidx_exhaustive" -> vecIdxExhaustiveOracleSql,

    "q_x_stream_ann_probe" -> vecIdxExhaustiveOracleSql,

    // break at STRICTLY > gap: session_window merges a window starting
    // exactly at the previous session's end (verified on a boundary
    // fixture in StreamOpsSpec — the earlier >= here was indistinguishable
    // on this data, which has no exactly-at-gap pair, but wrong at the
    // boundary)
    "q_w5_session_window" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, value FROM events),
         g AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL
                              OR t - lag(t) OVER w > INTERVAL 30 MINUTE
                         THEN 1 ELSE 0 END AS brk
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
         s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
               FROM g)
         SELECT user_id, strftime(min(t), '%Y-%m-%d %H:%M:%S') AS session_start,
           count(*) AS n_events, round(sum(value), 2) AS sum_value
         FROM s GROUP BY user_id, sid""",

    "q_x_decontaminate_bloom" ->
      """WITH f AS (SELECT doc_id, source,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
         FROM documents),
         b AS (SELECT DISTINCT fp FROM f WHERE doc_id % 97 = 0)
         SELECT doc_id, source FROM f
         WHERE NOT EXISTS (SELECT 1 FROM b WHERE b.fp = f.fp)""",

    "q_x_sessionize" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, value FROM events),
         g AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL
                              OR t - lag(t) OVER w > INTERVAL 30 MINUTE
                         THEN 1 ELSE 0 END AS brk
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
         s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
               FROM g),
         agg AS (SELECT user_id, sid,
                   strftime(min(t), '%Y-%m-%d %H:%M:%S') AS session_start,
                   strftime(max(t), '%Y-%m-%d %H:%M:%S') AS session_end,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value,
                   max(sid) OVER (PARTITION BY user_id) AS max_sid
                 FROM s GROUP BY user_id, sid)
         SELECT user_id, session_start, session_end, n_events, sum_value
         FROM agg WHERE sid < max_sid""",

    "q_x_attribution" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id,
             CAST(ts AS TIMESTAMP) AS p_ts
           FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id AS click_id, user_id,
             CAST(ts AS TIMESTAMP) AS c_ts
           FROM events WHERE event_type = 'click'),
         j AS (SELECT p.purchase_id, p.user_id, c.click_id,
             row_number() OVER (PARTITION BY p.purchase_id
               ORDER BY c.c_ts DESC, c.click_id DESC) AS rn
           FROM p LEFT JOIN c ON p.user_id = c.user_id
             AND c.c_ts <= p.p_ts
             AND c.c_ts >= p.p_ts - INTERVAL 7 DAY)
         SELECT purchase_id, user_id, click_id FROM j WHERE rn = 1""",

    "q_x_asof_join" ->
      """WITH j AS (
           SELECT e.event_id, o.o_orderkey, o.o_orderdate,
                  row_number() OVER (PARTITION BY e.event_id
                    ORDER BY o.o_orderdate DESC NULLS LAST,
                             o.o_orderkey DESC NULLS LAST) AS rn
           FROM events e LEFT JOIN orders o
             ON e.user_id = o.o_custkey
            AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP))
         SELECT event_id, o_orderkey,
                strftime(o_orderdate, '%Y-%m-%d') AS asof_date
         FROM j WHERE rn = 1""",

    "q_x_asof_custom_plan" ->
      """WITH j AS (
           SELECT e.event_id, o.o_orderkey, o.o_orderdate,
                  row_number() OVER (PARTITION BY e.event_id
                    ORDER BY o.o_orderdate DESC NULLS LAST,
                             o.o_orderkey DESC NULLS LAST) AS rn
           FROM events e LEFT JOIN orders o
             ON e.user_id = o.o_custkey
            AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP))
         SELECT event_id, o_orderkey,
                strftime(o_orderdate, '%Y-%m-%d') AS asof_date
         FROM j WHERE rn = 1""",

    "q_x_salted_agg" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
         count(*) AS n FROM lineitem GROUP BY l_returnflag""",

    "q_x_salted_join" ->
      """SELECT p_brand, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand""",

    "q_x_compact" ->
      """SELECT lang, count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS sum_id,
         CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY lang""",

    "q_x_shard_manifest" ->
      """SELECT CAST(doc_id % 8 AS BIGINT) AS shard,
         count(*) AS n_docs,
         CAST(sum(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))) AS BIGINT) AS n_tokens
         FROM documents GROUP BY 1""",

    "q_x_word_freq" ->
      """SELECT w AS word, count(*) AS n
         FROM (SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
               FROM documents)
         GROUP BY w ORDER BY n DESC, w LIMIT 20""",

    "q_x_tfidf_top" ->
      """WITH toks AS (SELECT doc_id AS id,
           unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
         FROM documents),
         tf AS (SELECT id, word, count(*) AS tf FROM toks GROUP BY 1, 2),
         dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
         scored AS (SELECT tf.id, tf.word, tf.tf,
             round(tf.tf * ln(n.n_docs / dfreq.df), 4) AS tfidf
           FROM tf JOIN dfreq USING (word), n),
         r AS (SELECT *, row_number() OVER (PARTITION BY id
                 ORDER BY tfidf DESC, word) AS rank FROM scored)
         SELECT id AS doc_id, CAST(rank AS BIGINT) AS rank, word,
           CAST(tf AS BIGINT) AS tf, tfidf
         FROM r WHERE rank <= 3""",

    "q_x_anomaly" ->
      """WITH e AS (SELECT event_id, user_id,
           CAST(round(value * 100) AS BIGINT) AS cents, ts
         FROM events),
         w AS (SELECT event_id, user_id, cents,
             count(cents) OVER win AS cnt,
             CAST(sum(cents) OVER win AS DOUBLE) AS s,
             CAST(sum(cents * cents) OVER win AS DOUBLE) AS s2
           FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
         z AS (SELECT event_id, user_id, cents, cnt AS n_prior,
             (cents - s / cnt) / sqrt((s2 - s * s / cnt) / (cnt - 1)) AS z,
             (s2 - s * s / cnt) / (cnt - 1) AS variance
           FROM w)
         SELECT event_id, user_id, cents, n_prior, round(z, 4) + 0.0 AS z
         FROM z
         WHERE n_prior >= 10 AND variance > 0 AND abs(z) >= 2.0""",

    "q_x_triangles" ->
      """WITH s AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 3 = 0),
         e AS (SELECT a.vec_id AS x, b.vec_id AS y FROM s a, s b
               WHERE a.vec_id < b.vec_id
                 AND CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE) >= 0.2),
         tri AS (SELECT e1.x AS u, e1.y AS v, e2.y AS w
                 FROM e e1 JOIN e e2 ON e1.x = e2.x AND e1.y < e2.y
                 JOIN e e3 ON e3.x = e1.y AND e3.y = e2.y)
         SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
         FROM (SELECT u AS node FROM tri
               UNION ALL SELECT v FROM tri
               UNION ALL SELECT w FROM tri)
         GROUP BY 1""",

    "q_x_embed_dup" ->
      """WITH s AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0)
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE), 4) AS cos
         FROM s a, s b
         WHERE a.vec_id < b.vec_id
           AND CAST(list_cosine_similarity(a.embedding, b.embedding) AS DOUBLE) >= 0.3""",

    "q_x_semantic_decontaminate" ->
      """SELECT c.vec_id AS id FROM embeddings c
         WHERE EXISTS (SELECT 1 FROM embeddings b
           WHERE b.vec_id % 97 = 0
           AND CAST(list_cosine_similarity(c.embedding, b.embedding) AS DOUBLE) >= 0.3)""",

    "q_x_semdedup" ->
      """WITH cents AS (
           SELECT vec_id AS cid, embedding AS cvec FROM embeddings
           ORDER BY vec_id LIMIT 8),
         scored AS (
           SELECT b.vec_id AS id, c.cid,
             CAST(list_cosine_similarity(b.embedding, c.cvec) AS DOUBLE) AS cos
           FROM embeddings b, cents c),
         asg AS (
           SELECT id, cid AS cluster FROM (
             SELECT id, cid,
               row_number() OVER (PARTITION BY id ORDER BY cos DESC, cid) AS rn
             FROM scored) WHERE rn = 1),
         dup AS (
           SELECT DISTINCT yb.id AS id
           FROM asg ya JOIN asg yb ON ya.cluster = yb.cluster AND ya.id < yb.id
           JOIN embeddings ea ON ea.vec_id = ya.id
           JOIN embeddings eb ON eb.vec_id = yb.id
           WHERE CAST(list_cosine_similarity(ea.embedding, eb.embedding) AS DOUBLE) >= 0.3)
         SELECT asg.id, asg.cluster,
           (dup.id IS NULL) AS keep
         FROM asg LEFT JOIN dup ON asg.id = dup.id""",

    "q_x_stream_window" ->
      """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
                         '%Y-%m-%d %H:%M:%S') AS hour_start,
         event_type, count(*) AS n, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2""",

    "q_x_stream_funnel" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS t FROM events),
         wm AS (SELECT max(t) - INTERVAL 10 MINUTE AS w FROM e),
         s0 AS (SELECT user_id, min(t) AS t0 FROM e
                WHERE event_type = 'signup' GROUP BY 1),
         v1 AS (SELECT e.user_id, min(e.t) AS t1
                FROM e JOIN s0 USING (user_id)
                WHERE e.event_type = 'view' AND e.t > s0.t0
                  AND e.t <= s0.t0 + INTERVAL 30 MINUTE
                GROUP BY e.user_id),
         c2 AS (SELECT e.user_id
                FROM e JOIN s0 USING (user_id) JOIN v1 USING (user_id)
                WHERE e.event_type = 'click' AND e.t > v1.t1
                  AND e.t <= s0.t0 + INTERVAL 30 MINUTE
                GROUP BY e.user_id),
         done AS (SELECT user_id, true AS completed,
                    CAST(3 AS BIGINT) AS steps_completed FROM c2),
         part AS (SELECT s0.user_id, false AS completed,
                    CAST(CASE WHEN v1.user_id IS NOT NULL THEN 2 ELSE 1 END
                         AS BIGINT) AS steps_completed
                  FROM s0 LEFT JOIN v1 USING (user_id)
                  WHERE s0.user_id NOT IN (SELECT user_id FROM c2)
                    AND s0.t0 + INTERVAL 30 MINUTE < (SELECT w FROM wm))
         SELECT * FROM done UNION ALL SELECT * FROM part""",

    "q_x_stream_sample" ->
      """SELECT doc_id, lang, source FROM (
           SELECT doc_id, lang, source,
             md5('samp:' || doc_id) AS pri
           FROM documents ORDER BY pri LIMIT 100)""",

    "q_x_stream_source_cap" ->
      """SELECT doc_id, lang, source FROM (
           SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY source
               ORDER BY md5('samp:' || doc_id)) AS rn
           FROM documents) WHERE rn <= 20""",

    // the live pipeline render: data-card aggregates over the
    // DECONTAMINATED set + window-rank per-source cap stats + the
    // global distinct-fingerprint corpus size; the _compacted twin runs
    // the IDENTICAL stream with partials+corpus compaction and a
    // checkpoint restart mid-stream — maintenance must be invisible, so
    // it shares this oracle verbatim
    "q_x_stream_pipeline" -> streamPipelineOracleSql("documents"),

    // the near-dup pipeline's admitted set, brute-forced: decontaminate
    // (5-gram overlap with the doc_id%37 benchmark), split into the two
    // streamed batches (even seeds, odd probes), exact-fp collapse
    // within each batch (min doc_id per fingerprint survives), odd-half
    // rows drop on an exact fp hit against the even half or a true
    // 3-shingle Jaccard >= 0.5 against any admitted even-half doc.
    // NOT EXISTS (not NOT IN) for the fp probe: a null fingerprint
    // never equi-matches in the Spark anti-join either
    "q_x_stream_pipeline_neardup" -> streamPipelineNeardupOracleSql,

    // identical composition with maintenance (corpus + index compaction
    // and a checkpoint restart) between the two batches — same oracle,
    // because maintenance must be invisible to the admitted set
    "q_x_stream_pipeline_neardup_compacted" -> streamPipelineNeardupOracleSql,
    // the compacted twin runs on a 1/3 subset: its job is proving the
    // MAINTENANCE machinery invisible across a restart, which needs
    // batches + folds, not corpus mass (the full-corpus pipeline cost
    // is already carried by q_x_stream_pipeline)
    "q_x_stream_pipeline_compacted" -> streamPipelineOracleSql(
      "(SELECT * FROM documents WHERE doc_id % 3 = 0)"),
    // the managed twin runs on a 1/5 subset: its job is proving the
    // managed LIFECYCLE (lease + listener + post-termination
    // auto-compaction) invisible to the audit, not corpus throughput
    "q_x_stream_pipeline_managed" -> streamPipelineOracleSql(
      "(SELECT * FROM documents WHERE doc_id % 5 = 0)"),
  )

  /** The near-dup pipeline's admitted set, brute-forced — shared by the
    * plain query and its maintenance twin (compaction + restart must be
    * invisible to the admitted set, so both hash against the SAME SQL). */
  private lazy val streamPipelineNeardupOracleSql: String =
      """WITH src AS (SELECT * FROM documents),
         tok AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
         FROM src),
         g AS (SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(w) - 4, 0)),
             i -> array_to_string(list_slice(w, i, i + 4), ' '))) AS ng
         FROM tok),
         bgr AS (SELECT DISTINCT ng FROM g WHERE doc_id % 37 = 0),
         dirty AS (SELECT DISTINCT g.doc_id FROM g JOIN bgr USING (ng)),
         docs AS (SELECT src.*,
             md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
           FROM src WHERE doc_id NOT IN (SELECT doc_id FROM dirty)),
         ak AS (SELECT * FROM (SELECT d.*,
             row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
           FROM docs d WHERE doc_id % 2 = 0) WHERE rn = 1),
         bk AS (SELECT * FROM (SELECT d.*,
             row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
           FROM docs d WHERE doc_id % 2 = 1) WHERE rn = 1),
         bex AS (SELECT * FROM bk
           WHERE NOT EXISTS (SELECT 1 FROM ak WHERE ak.fp = bk.fp)),
         ash AS (SELECT doc_id,
             list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk)-1)]) AS ss
           FROM (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk FROM ak)
           WHERE len(tk) >= 3),
         bsh AS (SELECT doc_id,
             list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk)-1)]) AS ss
           FROM (SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk FROM bex)
           WHERE len(tk) >= 3),
         bdrop AS (SELECT DISTINCT b.doc_id FROM bsh b, ash a
           WHERE len(list_intersect(a.ss, b.ss))::DOUBLE
                 / len(list_distinct(a.ss || b.ss)) >= 0.5)
         SELECT doc_id, source FROM ak
         UNION ALL
         SELECT doc_id, source FROM bex
         WHERE doc_id NOT IN (SELECT doc_id FROM bdrop)"""

  /** The live-pipeline oracle with its document source injectable, so
    * the full-corpus stream and the subset maintenance twin share the
    * identical SQL body. */
  private def streamPipelineOracleSql(src: String): String =
    streamPipelineOracleSqlBase.replace("__DOCS__", src)

  private lazy val streamPipelineOracleSqlBase: String =
      """WITH src AS (SELECT * FROM __DOCS__),
         tok AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
         FROM src),
         g AS (SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(w) - 4, 0)),
             i -> array_to_string(list_slice(w, i, i + 4), ' '))) AS ng
         FROM tok),
         bgr AS (SELECT DISTINCT ng FROM g WHERE doc_id % 37 = 0),
         dirty AS (SELECT DISTINCT g.doc_id FROM g JOIN bgr USING (ng)),
         docs AS (SELECT * FROM src
           WHERE doc_id NOT IN (SELECT doc_id FROM dirty)),
         b AS (SELECT source, lang, doc_id,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) END AS ntok,
           len(regexp_extract_all(text, 'https?://[^\s]+'))
             + len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             + len(regexp_extract_all(text, '\b(\d{1,3}\.){3}\d{1,3}\b'))
             + len(regexp_extract_all(text, '\+?\d[\d()\-\s]{6,}\d')) AS pii,
           CASE WHEN trim(text) = '' THEN NULL ELSE
             206.835
             - 1.015 * (len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))::DOUBLE
                        / greatest(len(regexp_extract_all(text, '[.!?]+')), 1))
             - 84.6 * (list_sum(list_transform(
                         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
                         w -> greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1)))::DOUBLE
                       / len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')))
           END AS ease,
           md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
         FROM docs),
         m AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ntok) AS BIGINT) AS n_tokens,
           round(AVG(ntok), 4) AS mean_tokens,
           round(greatest(0.0, (COUNT(*) - COUNT(DISTINCT fp))::DOUBLE / COUNT(*)), 4) AS dup_ratio,
           round(SUM(pii)::DOUBLE / COUNT(*), 4) AS pii_per_doc,
           round(AVG(ease), 4) + 0.0 AS mean_reading_ease
         FROM b GROUP BY source),
         lc AS (SELECT source, lang, COUNT(*) AS n FROM b GROUP BY source, lang),
         lt AS (SELECT source, lang AS top_lang, n,
                  ROW_NUMBER() OVER (PARTITION BY source ORDER BY n DESC, lang DESC) AS rn,
                  SUM(n) OVER (PARTITION BY source) AS tot
                FROM lc),
         cap AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS cap_n,
                   MIN(doc_id) AS cap_min_doc
                 FROM (SELECT doc_id, source,
                         row_number() OVER (PARTITION BY source
                           ORDER BY md5('samp:' || doc_id)) AS rn
                       FROM docs) WHERE rn <= 20 GROUP BY source),
         corp AS (SELECT CAST(COUNT(DISTINCT fp) AS BIGINT) AS corpus_docs FROM b)
         SELECT m.*, lt.top_lang, round(lt.n::DOUBLE / lt.tot, 4) AS top_lang_share,
           cap.cap_n, cap.cap_min_doc, corp.corpus_docs
         FROM m JOIN lt ON m.source = lt.source AND lt.rn = 1
         JOIN cap ON cap.source = m.source CROSS JOIN corp"""

  // continuation of [[oracleSql]] (split so shared-oracle vals can sit
  // between the halves; uniqueMap guards each half and oracleSql
  // REQUIRES the halves disjoint, so a name landing in both fails at
  // load instead of the tail silently shadowing the head)
  private lazy val oracleSqlTail: Map[String, String] = uniqueMap(

    "q_x_stream_decontaminate" ->
      """WITH tok AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
         FROM documents),
         g AS (SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(len(w) - 4, 0)),
             i -> array_to_string(list_slice(w, i, i + 4), ' '))) AS ng
         FROM tok),
         bg AS (SELECT DISTINCT ng FROM g WHERE doc_id % 37 = 0),
         dirty AS (SELECT DISTINCT g.doc_id FROM g JOIN bg USING (ng))
         SELECT doc_id, lang, source FROM documents
         WHERE doc_id NOT IN (SELECT doc_id FROM dirty)""",

    "q_x_stream_health" ->
      """WITH d AS (SELECT doc_id,
           TIMESTAMP '2026-01-01 00:00:00' + doc_id * INTERVAL 1 MINUTE AS ts,
           CAST(len(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS BIGINT) AS n_toks
         FROM documents)
         SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_tokens,
           round(avg(n_toks), 4) AS mean_doc_tokens,
           round(sum(CASE WHEN n_toks < 10 THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
             AS pct_short
         FROM d GROUP BY 1""",

    "q_x_stream_interval_join" ->
      """SELECT l.event_id AS l_event_id, r.event_id AS r_event_id
         FROM events l JOIN events r
         ON l.user_id = r.user_id
         AND l.event_type = 'click' AND r.event_type = 'purchase'
         AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 30 MINUTE""",

    "q_x_multimodal" ->
      """SELECT doc_id AS media_id,
         CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
         md5(text) AS sig,
         CAST(16 + octet_length(CAST(text AS BLOB)) % 64 AS INTEGER) AS width,
         CAST(16 + (octet_length(CAST(text AS BLOB)) // 64) % 64 AS INTEGER) AS height
         FROM documents""",

    "q_x_audio_meta" ->
      """SELECT doc_id AS media_id, 'pcm' AS codec,
         1 + doc_id % 2 AS channels,
         8000 * (1 + doc_id % 3) AS sample_rate,
         CAST((n_chars % 4096) * 1000
              // (8000 * (1 + doc_id % 3) * (1 + doc_id % 2) * 2) AS BIGINT)
           AS duration_ms
         FROM documents""",

    "q_x_image_meta" ->
      """SELECT doc_id AS media_id, 'png' AS format,
         1 + n_chars % 512 AS width, 1 + doc_id % 512 AS height
         FROM documents""",

    "q_x_video_meta" ->
      """SELECT doc_id AS media_id, 'isom' AS brand,
         600 * (1 + doc_id % 5) AS timescale,
         CAST(n_chars * 37 * 1000 // (600 * (1 + doc_id % 5)) AS BIGINT)
           AS duration_ms
         FROM documents""",

    "q_x_label_consensus" -> s"""WITH $annSqlCte,
         c AS (SELECT doc_id, label, COUNT(*) AS n FROM ann GROUP BY doc_id, label),
         r AS (SELECT doc_id, label, n,
                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, label ASC) AS rn,
                 SUM(n) OVER (PARTITION BY doc_id) AS tot,
                 MAX(n) OVER (PARTITION BY doc_id) AS mx
               FROM c)
         SELECT doc_id, label AS consensus,
           CAST(tot AS BIGINT) AS n_annotators,
           CAST(mx AS BIGINT) AS n_majority,
           round(mx::DOUBLE / tot, 4) AS agreement
         FROM r WHERE rn = 1""",

    "q_x_annotator_accuracy" -> s"""WITH $annSqlCte,
         c AS (SELECT doc_id, label, COUNT(*) AS n FROM ann GROUP BY doc_id, label),
         r AS (SELECT doc_id, label AS consensus,
                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, label ASC) AS rn
               FROM c)
         SELECT ann.annotator, CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CASE WHEN ann.label = r.consensus THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
           round(SUM(CASE WHEN ann.label = r.consensus THEN 1.0 ELSE 0.0 END) / COUNT(*), 4) AS accuracy
         FROM ann JOIN r ON ann.doc_id = r.doc_id AND r.rn = 1
         GROUP BY ann.annotator""",

    "q_x_cohen_kappa" -> s"""WITH $annSqlCte,
         j AS (SELECT a.annotator AS annot_a, b.annotator AS annot_b,
                 a.label AS la, b.label AS lb
               FROM ann a JOIN ann b
                 ON a.doc_id = b.doc_id AND a.annotator < b.annotator),
         cont AS (SELECT annot_a, annot_b, la, lb, COUNT(*)::DOUBLE AS n
                  FROM j GROUP BY annot_a, annot_b, la, lb),
         tot AS (SELECT annot_a, annot_b, SUM(n) AS nn,
                   SUM(CASE WHEN la = lb THEN n ELSE 0 END) AS diag
                 FROM cont GROUP BY annot_a, annot_b),
         rm AS (SELECT annot_a, annot_b, la AS k, SUM(n) AS rk
                FROM cont GROUP BY annot_a, annot_b, la),
         cm AS (SELECT annot_a, annot_b, lb AS k, SUM(n) AS ck
                FROM cont GROUP BY annot_a, annot_b, lb),
         pexp AS (SELECT annot_a, annot_b, SUM(rk * ck) AS rc
                  FROM rm JOIN cm USING (annot_a, annot_b, k)
                  GROUP BY annot_a, annot_b)
         SELECT t.annot_a, t.annot_b, CAST(nn AS BIGINT) AS n_items,
           round(diag / nn, 6) + 0.0 AS po,
           round(rc / (nn * nn), 6) + 0.0 AS pe,
           round((diag / nn - rc / (nn * nn)) / (1.0 - rc / (nn * nn)), 6) + 0.0 AS kappa
         FROM tot t JOIN pexp USING (annot_a, annot_b)""",

    "q_x_fleiss_kappa" -> s"""WITH $annSqlCte,
         c AS (SELECT doc_id, label, COUNT(*)::DOUBLE AS nik
               FROM ann GROUP BY doc_id, label),
         pi AS (SELECT doc_id, SUM(nik) AS n, SUM(nik * nik) AS sq
                FROM c GROUP BY doc_id HAVING SUM(nik) >= 2),
         pb AS (SELECT COUNT(*) AS n_items,
                  AVG((sq - n) / (n * (n - 1))) AS pbar,
                  SUM(n) AS total FROM pi),
         ls AS (SELECT c.label, SUM(c.nik) AS nk
                FROM c JOIN pi USING (doc_id) GROUP BY c.label),
         pexp AS (SELECT COUNT(*) AS n_categories,
                    SUM((nk / (SELECT total FROM pb)) * (nk / (SELECT total FROM pb))) AS pe
                  FROM ls)
         SELECT CAST(n_items AS BIGINT) AS n_items,
           CAST(n_categories AS BIGINT) AS n_categories,
           round(pbar, 6) + 0.0 AS p_bar,
           round(pe, 6) + 0.0 AS p_e,
           round((pbar - pe) / (1.0 - pe), 6) + 0.0 AS kappa
         FROM pb, pexp""",

    "q_x_kripp_alpha" -> s"""WITH $annSqlCte,
         annf AS (SELECT * FROM ann
                  WHERE NOT (annotator = 5 AND doc_id % 4 = 0)),
         c AS (SELECT doc_id, label, COUNT(*)::DOUBLE AS nuc
               FROM annf GROUP BY doc_id, label),
         pi AS (SELECT doc_id, SUM(nuc) AS mu, SUM(nuc * nuc) AS sq
                FROM c GROUP BY doc_id HAVING SUM(nuc) >= 2),
         obs AS (SELECT COUNT(*) AS n_items, SUM(mu) AS n,
                   SUM((mu * mu - sq) / (mu - 1)) AS dosum FROM pi),
         nc AS (SELECT c.label, SUM(c.nuc) AS ncv
                FROM c JOIN pi USING (doc_id) GROUP BY c.label),
         ex AS (SELECT SUM(ncv * ((SELECT n FROM obs) - ncv)) AS desum FROM nc)
         SELECT CAST(n_items AS BIGINT) AS n_items,
           CAST(n AS BIGINT) AS n_annotations,
           round(dosum / n, 6) + 0.0 AS d_o,
           round(desum / (n * (n - 1)), 6) + 0.0 AS d_e,
           round(CASE WHEN desum / (n * (n - 1)) <> 0
                 THEN 1.0 - (dosum / n) / (desum / (n * (n - 1))) END, 6)
             + 0.0 AS alpha
         FROM obs, ex""",

    "q_x_bradley_terry" -> btOracleSql,

    "q_x_stream_bradley_terry" -> btOracleSql,

    "q_x_k_anonymity" ->
      """SELECT c_mktsegment, floor(c_acctbal / 1000.0) * 1000.0 AS acct_bucket,
           CAST(COUNT(*) AS BIGINT) AS class_size,
           COUNT(*) < 10 AS violates
         FROM customer GROUP BY 1, 2""",

    "q_x_l_diversity" ->
      """SELECT c_mktsegment, floor(c_acctbal / 1000.0) * 1000.0 AS acct_bucket,
           CAST(COUNT(*) AS BIGINT) AS class_size,
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_sensitive,
           COUNT(DISTINCT c_nationkey) < 5 AS violates
         FROM customer GROUP BY 1, 2""",

    "q_x_k_anon_ladder" ->
      """WITH lv AS (
           SELECT 'l0_nation_acct100' AS level, c_mktsegment,
             floor(c_acctbal / 100.0) * 100.0 AS acct_bucket,
             c_nationkey AS nat FROM customer
           UNION ALL
           SELECT 'l1_nation_acct1k', c_mktsegment,
             floor(c_acctbal / 1000.0) * 1000.0, c_nationkey FROM customer
           UNION ALL
           SELECT 'l2_acct5k', c_mktsegment,
             floor(c_acctbal / 5000.0) * 5000.0, 0 FROM customer),
         cls AS (SELECT level, c_mktsegment, acct_bucket, nat,
                   COUNT(*) AS class_size
                 FROM lv GROUP BY 1, 2, 3, 4)
         SELECT level, CAST(SUM(class_size) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(MIN(class_size) AS BIGINT) AS min_class_size,
           CAST(SUM(CASE WHEN class_size < 10 THEN class_size ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
           round(SUM(CASE WHEN class_size < 10 THEN class_size ELSE 0 END)::DOUBLE
                 / SUM(class_size), 4) AS risk_ratio
         FROM cls GROUP BY level""",

    "q_x_url_canonical" -> s"""WITH $urlSqlCtes
         SELECT doc_id, url, canonical FROM canon""",

    "q_x_url_domain" -> s"""WITH $urlSqlCtes
         SELECT $domainSqlExpr AS domain,
           CAST(COUNT(*) AS BIGINT) AS n_urls
         FROM c2 GROUP BY 1""",

    "q_x_url_dedup" -> s"""WITH $urlSqlCtes,
         d AS (SELECT $domainSqlExpr AS domain, canonical
               FROM c2 JOIN canon USING (doc_id))
         SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT canonical) AS BIGINT) AS n_canonical,
           round((COUNT(*) - COUNT(DISTINCT canonical))::DOUBLE
                 / COUNT(*), 4) AS dup_ratio
         FROM d GROUP BY domain""",

    "q_x_readability" ->
      """WITH t AS (SELECT doc_id, text,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
         FROM documents),
         m AS (SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0 ELSE len(tk) END AS n_words,
           greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
           list_sum(list_transform(tk,
             w -> greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1))) AS syl
         FROM t)
         SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           CAST(CASE WHEN n_words > 0 THEN syl ELSE 0 END AS BIGINT) AS n_syllables,
           CASE WHEN n_words > 0 THEN
             round(206.835 - 1.015 * (n_words::DOUBLE / n_sentences)
                   - 84.6 * (syl::DOUBLE / n_words), 4) + 0.0 END AS reading_ease,
           CASE WHEN n_words > 0 THEN
             round(0.39 * (n_words::DOUBLE / n_sentences)
                   + 11.8 * (syl::DOUBLE / n_words) - 15.59, 4) + 0.0 END AS fk_grade
         FROM m""",

    "q_x_skew_report" ->
      """WITH c AS (SELECT CAST(user_id AS VARCHAR) AS key, COUNT(*) AS n
                    FROM events GROUP BY user_id),
         top AS (SELECT key FROM c ORDER BY n DESC, key DESC LIMIT 1)
         SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MAX(n) AS BIGINT) AS max_key_rows,
           (SELECT key FROM top) AS top_key,
           round(MAX(n)::DOUBLE / SUM(n), 4) AS top_share,
           quantile_cont(n, 0.5) AS p50_key_rows,
           quantile_cont(n, 0.99) AS p99_key_rows,
           round(stddev_pop(n) / AVG(n), 4) AS cv,
           greatest(1, CAST(ceil(MAX(n)::DOUBLE / 1000) AS BIGINT)) AS salt_factor
         FROM c""",

    "q_x_data_card" -> dataCardOracleSql,

    "q_x_stream_data_card" -> dataCardOracleSql,

    "q_x_t_closeness" ->
      """WITH base AS (SELECT c_mktsegment, c_nationkey % 3 AS v FROM customer),
         cs AS (SELECT c_mktsegment, v, COUNT(*)::DOUBLE AS ncv
                FROM base GROUP BY c_mktsegment, v),
         nc AS (SELECT c_mktsegment, SUM(ncv) AS n_c FROM cs GROUP BY c_mktsegment),
         gl AS (SELECT v, COUNT(*)::DOUBLE / (SELECT COUNT(*) FROM base) AS p
                  FROM base GROUP BY v)
         SELECT cs.c_mktsegment, CAST(MIN(nc.n_c) AS BIGINT) AS class_size,
           round(0.5 * (1.0 + SUM(abs(cs.ncv / nc.n_c - gl.p) - gl.p)), 6)
             + 0.0 AS tv_distance,
           (round(0.5 * (1.0 + SUM(abs(cs.ncv / nc.n_c - gl.p) - gl.p)), 6)
             + 0.0) > 0.1 AS violates
         FROM cs JOIN nc USING (c_mktsegment) JOIN gl USING (v)
         GROUP BY cs.c_mktsegment""",

    "q_x_confusion_matrix" -> s"""WITH $annSqlCte,
         c AS (SELECT doc_id, label, COUNT(*) AS n FROM ann GROUP BY doc_id, label),
         r AS (SELECT doc_id, label AS consensus,
                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, label ASC) AS rn
               FROM c)
         SELECT ann.annotator, r.consensus, ann.label AS given,
           CAST(COUNT(*) AS BIGINT) AS n
         FROM ann JOIN r ON ann.doc_id = r.doc_id AND r.rn = 1
         GROUP BY ann.annotator, r.consensus, ann.label""",

    "q_x_zipf" ->
      """WITH w AS (SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS w
                    FROM documents),
         wc AS (SELECT w, COUNT(*) AS n FROM w WHERE w <> '' GROUP BY w),
         tot AS (SELECT COUNT(*) AS vocab_size, SUM(n) AS total_tokens FROM wc),
         topw AS (SELECT w, n FROM wc ORDER BY n DESC, w LIMIT 100),
         rk AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS rank FROM topw),
         fit AS (SELECT COUNT(*) AS top_k,
                   regr_slope(ln(n::DOUBLE), ln(rank::DOUBLE)) AS s,
                   regr_intercept(ln(n::DOUBLE), ln(rank::DOUBLE)) AS i,
                   regr_r2(ln(n::DOUBLE), ln(rank::DOUBLE)) AS r
                 FROM rk)
         SELECT CAST(vocab_size AS BIGINT) AS vocab_size,
           CAST(total_tokens AS BIGINT) AS total_tokens,
           CAST(top_k AS BIGINT) AS top_k,
           round(s, 6) + 0.0 AS slope,
           round(i, 6) + 0.0 AS intercept,
           round(r, 6) + 0.0 AS r2
         FROM tot, fit""",

    "q_x_collocations" ->
      """WITH tkn AS (SELECT string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
                      FROM documents),
         u AS (SELECT unnest(tk) AS w FROM tkn),
         uc AS (SELECT w, COUNT(*)::DOUBLE AS c FROM u WHERE w <> '' GROUP BY w),
         n1 AS (SELECT SUM(c) AS n FROM uc),
         b AS (SELECT unnest([array_to_string(tk[i:i+1], ' ') for i in range(1, len(tk))]) AS bg
               FROM tkn WHERE len(tk) >= 2),
         bc AS (SELECT bg, COUNT(*)::DOUBLE AS c FROM b GROUP BY bg),
         n2 AS (SELECT SUM(c) AS n FROM bc),
         j AS (SELECT bg, bc.c AS cab, ua.c AS ca, ub.c AS cb
               FROM bc
               JOIN uc ua ON ua.w = string_split(bg, ' ')[1]
               JOIN uc ub ON ub.w = string_split(bg, ' ')[2]
               WHERE bc.c >= 5)
         SELECT bg AS bigram, CAST(cab AS BIGINT) AS n,
           round(ln((cab / (SELECT n FROM n2)) /
                    ((ca / (SELECT n FROM n1)) * (cb / (SELECT n FROM n1)))), 6)
             + 0.0 AS pmi
         FROM j
         ORDER BY pmi DESC, bigram LIMIT 20""",

    "q_x_novelty" ->
      """WITH s AS (SELECT doc_id,
           string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS tk
         FROM documents),
         sh AS (SELECT doc_id,
           list_distinct([array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk)-1)]) AS ss
         FROM s WHERE len(tk) >= 3),
         g AS (SELECT doc_id, unnest(ss) AS gr FROM sh),
         c AS (SELECT gr, COUNT(*) AS dc FROM g GROUP BY gr)
         SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN c.dc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           round(SUM(CASE WHEN c.dc = 1 THEN 1.0 ELSE 0.0 END) / COUNT(*), 4) AS novelty
         FROM g JOIN c USING (gr) GROUP BY g.doc_id""",

    "q_x_silhouette" ->
      """WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
                      CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
         ex AS (SELECT label, unnest(v) AS val,
                  unnest(range(1, len(v) + 1)) AS ord FROM e),
         cent AS (SELECT label, list(av ORDER BY ord) AS c
                  FROM (SELECT label, ord, AVG(val) AS av
                        FROM ex GROUP BY label, ord) q
                  GROUP BY label),
         d AS (SELECT e.vec_id, e.label, cent.label AS cl,
                 list_distance(e.v, cent.c) AS dist
               FROM e CROSS JOIN cent),
         ab AS (SELECT vec_id, label,
                  MIN(CASE WHEN label = cl THEN dist END) AS a,
                  MIN(CASE WHEN label <> cl THEN dist END) AS b
                FROM d GROUP BY vec_id, label)
         SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
           round(AVG(a), 6) + 0.0 AS mean_a,
           round(AVG(b), 6) + 0.0 AS mean_b,
           round(AVG(CASE WHEN greatest(a, b) > 0
                 THEN (b - a) / greatest(a, b) ELSE 0 END), 6) + 0.0
             AS silhouette
         FROM ab GROUP BY label"""
  )

  /** Shared CTE for the synthetic annotation table — must stay in
    * lock-step with [[synthAnnots]]. */
  private val annSqlCte: String =
    """ann AS (SELECT doc_id, annotator,
         CASE WHEN (doc_id + annotator * annotator) % (annotator + 5) = 0
              THEN ((doc_id % 3) + 1 + (annotator % 2)) % 3
              ELSE doc_id % 3 END AS label
       FROM documents,
            (SELECT unnest(generate_series(1, 5)) AS annotator) an)"""

  /** Bradley-Terry oracle: aggregates the same win matrix in SQL and
    * unrolls the 8 MM iterations as chained CTEs — identical
    * arithmetic to [[graft.text.Labels.bradleyTerry]]. */
  private def btOracleSql: String = {
    val iters = 8
    val steps = (1 to iters).map { i =>
      val prev = s"it${i - 1}"
      s"""s$i AS MATERIALIZED (SELECT g.i AS player, SUM(g.g / (pa.p + pb.p)) AS denom
             FROM gm g JOIN $prev pa ON pa.player = g.i
                       JOIN $prev pb ON pb.player = g.j
             GROUP BY g.i),
         u$i AS MATERIALIZED (SELECT a.player,
                   CASE WHEN s.denom IS NULL OR s.denom = 0 THEN prev.p
                        ELSE COALESCE(wt.w, 0) / s.denom END AS p
                 FROM allp a
                 LEFT JOIN s$i s ON s.player = a.player
                 LEFT JOIN wtot wt ON wt.i = a.player
                 JOIN $prev prev ON prev.player = a.player),
         it$i AS MATERIALIZED (SELECT player, p / (SELECT SUM(p) FROM u$i) AS p FROM u$i)"""
    }.mkString(",\n         ")
    s"""WITH p0 AS (SELECT d1.source AS sa, d2.source AS sb,
               d1.n_chars AS na, d2.n_chars AS nb
             FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1),
         pr AS MATERIALIZED (SELECT CASE WHEN nb > na THEN sb ELSE sa END AS winner,
                       CASE WHEN nb > na THEN sa ELSE sb END AS loser
                FROM p0),
         wins AS MATERIALIZED (SELECT winner AS i, loser AS j, COUNT(*)::DOUBLE AS w
                  FROM pr WHERE winner <> loser GROUP BY winner, loser),
         allp AS MATERIALIZED (SELECT DISTINCT player FROM
                    (SELECT i AS player FROM wins
                     UNION ALL SELECT j FROM wins) q),
         gm AS MATERIALIZED (SELECT a.player AS i, b.player AS j,
                  COALESCE(w1.w, 0) + COALESCE(w2.w, 0) AS g
                FROM allp a JOIN allp b ON a.player <> b.player
                LEFT JOIN wins w1 ON w1.i = a.player AND w1.j = b.player
                LEFT JOIN wins w2 ON w2.i = b.player AND w2.j = a.player
                WHERE COALESCE(w1.w, 0) + COALESCE(w2.w, 0) > 0),
         wtot AS MATERIALIZED (SELECT i, SUM(w) AS w FROM wins GROUP BY i),
         it0 AS MATERIALIZED (SELECT player, 1.0 / (SELECT COUNT(*) FROM allp) AS p FROM allp),
         $steps
         SELECT f.player, CAST(COALESCE(wt.w, 0) AS BIGINT) AS n_wins,
           CAST(COALESCE(gt.tg, 0) AS BIGINT) AS n_games,
           round(f.p, 6) + 0.0 AS rating,
           ROW_NUMBER() OVER (ORDER BY round(f.p, 6) DESC, f.player) AS rank
         FROM it$iters f
         LEFT JOIN wtot wt ON wt.i = f.player
         LEFT JOIN (SELECT i, SUM(g) AS tg FROM gm GROUP BY i) gt
           ON gt.i = f.player"""
  }

  /** Shared CTEs for the URL family: `u` rebuilds [[synthUrl]], then
    * c1/c2/canon mirror [[graft.text.UrlOps.canonicalizeUrl]] step for
    * step (scheme/host lowering, userinfo + www + default-port strip,
    * tracking-param filter + byte-wise sort, trailing-slash collapse,
    * fragment drop). */
  private val urlSqlCtes: String =
    """u AS (SELECT doc_id,
           'HTTPS://' || CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END ||
           CASE WHEN doc_id % 7 = 0 THEN 'm.' ELSE '' END ||
           'Site' || CAST(doc_id % 5 AS VARCHAR) || '.' ||
           CASE WHEN doc_id % 3 = 0 THEN 'com'
                WHEN doc_id % 3 = 1 THEN 'co.uk' ELSE 'org' END ||
           ':443/Path/' || CAST(doc_id % 10 AS VARCHAR) ||
           CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END ||
           '?utm_source=feed&b=1&a=' || CAST(doc_id % 2 AS VARCHAR) ||
           CASE WHEN doc_id % 2 = 1 THEN '&fbclid=XY' ELSE '' END ||
           '#frag' AS url
         FROM documents),
         c1 AS (SELECT doc_id, url,
           lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
           lower(string_split(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1), '@')[-1]) AS hp,
           regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS rawpath,
           regexp_extract(url, '\?([^#]*)', 1) AS rawq
         FROM u),
         c2 AS (SELECT doc_id, url, scheme,
           regexp_replace(string_split(hp, ':')[1], '^www\.', '') AS host,
           CASE WHEN len(string_split(hp, ':')) > 1
                THEN string_split(hp, ':')[2] ELSE '' END AS port,
           CASE WHEN regexp_replace(rawpath, '/+$', '') = '' THEN '/'
                ELSE regexp_replace(rawpath, '/+$', '') END AS path,
           array_to_string(list_sort(list_filter(string_split(rawq, '&'),
             x -> x <> '' AND NOT regexp_matches(x, '^(utm_|fbclid=|gclid=|ref=)'))), '&') AS q
         FROM c1),
         canon AS (SELECT doc_id, url,
           CASE WHEN scheme = '' THEN url ELSE
             scheme || '://' || host ||
             CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
                    OR (scheme = 'https' AND port = '443'))
                  THEN ':' || port ELSE '' END ||
             path || CASE WHEN q <> '' THEN '?' || q ELSE '' END END AS canonical
         FROM c2)"""

  /** Registrable-domain (eTLD+1) expression over c2.host — the same
    * two-level suffix list as [[graft.text.UrlOps.defaultMultiSuffixes]]. */
  private def domainSqlExpr: String = {
    val list = graft.text.UrlOps.defaultMultiSuffixes
      .map(s => s"'$s'").mkString(", ")
    s"""CASE WHEN len(string_split(host, '.')) >= 3
              AND array_to_string(string_split(host, '.')[-2:], '.') IN ($list)
             THEN array_to_string(string_split(host, '.')[-3:], '.')
             WHEN len(string_split(host, '.')) >= 2
             THEN array_to_string(string_split(host, '.')[-2:], '.')
             ELSE host END"""
  }
}
