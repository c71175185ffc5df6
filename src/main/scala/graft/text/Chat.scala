package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Conversation (SFT/RLHF) data preparation: parse chat-transcript JSON
  * — the `{"messages": [{"role", "content"}, ...]}` shape every
  * instruction-tuning corpus ships in — into typed turns, validate the
  * schema a trainer assumes, and render the turn list into the single
  * training string a tokenizer consumes.
  *
  * Everything is a row-local projection over `from_json` (codegen'd
  * Jackson parse, no UDF): no shuffle anywhere except the caller's own
  * aggregations, so a 100 TB transcript corpus flattens at scan speed.
  * Malformed JSON parses to null and flows into `valid = false` rather
  * than failing the job — at corpus scale a poison row must be a
  * statistic, not a stack trace.
  */
object Chat {

  /** The transcript schema: a top-level `messages` array of
    * (role, content) turns. Extra JSON fields are ignored by
    * `from_json` — the standard tolerant-reader discipline. */
  val turnSchemaDdl = "STRUCT<messages: ARRAY<STRUCT<role: STRING, content: STRING>>>"

  /** Roles a trainer's chat template understands. */
  val defaultRoles: Seq[String] = Seq("system", "user", "assistant")

  /** The parsed messages array (null when the JSON is malformed or has
    * no `messages` key). */
  def messages(json: Column): Column =
    from_json(json, org.apache.spark.sql.types.StructType.fromDDL(
      "messages ARRAY<STRUCT<role: STRING, content: STRING>>"))
      .getField("messages")

  /** One row per turn: (id, turn_idx, role, content) — the exploded
    * audit/repair view every per-turn filter (PII scrub, length caps,
    * role-specific dedup) runs on. Conversations that fail to parse
    * yield no rows here; [[stats]] is where they surface. */
  def parseTurns(docs: DataFrame, idCol: String, jsonCol: String): DataFrame =
    docs.select(col(idCol),
        posexplode(messages(col(jsonCol))).as(Seq("turn_idx", "m")))
      .select(col(idCol), col("turn_idx").cast("long").as("turn_idx"),
        col("m.role").as("role"), col("m.content").as("content"))

  /** The schema contract a chat template assumes, as one boolean
    * column: parses, has >= 2 turns, every role is known, every content
    * is non-empty, and there is at least one user and one assistant
    * turn. Array lambdas only — no explode, no shuffle. */
  def schemaValid(json: Column,
                  roles: Seq[String] = defaultRoles): Column = {
    val ms = messages(json)
    val allowed = typedlit(roles)
    ms.isNotNull && size(ms) >= 2 &&
      forall(ms, m => array_contains(allowed, m.getField("role")) &&
        m.getField("content").isNotNull && length(m.getField("content")) > 0) &&
      exists(ms, m => m.getField("role") === "user") &&
      exists(ms, m => m.getField("role") === "assistant")
  }

  /** Per-conversation audit frame: turn counts by role, whitespace
    * token total across contents, and the [[schemaValid]] verdict —
    * the one-pass profile a curation run cuts on. Null/malformed JSON
    * reports 0 turns and valid = false. */
  def stats(docs: DataFrame, idCol: String, jsonCol: String,
            roles: Seq[String] = defaultRoles): DataFrame = {
    val ms = coalesce(messages(col(jsonCol)),
      expr("CAST(array() AS ARRAY<STRUCT<role: STRING, content: STRING>>)"))
    def countRole(r: String) =
      size(filter(ms, m => m.getField("role") === lit(r))).cast("long")
    docs.select(col(idCol),
      size(ms).cast("long").as("n_turns"),
      countRole("user").as("n_user"),
      countRole("assistant").as("n_assistant"),
      // null content must count 0, not fall through to
      // size(split(NULL)) = -1 under the default sizeOfNull
      aggregate(ms, lit(0L), (acc, m) => acc +
          when(m.getField("content").isNull ||
               length(trim(m.getField("content"))) === 0, lit(0L))
            .otherwise(size(split(trim(m.getField("content")), "\\s+"))
              .cast("long")))
        .as("n_tokens"),
      schemaValid(col(jsonCol), roles).as("valid"))
  }

  /** Per-turn content rewrite: the messages array with `f` applied to
    * each turn's content, roles untouched — the hook per-turn hygiene
    * (PII redaction, length caps) hangs on. Null content reaches `f`
    * coalesced to '' so a rewrite rule never has to null-guard. */
  def mapContent(ms: Column, f: Column => Column): Column =
    transform(ms, m => struct(m.getField("role").as("role"),
      f(coalesce(m.getField("content"), lit(""))).as("content")))

  /** [[render]] over an already-parsed (possibly rewritten) messages
    * array — the composition point for parse -> per-turn transform ->
    * render chains that must not re-parse the JSON per stage. */
  def renderTurns(ms: Column): Column =
    coalesce(
      array_join(transform(ms, m =>
        concat(lit("<|"), coalesce(m.getField("role"), lit("")), lit("|>"),
          coalesce(m.getField("content"), lit("")))), ""),
      lit(""))

  /** Render the turn list to the single training string: each turn
    * becomes `<|role|>content`, concatenated in order — the flattening
    * a tokenizer consumes. Null/malformed JSON renders as ''; a turn
    * with null content keeps its `<|role|>` marker (content coalesced
    * to '') rather than vanishing from the transcript. */
  def render(json: Column): Column = renderTurns(messages(json))
}
