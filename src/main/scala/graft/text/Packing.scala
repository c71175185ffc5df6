package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing: lay the corpus out as one long
  * token stream in deterministic id order, then cut it into fixed-length
  * context windows — the layout step a pre-training data loader needs
  * (every GPT-style pipeline packs documents this way; EOD tokens and
  * attention resets are the consumer's concern, the engine's job is the
  * deterministic offset arithmetic).
  *
  * The core is a GLOBAL prefix sum over ids, which a naive
  * `Window.orderBy(id)` would compute on a single partition — a
  * scale-killer. Here it is the classic two-phase distributed scan:
  * range-partition by id, per-partition running sums (parallel windows),
  * plus a driver-side exclusive prefix over the per-partition totals
  * (numPartitions values — trivially small) broadcast back in. One range
  * shuffle, one tiny collect; no single-partition stage anywhere.
  */
object Packing {

  /** Assign each doc its half-open span [start_offset, start_offset+n)
    * in the concatenated token stream and the context windows it lands
    * in (`seq_first`..`seq_last`, window length `ctxLen`). Zero-token
    * docs are dropped — they occupy no space in the stream.
    *
    * Output: (id, n_tokens, start_offset, seq_first, seq_last).
    * Deterministic in the id order regardless of input layout. */
  def packSequences(docs: DataFrame, idCol: String, nTokensCol: String,
                    ctxLen: Int): DataFrame = {
    require(ctxLen >= 1, s"packSequences: ctxLen must be >= 1, got $ctxLen")
    // localCheckpoint pins the range boundaries: the frame feeds both the
    // per-partition-totals collect and the main query, and must see ONE
    // consistent partitioning (range sampling is not replay-stable)
    val spread = docs
      .select(col(idCol).as("id"), col(nTokensCol).cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
      .repartitionByRange(col("id"))
      .sortWithinPartitions("id")
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val totals = spread.groupBy(col("__pid")).agg(sum(col("n_tokens")).as("tot"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, tot)) =>
      (pid, acc + tot)
    }.init.map(_._2) // exclusive prefix: offset of partition i = sum of totals < i
    val spark = docs.sparkSession
    import spark.implicits._
    val offsetDf = totals.map(_._1).zip(offsets).toSeq.toDF("__pid", "__poff")
    val w = Window.partitionBy(col("__pid")).orderBy(col("id"))
    spread.join(broadcast(offsetDf), Seq("__pid"))
      .withColumn("start_offset",
        col("__poff") + sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_first", floor(col("start_offset") / ctxLen))
      .withColumn("seq_last",
        floor((col("start_offset") + col("n_tokens") - 1) / ctxLen))
      .select(col("id").as(idCol), col("n_tokens"), col("start_offset"),
        col("seq_first"), col("seq_last"))
  }
}
