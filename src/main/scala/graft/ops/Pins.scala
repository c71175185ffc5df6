package graft.ops

import org.apache.spark.sql.DataFrame

/** The one pin primitive every operator's plan-truncation point uses
  * (always via `.transform(Pins.pin)` so call sites stay import-free).
  *
  * A "pin" eagerly materializes a small-by-construction intermediate
  * frame and truncates its lineage, so a frame with several consumers
  * is computed once instead of re-planned per consumer (see PINNING.md
  * for the inventory of sites and each one's size bound). By default it
  * is `localCheckpoint()`: executor-local MEMORY_AND_DISK blocks, no
  * reliable storage — the cheapest truncation, and the right one for
  * local/single-node runs and for frames cheap to recompute.
  *
  * The documented trade (guide §5): localCheckpoint truncates lineage
  * WITHOUT reliable storage, so on a real cluster an executor loss
  * makes the pinned blocks unrecoverable and fails the query instead of
  * recomputing it. Every pin site bounds its frame (candidate pairs,
  * per-batch rows, vocabulary-sized aggregates — never the corpus),
  * which makes the failure window small but not zero. For cluster runs
  * where queries must survive executor loss, set
  *
  *   spark.graft.pins.reliable = true
  *
  * and give the context a checkpoint dir (`sparkContext.setCheckpointDir`
  * on durable storage): every pin then routes through the RELIABLE
  * `checkpoint()` — same eager materialization, same lineage
  * truncation, same results, blocks recoverable from storage. The cost
  * is one write+read of each pinned frame to the checkpoint dir, which
  * is why it is a deployment conf and not the default at local scale.
  */
object Pins {
  def pin(df: DataFrame): DataFrame =
    if (df.sparkSession.conf
        .getOption("spark.graft.pins.reliable").contains("true"))
      df.checkpoint()
    else df.localCheckpoint()
}
