package graft.streaming

import graft.queries.TextQueries
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming document ingest for the RAG chunk index — [[KnnIngest]]'s
  * twin for retrieval: a document stream (doc_id, text) drives
  * `writeStream.foreachBatch(ingest.foldBatch _)`, each micro-batch
  * folding through [[TextQueries.ragIndexAppend]] (sparse half exactly
  * incremental, dense half under the frozen build quantizer/centroids).
  * The live index serves hybrid queries between batches via
  * [[TextQueries.ragServeDisk]]/[[TextQueries.ragBm25Serve]] and
  * checkpoints with [[save]]; retirements (takedowns) run between
  * batches via [[TextQueries.ragIndexRetire]] on [[index]].
  *
  * REPLAY-IDEMPOTENT: [[foldBatch]] skips any `batchId` at or below
  * the last folded one, so foreachBatch's at-least-once redelivery can
  * never double-append documents. The cursor persists with the index
  * ([[save]] → the [[graft.core.IndexStore]] commit marker) and
  * [[RagIngest.resume]] restores it, so the idempotence holds across
  * crash/restart, not just within a run.
  *
  * CHAIN-DEPTH BOUNDED: appends layer lazy Unions onto postings and
  * the code store; every `flattenEvery` folded batches those frames
  * flatten via localCheckpoint (term stats and totals already
  * checkpoint inside every append), bounding per-batch analysis cost
  * at a constant. Past executor-storage scale, prefer a
  * [[save]]/[[RagIngest.resume]] cadence — the disk round-trip is the
  * flatten.
  *
  * Parity: after any prefix of batches the artifacts equal one append
  * of their union (StreamingSpec, two-way — the sparse merges are
  * associative counts and the dense encodes are per-chunk under a
  * fixed config, so batch boundaries cannot show); q150f pins the
  * folded serve against the frozen-config hybrid oracle on the board.
  */
final class RagIngest(initial: TextQueries.RagIndex,
                      startAfterBatch: Long = -1L,
                      flattenEvery: Int = KnnIngest.DefaultFlattenEvery,
                      baseVersion: Long = -1L) {
  @volatile private var current: TextQueries.RagIndex = initial
  @volatile private var last: Long = startAfterBatch
  private var folded: Long = 0L

  /** The live index — serve between batches, or [[save]] a checkpoint. */
  def index: TextQueries.RagIndex = current

  /** The last folded batch id — the replay cursor [[save]] persists. */
  def lastBatch: Long = last

  /** foreachBatch sink: fold one micro-batch of (doc_id, text) rows.
    * Document ids must be unique across the index and all batches.
    * Batches at or below the last folded id are REPLAYS
    * (at-least-once delivery) and fold as no-ops.
    */
  def foldBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
    if (batchId <= last) return
    if (!batch.isEmpty) {
      current = TextQueries.ragIndexAppend(current, batch)
      folded += 1
      if (flattenEvery > 0 && folded % flattenEvery == 0)
        current = current.copy(
          postings = current.postings.localCheckpoint(true),
          index = current.index.localCheckpoint(true))
    }
    last = batchId
  }

  /** Checkpoint the live index + replay cursor as one atomic committed
    * version ([[TextQueries.ragIndexSave]]), then RE-POINT the live
    * index at the version just committed, so a long-lived ingest keeps
    * folding correctly past a SECOND save's prune (the retained
    * version buys one cycle of grace; the reload makes the cadence
    * unbounded — ADVICE r18). The reload also flattens the lazy union
    * chains to FileScans.
    */
  def save(path: String): Unit = synchronized {
    // append-saves propagate the staleness baseline they resumed from
    TextQueries.ragIndexSave(current, path, last, baseVersion)
    current = TextQueries.ragIndexLoad(
      current.postings.sparkSession, path)
  }
}

object RagIngest {
  /** Reconstitute an ingest from a [[RagIngest.save]] checkpoint: the
    * latest committed index version plus its replay cursor, so resumed
    * streams skip exactly the already-folded replay prefix.
    */
  def resume(s: SparkSession, path: String,
             flattenEvery: Int = KnnIngest.DefaultFlattenEvery): RagIngest = {
    val commit = graft.core.IndexStore.latest(s, path).getOrElse(sys.error(
      s"RagIngest.resume: no committed index at $path"))
    new RagIngest(TextQueries.ragIndexLoad(s, path), commit.lastBatch,
      flattenEvery, commit.baseVersion)
  }
}
