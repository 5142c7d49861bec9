package graft.streaming

import graft.queries.TextQueries
import org.apache.spark.sql.DataFrame

/** Streaming document ingest for the RAG chunk index — [[KnnIngest]]'s
  * twin for retrieval: a document stream (doc_id, text) drives
  * `writeStream.foreachBatch(ingest.foldBatch _)`, each micro-batch
  * folding through [[TextQueries.ragIndexAppend]] (sparse half exactly
  * incremental, dense half under the frozen build quantizer/centroids).
  * The live index serves hybrid queries between batches via
  * [[TextQueries.ragServeDisk]]/[[TextQueries.ragBm25Serve]] and
  * checkpoints with [[TextQueries.ragIndexSave]]; retirements
  * (takedowns) run between batches via [[TextQueries.ragIndexRetire]]
  * on [[index]]. Parity: after any prefix of batches the artifacts
  * equal one append of their union (StreamingSpec, two-way — the
  * sparse merges are associative counts and the dense encodes are
  * per-chunk under a fixed config, so batch boundaries cannot show).
  */
final class RagIngest(initial: TextQueries.RagIndex) {
  @volatile private var current: TextQueries.RagIndex = initial

  /** The live index — serve between batches, or save as a checkpoint. */
  def index: TextQueries.RagIndex = current

  /** foreachBatch sink: fold one micro-batch of (doc_id, text) rows.
    * Document ids must be unique across the index and all batches.
    */
  def foldBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
    if (!batch.isEmpty) current = TextQueries.ragIndexAppend(current, batch)
  }
}
