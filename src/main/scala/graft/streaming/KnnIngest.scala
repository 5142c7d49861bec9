package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame

/** Streaming ingest for the incremental k-NN index — the q167d trickle
  * regime as an actual Structured Streaming pipeline: a vector stream
  * drives `writeStream.foreachBatch(ingest.foldBatch _)`, each
  * micro-batch folds into the index through
  * [[Similarity.knnGraphAppend]] (the returned-index chaining
  * contract), and [[edges]] reads the mutual graph between batches.
  *
  * The state IS the index: held on the driver like any
  * foreachBatch-maintained artifact (its payload tables live as
  * checkpointed/Filescan frames on the executors — nothing data-scale
  * sits in driver memory), persisted with [[Similarity.knnIndexSave]]
  * at whatever cadence the caller checkpoints, and reconstitutable in a
  * fresh session with [[Similarity.knnIndexLoad]] — so a crashed ingest
  * resumes from the last saved index plus the source's replay, the
  * standard foreachBatch idempotence posture. Every micro-batch pays
  * only the delta-driven serve terms, so the streaming twin inherits
  * q167d's measured amortization (7.7 s per 100-vector trickle at 190k
  * base vs the 149.8 s rebuild).
  *
  * Parity: after any prefix of batches the graph equals the one-shot
  * serve of their union under the frozen config — StreamingSpec asserts
  * the two-way exceptAll through three micro-batches.
  */
final class KnnIngest(initial: Similarity.KnnIndex) {
  @volatile private var current: Similarity.KnnIndex = initial

  /** The live index — serve queries against it between batches, or
    * [[Similarity.knnIndexSave]] it as a streaming checkpoint.
    */
  def index: Similarity.KnnIndex = current

  /** foreachBatch sink: fold one micro-batch of (xid, xvec) rows into
    * the index. Ids must be unique across the index and all batches
    * (the append contract; retirements run between batches via
    * [[Similarity.knnGraphRetire]] on [[index]]).
    */
  def foldBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
    if (!batch.isEmpty) current = Similarity.knnGraphAppend(current, batch)
  }

  /** The mutual k-NN edges of everything ingested so far. */
  def edges: DataFrame = Similarity.mutualize(current.directed)
}
