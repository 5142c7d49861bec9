package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming ingest for the incremental dedup components — the third
  * build/serve family's twin to [[KnnIngest]]/[[RagIngest]], completing
  * the symmetry: every amortized index in the engine (k-NN graph, RAG
  * chunk index, near-dup connected components) now takes a document
  * stream through `writeStream.foreachBatch(ingest.foldBatch _)`.
  *
  * State is the dedup family's index: the BAND TABLE under its frozen
  * geometry (signatures never re-derive mid-increment — the q110/q183
  * versioned-geometry convention) plus the component LABELS (full-graph
  * component minima). Each micro-batch of (doc_id, text) rows:
  *
  *  1. minhashes + bands under the FROZEN (bands, rowsPerBand) config;
  *  2. derives the delta-scale star edges ([[Dedup.ccDeltaStarEdges]] —
  *     only buckets the batch touches re-window, hub changes included);
  *  3. folds them through [[Dedup.ccIncrementalServe]] (contract through
  *     the labels, CC the delta-sized graph, compose) — the returned
  *     labels are again full-graph minima, which is exactly what makes
  *     consecutive batches CHAIN;
  *  4. appends the batch's bands to the band table.
  *
  * REPLAY-IDEMPOTENT like its siblings: `batchId`s at or below the last
  * folded fold as no-ops, and the cursor persists atomically WITH the
  * index ([[save]] → the [[graft.core.IndexStore]] commit marker;
  * [[CcIngest.resume]] restores it). CHAIN-DEPTH BOUNDED: labels
  * checkpoint every fold (they are the contraction input); the band
  * table flattens every `flattenEvery` folded batches.
  *
  * Parity: after any prefix of batches [[labels]] equals the one-shot
  * incremental serve of the union delta — StreamingSpec asserts it
  * two-way; q183b pins the folded labels against q183's full-graph
  * recursive-closure oracle on the board, replayed duplicate included.
  */
final class CcIngest(initialBands: DataFrame, initialLabels: DataFrame,
                     nBands: Int, rowsPerBand: Int,
                     initialCount: Long = 0L,
                     startAfterBatch: Long = -1L,
                     flattenEvery: Int = KnnIngest.DefaultFlattenEvery,
                     baseVersion: Long = -1L) {
  @volatile private var bandTable: DataFrame = initialBands
  @volatile private var lbls: DataFrame = initialLabels
  @volatile private var last: Long = startAfterBatch
  @volatile private var nDocs: Long = initialCount
  private var folded: Long = 0L

  /** The live component labels (id, lbl) — full-graph component minima
    * over everything ingested so far.
    */
  def labels: DataFrame = lbls

  /** The live band table (id, band, key) under the frozen geometry. */
  def bands: DataFrame = bandTable

  /** The last folded batch id — the replay cursor [[save]] persists. */
  def lastBatch: Long = last

  /** The CURRENT corpus count under the build's definition (document
    * count — build count + every folded batch's rows), the n
    * [[Dedup.ccStaleness]] compares geometry against. Persisted with
    * the index ([[save]]) so the definition survives the disk hop.
    */
  def docCount: Long = nDocs

  /** foreachBatch sink: fold one micro-batch of (doc_id, text) rows.
    * Document ids must be unique across the index and all batches.
    * Batches at or below the last folded id are REPLAYS (at-least-once
    * delivery) and fold as no-ops.
    */
  def foldBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
    if (batchId <= last) return
    val batchN = batch.count()
    if (batchN > 0) {
      val db = Dedup.lshBands(
        Dedup.minhash(batch, col("doc_id"), Dedup.bigrams(col("text")),
          nBands * rowsPerBand),
        nBands, rowsPerBand).localCheckpoint(true)
      val edges = Dedup.ccDeltaStarEdges(bandTable, db)
      lbls = Dedup.ccIncrementalServe(lbls, edges)
        .select(col("doc_id").as("id"), col("component").as("lbl"))
        .localCheckpoint(true) // the next fold contracts through it
      bandTable = bandTable.unionByName(db)
      nDocs += batchN
      folded += 1
      if (flattenEvery > 0 && folded % flattenEvery == 0)
        bandTable = bandTable.localCheckpoint(true)
    }
    last = batchId
  }

  /** Checkpoint the live index + replay cursor as one atomic committed
    * version ([[Dedup.ccIndexSave]]), then RE-POINT the live frames at
    * the version just committed, so a long-lived ingest keeps folding
    * correctly past a SECOND save's prune (the retained version buys
    * one cycle of grace; the reload makes the cadence unbounded —
    * ADVICE r18). The reload also flattens the band table's lazy union
    * chain to a FileScan.
    */
  def save(path: String): Unit = synchronized {
    // append-saves propagate the staleness baseline they resumed from
    Dedup.ccIndexSave(bandTable, lbls, nBands, rowsPerBand, nDocs, path,
      last, baseVersion)
    val (b2, l2, _, _, _) = Dedup.ccIndexLoad(bandTable.sparkSession, path)
    bandTable = b2
    lbls = l2
  }
}

object CcIngest {
  /** Reconstitute an ingest from a [[CcIngest.save]] checkpoint: the
    * latest committed band table + labels + frozen geometry, plus the
    * replay cursor — resumed streams skip the already-folded prefix.
    */
  def resume(s: SparkSession, path: String,
             flattenEvery: Int = KnnIngest.DefaultFlattenEvery): CcIngest = {
    val commit = graft.core.IndexStore.latest(s, path).getOrElse(sys.error(
      s"CcIngest.resume: no committed index at $path"))
    val (bands, labels, bnd, rpb, n) = Dedup.ccIndexLoad(s, path)
    new CcIngest(bands, labels, bnd, rpb, n, commit.lastBatch, flattenEvery,
      commit.baseVersion)
  }
}
