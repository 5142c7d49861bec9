package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal (binary) column handling for training-data pipelines: treat
  * image/audio/video payloads as opaque `BinaryType` columns with typed
  * metadata, plus frame-sampling and a feature-extraction stub.
  *
  * The real decode step needs codec libraries not present in this
  * environment, so `decodeStub` produces a DETERMINISTIC FAKE feature
  * (documented as the stub boundary); everything around it — schema,
  * batching, partitioning, the binary slicing — is real Spark plumbing
  * that a production decoder drops into.
  */
object Multimodal {

  /** Attach a binary payload + typed metadata struct derived from it.
    * (Here the payload is the UTF-8 encoding of a text column; in
    * production it is the raw image/audio bytes read from the source.)
    */
  def attachBinary(df: DataFrame, payload: Column): DataFrame =
    df.withColumn("bin", payload)
      .withColumn("meta", struct(
        octet_length(col("bin")).as("n_bytes"),
        lower(hex(substring(col("bin"), 1, 4))).as("head_hex")))

  /** Frame sampling: fixed-length binary frames at a stride — the
    * video-frame / audio-window extraction pattern, as pure codegen'd
    * slicing (no UDF).
    */
  def frameSample(bin: Column, stride: Int, frameLen: Int, maxFrames: Int): Column =
    // empty payloads must yield an empty array — Spark's sequence(0, -1)
    // would DESCEND and emit two bogus offsets
    when(octet_length(bin) > 0,
      transform(
        sequence(lit(0),
          least(floor((octet_length(bin) - 1) / stride).cast("int"), lit(maxFrames - 1))),
        i => lower(hex(substring(bin, (i * stride + 1).cast("int"), lit(frameLen))))))
      .otherwise(array().cast("array<string>"))

  /** STUB: deterministic fake "decoded feature" — a portable hash of the
    * payload standing in for the real decoder output (image embedding,
    * audio fingerprint, ...). Replace with the actual codec call in
    * production; the surrounding pipeline is unchanged.
    */
  def decodeStub(bin: Column): Column =
    graft.functions.Hashing.hash32(lower(hex(bin)))

  /** Batched decode pipeline — the mapInPandas-equivalent shape: payloads
    * stream through `mapPartitions` in fixed-size batches (real decoders
    * amortize model/codec setup per batch, not per record), emitting
    * (id, feature vector). The decoder itself is the documented STUB —
    * a deterministic byte-derived vector; swap in the real codec call and
    * nothing else changes: schema, batching, partitioning are the
    * production plumbing.
    */
  def decodeBatched(df: DataFrame, batchSize: Int = 64): DataFrame = {
    // df: (id: Long, bin: Array[Byte])
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("id"), col("bin"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // per-batch "decoder init" happens here in production
          batch.iterator.map { case (id, bytes) =>
            // STUB decode: 4-dim feature from byte statistics
            val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
            val feature = Array(
              bytes.length.toFloat,
              (sum.toDouble / bytes.length.max(1)).toFloat,
              (bytes.headOption.map(_ & 0xff).getOrElse(0)).toFloat,
              (bytes.lastOption.map(_ & 0xff).getOrElse(0)).toFloat)
            (id, feature)
          }
        }
      }
      .toDF("id", "feature")
  }
}
