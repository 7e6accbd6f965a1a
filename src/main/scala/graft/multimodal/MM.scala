package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal column handling: media payloads as opaque `binary`
  * columns with typed metadata beside them. The Spark-side plumbing is
  * real — a true BinaryType column flows through the plan, metadata is
  * computed from it, the schema is what a decode stage downstream would
  * consume. The decode itself (image/audio codecs are not in this
  * container) is a clearly-marked deterministic STUB: format/dims are
  * derived from doc_id, decode_ok from the payload — swap
  * `stubDecode` for a real mapInPandas/mapPartitions decoder without
  * touching the rest of the pipeline.
  */
object MM {

  /** documents.text → a binary payload column (the stand-in for real
    * image/audio bytes; byte-accurate for ASCII so the oracle agrees). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** STUB decode — deterministic fake metadata in place of a codec. */
  def stubDecode(withBytes: DataFrame): DataFrame =
    withBytes.select(
      col("doc_id"),
      length(col("payload")).as("n_bytes"),
      when(col("doc_id") % 3 === 0, "jpeg")
        .when(col("doc_id") % 3 === 1, "png")
        .otherwise("wav").as("format"),
      (lit(64) + col("doc_id") % 512).as("width"),
      (lit(64) + (col("doc_id") * 7) % 512).as("height"),
      when(col("doc_id") % 3 === 2, 16000).otherwise(lit(null).cast("int")).as("sample_rate"),
      (length(col("payload")) > 0).as("decode_ok"))

  def meta(docs: DataFrame): DataFrame = stubDecode(withPayload(docs))
}
