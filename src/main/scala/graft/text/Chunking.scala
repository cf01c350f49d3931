package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking — fixed-width overlapping character windows, the
  * layout step for embedding/RAG indexing and long-doc pretraining
  * prep. Chunk offsets are 0, stride, 2·stride, … while the offset is
  * inside the doc; the final chunk is clipped at the end of the text
  * (so every character is covered when stride ≤ width, and chunk
  * boundaries are a pure function of (len, width, stride) — fully
  * reproducible, no state).
  *
  * Scale shape: one zero-shuffle scan — `sequence` + `posexplode` +
  * `substring`, all codegen'd; output size is the only cost
  * (len/stride chunks per doc). Empty docs produce no chunks.
  */
object Chunking {

  /** (idCol, chunk_idx, chunk_start, chunk_text) per window. */
  def charChunks(docs: DataFrame, idCol: String, textCol: String,
      width: Int, stride: Int): DataFrame = {
    require(width > 0 && stride > 0, "width and stride must be positive")
    docs
      .select(col(idCol), col(textCol).as("_text"),
        length(col(textCol)).cast("long").as("_len"))
      .filter(col("_len") > 0)
      .select(col(idCol), col("_text"),
        posexplode(sequence(lit(0L), col("_len") - 1, lit(stride.toLong)))
          .as(Seq("chunk_idx", "chunk_start")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk_start"),
        expr(s"substring(_text, cast(chunk_start + 1 as int), $width)")
          .as("chunk_text"))
  }
}
