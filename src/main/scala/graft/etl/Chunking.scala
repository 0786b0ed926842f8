package graft.etl

import graft.functions.F
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking for training-data prep: split each document's
  * token stream into fixed-size windows with overlap (stride < window), the
  * standard shape for LM pretraining where examples longer than the context
  * must be windowed rather than truncated.
  *
  * Pure per-row arithmetic — `sequence` + `posexplode` + `slice`, no
  * shuffle at all, so it composes map-side with any downstream grouping.
  * Chunk count per doc: 1 + max(0, ceil((n - window) / stride)); the last
  * chunk is clamped to the document end (never padded), and every token
  * index is covered because stride ≤ window.
  */
object Chunking {

  def tokenWindows(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = F.tokens(col(textCol))
    val n = size(toks).cast("long")
    // ceil((n - window) / stride) in integer arithmetic, clamped at 0.
    // Null text must yield NO chunks — but Spark's greatest() IGNORES
    // nulls (greatest(0, null) = 0), so without the explicit where() a
    // null doc would fabricate one empty chunk.
    val nChunks = lit(1L) +
      greatest(lit(0L), floor((n - window + stride - 1) / lit(stride.toLong)))
    docs
      .where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), toks.as("toks"), n.as("n_tok"),
        nChunks.as("n_chunks"))
      .select(col("doc_id"), col("toks"), col("n_tok"),
        posexplode(sequence(lit(0L), col("n_chunks") - 1))
          .as(Seq("_p", "chunk_id")))
      .withColumn("start_tok", col("chunk_id") * stride)
      .withColumn("n_tok_chunk",
        least(lit(window.toLong), col("n_tok") - col("start_tok")))
      .withColumn("n_chars_chunk",
        length(concat_ws(" ",
          slice(col("toks"), (col("start_tok") + 1).cast("int"),
            col("n_tok_chunk").cast("int")))).cast("long"))
      .select("doc_id", "chunk_id", "start_tok", "n_tok_chunk",
        "n_chars_chunk")
  }
}
