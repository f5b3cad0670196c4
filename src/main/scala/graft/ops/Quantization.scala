package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 embedding quantization — the storage scale path for embedding
  * columns: 4× smaller than float32, which at 100 TB of vectors is the
  * difference between memory-resident and spilling ANN cells. Per-vector
  * min/max affine quantization (the simplest deterministic scheme):
  *
  *   scale = (max - min) / 255;  q_i = round((x_i - min) / scale) - 128  ∈ [-128, 127]
  *
  * Dequantized search keeps cosine error small enough for candidate
  * generation; exact re-ranking on the float vectors happens on the
  * (tiny) candidate set only — measured in QuantizationSpec. */
object Quantization {

  private def vd(c: Column): Column = Similarity.toDouble(c)

  /** Per-vector quantization parameters and the int8 codes. Params are
    * projected first so the per-element lambda references them as columns
    * (inlining array_min/max into the lambda would re-scan the vector per
    * element — O(d²)). */
  def quantize(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), vd(col("embedding")).as("v"))
      .select(col("vec_id"), col("v"),
        array_min(col("v")).as("qmin"),
        ((array_max(col("v")) - array_min(col("v"))) / 255.0).as("qscale"))
      .select(
        col("vec_id"), col("qmin"), col("qscale"),
        // shift 0..255 → -128..127 so the codes genuinely fit TINYINT —
        // array<byte> is what delivers the 4× in-memory win over float32
        transform(col("v"), x =>
          when(col("qscale") === 0.0, lit(-128))
            .otherwise(round((x - col("qmin")) / col("qscale")) - 128)
            .cast("byte")).as("codes"))

  /** Reconstruct approximate double vectors from the codes. */
  def dequantize(quantized: DataFrame): DataFrame =
    quantized.select(
      col("vec_id"),
      transform(col("codes"),
        q => col("qmin") + (q.cast("double") + 128.0) * col("qscale")).as("v"))
}
