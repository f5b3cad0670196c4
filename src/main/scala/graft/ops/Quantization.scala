package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 embedding quantization — the storage scale path for embedding
  * columns: 4× smaller than float32, which at 100 TB of vectors is the
  * difference between memory-resident and spilling ANN cells. Per-vector
  * min/max affine quantization (the simplest deterministic scheme):
  *
  *   scale = (max - min) / 255;  q_i = round((x_i - min) / scale)
  *
  * Dequantized search keeps cosine error small enough for candidate
  * generation; exact re-ranking on the float vectors happens on the
  * (tiny) candidate set only — measured in QuantizationSpec. */
object Quantization {

  private def vd(c: Column): Column = Similarity.toDouble(c)

  /** Per-vector quantization parameters and the int8 codes. */
  def quantize(embeddings: DataFrame): DataFrame = {
    val v = vd(col("embedding"))
    embeddings.select(
      col("vec_id"),
      array_min(v).as("qmin"),
      ((array_max(v) - array_min(v)) / 255.0).as("qscale"),
      transform(v, x =>
        when(array_max(v) === array_min(v), 0)
          .otherwise(round((x - array_min(v)) / ((array_max(v) - array_min(v)) / 255.0))
            .cast("int"))).as("codes"))
  }

  /** Reconstruct approximate double vectors from the codes. */
  def dequantize(quantized: DataFrame): DataFrame =
    quantized.select(
      col("vec_id"),
      transform(col("codes"), q => col("qmin") + q.cast("double") * col("qscale")).as("v"))
}
