package graft

import org.apache.spark.sql.functions._
import graft.ops.{Quantization, Similarity}

class QuantizationSpec extends SparkSpec {
  import spark.implicits._

  test("codes are int8-range and dequantization reconstructs within one step") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = Quantization.quantize(emb)
    assert(q.schema("codes").dataType ===
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType))
    // byte-range check must run on the PRE-cast doubles (a Byte compared
    // against Byte bounds is vacuously in range even after a wraparound)
    val raw = emb.select(Similarity.toDouble(col("embedding")).as("v"))
      .select(col("v"), array_min(col("v")).as("mn"),
        ((array_max(col("v")) - array_min(col("v"))) / 255.0).as("sc"))
      .select(explode(transform(col("v"),
        x => round((x - col("mn")) / col("sc")) - 128)).as("code"))
      .agg(min("code").as("lo"), max("code").as("hi")).collect()(0)
    assert(raw.getDouble(0) >= -128.0 && raw.getDouble(1) <= 127.0)

    // reconstruction error per element is at most qscale/2 (+ float noise)
    val err = Quantization.dequantize(q)
      .join(emb.select(col("vec_id"), Similarity.toDouble(col("embedding")).as("orig")), "vec_id")
      .join(q.select("vec_id", "qscale"), "vec_id")
      .select(aggregate(zip_with(col("v"), col("orig"), (a, b) => abs(a - b)),
        lit(0.0), (acc, x) => greatest(acc, x)).as("max_err"), col("qscale"))
      .filter(col("max_err") > col("qscale") * 0.5000001)
    assert(err.count() === 0)
  }

  test("quantized cosine stays close to exact cosine") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").filter(col("vec_id") < 50)
    val deq = Quantization.dequantize(Quantization.quantize(emb))
    val exact = emb.select(col("vec_id"), Similarity.toDouble(col("embedding")).as("e"))
    val drift = deq.join(exact, "vec_id").as("a")
      .crossJoin(deq.join(exact, "vec_id").as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(abs(Similarity.cosine(col("a.v"), col("b.v"))
        - Similarity.cosine(col("a.e"), col("b.e"))).as("d"))
      .agg(max("d")).collect()(0).getDouble(0)
    assert(drift < 0.02, s"cosine drift $drift too large for candidate generation")
  }
}
