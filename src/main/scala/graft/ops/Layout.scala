package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering for multi-dimensional pruning at 100 TB.
  *
  * A parquet scan prunes row groups by min/max stats, which only works for
  * the leading sort column. Z-order (Morton) interleaving folds TWO
  * dimensions into one sort key so that range predicates on EITHER column
  * map to a bounded number of key ranges — the standard lakehouse layout
  * technique for "filter by a OR by b" workloads. The key is a pure
  * bit-shuffle (static expression tree of shifts/masks — whole-stage
  * codegen'd, no UDF), so it is engine-portable and oracle-checkable.
  *
  * `clusterByZorder` is the write-path shape: range-partition by the key
  * (so files tile the Z-curve) and sort within partitions (so row groups
  * tile it too); the downstream reader then prunes on either dimension's
  * min/max. At 100 TB this is one exchange over the data being written —
  * the same cost as any global sort-on-write, but serving two dimensions.
  */
object Layout {

  /** Interleave the low `bits` bits of two non-negative integral columns
    * into a Z-order key: x's bit i → key bit 2i, y's bit i → key bit 2i+1.
    * Inputs are masked to `bits` (callers quantize wider domains first —
    * e.g. floor(price) or a bucketed hash). 2·bits ≤ 62 keeps the key in
    * a positive long. */
  def zorderKey(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of (0, 31]: $bits")
    val xs = x.cast("long")
    val ys = y.cast("long")
    val key = (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    // A negative input's two's-complement low bits would silently scatter
    // the row across the curve and degrade pruning with no symptom — fail
    // loudly instead (callers quantize signed domains first). raise_error
    // is codegen'd, so the guard stays inside whole-stage codegen.
    when(xs < 0 || ys < 0,
      raise_error(concat(lit("zorderKey: negative input x="), xs.cast("string"),
        lit(" y="), ys.cast("string"))))
      .otherwise(key)
  }

  /** The matching SQL text for `zorderKey`, for oracles and engines that
    * speak SQL: a sum of disjoint-bit terms (equivalent to the OR-fold). */
  def zorderSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).flatMap(i => Seq(
      s"((($x >> $i) & 1) << ${2 * i})",
      s"((($y >> $i) & 1) << ${2 * i + 1})"))
      .mkString(" + ")

  /** Write-path clustering: range-partition + sort by the Z-key so files
    * and row groups tile the curve. `partitions` sizes the output files —
    * at 100 TB pick data_size / target_file_size. */
  def clusterByZorder(df: DataFrame, x: Column, y: Column,
                      partitions: Int, bits: Int = 16): DataFrame = {
    val keyed = df.withColumn("zkey", zorderKey(x, y, bits))
    keyed.repartitionByRange(partitions, col("zkey"))
      .sortWithinPartitions("zkey")
  }

  /** Hilbert-curve key — Z-order's better-locality sibling: consecutive
    * key values are always GRID NEIGHBORS (unit Manhattan step), so every
    * equal-size key range is one connected region with ~25% shorter
    * perimeter than the Z-curve's blocks, i.e. fewer boundary rows leak
    * into neighboring files per range predicate at the same file count.
    * The mapping is a per-level rotate/reflect state machine — not a flat
    * bit-shuffle — so it lives in a codegen'd custom Expression
    * (functions/LayoutExpressions.HilbertKey) rather than a Column tree;
    * same input contract as [[zorderKey]] (mask to `bits`, negative
    * inputs raise loudly). */
  def hilbertKey(x: Column, y: Column, bits: Int = 16): Column =
    graft.functions.LayoutFunctions.hilbertKey(x, y, bits)

  /** Write-path clustering by the Hilbert key — [[clusterByZorder]] with
    * the better-locality curve. */
  def clusterByHilbert(df: DataFrame, x: Column, y: Column,
                       partitions: Int, bits: Int = 16): DataFrame = {
    val keyed = df.withColumn("hkey", hilbertKey(x, y, bits))
    keyed.repartitionByRange(partitions, col("hkey"))
      .sortWithinPartitions("hkey")
  }
}
