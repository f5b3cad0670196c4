package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Frequent-item detection at corpus scale: a Misra-Gries sketch proposes
  * candidates WITHOUT shuffling the token stream, then one exact pass over
  * only those candidates disposes — the same propose/verify shape as the
  * dedup candidate generators, applied to frequency.
  *
  * Why not a plain groupBy-count at 100 TB: the full token shuffle is the
  * cost of the query, and almost all of it is spent on the long tail
  * nobody asked about. The sketch is O(k) state per partition, merged as
  * partial aggregates up the normal aggregate tree (no token ever
  * shuffles); the exact pass then shuffles ONLY tokens that survived the
  * sketch — at most k−1 distinct values, pushed into the scan as an
  * isin filter.
  *
  * Correctness is NOT approximate where it matters: Misra-Gries
  * guarantees undercount ≤ n/k under ANY merge tree (Agarwal et al.,
  * "Mergeable Summaries", PODS '12), so every item with true count
  * > n/k is guaranteed to be among the sketch's survivors; the exact
  * pass removes the false positives. The final output — all tokens with
  * exact count·k > n — is therefore deterministic and engine-portable
  * even though intermediate sketch counts depend on merge order, which
  * is what lets a plain SQL HAVING oracle hash-match it.
  */
object HeavyHitters {

  /** Weighted Misra-Gries as a typed [[Aggregator]]: at most k−1
    * counters; an insert that would exceed capacity subtracts the
    * post-insert minimum from every counter and drops zeros — each such
    * decrement destroys ≥ k·d units of mass, which is where the total
    * undercount bound Σd ≤ n/k comes from. `reduce` is a weight-1 offer,
    * `merge` replays the smaller map's counters as weighted offers (a
    * sequence of valid weighted-MG steps, so the bound survives the
    * aggregate tree). */
  final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k >= 2, s"MisraGries needs k >= 2, got $k")

    override def zero: Map[String, Long] = Map.empty

    private def offer(m: Map[String, Long], item: String, w: Long): Map[String, Long] = {
      val bumped = m.updated(item, m.getOrElse(item, 0L) + w)
      if (bumped.size <= k - 1) bumped
      else {
        val d = bumped.values.min
        bumped.collect { case (i, c) if c > d => i -> (c - d) }
      }
    }

    override def reduce(m: Map[String, Long], item: String): Map[String, Long] =
      offer(m, item, 1L)

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      b.foldLeft(a) { case (m, (i, c)) => offer(m, i, c) }

    override def finish(m: Map[String, Long]): Map[String, Long] = m

    override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  /** Exact heavy tokens (count·k > n) over the documents corpus via the
    * sketch-propose / exact-verify two-pass. The whitespace tokenization
    * and the empty-token filter match the text-family convention, so the
    * oracle is the plain HAVING aggregation. */
  def heavyTokens(docs: DataFrame, k: Int = 32): DataFrame = {
    val toks = docs
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    // ONE aggregate job produces both the merged sketch and the exact
    // total: the sketch rides the normal partial-aggregate tree. Typed
    // select so the Aggregator's String input encoder binds to the rows.
    val spark = docs.sparkSession
    import spark.implicits._
    val (sketch, n) = toks.as[String]
      .select(new MisraGries(k).toColumn, count(lit(1)).as[Long])
      .head()
    val candidates = sketch.keys.toSeq
    toks
      .filter(col("token").isin(candidates: _*))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      // integer gate — cnt > n/k without a division to round
      .filter(col("cnt") * k > n)
  }
}
