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

  /** Driver-side sketch merge — the same weighted offers the Aggregator
    * replays, exposed for cross-batch state maintenance (the streaming
    * face folds each micro-batch's sketch into the stored one; the
    * mergeable-summaries bound is indifferent to the merge tree). */
  def mergeSketches(a: Map[String, Long], b: Map[String, Long], k: Int): Map[String, Long] =
    new MisraGries(k).merge(a, b)

  /** The tokenization every pass shares (whitespace split, empty tokens
    * dropped — the text-family convention the oracles mirror). */
  def tokensOf(docs: DataFrame): DataFrame =
    docs
      .filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")

  /** Exact heavy tokens (count·k > n) over the documents corpus via the
    * sketch-propose / exact-verify two-pass. The whitespace tokenization
    * and the empty-token filter match the text-family convention, so the
    * oracle is the plain HAVING aggregation. */
  def heavyTokens(docs: DataFrame, k: Int = 32): DataFrame = {
    val toks = tokensOf(docs)
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

  /** Serve the streamed sketch state against the archived corpus: the
    * state's candidates (≤ k−1) are exactly verified over `docs` and
    * gated on count·k > n with the STREAM's total n — provided the
    * archive holds the same documents the stream saw, the n/k guarantee
    * makes this equal to [[heavyTokens]] run directly (spec'd). A state
    * with no total row fails loudly — it isn't a sketch state. */
  def serveHeavyTokens(docs: DataFrame, state: DataFrame, k: Int = 32): DataFrame = {
    val rows = state.collect()
    val n = rows.find(_.isNullAt(0)).map(_.getLong(1)).getOrElse(
      sys.error("serveHeavyTokens: state has no (null, n) total row"))
    val candidates = rows.filter(!_.isNullAt(0)).map(_.getString(0)).toSeq
    tokensOf(docs)
      .filter(col("token").isin(candidates: _*))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > n)
  }
}
