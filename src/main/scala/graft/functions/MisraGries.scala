package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries frequent-items summary (Misra & Gries 1982; mergeable form
  * per Agarwal et al., "Mergeable Summaries", PODS 2012) as a typed
  * [[Aggregator]] — the bounded-memory candidate pass of exact distributed
  * heavy-hitter detection.
  *
  * The problem at 100 TB: "which tokens/URLs/domains exceed x‰ of the
  * corpus" cannot run as a full `groupBy(key).count` when the key universe
  * is billions — the shuffle carries the whole vocabulary. Misra-Gries
  * keeps at most `k` counters per partial aggregate and GUARANTEES that
  * every key whose true count exceeds n/(k+1) survives; the counters
  * undercount by at most n/(k+1). The classic two-pass exact protocol then
  * semi-joins the ≤ k candidates back over the data for exact counts —
  * bounded state in pass 1, candidate-sized shuffle in pass 2, exact and
  * deterministic output (see [[graft.operators.Sketch.heavyHitters]]).
  *
  * Why the output survives ANY partitioning/merge order: intermediate MG
  * counter VALUES are merge-order-dependent, but the survival guarantee is
  * not — the merge subtracts the (k+1)-th largest summed count from every
  * counter (each subtraction of 1 from a surviving key's count is matched
  * by k other decrements, so total decrement "budget" stays ≤ n/(k+1)).
  * The finish step therefore discards the counters and emits candidate
  * KEYS only; exactness comes from the verify pass, never from the sketch.
  *
  * Buffer is a Map[String, Long] with ≤ k entries — at k ≤ a few hundred
  * this is a KB-scale partial per mapper, independent of corpus size.
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(k >= 1, s"need at least one counter, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], key: String): Map[String, Long] =
    buf.get(key) match {
      case Some(c)              => buf.updated(key, c + 1)
      case None if buf.size < k => buf.updated(key, 1L)
      case None =>
        // classic MG step: a full house + an unseen key decrements every
        // counter by 1 (dropping zeros) — k+1 distinct keys each "pay" 1.
        buf.collect { case (t, c) if c > 1 => (t, c - 1L) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // Mergeable-summaries MG merge: subtract the (k+1)-th largest summed
      // count from every counter and drop the non-positive — at most k
      // counters stay strictly above it, and the union inherits the
      // n/(k+1) undercount bound.
      val kth = summed.valuesIterator.toIndexedSeq
        .sorted(Ordering[Long].reverse)(k)
      summed.collect { case (t, c) if c > kth => (t, c - kth) }
    }
  }

  override def finish(buf: Map[String, Long]): Seq[String] =
    buf.keysIterator.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}

object MisraGries {
  /** Column form: `candidates(k)(col("token"))` → array<string> of ≤ k
    * candidate keys (sorted), containing EVERY key with true count
    * > n/(k+1). */
  def candidates(k: Int): Column => Column = {
    val fn = udaf(new MisraGriesAggregator(k))
    key => fn(key)
  }
}
