package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a typed Aggregator — the
  * bounded-memory half of the two-pass heavy-hitters pattern
  * (SURVEY §2.9 tier 2, same family as [[CentroidAgg]]).
  *
  * The buffer holds at most k (item, counter) pairs regardless of
  * input size. Guarantees (classic MG + mergeable-summaries):
  *  - every counter is a LOWER bound on the item's true count;
  *  - undercount ≤ N/(k+1) after any sequence of reduces and merges
  *    (merge subtracts the (k+1)-th largest combined counter, which
  *    preserves the bound — Agarwal et al., "Mergeable Summaries");
  *  - therefore any item with true count > N/(k+1) is ALWAYS present
  *    in the final summary, no matter how Spark orders partial
  *    merges.
  *
  * The surviving-item set and counter values below that threshold DO
  * depend on merge order, which is why a pipeline uses this as pass
  * one (candidate generation) and recounts the ≤ k candidates
  * exactly in pass two — the composed result is exact and
  * deterministic while the full-corpus shuffle only ever carries
  * candidate rows. See TextOps.q_heavy_hitters.
  */
final class FreqItemsAgg(k: Int)
  extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {

  require(k >= 1, "summary size must be >= 1")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] =
    b.get(item) match {
      case Some(c) => b.updated(item, c + 1)
      case None if b.size < k => b.updated(item, 1L)
      case None =>
        // decrement-all step: drop zeroed counters, item is absorbed
        b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      // subtract the (k+1)-th largest counter from everything
      val thresh = combined.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
      combined.view.mapValues(_ - thresh).filter(_._2 > 0).toMap
    }
  }

  override def finish(r: Map[String, Long]): Seq[(String, Long)] =
    r.toSeq.sortBy { case (t, c) => (-c, t) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    FreqItemsAgg.mapStringLong

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    FreqItemsAgg.seqStringLong
}

object FreqItemsAgg {
  private[graft] val mapStringLong: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  private[graft] val seqStringLong: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
