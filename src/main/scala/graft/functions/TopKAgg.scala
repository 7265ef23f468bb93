package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state per-group top-k as a typed Aggregator (SURVEY §2.9
  * tier 2, same family as [[CentroidAgg]]/[[FreqItemsAgg]]): keep the
  * k best (key, id) pairs by (key DESC, id ASC), exactly and
  * deterministically — the ordering is total, so unlike a sketch the
  * result is independent of Spark's partial/merge order.
  *
  * This is the scale-correct shape for "top k rows per group": a
  * window `row_number() ≤ k` shuffles EVERY row to its group's
  * partition and sorts the whole group, while this aggregate carries
  * at most k pairs per group per partition into the exchange —
  * map-side partial combine does the pruning. At 100 TB with
  * million-row groups that is the difference between shuffling the
  * corpus and shuffling k·|groups| tuples.
  *
  * Buffer is a Seq ordered by (key DESC, id ASC), truncated to k on
  * every reduce/merge, so partial state never exceeds k entries.
  */
final class TopKAgg(k: Int)
  extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

  require(k >= 1, "top-k size must be >= 1")

  private val ord: Ordering[(Long, Long)] =
    Ordering.by { case (key, id) => (-key, id) }

  override def zero: Seq[(Long, Long)] = Seq.empty

  override def reduce(b: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] =
    // b stays sorted; a full sort of <= k+1 elements is cheap at small k
    ((x +: b).sorted(ord)).take(k)

  override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] = TopKAgg.seqLongLong

  override def outputEncoder: Encoder[Seq[(Long, Long)]] = TopKAgg.seqLongLong
}

object TopKAgg {
  private[graft] val seqLongLong: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}
