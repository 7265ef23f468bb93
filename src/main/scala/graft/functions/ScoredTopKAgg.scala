package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** [[TopKAgg]]'s (score: Double, id: String) sibling: bounded-state
  * per-group top-k by (score DESC, id ASC) — the shape per-group
  * "best k scored strings" needs (q_topic_terms' distinctive terms).
  * Same contract: the ordering is total (scores are finite, rounded
  * doubles; ids break ties), so the result is independent of Spark's
  * partial/merge order, and partial state never exceeds k pairs —
  * map-side combine prunes before the exchange instead of shuffling
  * every (group, id) row to a #groups-bounded window sort.
  */
final class ScoredTopKAgg(k: Int)
  extends Aggregator[(Double, String), Seq[(Double, String)],
    Seq[(Double, String)]] {

  require(k >= 1, "top-k size must be >= 1")

  private val ord: Ordering[(Double, String)] =
    Ordering.by { case (score, id) => (-score, id) }

  override def zero: Seq[(Double, String)] = Seq.empty

  override def reduce(b: Seq[(Double, String)],
                      x: (Double, String)): Seq[(Double, String)] =
    ((x +: b).sorted(ord)).take(k)

  override def merge(a: Seq[(Double, String)],
                     b: Seq[(Double, String)]): Seq[(Double, String)] =
    (a ++ b).sorted(ord).take(k)

  override def finish(r: Seq[(Double, String)]): Seq[(Double, String)] = r

  override def bufferEncoder: Encoder[Seq[(Double, String)]] =
    ScoredTopKAgg.seqDoubleStr

  override def outputEncoder: Encoder[Seq[(Double, String)]] =
    ScoredTopKAgg.seqDoubleStr
}

object ScoredTopKAgg {
  private[graft] val seqDoubleStr: Encoder[Seq[(Double, String)]] =
    ExpressionEncoder[Seq[(Double, String)]]()
}
