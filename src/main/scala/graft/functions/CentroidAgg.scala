package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator computing a mean vector (centroid) per group in
  * ONE pass with map-side partial aggregation — SURVEY §2.9 tier 2
  * (reserved for vector centroids). Replaces the
  * posexplode → per-component avg → collect_list → re-assemble plan
  * shape, which costs two shuffles and a per-group sort; this buffers
  * a running (sum-vector, count) pair of constant size per group, so
  * at corpus scale the shuffle carries |labels| × dim doubles, not
  * rows × dim.
  */
object CentroidAgg extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    val sums = if (b._1.isEmpty) new Array[Double](v.length) else b._1
    var i = 0
    while (i < v.length) { sums(i) += v(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      var i = 0
      while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.empty else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(ExpressionEncoders.arrayDouble, Encoders.scalaLong)

  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoders.seqDouble
}

/** Encoders needed outside a SparkSession.implicits scope. */
private[graft] object ExpressionEncoders {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  val arrayDouble: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  val seqDouble: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
