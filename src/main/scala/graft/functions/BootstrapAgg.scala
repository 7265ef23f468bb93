package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** All-B-replicas Poisson bootstrap in ONE typed Aggregator pass
  * (SURVEY §2.9 tier 2, the TopKAgg bounded-buffer discipline): per
  * input row, draw the row's Poisson(1) multiplicity for EVERY
  * replica b ∈ [0, B) and fold (count, Σ value·w) into a fixed
  * 2×B-long buffer — no 32× `explode` row fan-out exists anywhere,
  * the exchange carries one 2×B buffer per map partition.
  *
  * Draws are bit-identical to the exploded formulation (and to the
  * DuckDB oracle): u = the first 8 hex chars of md5("<b>:<key>") as
  * an unsigned 32-bit integer, w = |{t ∈ cdf : u ≥ t}| — the same
  * scaled-CDF comparison, computed here on the digest's first 4
  * bytes directly (hex-substring-parse and big-endian byte read are
  * the same number).
  *
  * Values are exact integer CENTS (the caller converts its
  * DECIMAL(18,2) measure once); sums use Math.addExact/multiplyExact
  * so the ~9.2e18-cent Long headroom fails loudly instead of
  * wrapping (at 9.2e16 dollars that is far above any fixture decade;
  * a corpus beyond it would move the buffer to DECIMAL sums).
  *
  * State bound: 2·B longs per partial regardless of input size —
  * the aggregate's shuffle is O(partitions), never O(rows).
  */
final class BootstrapAgg(b: Int, cdf: Array[Long])
  extends Aggregator[(Long, Long), (Array[Long], Array[Long]),
    Seq[(Long, Long, Long)]] {

  require(b >= 1 && cdf.nonEmpty)

  override def zero: (Array[Long], Array[Long]) =
    (new Array[Long](b), new Array[Long](b))

  override def reduce(buf: (Array[Long], Array[Long]), row: (Long, Long))
    : (Array[Long], Array[Long]) = {
    val (key, cents) = row
    val md = BootstrapAgg.md5.get()
    var i = 0
    while (i < b) {
      md.reset()
      val d = md.digest(
        (i.toString + ":" + key.toString).getBytes(StandardCharsets.US_ASCII))
      val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var w = 0L
      var t = 0
      while (t < cdf.length) { if (u >= cdf(t)) w += 1; t += 1 }
      if (w > 0) {
        buf._1(i) = Math.addExact(buf._1(i), w)
        buf._2(i) = Math.addExact(buf._2(i), Math.multiplyExact(w, cents))
      }
      i += 1
    }
    buf
  }

  override def merge(a: (Array[Long], Array[Long]),
    c: (Array[Long], Array[Long])): (Array[Long], Array[Long]) = {
    var i = 0
    while (i < b) {
      a._1(i) = Math.addExact(a._1(i), c._1(i))
      a._2(i) = Math.addExact(a._2(i), c._2(i))
      i += 1
    }
    a
  }

  override def finish(buf: (Array[Long], Array[Long]))
    : Seq[(Long, Long, Long)] =
    (0 until b).map(i => (i.toLong, buf._1(i), buf._2(i)))

  override def bufferEncoder: Encoder[(Array[Long], Array[Long])] =
    ExpressionEncoder[(Array[Long], Array[Long])]()

  override def outputEncoder: Encoder[Seq[(Long, Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long, Long)]]()
}

object BootstrapAgg {
  /** MessageDigest is stateful and not thread-safe; one per task thread. */
  private val md5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
}
