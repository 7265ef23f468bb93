package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as Catalyst
  * higher-order functions (SURVEY §2.11 L3/L4) — codegen'd, no UDFs,
  * fully distributed (no driver-side collect anywhere).
  *
  * Precision contract: every element is cast to DOUBLE before any
  * arithmetic and folds run sequentially left-to-right, so results
  * are bit-identical to the DuckDB oracle's
  * list_sum(list_transform(...)) on the same data (SURVEY §2.12).
  */
object VectorFns {

  /** Sequential-fold double-precision dot product (codegen'd
    * [[VectorDot]]; the equivalent aggregate/zip_with HOF chain is
    * CodegenFallback and ~5× slower interpreted).
    */
  def dot(a: Column, b: Column): Column = VectorExprs.vectorDot(a, b)

  /** Sum of squares (squared L2 norm), codegen'd [[VectorNorm2]]. */
  def norm2(a: Column): Column = VectorExprs.vectorNorm2(a)

  def l2norm(a: Column): Column = sqrt(norm2(a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Deterministic pseudo-random hyperplane sign for LSH bucketing:
    * sign of Σ_d h(plane, d) * v[d], where h is a hash of
    * (plane, dimension) mapped to ±1. xxhash64 is a Spark built-in
    * Expression (codegen'd); no oracle is declared for LSH so no
    * cross-engine parity is needed here.
    */
  def lshSignBit(v: Column, plane: Int): Column = {
    val signed = aggregate(
      zip_with(v, transform(v, (_, i) => pmod(xxhash64(lit(plane), i), lit(2)) * 2 - 1),
        (x, s) => x.cast("double") * s.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    when(signed >= 0, lit(1)).otherwise(lit(0))
  }

  /** K-bit LSH bucket id from sign-random-projections. */
  def lshBucket(v: Column, bits: Int): Column =
    (0 until bits).map(b => lshSignBit(v, b) * lit(1 << b)).reduce(_ + _)

  /** `bits`-bit sign-LSH band bucket from components
    * [band·bits, (band+1)·bits) of the vector: bit i set ⇔
    * v[band·bits+i] ≥ 0. Axis-aligned hyperplanes (rather than the
    * hashed random projections of [[lshSignBit]]) so the bucket is
    * expressible identically in the DuckDB oracle — for isotropic or
    * clustered embeddings the sign of a fixed component is the same
    * LSH family for cosine distance.
    */
  def signBandBucket(v: Column, band: Int, bits: Int): Column =
    (0 until bits).map(i =>
      when(element_at(v, band * bits + i + 1) >= 0, lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)
}
