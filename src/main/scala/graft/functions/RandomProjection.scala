package graft.functions

/** Deterministic ±1 random-projection matrix (Achlioptas 2003-style
  * sign projection, the JL-lemma workhorse): entry (j, i) is +1 when
  * the first hex nibble of md5("j:i") is even, else −1. Computed ONCE
  * here and embedded as literals into both the Spark plan and the
  * DuckDB oracle SQL (graft.Oracles), so the two engines share the
  * matrix bit-for-bit without any per-row hashing — the projection
  * itself is a pure map-side dot product.
  *
  * At 100 TB this is the step before ANN indexing: 64→16 dims cuts
  * the index's distance math and memory 4× while the JL bound keeps
  * relative distances within the usual (1±ε); VectorOpsSpec pins the
  * expectation E[‖Pv‖²] = outDims·‖v‖² (the mean per-vector
  * squared-norm ratio concentrates near outDims).
  */
object RandomProjection {
  val srcDims = 64
  val outDims = 16

  /** outDims × srcDims sign matrix; same literals feed both engines. */
  val signs: Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(outDims, srcDims) { (j, i) =>
      val h = md.digest(s"$j:$i".getBytes("UTF-8"))
      // first hex nibble = high nibble of byte 0
      if (((h(0) >> 4) & 1) == 0) 1.0 else -1.0
    }
  }
}
