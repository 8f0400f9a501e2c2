package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>`/`array<double>` embedding columns as pure
  * codegen'd higher-order-function expressions (`zip_with` + `aggregate`) —
  * no UDFs, so similarity scans stay inside whole-stage codegen.
  *
  * All math is done in double regardless of input element type (cast inside
  * the lambdas), matching the DuckDB oracle's double-precision path. */
object VectorFunctions {

  /** Σ aᵢ·bᵢ, sequential left-to-right loop (deterministic). Native codegen
    * expression ([[VectorExpressions.dotNative]]) — identical summation order
    * to the HOF fold below, ~5× faster on quadratic similarity joins. */
  def dot(a: Column, b: Column): Column = VectorExpressions.dotNative(a, b)

  /** HOF reference form of [[dot]] (interpreted lambdas; kept as the
    * executable spec the native expression is tested against). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ — native codegen expression, left-to-right accumulation. */
  def norm(a: Column): Column = VectorExpressions.normNative(a)

  /** HOF reference form of [[norm]]. */
  def normHof(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** cos(a, b) = a·b / (‖a‖‖b‖); 0.0 when either side has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb))
  }

  /** cosine given precomputed norms — at corpus scale norms are computed
    * once per row and reused across the O(queries × corpus) pair evaluations,
    * turning the per-pair cost into a single dot product. */
  def cosinePrenormed(a: Column, b: Column, normA: Column, normB: Column): Column =
    when(normA === 0.0 || normB === 0.0, lit(0.0))
      .otherwise(dot(a, b) / (normA * normB))

  /** Random-hyperplane (sign) LSH bucket for cosine similarity: `planes` is a
    * seeded list of hyperplane vectors; the bucket id packs the sign bits of
    * the projections. Vectors within cosine θ of each other collide with
    * probability (1 - angle/π) per bit. */
  def hyperplaneBucket(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (plane, i) =>
      val planeArr = array(plane.map(lit): _*)
      when(dot(vec, planeArr) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduceLeft(_ + _)
  }

  /** Deterministic pseudo-random hyperplanes for [[hyperplaneBucket]]. */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Max-abs scalar quantization scale: ‖v‖∞ / 127 — the int8 range fits
    * [-127, 127] symmetrically (−128 unused, keeping dequant sign-symmetric).
    * 0.0 for the zero vector (whose quantized form is all zeros). */
  def quantScale(vec: Column): Column =
    aggregate(vec, lit(0.0), (m, x) => greatest(m, abs(x.cast("double")))) / 127.0

  /** Symmetric int8 quantization of an embedding: `round(v / scale)` per
    * element, expressed as `floor(x + 0.5)` — written that way because
    * "round" conventions differ across engines for negative halves
    * (half-up vs half-away-from-zero), while floor(x+0.5) is one IEEE add
    * + floor, bit-identical everywhere. Output array<int> in [-127, 127]
    * (plus the boundary value from +0.5 landing on 127.5 → clamped by the
    * scale definition). Reconstruction error ≤ scale/2 per element —
    * spec-pinned. The standard 4× storage compression before ANN indexing;
    * pair with [[quantScale]] stored per row. */
  def quantizeInt8(vec: Column): Column = {
    val s = quantScale(vec)
    when(s === 0.0, transform(vec, _ => lit(0)))
      .otherwise(transform(vec, x =>
        floor(x.cast("double") / s + 0.5).cast("int")))
  }

  /** Dequantize: q * scale back to float — the lossy inverse used at scan
    * time for coarse scoring (exact rescoring reads the original vectors). */
  def dequantizeInt8(quantized: Column, scale: Column): Column =
    transform(quantized, q => (q.cast("double") * scale).cast("float"))
}
