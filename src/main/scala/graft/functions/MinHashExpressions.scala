package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash LSH band buckets of a shingle set as ONE native codegen
  * expression: k seeded permutation minima folded in a single pass over the
  * array, then `bands` bucket hashes over the signature slices. Output:
  * `array<long>` of length `bands` (index = band).
  *
  * Semantics are IDENTICAL to the composable aggregate path
  * (`Dedup.minHashSignatureAgg` + `Dedup.bandedBuckets` with the xxhash64
  * token hash): per shingle h = pmod(xxhash64(s), P), per permutation i
  * m_i = min((a_i·h + b_i) mod P), bucket_b = xxhash64 of the
  * comma-joined slice m[b·r … b·r+r) — byte-identical bucket values, so
  * band joins mix freely across the per-row and aggregate forms
  * (MinHashExpressionsSpec pins the equality).
  *
  * Why an expression: the per-row nested-lambda signature
  * (`Dedup.minHashSignature`) cannot feed band slicing safely — projection
  * collapse re-inlines the full k×|shingles| hash computation into EVERY
  * band expression (measured 18× at sf0.1), and the aggregation-boundary
  * fix is unavailable exactly where per-row banding matters most: the
  * STREAMING side of an ingest-time near-dup screen, where an extra
  * aggregate would be a second stateful operator. This kernel hashes each
  * shingle once, keeps k running minima, and emits the band buckets — one
  * pass, inside whole-stage codegen, per arriving row. */
case class MinHashBandBuckets(child: Expression, k: Int, bands: Int,
                              seed: Long) extends UnaryExpression {
  require(k % bands == 0, "k must be divisible by bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_band_buckets requires array<string>, got $other")
  }

  @transient private lazy val params: MinHashBandBuckets.Params = {
    val (as, bs) = graft.operators.Dedup.minhashParams(k, seed)
    MinHashBandBuckets.Params(as.toArray, bs.toArray, k, bands)
  }

  override def nullSafeEval(input: Any): Any =
    MinHashBandBuckets.compute(input.asInstanceOf[ArrayData], params)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("mhParams", params,
      "graft.functions.MinHashBandBuckets.Params")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashBandBuckets.compute($c, $p);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandBuckets =
    copy(child = newChild)
  override def prettyName: String = "minhash_band_buckets"
}

object MinHashBandBuckets {

  /** Permutation constants precomputed once per expression instance and
    * shipped to codegen as one reference object. */
  case class Params(as: Array[Long], bs: Array[Long], k: Int, bands: Int)

  private val P = graft.operators.Dedup.P
  private val XxSeed = 42L // Spark's xxhash64 default seed

  /** Shared kernel for interpreted eval and generated code. Null shingles
    * are skipped (matching the aggregate path, where hash(null) drops). */
  def compute(arr: ArrayData, p: Params): ArrayData = {
    val k = p.k
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val raw = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes(), XxSeed)
        val h = ((raw % P) + P) % P // pmod(xxhash64(s), P)
        var j = 0
        while (j < k) {
          val v = (p.as(j) * h + p.bs(j)) % P // a < P, h < P: fits a long
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    val r = k / p.bands
    val out = new Array[Long](p.bands)
    val sb = new java.lang.StringBuilder(r * 11)
    var b = 0
    while (b < p.bands) {
      sb.setLength(0)
      var j = b * r
      while (j < (b + 1) * r) {
        if (j > b * r) sb.append(',')
        sb.append(mins(j))
        j += 1
      }
      val u = UTF8String.fromString(sb.toString)
      out(b) = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset,
        u.numBytes(), XxSeed)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: band-bucket array of an array<string> shingle column. */
  def bandBuckets(shingles: Column, k: Int = 64, bands: Int = 16,
                  seed: Long = 42L): Column =
    ColumnBridge.column(
      MinHashBandBuckets(ColumnBridge.expression(shingles), k, bands, seed))
}
