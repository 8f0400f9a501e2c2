package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.ArrayData
import graft.functions.SimHash64
import graft.operators.TextOps

/** SimHash64: bit math of the shared compute() kernel, Column API through
  * both codegen and interpreted paths, hamming distance behavior. */
class SimHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("compute(): single hash passes through; majority vote per bit") {
    // one element: every set bit wins its position → identity
    assert(SimHash64.compute(ArrayData.toArrayData(Array(0xDEADBEEFL))) == 0xDEADBEEFL)
    // two identical elements: same
    assert(SimHash64.compute(ArrayData.toArrayData(Array(5L, 5L))) == 5L)
    // {0b01, 0b11, 0b10}: bit0 votes +1-1+... = (1,-1,1)→wait per element:
    // bit0: 1,1,0 → +1+1-1=+1 set; bit1: 0,1,1 → -1+1+1=+1 set → 0b11
    assert(SimHash64.compute(ArrayData.toArrayData(Array(1L, 3L, 2L))) == 3L)
    // empty input: all counts 0 → 0
    assert(SimHash64.compute(ArrayData.toArrayData(Array.empty[Long])) == 0L)
  }

  test("simhash64 Column API: identical token arrays → identical signatures") {
    val df = Seq(
      ("a", "x y z w"), ("b", "x y z w"), ("c", "p q r s")).toDF("id", "text")
      .select(col("id"), SimHash64.simhash64(TextOps.tokens(col("text"))).as("sh"))
    val m = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(m("a") == m("b"))
    assert(m("a") != m("c"))
  }

  test("near-identical docs have small hamming; unrelated docs large") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = base + " extra"
    val other = (100 to 160).map(i => s"zz$i").mkString(" ")
    val df = Seq(("a", base), ("b", nearDup), ("c", other)).toDF("id", "text")
      .select(col("id"), SimHash64.simhash64(TextOps.tokens(col("text"))).as("sh"))
    val m = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(m("a"), m("b")) <= 8, s"near-dup hamming ${ham(m("a"), m("b"))}")
    assert(ham(m("a"), m("c")) > 16, s"unrelated hamming ${ham(m("a"), m("c"))}")
  }

  test("hamming Column: bit_count(xor) matches JVM bitCount") {
    val df = Seq((0xFFL, 0x0FL)).toDF("a", "b")
      .select(SimHash64.hamming(col("a"), col("b")).as("h"))
    assert(df.collect()(0).getInt(0) == 4)
  }

  test("interpreted eval path (codegen fallback) agrees with codegen") {
    val arr = Array(7L, 11L, 13L, 7L)
    val viaKernel = SimHash64.compute(ArrayData.toArrayData(arr))
    val df = Seq(Tuple1(arr)).toDF("hs")
      .select(org.apache.spark.sql.graft.ColumnBridge.column(
        SimHash64(org.apache.spark.sql.graft.ColumnBridge.expression(col("hs")))).as("sh"))
    assert(df.collect()(0).getLong(0) == viaKernel)
  }
}
