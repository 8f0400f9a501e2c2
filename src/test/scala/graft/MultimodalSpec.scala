package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal binary-column plumbing: MIME sniff on real magic bytes, chunk
  * sampling, deterministic fake features (decode stub), ingest schema. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val png = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A, 1, 2, 3).map(_.toByte)
  private val jpeg = Array(0xFF, 0xD8, 0xFF, 0xE0, 0, 16).map(_.toByte)
  private val wav = "RIFF1234WAVE".getBytes("UTF-8")
  private val junk = "hello world".getBytes("UTF-8")

  test("sniffMime: magic-byte dispatch") {
    val df = Seq(
      (1L, png), (2L, jpeg), (3L, wav), (4L, junk)).toDF("id", "payload")
      .select(col("id"), Multimodal.sniffMime(col("payload")).as("mime"))
    val m = df.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(m == Map(1L -> "image/png", 2L -> "image/jpeg",
      3L -> "audio/wav", 4L -> "application/octet-stream"))
  }

  test("byteLen and contentHash on raw bytes") {
    val df = Seq(Tuple1("abc".getBytes("UTF-8"))).toDF("payload")
      .select(Multimodal.byteLen(col("payload")).as("n"),
        Multimodal.contentHash(col("payload")).as("h"))
    val r = df.collect()(0)
    assert(r.getInt(0) == 3)
    assert(r.getString(1) ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
  }

  test("sampleChunks: fixed-size frames at the configured stride") {
    val payload = (0 until 100).map(_.toByte).toArray
    val df = Seq(Tuple1(payload)).toDF("payload")
      .select(Multimodal.sampleChunks(col("payload"), chunkSize = 10, stride = 2).as("cs"))
    val chunks = df.collect()(0).getSeq[Array[Byte]](0)
    // offsets 1,11,21,...,91 → indices 0,2,4,... kept → offsets 1,21,41,61,81
    assert(chunks.length == 5)
    assert(chunks.forall(_.length == 10))
    assert(chunks(0)(0) == 0.toByte && chunks(1)(0) == 20.toByte)
  }

  test("fakeFeatures: fixed dim, [-1,1) range, content-deterministic") {
    val df = Seq((1L, "aaa".getBytes("UTF-8")), (2L, "aaa".getBytes("UTF-8")),
      (3L, "bbb".getBytes("UTF-8"))).toDF("id", "payload")
      .select(col("id"), Multimodal.fakeFeatures(col("payload"), 16).as("f"))
    val m = df.collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    assert(m.values.forall(_.length == 16))
    assert(m.values.flatten.forall(v => v >= -1.0f && v < 1.0f))
    assert(m(1L) == m(2L), "same content → same features")
    assert(m(1L) != m(3L), "different content → different features")
  }

  test("fakeFeaturesMd5 floats are exactly bp/500-1 of the basis points") {
    val df = Seq((1L, "doc one".getBytes("UTF-8")), (2L, "doc two".getBytes("UTF-8")))
      .toDF("id", "payload")
      .select(col("id"),
        Multimodal.fakeFeatureBasisPoints(col("payload"), 16).as("bp"),
        Multimodal.fakeFeaturesMd5(col("payload"), 16).as("f"))
    df.collect().foreach { r =>
      val bp = r.getSeq[Long](1); val f = r.getSeq[Float](2)
      assert(bp.length == 16 && f.length == 16)
      assert(bp.forall(b => b >= 0 && b < 1000), "basis points in [0,1000)")
      assert(bp.map(b => (b.toDouble / 500.0 - 1.0).toFloat) == f,
        "floats must be the pure /500-1 image of the oracle-checked ints")
    }
    // determinism across plans: same payload, separate evaluation
    val again = Seq(Tuple1("doc one".getBytes("UTF-8"))).toDF("payload")
      .select(Multimodal.fakeFeatureBasisPoints(col("payload"), 16).as("bp"))
      .collect()(0).getSeq[Long](0)
    assert(again == df.where(col("id") === 1L).collect()(0).getSeq[Long](1))
  }

  test("fakeThumbnail: exact target byte size, content-deterministic") {
    val df = Seq((1L, "imgA".getBytes("UTF-8")), (2L, "imgA".getBytes("UTF-8")),
      (3L, "imgB".getBytes("UTF-8"))).toDF("id", "payload")
      .select(col("id"), Multimodal.fakeThumbnail(col("payload"), 8, 6).as("thumb"))
    val m = df.collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1))).toMap
    assert(m.values.forall(_.length == 8 * 6 * 3))
    assert(m(1L).toSeq == m(2L).toSeq, "same content → same thumbnail bytes")
    assert(m(1L).toSeq != m(3L).toSeq)
  }

  test("decodeBatched ≡ fakeFeatures expression bit-for-bit; nulls pass through") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val assets = Multimodal.ingest(docs, "doc_id", col("text"))
    val viaExpr = assets
      .select(col("asset_id"), Multimodal.fakeFeatures(col("payload"), 16).as("features"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val viaBatch = Multimodal.decodeBatched(assets, dim = 16, batchSize = 7)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(viaBatch == viaExpr,
      "batched per-partition decode must equal the expression form exactly")
    val withNull = Seq((1L, Some("x".getBytes("UTF-8"))), (2L, None))
      .toDF("asset_id", "payload")
    val out = Multimodal.decodeBatched(withNull, dim = 4)
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out == Map(1L -> false, 2L -> true))
  }

  test("ingest: canonical asset schema with sniffed mime in meta") {
    val df = Seq((7, "hello")).toDF("doc_id", "text")
    val assets = Multimodal.ingest(df, "doc_id", col("text"))
    assert(assets.columns.toSeq == Seq("asset_id", "payload", "meta"))
    val r = assets.select(col("asset_id"), col("meta.mime")).collect()(0)
    assert(r.getLong(0) == 7L && r.getString(1) == "application/octet-stream")
  }
}
