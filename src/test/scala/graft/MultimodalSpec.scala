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

  /** Independent blockhash reference: BigInt bit set, no shared code with
    * the kernel — per-block byte-sum mean vs whole-payload mean, bit b of
    * the 128-bit signature set iff blockSum·n > total·blockLen. */
  private def refBlockHash(payload: Array[Byte]): (Long, Long) = {
    val n = payload.length
    if (n == 0) return (0L, 0L)
    var sig = BigInt(0)
    val total = payload.map(b => (b & 0xFF).toLong).sum
    for (b <- 0 until 128) {
      val lo = b * n / 128; val hi = (b + 1) * n / 128
      val bs = payload.slice(lo, hi).map(x => (x & 0xFF).toLong).sum
      if (bs * n > total * (hi - lo)) sig = sig.setBit(b)
    }
    ((sig >> 64).toLong, (sig & BigInt("ffffffffffffffff", 16)).toLong)
  }

  test("BlockHash128 kernel matches an independent BigInt reference") {
    val ramp = Array.tabulate(200)(i => (i % 251).toByte)
    val payloads = Seq(
      Array.emptyByteArray, Array(7.toByte), Array.fill(127)(9.toByte),
      ramp, "the quick brown fox jumps over the lazy dog".getBytes("UTF-8"))
    payloads.foreach { p =>
      val Array(hi, lo) = graft.functions.BlockHash128.compute(p)
      assert((hi, lo) === refBlockHash(p), s"payload of ${p.length} bytes")
    }
    // uniform payload: every block mean equals the global mean → all ties → 0
    val Array(h0, l0) = graft.functions.BlockHash128.compute(Array.fill(256)(42.toByte))
    assert(h0 == 0L && l0 == 0L)
  }

  test("blockHash128 expression (codegen path) ≡ kernel; nulls sign as 0") {
    val ramp = Array.tabulate(300)(i => ((i * 31) % 256).toByte)
    val df = Seq((1L, Some("some document payload bytes".getBytes("UTF-8"))),
      (2L, Some(ramp)), (3L, None))
      .toDF("asset_id", "payload")
    val out = Multimodal.blockHashSignatures(df)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === refBlockHash("some document payload bytes".getBytes("UTF-8")))
    assert(out(2L) === refBlockHash(ramp))
    assert(out(3L) === ((0L, 0L)), "null payload signs as empty")
  }

  test("perceptual locality: local edit → small hamming; unrelated → large") {
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    val rnd = new scala.util.Random(7)
    val base = Array.tabulate(4096)(_ => (rnd.nextInt(256)).toByte)
    val edited = base.clone(); edited(100) = (edited(100) ^ 0x55).toByte
    edited(2000) = (edited(2000) + 9).toByte // two localized byte edits
    val unrelated = Array.tabulate(4096)(_ => (rnd.nextInt(256)).toByte)
    val hEdit = ham(refBlockHash(base), refBlockHash(edited))
    val hOther = ham(refBlockHash(base), refBlockHash(unrelated))
    assert(hEdit <= 4, s"local edit moved $hEdit bits — not perceptual")
    assert(hOther > 20, s"unrelated payloads only $hOther bits apart")
    // content hash flips everything on the same edit — the gap this closes
    assert(refBlockHash(base) != refBlockHash(unrelated))
  }

  test("banded phash pairs ≡ brute-force quadratic hamming join") {
    val rnd = new scala.util.Random(11)
    val base = Array.tabulate(2048)(_ => rnd.nextInt(256).toByte)
    def perturb(p: Array[Byte], edits: Int, seed: Int): Array[Byte] = {
      val r = new scala.util.Random(seed); val c = p.clone()
      (0 until edits).foreach { _ =>
        val i = r.nextInt(c.length); c(i) = (c(i) ^ r.nextInt(256)).toByte }
      c
    }
    val payloads = Seq(
      1L -> base, 2L -> perturb(base, 2, 1), 3L -> perturb(base, 4, 2),
      4L -> base.clone()) ++ (5L to 12L).map(i =>
      i -> Array.tabulate(2048)(_ => rnd.nextInt(256).toByte))
    val df = payloads.toDF("asset_id", "payload")
    val sigs = Multimodal.blockHashSignatures(df).localCheckpoint()
    val banded = graft.operators.Dedup
      .simHashNearDupPairs128(sigs, "id", "hi", "lo", maxHamming = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val raw = sigs.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      (ia, ha, la) <- raw; (ib, hb, lb) <- raw if ia < ib
      h = java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb)
      if h <= 5
    } yield (ia, ib, h)).toSet
    assert(banded === brute, "pigeonhole banding must have recall 1.0")
    assert(brute.exists { case (a, b, h) => a == 1L && b == 4L && h == 0 },
      "exact copy at hamming 0")
    assert(brute.exists { case (a, b, _) => a == 1L && b == 2L },
      "2-byte edit within hamming 5")
  }

  test("segmentSignatures: sigs ≡ reference blockhash of the substring slices") {
    val rnd = new scala.util.Random(23)
    val p1 = Array.tabulate(700)(_ => rnd.nextInt(256).toByte) // 3 segments: 256+256+188
    val p2 = Array.tabulate(100)(_ => rnd.nextInt(256).toByte) // 1 short segment
    val df = Seq((1L, Some(p1)), (2L, Some(p2)), (3L, None))
      .toDF("asset_id", "payload")
    val out = Multimodal.segmentSignatures(df, segSize = 256)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(out.keySet === Set((1L, 0), (1L, 1), (1L, 2), (2L, 0), (3L, 0)))
    assert(out((1L, 0)) === refBlockHash(p1.slice(0, 256)))
    assert(out((1L, 1)) === refBlockHash(p1.slice(256, 512)))
    assert(out((1L, 2)) === refBlockHash(p1.slice(512, 700)))
    assert(out((2L, 0)) === refBlockHash(p2))
    assert(out((3L, 0)) === ((0L, 0L)), "null payload signs as one empty segment")
  }

  test("segmentNearDupAssets: partial copy found, within-asset excluded, ≡ brute force") {
    val rnd = new scala.util.Random(31)
    def randBytes(n: Int) = Array.tabulate(n)(_ => rnd.nextInt(256).toByte)
    val a = randBytes(1024) // 4 segments
    val b = randBytes(1024)
    // chimera: first half of a (segment-aligned, lightly edited) + junk —
    // the clipped/spliced partial-copy class
    val edited = a.slice(0, 512).clone(); edited(17) = (edited(17) ^ 0x3).toByte
    val chimera = edited ++ randBytes(512)
    // an asset with an INTERNAL repeat: must never pair with itself
    val selfRep = randBytes(256) ++ Array.fill(256)(0.toByte) ++ Array.fill(256)(0.toByte)
    val assets = Seq(1L -> a, 2L -> b, 3L -> chimera, 4L -> selfRep)
      .toDF("asset_id", "payload")
    val got = Multimodal.segmentNearDupAssets(assets, segSize = 256, maxHamming = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5)))
      .toMap
    // brute-force reference over all cross-asset segment pairs
    def ham(x: (Long, Long), y: (Long, Long)): Int =
      java.lang.Long.bitCount(x._1 ^ y._1) + java.lang.Long.bitCount(x._2 ^ y._2)
    val segs = Seq(1L -> a, 2L -> b, 3L -> chimera, 4L -> selfRep).flatMap {
      case (id, p) => p.grouped(256).zipWithIndex.map {
        case (s, i) => (id, i, refBlockHash(s)) }
    }
    val pairs = for {
      (ia, sa, ha) <- segs; (ib, sb, hb) <- segs
      if ia * 1000000L + sa < ib * 1000000L + sb && ia != ib
      h = ham(ha, hb) if h <= 5
    } yield ((ia, ib), (sa, sb, h))
    val ref = pairs.groupBy(_._1).map { case (k, vs) =>
      k -> (vs.size.toLong, vs.map(_._2._1).distinct.size.toLong,
        vs.map(_._2._2).distinct.size.toLong, vs.map(_._2._3).min)
    }
    assert(got === ref, "banded asset aggregation must equal brute force")
    // the planted chimera pairs with its source on its two head segments
    assert(got.contains((1L, 3L)), "partial copy must surface")
    val (nPairs, nA, nB, minH) = got((1L, 3L))
    assert(nA >= 2 && nB >= 2 && minH == 0 && nPairs >= 2,
      s"head segments must match: $nPairs pairs, $nA/$nB segs, min $minH")
    assert(!got.keySet.exists { case (x, y) => x == y }, "within-asset pairs excluded")
  }

  test("cdcSegmentSignatures ≡ driver reference (content-defined boundaries + blockhash)") {
    val rnd = new scala.util.Random(41)
    val p1 = Array.tabulate(1200)(_ => rnd.nextInt(256).toByte)
    val p2 = Array.tabulate(10)(_ => rnd.nextInt(256).toByte) // shorter than window
    val df = Seq((1L, Some(p1)), (2L, Some(p2)), (3L, None))
      .toDF("asset_id", "payload")
    val got = Multimodal.cdcSegmentSignatures(df, window = 16, modulus = 64,
        minSize = 32)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // independent reference: md5-48 of each 16-byte window, boundary iff
    // ≡ 0 mod 64 AND ≥ 32 past the last accepted boundary, chunks =
    // boundary-delimited slices, each blockhashed
    def md548(bs: Array[Byte]): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(bs).map(b => f"$b%02x").mkString.take(12)
      java.lang.Long.parseLong(hex, 16)
    }
    def refSegs(p: Array[Byte]): Seq[(Int, (Long, Long))] = {
      if (p.isEmpty) return Seq(0 -> ((0L, 0L)))
      val cands = (16 to p.length)
        .filter(i => md548(p.slice(i - 16, i)) % 64 == 0)
      val bounds = cands.foldLeft(Vector(0L)) { (acc, b) =>
        if (b - acc.last >= 32) acc :+ b.toLong else acc
      }
      val bs = bounds ++
        (if (bounds.size > 1 && bounds.last == p.length) Nil
         else Seq(p.length.toLong))
      bs.sliding(2).zipWithIndex.map { case (Seq(s, e), j) =>
        j -> refBlockHash(p.slice(s.toInt, e.toInt))
      }.toSeq
    }
    val want = Seq(1L -> p1, 2L -> p2, 3L -> Array.emptyByteArray).flatMap {
      case (id, p) => refSegs(p).map { case (j, sig) => (id, j) -> sig }
    }.toMap
    assert(got == want, "CDC segments must match the independent reference")
    // the corpus actually split: p1 should carry more than one segment
    assert(got.keys.count(_._1 == 1L) > 1, "1200 random bytes must yield >1 CDC segment")
    assert(got((3L, 0)) == ((0L, 0L)), "empty payload signs as one zero segment")
  }

  test("CDC re-syncs after an insertion where the fixed grid loses everything") {
    val rnd = new scala.util.Random(43)
    val orig = Array.tabulate(4096)(_ => rnd.nextInt(256).toByte)
    // 1-byte insertion near the head — every fixed-grid segment after it shifts
    val shifted = (orig.take(100) :+ 0x58.toByte) ++ orig.drop(100)
    val assets = Seq(1L -> orig, 2L -> shifted).toDF("asset_id", "payload")

    def matchedPairs(sigs: org.apache.spark.sql.DataFrame): Long =
      Multimodal.segmentNearDupAssetsFromSigs(sigs, maxHamming = 5)
        .collect().map(r => r.getLong(2)).sum

    val fixedMatches = matchedPairs(
      Multimodal.segmentSignatures(assets, segSize = 256))
    val cdcSigs = Multimodal.cdcSegmentSignatures(assets, window = 16,
      modulus = 64, minSize = 32)
    val cdcMatches = matchedPairs(cdcSigs)
    // fixed grid: only segment 0 contains the insertion point; every later
    // segment is shifted random bytes → at most the head can pair (and the
    // head differs in 156 trailing bytes, so realistically nothing)
    assert(fixedMatches <= 1, s"fixed grid should lose shifted segments, got $fixedMatches")
    // CDC: boundaries re-synchronize after the touched segment → most
    // segments pair exactly (hamming 0)
    val nSegs = cdcSigs.where(col("asset_id") === 1L).count()
    assert(cdcMatches >= nSegs / 2,
      s"CDC must recover most of $nSegs segments after the shift, got $cdcMatches")
    assert(cdcMatches > fixedMatches, "CDC must beat the fixed grid on a shifted copy")
  }

  test("ingest: canonical asset schema with sniffed mime in meta") {
    val df = Seq((7, "hello")).toDF("doc_id", "text")
    val assets = Multimodal.ingest(df, "doc_id", col("text"))
    assert(assets.columns.toSeq == Seq("asset_id", "payload", "meta"))
    val r = assets.select(col("asset_id"), col("meta.mime")).collect()(0)
    assert(r.getLong(0) == 7L && r.getString(1) == "application/octet-stream")
  }
}
