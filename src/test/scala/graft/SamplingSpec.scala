package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Deterministic-sampling guarantees: membership stability under
  * repartitioning (the property seeded RNG sampling lacks), disjoint and
  * covering hash splits, stratified rate targeting. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  test("hashSample: identical membership regardless of partitioning") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.hashSample(df, "text", 200).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    val base = ids(docs)
    assert(base == ids(docs.repartition(13)), "sample must not depend on partitioning")
    assert(base.nonEmpty && base.size < docs.count())
    // rate lands in a loose band around 20%
    val rate = base.size.toDouble / docs.count()
    assert(rate > 0.1 && rate < 0.3, s"20% target, got $rate")
  }

  test("hashSplit: 90/10 split is disjoint and covering") {
    val train = Sampling.hashSplit(docs, "text", 0, 900)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val eval = Sampling.hashSplit(docs, "text", 900, 1000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((train & eval).isEmpty, "splits must be disjoint")
    assert(train.size + eval.size == docs.count(), "splits must cover")
  }

  test("capPerKey: ≤ k per key, selects the window's rows, partition-invariant") {
    import graft.operators.Dedup
    import org.apache.spark.sql.expressions.Window
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = pairs(Sampling.capPerKey(docs, "source", "text", "doc_id", 10))
    val perKey = got.groupBy(_._1).map(_._2.size)
    assert(perKey.nonEmpty && perKey.forall(_ <= 10))
    // the bounded aggregator must pick exactly the row_number window's rows
    val w = Window.partitionBy("source")
      .orderBy(Dedup.md5Hash48(col("text")).asc, col("doc_id").asc)
    val ref = pairs(docs.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 10).select("source", "doc_id"))
    assert(got == ref, "capPerKey must equal the window form")
    // content-hash membership: invariant under repartitioning
    val re = pairs(Sampling.capPerKey(
      docs.repartition(17), "source", "text", "doc_id", 10))
    assert(re == got, "cap membership must not depend on partitioning")
  }

  test("mixtureSample: realized mix tracks target shares, unlisted strata dropped") {
    val shares = Map("en" -> 500, "fr" -> 250, "de" -> 125, "es" -> 125)
    val out = Sampling.mixtureSample(docs, "text", "lang", shares)
      .select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1)))
    val byLang = out.groupBy(_._2).map { case (l, v) => l -> v.size }
    assert(!byLang.contains("zh"), "strata outside the recipe must be dropped")
    // replicate the integer rate derivation and check realized counts track
    // floor(permille · n / 1000) to hash-rate granularity
    val counts = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = shares.map { case (l, w) => counts(l) * 1000L / w }.min
    shares.foreach { case (l, w) =>
      val p = (t * w / 1000L) * 1000L / counts(l)
      val target = p * counts(l) / 1000.0
      val got = byLang.getOrElse(l, 0)
      assert(math.abs(got - target) <= math.max(3, 0.35 * target),
        s"$l: got $got, derived-rate target ≈ $target (p=$p‰ of ${counts(l)})")
    }
    // content-hash membership: invariant under repartitioning
    val re = Sampling.mixtureSample(docs.repartition(17), "text", "lang", shares)
      .select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(re.toSet == out.toSet, "mixture membership must not depend on partitioning")
  }

  test("budgetHead: two-level prefix sum ≡ global cumsum, budget respected") {
    import graft.operators.Dedup
    import org.apache.spark.sql.expressions.Window
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val got = ids(Sampling.budgetHead(docs, "text", "n_chars", "doc_id",
      budget = 60000L, buckets = 64))
    // reference: ONE global window over the same (bucket, hash, id) order —
    // the form the decomposition must reproduce exactly
    val h = Dedup.md5Hash48(col("text"))
    val w = Window.orderBy(pmod(h, lit(64L)), h, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = docs.withColumn("cum", sum(col("n_chars").cast("long")).over(w))
      .where(col("cum") <= 60000L)
    assert(got == ids(ref), "decomposed cumsum must equal the global window")
    assert(got.nonEmpty && got.size < docs.count(), "the budget must bite")
    val kept = docs.where(col("doc_id").isInCollection(got))
      .agg(sum(col("n_chars").cast("long"))).collect()(0).getLong(0)
    assert(kept <= 60000L, s"kept weight $kept exceeds the budget")
    val re = ids(Sampling.budgetHead(docs.repartition(17), "text", "n_chars",
      "doc_id", budget = 60000L, buckets = 64))
    assert(re == got, "membership must not depend on partitioning")
  }

  test("stratifiedHashSample: per-stratum rates hit their targets") {
    val sampled = Sampling.stratifiedHashSample(
      docs, "text", "lang", Map("en" -> 1000), defaultPermille = 0)
    val langs = sampled.select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(langs == Set("en"), "permille 1000/0 must keep exactly the en stratum")
    val all = docs.where(col("lang") === "en").count()
    assert(sampled.count() == all)
  }

  test("globalHashOrder: exact 0..n-1 bijection, ≡ global-window reference, salt varies the permutation, partition-invariant") {
    val n = docs.count()
    def order(df: org.apache.spark.sql.DataFrame, salt: String) =
      Sampling.globalHashOrder(df, "text", "doc_id", salt = salt)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = order(docs, "epA")
    assert(got.size == n && got.values.toSeq.sorted == (0L until n),
      "positions must be a contiguous 0..n-1 bijection")
    // two-level enumeration ≡ one global window over the same permutation
    import org.apache.spark.sql.expressions.Window
    val h = graft.operators.Dedup.md5Hash48(
      concat(lit("epA"), lit(":"), col("text")))
    val ref = docs.select(col("doc_id"), h.as("h"))
      .withColumn("position", row_number().over(
        Window.orderBy(pmod(col("h"), lit(64L)), col("h"), col("doc_id")))
        .cast("long") - 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == ref, "two-level enumeration must equal the global window")
    // a different salt is an (almost surely) different permutation
    val other = order(docs, "epB")
    assert(other != got, "salts must vary the permutation")
    assert(other.values.toSeq.sorted == (0L until n))
    // partition invariance
    assert(order(docs.repartition(17), "epA") == got)
  }

  test("weightedPoissonSample: exact membership rule, saturation keeps, partition-invariant") {
    val n = 100L
    val M = 1000000L
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val got = ids(Sampling.weightedPoissonSample(docs, "text", "n_chars", n))
    // membership ≡ the u·W < n·w·M rule recomputed independently
    val wTot = docs.agg(sum(col("n_chars"))).collect()(0).getLong(0)
    val rule = docs.select(col("doc_id"),
        pmod(graft.operators.Dedup.md5Hash48(col("text")), lit(M)).as("u"),
        col("n_chars").cast("long").as("w"))
      .collect()
      .filter(r => BigInt(r.getLong(1)) * wTot < BigInt(n) * r.getLong(2) * M)
      .map(_.getLong(0)).toSet
    assert(got == rule, s"membership diverged: ${(got -- rule).take(3)} / ${(rule -- got).take(3)}")
    assert(got.nonEmpty && got.size < docs.count(), "a real sample, not all/none")
    // saturated weight (w ≥ W/n ⇒ π = 1) is always kept
    import SparkTestSession.spark.implicits._
    val heavy = Seq((1L, "tiny", 1L), (2L, "huge", 1000000L))
      .toDF("doc_id", "text", "n_chars")
    val keptHeavy = ids(Sampling.weightedPoissonSample(heavy, "text", "n_chars", 1L))
    assert(keptHeavy.contains(2L), "π=1 row must always be kept")
    // partition invariance
    val re = ids(Sampling.weightedPoissonSample(
      docs.repartition(17), "text", "n_chars", n))
    assert(re == got, "membership must not depend on partitioning")
  }

  test("bandedHashOrder: contiguous positions, band-major, stable, salt-local") {
    import org.apache.spark.sql.functions._
    val scored = docs.withColumn("band",
      expr("doc_id % 3"))
    def run(salt: String) = Sampling
      .bandedHashOrder(scored, "band", "text", "doc_id", salt)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val out = run("cur0")
    val n = out.length
    assert(out.map(_._3).sorted.toSeq == (0L until n).toSeq,
      "positions are exactly 0..n-1")
    // band-major: bands are non-decreasing along the position order
    val byPos = out.sortBy(_._3).map(_._2)
    assert(byPos.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    // deterministic under repartitioning
    val re = Sampling.bandedHashOrder(scored.repartition(13), "band", "text",
      "doc_id", "cur0").collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(re == out.map(x => (x._1, x._3)).toSet)
    // a new salt permutes WITHIN bands but never across: each doc keeps its
    // band, and each band occupies the same contiguous position range
    val out2 = run("cur1")
    assert(out.map(x => x._1 -> x._2).toMap == out2.map(x => x._1 -> x._2).toMap)
    def bandRanges(o: Array[(Long, Long, Long)]) =
      o.groupBy(_._2).view.mapValues(v => (v.map(_._3).min, v.map(_._3).max)).toMap
    assert(bandRanges(out) == bandRanges(out2))
    assert(out.map(x => x._1 -> x._3).toMap != out2.map(x => x._1 -> x._3).toMap,
      "the within-band permutation must actually change with the salt")
  }

  test("lengthBatches: per-bucket batches ≡ definitional rank, partition-invariant") {
    import spark.implicits._
    import graft.operators.Dedup
    import org.apache.spark.sql.expressions.Window
    val rows = (1 to 90).map(i => (i.toLong, s"doc$i", (i % 9) * 100L))
    val df = rows.toDF("id", "text", "len")
    val out = Sampling.lengthBatches(df, "text", "id", "len",
      bounds = Seq(200L, 500L), batchSize = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // definitional: per-bucket rank in (salted hash, id) order
    val ref = df
      .withColumn("bucket",
        (when(col("len") >= 200, 1L).otherwise(0L) +
          when(col("len") >= 500, 1L).otherwise(0L)))
      .withColumn("rn", row_number().over(Window.partitionBy(col("bucket"))
        .orderBy(Dedup.md5Hash48(concat(lit("len0:"), col("text"))), col("id"))))
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("bucket"), (r.getAs[Int]("rn") - 1L) / 4,
          (r.getAs[Int]("rn") - 1L) % 4))).toMap
    assert(out == ref)
    // every batch holds ≤ batchSize rows, slots are 0..n-1 within a batch
    val sizes = out.values.groupBy(v => (v._1, v._2)).view.mapValues(_.size)
    assert(sizes.values.forall(_ <= 4))
    // partition-invariance
    val out2 = Sampling.lengthBatches(df.repartition(13), "text", "id", "len",
      bounds = Seq(200L, 500L), batchSize = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out2 == out)
  }

  test("temperatureMixture: ⌊√n⌋-weighted rates, binding stratum fully kept (these counts divide exactly — in general floor loss can leave the smallest stratum at rate <1000, e.g. n={10,100} → 900‰)") {
    import spark.implicits._
    import graft.operators.Dedup
    // counts 100/25/4 → w = 10/5/2, Σw = 17,
    // T = min(100·17/10, 25·17/5, 4·17/2) = min(170, 85, 34) = 34,
    // targets = (34·10)/17, (34·5)/17, (34·2)/17 = 20, 10, 4,
    // rates ‰ = 20000/100, 10000/25, 4000/4 = 200, 400, 1000.
    val rows = (1 to 100).map(i => (s"a$i", "A")) ++
      (1 to 25).map(i => (s"b$i", "B")) ++ (1 to 4).map(i => (s"c$i", "C"))
    val df = rows.toDF("text", "lang")
    val kept = Sampling.temperatureMixture(df, "text", "lang")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // membership must equal the independent bucket-rule realization
    val expectedRates = Map("A" -> 200L, "B" -> 400L, "C" -> 1000L)
    val expected = df
      .withColumn("b", pmod(Dedup.md5Hash48(col("text")), lit(1000L)))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .filter { case (_, l, b) => b < expectedRates(l) }
      .map(t => (t._1, t._2)).toSet
    assert(kept == expected)
    // here the smallest stratum binds T and the divisions are exact, so
    // its rate is 1000; flattening holds
    assert(kept.count(_._2 == "C") == 4)
    // partition-invariance
    val kept2 = Sampling.temperatureMixture(df.repartition(7), "text", "lang")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(kept2 == kept)
  }

  test("upsampleMixture: exact copy rule, contiguous repeat_idx, default pass-through, zero drops, partition-invariant") {
    import spark.implicits._
    import graft.operators.Dedup
    val rows = (1 to 100).map(i => (s"a$i", "A")) ++
      (1 to 40).map(i => (s"b$i", "B")) ++ (1 to 10).map(i => (s"c$i", "C")) ++
      (1 to 10).map(i => (s"d$i", "D"))
    val df = rows.toDF("text", "lang")
    // A downsamples (400‰), B repeats fractionally (2500‰), C drops (0),
    // D is unlisted → the 1000‰ default keeps it exactly once.
    val w = Map("A" -> 400, "B" -> 2500, "C" -> 0)
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.upsampleMixture(d, "text", "lang", w)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val got = run(df)
    // membership/copies must equal the independent bucket-rule realization:
    // copies = ⌊w/1000⌋ + [bucket < w mod 1000]
    val expected = df
      .withColumn("b", pmod(Dedup.md5Hash48(col("text")), lit(1000L)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .flatMap { case (t, l, b) =>
        val wl = w.getOrElse(l, 1000).toLong
        val copies = wl / 1000 + (if (b < wl % 1000) 1 else 0)
        (0L until copies).map(i => (t, l, i))
      }.toSet
    assert(got == expected)
    // C fully dropped, D exactly once at idx 0
    assert(!got.exists(_._2 == "C"))
    assert(got.count(_._2 == "D") == 10 && got.filter(_._2 == "D").forall(_._3 == 0L))
    // every B row has ≥2 copies with contiguous idx 0..copies−1
    val bCopies = got.filter(_._2 == "B").groupBy(_._1).map { case (_, s) =>
      val idx = s.map(_._3)
      assert(idx == (0L until idx.size).toSet, "repeat_idx must be contiguous from 0")
      idx.size
    }
    assert(bCopies.forall(n => n == 2 || n == 3))
    // realized B multiplier tracks 2.5× to hash granularity
    val bTotal = bCopies.sum
    assert(bTotal >= 80 && bTotal <= 120, s"~2.5x of 40, got $bTotal")
    // partition-invariance
    assert(run(df.repartition(7)) == got)
  }

  test("targetCoverageScores: overlap counted exactly, profile bounded, target excluded") {
    import SparkTestSession.spark.implicits._
    // target vocab (2 docs): {aa, bb, cc} with doc frequencies aa=2, bb=2,
    // cc=1. topFeatures=2 keeps the 2 most frequent by (df desc, hash asc)
    // — {aa, bb} (cc has df 1 < 2, so the tie-break never matters here).
    val docs = Seq(
      (1L, "aa bb cc", true), // target
      (2L, "aa bb", true), // target
      (10L, "aa bb zz", false), // 2 of 3 features in profile
      (11L, "cc dd", false), // cc is NOT in the bounded profile
      (12L, "xx yy", false) // disjoint
    ).toDF("doc_id", "text", "tgt")
    val out = Sampling.targetCoverageScores(docs, "doc_id", "text",
        targetPred = col("tgt"), topFeatures = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(!out.contains(1L) && !out.contains(2L), "target docs must not score")
    assert(out(10L) == ((3L, 2L, 6666L)))
    assert(out(11L) == ((2L, 0L, 0L)), "features outside the bounded profile must not match")
    assert(out(12L) == ((2L, 0L, 0L)))
  }
}
