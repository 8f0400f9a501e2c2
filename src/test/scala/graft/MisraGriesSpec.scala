package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.MisraGriesAggregator
import graft.operators.Sketch

/** Misra-Gries heavy hitters (X122): the driver-level MG laws (candidate
  * completeness above n/(k+1), bounded counter budget) and the two-pass
  * operator's exactness — output ≡ the definitional frequency filter on
  * data engineered so the candidate pass must EVICT, under any
  * partitioning. */
class MisraGriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // Adversarial stream: 3 true heavy keys buried in a long tail of 500
  // distinct rare keys, interleaved so MG's decrement step fires
  // constantly while the heavies survive.
  private def skewedRows: Seq[String] = {
    val heavy = Seq.tabulate(900)(i => s"hot${i % 3}")
    val tail = Seq.tabulate(500)(i => s"rare$i")
    // deterministic interleave
    (heavy zip (tail ++ tail.take(400))).flatMap { case (h, t) => Seq(h, t) }
  }

  test("aggregator law: every key above n/(k+1) survives reduce+merge, buffer ≤ k") {
    val agg = new MisraGriesAggregator(16)
    val rows = skewedRows // n = 1800, n/(k+1) ≈ 105; each hot key has 300
    // split into 7 arbitrary chunks, reduce each, merge pairwise
    val chunks = rows.grouped(260).toSeq
    val partials = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
    partials.foreach(p => assert(p.size <= 16, "partial exceeded counter budget"))
    val merged = partials.reduce(agg.merge)
    assert(merged.size <= 16, "merged summary exceeded counter budget")
    val cands = agg.finish(merged)
    Seq("hot0", "hot1", "hot2").foreach(h =>
      assert(cands.contains(h), s"true heavy hitter $h evicted — MG guarantee broken"))
  }

  test("aggregator law: counters undercount by at most n/(k+1)") {
    val agg = new MisraGriesAggregator(16)
    val rows = skewedRows
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val merged = rows.grouped(311).toSeq
      .map(_.foldLeft(agg.zero)(agg.reduce)).reduce(agg.merge)
    val bound = rows.size.toLong / 17 + 1
    merged.foreach { case (kk, c) =>
      assert(c <= exact(kk), s"MG counter overcounted $kk")
      assert(exact(kk) - c <= bound,
        s"undercount of $kk exceeded n/(k+1): exact ${exact(kk)}, counter $c")
    }
  }

  test("heavyHitters ≡ definitional filter with forced eviction, partition-invariant") {
    import spark.implicits._
    val df = skewedRows.toDF("key")
    def definitional(items: org.apache.spark.sql.DataFrame, sPm: Int) = {
      val n = items.count()
      items.groupBy(col("key")).agg(count(lit(1)).as("n_exact"))
        .where(col("n_exact") * 1000 >= lit(n) * sPm)
        .withColumn("n_total", lit(n))
        .orderBy(col("key")).collect().map(_.toSeq).toSeq
    }
    // 16 counters over a 503-key universe: eviction is constant.
    // support 100‰ · 17 > 1000 ⇒ completeness holds.
    val want = definitional(df, 100)
    assert(want.nonEmpty, "fixture must produce hitters")
    for (p <- Seq(1, 7, 32)) {
      val got = Sketch.heavyHitters(df.repartition(p), "key",
          counters = 16, supportPerMille = 100)
        .orderBy(col("key")).collect().map(_.toSeq).toSeq
      assert(got == want, s"heavyHitters diverged from definition at $p partitions")
    }
  }

  test("completeness precondition is enforced") {
    import spark.implicits._
    val df = Seq("a").toDF("key")
    intercept[IllegalArgumentException] {
      Sketch.heavyHitters(df, "key", counters = 16, supportPerMille = 8)
    }
  }
}
