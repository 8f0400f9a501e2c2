package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Dedup, Multimodal, Similarity, Skew}

/** Degenerate-input behavior of every library operator: empty tables,
  * single rows, and null payloads must flow through without exceptions and
  * with sensible (empty) results — the failure mode these catch is a
  * runtime error deep inside a 100 TB job when one partition turns out
  * empty or one document is blank. */
class EdgeCasesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  test("dedup operators on an empty corpus return empty, not errors") {
    assert(Dedup.exact(emptyDocs, Seq("text"), "doc_id").count() == 0)
    assert(Dedup.exactJaccardJoin(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.minHashLsh(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.nearDedupSurvivors(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.containmentJoin(emptyDocs, "doc_id", "text").count() == 0)
  }

  test("round-7 additions on empty / degenerate corpora return empty or neutral, not errors") {
    import org.apache.spark.sql.functions.col
    // classifier: empty corpus → empty; whitespace-only doc → gate-neutral
    assert(graft.operators.TextOps.classifierScore(emptyDocs, "doc_id", "text")
      .count() == 0)
    val blank = Seq((1L, " ")).toDF("doc_id", "text")
    val r = graft.operators.TextOps.classifierScore(blank, "doc_id", "text")
      .collect()(0)
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getInt(4) == 1)
    // quantile norm: empty → empty (the per-source window over nothing)
    val emptySrc = emptyDocs.withColumn("source",
      org.apache.spark.sql.functions.lit("s"))
    assert(graft.operators.Curation.sourceQuantileNorm(
      emptySrc, "doc_id", "text", "source").count() == 0)
    // compaction plan: empty → empty; single row → bin 0
    val emptyW = emptySrc.withColumn("n_chars",
      org.apache.spark.sql.functions.lit(1L))
    assert(graft.operators.Layout.compactionPlan(
      emptyW, "source", "n_chars", "doc_id", 100L).count() == 0)
    val one = Seq(("s", 1L, 5L)).toDF("source", "doc_id", "n_chars")
    val bins = graft.operators.Layout.compactionPlan(
      one, "source", "n_chars", "doc_id", 100L).collect()
    assert(bins.length == 1 && bins(0).getLong(3) == 0L)
    // weighted sampling: zero expectedN keeps nothing; empty corpus is empty
    val docs1 = Seq((1L, "x", 10L)).toDF("doc_id", "text", "n_chars")
    assert(graft.operators.Sampling.weightedPoissonSample(
      docs1, "text", "n_chars", expectedN = 0L).count() == 0)
    assert(graft.operators.Sampling.weightedPoissonSample(
      emptyW.withColumnRenamed("source", "src"), "text", "n_chars", 1L)
      .count() == 0)
  }

  test("lexical / graph / SN additions on empty or degenerate inputs") {
    import org.apache.spark.sql.functions.col
    // vocabulary-level fuzzy pairs: empty corpus → no vocab → no pairs
    assert(graft.operators.Lexical.vocabFuzzyPairs(emptyDocs, "text").count() == 0)
    // a single-token corpus has no pair (tok_a < tok_b is irreflexive)
    val one = Seq((1L, "solo solo solo")).toDF("doc_id", "text")
    assert(graft.operators.Lexical.vocabFuzzyPairs(one, "text").count() == 0)
    // phrase longer than every doc → empty, not an error
    assert(graft.operators.Lexical.phraseSearch(one, "doc_id", "text",
      Seq("solo", "solo", "solo", "solo")).count() == 0)
    // collocations with minCount above any corpus count → empty
    assert(graft.operators.Lexical.collocations(one, "text",
      minCount = 100).count() == 0)
    // oov: k=0 style degenerate — smallest legal k keeps the top token only
    val oov = graft.operators.Lexical.oovReport(one, "doc_id", "text", k = 1)
      .collect()(0)
    assert(oov.getLong(1) == 3L && oov.getLong(2) == 0L)
    // fertility on empty corpus → no groups
    assert(graft.operators.Lexical.tokenizerFertility(
      emptyDocs.withColumn("lang", org.apache.spark.sql.functions.lit("en")),
      "text", Seq("lang")).count() == 0)
    // triangles: empty edges, self-loops only, and a single edge → empty
    val selfOnly = Seq((1L, 1L)).toDF("a", "b")
    assert(graft.operators.Graph.triangles(selfOnly, "a", "b").count() == 0)
    val oneEdge = Seq((1L, 2L)).toDF("a", "b")
    assert(graft.operators.Graph.triangles(oneEdge, "a", "b").count() == 0)
    // sorted neighborhood: empty corpus and single doc → no pairs
    assert(graft.operators.Dedup.sortedNeighborhoodPairs(
      emptyDocs, "doc_id", "text").count() == 0)
    assert(graft.operators.Dedup.sortedNeighborhoodPairs(
      one, "doc_id", "text").count() == 0)
    // best-copy survivors with no pairs: everyone is their own cluster
    val scored = Seq((1L, 5L), (2L, 7L)).toDF("id", "s")
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val surv = graft.operators.Dedup.bestCopySurvivors(scored, "id", "s", noPairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(surv == Set((1L, 1L, 1L), (2L, 2L, 1L)))
    // bigram surprisal: empty corpus → empty; all-short docs → zeros
    assert(graft.operators.TextOps.bigramSurprisal(
      emptyDocs, "doc_id", "text").count() == 0)
  }

  test("audit checks: hand-built frames with known defects") {
    import graft.operators.Audit
    val child = Seq((1L, "a"), (2L, "b"), (2L, "b2"), (9L, "x"))
      .toDF("k", "v")
    val parent = Seq((1L, "p"), (2L, "p")).toDF("pk", "pv")
    def one(df: org.apache.spark.sql.DataFrame): Long =
      df.collect()(0).getLong(2)
    assert(one(Audit.rowCount(child, "t")) == 4L)
    assert(one(Audit.duplicateKeys(child, "t", Seq("k"))) == 1L,
      "k=2 twice ⇒ one extra copy")
    assert(one(Audit.orphans(child, "t", "k", parent, "pk")) == 1L,
      "k=9 has no parent")
    val withNull = Seq((1L, Option("a")), (2L, Option.empty[String]))
      .toDF("k", "v")
    assert(one(Audit.nullCount(withNull, "t", "v")) == 1L)
    // empty inputs: zero counts, not errors
    assert(one(Audit.duplicateKeys(emptyDocs, "t", Seq("doc_id"))) == 0L)
    assert(one(Audit.orphans(emptyDocs, "t", "doc_id", parent, "pk")) == 0L)
  }

  test("span dedup / vocabulary / repetition on an empty corpus return empty, not errors") {
    assert(Dedup.duplicateSpans(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.docDuplicateSpanRates(emptyDocs, "doc_id", "text").count() == 0)
    assert(graft.operators.TextOps.vocabulary(emptyDocs, "doc_id", "text").count() == 0)
    assert(graft.operators.TextOps.repetitionSignals(emptyDocs, "doc_id", "text").count() == 0)
    assert(graft.operators.TextOps.topTermsPerDoc(emptyDocs, "doc_id", "text").count() == 0)
  }

  test("curation operators on empty / degenerate corpora return empty or total, not errors") {
    import graft.operators.Curation
    assert(Curation.contaminationReport(emptyDocs, "doc_id", "text",
      benchPred = col("doc_id") % 11 === 0).count() == 0)
    assert(Curation.packSequences(emptyDocs, "doc_id", "text").count() == 0)
    assert(Curation.scrub(emptyDocs, "doc_id", "text", Seq("x")).count() == 0)
    assert(Curation.qualityGate(emptyDocs, "doc_id", "text").count() == 0)
    // a single doc is its own 0.25-quantile → >= threshold keeps it
    val one = Seq((1L, "hello world")).toDF("doc_id", "text")
    assert(Curation.qualityGate(one, "doc_id", "text").count() == 1)
    // an all-benchmark corpus yields an empty (not failing) report
    val bench = Seq((0L, "a b c d e f")).toDF("doc_id", "text")
    assert(Curation.contaminationReport(bench, "doc_id", "text",
      benchPred = lit(true)).count() == 0)
    // empty-text doc: packing charges max(n,1) so chunk ids stay well-formed
    val blank = Seq((1L, ""), (2L, "one two")).toDF("doc_id", "text")
    assert(Curation.packSequences(blank, "doc_id", "text").count() == 2)
  }

  test("connectedComponents on empty pairs terminates with empty output") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty, "id_a", "id_b").count() == 0)
  }

  test("single-doc corpus: no self-pairs from any dedup path") {
    val one = Seq((1L, "hello world foo bar baz")).toDF("doc_id", "text")
    assert(Dedup.exactJaccardJoin(one, "doc_id", "text").count() == 0)
    assert(Dedup.minHashLsh(one, "doc_id", "text").count() == 0)
    val sig = one.select(col("doc_id"),
      graft.functions.SimHash64.simhash64(graft.operators.TextOps.tokens(col("text"))).as("sh"))
    assert(Dedup.simHashNearDupPairs(sig, "doc_id", "sh", 5).count() == 0)
    assert(Dedup.nearDedupSurvivors(one, "doc_id", "text").count() == 1)
  }

  test("blank and whitespace-only documents survive the shingle path") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "real text here ok")).toDF("doc_id", "text")
    // blank docs shingle to [""] and can only match each other (jaccard 1.0)
    val pairs = Dedup.exactJaccardJoin(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("similarity with empty query set returns empty top-k") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val noQueries = emb.where(col("vec_id") < 0)
    assert(Similarity.bruteForceTopK(emb, noQueries, "vec_id", "embedding").count() == 0)
    assert(Similarity.lshTopK(emb, noQueries, "vec_id", "embedding").count() == 0)
  }

  test("saltedJoin with empty fact or dim behaves as inner join (empty)") {
    val fact = Seq((1L, 10L)).toDF("k", "payload")
    val emptyDim = Seq.empty[(Long, String)].toDF("k", "name")
    assert(Skew.saltedJoin(fact, emptyDim, "k", 4, col("payload")).count() == 0)
  }

  test("temporal joins on empty sides return sensible results, not errors") {
    import graft.operators.Temporal
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq((1L, "a", ts("2024-01-01 10:00:00"))).toDF("id", "k", "t")
    val emptyR = Seq.empty[(String, java.sql.Timestamp, Double)].toDF("k", "t", "v")
    // empty right: every left row survives with null asof columns
    val asof = Temporal.asofJoin(l, emptyR, Seq("k"), "t", "t", Seq("v")).collect()
    assert(asof.length == 1 && asof(0).isNullAt(3) && asof(0).isNullAt(4))
    // empty right: band join emits nothing (inner)
    assert(Temporal.timeBandJoin(l, emptyR, Seq("k"), "t", "t", 60L).count() == 0)
    // empty left: both empty
    val emptyL = Seq.empty[(Long, String, java.sql.Timestamp)].toDF("id", "k", "t")
    val r = Seq(("a", ts("2024-01-01 09:00:00"), 1.0)).toDF("k", "t", "v")
    assert(Temporal.asofJoin(emptyL, r, Seq("k"), "t", "t", Seq("v")).count() == 0)
    assert(Temporal.timeBandJoin(emptyL, r, Seq("k"), "t", "t", 60L).count() == 0)
  }

  test("md5-48 simhash signatures: empty corpus and tokenless docs") {
    val sigs = Dedup.simHashMd5Signatures(emptyDocs, "doc_id", "text")
    assert(sigs.count() == 0)
    val blank = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val got = Dedup.simHashMd5Signatures(blank, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L), "tokenless docs sign to 0")
  }

  test("groupCentroids: empty input and single-vector groups") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("label", IntegerType),
        StructField("embedding", ArrayType(FloatType)))))
    assert(Similarity.groupCentroids(empty, "label", "embedding").count() == 0)
    val one = Seq((7, Array(1.5f, -2.5f))).toDF("label", "embedding")
    val got = Similarity.groupCentroids(one, "label", "embedding")
      .orderBy("pos")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((0, 1L, 1.5), (1, 1L, -2.5)),
      "single-vector group mean is the vector itself")
  }

  test("md5Hash48 native vs hex twin on empty and null input") {
    val df = Seq(Some(""), Some("x"), None).toDF("t")
      .select(Dedup.md5Hash48(col("t")).as("n"), Dedup.md5Hash48Hex(col("t")).as("h"))
      .collect()
    df.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), "null propagation must match")
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1))
    }
  }

  test("multimodal expressions tolerate null payloads") {
    val df = Seq((1L, Some("x".getBytes("UTF-8"))), (2L, None))
      .toDF("id", "payload")
    val out = df.select(col("id"),
      Multimodal.sniffMime(col("payload")).as("mime"),
      Multimodal.byteLen(col("payload")).as("len"),
      Multimodal.fakeFeatures(col("payload"), 4).as("f"))
      .collect().map(r => (r.getLong(0), r.isNullAt(2))).toMap
    assert(!out(1L) && out(2L), "null payload → null length, no exception")
  }
}
