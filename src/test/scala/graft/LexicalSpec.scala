package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Lexical

/** Lexical retrieval & matching invariants: the FastSS deletion-
  * neighborhood join must equal the brute-force Levenshtein definition
  * (recall AND precision 1.0), phrase matches must be verbatim substrings,
  * collocation lift must agree with an independently computed ratio, and
  * fertility totals must tie out to per-doc sums. */
class LexicalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  private def docs = graft.engine.Sources.documents(spark, dir)

  test("deletion neighborhood: size and membership laws") {
    import spark.implicits._
    val rows = Seq("spark", "a", "", "aaa").toDF("s")
      .select(col("s"), Lexical.deletionNeighborhood(col("s"), 2).as("nb"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
      .toMap
    // "spark": itself + 5 single deletions + C(5,2)=10 double deletions, all
    // distinct for this repeat-free string
    assert(rows("spark").length == 16)
    assert(rows("spark").contains("spark"))
    assert(rows("spark").contains("park") && rows("spark").contains("spk"))
    assert(!rows("spark").contains("sp"), "3 deletions is out of reach at d=2")
    // "a" → {a, ""}; "" → {""}; "aaa" collapses duplicates: {aaa, aa, a}
    assert(rows("a").toSet == Set("a", ""))
    assert(rows("").toSet == Set(""))
    assert(rows("aaa").toSet == Set("aaa", "aa", "a"))
  }

  test("vocabFuzzyPairs equals the brute-force all-pairs definition (d=1,2)") {
    val v = Lexical.vocab(docs, "text")
    for (d <- Seq(1, 2)) {
      val fast = Lexical.vocabFuzzyPairs(docs, "text", d)
        .orderBy("tok_a", "tok_b").collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      val brute = v.as("a").crossJoin(v.as("b"))
        .where(col("a.tok") < col("b.tok"))
        .select(col("a.tok").as("ta"), col("b.tok").as("tb"),
          levenshtein(col("a.tok"), col("b.tok")).as("dist"))
        .where(col("dist") <= d)
        .orderBy("ta", "tb").collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      assert(fast.toSeq == brute.toSeq, s"d=$d mismatch")
    }
  }

  test("phrase search: every hit is a verbatim token-run; counts tie out") {
    val phrase = Seq("join", "part", "filter")
    val hits = Lexical.phraseSearch(docs, "doc_id", "text", phrase).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    // independent check: count occurrences in the raw token arrays
    val expected = docs.select(col("doc_id"),
        graft.operators.TextOps.tokens(col("text")).as("tk"))
      .select(col("doc_id"), posexplode(col("tk")).as(Seq("p", "t")))
      .collect()
      .groupBy(_.getLong(0))
      .flatMap { case (id, rows) =>
        val toks = rows.sortBy(_.getInt(1)).map(_.getString(2)).toSeq
        toks.sliding(3).zipWithIndex.collect {
          case (w, i) if w == phrase => (id, i)
        }
      }.toSet
    assert(hits.toSet == expected, "phrase hits must equal the sliding scan")
    assert(hits.nonEmpty || expected.isEmpty)
  }

  test("postings: n_occ sums to corpus-wide term frequency; positions sorted") {
    val terms = Seq("table", "row")
    val p = Lexical.postings(docs, "doc_id", "text", terms).collect()
    assert(p.forall { r =>
      val pos = r.getSeq[Int](2); pos == pos.sorted && pos.length == r.getLong(3)
    })
    val byTerm = p.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(3)).sum)
    val tf = Lexical.invertedIndex(docs, "doc_id", "text")
      .where(col("token").isin(terms: _*))
      .groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTerm.toMap == tf)
  }

  test("collocations: lift_bp agrees with the independent exact ratio") {
    val rows = Lexical.collocations(docs, "text", minCount = 2, k = 20).collect()
    assert(rows.nonEmpty)
    val nTokens = docs.select(graft.operators.TextOps.tokenCount(col("text")))
      .collect().map(_.getInt(0).toLong).sum
    rows.foreach { r =>
      val (cxy, cx, cy, lift) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val expected = (BigInt(cxy) * nTokens * 10000) / (BigInt(cx) * cy)
      assert(BigInt(lift) == expected, s"row $r")
      assert(cxy <= cx && cxy <= cy, "a bigram cannot outnumber its words")
    }
    // deterministic ranking: non-increasing lift
    assert(rows.map(_.getLong(5)).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("oovReport: oov bounded by totals, exact rate, full vocab ⇒ zero") {
    val r = Lexical.oovReport(docs, "doc_id", "text", k = 16).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.nonEmpty && r.length == docs.count())
    r.foreach { case (_, n, oov, bp) =>
      assert(oov <= n)
      assert(bp == oov * 10000 / n)
    }
    val full = Lexical.oovReport(docs, "doc_id", "text", k = 1 << 20).collect()
    assert(full.forall(_.getLong(2) == 0L), "k ≥ |vocab| leaves nothing OOV")
  }

  test("tokenizer fertility: group totals tie out to per-doc sums") {
    val f = Lexical.tokenizerFertility(docs, "text", Seq("lang")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val perDoc = docs.select(col("lang"),
        graft.operators.TextOps.tokenCount(col("text")).cast("long").as("ws"))
      .groupBy("lang").agg(count(lit(1)).as("n"), sum("ws").as("ws"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(f.map(x => (x._1, x._2, x._3)).toSet == perDoc)
    // fertility ≥ 10000: the BPE-ish pretokenizer can only split words
    // further (every whitespace token yields ≥ 1 bpeish token)
    val full = Lexical.tokenizerFertility(docs, "text", Seq("lang")).collect()
    full.foreach { r =>
      assert(r.getAs[Long]("fertility_bp") >= 10000L,
        s"bpeish must not merge across words: $r")
    }
  }

  test("bm25: hand-computed integer score on a 4-doc corpus") {
    import spark.implicits._
    // N=4, dl = 3,2,4,3 → avgdl = 12 div 4 = 3.
    // "cat": df=2 → idf_bits = len(bin(4 div 2))-1 = 1
    // "dog": df=1 → idf_bits = len(bin(4 div 1))-1 = 2
    val corpus = Seq(
      (1L, "cat dog cat"), // cat tf=2, dog tf=1, dl=3
      (2L, "cat fish"),    // cat tf=1, dl=2
      (3L, "bird bird bird bird"), // no match, dl=4
      (4L, "x y z")).toDF("doc_id", "text")
    val out = Lexical.bm25(corpus, "doc_id", "text", Seq("cat", "dog"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // milli = (idf·tf·44·avgdl·1000) div (20·avgdl·tf + 6·avgdl + 18·dl)
    //       = (idf·tf·132000) div (60·tf + 18 + 18·dl) at avgdl = 3
    // doc1/cat: (1·2·132000) div (120 + 18 + 54) = 264000 div 192 = 1375
    // doc1/dog: (2·1·132000) div (60 + 18 + 54)  = 264000 div 132 = 2000
    // doc2/cat: (1·1·132000) div (60 + 18 + 36)  = 132000 div 114 = 1157
    assert(out == Map(1L -> (2L, 1375L + 2000L), 2L -> (1L, 1157L)))
    // doc with no query terms emits no row
    assert(!out.contains(3L) && !out.contains(4L))
  }
}
