package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Export, TextOps}

/** Training-shard export guarantees: content round-trip (every doc lands in
  * exactly its content-addressed shard, once), one file per shard
  * directory, a manifest that matches an independent recomputation, an
  * all-true audit on an intact export, and a false — never null — audit row
  * when a shard goes missing or the manifest lies. */
class ExportSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def withTmp(f: String => Unit): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_export_spec")
    try f(tmp.toString)
    finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp.toString)).deleteRecursively()
    }
  }

  private val docs = Seq(
    (1L, "alpha beta gamma"),
    (2L, "delta"),
    (3L, ""),
    (4L, "  epsilon  zeta "),
    (5L, "eta theta iota kappa"),
    (6L, "lambda mu"),
    (7L, "nu xi omicron"),
    (8L, "pi rho sigma tau upsilon"))

  test("writeShards: content round-trip, content-addressed assignment, one file per shard dir") {
    withTmp { tmp =>
      val df = docs.toDF("doc_id", "text")
      Export.writeShards(df, "doc_id", "text", nShards = 4, outDir = tmp)
      val back = spark.read.parquet(s"$tmp/shards")
      // every doc exactly once, text byte-identical
      val got = back.select(col("id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
      assert(got == docs.sortBy(_._1))
      // shard is the content-addressed rule, recomputed independently
      val expected = df.select(col("doc_id"),
          pmod(Dedup.md5Hash48(col("doc_id").cast("string")), lit(4L)).as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      back.select(col("id"), col("shard").cast("long")).collect()
        .foreach(r => assert(r.getLong(1) == expected(r.getLong(0)),
          s"doc ${r.getLong(0)} in wrong shard"))
      // one parquet file per shard directory (the training-loader contract)
      val shardDirs = new java.io.File(s"$tmp/shards").listFiles()
        .filter(_.getName.startsWith("shard="))
      assert(shardDirs.nonEmpty)
      shardDirs.foreach { d =>
        val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1, s"${d.getName}: ${files.length} files")
      }
      // stored n_tokens matches the tokenizer convention (empty doc → 0)
      val tok3 = back.where(col("id") === 3L).select(col("n_tokens"))
        .collect()(0).getLong(0)
      assert(tok3 == 0L, "empty doc must store zero tokens")
    }
  }

  test("manifest ≡ independent recomputation; audit all-true on an intact export") {
    withTmp { tmp =>
      val df = docs.toDF("doc_id", "text")
      Export.writeShards(df, "doc_id", "text", nShards = 4, outDir = tmp)
      val manifest = spark.read.parquet(s"$tmp/manifest")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val expect = df.select(
          pmod(Dedup.md5Hash48(col("doc_id").cast("string")), lit(4L)).as("shard"),
          size(TextOps.tokens(col("text"))).cast("long").as("t"),
          Dedup.md5Hash48(concat(col("doc_id").cast("string"), lit(":"), col("text"))).as("fp"))
        .groupBy("shard").agg(count(lit(1)), sum("t"), expr("bit_xor(fp)"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(manifest == expect, "manifest must equal independent recomputation")
      val audit = Export.auditShards(spark, tmp).collect()
      assert(audit.nonEmpty && audit.forall(_.getBoolean(4)),
        "intact export must audit all-true")
      // audit rows carry the recomputed quantities, equal to the manifest's
      audit.foreach { r =>
        assert(expect(r.getLong(0)) == ((r.getLong(1), r.getLong(2), r.getLong(3))))
      }
    }
  }

  test("audit flags a missing shard and a lying manifest as FALSE, never null") {
    withTmp { tmp =>
      val df = docs.toDF("doc_id", "text")
      Export.writeShards(df, "doc_id", "text", nShards = 4, outDir = tmp)
      // tamper 1: remove one shard directory wholesale
      val aShard = new java.io.File(s"$tmp/shards").listFiles()
        .filter(_.getName.startsWith("shard=")).head
      import scala.reflect.io.Directory
      new Directory(aShard).deleteRecursively()
      val audit = Export.auditShards(spark, tmp)
        .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
      val missing = aShard.getName.stripPrefix("shard=").toLong
      assert(audit(missing) == false, "missing shard must audit false")
      assert(audit.count(!_._2) == 1, "other shards still match")
    }
    withTmp { tmp =>
      val df = docs.toDF("doc_id", "text")
      Export.writeShards(df, "doc_id", "text", nShards = 2, outDir = tmp)
      // tamper 2: rewrite the manifest with an inflated doc count
      val lied = spark.read.parquet(s"$tmp/manifest")
        .withColumn("n_docs", col("n_docs") + 1)
      lied.cache().count() // detach from the file being overwritten
      lied.coalesce(1).write.mode("overwrite").parquet(s"$tmp/manifest")
      lied.unpersist()
      val audit = Export.auditShards(spark, tmp).collect()
      assert(audit.forall(!_.getBoolean(4)), "lying manifest must audit false")
    }
  }

  test("export is deterministic: a rewrite reproduces identical manifest and membership") {
    withTmp { tmp1 =>
      withTmp { tmp2 =>
        val df = docs.toDF("doc_id", "text").repartition(5) // different physical layout
        Export.writeShards(docs.toDF("doc_id", "text"), "doc_id", "text", 4, tmp1)
        Export.writeShards(df, "doc_id", "text", 4, tmp2)
        def canon(p: String) = spark.read.parquet(s"$p/manifest")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .sortBy(_._1).toSeq
        assert(canon(tmp1) == canon(tmp2),
          "shard membership must be content-addressed, not partition-accidental")
      }
    }
  }
}
