package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Snapshot

/** Plan pins for the round-16 additions: manifest-carried file statistics
  * (X156) — the stats-pruned snapshot read must open STRICTLY FEWER files
  * than the manifest lists (the skip is real, not vacuous) while losing no
  * qualifying row, and the conservative null-envelope rule must hold when
  * pre-stats manifest generations are mixed in. */
class Round16PlansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("corpus_snapshot_pruned_read: scan opens a strict subset of the manifest's files; result ≡ unpruned filter") {
    val t = graft.queries.CurationQueries.snapshotStatsTableDir(spark, dir)
    val id = Snapshot.currentSnapshotId(spark, t).get
    val manifest = Snapshot.readManifest(spark, t, id)
    // the manifest CARRIES the envelopes — no sidecar stats table
    Seq("min_lang", "max_lang", "min_doc_id", "max_doc_id").foreach(c =>
      assert(manifest.columns.contains(c), s"manifest must carry $c"))
    val nManifest = manifest.count()
    val pruned = SparkEntry.queries("corpus_snapshot_pruned_read")(spark, dir)
    pruned.collect()
    val opened = pruned.inputFiles.length
    assert(opened > 0 && opened < nManifest,
      s"pruned scan must open a strict subset: $opened of $nManifest files")
    // exactness: the pruned selection equals the unpruned relational filter
    val expect = Snapshot.read(spark, t).where(col("lang") === "de")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .collect().map(_.toSeq).toSet
    assert(pruned.collect().map(_.toSeq).toSet == expect,
      "envelope pruning dropped or invented rows")
  }

  test("readPruned is conservative: null envelopes (pre-stats commits) are read, never skipped") {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft_snap_prune").toString
    try {
      // generation 0: committed BEFORE stats were declared — null envelopes
      Snapshot.commitAppend(spark, t, Seq((1L, "legacy")).toDF("id", "v"))
      // generation 1: stats-carrying append
      Snapshot.commitAppend(spark, t, Seq((100L, "new")).toDF("id", "v"),
        statsCols = Seq("id"))
      val m = Snapshot.readManifest(spark, t,
        Snapshot.currentSnapshotId(spark, t).get)
      assert(m.where(col("min_id").isNull).count() == 1,
        "the pre-stats file must union in with a null envelope")
      // keep-predicate matches only the new file's envelope; the legacy
      // file's null envelope must be READ anyway (unknown ≠ skippable)
      val got = Snapshot.readPruned(spark, t,
          keep = col("min_id") <= 100L && col("max_id") >= 100L)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "legacy"), (100L, "new")),
        s"conservative read must include the null-envelope file, got $got")
      // a predicate excluding the stats-carrying file keeps ONLY legacy
      val only = Snapshot.readPruned(spark, t,
          keep = col("max_id") < 50L)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(only == Set((1L, "legacy")), s"got $only")
      // empty selection (null-free manifest, nothing qualifies): build a
      // stats-only table and prune everything — empty frame, right schema
      val t2 = java.nio.file.Files.createTempDirectory("graft_snap_prune2").toString
      try {
        Snapshot.commitAppend(spark, t2, Seq((5L, "x")).toDF("id", "v"),
          statsCols = Seq("id"))
        val none = Snapshot.readPruned(spark, t2, keep = col("max_id") < 0L)
        assert(none.columns.toSeq == Seq("id", "v") && none.count() == 0)
      } finally cleanup(t2)
    } finally cleanup(t)
  }

  test("commitMerge with statsCols: the rewrite's manifest carries fresh envelopes") {
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft_snap_mstats").toString
    try {
      Snapshot.commitAppend(spark, t,
        Seq((1L, "a"), (2L, "b")).toDF("id", "v"), statsCols = Seq("id"))
      Snapshot.commitMerge(spark, t,
        Seq((3L, "c", false)).toDF("id", "v", "del"),
        "id", Seq("v"), col("del"), statsCols = Seq("id"))
      val m = Snapshot.readManifest(spark, t,
        Snapshot.currentSnapshotId(spark, t).get)
      val envs = m.agg(min(col("min_id")), max(col("max_id")))
        .collect().head
      assert(envs.getLong(0) == 1L && envs.getLong(1) == 3L,
        "post-merge manifest envelopes must cover the merged table")
    } finally cleanup(t)
  }

  private def cleanup(dir: String): Unit = {
    import scala.reflect.io.Directory
    new Directory(new java.io.File(dir)).deleteRecursively(); ()
  }
}
