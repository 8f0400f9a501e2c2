package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Snapshot

/** The snapshot-commit protocol's guarantees, each proven against a
  * planted failure: torn commits and orphan files are invisible, readers
  * are isolated from concurrent commits, MERGE leaves the previous
  * snapshot intact, vacuum honors retention. */
class SnapshotSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_snap_spec").toString

  private def cleanup(dir: String): Unit = {
    import scala.reflect.io.Directory
    new Directory(new java.io.File(dir)).deleteRecursively()
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.select("id", "v").collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("append commits accumulate; readAt time-travels; ids are dense") {
    import spark.implicits._
    val t = tmpTable()
    try {
      val id0 = Snapshot.commitAppend(spark, t,
        Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      val id1 = Snapshot.commitAppend(spark, t,
        Seq((3L, "c")).toDF("id", "v"))
      assert(id0 == 0L && id1 == 1L)
      assert(Snapshot.currentSnapshotId(spark, t).contains(1L))
      assert(rows(Snapshot.read(spark, t)) ==
        Set((1L, "a"), (2L, "b"), (3L, "c")))
      assert(rows(Snapshot.readAt(spark, t, 0L)) == Set((1L, "a"), (2L, "b")))
      // manifest n_rows accounts for every committed row
      val n = Snapshot.readManifest(spark, t, 1L)
        .agg(sum(col("n_rows"))).collect().head.getLong(0)
      assert(n == 3L)
    } finally cleanup(t)
  }

  test("a TORN commit (manifest without _SUCCESS) is invisible; a retried commit at the same id heals it") {
    import spark.implicits._
    val t = tmpTable()
    try {
      Snapshot.commitAppend(spark, t, Seq((1L, "a")).toDF("id", "v"))
      // simulate a crash between manifest task files and the _SUCCESS
      // marker: run a real commit, then delete its _SUCCESS
      Snapshot.commitAppend(spark, t, Seq((2L, "b")).toDF("id", "v"))
      assert(new java.io.File(s"$t/manifests/snap=1/_SUCCESS").delete())
      assert(Snapshot.currentSnapshotId(spark, t).contains(0L),
        "torn manifest must not be the current snapshot")
      assert(rows(Snapshot.read(spark, t)) == Set((1L, "a")),
        "reader must see the previous snapshot only")
      // the writer retries: same next id, overwrite clears the torn dir
      val id = Snapshot.commitAppend(spark, t, Seq((2L, "b2")).toDF("id", "v"))
      assert(id == 1L)
      assert(rows(Snapshot.read(spark, t)) == Set((1L, "a"), (2L, "b2")))
    } finally cleanup(t)
  }

  test("ORPHAN data files (written, never published) are invisible to readers and reclaimed by vacuum") {
    import spark.implicits._
    val t = tmpTable()
    try {
      Snapshot.commitAppend(spark, t, Seq((1L, "a")).toDF("id", "v"))
      // a crashed commit's step 1: data files land, no manifest ever does
      Seq((99L, "orphan")).toDF("id", "v")
        .write.parquet(s"$t/data/c=orphan")
      assert(rows(Snapshot.read(spark, t)) == Set((1L, "a")),
        "orphan data files must never surface in a read")
      val (deleted, dropped) = Snapshot.vacuum(spark, t, retainLast = 1)
      assert(deleted >= 1, "vacuum must reclaim the orphan's parquet files")
      assert(dropped == 0)
      assert(rows(Snapshot.read(spark, t)) == Set((1L, "a")))
    } finally cleanup(t)
  }

  test("SNAPSHOT ISOLATION: a frame resolved at snapshot S still reads S after later commits land") {
    import spark.implicits._
    val t = tmpTable()
    try {
      Snapshot.commitAppend(spark, t, Seq((1L, "a")).toDF("id", "v"))
      val pinned = Snapshot.read(spark, t) // file list resolved NOW
      Snapshot.commitAppend(spark, t, Seq((2L, "b")).toDF("id", "v"))
      Snapshot.commitRewrite(spark, t,
        Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(1))
      assert(rows(pinned) == Set((1L, "a")),
        "a pinned reader must be isolated from concurrent commits")
      assert(rows(Snapshot.read(spark, t)) == Set((1L, "a"), (2L, "b")))
    } finally cleanup(t)
  }

  test("commitMerge: MERGE semantics through the protocol; the PREVIOUS snapshot survives intact") {
    import spark.implicits._
    val t = tmpTable()
    try {
      Snapshot.commitAppend(spark, t,
        Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
      val src = Seq((1L, "a2", false), (2L, "b", true), (4L, "d", false))
        .toDF("id", "v", "del")
      val id = Snapshot.commitMerge(spark, t, src, "id", Seq("v"), col("del"))
      assert(id == 1L)
      assert(rows(Snapshot.read(spark, t)) ==
        Set((1L, "a2"), (3L, "c"), (4L, "d")))
      // time travel: the pre-merge state is a first-class snapshot
      assert(rows(Snapshot.readAt(spark, t, 0L)) ==
        Set((1L, "a"), (2L, "b"), (3L, "c")))
    } finally cleanup(t)
  }

  test("vacuum: unreferenced data files deleted, old manifests dropped, every RETAINED snapshot stays readable") {
    import spark.implicits._
    val t = tmpTable()
    try {
      Snapshot.commitAppend(spark, t, Seq((1L, "a")).toDF("id", "v"))
      Snapshot.commitAppend(spark, t, Seq((2L, "b")).toDF("id", "v"))
      // full rewrite: snapshot 2 references ONLY c=2 files
      Snapshot.commitRewrite(spark, t,
        Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(1))
      val (deleted, dropped) = Snapshot.vacuum(spark, t, retainLast = 1)
      assert(dropped == 2, s"manifests 0,1 must drop, dropped $dropped")
      assert(deleted >= 2, s"c=0/c=1 files must be reclaimed, deleted $deleted")
      assert(rows(Snapshot.read(spark, t)) == Set((1L, "a"), (2L, "b")),
        "the retained snapshot must remain fully readable")
      intercept[Exception](Snapshot.readAt(spark, t, 0L).collect())
    } finally cleanup(t)
  }

  test("commitAppendAt: a REPLAYED batch id resolves the same predecessor and rewrites itself idempotently") {
    import spark.implicits._
    val t = tmpTable()
    try {
      Snapshot.commitAppendAt(spark, t, 0L, Seq((1L, "a")).toDF("id", "v"))
      Snapshot.commitAppendAt(spark, t, 1L, Seq((2L, "b")).toDF("id", "v"))
      val before = rows(Snapshot.read(spark, t))
      assert(before == Set((1L, "a"), (2L, "b")))
      // replay batch 1 (crash between publish and checkpoint commit): a
      // PUBLISHED snap=1 short-circuits — same batch id implies same source
      // offsets under the single-writer contract, and rewriting data/c=1
      // (overwrite deletes first) would yank files the live manifest still
      // references out from under concurrent readers (round-15 advice)
      def parts() = new java.io.File(s"$t/data/c=1").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length)).toSet
      val partsBefore = parts()
      assert(Snapshot.commitAppendAt(spark, t, 1L,
        Seq((2L, "b")).toDF("id", "v")) == 1L)
      assert(Snapshot.currentSnapshotId(spark, t).contains(1L))
      assert(rows(Snapshot.read(spark, t)) == before,
        "a replayed batch must keep its snapshot content, never append twice")
      assert(parts() == partsBefore,
        "replay of a PUBLISHED snapshot must not touch its data files")
      // a TORN attempt at the id (no _SUCCESS — invisible to readers) is
      // NOT a completed commit and must fall through to the full rewrite
      Snapshot.commitAppendAt(spark, t, 2L, Seq((3L, "c")).toDF("id", "v"))
      assert(new java.io.File(s"$t/manifests/snap=2/_SUCCESS").delete())
      Snapshot.commitAppendAt(spark, t, 2L, Seq((3L, "c2")).toDF("id", "v"))
      assert(rows(Snapshot.read(spark, t)) ==
        Set((1L, "a"), (2L, "b"), (3L, "c2")),
        "a torn attempt must be rewritten by its replay")
    } finally cleanup(t)
  }

  test("snapshotAppendStream: per-micro-batch atomic publishes; torn/orphan plants invisible; batches time-travel") {
    import spark.implicits._
    val t = tmpTable()
    val base = new java.io.File(t + "_stream"); base.mkdirs()
    try {
      val srcDir = new java.io.File(base, "src"); srcDir.mkdirs()
      Seq(("g0", Seq((1L, "a"), (2L, "b")), 1000000000000L),
          ("g1", Seq((3L, "c")), 1000000060000L))
        .foreach { case (name, data, mtime) =>
          val stage = new java.io.File(base, s"stage_$name")
          data.toDF("id", "v").coalesce(1)
            .write.mode("overwrite").parquet(stage.getPath)
          val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
          val tgt = new java.io.File(srcDir, s"$name.parquet")
          java.nio.file.Files.move(part.toPath, tgt.toPath)
          // batch order rides on mtime — fail here, not as a downstream flake
          require(tgt.setLastModified(mtime),
            s"setLastModified unsupported on $tgt")
        }
      val deltas = spark.readStream.schema("id BIGINT, v STRING")
        .option("maxFilesPerTrigger", "1").parquet(srcDir.getPath)
      val sq = graft.streaming.StreamingOps.snapshotAppendStream(
        deltas, t, new java.io.File(base, "ckpt").getPath)
      try sq.awaitTermination() finally if (sq.isActive) sq.stop()
      // each micro-batch is a first-class snapshot
      assert(rows(Snapshot.readAt(spark, t, 0L)) == Set((1L, "a"), (2L, "b")))
      assert(rows(Snapshot.read(spark, t)) ==
        Set((1L, "a"), (2L, "b"), (3L, "c")))
      // plants: orphan data + torn manifest stay invisible
      Seq((9L, "ORPHAN")).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$t/data/c=777")
      Snapshot.commitAppendAt(spark, t, 778L, Seq((8L, "TORN")).toDF("id", "v"))
      assert(new java.io.File(s"$t/manifests/snap=778/_SUCCESS").delete())
      assert(rows(Snapshot.read(spark, t)) ==
        Set((1L, "a"), (2L, "b"), (3L, "c")),
        "orphan/torn plants must not surface through the manifest read")
    } finally { cleanup(t); cleanup(base.getPath) }
  }

  test("refs: versioned pointer moves, torn versions ignored, dangling targets rejected") {
    import spark.implicits._
    val t = tmpTable()
    try {
      Snapshot.commitAppend(spark, t, Seq((1L, "a")).toDF("id", "v"))
      Snapshot.commitAppend(spark, t, Seq((2L, "b")).toDF("id", "v"))
      assert(Snapshot.readRef(spark, t, "main").isEmpty,
        "an unset ref must read as absent")
      intercept[IllegalStateException](
        Snapshot.readAtRef(spark, t, "main").collect())
      Snapshot.setRef(spark, t, "main", 0L)
      assert(Snapshot.readRef(spark, t, "main").contains(0L))
      assert(rows(Snapshot.readAtRef(spark, t, "main")) == Set((1L, "a")),
        "the ref reader must see the ref's target, not the newest snapshot")
      // a move WRITES a new version — nothing deleted, old-or-new only
      Snapshot.setRef(spark, t, "main", 1L)
      assert(Snapshot.readRef(spark, t, "main").contains(1L))
      // torn pointer version (no _SUCCESS) resolves to the previous one
      Snapshot.setRef(spark, t, "main", 0L)
      assert(new java.io.File(s"$t/refs/main/r=2/_SUCCESS").delete())
      assert(Snapshot.readRef(spark, t, "main").contains(1L),
        "a torn pointer version must be invisible")
      // dangling targets are refused outright
      intercept[IllegalArgumentException](
        Snapshot.setRef(spark, t, "main", 99L))
      intercept[IllegalArgumentException](
        Snapshot.setRef(spark, t, "bad/name", 0L))
    } finally cleanup(t)
  }

  test("write-audit-publish: a failed candidate never publishes; the fix appends onto the audited PARENT") {
    import spark.implicits._
    val t = tmpTable()
    try {
      val base = Snapshot.commitAppend(spark, t,
        Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      Snapshot.setRef(spark, t, "main", base)
      // candidate with a planted corruption — audit fails, ref stays
      val bad = Snapshot.commitAppend(spark, t,
        Seq((3L, "CORRUPT")).toDF("id", "v"))
      val audit = Snapshot.readAt(spark, t, bad)
        .where(col("v") === "CORRUPT").count() == 0
      assert(!audit && Snapshot.readRef(spark, t, "main").contains(base))
      // corrected candidate appends onto the audited PARENT, abandoning
      // the bad lineage (which stays readable by id for debugging)
      val fixed = Snapshot.commitAppend(spark, t,
        Seq((3L, "c")).toDF("id", "v"), parent = Some(base))
      Snapshot.setRef(spark, t, "main", fixed)
      assert(rows(Snapshot.readAtRef(spark, t, "main")) ==
        Set((1L, "a"), (2L, "b"), (3L, "c")),
        "the published lineage must be base + fix, no corrupted rows")
      assert(rows(Snapshot.readAt(spark, t, bad)) ==
        Set((1L, "a"), (2L, "b"), (3L, "CORRUPT")),
        "the failed candidate stays addressable by id until vacuum")
      // appending onto an uncommitted parent is refused
      intercept[IllegalArgumentException](Snapshot.commitAppend(spark, t,
        Seq((9L, "x")).toDF("id", "v"), parent = Some(42L)))
    } finally cleanup(t)
  }

  test("deletion vectors: positional merge-on-read delete — files immobile, time travel intact, post-delete appends untouched, rewrite retires the vector") {
    import spark.implicits._
    val t = tmpTable()
    try {
      // two rows share every column value — a KEYED tombstone could not
      // even name one of them; the positional vector can
      Snapshot.commitAppend(spark, t,
        Seq((1L, "keep"), (2L, "drop"), (2L, "drop")).toDF("id", "v"))
      def dataFiles() = {
        val d = new java.io.File(s"$t/data")
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(d).filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getPath, f.length, f.lastModified)).toSet
      }
      val filesBefore = dataFiles()
      // the vector carries one (file, pos) entry PER OCCURRENCE — both
      // identical rows are named individually, which no keyed form can do
      Snapshot.commitDelete(spark, t, col("v") === "drop")
      assert(Snapshot.read(spark, t).collect().map(_.getString(1)).toSeq
        == Seq("keep"), "both positional duplicates must be gone")
      assert(dataFiles() == filesBefore,
        "a DV delete must not touch data files")
      // time travel: the pre-delete snapshot still has all three rows
      assert(Snapshot.readAt(spark, t, 0L).count() == 3)
      // post-delete appends are outside the vector — even identical rows
      Snapshot.commitAppend(spark, t, Seq((2L, "drop")).toDF("id", "v"))
      assert(rows(Snapshot.read(spark, t)) == Set((1L, "keep"), (2L, "drop")),
        "the vector binds to the files it was computed over")
      // second delete is CUMULATIVE with the first
      Snapshot.commitDelete(spark, t, col("id") === 1L)
      assert(rows(Snapshot.read(spark, t)) == Set((2L, "drop")))
      // physical application: rewrite the merge-on-read view, vacuum
      Snapshot.commitRewrite(spark, t, Snapshot.read(spark, t))
      val m = Snapshot.readManifest(spark, t,
        Snapshot.currentSnapshotId(spark, t).get)
      assert(!m.columns.contains("dv_dir") ||
        m.where(col("dv_dir").isNotNull).count() == 0,
        "a rewrite materializes survivors and drops the vector")
      Snapshot.vacuum(spark, t, retainLast = 1)
      assert(!new java.io.File(s"$t/dv").exists() ||
        new java.io.File(s"$t/dv").listFiles().isEmpty,
        "vacuum must reclaim unreferenced deletion vectors")
      assert(rows(Snapshot.read(spark, t)) == Set((2L, "drop")))
    } finally cleanup(t)
  }
}
