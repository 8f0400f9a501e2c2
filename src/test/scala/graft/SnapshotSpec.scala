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
}
