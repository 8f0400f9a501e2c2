package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, lit, when}
import graft.operators.Versioning

/** Snapshot-diff guarantees: exact added/removed/changed classification,
  * unchanged docs never emitted (delta-sized output), fingerprints present
  * exactly on the sides where the doc exists. */
class VersioningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("snapshotDiff: classifies added/removed/changed, suppresses unchanged") {
    import spark.implicits._
    val oldSnap = Seq(
      (1L, "same text"), (2L, "will change"), (3L, "will vanish")
    ).toDF("doc_id", "text")
    val newSnap = Seq(
      (1L, "same text"), (2L, "changed text"), (4L, "brand new")
    ).toDF("doc_id", "text")
    val out = Versioning.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.getString(2)), Option(r.getString(3)))).toMap
    assert(!out.contains(1L), "unchanged docs must not be emitted")
    assert(out(2L)._1 == "changed" && out(2L)._2.isDefined && out(2L)._3.isDefined)
    assert(out(2L)._2 != out(2L)._3, "changed rows carry both fingerprints, differing")
    assert(out(3L) == (("removed", out(3L)._2, None)) && out(3L)._2.isDefined)
    assert(out(4L) == (("added", None, out(4L)._3)) && out(4L)._3.isDefined)
    assert(out.size == 3)
  }

  test("snapshotDiff: identical snapshots yield an empty delta") {
    import spark.implicits._
    val snap = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(Versioning.snapshotDiff(snap, snap, "doc_id", "text").count() == 0)
  }

  test("applyDelta ∘ diffWithPayload ≡ identity (the patch round-trip law)") {
    import spark.implicits._
    val oldSnap = Seq(
      (1L, "same text"), (2L, "will change"), (3L, "will vanish")
    ).toDF("doc_id", "text")
    val newSnap = Seq(
      (1L, "same text"), (2L, "changed text"), (4L, "brand new")
    ).toDF("doc_id", "text")
    val delta = Versioning.diffWithPayload(oldSnap, newSnap, "doc_id", "text")
    val applied = Versioning.applyDelta(oldSnap, delta, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = newSnap.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(applied == want,
      s"apply(old, diff(old, new)) must rebuild new exactly: $applied vs $want")
    // unchanged rows come from the snapshot side, not the delta
    assert(delta.where(org.apache.spark.sql.functions.col("doc_id") === 1L)
      .count() == 0)
  }

  test("replayDeltas: chain law — replay(s0, diffs) ≡ s_k ≡ iterated applyDelta") {
    import spark.implicits._
    // s0 → s1 → s2 → s3 exercising add, change, remove, and REVIVAL
    // (id 3 removed in s1, re-added in s3 with new text)
    val s0 = Seq((1L, "a0"), (2L, "b0"), (3L, "c0")).toDF("doc_id", "text")
    val s1 = Seq((1L, "a0"), (2L, "b1"), (4L, "d1")).toDF("doc_id", "text")
    val s2 = Seq((1L, "a2"), (2L, "b1"), (4L, "d1"), (5L, "e2")).toDF("doc_id", "text")
    val s3 = Seq((1L, "a2"), (3L, "c3"), (5L, "e2")).toDF("doc_id", "text")
    val chain = Seq(s0 -> s1, s1 -> s2, s2 -> s3).map { case (o, n) =>
      Versioning.diffWithPayload(o, n, "doc_id", "text")
    }
    val replayed = Versioning.replayDeltas(s0, chain, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = s3.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(replayed == want, s"one-shuffle replay diverged: $replayed vs $want")
    val iterated = chain.foldLeft(s0)(Versioning.applyDelta(_, _, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(iterated == want, "iterated applyDelta disagrees with the chain target")
  }

  test("replayDeltas: empty chain is the base; plan has ONE exchange for any chain length") {
    import spark.implicits._
    val s0 = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val noop = Versioning.replayDeltas(s0, Nil, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(noop == Set((1L, "a"), (2L, "b")))
    // materialized deltas (the stored-log shape): replay cost must be ONE
    // id-keyed shuffle no matter how many generations are stacked
    val deltas = (1 to 4).map(i =>
      Seq((i.toLong + 10, "added", "x", "x", s"t$i"))
        .toDF("doc_id", "status", "old_md5", "new_md5", "text")
        .localCheckpoint())
    val plan = Versioning.replayDeltas(s0.localCheckpoint(), deltas,
      "doc_id", "text").queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"replay must shuffle exactly once, saw $exchanges:\n$plan")
  }

  test("applyDelta: empty delta is a no-op; removed payloads are null in transport") {
    import spark.implicits._
    val snap = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val empty = Versioning.diffWithPayload(snap, snap, "doc_id", "text")
    assert(empty.count() == 0)
    val same = Versioning.applyDelta(snap, empty, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(same == Set((1L, "a"), (2L, "b")))
    val gone = Versioning.diffWithPayload(snap,
      Seq((1L, "a")).toDF("doc_id", "text"), "doc_id", "text").collect()
    assert(gone.length == 1 && gone(0).getString(1) == "removed" &&
      gone(0).isNullAt(4), "removed transport rows carry no payload")
  }

  test("merkleSummary: identical replicas agree everywhere; a one-row change diverges exactly one bucket") {
    import spark.implicits._
    val snap = (1L to 200L).map(i => (i, s"text-$i")).toDF("doc_id", "text")
    def cs(df: org.apache.spark.sql.DataFrame) =
      Versioning.merkleSummary(df, "doc_id", "text", 16)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
        .toMap
    val a = cs(snap)
    assert(a == cs(snap), "summary must be deterministic across runs")
    // checksum is partition-order-independent (sorted inside the agg)
    assert(a == cs(snap.repartition(7)), "summary must not depend on partitioning")
    val mutated = snap.withColumn("text",
      when(col("doc_id") === 42L, lit("tampered")).otherwise(col("text")))
    val b = cs(mutated)
    val diverged = a.keySet.filter(k => a(k) != b(k))
    assert(diverged.size == 1, s"expected one divergent bucket, got $diverged")
    assert(a(diverged.head)._1 == b(diverged.head)._1,
      "counts match on a content-only divergence")
  }

  test("mergeUpsert: all four MERGE branches in one call") {
    import spark.implicits._
    // target: ids 1-4. source: update 1, delete 2 (matched), insert 5,
    // delete 9 (unmatched → MERGE no-op, must NOT appear). id 3,4 untouched.
    val target = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L),
      (4L, "d", 40L)).toDF("doc_id", "lang", "n")
    val source = Seq(
      (1L, "a2", 11L, false), // matched update
      (2L, "b", 20L, true),   // matched delete
      (5L, "e", 50L, false),  // unmatched insert
      (9L, "z", 90L, true)    // unmatched delete → no-op
    ).toDF("doc_id", "lang", "n", "is_delete")
    val out = Versioning.mergeUpsert(target, source, "doc_id",
        Seq("lang", "n"), col("is_delete"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set((1L, "a2", 11L), (3L, "c", 30L), (4L, "d", 40L),
      (5L, "e", 50L)))
  }

  test("mergeUpsert: a NULL delete flag means UPDATE, never a silent DELETE (round-14 advice)") {
    import spark.implicits._
    // ANSI MERGE evaluates WHEN MATCHED AND <cond> under three-valued
    // logic: a NULL condition is NOT satisfied, so the row falls through
    // to the unconditional UPDATE branch. A bare `where(!pred)` drops the
    // NULL row after the anti-join already removed its target twin —
    // that composition silently deleted it.
    val target = Seq((1L, "a", 10L), (2L, "b", 20L))
      .toDF("doc_id", "lang", "n")
    val source = Seq(
      (1L, "a2", 11L, Option.empty[Boolean]), // matched, NULL flag → UPDATE
      (3L, "c3", 30L, Option.empty[Boolean])  // unmatched, NULL flag → INSERT
    ).toDF("doc_id", "lang", "n", "is_delete")
    val out = Versioning.mergeUpsert(target, source, "doc_id",
        Seq("lang", "n"), col("is_delete"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set((1L, "a2", 11L), (2L, "b", 20L), (3L, "c3", 30L)),
      s"NULL delete flag mishandled: $out")
  }
}
