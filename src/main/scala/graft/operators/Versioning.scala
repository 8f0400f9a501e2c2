package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot versioning: a training corpus is rebuilt on a cadence
  * (recrawl, refilter, license takedowns), and every downstream consumer
  * needs the DELTA between two snapshots — which documents appeared,
  * vanished, or changed content — without diffing text.
  */
object Versioning {

  /** Diff two corpus snapshots by content fingerprint: one row per doc id
    * whose membership or content differs, with
    * status ∈ {added, removed, changed} and the md5 fingerprint on each
    * side (null on the absent side). Unchanged docs are NOT emitted — at
    * 100 TB almost everything is unchanged, so the output is delta-sized
    * while both inputs are scanned exactly once.
    *
    * Plan shape: two narrow (id, md5) projections — the text never leaves
    * the scan — and ONE full-outer equi-join on the id, shuffle-partitioned
    * on the id hash. No window, no sort; at scale, snapshots bucketed by id
    * at write time make the join shuffle-free (StorageSpec's bucketed-SMJ
    * pattern).
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    def fp(df: DataFrame, side: String): DataFrame =
      df.select(col(idCol).as("doc_id"),
        md5(col(textCol).cast("binary")).as(side))
    fp(oldSnap, "old_md5").join(fp(newSnap, "new_md5"), Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_md5").isNull, lit("added"))
          .when(col("new_md5").isNull, lit("removed"))
          .when(col("old_md5") =!= col("new_md5"), lit("changed")))
      .where(col("status").isNotNull)
      .select(col("doc_id"), col("status"), col("old_md5"), col("new_md5"))
  }

  /** Apply a payload-carrying delta to a snapshot — the MERGE/upsert shape
    * of corpus maintenance: consumers that mirrored version N reach version
    * N+1 from N plus a delta-sized patch instead of re-reading the full
    * snapshot. `delta` rows carry status ∈ {added, removed, changed} and,
    * for added/changed, the new payload in `textCol`.
    *
    * Plan shape: the snapshot side is ONE left-anti equi-join on the id
    * (drop every id the delta touches), the delta side a narrow filtered
    * projection, one union — no window, no sort; delta-sized work plus one
    * snapshot scan, and id-bucketed snapshots make the anti join
    * shuffle-free (same argument as [[snapshotDiff]]).
    *
    * Law (spec-pinned in VersioningSpec): for any two snapshots,
    * `applyDelta(old, diffWithPayload(old, new)) ≡ new` row-for-row —
    * diff ∘ apply is the identity on snapshots, so a patch stream is a
    * faithful replication protocol.
    */
  def applyDelta(snap: DataFrame, delta: DataFrame,
                 idCol: String, textCol: String): DataFrame = {
    val touched = delta.select(col("doc_id"))
    val kept = snap.join(touched, snap(idCol) === touched("doc_id"), "left_anti")
    val upserts = delta
      .where(col("status").isin("added", "changed"))
      .select(col("doc_id").as(idCol), col(textCol))
    kept.select(col(idCol), col(textCol)).union(upserts)
  }

  /** [[snapshotDiff]] carrying the new-side payload on added/changed rows
    * (null for removed) — the transport form [[applyDelta]] consumes. Same
    * single full-outer join; the payload rides the new-side projection. */
  def diffWithPayload(oldSnap: DataFrame, newSnap: DataFrame,
                      idCol: String, textCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol).as("doc_id"),
      md5(col(textCol).cast("binary")).as("old_md5"))
    val n = newSnap.select(col(idCol).as("doc_id"),
      md5(col(textCol).cast("binary")).as("new_md5"), col(textCol))
    o.join(n, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_md5").isNull, lit("added"))
          .when(col("new_md5").isNull, lit("removed"))
          .when(col("old_md5") =!= col("new_md5"), lit("changed")))
      .where(col("status").isNotNull)
      .select(col("doc_id"), col("status"), col("old_md5"), col("new_md5"),
        when(col("status") =!= "removed", col(textCol)).as(textCol))
  }
}
