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
}
