package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DATA-QUALITY AUDIT primitives — the nightly checks a production corpus
  * pipeline runs before anything downstream trusts a snapshot: row counts,
  * duplicate-key counts, null counts, and referential orphan counts, all
  * emitted as uniform (check_name, table_name, n) metric rows so one report frame
  * feeds dashboards/alerts.
  *
  * Scale shape: every check is one scan + one map-side-combined aggregate
  * (counts) or one equi anti-join on the key (orphans) — the fact table is
  * touched once per check, nothing collects, and checks on different
  * tables are independent plan branches the scheduler overlaps. At 100 TB
  * the audit costs what the underlying scans cost; no check is ever a
  * cross join or a global sort.
  */
object Audit {

  /** (check_name, table_name, n) row: total row count. */
  def rowCount(df: DataFrame, table: String): DataFrame =
    df.agg(count(lit(1)).as("n"))
      .select(lit("row_count").as("check_name"), lit(table).as("table_name"), col("n"))

  /** Rows whose key tuple occurs more than once (counts EXTRA copies:
    * a key seen k times contributes k−1). One hash aggregate on the key. */
  def duplicateKeys(df: DataFrame, table: String,
                    keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__c"))
      .agg(coalesce(sum(col("__c") - 1L), lit(0L)).as("n"))
      .select(lit("duplicate_keys").as("check_name"), lit(table).as("table_name"),
        col("n"))

  /** Null count of one column — one narrow conditional sum. */
  def nullCount(df: DataFrame, table: String, colName: String): DataFrame =
    df.agg(coalesce(sum(when(col(colName).isNull, 1L).otherwise(0L)), lit(0L))
        .as("n"))
      .select(lit(s"null_$colName").as("check_name"), lit(table).as("table_name"),
        col("n"))

  /** Referential orphans: child rows whose `childKey` has no match in
    * `parent.parentKey` — one LEFT ANTI equi-join (hash-partitioned on the
    * key; AQE broadcasts a small parent). */
  def orphans(child: DataFrame, childTable: String, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n"))
      .select(lit(s"orphans_$childKey").as("check_name"),
        lit(childTable).as("table_name"), col("n"))

  /** Union a set of audit metric frames into one report. */
  def report(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _)
}
