package graft.queries

/** Gate for oracle-artifact capture inside registered queries.
  *
  * A handful of oracles embed runtime artifacts Spark computed (xxhash64
  * SimHash signatures) because DuckDB cannot reproduce the hash function.
  * Capturing those artifacts costs a driver-side collect — bounded, but for
  * the per-document signature capture it is corpus-sized, which must NEVER
  * run in the bench path or at real scale (driver OOM at 100 TB).
  *
  * So capture happens ONLY under [[graft.Verify]] (which sets the system
  * property below before running queries) — the one context that dumps
  * `oracle_sql.json`. Bench and production invocations of the same query run
  * the identical distributed plan with zero driver materialization.
  */
object OracleCapture {
  val Prop = "graft.oracle.capture"
  def enabled: Boolean =
    sys.props.get(Prop).contains("true") ||
      sys.env.get("GRAFT_ORACLE_CAPTURE").contains("1")
}
