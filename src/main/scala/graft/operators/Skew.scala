package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys: salting. AQE's skew-join handles most
  * cases at runtime ([[graft.engine.Tuning]] enables it), but salting is the
  * deterministic-plan fallback when one key's rows exceed what any single
  * split can hold (the classic hot-entity key at crawl scale).
  *
  * Mechanics: the fact side gets a salt in [0, n) derived by HASHING A
  * CALLER-CHOSEN COLUMN (not `rand()` — deterministic across retries and
  * speculative tasks, which matters for exactly-once sinks); the dim side is
  * replicated n× with an exploded salt column; the join key becomes
  * (key, salt), spreading each hot key over n reducer partitions at the cost
  * of an n× dim replication (dims are small by definition here — for
  * fact-fact skew use AQE or two-phase partial aggregation instead).
  */
object Skew {

  /** Equi-join `fact ⋈ dim USING key`, salted `n` ways. `saltFrom` should be
    * a roughly-uniform fact column (a unique id; NOT the skewed key itself).
    * Result columns = fact's then dim's minus the duplicate key, exactly as
    * a plain USING join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, n: Int,
                 saltFrom: Column): DataFrame = {
    require(n >= 1, "salt fan-out must be >= 1")
    val salted = fact.withColumn("__salt", pmod(hash(saltFrom), lit(n)))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }
}
