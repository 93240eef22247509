package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for large-×-medium equi-joins.
  *
  * When BOTH sides are too big to broadcast and the probe side's key
  * distribution is skewed, a plain shuffle join sends every row of a hot
  * key to ONE task — the straggler that kills a 1000-executor stage. AQE
  * splits oversized sort-merge partitions after the fact, but only at
  * partition granularity and only for the patterns it recognizes;
  * salting is the planning-time fix that works for any join the user
  * can express: spread each hot key over `salts` sub-keys on the big
  * side, replicate the other side once per sub-key, join on
  * (key, salt). Replication costs `salts ×` the small side — which is
  * exactly the trade: bounded duplication of the bounded side buys even
  * spread of the unbounded one.
  */
object SkewJoin {

  /** Inner equi-join of `big` to `small` on `key`, with the big side's
    * rows spread across `salts` shuffle sub-partitions per key.
    *
    * `saltSource` must be a DETERMINISTIC per-row expression of `big`
    * (an id column, a hash of several columns) — never `rand()`: a
    * retried task must salt identically or rows silently drop/duplicate
    * under speculative execution. Result set is exactly the unsalted
    * inner join's.
    */
  def salted(big: DataFrame, small: DataFrame, key: String, salts: Int,
      saltSource: Column): DataFrame = {
    require(salts > 0, "salts must be positive")
    val b = big.withColumn("_salt", pmod(hash(saltSource), lit(salts)))
    val s = small.withColumn("_salt",
      explode(array((0 until salts).map(i => lit(i)): _*)))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }
}
