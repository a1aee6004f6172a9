package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * First line of defense is AQE's runtime skew-join splitting
  * (spark.sql.adaptive.skewJoin.*), which the engine enables by default.
  * Salting is for the cases AQE cannot fix: a single key so hot that even
  * a split partition exceeds executor memory, or a non-broadcastable
  * build side. The big side gets a deterministic per-row salt in
  * [0, saltFactor); the small side is replicated saltFactor×; the join
  * key becomes (key, salt), spreading each hot key over saltFactor
  * partitions. Result set is identical to the unsalted inner join.
  */
object Skew {

  /** Deterministic row salt: xxhash64 over the row's columns, never a
    * RNG — retries and speculative tasks must salt identically. */
  private def rowSalt(df: DataFrame, saltFactor: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(saltFactor))

  /** Salted inner equi-join of a skewed `big` side against a `small`
    * (but non-broadcastable) side on `key`. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 16): DataFrame = {
    val b = big.withColumn("_salt", rowSalt(big, saltFactor))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0L), lit((saltFactor - 1).toLong))))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }
}
