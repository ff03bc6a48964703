package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large equi-joins (the builder brief's "salting for
  * skew"). AQE's skew-join split handles most cases at runtime; explicit
  * salting is for the planned-ahead case — a known hot key (one person
  * holding millions of tickets) joining a table too big to broadcast.
  *
  * `saltedJoin` splits each left key's rows across `salt` sub-keys
  * (deterministic hash of the whole row — no rand(), so retries/replays
  * produce identical partitioning) and replicates each right row `salt`
  * times, turning one hot shuffle partition into `salt` even ones. Same
  * result set as the plain join; `salt`× duplication of the right side is
  * the price, so keep the smaller input on the right. */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val l = left.withColumn("__salt_l",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(salt.toLong)))
    val r = right.withColumn("__salt_r",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    l.join(r, l(leftKey) === r(rightKey) && col("__salt_l") === col("__salt_r"))
      .drop("__salt_l", "__salt_r")
  }
}
