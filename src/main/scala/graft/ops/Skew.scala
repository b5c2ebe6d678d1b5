package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (the manual complement to AQE's
  * skew-join splitting, for engines/pipelines where a hot key is known
  * ahead of time).
  *
  * Salting spreads one hot join key over `salts` shuffle partitions: the
  * big/skewed side gets a *deterministic* salt derived from a second
  * column (no `rand()` — keeps retries and oracle comparisons stable);
  * the small side is replicated `salts` times so every salted partition
  * can still match. Row-for-row equivalent to the plain inner join.
  */
object Skew {

  /** @param saltSource a column of the left (skewed) side with decent
    *                    cardinality — its hash picks the salt bucket.
    */
  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      salts: Int,
      saltSource: Column): DataFrame = {
    require(
      !left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "inputs must not contain the reserved helper column __salt")
    val l = left.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts.toLong)))
    val r = right.withColumn("__salt", explode(sequence(lit(0L), lit(salts.toLong - 1))))
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
