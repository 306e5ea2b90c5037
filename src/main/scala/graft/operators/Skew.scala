package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is pathological.
  *
  * Spark's own defenses cover most cases — map-side partial aggregation
  * absorbs skewed groupBy keys, and AQE splits skewed sort-merge-join
  * partitions at runtime. The remaining hole is a shuffled equi-join where
  * one hot key floods a task and AQE cannot re-plan (e.g. the skewed side
  * feeds from an upstream exchange AQE already committed, or the join is
  * forced to hash). [[saltedJoin]] is the explicit fix: spread each hot
  * left key over `salt` subkeys, replicate the (smaller) right side once
  * per subkey, and join on (key, salt) — task pressure drops by ~`salt`×
  * at the cost of `salt`× the right side's shuffle volume.
  */
object Skew {

  /** Salted inner equi-join on `key`. The salt value is random per left
    * row (seeded — reproducible plans), which is correctness-neutral: the
    * right side carries every salt value, so each left row still meets its
    * key exactly once. Use when the LEFT side is large with hot keys and
    * the RIGHT side is small enough to replicate `salt`× but too big to
    * broadcast outright.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int = 16, seed: Long = 42L): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val saltedLeft = left.withColumn("_salt",
      pmod(floor(rand(seed) * salt), lit(salt)).cast("int"))
    val replicatedRight = right.withColumn("_salt",
      explode(array((0 until salt).map(lit): _*)))
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }
}
