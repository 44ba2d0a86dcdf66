package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffles whose key distribution is pathological —
  * the hand-rolled complement to AQE's runtime skew-join splitting, for
  * when the skew is known ahead of time (hot users, null-ish defaults,
  * boilerplate documents).
  */
object Skew {

  /** Salted equi-join: scatter the skewed (fact) side across `saltN`
    * sub-keys via a deterministic hash of `scatterBy`, replicate the small
    * side once per salt, join on (key, salt). Result is identical to a
    * plain inner join on `key`; the hot key's rows now land on `saltN`
    * reducers instead of one.
    *
    * Cost model: small side is replicated saltN× (choose saltN ≈ the
    * factor by which the hottest key exceeds the average partition).
    */
  def saltedJoin(fact: DataFrame, small: DataFrame, key: String,
                 scatterBy: Column, saltN: Int): DataFrame = {
    // saltN=0 would divide-by-zero under ANSI — or, with ANSI off, null
    // salts that silently match nothing (empty join, no error)
    require(saltN > 0, s"saltN must be positive, got $saltN")
    val saltedFact = fact.withColumn("__salt", pmod(xxhash64(scatterBy), lit(saltN)).cast("int"))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltN - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    saltedFact.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-k keys by frequency — the reconnaissance step before choosing a
    * salting factor (run on a sample at 100 TB).
    */
  def hotKeys(df: DataFrame, key: String, k: Int): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(key))
      .limit(k)
}
