package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot-key aggregations and joins.
  *
  * AQE's skew-join splitting handles most runtime skew automatically
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default), but two
  * situations still need explicit salting at 100 TB:
  *
  *  1. a *grouping* key with a mega-hot value (AQE does not split
  *     aggregation partitions by key) — [[saltedAgg]];
  *  2. a shuffle join against a dimension where a handful of fact keys
  *     dominate — [[saltedJoinCount]]-style key explosion.
  *
  * Both are plan-shape rewrites: partial aggregate on (key, salt),
  * final aggregate on key. Results are identical to the unsalted form
  * for any commutative-associative aggregate.
  */
object SkewTools {

  /** Two-stage salted count/sum: groupBy(key, salt) partial →
    * groupBy(key) final. `saltBuckets` bounds the widest key's
    * partition to 1/saltBuckets of its rows. */
  def saltedAgg(df: DataFrame, key: Column, value: Column, saltBuckets: Int = 32): DataFrame = {
    val partial = df
      .withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets)))
      .groupBy(key.as("k"), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(value).as("_s"))
    partial.groupBy(col("k"))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("total"))
  }

  /** Salted join for a skewed fact side: explode the build side
    * `saltBuckets`× with a salt column, salt the probe side
    * randomly-but-deterministically, join on (key, salt) — a hot key's
    * rows land in `saltBuckets` shuffle partitions instead of one.
    * No broadcast hint: if the exploded dim were broadcastable the
    * join would already be skew-immune and salting pointless — the
    * helper exists for the SHUFFLED case, and AQE still picks
    * broadcast on its own when the exploded side measures small.
    * Count rows per key as the demonstration aggregate. */
  def saltedJoinCount(fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int = 8): DataFrame = {
    val saltedDim = dim.withColumn("_salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltBuckets)))
    saltedFact.join(saltedDim, Seq(key, "_salt"))
      .groupBy(key).agg(count(lit(1)).as("n"))
  }
}
