package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB posture.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default here) re-splits oversized partitions at runtime and is the first
  * line of defense. Salting is the explicit fallback for pathological hot
  * keys — e.g. a handful of documents' tokens dominating a postings join, or
  * a null-heavy FK: the large side's hot keys are sprayed across
  * `saltBuckets` sub-keys and the small side is replicated per bucket, so no
  * single reducer receives a hot key's entire row set.
  */
object SkewJoin {

  /** Equi-join `large ⋈ small` on `key`, salting the large side.
    *
    * The large side's salt mixes row content (`xxhash64` over all columns)
    * with a per-row ordinal (`monotonically_increasing_id`), so
    * exact-duplicate rows of a hot key still spread across buckets instead
    * of landing on one reducer. The ordinal is not stable under task
    * retries, which is safe here: the small side is replicated into EVERY
    * bucket, so any salt value joins identically — salting only routes
    * rows, it never changes the result. Result equals a plain inner join.
    */
  def saltedInnerJoin(large: DataFrame, small: DataFrame, key: String,
                      saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets > 0)
    val saltCol = "__graft_salt_"
    require(!large.columns.contains(saltCol) && !small.columns.contains(saltCol),
      s"inputs must not already carry a $saltCol column")
    val saltedLarge = large.withColumn(saltCol,
      pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*) + monotonically_increasing_id(),
        lit(saltBuckets)).cast("int"))
    val saltedSmall = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLarge.join(saltedSmall, Seq(key, saltCol), "inner").drop(saltCol)
  }

  /** Top-N hot keys of a column by frequency — the observation step that
    * decides whether salting is worth it (cheap: one partial-agg pass).
    */
  def hotKeys(df: DataFrame, key: String, topN: Int = 10): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(key).asc).limit(topN)
}
