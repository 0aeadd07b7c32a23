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
    * The large side gets a deterministic salt derived from row content
    * (`xxhash64` over all columns, stable under retries); the small side is
    * exploded `saltBuckets`-fold. Result equals a plain inner join.
    */
  def saltedInnerJoin(large: DataFrame, small: DataFrame, key: String,
                      saltBuckets: Int = 16): DataFrame = {
    require(saltBuckets > 0)
    val saltedLarge = large.withColumn("_salt",
      pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(saltBuckets)).cast("int"))
    val saltedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "_salt"), "inner").drop("_salt")
  }

  /** Top-N hot keys of a column by frequency — the observation step that
    * decides whether salting is worth it (cheap: one partial-agg pass).
    */
  def hotKeys(df: DataFrame, key: String, topN: Int = 10): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(key).asc).limit(topN)
}
