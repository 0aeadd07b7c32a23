package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Parquet table access for the driver testdata layout (TESTDATA.md). */
object Tables {

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects outright. Read it as raw nanos (legacy flag) and rebuild a
    * microsecond TimestampType with exact integer math (`div`, not `/` — the
    * nano epoch exceeds 2^53 so double division would lose precision). This
    * matches DuckDB's ns -> us truncation.
    */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
}
