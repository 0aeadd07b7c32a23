package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table access for the driver testdata layout (TESTDATA.md). */
object Tables {

  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some testdata
    * generations and TIMESTAMP(MICROS, isAdjustedToUTC=false) in others, so
    * the read adapts to what the file actually contains:
    *   - NANOS: Spark's vectorized reader rejects it outright, so read raw
    *     nanos (legacy flag) and rebuild a microsecond TimestampType with
    *     exact integer math (`div`, not `/` — the nano epoch exceeds 2^53 so
    *     double division would lose precision), matching DuckDB's ns -> us
    *     truncation.
    *   - MICROS without UTC adjustment: Spark reads TIMESTAMP_NTZ; cast to
    *     TimestampType (every session here pins UTC), which preserves the
    *     wall-clock exactly as DuckDB's naive read does.
    * Either way callers see one schema: `ts TIMESTAMP` in UTC.
    */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
}
