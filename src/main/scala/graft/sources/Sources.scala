package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, isnan, when}
import org.apache.spark.sql.types.DoubleType

/** Sources (SURVEY §2.1): the reference ingests JSONL from local FS / S3 /
  * in-memory iterables. Spark equivalents, one per reference operator.
  */
object Sources {

  /** S1: JSONL file(s) -> one raw line per row. Works for local paths and
    * `s3a://` URIs alike; gzip is transparent. Lines arrive unparsed so the
    * relationalizer controls scalar typing (see graft.core.JValue).
    */
  def jsonl(spark: SparkSession, path: String): Dataset[String] =
    spark.read.textFile(path)

  /** S2: in-memory iterable (tests, small corpora). */
  def fromIterable(spark: SparkSession, docs: Seq[String]): Dataset[String] =
    spark.createDataset(docs)(Encoders.STRING)
}

/** Sinks (SURVEY §2.6, K1-K8). Thin, explicit wrappers: each maps one
  * reference sink to the Spark writer that provides it, including the
  * NaN-scrubbing quirk of the S3/Redshift path.
  */
object Sinks {

  /** K1/K3: JSONL out (set codec "gzip" for the S3-style compressed path). */
  def jsonl(df: DataFrame, path: String, compression: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    compression.fold(w)(c => w.option("compression", c)).json(path)
  }

  /** K4: CSV with header; missing values render empty like csv.DictWriter. */
  def csv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Columnar output (the engine-native path; not in the reference). */
  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** K6: warehouse load via JDBC — DROP/CREATE (from the choice-schema DDL)
    * then batched insert, the Spark shape of the reference's
    * DROP -> CREATE -> COPY pipeline. Untested here (no JDBC driver in the
    * environment); the DDL side is covered by ChoiceSchemaSpec.
    */
  def jdbc(df: DataFrame, url: String, table: String,
           props: java.util.Properties = new java.util.Properties()): Unit =
    df.write.mode(SaveMode.Overwrite).jdbc(url, table, props)

  /** K8: NaN/Infinity scrub — the reference serializes them as JSON null
    * (`simplejson ignore_nan`); apply before any JSON sink.
    */
  def scrubNaN(df: DataFrame): DataFrame =
    df.schema.fields.filter(_.dataType == DoubleType).foldLeft(df) { (acc, f) =>
      acc.withColumn(f.name,
        when(isnan(col(f.name)) || col(f.name).isin(Double.PositiveInfinity, Double.NegativeInfinity), null)
          .otherwise(col(f.name)))
    }
}
