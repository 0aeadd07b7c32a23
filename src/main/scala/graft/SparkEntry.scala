package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query catalog is assembled from per-domain objects under [[graft.ops]];
  * every entry has a DuckDB oracle in [[oracleSql]] unless its output is not
  * SQL-derivable (rows-only check).
  */
object SparkEntry {

  /** Flagship: full relationalize round-trip (nested JSON docs constructed
    * from lineitem -> flatten + explode + rid join-back) on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    ops.RelationalizeQueries.relExplode(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 — the public
    * catalog. Every path here is scale-safe (no all-pairs joins): the
    * quadratic equivalence anchors live in [[oracleBaselines]].
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.RelationalizeQueries.queries ++
      ops.RelationalQueries.queries ++
      ops.DedupQueries.queries ++
      ops.TextQueries.queries ++
      ops.CurationQueries.queries ++
      ops.SimilarityQueries.queries ++
      ops.MultimodalQueries.queries ++
      ops.ProfileQueries.queries ++
      ops.IterativeQueries.queries ++
      ops.LayoutQueries.queries ++
      ops.BpeTokenizer.queries ++
      ops.QualityTrain.queries ++
      streaming.StreamingGate.queries

  /** Test-only quadratic baselines (`oracle_` prefix), fenced out of
    * [[queries]] so a user cannot accidentally run an all-pairs join at
    * scale. Still verified by the gate: matching the scale-safe twin's
    * oracle IS the equivalence proof.
    */
  def oracleBaselines: Map[String, (SparkSession, String) => DataFrame] =
    ops.DedupQueries.oracleBaselines

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ops.RelationalizeQueries.oracleSql ++
      ops.RelationalQueries.oracleSql ++
      ops.DedupQueries.oracleSql ++
      ops.TextQueries.oracleSql ++
      ops.CurationQueries.oracleSql ++
      ops.SimilarityQueries.oracleSql ++
      ops.MultimodalQueries.oracleSql ++
      ops.ProfileQueries.oracleSql ++
      ops.IterativeQueries.oracleSql ++
      ops.LayoutQueries.oracleSql ++
      ops.BpeTokenizer.oracleSql ++
      ops.QualityTrain.oracleSql ++
      streaming.StreamingGate.oracleSql

  /** Oracles for [[oracleBaselines]], key-for-key. */
  def baselineOracleSql: Map[String, String] =
    ops.DedupQueries.baselineOracleSql
}
