package graft.streaming

import graft.core.ChoiceSchema
import graft.relationalize.{Emitted, RelationalizeSpark}
import org.apache.spark.sql._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Structured-Streaming variant of relationalize.
  *
  * The flatten/explode transform itself is stateless and therefore fully
  * streaming-compatible — one `mapPartitions` over each micro-batch. Choice
  * -schema inference is NOT (it is unbounded state: the lattice only grows),
  * exactly as noted in SURVEY §2.8. Two supported modes:
  *
  *   1. '''frozen schema''' ([[withFrozenSchemas]]): schemas inferred up front
  *      (e.g. from a batch sample or a prior run) are applied to every batch;
  *      values outside a frozen choice raise, like the reference's
  *      convert-time error.
  *   2. '''foreachBatch''' ([[foreachBatchWriter]]): per-batch inference +
  *      convert + sink append — schema evolution handled by the caller
  *      (re-merging the returned per-batch schemas).
  */
object StreamingRelationalize {

  /** Stateless streaming emit: raw JSON lines -> (table, payload) rows.
    * Usable directly as `emit(stream).writeStream...` with any sink;
    * rid determinism derives from (batch partition, ordinal) like batch mode.
    */
  def emit(lines: Dataset[String], name: String): Dataset[Emitted] =
    RelationalizeSpark.emit(lines, name)

  /** Frozen-schema streaming: convert each table's stream with a fixed choice
    * schema, returning one streaming DataFrame per table.
    */
  def withFrozenSchemas(lines: Dataset[String], name: String,
                        schemas: Map[String, ChoiceSchema]): Map[String, DataFrame] = {
    val emitted = emit(lines, name)
    schemas.map { case (t, sch) => t -> RelationalizeSpark.toDataFrame(emitted, t, sch) }
  }

  /** foreachBatch pipeline: each micro-batch is relationalized with
    * *per-batch* inferred schemas and handed to `sink` as typed DataFrames.
    * Returns the writer (caller sets checkpoint/output mode and starts it).
    */
  def foreachBatchWriter(lines: Dataset[String], name: String)(
      sink: (Map[String, DataFrame], Long) => Unit): DataStreamWriter[String] =
    lines.writeStream.foreachBatch { (batch: Dataset[String], batchId: Long) =>
      if (!batch.isEmpty) {
        val result = RelationalizeSpark(batch, name)
        sink(result.tables, batchId)
      }
    }

  /** Convenience: run a micro-batch relationalize stream into per-table
    * parquet directories under `outDir/<table>/`, with availableNow
    * semantics for bounded sources.
    */
  def runToParquet(lines: Dataset[String], name: String, outDir: String,
                   checkpoint: String): StreamingQuery =
    foreachBatchWriter(lines, name) { (tables, _) =>
      tables.foreach { case (t, df) =>
        df.write.mode(SaveMode.Append).parquet(s"$outDir/$t")
      }
    }.option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
}
