package graft.relationalize

import graft.core._
import org.apache.spark.TaskContext
import org.apache.spark.sql._
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{col, udaf}
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import java.sql.Timestamp

/** One emitted flat row: destination table + the row as a compact JSON object
  * (scalar JSON text preserves the bool/int/float/str/null tags the choice
  * type system needs — see [[graft.core.JValue]]).
  */
final case class Emitted(table: String, payload: String)

final case class RelationalizeOptions(
    dropNullColumns: Boolean = false,
    dropSpecialCharColumns: Boolean = false,
    dropDuplicateColumns: Boolean = false,
    /** When set, the emitted rows are written once to this path partitioned by
      * table and read back per table (partition-pruned). Preferred when the
      * document corpus is huge or fans out to many tables: each per-table
      * DataFrame then costs one pruned columnar read instead of a re-scan of
      * the full input. When None, the emitted dataset is cached in
      * memory/disk.
      */
    materializePath: Option[String] = None,
    /** Max distinct tables held in a partition's local schema map before the
      * accumulated schemas are flushed as marker rows and the map cleared
      * (associative merge makes the flush lossless). Bounds executor memory
      * under extreme table fan-out.
      */
    schemaMapCap: Int = 8192)

/** Result of relationalizing a document collection: one typed DataFrame per
  * discovered table plus its choice schema (for DDL / introspection).
  */
final case class RelationalizeResult(
    tables: Map[String, DataFrame],
    schemas: Map[String, ChoiceSchema]) {

  def apply(table: String): DataFrame = tables(table)

  def ddl(schemaName: String = "public", dialect: SqlDialect = PostgresDialect): Map[String, String] =
    schemas.map { case (t, s) => t -> s.generateDdl(t, schemaName, dialect) }
}

/** Distributed relationalize, Spark-first:
  *
  *   - '''pass 1''' — one narrow `mapPartitions` over the raw documents emits
  *     `(table, flatRowJson)` pairs; the only thing that crosses a stage
  *     boundary is the per-table choice ''schema'' (KB-sized), aggregated with
  *     a typed [[Aggregator]] whose merge is the reference's own associative
  *     shard-merge (`relationalize/schema.py:259-302`). Map-side partial
  *     aggregation means the shuffle carries one small Map per (partition,
  *     table) — this holds at 100 TB: no data shuffle, driver state is only
  *     the schemas.
  *   - '''pass 2''' — with schemas broadcast back (implicitly, via closure:
  *     they are tiny), each table's rows are converted (choice-split) and
  *     decoded straight to `InternalRow`-friendly typed Rows. Tables are
  *     either served from a cached emitted dataset (small/medium corpora) or
  *     from a single `partitionBy(table)` parquet materialization
  *     (large corpora / wide table fan-out), so N tables never cost N scans of
  *     the input.
  *
  * Document keys for rid determinism are `(partitionId, ordinalInPartition)` —
  * stable under task retries because Spark replays the same input split.
  */
object RelationalizeSpark {

  /** Marker prefix distinguishing per-partition schema rows from data rows
    * in the fused emit (a control character never appears in table names).
    */
  val SchemaMarker = "\u0001"

  /** Pass-1 transform: raw JSON lines -> emitted (table, flatRow) pairs. */
  def emit(ds: Dataset[String], name: String): Dataset[Emitted] = {
    implicit val enc: Encoder[Emitted] = Encoders.product[Emitted]
    ds.mapPartitions { iter =>
      val pid = TaskContext.getPartitionId()
      var ordinal = -1L
      iter.flatMap { line =>
        ordinal += 1
        Relationalizer.relationalizeLine(line, name, s"$pid:$ordinal").iterator.map {
          case (table, row) => Emitted(table, Json.writeRow(row))
        }
      }
    }
  }

  /** Fused pass-1: like [[emit]], but each partition also observes every flat
    * row into a local choice schema *before* serialization (the reference's
    * `on_object_write` fusion, `relationalize.py:63`) and appends one
    * marker row per discovered table at partition end. Schema inference then
    * costs a collect of (partitions x tables) tiny rows — no second parse of
    * any payload, no aggregation job over the data.
    *
    * The per-partition schema map is bounded: when a partition has observed
    * `schemaMapCap` distinct tables, the accumulated schemas are flushed as
    * marker rows mid-stream and the map is cleared. [[collectSchemas]]'
    * per-table `merge` is associative (the reference's own shard-merge
    * semantics), so multiple marker rows per (partition, table) fold to the
    * same schema — extreme table fan-out (millions of distinct child tables)
    * costs bounded executor memory instead of an unbounded map.
    */
  def emitWithSchemas(ds: Dataset[String], name: String,
                      schemaMapCap: Int = 8192): Dataset[Emitted] = {
    require(schemaMapCap > 0)
    implicit val enc: Encoder[Emitted] = Encoders.product[Emitted]
    ds.mapPartitions { iter =>
      val pid = TaskContext.getPartitionId()
      var ordinal = -1L
      val localSchemas = scala.collection.mutable.Map.empty[String, ChoiceSchema]
      def flush(): Iterator[Emitted] = {
        val rows = localSchemas.toVector.map { case (t, sch) =>
          Emitted(s"$SchemaMarker$t", sch.serialize)
        }
        localSchemas.clear()
        rows.iterator
      }
      val dataRows = iter.flatMap { line =>
        ordinal += 1
        Relationalizer.relationalizeLine(line, name, s"$pid:$ordinal").iterator.flatMap {
          case (table, row) =>
            localSchemas.update(table,
              localSchemas.getOrElse(table, ChoiceSchema.empty).observe(row))
            val data = Emitted(table, Json.writeRow(row))
            if (localSchemas.size >= schemaMapCap) Iterator.single(data) ++ flush()
            else Iterator.single(data)
        }
      }
      // the trailing flatMap is only evaluated after dataRows is exhausted,
      // so the final flush sees every remaining table
      dataRows ++ Iterator.single(()).flatMap(_ => flush())
    }
  }

  /** Collect + merge the per-partition schema marker rows of a fused emit. */
  def collectSchemas(emitted: Dataset[Emitted]): Map[String, ChoiceSchema] =
    emitted.filter(col("table").startsWith(SchemaMarker))
      .collect()
      .groupBy(_.table.stripPrefix(SchemaMarker))
      .map { case (t, rows) =>
        t -> rows.map(r => ChoiceSchema.deserialize(r.payload))
          .reduce(_.merge(_))
      }

  /** Choice-schema inference as a typed aggregate: buffer = column -> type
    * repr; merge = the lattice merge. Usable via `groupBy(...).agg(...)`,
    * partial-aggregated map-side.
    */
  class SchemaAggregator extends Aggregator[String, Map[String, String], String] {
    override def zero: Map[String, String] = Map.empty

    override def reduce(b: Map[String, String], payload: String): Map[String, String] = {
      var acc = b
      Json.parseRow(payload).foreach { case (k, v) =>
        val t = ColType.of(v)
        acc = acc.updated(k,
          acc.get(k).fold(t.repr)(old => ColType.merge(ColType.parse(old), t).repr))
      }
      acc
    }

    override def merge(b1: Map[String, String], b2: Map[String, String]): Map[String, String] = {
      var acc = b1
      b2.foreach { case (k, t) =>
        acc = acc.updated(k,
          acc.get(k).fold(t)(old => ColType.merge(ColType.parse(old), ColType.parse(t)).repr))
      }
      acc
    }

    // sorted for a canonical serialized form
    override def finish(b: Map[String, String]): String =
      Json.writeRow(b.toSeq.sortBy(_._1).map { case (k, t) => k -> JString(t) })

    override def bufferEncoder: Encoder[Map[String, String]] = ExpressionEncoder[Map[String, String]]()
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Aggregate per-table choice schemas. The collected result is tiny (one
    * row per discovered table).
    */
  def inferSchemas(emitted: Dataset[Emitted]): Map[String, ChoiceSchema] = {
    val agg = udaf(new SchemaAggregator)
    emitted.groupBy(col("table")).agg(agg(col("payload")).as("schema"))
      .collect()
      .map(r => r.getString(0) -> ChoiceSchema.deserialize(r.getString(1)))
      .toMap
  }

  /** Pass-2: convert one table's emitted rows to a typed DataFrame. */
  def toDataFrame(emitted: Dataset[Emitted], table: String, schema: ChoiceSchema): DataFrame = {
    val struct = schema.toStructType
    val outCols = schema.outputColumns
    val fieldTypes: Array[DataType] = struct.fields.map(_.dataType)
    val index: Map[String, Int] = outCols.zipWithIndex.toMap
    // VectorMap (inside ChoiceSchema) is not java-serializable; ship the
    // schema as its JSON form and rebuild once per partition.
    val schemaJson = schema.serialize
    implicit val enc: Encoder[Row] = Encoders.row(struct)
    emitted.filter(col("table") === table).select(col("payload")).as(Encoders.STRING)
      .mapPartitions { iter =>
        val partSchema = ChoiceSchema.deserialize(schemaJson)
        iter.map { payload =>
          val converted = partSchema.convert(Json.parseRow(payload))
          val values = new Array[Any](outCols.length)
          converted.foreach { case (k, v) =>
            index.get(k) match {
              case Some(i) => values(i) = decode(v, fieldTypes(i))
              case None => // null under a choice column's original key, or dropped
            }
          }
          Row.fromSeq(values.toIndexedSeq)
        }
      }
  }

  private def decode(v: JValue, target: DataType): Any = (v, target) match {
    case (JNull, _) => null
    case (JBool(b), BooleanType) => b
    case (JLong(l), LongType) => l
    case (JDouble(d), DoubleType) => d
    case (JString(s), StringType) => s
    case (JString(s), TimestampType) => parseTimestamp(s)
    case (JLong(l), TimestampType) => new Timestamp(l)
    case (JLong(l), DoubleType) => l.toDouble
    case (other, t) => throw new IllegalStateException(s"cannot decode $other as $t")
  }

  private def parseTimestamp(s: String): Timestamp =
    try Timestamp.valueOf(s.replace('T', ' ').stripSuffix("Z"))
    catch { case _: IllegalArgumentException => Timestamp.from(java.time.Instant.parse(s)) }

  /** Full pipeline over a collection of raw JSON documents. */
  def apply(ds: Dataset[String], name: String,
            options: RelationalizeOptions = RelationalizeOptions()): RelationalizeResult = {
    val spark = ds.sparkSession
    val emittedSource: Dataset[Emitted] = options.materializePath match {
      case Some(path) =>
        emitWithSchemas(ds, name, options.schemaMapCap)
          .write.mode(SaveMode.Overwrite).partitionBy("table").parquet(path)
        implicit val enc: Encoder[Emitted] = Encoders.product[Emitted]
        // explicit schema: an empty corpus writes no data files, and
        // schema inference on a data-file-less partitioned dir throws
        spark.read
          .schema(StructType(Seq(
            StructField("payload", StringType), StructField("table", StringType))))
          .parquet(path)
          .select(col("table").cast(StringType), col("payload")).as[Emitted]
      case None =>
        emitWithSchemas(ds, name, options.schemaMapCap).persist(StorageLevel.MEMORY_AND_DISK)
    }
    val raw = collectSchemas(emittedSource)
    val schemas = raw.map { case (t, s0) =>
      var s = s0
      if (options.dropNullColumns) s = s.dropNullColumns._1
      if (options.dropSpecialCharColumns) s = s.dropSpecialCharColumns()._1
      if (options.dropDuplicateColumns) s = s.dropDuplicateColumns._1
      t -> s
    }
    val tables = schemas.map { case (t, s) => t -> toDataFrame(emittedSource, t, s) }
    RelationalizeResult(tables, schemas)
  }

  /** Relationalize a JSON string column of an existing DataFrame. */
  def fromJsonColumn(df: DataFrame, jsonCol: String, name: String,
                     options: RelationalizeOptions = RelationalizeOptions()): RelationalizeResult =
    apply(df.select(col(jsonCol)).as(Encoders.STRING), name, options)
}
