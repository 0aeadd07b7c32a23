package graft.relationalize

import graft.core._
import org.apache.spark.TaskContext
import org.apache.spark.sql._
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{coalesce, col, from_json, lit, raise_error, timestamp_millis, udaf, when}
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

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
    schemaMapCap: Int = 8192,
    /** When > 0 (with [[materializePath]]): shuffle the emitted rows by
      * `(table, hash(payload) % N)` before the `partitionBy(table)` write,
      * bounding the materialization at N files per table. Without it the
      * write creates up to (input partitions × tables) files — under wide
      * table fan-out (the GrowthCurve `rel` arm measured T = 1000 tables ×
      * 16 partitions) the per-file open/commit overhead dominates the
      * build wall. The cost is one full shuffle of the emitted data; the
      * salt keeps a skewed giant table spread over N tasks instead of
      * collapsing it to one.
      */
    materializeFilesPerTable: Int = 0,
    /** Rid key derivation. Default (`false`): `(partitionId, ordinal)` —
      * stable under task retries (Spark replays the same input split) but
      * NOT under a repartition or a recomputation that reorders rows within
      * a partition (e.g. a cache-evicted emit recomputed through an upstream
      * shuffle): rids would re-key, and two tables computed from different
      * recomputations could disagree on parent/child rids. `true`: keys are
      * md5(document text) — stable under any partitioning/recompute; the
      * trade-off is that byte-identical duplicate documents share one rid
      * tree, so a parent/child join multiplies across the duplicate set
      * (dedup duplicates first, or keep positional keys).
      */
    contentDocKeys: Boolean = false,
    /** Prepended verbatim to every positional `(partitionId, ordinal)`
      * docKey (ignored under [[contentDocKeys]]). A multi-batch STREAMING
      * sink needs it: partition ids and ordinals restart at zero every
      * micro-batch, so docs in different batches would otherwise share a
      * docKey — and therefore a rid tree — corrupting any parent/child
      * join-back over the accumulated sink. The streaming writers pass
      * `"b<batchId>:"`, which is also replay-stable (a crash-replayed
      * batch keeps its id, so rids stay idempotent like the writes).
      */
    docKeyPrefix: String = "",
    /** `false` (default, reference semantics: `json.loads` raises): one
      * malformed line fails the job — correct for curated inputs, fatal for
      * a 100 TB crawl where one bad row among billions kills hours of work.
      * `true`: unparseable lines route to the [[RelationalizeSpark.QuarantineTable]]
      * table as (_raw_, _error_) rows — the job completes, the bad rows stay
      * queryable/re-dressable, and every parseable document is unaffected
      * (rids don't shift: the ordinal still counts every input line).
      */
    quarantine: Boolean = false)

/** Result of relationalizing a document collection: one typed DataFrame per
  * discovered table plus its choice schema (for DDL / introspection).
  */
final case class RelationalizeResult(
    tables: Map[String, DataFrame],
    schemas: Map[String, ChoiceSchema],
    private val cached: Option[Dataset[Emitted]] = None) {

  def apply(table: String): DataFrame = tables(table)

  def ddl(schemaName: String = "public", dialect: SqlDialect = PostgresDialect): Map[String, String] =
    schemas.map { case (t, s) => t -> s.generateDdl(t, schemaName, dialect) }

  /** Unpersist the cached pass-1 emit (no-op under `materializePath`, where
    * the emit lives in files instead of the block store). Call once the
    * per-table DataFrames have been consumed or materialized — afterwards
    * they still compute correctly but re-run pass 1 per action.
    */
  def release(): Unit = cached.foreach(_.unpersist())
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
  * stable under task retries because Spark replays the same input split, but
  * NOT under a caller repartition or an order-changing recompute; see
  * [[RelationalizeOptions.contentDocKeys]] for the content-derived
  * alternative and its duplicate-document trade-off.
  */
object RelationalizeSpark {

  /** Marker prefix distinguishing per-partition schema rows from data rows
    * in the fused emit (a control character never appears in table names).
    */
  val SchemaMarker = "\u0001"

  /** docKey factory honoring [[RelationalizeOptions.contentDocKeys]] and
    * [[RelationalizeOptions.docKeyPrefix]].
    */
  private def docKeyFn(contentDocKeys: Boolean,
                       prefix: String): (Int, Long, String) => String =
    if (contentDocKeys) (_, _, line) => Relationalizer.contentDocKey(line)
    else (pid, ordinal, _) => s"$prefix$pid:$ordinal"

  /** Destination table for unparseable lines under
    * [[RelationalizeOptions.quarantine]] — a NORMAL table (pass 2 serves it
    * like any other, so the bad rows are queryable), named outside the
    * reference's child-table naming scheme (`<name>_<path>`: a collision
    * would require relationalizing a collection literally named
    * `_quarantine_`).
    */
  val QuarantineTable = "_quarantine_"

  /** [[Relationalizer.relationalizeLine]] with the quarantine policy
    * applied. The error column carries the exception CLASS only — messages
    * embed parser positions and object identities, which would make the
    * emitted payload (and thus golden tests) input-layout-dependent; the
    * raw line is the actionable evidence anyway.
    */
  private def relLine(line: String, name: String, key: String,
                      quarantine: Boolean): Vector[(String, Relationalizer.FlatRow)] =
    if (!quarantine) Relationalizer.relationalizeLine(line, name, key)
    else
      try Relationalizer.relationalizeLine(line, name, key)
      catch {
        case scala.util.control.NonFatal(e) =>
          Vector((QuarantineTable, scala.collection.immutable.VectorMap[String, JValue](
            "_raw_" -> JString(line),
            "_error_" -> JString(e.getClass.getSimpleName))))
      }

  /** Pass-1 transform: raw JSON lines -> emitted (table, flatRow) pairs. */
  def emit(ds: Dataset[String], name: String,
           contentDocKeys: Boolean = false,
           quarantine: Boolean = false,
           docKeyPrefix: String = ""): Dataset[Emitted] = {
    implicit val enc: Encoder[Emitted] = Encoders.product[Emitted]
    val key = docKeyFn(contentDocKeys, docKeyPrefix)
    ds.mapPartitions { iter =>
      val pid = TaskContext.getPartitionId()
      var ordinal = -1L
      iter.flatMap { line =>
        ordinal += 1
        relLine(line, name, key(pid, ordinal, line), quarantine).iterator.map {
          case (table, row) => Emitted(table, Json.writeTaggedRow(row))
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
                      schemaMapCap: Int = 8192,
                      contentDocKeys: Boolean = false,
                      quarantine: Boolean = false,
                      docKeyPrefix: String = ""): Dataset[Emitted] = {
    require(schemaMapCap > 0)
    implicit val enc: Encoder[Emitted] = Encoders.product[Emitted]
    val key = docKeyFn(contentDocKeys, docKeyPrefix)
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
        relLine(line, name, key(pid, ordinal, line), quarantine).iterator.flatMap {
          case (table, row) =>
            localSchemas.update(table,
              localSchemas.getOrElse(table, ChoiceSchema.empty).observe(row))
            val data = Emitted(table, Json.writeTaggedRow(row))
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
      Json.parseRow(payload).foreach { case (taggedKey, _) =>
        val (k, tagRepr) = Json.splitTaggedKey(taggedKey)
        val t = ColType.parse(tagRepr)
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

  /** The scalar tags a payload value can carry (nulls are keyed `none` but
    * need no parse field — a missing field already reads null).
    */
  private val BaseTags = Vector("bool", "int", "float", "str")

  private def rawSparkType(tag: String): DataType = tag match {
    case "bool" => BooleanType
    case "int" => LongType
    case "float" => DoubleType
    case "str" => StringType
    case other => throw new IllegalStateException(s"no raw Spark type for tag $other")
  }

  /** Pass-2: convert one table's emitted rows to a typed DataFrame.
    *
    * Expression-only — no lambda decode. Payload keys carry each value's
    * scalar tag (written in pass 1, where the tag was observed into the
    * schema anyway), so conversion is one `from_json` with a field per
    * (column, tag) followed by a codegen'd routing projection: field
    * `k<sep>int` feeds output `k_int` of a choice column, `k<sep>int` IS
    * output `k` of an int column, etc. Fields for tags a schema column does
    * not admit exist only to be detected: a non-null there raises, matching
    * the reference's convert-time error on out-of-choice values
    * (`relationalize/schema.py:49-52`) — that is what makes frozen-schema
    * streaming fail loudly instead of silently nulling new choice members.
    *
    * Scale: the whole pass is expression-level and the projection runs
    * inside whole-stage codegen — the previous `mapPartitions` decode
    * (JValue graph + VectorMap + Row encoder per row) was opaque to Catalyst
    * and is gone. The parse itself sits behind an
    * [[graft.functions.OptimizationBarrier]]: joins on converted columns
    * would otherwise push `IsNotNull` predicates through this projection and
    * re-evaluate `from_json` per guard branch per row (measured 10 parses
    * per payload, 25x wall time on the explode round-trip).
    */
  def toDataFrame(emitted: Dataset[Emitted], table: String, schema: ChoiceSchema): DataFrame = {
    import ColType._
    graft.functions.GraftFunctions.registerAll(emitted.sparkSession)
    val parseStruct = StructType(schema.columns.keys.toArray.flatMap(k =>
      BaseTags.map(t => StructField(Json.taggedKey(k, t), rawSparkType(t)))))
    // FAILFAST: a malformed payload is an engine bug — raise, don't null
    val parsed = graft.functions.GraftFunctions.barrier(
      from_json(col("payload"), parseStruct, Map("mode" -> "FAILFAST"))).as("r")

    def fld(k: String, tag: String): Column = col("r").getField(Json.taggedKey(k, tag))
    // guard `value` with raises on tags the schema does not admit for k
    def guarded(k: String, ct: ColType, badTags: Seq[String], value: Column): Column =
      badTags.foldRight(value) { (t, v) =>
        when(fld(k, t).isNotNull, raise_error(
          lit(s"value type $t for column $k not admitted by schema type ${ct.repr}"))).otherwise(v)
      }

    val outputs: Seq[(String, Column)] = schema.columns.toSeq.flatMap { case (k, ct) =>
      ct match {
        case CChoice(ms) =>
          val members = ms.filter(_ != "none")
          val badTags = BaseTags.filterNot(members.contains)
          members.zipWithIndex.map { case (m, i) =>
            val v = fld(k, m)
            s"${k}_$m" -> (if (i == 0) guarded(k, ct, badTags, v) else v)
          }
        case CFloat => // an int observed under a float-typed frozen schema widens
          Seq(k -> guarded(k, ct, Seq("bool", "str"),
            coalesce(fld(k, "float"), fld(k, "int").cast(DoubleType))))
        case CNone => // all-null column reads as its boolean placeholder type
          Seq(k -> guarded(k, ct, Seq("int", "float", "str"), fld(k, "bool")))
        case CDatetime => // only reachable via deserialized schemas (types.py:21)
          val s = fld(k, "str")
          val cast = s.cast(TimestampType)
          Seq(k -> guarded(k, ct, Seq("bool", "float"), coalesce(
            when(s.isNotNull && cast.isNull,
              raise_error(lit(s"unparseable timestamp in column $k"))).otherwise(cast),
            timestamp_millis(fld(k, "int")))))
        case t @ (CBool | CInt | CStr) =>
          Seq(k -> guarded(k, ct, BaseTags.filterNot(_ == t.repr), fld(k, t.repr)))
        case CUnsupported(tag) =>
          throw new IllegalStateException(s"no Spark type for unsupported:$tag (column $k)")
      }
    }
    val byName = outputs.toMap
    emitted.filter(col("table") === table)
      .select(parsed)
      .select(schema.outputColumns.map(n => byName(n).as(n)): _*)
  }

  /** Full pipeline over a collection of raw JSON documents. */
  def apply(ds: Dataset[String], name: String,
            options: RelationalizeOptions = RelationalizeOptions()): RelationalizeResult = {
    val spark = ds.sparkSession
    val (emittedSource: Dataset[Emitted], cached: Option[Dataset[Emitted]]) =
      options.materializePath match {
      case Some(path) =>
        val emitted = emitWithSchemas(ds, name, options.schemaMapCap,
          options.contentDocKeys, options.quarantine, options.docKeyPrefix)
        val toWrite =
          if (options.materializeFilesPerTable > 0)
            emitted.repartition(col("table"), org.apache.spark.sql.functions.pmod(
              org.apache.spark.sql.functions.hash(col("payload")),
              lit(options.materializeFilesPerTable)))
          else emitted
        toWrite.write.mode(SaveMode.Overwrite).partitionBy("table").parquet(path)
        implicit val enc: Encoder[Emitted] = Encoders.product[Emitted]
        // explicit schema: an empty corpus writes no data files, and
        // schema inference on a data-file-less partitioned dir throws
        (spark.read
          .schema(StructType(Seq(
            StructField("payload", StringType), StructField("table", StringType))))
          .parquet(path)
          .select(col("table").cast(StringType), col("payload")).as[Emitted], None)
      case None =>
        val c = emitWithSchemas(ds, name, options.schemaMapCap, options.contentDocKeys,
            options.quarantine, options.docKeyPrefix)
          .persist(StorageLevel.MEMORY_AND_DISK)
        (c, Some(c))
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
    RelationalizeResult(tables, schemas, cached)
  }

  /** Relationalize a JSON string column of an existing DataFrame. */
  def fromJsonColumn(df: DataFrame, jsonCol: String, name: String,
                     options: RelationalizeOptions = RelationalizeOptions()): RelationalizeResult =
    apply(df.select(col(jsonCol)).as(Encoders.STRING), name, options)
}
