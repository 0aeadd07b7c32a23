package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Storage-layout and order-dependent analytics: multi-dimensional
  * clustering (Z-order) and Pareto-frontier (skyline) extraction.
  *
  * Both are engine-level additions beyond the reference surface (the
  * reference hands layout to the downstream warehouse and has no
  * order-dependent analytics): at 100 TB, HOW rows are laid out across
  * files decides how much of the corpus a selective scan touches, and the
  * skyline is the classic "best trade-offs" query whose naive form is an
  * all-pairs anti join that must never ship.
  */
object LayoutQueries {

  /** Bits per dimension for [[zvalue]] — 16 bits each over two dimensions
    * fills a 32-bit Morton code, plenty of resolution for file-level
    * clustering (file counts are ~10^6, not 2^32).
    */
  private val ZBits = 16

  /** Morton (Z-order) interleave of two BIGINT dimensions, clamped to
    * [[ZBits]] bits — bit i of `x` lands at 2i+1, bit i of `y` at 2i, so
    * sorting by the result interleaves the two dimensions' localities
    * instead of nesting one inside the other (a lexicographic sort clusters
    * perfectly on the leading column and not at all on the second; Z-order
    * keeps a range predicate on EITHER column selective at the file level).
    * Delegates to [[graft.functions.GraftFunctions.zorderKey]] — the
    * magic-mask bit spread (8 codegen'd integer ops per dimension, no UDF);
    * the DuckDB oracle writes the equivalent bit-by-bit terms over the same
    * clamped inputs.
    */
  def zvalue(x: String, y: String): Column =
    graft.functions.GraftFunctions.zorderKey(col(x), col(y))

  /** The same interleave as a DuckDB SQL fragment (bit-by-bit spelling —
    * portable, and bit-equivalence with the magic-mask spread is exactly
    * what the oracle gate then proves). Callers clamp the inputs.
    */
  private def zvalueSql(x: String, y: String): String = {
    val xTerms = (0 until ZBits).map(i => s"((($x >> $i) & 1) << ${2 * i + 1})")
    val yTerms = (0 until ZBits).map(i => s"((($y >> $i) & 1) << ${2 * i})")
    (xTerms ++ yTerms).mkString("(", " + ", ")")
  }

  /** Catalog entry: the Z-order clustering key over the (part, supplier)
    * plane of lineitem — the layout key a 100 TB table would be written
    * with so box predicates on either dimension prune files. The entry
    * verifies the interleave math itself (bit-exact vs the oracle);
    * `LayoutSpec` additionally writes both layouts and measures the
    * file-level pruning win on a box query.
    */
  def zorder(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .select(col("l_partkey"), col("l_suppkey"),
        zvalue("l_partkey", "l_suppkey").cast("bigint").as("zval"))

  /** Range-partition + locally sort `df` by the Z-value of two columns —
    * the write-side layout operator ([[zorder]] computes the key; this
    * applies it). Each output file then covers a compact Z-range, i.e. a
    * small box in the (x, y) plane, so its footer min/max on BOTH columns
    * is tight and a reader's box predicate skips most files.
    */
  def zorderLayout(df: DataFrame, x: String, y: String, numFiles: Int): DataFrame =
    df.withColumn("__z", zvalue(x, y))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")

  /** Catalog entry: 2-D skyline (Pareto frontier) of the part catalog —
    * the (price, size) pairs no other pair weakly dominates (minimizing;
    * WEAK dominance: ≤ on both dimensions with at least one strict — a
    * pair tied on one dimension and beaten on the other is dropped; only
    * exact (price, size) duplicates survive, merged into one row). The
    * textbook formulation is an all-pairs NOT EXISTS; this is the sort-based
    * decomposition, and it is partition-parallel rather than a single
    * global window:
    *
    *  1. dedupe to distinct (price, size) pairs (one shuffle, carries the
    *     part count per pair),
    *  2. range-partition by (price, size) and run the running-min-of-size
    *     window WITHIN each partition (`spark_partition_id` as the window
    *     key — no single-partition global sort),
    *  3. fix the partition boundaries with a broadcast frame of per-partition
    *     cumulative minima: a pair is dominated across partitions iff some
    *     earlier partition holds a pair with size ≤ its size (earlier in
    *     range order ⇒ lexicographically smaller ⇒ dominating whenever its
    *     size is ≤ — the same test as the local running min).
    *
    * The frontier set is independent of where the range boundaries fall, so
    * the result is layout-deterministic. The only non-local state is one
    * (partition, min-size) row per partition — KB-sized at any scale.
    * DuckDB oracle: the equivalent single global window (engine-checked
    * against brute-force domination in LayoutSpec).
    */
  def skyline(s: SparkSession, dir: String): DataFrame = {
    val pairs = Tables(s, dir, "part")
      .groupBy(col("p_retailprice").as("price"), col("p_size").as("size"))
      .agg(count(lit(1)).as("n_parts"))
    val ranged = pairs.repartitionByRange(col("price"), col("size"))
      .withColumn("pid", spark_partition_id())
    val localW = Window.partitionBy(col("pid"))
      .orderBy(col("price").asc, col("size").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ranged.withColumn("prevmin", min(col("size")).over(localW))
    // per-partition minima -> cumulative min over EARLIER partitions; the
    // frame is one row per partition, so the global window here is bounded
    val carryW = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = local.groupBy(col("pid")).agg(min(col("size")).as("pmin"))
      .withColumn("carry", min(col("pmin")).over(carryW))
      .select(col("pid"), col("carry"))
    local.join(broadcast(carry), "pid")
      .filter((col("prevmin").isNull || col("prevmin") > col("size")) &&
        (col("carry").isNull || col("carry") > col("size")))
      .select(col("price"), col("size"), col("n_parts"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_zorder" -> zorder,
    "q_skyline" -> skyline,
  )

  val oracleSql: Map[String, String] = Map(
    "q_zorder" ->
      s"""SELECT l_partkey, l_suppkey,
         |       CAST(${zvalueSql("cx", "cy")} AS BIGINT) AS zval
         |FROM (SELECT l_partkey, l_suppkey,
         |             least(greatest(l_partkey, 0), ${(1 << ZBits) - 1}) AS cx,
         |             least(greatest(l_suppkey, 0), ${(1 << ZBits) - 1}) AS cy
         |      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)) t""".stripMargin,
    "q_skyline" ->
      """WITH pairs AS MATERIALIZED (
        |  SELECT p_retailprice AS price, p_size AS size,
        |         CAST(count(*) AS BIGINT) AS n_parts
        |  FROM part GROUP BY 1, 2),
        |flagged AS MATERIALIZED (
        |  SELECT price, size, n_parts,
        |         min(size) OVER (ORDER BY price ASC, size ASC
        |                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmin
        |  FROM pairs)
        |SELECT price, CAST(size AS INT) AS size, n_parts
        |FROM flagged WHERE prevmin IS NULL OR prevmin > size""".stripMargin,
  )
}
