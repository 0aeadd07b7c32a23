package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset profiling + data-quality validation — the "describe my 100 TB
  * table" and "gate the load" reports every warehouse user runs before
  * trusting data (the reference's users run these downstream, post-load;
  * here they run on-engine, pre-load).
  *
  * Scale shape:
  *   - [[profile]] unpivots map-side (`stack` — no shuffle, no Expand) and
  *     aggregates once per (column, value): the ONE distinct aggregate goes
  *     through Spark's two-phase partial-distinct plan, so the fact table
  *     is scanned once and the wire carries (col, value) pairs after
  *     map-side dedup — never #distinct-aggs copies of every row (the
  *     Expand rewrite a per-column `countDistinct` list would trigger;
  *     plan-pinned Expand-free).
  *   - [[dqReport]] fuses all single-table checks into one FILTER-aggregate
  *     pass per table plus one left-anti join per foreign key — each check
  *     is a counter, so the report's output is check-cardinality-sized no
  *     matter the input.
  */
object ProfileQueries {

  /** Column profile of lineitem: per-column row/null/exact-distinct counts
    * and typed min/max. Numeric columns carry (min_num, max_num), string
    * columns (min_str, max_str) — lexicographic order agrees between
    * engines on this ASCII data. `n_distinct` counts a coalesced value
    * (double→string casts are injective — shortest-round-trip formatting in
    * both engines — so the COUNT is engine-independent even though the
    * rendered strings differ).
    */
  def profile(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .selectExpr(
        """stack(6,
          |  'l_quantity',      CAST(NULL AS STRING), l_quantity,
          |  'l_extendedprice', CAST(NULL AS STRING), l_extendedprice,
          |  'l_discount',      CAST(NULL AS STRING), l_discount,
          |  'l_orderkey',      CAST(NULL AS STRING), CAST(l_orderkey AS DOUBLE),
          |  'l_returnflag',    l_returnflag,         CAST(NULL AS DOUBLE),
          |  'l_linestatus',    l_linestatus,         CAST(NULL AS DOUBLE)
          |) AS (col_name, sval, dval)""".stripMargin)
      .groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n_rows"),
        expr("count(1) FILTER (WHERE sval IS NULL AND dval IS NULL)").as("n_nulls"),
        countDistinct(coalesce(col("sval"), col("dval").cast("string"))).as("n_distinct"),
        min(col("dval")).as("min_num"), max(col("dval")).as("max_num"),
        min(col("sval")).as("min_str"), max(col("sval")).as("max_str"))

  /** Constraint-validation report: PK uniqueness, FK orphans, range/enum/
    * null checks, one violation counter per check. On this testdata every
    * check passes EXCEPT lineitem's composite PK — the generator ships
    * duplicate (l_orderkey, l_linenumber) pairs — so the report proves the
    * counting path, not just the zero path.
    */
  def dqReport(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val orders = Tables(s, dir, "orders")
    val cust = Tables(s, dir, "customer")
    val liChecks = li.agg(
        expr("count(1) FILTER (WHERE l_discount < 0 OR l_discount > 0.1)").as("range_discount"),
        expr("count(1) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)").as("range_quantity"),
        expr("count(1) FILTER (WHERE l_returnflag NOT IN ('A','N','R') " +
          "OR l_returnflag IS NULL)").as("enum_returnflag"),
        expr("count(1) FILTER (WHERE l_extendedprice IS NULL)").as("null_extendedprice"),
        (count(lit(1)) - countDistinct(col("l_orderkey"), col("l_linenumber")))
          .as("pk_dup_lineitem"))
      .selectExpr(
        """stack(5,
          |  'range_discount', range_discount,
          |  'range_quantity', range_quantity,
          |  'enum_returnflag', enum_returnflag,
          |  'null_extendedprice', null_extendedprice,
          |  'pk_dup_lineitem', pk_dup_lineitem
          |) AS (check_name, violations)""".stripMargin)
    val pkOrders = orders
      .agg((count(lit(1)) - countDistinct(col("o_orderkey"))).as("violations"))
      .select(lit("pk_dup_orders").as("check_name"), col("violations"))
    val orphanLi = li.join(orders, li("l_orderkey") === orders("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("fk_orphan_lineitem").as("check_name"), col("violations"))
    val orphanOrd = orders.join(cust, orders("o_custkey") === cust("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("fk_orphan_orders").as("check_name"), col("violations"))
    liChecks.unionAll(pkOrders).unionAll(orphanLi).unionAll(orphanOrd)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile" -> profile,
    "q_dq_report" -> dqReport,
  )

  val oracleSql: Map[String, String] = Map(
    "q_profile" ->
      """WITH u AS (
        |  SELECT 'l_quantity' AS col_name, CAST(NULL AS VARCHAR) AS sval, l_quantity AS dval FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', NULL, l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', NULL, l_discount FROM lineitem
        |  UNION ALL SELECT 'l_orderkey', NULL, CAST(l_orderkey AS DOUBLE) FROM lineitem
        |  UNION ALL SELECT 'l_returnflag', l_returnflag, NULL FROM lineitem
        |  UNION ALL SELECT 'l_linestatus', l_linestatus, NULL FROM lineitem)
        |SELECT col_name,
        |  CAST(count(1) AS BIGINT) AS n_rows,
        |  CAST(count(1) FILTER (WHERE sval IS NULL AND dval IS NULL) AS BIGINT) AS n_nulls,
        |  CAST(count(DISTINCT coalesce(sval, CAST(dval AS VARCHAR))) AS BIGINT) AS n_distinct,
        |  min(dval) AS min_num, max(dval) AS max_num,
        |  min(sval) AS min_str, max(sval) AS max_str
        |FROM u GROUP BY col_name""".stripMargin,
    "q_dq_report" ->
      """WITH li AS (
        |  SELECT
        |    CAST(count(1) FILTER (WHERE l_discount < 0 OR l_discount > 0.1) AS BIGINT) AS range_discount,
        |    CAST(count(1) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT) AS range_quantity,
        |    CAST(count(1) FILTER (WHERE l_returnflag NOT IN ('A','N','R') OR l_returnflag IS NULL) AS BIGINT) AS enum_returnflag,
        |    CAST(count(1) FILTER (WHERE l_extendedprice IS NULL) AS BIGINT) AS null_extendedprice,
        |    CAST(count(1) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT) AS pk_dup_lineitem
        |  FROM lineitem)
        |SELECT 'range_discount' AS check_name, range_discount AS violations FROM li
        |UNION ALL SELECT 'range_quantity', range_quantity FROM li
        |UNION ALL SELECT 'enum_returnflag', enum_returnflag FROM li
        |UNION ALL SELECT 'null_extendedprice', null_extendedprice FROM li
        |UNION ALL SELECT 'pk_dup_lineitem', pk_dup_lineitem FROM li
        |UNION ALL SELECT 'pk_dup_orders',
        |  CAST(count(1) - count(DISTINCT o_orderkey) AS BIGINT) FROM orders
        |UNION ALL SELECT 'fk_orphan_lineitem', CAST(count(1) AS BIGINT) FROM lineitem l
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL SELECT 'fk_orphan_orders', CAST(count(1) AS BIGINT) FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)""".stripMargin,
  )
}
