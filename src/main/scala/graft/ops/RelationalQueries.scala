package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The standard relational operator surface (SURVEY §2.8): everything the
  * reference delegates to the downstream warehouse, expressed through stock
  * Spark DataFrame operators so Catalyst/Tungsten provide pushdown, pruning,
  * join selection, whole-stage codegen.
  *
  * Determinism-by-construction rules (the DuckDB oracle hash-compares values):
  *   - monetary aggregates are summed as DECIMAL(18,2) (exact, order-independent)
  *     and cast to DOUBLE at the end — both engines then produce bit-identical
  *     doubles;
  *   - DuckDB integer SUMs are cast to BIGINT in the oracle (DuckDB widens to
  *     HUGEINT, Spark to LONG);
  *   - window orderings always carry a unique tiebreaker column.
  */
object RelationalQueries {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")

  // --- scans / filters / projections ------------------------------------

  def filterProject(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1994-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00")) &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))

  // --- aggregation ------------------------------------------------------

  /** TPC-H Q1 shape: multi-aggregate groupBy with derived expressions. */
  def aggPricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))

  def aggStats(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"),
        count(lit(1)).as("cnt"),
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"))

  def distinctFlags(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem").select(col("l_returnflag"), col("l_linestatus")).distinct()

  def groupHaving(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("total_qty"))
      .filter(col("cnt") >= 40)

  def rollupAgg(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"), dsum(col("l_quantity")).as("sum_qty"))

  def cubeAgg(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), dsum(col("o_totalprice")).as("sum_price"))

  /** FILTER-clause aggregates: several differently-conditioned aggregates
    * out of ONE pass over the group (the pre-SQL:2003 alternative was one
    * scan per condition or CASE-wrapped inputs) — all partial-aggregable.
    */
  def aggFilter(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_all"),
        expr("count(1) FILTER (WHERE o_orderpriority = '1-URGENT')").as("n_urgent"),
        expr("CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) " +
          "FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE)").as("urgent_price"),
        expr("CAST(max(o_totalprice) FILTER (WHERE o_orderpriority <> '1-URGENT') AS DOUBLE)")
          .as("other_max"))

  /** Exact-arithmetic correlation + covariance per group — the two-column
    * moment statistics (`corr`, `covar_samp`) with the house determinism
    * rule applied: built-in float `corr` accumulates IEEE sums in partition
    * order (non-deterministic across engines/layouts), so the moments are
    * accumulated on the exact cent grid instead (`round(x*100)` — the data
    * is 2-decimal, so the grid is lossless): per-row products fit int64,
    * sums go to DECIMAL(38,0) (exact, order-independent; DuckDB widens to
    * HUGEINT — also exact), and the only IEEE arithmetic is the final
    * left-to-right divide/sqrt chain. Same identity as
    * [[SimilarityQueries.embCovariance]], applied to relational columns.
    */
  def aggCorr(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .selectExpr("l_returnflag",
        "CAST(round(l_quantity * 100) AS BIGINT) AS x",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS y")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"))
      .selectExpr("l_returnflag", "n",
        "CAST(n * sxy - sx * sy AS DOUBLE) / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))" +
          " / sqrt(CAST(n * syy - sy * sy AS DOUBLE)) AS corr_qty_price",
        "CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n AS DOUBLE)" +
          " / CAST(n - 1 AS DOUBLE) / 10000.0 AS covar_qty_price")

  /** Ordinary least squares per group — slope, intercept, r² of
    * extendedprice on quantity — from the same exact cent-grid integer
    * moments as [[aggCorr]]: the closed-form estimators are ratios of
    * integer moment combinations, so the only IEEE arithmetic is the final
    * left-to-right chain. One partial+final aggregate, no second pass —
    * regression at 100 TB is the same scan as a sum.
    */
  def regression(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .selectExpr("l_returnflag",
        "CAST(round(l_quantity * 100) AS BIGINT) AS x",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS y")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"))
      .selectExpr("l_returnflag", "n",
        // slope in original units: the 100x grid scale cancels
        "CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) AS slope",
        "(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)" +
          " - CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)" +
          " * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0 AS intercept",
        "CAST(n * sxy - sx * sy AS DOUBLE) / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))" +
          " / sqrt(CAST(n * syy - sy * sy AS DOUBLE))" +
          " * (CAST(n * sxy - sx * sy AS DOUBLE) / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))" +
          " / sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r2")

  /** Welch two-sample t statistic — URGENT vs LOW priority order values
    * (the A/B-test readout): group means and variances from exact cent-grid
    * moments (one FILTER-aggregate pass computes both arms), then one IEEE
    * chain for t. The variance identity (n*Sxx - Sx^2) / (n * (n-1)) stays
    * integral until the final divisions, so the statistic hash-gates.
    */
  def abTest(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .selectExpr("o_orderpriority = '1-URGENT' AS is_a",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS v")
      .agg(
        expr("count(1) FILTER (WHERE is_a)").as("na"),
        expr("count(1) FILTER (WHERE NOT is_a)").as("nb"),
        expr("sum(CAST(v AS DECIMAL(38,0))) FILTER (WHERE is_a)").as("sa"),
        expr("sum(CAST(v AS DECIMAL(38,0))) FILTER (WHERE NOT is_a)").as("sb"),
        expr("sum(CAST(v * v AS DECIMAL(38,0))) FILTER (WHERE is_a)").as("saa"),
        expr("sum(CAST(v * v AS DECIMAL(38,0))) FILTER (WHERE NOT is_a)").as("sbb"))
      .selectExpr("na", "nb",
        "CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 100.0 AS mean_a",
        "CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 100.0 AS mean_b",
        // t = (ma - mb) / sqrt(va/na + vb/nb), all on the cent grid (the
        // 100x scale cancels between numerator and the sqrt)
        "(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))" +
          " / sqrt(CAST(na * saa - sa * sa AS DOUBLE) / CAST(na AS DOUBLE) / CAST(na - 1 AS DOUBLE) / CAST(na AS DOUBLE)" +
          "      + CAST(nb * sbb - sb * sb AS DOUBLE) / CAST(nb AS DOUBLE) / CAST(nb - 1 AS DOUBLE) / CAST(nb AS DOUBLE)) AS t_welch")

  /** Positional window values: nth_value + first/last with IGNORE NULLS
    * (the observation-carried-forward idioms). The ordering carries every
    * output-relevant column as a tiebreaker: the testdata has full
    * duplicate (orderkey, linenumber) rows, and RANGE-framed positional
    * functions include peer rows — value-identical peers make every output
    * invariant under tie order, which is what the oracle hash needs.
    */
  def windowNth(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_discount"))
    Tables(s, dir, "lineitem")
      .filter(col("l_orderkey") < 1000)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_discount"),
        nth_value(col("l_extendedprice"), 3).over(w).as("nth3"),
        first(when(col("l_discount") =!= 0, col("l_discount")), ignoreNulls = true)
          .over(w).as("first_disc"),
        last(when(col("l_discount") =!= 0, col("l_discount")), ignoreNulls = true)
          .over(w).as("last_disc"))
  }

  /** CUBE with GROUPING_ID: the aggregation-level discriminator a BI layer
    * uses to route subtotal rows (first grouping column = most significant
    * bit, per the SQL standard in both engines).
    */
  def groupingId(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"), grouping_id().cast("int").as("gid"))

  def groupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "orders").createOrReplaceTempView("gs_orders")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, count(1) AS cnt
        |FROM gs_orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
  }

  // --- joins ------------------------------------------------------------

  /** Broadcast-dim star join: revenue per region. nation/region are tiny —
    * explicitly broadcast so the 100 TB plan is shuffle-free on the dims.
    */
  def joinStar(s: SparkSession, dir: String): DataFrame = {
    val region = broadcast(Tables(s, dir, "region"))
    val nation = broadcast(Tables(s, dir, "nation"))
    val cust = Tables(s, dir, "customer")
    val orders = Tables(s, dir, "orders")
    orders.join(cust, col("o_custkey") === col("c_custkey"))
      .join(nation, col("c_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
  }

  /** Large-side equi-join + agg: revenue by order year across orders x lineitem. */
  def joinBig(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables(s, dir, "orders")
    val li = Tables(s, dir, "lineitem")
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** Manually salted equi-join as a catalog entry — the skew mitigation for
    * when AQE's runtime skew split can't fire (skewed side feeding an
    * aggregate in the same stage, pre-AQE engines, or a hot key known AT
    * AUTHOR TIME). Runs the fact-dim join through the generic
    * [[SkewJoin.saltedInnerJoin]] (fact salted per-row, dim replicated once
    * per salt value, join key becomes (key, salt)). Cost: the dim shuffle
    * grows saltBuckets-fold — the dial trades dim replication for fact
    * balance, so it belongs on joins where the fact side dwarfs the dim
    * side. Salt values never affect the result: the oracle is the PLAIN
    * join — salting must be invisible in the answer.
    */
  def saltedJoin(s: SparkSession, dir: String, saltBuckets: Int = 8): DataFrame =
    // project BOTH sides to the columns the aggregate reads before salting
    // (guide §2.3 "project before the exchange"): the salt mixes xxhash64
    // over every column of its input, so an unprojected fact side forced the
    // scan to read and hash ALL 16 lineitem columns and shipped them through
    // the (key, salt) exchange — for an aggregate that touches three. Salt
    // values only route rows (the dim is replicated into every bucket), so
    // changing the hash input cannot change the result — the oracle is the
    // plain join.
    SkewJoin.saltedInnerJoin(
        Tables(s, dir, "lineitem")
          .select(col("l_orderkey").as("k"), col("l_extendedprice"), col("l_discount")),
        Tables(s, dir, "orders")
          .select(col("o_orderkey").as("k"), col("o_orderpriority")),
        "k", saltBuckets)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"))

  /** Incremental view maintenance for a JOIN view — the delta-join
    * identity: with batches dL, dO arriving on top of bases L, O,
    *
    *   delta(L join O) = dL join O_base  UNION  L_base join dO
    *                     UNION  dL join dO
    *
    * so refreshing the materialized join view touches each BASE table only
    * through one equi-join against a delta — base-join-base is never
    * recomputed. Deltas are batch-sized, so both are broadcast explicitly:
    * at 100 TB the refresh reads the two bases once map-side and shuffles
    * nothing (plan-pinned: three broadcast joins, zero shuffle joins). The
    * `src` tag carries provenance (which branch produced the row) — the
    * disjointness of the three branches is what makes the identity exact,
    * spec-pinned as delta + base-view = full recompute.
    */
  def ivmJoin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val o = Tables(s, dir, "orders")
    val dl = li.filter(pmod(col("l_linenumber"), lit(7)) === 3)
    val bl = li.filter(pmod(col("l_linenumber"), lit(7)) =!= 3)
    val dor = o.filter(pmod(col("o_custkey"), lit(10)) === 3)
    val bo = o.filter(pmod(col("o_custkey"), lit(10)) =!= 3)
    def proj(df: DataFrame, src: String) = df.select(col("l_orderkey"),
      col("l_linenumber"), col("l_quantity"), col("o_orderpriority"),
      lit(src).as("src"))
    proj(broadcast(dl).join(bo, col("l_orderkey") === col("o_orderkey")), "dL")
      .unionAll(proj(bl.join(broadcast(dor), col("l_orderkey") === col("o_orderkey")), "dO"))
      .unionAll(proj(broadcast(dl).join(dor, col("l_orderkey") === col("o_orderkey")), "dLdO"))
  }

  /** Incremental AGGREGATE view maintenance — the other half of [[ivmJoin]]:
    * a sum/count materialized view is maintained by merging the base view
    * with the delta batch's PARTIAL aggregate (full outer join on the group
    * keys, coalesce-add), never rescanning base rows. Sums are decimal so
    * the merged result is bit-identical to a full recompute — which is
    * exactly what the DuckDB oracle runs, making the gate the
    * delta-merge ≡ recompute equivalence proof. Scale shape: the base side
    * of the merge is the VIEW (one row per group, not per base row); only
    * the delta batch is scanned and partially aggregated.
    */
  def ivmAgg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    def part(df: DataFrame) = df.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sq"),
        count(lit(1)).as("n"))
    val base = part(li.filter(pmod(col("l_linenumber"), lit(7)) =!= 3))
    val delta = part(li.filter(pmod(col("l_linenumber"), lit(7)) === 3))
    base.as("b").join(delta.as("d"), Seq("l_returnflag", "l_linestatus"), "full_outer")
      .select(col("l_returnflag"), col("l_linestatus"),
        (coalesce(col("b.sq"), lit(0).cast("decimal(18,2)")) +
          coalesce(col("d.sq"), lit(0).cast("decimal(18,2)")))
          .cast("double").as("sum_qty"),
        (coalesce(col("b.n"), lit(0L)) + coalesce(col("d.n"), lit(0L))).as("n_rows"))
  }

  /** Keyed pseudonymization + masking + generalization — the privacy
    * transform run before data leaves the governed zone (the GDPR
    * minimization companion to `rel_delete_cascade`'s erasure):
    *
    *   - `pid`: a salted-hash pseudonymous key — stable, so downstream
    *     joins/groupBys still work, but only the salt holder can re-link
    *     (rotate the salt = crypto-shred the linkage);
    *   - `name_masked`: format-preserving partial mask (prefix kept,
    *     remainder starred) — utility for eyeballing, no identity;
    *   - `acctbal_band`: banded generalization of the numeric
    *     quasi-identifier (k-anonymity's classic move).
    *
    * Pure projection — codegen'd, zero shuffles; at 100 TB this is a
    * map-only pass that parallelizes perfectly.
    */
  def pseudonymize(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer").selectExpr(
      "substring(md5(concat('pseud:', CAST(c_custkey AS STRING))), 1, 16) AS pid",
      "concat(substring(c_name, 1, 4), repeat('*', greatest(length(c_name) - 4, 0))) AS name_masked",
      "CAST(floor(c_acctbal / 1000) AS BIGINT) * 1000 AS acctbal_band",
      "c_mktsegment")

  def semiJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables(s, dir, "customer")
    val orders = Tables(s, dir, "orders")
    cust.join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_cust"))
  }

  def antiJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables(s, dir, "customer")
    val orders = Tables(s, dir, "orders")
    cust.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
  }

  /** NOT IN over a NULLABLE key — the classic three-valued-logic trap
    * [[antiJoin]] (NOT EXISTS) does not exercise: one NULL in the subquery
    * makes `x NOT IN (...)` never-true (x <> NULL is UNKNOWN), so the whole
    * result silently empties — the #1 surprise for warehouse users porting
    * queries. Both branches are pinned in ONE entry: the `with_nulls` arm
    * (subquery keeps its constructed NULLs → empty by SQL semantics) and
    * the `nulls_filtered` arm (explicit IS NOT NULL → the intuitive
    * anti-join result). Runs through `spark.sql` so the analyzer performs
    * the null-aware rewrite; the planner turns the broadcast-able subquery
    * into a null-aware anti join (BroadcastHashJoin LeftAnti
    * isNullAwareAntiJoin=true — plan-pinned), NOT a nested-loop scan.
    *
    * Scale note: Spark's null-aware anti join REQUIRES a broadcastable
    * subquery (the single-column build side is tiny here and in most real
    * NOT IN queries); a non-broadcastable one degrades to a nested-loop
    * join. At that size, rewrite to the explicit decomposition the
    * `nulls_filtered` arm demonstrates: an IS NOT NULL shuffle anti join
    * plus a has-any-null existence check — same answer, shuffle-partitioned.
    */
  def notIn(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "customer").createOrReplaceTempView("ni_customer")
    Tables(s, dir, "orders").createOrReplaceTempView("ni_orders")
    s.sql(
      """WITH sub AS (
        |  SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END AS k
        |  FROM ni_orders WHERE o_orderkey % 5 = 0)
        |SELECT 'with_nulls' AS arm, c_custkey FROM ni_customer
        |WHERE c_custkey NOT IN (SELECT k FROM sub)
        |UNION ALL
        |SELECT 'nulls_filtered' AS arm, c_custkey FROM ni_customer
        |WHERE c_custkey NOT IN (SELECT k FROM sub WHERE k IS NOT NULL)""".stripMargin)
  }

  def leftOuterJoin(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables(s, dir, "orders")
    val li = Tables(s, dir, "lineitem")
    orders.join(li, col("o_orderkey") === col("l_orderkey"), "left_outer")
      .groupBy(col("o_orderkey"))
      .agg(count(col("l_orderkey")).as("n_lines"))
  }

  /** Full outer: customers and orders keyed by custkey — both null sides
    * survive (customers without orders AND the join-side aggregation keeps
    * exact counts of each).
    */
  def fullOuterJoin(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables(s, dir, "customer")
      .groupBy(col("c_custkey")).agg(count(lit(1)).as("n_cust_rows"))
    val orders = Tables(s, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    cust.join(orders, col("c_custkey") === col("o_custkey"), "full_outer")
      .selectExpr(
        "coalesce(c_custkey, o_custkey) AS custkey",
        "CAST(coalesce(n_cust_rows, 0) AS BIGINT) AS n_cust_rows",
        "CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders",
        """CASE WHEN c_custkey IS NULL THEN 'order_only'
          |     WHEN o_custkey IS NULL THEN 'customer_only'
          |     ELSE 'both' END AS presence""".stripMargin)
  }

  /** Theta (non-equi) join against a TINY side: classify every lineitem
    * price into bands via `bmin <= price < bmax`. The correct plan when one
    * side is a handful of rows is a broadcast nested-loop — the predicate
    * never becomes a shuffle key, and the big side streams map-side. (When
    * BOTH sides are large, bucketize instead — that is `q_range_join`.)
    */
  def thetaJoin(s: SparkSession, dir: String): DataFrame = {
    val bands = Tables(s, dir, "lineitem").sparkSession.range(5).selectExpr(
      "CAST(id AS INT) AS band",
      "CAST(id * 12000 AS DOUBLE) AS bmin",
      "CAST(IF(id = 4, 1000000000, (id + 1) * 12000) AS DOUBLE) AS bmax")
    Tables(s, dir, "lineitem")
      .select(col("l_extendedprice").cast("double").as("price"))
      .join(broadcast(bands), col("price") >= col("bmin") && col("price") < col("bmax"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_lines"))
  }

  /** Changelog merge (SCD-1 upsert): fold a stream of keyed change events
    * into a base snapshot — the incremental-maintenance primitive of every
    * warehouse pipeline (MERGE INTO latest-wins). The scalable shape: the
    * changelog collapses to one row per key FIRST via a partial+final
    * `max_by` aggregation (no window sort — max_by carries only the current
    * winner through the map side), then ONE equi-join against the base.
    * Never join the raw changelog (it multiplies base rows), never window
    * it (full sort per key when an agg suffices).
    *
    * Base = even-keyed customers (scale-independent split so all three merge
    * actions occur); changelog = events keyed by user_id; latest = greatest
    * (ts, event_id) — event_id is the unique tiebreaker.
    */
  def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val base = Tables(s, dir, "customer")
      .filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey").as("key"), col("c_mktsegment").as("segment"))
    val latest = Tables(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("event_type"), col("value")),
        struct(col("ts"), col("event_id"))).as("last"))
      .select(col("user_id").as("key"),
        col("last.event_type").as("last_event_type"),
        col("last.value").as("last_value"))
    base.join(latest, Seq("key"), "full_outer")
      .select(
        col("key"),
        coalesce(col("segment"), lit("unknown")).as("segment"),
        coalesce(col("last_event_type"), lit("none")).as("last_event_type"),
        coalesce(col("last_value"), lit(0.0)).as("last_value"),
        when(col("segment").isNull, "insert")
          .when(col("last_event_type").isNull, "keep")
          .otherwise("update").as("action"))
  }

  /** Changelog apply WITH DELETES (CDC apply, Debezium-shaped): the
    * [[mergeUpsert]] machinery extended by the third op. The changelog
    * still collapses to one winner per key FIRST (partial+final `max_by` —
    * never join or window the raw changelog), then one full-outer equi-join
    * computes the surviving snapshot: untouched base rows pass through,
    * upserts update-or-insert, and a key whose LAST change is a delete op
    * (here: the user's final event is an `error` — account purge) drops
    * out of the result entirely; a delete of a key the base never had is a
    * no-op. Output is the post-apply SNAPSHOT, so row absence IS the
    * delete semantics the oracle checks.
    */
  def mergeCdc(s: SparkSession, dir: String): DataFrame = {
    val base = Tables(s, dir, "customer")
      .filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey").as("key"), col("c_mktsegment").as("segment"))
    val latest = Tables(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(max_by(
        struct(col("event_type"), col("value")),
        struct(col("ts"), col("event_id"))).as("last"))
      .select(col("user_id").as("key"),
        when(col("last.event_type") === "error", "D").otherwise("U").as("op"),
        col("last.value").as("new_value"))
    base.join(latest, Seq("key"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(
        col("key"),
        coalesce(col("segment"), lit("unknown")).as("segment"),
        coalesce(col("new_value"), lit(0.0)).as("value"),
        when(col("segment").isNull, "insert")
          .when(col("op").isNull, "keep")
          .otherwise("update").as("action"))
  }

  /** Temporal (point-in-time) dimension join: enrich each event with the
    * dimension attributes that were CURRENT at the event's timestamp — the
    * fact-to-SCD2 lookup every event pipeline runs (joining today's
    * dimension row instead silently rewrites history). The dimension is
    * [[scd2]]'s [eff_from, eff_to) version table; the join is an EQUI-join
    * on the entity key with the validity window as a residual predicate —
    * the right 100 TB shape when a key's version list is short (the
    * no-equi-key variant is `q_range_join`'s bucketization). Half-open
    * intervals make the match unique: every event lands in exactly one
    * version row.
    *
    * As a catalog entry the dimension build runs inline (the SCD2 window IS
    * part of the demonstrated query); a production pipeline joins a
    * MATERIALIZED history table instead — the scd2 build is a one-time
    * load-side cost, not a per-query one.
    */
  def temporalJoin(s: SparkSession, dir: String): DataFrame = {
    val dim = scd2(s, dir).withColumnRenamed("user_id", "d_user")
    Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
      .join(dim, col("user_id") === col("d_user") &&
        col("ts") >= col("eff_from") &&
        (col("eff_to").isNull || col("ts") < col("eff_to")))
      .select(col("event_id"), col("user_id"), col("ts"), col("attr"), col("version"))
  }

  /** Fixed-bound histogram: bucket assignment is a pure per-row projection
    * (map-side), so the only shuffle is the 10-group final aggregate —
    * at 100 TB this is a full scan with kilobytes of shuffle.
    * Bounds are literals, not data-derived min/max (which would cost an
    * extra pass and make the layout data-dependent).
    */
  def histogram(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .select(
        least(floor(col("o_totalprice") / lit(50000.0)), lit(9)).cast("int").as("bucket"),
        dec(col("o_totalprice")).as("p"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"), sum(col("p")).cast("double").as("sum_price"))

  /** TPC-H Q3 shape (shipping priority): selective dim filter → two-table
    * equi-join chain → grouped revenue → top-10. Filters sit on each scan
    * (pushed to parquet), the filtered customer side joins as a broadcast at
    * small scale (Catalyst's call — at 100 TB a 1/5-selectivity customer
    * table is NOT broadcastable and the same plan degrades gracefully to a
    * shuffle join), and the top-10 runs as TakeOrderedAndProject with
    * `l_orderkey` as the deterministic tiebreaker.
    */
  def tpchQ3(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit(java.sql.Timestamp.valueOf("1996-03-15 00:00:00"))
    val cust = Tables(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val orders = Tables(s, dir, "orders")
      .filter(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
    val line = Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    line.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape (local-supplier volume): the 6-table join with the
    * non-FK `c_nationkey = s_nationkey` condition folded into the supplier
    * join. Nation and region are genuinely bounded (25 / 5 rows at ANY
    * scale) so those joins are explicitly broadcast; the fact-side chain
    * stays shuffle equi-joins with the date filter pushed to the orders
    * scan.
    */
  def tpchQ5(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables(s, dir, "orders")
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      .select(col("o_orderkey"), col("o_custkey"))
    val line = Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
    line.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(Tables(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(s, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
  }

  /** TPC-H Q18 shape (large-volume customer): the HAVING-filtered
    * aggregate feeding a fact chain. The qualifying-order set comes from a
    * partial-aggregated groupBy over lineitem (decimal-exact quantity sum)
    * and carries its `sum_qty` into the join, so lineitem is scanned ONCE —
    * no re-join + re-group of the classic formulation. At 100 TB the
    * HAVING threshold keeps only the tail, so AQE converts the join-back
    * into a broadcast at runtime; top-100 runs as TakeOrderedAndProject
    * with o_orderkey as the deterministic tiebreaker.
    */
  def tpchQ18(s: SparkSession, dir: String): DataFrame = {
    val big = Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("sum_qty"))
      .filter(col("sum_qty") > lit(250))
    big.join(Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables(s, dir, "customer").select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"),
        col("sum_qty").cast("double").as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q17 shape (small-quantity-order revenue): the correlated
    * per-group aggregate subquery — lines with quantity below 20% of their
    * part's average quantity. Decorrelated the scale-safe way: ONE per-part
    * (sum, count) aggregate joins the fact once (never a re-scan per outer
    * row), and the `qty < 0.2 * avg` predicate is cross-multiplied to an
    * exact decimal comparison (5*qty*cnt < sum) so no engine evaluates an
    * IEEE average inside the filter. The part dimension filter broadcasts.
    */
  def tpchQ17(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val part = Tables(s, dir, "part").filter(col("p_size") <= 5)
      .select(col("p_partkey"), col("p_brand"))
    val perPart = li.groupBy(col("l_partkey"))
      .agg(sum(dec(col("l_quantity"))).as("sum_qty"), count(lit(1)).as("cnt"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .join(perPart, Seq("l_partkey"))
      .filter(dec(col("l_quantity")) * 5 * col("cnt") < col("sum_qty"))
      .groupBy(col("p_brand"))
      .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q21 shape (suppliers who kept orders waiting), adapted to this
    * schema (no commit/receipt dates): a line is LATE when it ships more
    * than 60 days after its order date. Report suppliers with a late line
    * on a finished multi-supplier order where every OTHER supplier was on
    * time — the canonical EXISTS + NOT EXISTS double correlation. Both
    * correlated predicates plan as equi-joins on the order key (left_semi /
    * left_anti over the deduplicated (order, supplier) sets); nothing
    * expands beyond the lineitem row count, and the non-equal supplier
    * condition rides the join instead of becoming a filterless cross. The
    * `late` set feeds BOTH correlations, so it is materialized once behind
    * a persist barrier (Lifecycle-released) — without it the whole
    * fact-fact join + distinct executes twice.
    */
  /** TPC-H Q19 shape (discounted-revenue over disjunctive predicates): the
    * join condition the optimizer must CNF-split — three OR'd brand/size/
    * quantity clauses that all share the `p_partkey = l_partkey` conjunct.
    * Catalyst extracts the common equi-key (the join stays a hash join, not
    * a nested-loop over the OR) and pushes the per-side halves of each
    * disjunct (`p_brand IN (...)`, `l_quantity <= 30`-style bounds) down to
    * the scans, leaving only the cross-side residual above the join — the
    * textbook disjunctive-pushdown case. Revenue is the house decimal-exact
    * sum.
    */
  def tpchQ19(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val part = Tables(s, dir, "part")
    li.join(part, col("p_partkey") === col("l_partkey") && (
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  def tpchQ21(s: SparkSession, dir: String): DataFrame = {
    val (out, late) = tpchQ21Plan(s, dir)
    Lifecycle.released(out, late)
  }

  /** Lazy twin for plan inspection: (result, persisted late-set barrier). */
  def tpchQ21Plan(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val li = Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val ord = Tables(s, dir, "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    // the date columns ship as TIMESTAMP_NTZ in some testdata generations —
    // an NTZ cannot cast straight to LONG; go through TIMESTAMP (sessions
    // pin UTC, so the wall clock is preserved exactly like DuckDB's read)
    val late = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate").cast("timestamp").cast("long") >
        col("o_orderdate").cast("timestamp").cast("long") + 60L * 86400)
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val others = li.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2")).distinct()
    val lateOthers = late.select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
    val out = late
      .join(others, col("l_orderkey") === col("o2") && col("l_suppkey") =!= col("s2"),
        "left_semi")
      .join(lateOthers, col("l_orderkey") === col("o3") && col("l_suppkey") =!= col("s3"),
        "left_anti")
      .join(Tables(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
    (out, late)
  }

  // --- the rest of the TPC-H suite, adapted to this schema ---------------
  //
  // The testdata is TPC-H-ish but reduced (no partsupp; no commit/receipt
  // dates, shipmodes, comments, phones), so each remaining query keeps its
  // CANONICAL SHAPE — the join topology, correlation, and aggregate
  // structure the optimizer must handle — with the missing column swapped
  // for a present equivalent (documented per query). Decimal discipline and
  // deterministic LIMIT tiebreakers follow the house rules above.

  private val one = lit(1).cast("decimal(18,2)")
  private val revd = dec(col("l_extendedprice")) * (one - dec(col("l_discount")))

  /** Q2 shape (min-cost supplier): partsupp stands in as the DISTINCT
    * (part, supplier) pairs observed in lineitem, supply cost as
    * s_acctbal. Correlated min per part (ties kept, like the original's
    * `= (SELECT min ...)`), region-filtered join chain, deterministic
    * top-100. The candidate set feeds both the min aggregate and the
    * join-back, so it sits behind one released persist barrier.
    */
  def tpchQ2(s: SparkSession, dir: String): DataFrame = {
    val ps = Tables(s, dir, "lineitem")
      .select(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey")).distinct()
    val cand = Tables(s, dir, "part")
      .filter(col("p_size") <= 10 && col("p_type") === "STANDARD")
      .select(col("p_partkey"), col("p_name"))
      .join(ps, col("partkey") === col("p_partkey"))
      .join(Tables(s, dir, "supplier"), col("s_suppkey") === col("suppkey"))
      .join(broadcast(Tables(s, dir, "nation")), col("n_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables(s, dir, "region").filter(col("r_name") === "EUROPE")),
        col("r_regionkey") === col("n_regionkey"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
        col("s_acctbal"), col("n_name"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mn = cand.groupBy(col("p_partkey").as("mpk")).agg(min(col("s_acctbal")).as("mb"))
    val out = cand.join(mn, col("p_partkey") === col("mpk") && col("s_acctbal") === col("mb"))
      .orderBy(col("s_acctbal").desc, col("p_partkey").asc, col("s_suppkey").asc)
      .limit(100)
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"), col("p_name"))
    Lifecycle.released(out, cand)
  }

  /** Q4 shape (order-priority checking): the EXISTS correlation, with
    * "late" = shipped more than 60 days after the order date (the Q21
    * adaptation, since commit/receipt dates don't exist here). Plans as a
    * left-semi equi-join on the order key with the date inequality riding
    * it; epoch-seconds arithmetic per the Q21 NTZ note.
    */
  def tpchQ4(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables(s, dir, "orders")
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-07-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1996-10-01 00:00:00")))
    val li = Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate").cast("timestamp").cast("long") >
          col("o_orderdate").cast("timestamp").cast("long") + 60L * 86400, "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  /** Q6 shape (forecast-revenue change): the pure scan-side query — every
    * predicate pushes to the parquet scan, the aggregate is one exact
    * decimal product-sum. The TPC-H query most sensitive to pushdown.
    */
  def tpchQ6(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))

  /** Q7 shape (volume shipping between two nations): the symmetric
    * two-nation filter over the customer-nation x supplier-nation join
    * chain, grouped by both nations and ship year. Dims broadcast; the
    * fact chain shuffles on its keys.
    */
  def tpchQ7(s: SparkSession, dir: String): DataFrame = {
    val n1 = "NATION_1"; val n2 = "NATION_2"
    Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("o_orderkey") === col("l_orderkey"))
      .join(Tables(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
        col("c_custkey") === col("o_custkey"))
      .join(broadcast(Tables(s, dir, "nation")
        .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))),
        col("cnk") === col("c_nationkey"))
      .join(Tables(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
        col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(Tables(s, dir, "nation")
        .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("snk") === col("s_nationkey"))
      .filter((col("supp_nation") === n1 && col("cust_nation") === n2) ||
        (col("supp_nation") === n2 && col("cust_nation") === n1))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(revd).cast("double").as("revenue"))
  }

  /** Q8 shape (national market share): one nation's share of the
    * region's volume for one part type, by order year — the
    * conditional-sum / total-sum division with both sums exact decimal
    * before the single IEEE divide.
    */
  def tpchQ8(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "part").filter(col("p_type") === "PROMO")
        .select(col("p_partkey")), col("p_partkey") === col("l_partkey"))
      .join(Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("o_orderkey") === col("l_orderkey"))
      .join(Tables(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
        col("c_custkey") === col("o_custkey"))
      .join(broadcast(Tables(s, dir, "nation").select(col("n_nationkey").as("cnk"), col("n_regionkey"))),
        col("cnk") === col("c_nationkey"))
      .join(broadcast(Tables(s, dir, "region").filter(col("r_name") === "EUROPE")),
        col("r_regionkey") === col("n_regionkey"))
      .join(Tables(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
        col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(Tables(s, dir, "nation")
        .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("snk") === col("s_nationkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((sum(when(col("supp_nation") === "NATION_3", revd)
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
        sum(revd).cast("double")).as("mkt_share"))

  /** Q9 shape (product-type profit): profit per supplier nation and order
    * year over name-matched parts; supply cost stands in as the part's
    * retail price x quantity (no partsupp) — the amount stays one exact
    * decimal expression.
    */
  def tpchQ9(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "part").filter(col("p_name").like("%red%"))
        .select(col("p_partkey"), col("p_retailprice")), col("p_partkey") === col("l_partkey"))
      .join(Tables(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
        col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(Tables(s, dir, "nation").select(col("n_nationkey"), col("n_name"))),
        col("n_nationkey") === col("s_nationkey"))
      .join(Tables(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(revd - dec(col("p_retailprice")) * dec(col("l_quantity")))
        .cast("double").as("sum_profit"))

  /** Q10 shape (returned-item reporting): revenue lost to returns per
    * customer in a quarter, deterministic top-20 (exact-decimal-derived
    * revenue, custkey tiebreak).
    */
  def tpchQ10(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer")
      .join(Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
          col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
        .select(col("o_orderkey"), col("o_custkey")), col("o_custkey") === col("c_custkey"))
      .join(Tables(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables(s, dir, "nation").select(col("n_nationkey"), col("n_name"))),
        col("n_nationkey") === col("c_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(revd).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(20)
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("c_acctbal"), col("n_name"))

  /** Q11 shape (important stock): per-part value from one region's
    * suppliers vs a scalar-subquery share threshold — the grouped
    * aggregate compared against a fraction of its own total (1-row
    * broadcast). Both the per-part value and the corpus total stay EXACT
    * DECIMAL through the threshold test (`value·10⁴ > 8·total`, the
    * 0.0008 fraction cleared of its denominator), so the cutoff cannot
    * depend on float accumulation order; the single double cast happens
    * in the final projection only.
    */
  def tpchQ11(s: SparkSession, dir: String): DataFrame = {
    val pv = Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey")),
        col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(Tables(s, dir, "nation").select(col("n_nationkey"), col("n_regionkey"))),
        col("n_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables(s, dir, "region").filter(col("r_name") === "ASIA")),
        col("r_regionkey") === col("n_regionkey"))
      .groupBy(col("l_partkey").as("partkey"))
      .agg(sum(dec(col("l_extendedprice"))).as("value_dec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = pv.agg(sum(col("value_dec")).as("t"))
    val out = pv.crossJoin(broadcast(tot))
      .filter(col("value_dec") * lit(10000L) > lit(8L) * col("t"))
      .select(col("partkey"), col("value_dec").cast("double").as("value"))
    Lifecycle.released(out, pv)
  }

  /** Q12 shape (shipping-mode priority classes): conditional counting by
    * category after the order join; shipmode doesn't exist, so the
    * category is a quantity band — the CASE/aggregation structure is
    * unchanged.
    */
  def tpchQ12(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
      .join(Tables(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
        .select(col("l_orderkey"), col("l_quantity")), col("l_orderkey") === col("o_orderkey"))
      .selectExpr(
        "CASE WHEN l_quantity < 15 THEN 'SMALL' WHEN l_quantity < 35 THEN 'MEDIUM' ELSE 'LARGE' END AS qty_band",
        "o_orderpriority")
      .groupBy(col("qty_band"))
      .agg(sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_line_count"))

  /** Q13 shape (customer order-count distribution): the left join with an
    * extra join-side predicate (priority stands in for the comment
    * filter), then the distribution of per-customer counts — customers
    * with zero qualifying orders MUST appear in the 0 bucket.
    */
  def tpchQ13(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer").select(col("c_custkey"))
      .join(Tables(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey")),
        col("o_custkey") === col("c_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  /** Q14 shape (promo revenue share): conditional decimal sum over total
    * decimal sum in one month — both sums exact, one IEEE division (the
    * raw sums ship alongside for a wider hash surface).
    */
  def tpchQ14(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-09-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-10-01 00:00:00")))
      .join(Tables(s, dir, "part").select(col("p_partkey"), col("p_type")),
        col("p_partkey") === col("l_partkey"))
      .agg(
        (lit(100.0) * sum(when(col("p_type") === "PROMO", revd)
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
          sum(revd).cast("double")).as("promo_revenue"),
        sum(when(col("p_type") === "PROMO", revd).otherwise(lit(0).cast("decimal(18,2)")))
          .cast("double").as("promo_part"),
        sum(revd).cast("double").as("total"))

  /** Q15 shape (top supplier): the revenue view joined against its own
    * max — a 1-row broadcast; the equality is on the EXACT decimal
    * revenue, so ties (all max suppliers) are kept like the original.
    */
  def tpchQ15(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-10-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      .groupBy(col("l_suppkey").as("suppkey"))
      .agg(sum(revd).as("total_rev"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mx = rev.agg(max(col("total_rev")).as("m"))
    val out = rev.crossJoin(broadcast(mx))
      .filter(col("total_rev") === col("m"))
      .join(Tables(s, dir, "supplier").select(col("s_suppkey"), col("s_name")),
        col("s_suppkey") === col("suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev").cast("double").as("total_revenue"))
    Lifecycle.released(out, rev)
  }

  /** Q16 shape (part-supplier relationship count): distinct-supplier
    * counts per (brand, type, size) with the excluded-supplier NOT IN as
    * a left-anti join (supplier keys are non-null, so the anti join IS
    * the NOT IN; the nullable arm of that equivalence lives in
    * `q_not_in`). Negative balance stands in for the complaints filter.
    */
  def tpchQ16(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#13" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      .join(Tables(s, dir, "lineitem").select(col("l_partkey"), col("l_suppkey")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables(s, dir, "supplier").filter(col("s_acctbal") < 0)
        .select(col("s_suppkey")), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))

  /** Q20 shape (potential part promotion): the nested IN chain — suppliers
    * in a region who shipped more than a threshold quantity of
    * name-matched parts in a year; both INs plan as semi joins on the
    * supplier key (availqty doesn't exist, so the shipped-quantity
    * aggregate is the threshold subject).
    */
  def tpchQ20(s: SparkSession, dir: String): DataFrame = {
    val qualified = Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
      .join(Tables(s, dir, "part").filter(col("p_name").like("red%"))
        .select(col("p_partkey")), col("p_partkey") === col("l_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec(col("l_quantity"))).as("qty"))
      .filter(col("qty") > 300)
      .select(col("l_suppkey"))
    Tables(s, dir, "supplier")
      .join(broadcast(Tables(s, dir, "nation").select(col("n_nationkey"), col("n_regionkey"))),
        col("n_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables(s, dir, "region").filter(col("r_name") === "AMERICA")),
        col("r_regionkey") === col("n_regionkey"))
      .join(qualified, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
  }

  /** Q22 shape (global sales opportunity): the country-code pool (nation
    * key mod 7 stands in for phone prefixes), the positive-balance average
    * as a broadcast scalar, and NOT EXISTS recent orders as a left-anti
    * join. The pool feeds both the average and the final filter, so it
    * sits behind one released barrier.
    */
  def tpchQ22(s: SparkSession, dir: String): DataFrame = {
    val pool = Tables(s, dir, "customer")
      .filter(pmod(col("c_nationkey"), lit(7)).isin(1, 3, 5))
      .select(col("c_custkey"), col("c_acctbal"),
        pmod(col("c_nationkey"), lit(7)).cast("bigint").as("cntry"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val avgbal = pool.filter(col("c_acctbal") > 0.0)
      .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("ab"))
    val out = pool.crossJoin(broadcast(avgbal))
      .filter(col("c_acctbal") > col("ab"))
      .join(Tables(s, dir, "orders")
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("2000-06-01 00:00:00")))
        .select(col("o_custkey")), col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy(col("cntry"))
      .agg(count(lit(1)).as("numcust"), sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
    Lifecycle.released(out, pool)
  }

  /** Fuzzy (edit-distance <= 1) record linkage via DELETION-NEIGHBORHOOD
    * blocking — the scale-safe form of "join on typo'd keys": every key
    * emits itself plus its single-character deletions; any two strings
    * within edit distance 1 (insert, delete, or substitute) provably share
    * a variant, so candidates come from ONE equi-join on the variant and a
    * bounded `levenshtein` verifies them — never an all-pairs distance
    * join. The dirty side is constructed from `customer` (the rel_*
    * pattern): one deterministic deletion per key for custkey % 3 = 0, the
    * exact name for % 3 = 1, and a 3-character mutilation for % 3 = 2 (the
    * guaranteed-unmatched negative arm). The synthetic names are
    * ADVERSARIAL for this operator — they differ only in digit positions,
    * so distance-1 neighbors abound and multi-matches are real; the
    * blocking stays lossless because substitution pairs share the deletion
    * at the substituted position.
    *
    * Scale shape: variant fan-out is length+1 rows per key (linear), the
    * join is a plain equi-join on the variant string, verification touches
    * only candidates. A boilerplate-hot variant key behaves like an LSH
    * hot band; unlike the winnow cap there is NO lossy dial here because
    * distance-1 completeness is the contract — shard adversarial key
    * distributions upstream instead.
    */
  def fuzzyJoin(s: SparkSession, dir: String): DataFrame = {
    val p = "CAST(1 + c_custkey % length(c_name) AS INT)"
    val dirty = Tables(s, dir, "customer").selectExpr(
      "c_custkey AS dirty_id",
      s"""CASE
         |  WHEN c_custkey % 3 = 0 THEN
         |    concat(substring(c_name, 1, $p - 1), substring(c_name, $p + 1))
         |  WHEN c_custkey % 3 = 1 THEN c_name
         |  ELSE substring(concat(substring(c_name, 1, $p - 1), substring(c_name, $p + 1)), 3)
         |END AS name_dirty""".stripMargin)
    def variants(c: String) =
      s"concat(array($c), transform(sequence(1, length($c)), " +
        s"i -> concat(substring($c, 1, i - 1), substring($c, i + 1))))"
    // candidates carry only the two ids through the hot-block join and the
    // dedup (names rejoin after), and equal-variant pairs with length
    // difference 2 (deletion-vs-deletion of different strings) are pruned
    // ON the join — both shrink what levenshtein and the distinct touch.
    // The join key is xxhash64(variant), NOT the variant string: the
    // deletion-neighborhood fan-out is length+1 rows per key, so hashing
    // before the exchange shrinks the shuffled key bytes ~3x (8-byte long
    // vs the name-sized string) and hash-partitions evenly (guide §2.3).
    // Exactness is untouched: every true distance<=1 pair shares a REAL
    // variant — hence its hash — so candidates via hash are a superset of
    // candidates via string, and the levenshtein <= 1 verify below is what
    // defines the result either way (a 64-bit collision only adds a
    // candidate the verify rejects).
    val cv = Tables(s, dir, "customer")
      .selectExpr("c_custkey", "length(c_name) AS lc", s"explode(${variants("c_name")}) AS v")
      .selectExpr("c_custkey", "lc", "xxhash64(v) AS vh")
    val dv = dirty.selectExpr("dirty_id", "length(name_dirty) AS ld",
      s"explode(${variants("name_dirty")}) AS v")
      .selectExpr("dirty_id", "ld", "xxhash64(v) AS vh")
    val cand = dv.join(cv, dv("vh") === cv("vh") && abs(col("ld") - col("lc")) <= 1)
      .select(col("dirty_id"), col("c_custkey"))
      .distinct()
    cand
      .join(dirty, Seq("dirty_id"))
      .join(Tables(s, dir, "customer").select(col("c_custkey"), col("c_name")), Seq("c_custkey"))
      .filter(levenshtein(col("name_dirty"), col("c_name")) <= 1)
      .selectExpr("dirty_id", "c_custkey", "name_dirty",
        "CAST(levenshtein(name_dirty, c_name) AS INT) AS distance")
  }

  // --- subqueries -------------------------------------------------------

  def inSubquery(s: SparkSession, dir: String): DataFrame = {
    val building = Tables(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    Tables(s, dir, "orders")
      .join(building, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("cnt"))
  }

  /** Scalar subquery: customers above the global average balance. The average
    * is computed with an exact decimal sum so both engines compare against
    * the identical double.
    */
  def scalarSubquery(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables(s, dir, "customer")
    val avgBal = cust.agg(
      (sum(dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("avg_bal"))
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_rich"))
  }

  def existsCorrelated(s: SparkSession, dir: String): DataFrame = {
    val supp = Tables(s, dir, "supplier")
    val bigLines = Tables(s, dir, "lineitem").filter(col("l_quantity") >= 49)
    supp.join(bigLines, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
  }

  // --- windows ----------------------------------------------------------

  def windowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables(s, dir, "orders")
      .withColumn("rk", rank().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"), col("rk"))
  }

  def windowRunning(s: SparkSession, dir: String): DataFrame = {
    // the synthetic lineitem has duplicate (orderkey, linenumber) pairs, so
    // the ordering needs full tiebreakers to be engine-independent
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_quantity"), col("l_partkey"), col("l_suppkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        sum(dec(col("l_quantity"))).over(w).cast("double").as("run_qty"))
  }

  def windowLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        row_number().over(w).as("rn"))
  }

  def windowFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-2, Window.currentRow)
    Tables(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        sum(dec(col("o_totalprice"))).over(w).cast("double").as("moving_sum"),
        count(lit(1)).over(w).as("n_in_frame"))
  }

  /** Time-based RANGE frame (the "last 10 minutes per key" sliding
    * aggregate): frame membership is defined by the ORDER-BY VALUE range,
    * not row offsets — ties share a frame, so no tiebreaker is needed for
    * determinism. Ordering on integer epoch-seconds keeps the frame
    * arithmetic exact and engine-portable (timestamp→long truncation is
    * floor-of-microseconds on both engines).
    */
  def windowRange(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"),
        col("ts").cast("long").as("tsec"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("tsec"))
      .rangeBetween(-600, Window.currentRow)
    ev.select(col("event_id"), col("user_id"),
      sum(dec(col("value"))).over(w).cast("double").as("sum_10min"),
      count(lit(1)).over(w).as("n_10min"))
  }

  /** Funnel progression per user (view → click → purchase in event order):
    * the per-entity sequence-analytics shape. ONE shuffle groups each
    * user's events; a deterministic ordered fold walks the sequence with an
    * integer state machine — per-user state is one int, the event list
    * stays inside the executor row (bounded by events/user, the same dial
    * as sessionization), and the final stage histogram is
    * cardinality-bounded. Ordering ties break on the unique event_id;
    * epoch-seconds truncation matches the oracle's integer division.
    */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .filter(col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-04 00:00:00")))
      .select(col("user_id"), col("ts").cast("long").as("tsec"),
        col("event_id"), col("event_type"))
    ev.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("tsec"), col("event_id"), col("event_type"))))
        .as("evs"))
      .selectExpr("user_id",
        """aggregate(transform(evs, e -> e.event_type), 0, (acc, x) -> CASE
          |  WHEN acc = 0 AND x = 'view' THEN 1
          |  WHEN acc = 1 AND x = 'click' THEN 2
          |  WHEN acc = 2 AND x = 'purchase' THEN 3
          |  ELSE acc END) AS stage""".stripMargin)
      .groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
  }

  /** Cohort retention (weekly): per cohort week, how many of its users are
    * still active k weeks later — the other canonical events-at-scale
    * report. Distinct (user, week) activity first (partial-aggregable, one
    * shuffle), cohort = each user's first week, then one equi-join and a
    * cardinality-bounded (cohort x offset) aggregate; after the distinct,
    * count(1) IS the distinct-user count — no Expand rewrite. Week indexing
    * is pure integer arithmetic off a literal epoch (non-negative, so
    * truncation and floor division agree across engines).
    */
  def retention(s: SparkSession, dir: String): DataFrame = {
    val wk = Tables(s, dir, "events")
      .selectExpr("user_id",
        "CAST((CAST(ts AS LONG) - 1704067200) DIV 604800 AS INT) AS week")
      .distinct()
    val cohort = wk.groupBy(col("user_id")).agg(min(col("week")).as("cohort"))
    wk.join(cohort, Seq("user_id"))
      .groupBy(col("cohort"), (col("week") - col("cohort")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Merge overlapping per-user activity intervals (gaps-and-islands): each
    * event opens the interval [s, s + 60 + floor(|value|*60)]; a new island
    * starts when an interval begins strictly after every earlier interval's
    * end (running max over preceding ends). The coalesce step behind
    * availability windows, outage merging, and session repair. ONE shuffle
    * on the entity key — both windows and the final per-island aggregate
    * reuse the same partitioning. floor() before the long cast keeps the
    * double conversion identical across engines (Spark truncates toward
    * zero, DuckDB rounds half-even).
    */
  def intervalMerge(s: SparkSession, dir: String): DataFrame =
    intervalMergeFrom(Tables(s, dir, "events")
      .selectExpr("user_id", "event_id", "CAST(ts AS LONG) AS s0",
        "CAST(ts AS LONG) + 60 + CAST(floor(abs(value) * 60) AS LONG) AS e0"))

  /** The islands kernel over any frame with (user_id, event_id, s0, e0):
    * touching intervals (next start == previous end) merge; a strictly
    * later start opens a new island.
    */
  def intervalMergeFrom(iv: DataFrame): DataFrame = {
    val ord = Window.partitionBy(col("user_id")).orderBy(col("s0"), col("event_id"))
    iv.withColumn("max_e_prev",
        max(col("e0")).over(ord.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("is_new",
        (col("max_e_prev").isNull || col("s0") > col("max_e_prev")).cast("int"))
      .withColumn("island", sum(col("is_new")).over(ord))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("s0")).as("start_s"), max(col("e0")).as("end_s"),
        count(lit(1)).as("n_events"))
  }

  /** Daily new users + running distinct-user count — the growth dashboard.
    * A distinct count over an expanding window is not directly computable
    * at scale (no distinct window aggregates); the scalable identity is
    * first-seen aggregation (hourly grain): cumulative distinct users at hour h = count of
    * users whose FIRST hour <= h. One user-keyed partial+final aggregate,
    * one cardinality-bounded (days) table, and the running sum's
    * unpartitioned window only ever sees that bounded table — never the
    * fact stream.
    */
  def cumulativeDistinct(s: SparkSession, dir: String): DataFrame = {
    val firstDay = Tables(s, dir, "events")
      .selectExpr("user_id", "CAST(ts AS LONG) DIV 3600 AS hour")
      .groupBy(col("user_id")).agg(min(col("hour")).as("first_hour"))
    firstDay.groupBy(col("first_hour").as("hour"))
      .agg(count(lit(1)).as("new_users"))
      .withColumn("cum_users",
        sum(col("new_users")).over(Window.orderBy(col("hour"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Ordered string aggregation (LISTAGG ... WITHIN GROUP): the report-
    * formatting aggregate. Spark 4's native `listagg` is a partial-
    * aggregable Collect — order is imposed at the final merge, so the
    * per-group result is deterministic without a window sort. The dimension
    * join is broadcast (25-row nation).
    */
  def stringAgg(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "supplier")
      .join(broadcast(Tables(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(expr("listagg(s_name, '|') WITHIN GROUP (ORDER BY s_name)").as("suppliers"),
        count(lit(1)).as("n_suppliers"))

  /** Exact per-group mode with a deterministic tiebreak (highest count,
    * then smallest value). Two bounded aggregations: the (group, value)
    * count table is partial-aggregated on the first shuffle, and the winner
    * row_number window runs over that cardinality-bounded table — never
    * over the fact table.
    */
  def modeAgg(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("cnt").desc, col("l_quantity").asc)
    counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("l_quantity").cast("double").as("mode_qty"),
        col("cnt").as("mode_n"))
  }

  /** Correlated LATERAL subquery with LIMIT — top-2 lineitems per order
    * expressed as the SQL-standard lateral join; Catalyst decorrelates the
    * per-row LIMIT into a window rewrite (no nested-loop execution), which
    * is exactly the plan a hand-written row_number query produces.
    */
  def lateralTopN(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "orders").createOrReplaceTempView("lat_orders")
    Tables(s, dir, "lineitem").createOrReplaceTempView("lat_lineitem")
    s.sql(
      """SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
        |FROM (SELECT o_orderkey FROM lat_orders WHERE o_orderkey <= 400) o,
        |LATERAL (
        |  SELECT l_linenumber, l_extendedprice FROM lat_lineitem
        |  WHERE l_orderkey = o.o_orderkey
        |  ORDER BY l_extendedprice DESC, l_linenumber ASC LIMIT 2) l""".stripMargin)
  }

  // --- sort / limit / top-k --------------------------------------------

  def topK(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  // --- set operations ---------------------------------------------------

  def unionAll(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer")
      .select(col("c_nationkey").as("nationkey"), lit("customer").as("side"))
    val sup = Tables(s, dir, "supplier")
      .select(col("s_nationkey").as("nationkey"), lit("supplier").as("side"))
    c.unionAll(sup).groupBy(col("nationkey"), col("side")).agg(count(lit(1)).as("cnt"))
  }

  def intersectKeys(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .intersect(Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))

  def exceptKeys(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .except(Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))

  /** Multiset semantics: per-occurrence set ops. */
  def exceptAllKeys(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .exceptAll(Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .groupBy(col("nationkey")).agg(count(lit(1)).as("cnt"))

  def intersectAllKeys(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .intersectAll(Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .groupBy(col("nationkey")).agg(count(lit(1)).as("cnt"))

  // --- scalar functions -------------------------------------------------

  /** Edit-distance surface — the fuzzy-matching scalar entity resolution
    * runs at scale: a constructed dirty twin per customer (substitution for
    * keys % 3 = 0, deletion for % 3 = 1, clean otherwise) scored with
    * `levenshtein`, plus the BOUNDED form `levenshtein(a, b, threshold)`
    * (−1 beyond the bound) — the production trick that turns the O(|a|·|b|)
    * DP into an O(threshold·|a|) band and lets a fuzzy join bail out of
    * hopeless pairs early. The oracle re-derives the bound with a CASE over
    * DuckDB's unbounded levenshtein. Aggregated to the (d, d_bounded)
    * histogram so the entry pins every branch (0, 1, and beyond-bound).
    */
  def editDistance(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer")
      .selectExpr("c_custkey", "c_name",
        """CASE WHEN c_custkey % 3 = 0 THEN concat(substr(c_name, 1, 10), 'X', substr(c_name, 12))
          |     WHEN c_custkey % 3 = 1 THEN concat(substr(c_name, 1, 10), substr(c_name, 12))
          |     ELSE c_name END AS dirty""".stripMargin)
      .selectExpr(
        "CAST(levenshtein(c_name, dirty) AS INT) AS d",
        "CAST(levenshtein(c_name, reverse(c_name), 3) AS INT) AS d_rev_bounded")
      .groupBy(col("d"), col("d_rev_bounded"))
      .agg(count(lit(1)).as("n"))

  def stringFuncs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "part").select(
      col("p_partkey"),
      upper(substring(col("p_name"), 1, 10)).as("up10"),
      length(col("p_name")).as("name_len"),
      replace(col("p_brand"), lit("#"), lit("_")).as("brand_clean"),
      concat(lower(col("p_type")), lit(":"), col("p_brand")).as("type_brand"),
      instr(col("p_name"), "a").as("first_a"),
      trim(col("p_name")).as("trimmed"))

  def dateFuncs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("o_year"),
      month(col("o_orderdate")).as("o_month"),
      dayofmonth(col("o_orderdate")).as("o_day"),
      date_trunc("month", col("o_orderdate")).as("month_start"),
      datediff(to_date(col("o_orderdate")), lit(java.sql.Date.valueOf("1995-01-01"))).as("days_since"))

  def mathFuncs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer").select(
      col("c_custkey"),
      abs(col("c_acctbal")).as("abs_bal"),
      floor(col("c_acctbal")).as("floor_bal"),
      ceil(col("c_acctbal")).as("ceil_bal"),
      round(dec(col("c_acctbal")), 1).cast("double").as("round_bal"),
      sqrt(abs(col("c_acctbal"))).as("sqrt_bal"),
      (col("c_custkey") % 7).as("mod7"))

  def caseExpr(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer")
      .select(
        when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 5000, "low")
          .otherwise("high").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Sample variance/stddev derived from exact decimal sums — identical
    * doubles on both engines regardless of accumulation order.
    */
  def aggVariance(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(
        sum(dec(col("c_acctbal"))).cast("double").as("s1"),
        sum(dec(col("c_acctbal")) * dec(col("c_acctbal"))).cast("double").as("s2"),
        count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select(col("c_nationkey"), col("n"),
        ((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)).as("var_samp"))

  /** Exact interpolated percentiles (same definition as DuckDB's
    * quantile_cont: index (n-1)*p on the sorted values).
    */
  def percentiles(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        expr("percentile(l_extendedprice, 0.25)").as("p25_price"))

  /** Sketch aggregates — the 100 TB substitutes for exact distinct counts
    * and quantiles. An exact `countDistinct` rewrites into an Expand +
    * second shuffle; a sketch is one partial+final pass with constant-size
    * state, and (for HLL) the per-group sketches MERGE — the pre-aggregated
    * dashboard-table pattern. A sketch estimate is engine-specific, so the
    * gate can't hash-compare it; instead each query outputs the EXACT value
    * (DuckDB-checkable) plus an accuracy flag the estimate must satisfy —
    * the oracle pins the flag at 1, so a drifting sketch fails the gate.
    */
  def approxDistinct(s: SparkSession, dir: String): DataFrame = {
    // exact and sketch in SEPARATE aggregations, then a broadcast join of
    // two group-cardinality frames: a mixed distinct+approx agg goes
    // through the Expand rewrite and runs the sketch update over DOUBLED
    // rows (measured 3.3 s vs 0.9 s for this shape at sf0.1). The sketch
    // arm uses DataSketches hll_sketch_agg (lgK 14, rsd ~0.8%) — measured
    // 3.5x faster than approx_count_distinct's HLL++ at rsd 0.01 — and is
    // the ONLY pass a 100 TB run needs; the exact arm exists for the gate.
    val li = Tables(s, dir, "lineitem")
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_exact"))
    val est = li.groupBy(col("l_returnflag"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 14))").as("n_approx"))
    exact.join(broadcast(est), Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n_exact"),
        when(abs(col("n_approx") - col("n_exact")) * 20 <= col("n_exact"), 1)
          .otherwise(0).cast("int").as("within_5pct"))
  }

  /** Approximate heavy hitters (`approx_top_k` — the DataSketches
    * frequent-items sketch): the 100 TB path finds the most frequent values
    * in ONE pass with bounded memory (maxItemsTracked counters per partial
    * aggregate, mergeable map-side) — no full groupBy of a high-cardinality
    * key. The exact arm (count + tie-broken TakeOrdered) exists for the
    * gate; the flag pins the sketch's top-5 COUNT multiset against the
    * exact one (near-uniform counts make item identity tie-dependent —
    * counts are not).
    */
  def heavyHitters(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val exact5 = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("l_partkey")).limit(5)
    val exactCounts = exact5
      .agg(sort_array(collect_list(col("cnt")), asc = false).as("exact_counts"))
    val sketchCounts = li
      .agg(expr("approx_top_k(l_partkey, 5, 65536)").as("tk"))
      .select(sort_array(expr("transform(tk, x -> x.count)"), asc = false)
        .as("approx_counts"))
    val flag = exactCounts.crossJoin(broadcast(sketchCounts))
      .select(when(col("exact_counts") === col("approx_counts"), 1)
        .otherwise(0).cast("int").as("sketch_counts_match"))
    exact5.crossJoin(broadcast(flag))
  }

  /** Mergeable HLL sketches (Apache DataSketches via `hll_sketch_agg`):
    * per-group sketches unioned into a global estimate — at scale the
    * per-day/per-source sketch table is tiny and re-aggregates along any
    * rollup without touching the fact table again.
    */
  def sketchUnion(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables(s, dir, "orders")
    val perStatus = orders
      .groupBy(col("o_orderstatus"))
      .agg(expr("hll_sketch_agg(o_custkey, 14)").as("sk"))
    val global = perStatus
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .crossJoin(broadcast(orders.agg(
        countDistinct(col("o_custkey")).as("n_exact"))))
    global.select(col("n_exact"),
      when(abs(col("est") - col("n_exact")) * 20 <= col("n_exact"), 1)
        .otherwise(0).cast("int").as("within_5pct"))
  }

  /** Quantile sketch: `approx_percentile` (Greenwald-Khanna style) with a
    * RANK-tolerance gate — the estimate must land within ±2% of the true
    * median's rank inside its group (value-distance is meaningless for
    * skewed distributions; rank is the sketch's actual contract).
    */
  def approxQuantile(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val approx = li.groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("p50_est"))
    li.join(broadcast(approx), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_extendedprice") <= col("p50_est"), 1L).otherwise(0L)).as("n_le"))
      .select(col("l_returnflag"), col("n"),
        when(abs(col("n_le") * 2 - col("n")) * 50 <= col("n") * 2, 1)
          .otherwise(0).cast("int").as("rank_within_2pct"))
  }

  def jsonFuncs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_extracted"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType))))
          .getField("k").as("k_struct"))

  def regexpFuncs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "part")
      .select(col("p_partkey"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
        regexp_replace(col("p_type"), "[aeiou]", "").as("devoweled"),
        col("p_name").rlike("^[a-m]").cast("int").as("starts_early"))

  def nullFuncs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer")
      .select(col("c_custkey"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("SUPPRESSED")).as("seg"),
        greatest(col("c_acctbal"), lit(0.0)).as("pos_bal"),
        least(col("c_acctbal"), lit(1000.0)).as("capped_bal"),
        col("c_acctbal").isNull.cast("int").as("is_null"))

  // --- pivot / conditional aggregation ---------------------------------

  def pivotEvents(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0)

  // --- sessionization (event analytics) --------------------------------

  /** Gap-based sessionization: a new session starts after >30 min idle. */
  /** Exponential smoothing (EWMA, alpha = 1/2) per key: the standard
    * time-series noise filter, folded left-to-right over the key's ordered
    * sequence — `y_t = (y_{t-1} + x_t) / 2` seeded with 0. Spark has no
    * recursive window, so the per-key sequence is collected and folded in
    * one partial-aggregated groupBy — bounded groups (an order's lines),
    * the same shape as the interval-merge fold. Determinism: halving is
    * EXACT in IEEE doubles and the fold order is pinned by the full sort
    * key (linenumber, quantity — the testdata has duplicate linenumbers;
    * equal (ln, qty) twins fold to the same value either way), so DuckDB's
    * `list_reduce(list_prepend(0.0, list(... ORDER BY ...)))` reproduces
    * the result bit-for-bit.
    */
  def ewma(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"),
        expr("aggregate(transform(array_sort(collect_list(struct(l_linenumber, l_quantity)))," +
          " x -> CAST(x.l_quantity AS DOUBLE)), CAST(0 AS DOUBLE), (acc, x) -> (acc + x) / 2)")
          .as("ewma"))

  /** Holt double exponential smoothing (level + trend) per key — [[ewma]]'s
    * trend-aware upgrade and [[forecastSeasonal]]'s short-horizon
    * complement: `l' = (x + (l + t))/2, t' = ((l' − l) + t)/2` with
    * α = β = ½, initialized at (first observation, 0). Every operation is
    * an IEEE add/subtract/halving in a pinned left-to-right fold, so the
    * states are exact dyadic rationals and DuckDB's `list_reduce` twin
    * reproduces them bit-for-bit — the same determinism contract as the
    * EWMA fold. One shuffle; per-key fold state is two doubles. The
    * one-step forecast is `level + trend`.
    */
  def holt(s: SparkSession, dir: String): DataFrame = {
    val fold = "aggregate(" +
      "transform(array_sort(collect_list(struct(l_linenumber, l_quantity))), " +
      "x -> CAST(x.l_quantity AS DOUBLE)), " +
      "named_struct('l', CAST(NULL AS DOUBLE), 't', CAST(0 AS DOUBLE)), " +
      "(a, x) -> CASE WHEN a.l IS NULL THEN named_struct('l', x, 't', CAST(0 AS DOUBLE)) " +
      "ELSE named_struct('l', (x + (a.l + a.t)) / 2, " +
      "'t', (((x + (a.l + a.t)) / 2 - a.l) + a.t) / 2) END)"
    Tables(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("key"))
      .agg(count(lit(1)).as("n"), expr(fold).as("st"))
      .selectExpr("key", "n", "st.l AS level", "st.t AS trend",
        "st.l + st.t AS forecast")
  }

  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables(s, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1).otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
  }

  /** Per-session rows from the native merging `session_window` aggregation
    * (the operator [[graft.streaming.StreamingSessionize]] runs on streams),
    * exercised in BATCH mode and oracle-gated: the DuckDB twin re-derives
    * sessions with the lag/cumulative-sum decomposition under the shared
    * merge-on-touch boundary (only diff > gap opens a session — pinned in
    * StreamingSessionizeSpec), so the two formulations are proven
    * value-identical, not just spec-sampled. Complements [[sessionize]],
    * which reports per-user session counts; this emits the sessions
    * themselves. One shuffle on user_id.
    */
  def sessionWindow(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingSessionize.sessions(Tables(s, dir, "events"))

  /** Seasonal-mean forecasting baseline: monthly revenue per order
    * priority, with each month's forecast = the mean of all PRIOR
    * same-calendar-month revenues (the expanding seasonal window every
    * forecasting system ships as its sanity baseline — next January is
    * predicted by past Januaries). Determinism: monthly revenue is a
    * decimal-exact sum, the history is a decimal-exact windowed sum, and
    * the mean is ONE double division at the end — no float accumulation
    * anywhere. The seasonal window partitions by (priority,
    * month-of-year): per-key state is bounded by years-of-history, and the
    * whole query is one shuffle on the cardinality-bounded monthly frame —
    * the fact scan aggregates first.
    */
  def forecastSeasonal(s: SparkSession, dir: String): DataFrame = {
    val m = Tables(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("priority"),
        date_trunc("month", col("o_orderdate")).as("month"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val w = Window
      .partitionBy(col("priority"), month(col("month")))
      .orderBy(col("month"))
      .rowsBetween(Window.unboundedPreceding, -1)
    m.withColumn("hist_sum", sum(col("rev")).over(w))
      .withColumn("hist_n", count(col("rev")).over(w))
      .filter(col("hist_n") > 0)
      .select(col("priority"), col("month"),
        col("rev").cast("double").as("revenue"),
        (col("hist_sum").cast("double") / col("hist_n")).as("forecast"))
  }

  /** Month-over-month and year-over-year growth of monthly revenue — the
    * standard KPI trend report. The fact table aggregates FIRST (decimal-
    * exact sums); the lag window then runs on the cardinality-bounded
    * monthly frame (one row per month — a bounded statistic, so its single
    * ordered partition is fine at any corpus scale, the q_skyline carry-
    * frame argument). Growth percentages are one double division each over
    * exact decimal differences.
    */
  def growth(s: SparkSession, dir: String): DataFrame = {
    val m = Tables(s, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val w = Window.orderBy(col("month"))
    m.withColumn("prev", lag(col("rev"), 1).over(w))
      .withColumn("yago", lag(col("rev"), 12).over(w))
      .select(col("month"), col("rev").cast("double").as("revenue"),
        (expr("CAST(rev - prev AS DOUBLE)") / col("prev").cast("double")).as("mom_pct"),
        (expr("CAST(rev - yago AS DOUBLE)") / col("yago").cast("double")).as("yoy_pct"))
  }

  /** Cohort revenue matrix: customers grouped by their FIRST-order month,
    * each cohort tracked across months-since-acquisition with active-count
    * and revenue — the LTV/retention grid behind every subscription
    * dashboard (q_retention's weekly event twin, here on the money).
    * Month arithmetic is pure integers (`year*12 + month` — no interval
    * types to disagree about), revenue decimal-exact with one final cast.
    * Shape: one groupBy for first-order months, one shuffle join back on
    * the customer key (both sides customer-cardinality), one
    * cardinality-bounded (cohorts x ages) aggregate.
    */
  def cohort(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
      .select(col("o_custkey").as("custkey"), col("o_totalprice"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("m"))
    val first = o.groupBy(col("custkey")).agg(min(col("m")).as("cm"))
    o.join(first, "custkey")
      .groupBy(expr("CAST((cm - 1) div 12 AS BIGINT)").as("cohort_year"),
        expr("CAST((cm - 1) % 12 + 1 AS BIGINT)").as("cohort_month"),
        (col("m") - col("cm")).cast("bigint").as("age_months"))
      .agg(countDistinct(col("custkey")).as("n_active"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
  }

  /** Robust per-key anomaly detection: MAD (median-absolute-deviation)
    * z-scores — the outlier flag that survives the outliers themselves
    * (mean/stddev are dragged by the very anomalies they should flag; the
    * median pair is breakdown-resistant to 50 % contamination). Flags
    * `|x − med| > 3·1.4826·mad` (1.4826 rescales MAD to σ under normality).
    *
    * Determinism-by-construction: the median is the explicit LOWER median —
    * the row at rank `(n+1) div 2` in (value, event_id) order — an
    * integer-indexed ordered statistic with zero float interpolation, so
    * Spark and DuckDB agree bit-for-bit (builtin `median`/`percentile`
    * interpolate even-count groups with DIFFERENT float expressions:
    * `a+(b−a)·0.5` vs `(a+b)/2` — ULP-divergent). Both medians and the
    * deviation pass share ONE per-key shuffle chain; per-key state is
    * window-local — no global sort, no collect.
    */
  def anomalyMad(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events").select(col("user_id"), col("event_id"), col("value"))
    val wAll = Window.partitionBy(col("user_id"))
    def lowerMedian(df: DataFrame, v: String, out: String): DataFrame = {
      val w = Window.partitionBy(col("user_id")).orderBy(col(v), col("event_id"))
      df.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wAll))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("user_id"), col(v).as(out))
    }
    val med = lowerMedian(ev, "value", "med")
    val dev = ev.join(med, "user_id")
      .withColumn("dev", abs(col("value") - col("med")))
    val mad = lowerMedian(dev, "dev", "mad")
    dev.join(mad, "user_id")
      .groupBy(col("user_id"), col("med"), col("mad"))
      .agg(sum(when(col("dev") > (lit(3.0) * lit(1.4826)) * col("mad"), 1)
          .otherwise(0)).cast("bigint").as("n_anomalies"),
        count(lit(1)).as("n_events"))
  }

  /** Partition-parallel exact global rank: range-partition on the
    * (group, order) key, `row_number` WITHIN each physical partition, then
    * the per-(group, partition) row counts — a bounded frame, one row per
    * task — carry cumulative offsets back by broadcast join. The result is
    * the exact rank a single-partition window would give, with no task ever
    * holding more than its range slice (the q_skyline boundary-carry
    * discipline generalized from running-min to rank). `orderCols` must end
    * in a unique tiebreak: ranks are then determined by the total order
    * alone, so the (sampled) range boundaries cannot affect the result.
    */
  private def parallelRank(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[String], rankName: String): DataFrame = {
    val keys = (groupCols ++ orderCols).map(col)
    val ranged = df.repartitionByRange(keys: _*)
      .withColumn("__pid", spark_partition_id())
    val localW = Window
      .partitionBy(groupCols.map(col) :+ col("__pid"): _*)
      .orderBy(orderCols.map(col): _*)
    val local = ranged.withColumn("__rn", row_number().over(localW))
    // one row per (group, partition): the offset window is bounded by the
    // task count, same shape as q_skyline's per-partition carry frame
    val offW = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = local
      .groupBy(groupCols.map(col) :+ col("__pid"): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(offW), lit(0L)))
      .select(groupCols.map(col) :+ col("__pid") :+ col("__off"): _*)
    local.join(broadcast(offs), groupCols :+ "__pid")
      .withColumn(rankName, col("__off") + col("__rn"))
      .drop("__pid", "__rn", "__off")
  }

  /** Event-type transition matrix (first-order Markov estimate): for every
    * (state, next-state) pair, the transition count and probability from
    * the per-user event sequences — the session-flow / journey-mining
    * primitive. One shuffle on user_id for the lead, then a
    * cardinality-bounded groupBy (|event_type|² rows at most); the
    * probability is exact-integer counts with ONE final division.
    */
  def transitionMatrix(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val c = Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    val tot = c.groupBy(col("event_type")).agg(sum(col("n")).as("tot"))
    c.join(broadcast(tot), "event_type")
      .select(col("event_type"), col("next_type"), col("n"),
        (col("n").cast("double") / col("tot").cast("double")).as("prob"))
  }

  /** RFM customer segmentation (recency / frequency / monetary quintiles):
    * the classic CRM scoring — each customer ranked on the three metrics,
    * quintile scores 1–5 assigned by the explicit rank formula
    * `((rank−1)·5) div n + 1` (spelled out rather than `ntile` so both
    * engines compute the identical front-loaded bucketing from first
    * principles). Every ranking runs through [[parallelRank]] — exact
    * global quintiles with NO single-partition sort, the thing a naive
    * `ntile() OVER (ORDER BY …)` cannot avoid. Monetary sums are
    * decimal-exact; ranks and scores are pure integers.
    */
  def rfm(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val agg = Tables(s, dir, "orders")
      .groupBy(col("o_custkey").as("custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("monetary"))
      .persist(StorageLevel.MEMORY_AND_DISK) // three rank passes consume it
    // materialize the barrier BEFORE the rank passes: the three range
    // exchanges submit their boundary-sampling jobs concurrently, and
    // against a lazily-persisted frame each one recomputed the orders
    // aggregation from scratch (measured: 5-8 task-seconds apiece at sf0.1)
    agg.count()
    // integer quintile: ((rank-1)*5) div n + 1 — front-loaded buckets,
    // same assignment ntile makes, but from an explicit integer formula
    def scoreExpr(orderCols: Seq[String], metric: Int): DataFrame =
      parallelRank(agg, Nil, orderCols, "__r")
        .crossJoin(broadcast(agg.agg(count(lit(1)).as("__cnt"))))
        .selectExpr("custkey", s"$metric AS __metric",
          "((__r - 1) * 5) div __cnt + 1 AS __score")
    // the three per-metric score frames fold through ONE union + pivot
    // aggregation (each custkey appears exactly once per metric) instead of
    // a chain of three shuffled joins — 3 join exchanges -> 1 groupBy
    // exchange on the same key
    val scores = scoreExpr(Seq("last_order", "custkey"), 1)
      .unionAll(scoreExpr(Seq("frequency", "custkey"), 2))
      .unionAll(scoreExpr(Seq("monetary", "custkey"), 3))
      .groupBy(col("custkey"))
      .agg(max(when(col("__metric") === 1, col("__score"))).as("r_score"),
        max(when(col("__metric") === 2, col("__score"))).as("f_score"),
        max(when(col("__metric") === 3, col("__score"))).as("m_score"))
    val out = agg.select(col("custkey"), col("monetary"))
      .join(scores, "custkey")
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("monetary")).cast("double").as("total_monetary"))
    Lifecycle.released(out, agg)
  }

  /** Revenue-concentration (Gini coefficient) per market segment: how
    * unequally customer spend is distributed — the skew dashboard before
    * salting/partitioning decisions, and the standard inequality statistic.
    * Uses the rank identity G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ) on
    * spend sorted ascending: Σ i·xᵢ and Σ xᵢ are decimal-exact (rank is an
    * integer, spend a decimal), so the ONLY IEEE arithmetic is the final
    * division — deterministic across engines. Ranks come from
    * [[parallelRank]] (per-segment, range-parallel — no per-segment
    * single-task sort even when one segment holds most of the corpus).
    */
  def gini(s: SparkSession, dir: String): DataFrame = {
    val spend = Tables(s, dir, "orders")
      .join(Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment").as("segment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("segment"), col("o_custkey").as("custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
    parallelRank(spend, Seq("segment"), Seq("spend", "custkey"), "i")
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("spend")).as("total_dec"),
        sum(col("i") * col("spend")).as("isum"))
      .select(col("segment"), col("n_customers"),
        col("total_dec").cast("double").as("total_spend"),
        ((lit(2) * col("isum") - (col("n_customers") + 1) * col("total_dec")).cast("double")
          / (col("n_customers").cast("double") * col("total_dec").cast("double"))).as("gini"))
  }

  /** Slowly-changing-dimension (type 2) build from an event changelog: per
    * entity, consecutive runs of the same attribute value collapse to one
    * version row with [eff_from, eff_to) validity (NULL eff_to = current
    * version) — the standard warehouse history-table build. One shuffle on
    * the entity key; the change-detect lag, interval-closing lead, and
    * version row_number all share the same (partition, ordering), so the
    * plan carries a single Exchange and the sort is reused through the
    * intervening Filter. Ordering is (ts, event_id) — unique, the house
    * tiebreak rule. At 100 TB the history table is entity-partitioned,
    * which is exactly this shuffle; no corpus-wide window exists.
    */
  def scd2(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type").as("attr"))
      .withColumn("prev_attr", lag(col("attr"), 1).over(w))
      .filter(col("prev_attr").isNull || col("attr") =!= col("prev_attr"))
      .withColumn("eff_to", lead(col("ts"), 1).over(w))
      .withColumn("version", row_number().over(w))
      .select(col("user_id"), col("attr"), col("ts").as("eff_from"),
        col("eff_to"), col("version"))
  }

  /** Time-spine gap filling: per-user hourly activity counts joined against
    * the dense hour spine between that user's first and last active hour,
    * missing hours filled with an explicit zero + gap flag and a
    * forward-filled `last_active_h` (the observation-carried-forward shape
    * sensor/metric pipelines run before any windowed model). The spine is a
    * per-row generator off the cardinality-bounded (user, min, max)
    * aggregate — never a cross join against a calendar table — and the
    * spine join reuses the hourly aggregate's (user_id, h) partitioning.
    * All values are exact integers (hour index, counts), so the fill is
    * bit-identical across engines.
    */
  def gapFill(s: SparkSession, dir: String, maxUser: Int = 30): DataFrame = {
    val hourly = Tables(s, dir, "events")
      .filter(col("user_id") < maxUser)
      .selectExpr("user_id", "CAST(ts AS LONG) div 3600 AS h")
      .groupBy(col("user_id"), col("h")).agg(count(lit(1)).as("n_events"))
    val spine = hourly.groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .selectExpr("user_id", "explode(sequence(h0, h1)) AS h")
    val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq("user_id", "h"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
      .withColumn("is_gap", when(col("n_events") === 0L, 1).otherwise(0))
      .withColumn("last_active_h",
        last(when(col("n_events") > 0L, col("h")), ignoreNulls = true).over(w))
      .select(col("user_id"), col("h"), col("n_events"), col("is_gap"),
        col("last_active_h"))
  }

  /** Unpivot (melt): wide numeric measures to (key, measure, value) rows via
    * `stack` — codegen'd row expansion, no shuffle, the inverse of pivot.
    */
  def unpivot(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "part").selectExpr("p_partkey",
      "stack(2, 'size', CAST(p_size AS DOUBLE), 'retailprice', p_retailprice) AS (measure, value)")

  /** Distribution window functions: quartile bucket, percent_rank, cume_dist
    * over a fully tiebroken ordering (totalprice, orderkey) — the ratios are
    * exact-int divisions, bit-identical across engines.
    */
  def windowDist(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
  }

  // --- as-of / range joins (time-series surface) -----------------------

  /** As-of join: each event matched to the same user's latest purchase
    * at-or-before its timestamp (inclusive — a purchase event matches
    * itself at lag 0).
    *
    * Spark has no ASOF JOIN operator; the scale path is union-tag +
    * running window, NOT a range join: tag build rows (purchases) and
    * probe rows (all events), sort each user's timeline once, and carry
    * the last build payload forward with `last(ignoreNulls)` over
    * ROWS UNBOUNDED PRECEDING..CURRENT ROW. One shuffle on the key, a
    * per-key sort, zero row amplification — at 100 TB this is a single
    * repartition+sort per side vs. the unbounded candidate explosion of
    * an inequality join. Build rows sort BEFORE probe rows at equal ts
    * (side 0 < 1) for the inclusive match; `p_event_id` asc makes the
    * winner deterministic even if two purchases shared a timestamp.
    */
  def asofJoin(s: SparkSession, dir: String): DataFrame =
    asofFrom(Tables(s, dir, "events"))

  /** The as-of kernel over any frame with (event_id, user_id, event_type,
    * ts, value). Tie rule (pinned by spec on constructed data): a purchase
    * AT the probe's timestamp matches (inclusive), and of several purchases
    * sharing one timestamp the highest event_id wins — the build rows sort
    * before the probe row and `last()` takes the final one.
    */
  def asofFrom(ev: DataFrame): DataFrame = {
    val build = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(0).as("side"),
        lit(null).cast("bigint").as("event_id"), lit(null).cast("string").as("event_type"),
        struct(col("ts").as("p_ts"), col("event_id").as("p_event_id"),
          col("value").as("p_value")).as("pl"))
    val probe = ev.select(col("user_id"), col("ts"), lit(1).as("side"),
      col("event_id"), col("event_type"),
      lit(null).cast("struct<p_ts:timestamp,p_event_id:bigint,p_value:double>").as("pl"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("side").asc, col("pl.p_event_id").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    build.unionByName(probe)
      .withColumn("m", last(col("pl"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .selectExpr("event_id", "user_id", "event_type", "ts",
        "m.p_event_id AS p_event_id", "m.p_value AS p_value",
        "CAST(unix_micros(ts) - unix_micros(m.p_ts) AS BIGINT) AS lag_us")
  }

  /** Nearest-in-time as-of join: each event matched to the temporally
    * CLOSEST purchase in either direction — the sensor-alignment shape
    * ("attach the nearest calibration reading"). Same join-free union-tag
    * machinery as [[asofFrom]], but BOTH directional candidates come off
    * one shuffle and ONE sort (two frames over the same window ordering:
    * running last for at-or-before, running first for strictly-after), then
    * a pure projection picks the smaller distance. Tie rules (spec-pinned):
    * equal distance prefers the backward match; equal-timestamp purchases
    * resolve to max event_id backward (as [[asofFrom]]) and min event_id
    * forward (first in frame order).
    */
  def asofNearest(s: SparkSession, dir: String): DataFrame =
    asofNearestFrom(Tables(s, dir, "events"))

  /** The nearest-as-of kernel over any (event_id, user_id, event_type, ts,
    * value) frame.
    */
  def asofNearestFrom(ev: DataFrame): DataFrame = {
    val build = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(0).as("side"),
        lit(null).cast("bigint").as("event_id"), lit(null).cast("string").as("event_type"),
        struct(col("ts").as("p_ts"), col("event_id").as("p_event_id"),
          col("value").as("p_value")).as("pl"))
    val probe = ev.select(col("user_id"), col("ts"), lit(1).as("side"),
      col("event_id"), col("event_type"),
      lit(null).cast("struct<p_ts:timestamp,p_event_id:bigint,p_value:double>").as("pl"))
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("side").asc, col("pl.p_event_id").asc_nulls_last)
    val wB = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    build.unionByName(probe)
      // both frames in ONE projection: the window extraction then shares a
      // single ordering attribute, so the two Window operators stack on one
      // sort (two withColumns each extract their own `_w0` — two sorts)
      .select(col("*"),
        last(col("pl"), ignoreNulls = true).over(wB).as("mb"),
        first(col("pl"), ignoreNulls = true).over(wF).as("mf"))
      .filter(col("side") === 1)
      .selectExpr("event_id", "user_id", "event_type", "ts",
        "unix_micros(ts) - unix_micros(mb.p_ts) AS lag_b",
        "unix_micros(mf.p_ts) - unix_micros(ts) AS lag_f", "mb", "mf")
      .selectExpr("event_id", "user_id", "event_type",
        "CASE WHEN mb IS NOT NULL AND (mf IS NULL OR lag_b <= lag_f) THEN mb.p_event_id ELSE mf.p_event_id END AS p_event_id",
        "CASE WHEN mb IS NOT NULL AND (mf IS NULL OR lag_b <= lag_f) THEN mb.p_value ELSE mf.p_value END AS p_value",
        "CAST(CASE WHEN mb IS NOT NULL AND (mf IS NULL OR lag_b <= lag_f) THEN lag_b ELSE -lag_f END AS BIGINT) AS lag_us")
  }

  /** Range (interval) join: purchases within 4 h after a click by the same
    * user, aggregated per click.
    *
    * The scale path is interval bucketing: quantize time into windows of
    * the interval length W, join on (user, bucket) with the click exploded
    * into its bucket and the next (a pair whose gap is ≤ W spans at most
    * one boundary, so each qualifying pair meets in EXACTLY one bucket —
    * no dedup pass), then apply the exact range predicate. Turns an
    * inequality join (cartesian-per-key in Spark) into an equi-join:
    * shuffle is 2× the click side, candidates are bounded by per-bucket
    * co-occurrence, and AQE handles hot buckets.
    */
  def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val wUs = 14400L * 1000000L // 4 h in microseconds
    // FLOOR division, exact in int64: `div` truncates toward zero, which
    // breaks the one-bucket invariant for pre-1970 (negative-epoch)
    // timestamps — a pair straddling epoch 0 could land in a bucket the
    // probe never visits and silently drop
    def floorDiv(c: String): String =
      s"($c div ${wUs}L - (CASE WHEN $c % ${wUs}L < 0 THEN 1 ELSE 0 END))"
    val ev = Tables(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        unix_micros(col("ts")).as("c_us"))
      .withColumn("bkt", explode(array(expr(floorDiv("c_us")), expr(s"${floorDiv("c_us")} + 1"))))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), unix_micros(col("ts")).as("p_us"))
      .withColumn("bkt", expr(floorDiv("p_us")))
    clicks.join(purch, Seq("user_id", "bkt"))
      .filter(col("p_us") > col("c_us") && col("p_us") <= col("c_us") + wUs)
      .groupBy(col("click_id"))
      .agg(count(lit(1)).as("n_purch"), min(col("p_us") - col("c_us")).as("min_lag_us"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_unpivot" -> unpivot,
    "q_window_dist" -> windowDist,
    "q_asof_join" -> asofJoin,
    "q_range_join" -> rangeJoin,
    "q_filter_project" -> filterProject,
    "q_agg_pricing" -> aggPricingSummary,
    "q_agg_stats" -> aggStats,
    "q_distinct" -> distinctFlags,
    "q_group_having" -> groupHaving,
    "q_rollup" -> rollupAgg,
    "q_cube" -> cubeAgg,
    "q_grouping_sets" -> groupingSets,
    "q_grouping_id" -> groupingId,
    "q_agg_filter" -> aggFilter,
    "q_agg_corr" -> aggCorr,
    "q_regression" -> regression,
    "q_ab_test" -> abTest,
    "q_window_nth" -> windowNth,
    "q_asof_nearest" -> asofNearest,
    "q_join_star" -> joinStar,
    "q_join_big" -> joinBig,
    "q_salted_join" -> ((s, dir) => saltedJoin(s, dir)),
    "q_ivm_join" -> ivmJoin,
    "q_ivm_agg" -> ivmAgg,
    "q_pseudonymize" -> pseudonymize,
    "q_semi_join" -> semiJoin,
    "q_anti_join" -> antiJoin,
    "q_not_in" -> notIn,
    "q_left_join" -> leftOuterJoin,
    "q_full_outer" -> fullOuterJoin,
    "q_theta_join" -> thetaJoin,
    "q_merge_upsert" -> mergeUpsert,
    "q_merge_cdc" -> mergeCdc,
    "q_temporal_join" -> temporalJoin,
    "q_histogram" -> histogram,
    "q_tpch_q3" -> tpchQ3,
    "q_tpch_q5" -> tpchQ5,
    "q_tpch_q18" -> tpchQ18,
    "q_tpch_q17" -> tpchQ17,
    "q_tpch_q21" -> tpchQ21,
    "q_tpch_q19" -> tpchQ19,
    "q_fuzzy_join" -> fuzzyJoin,
    "q_tpch_q2" -> tpchQ2,
    "q_tpch_q4" -> tpchQ4,
    "q_tpch_q6" -> tpchQ6,
    "q_tpch_q7" -> tpchQ7,
    "q_tpch_q8" -> tpchQ8,
    "q_tpch_q9" -> tpchQ9,
    "q_tpch_q10" -> tpchQ10,
    "q_tpch_q11" -> tpchQ11,
    "q_tpch_q12" -> tpchQ12,
    "q_tpch_q13" -> tpchQ13,
    "q_tpch_q14" -> tpchQ14,
    "q_tpch_q15" -> tpchQ15,
    "q_tpch_q16" -> tpchQ16,
    "q_tpch_q20" -> tpchQ20,
    "q_tpch_q22" -> tpchQ22,
    "q_in_subquery" -> inSubquery,
    "q_scalar_subquery" -> scalarSubquery,
    "q_exists" -> existsCorrelated,
    "q_window_rank" -> windowRank,
    "q_window_running" -> windowRunning,
    "q_window_lag" -> windowLag,
    "q_window_frame" -> windowFrame,
    "q_window_range" -> windowRange,
    "q_funnel" -> funnel,
    "q_retention" -> retention,
    "q_interval_merge" -> intervalMerge,
    "q_cumulative_distinct" -> cumulativeDistinct,
    "q_string_agg" -> stringAgg,
    "q_mode" -> modeAgg,
    "q_lateral_topn" -> lateralTopN,
    "q_topk" -> topK,
    "q_union" -> unionAll,
    "q_intersect" -> intersectKeys,
    "q_except" -> exceptKeys,
    "q_except_all" -> exceptAllKeys,
    "q_intersect_all" -> intersectAllKeys,
    "q_string_funcs" -> stringFuncs,
    "q_edit_distance" -> editDistance,
    "q_date_funcs" -> dateFuncs,
    "q_math_funcs" -> mathFuncs,
    "q_case_expr" -> caseExpr,
    "q_pivot" -> pivotEvents,
    "q_sessionize" -> sessionize,
    "q_session_window" -> sessionWindow,
    "q_anomaly_mad" -> anomalyMad,
    "q_forecast_seasonal" -> forecastSeasonal,
    "q_growth" -> growth,
    "q_cohort" -> cohort,
    "q_transition_matrix" -> transitionMatrix,
    "q_rfm" -> rfm,
    "q_gini" -> gini,
    "q_ewma" -> ewma,
    "q_holt" -> holt,
    "q_scd2" -> scd2,
    "q_gapfill" -> ((s, dir) => gapFill(s, dir)),
    "q_agg_variance" -> aggVariance,
    "q_percentiles" -> percentiles,
    "q_approx_distinct" -> approxDistinct,
    "q_sketch_union" -> sketchUnion,
    "q_approx_quantile" -> approxQuantile,
    "q_heavy_hitters" -> heavyHitters,
    "q_json_funcs" -> jsonFuncs,
    "q_regexp_funcs" -> regexpFuncs,
    "q_null_funcs" -> nullFuncs,
  )

  val oracleSql: Map[String, String] = Map(
    "q_salted_join" ->
      // the plain join: salting must be answer-invisible
      """SELECT o_orderpriority, CAST(count(1) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1""".stripMargin,
    "q_agg_corr" ->
      """WITH g AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS x,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem),
        |m AS (
        |  SELECT l_returnflag, CAST(count(1) AS BIGINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(x * x) AS HUGEINT) AS sxx, CAST(sum(y * y) AS HUGEINT) AS syy,
        |    CAST(sum(x * y) AS HUGEINT) AS sxy
        |  FROM g GROUP BY 1)
        |SELECT l_returnflag, n,
        |  CAST(n * sxy - sx * sy AS DOUBLE) / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |    / sqrt(CAST(n * syy - sy * sy AS DOUBLE)) AS corr_qty_price,
        |  CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n AS DOUBLE)
        |    / CAST(n - 1 AS DOUBLE) / 10000.0 AS covar_qty_price
        |FROM m""".stripMargin,
    "q_regression" ->
      """WITH g AS (
        |  SELECT l_returnflag,
        |    CAST(round(l_quantity * 100) AS BIGINT) AS x,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem),
        |m AS (
        |  SELECT l_returnflag, CAST(count(1) AS BIGINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(x * x) AS HUGEINT) AS sxx, CAST(sum(y * y) AS HUGEINT) AS syy,
        |    CAST(sum(x * y) AS HUGEINT) AS sxy
        |  FROM g GROUP BY 1)
        |SELECT l_returnflag, n,
        |  CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
        |  (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
        |   - CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
        |   * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0 AS intercept,
        |  CAST(n * sxy - sx * sy AS DOUBLE) / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |    / sqrt(CAST(n * syy - sy * sy AS DOUBLE))
        |    * (CAST(n * sxy - sx * sy AS DOUBLE) / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |    / sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r2
        |FROM m""".stripMargin,
    "q_ab_test" ->
      """WITH g AS (
        |  SELECT o_orderpriority = '1-URGENT' AS is_a,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |m AS (
        |  SELECT
        |    CAST(count(1) FILTER (WHERE is_a) AS BIGINT) AS na,
        |    CAST(count(1) FILTER (WHERE NOT is_a) AS BIGINT) AS nb,
        |    CAST(sum(v) FILTER (WHERE is_a) AS HUGEINT) AS sa,
        |    CAST(sum(v) FILTER (WHERE NOT is_a) AS HUGEINT) AS sb,
        |    CAST(sum(v * v) FILTER (WHERE is_a) AS HUGEINT) AS saa,
        |    CAST(sum(v * v) FILTER (WHERE NOT is_a) AS HUGEINT) AS sbb
        |  FROM g)
        |SELECT na, nb,
        |  CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) / 100.0 AS mean_a,
        |  CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 100.0 AS mean_b,
        |  (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
        |    / sqrt(CAST(na * saa - sa * sa AS DOUBLE) / CAST(na AS DOUBLE) / CAST(na - 1 AS DOUBLE) / CAST(na AS DOUBLE)
        |         + CAST(nb * sbb - sb * sb AS DOUBLE) / CAST(nb AS DOUBLE) / CAST(nb - 1 AS DOUBLE) / CAST(nb AS DOUBLE)) AS t_welch
        |FROM m""".stripMargin,
    "q_window_nth" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, l_discount,
        |  nth_value(l_extendedprice, 3) OVER w AS nth3,
        |  first_value(nullif(l_discount, 0) IGNORE NULLS) OVER w AS first_disc,
        |  last_value(nullif(l_discount, 0) IGNORE NULLS) OVER w AS last_disc
        |FROM lineitem
        |WHERE l_orderkey < 1000
        |WINDOW w AS (PARTITION BY l_returnflag
        |  ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_discount)""".stripMargin,
    "q_pseudonymize" ->
      """SELECT substring(md5('pseud:' || CAST(c_custkey AS VARCHAR)), 1, 16) AS pid,
        |       substring(c_name, 1, 4) || repeat('*', greatest(length(c_name) - 4, 0)) AS name_masked,
        |       CAST(floor(c_acctbal / 1000) AS BIGINT) * 1000 AS acctbal_band,
        |       c_mktsegment
        |FROM customer""".stripMargin,
    // the delta-merge path must equal the full recompute bit-for-bit —
    // the oracle IS the recompute
    "q_ivm_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_ivm_join" ->
      """WITH dl AS (SELECT * FROM lineitem WHERE l_linenumber % 7 = 3),
        |bl AS (SELECT * FROM lineitem WHERE l_linenumber % 7 <> 3),
        |do_ AS (SELECT * FROM orders WHERE o_custkey % 10 = 3),
        |bo AS (SELECT * FROM orders WHERE o_custkey % 10 <> 3)
        |SELECT l_orderkey, l_linenumber, l_quantity, o_orderpriority, 'dL' AS src
        |FROM dl JOIN bo ON l_orderkey = o_orderkey
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, l_quantity, o_orderpriority, 'dO'
        |FROM bl JOIN do_ ON l_orderkey = o_orderkey
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, l_quantity, o_orderpriority, 'dLdO'
        |FROM dl JOIN do_ ON l_orderkey = o_orderkey""".stripMargin,
    "q_agg_filter" ->
      """SELECT o_orderstatus,
        |  CAST(count(1) AS BIGINT) AS n_all,
        |  CAST(count(1) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS n_urgent,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE) AS urgent_price,
        |  CAST(max(o_totalprice) FILTER (WHERE o_orderpriority <> '1-URGENT') AS DOUBLE) AS other_max
        |FROM orders GROUP BY 1""".stripMargin,
    "q_grouping_id" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(count(1) AS BIGINT) AS cnt,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q_asof_nearest" ->
      // nearest purchase in either direction via a correlated LATERAL
      // top-1: distance asc, backward preferred on ties, then the pinned
      // id rule per direction (max id backward, min id forward)
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS tus, value
        |  FROM events),
        |purch AS (SELECT user_id, event_id, tus, value FROM ev
        |          WHERE event_type = 'purchase')
        |SELECT e.event_id, e.user_id, e.event_type,
        |  n.p_event_id, n.p_value, n.lag_us
        |FROM ev e LEFT JOIN LATERAL (
        |  SELECT p.event_id AS p_event_id, p.value AS p_value,
        |    CAST(e.tus - p.tus AS BIGINT) AS lag_us
        |  FROM purch p
        |  WHERE p.user_id = e.user_id
        |  ORDER BY
        |    CASE WHEN p.tus <= e.tus THEN e.tus - p.tus ELSE p.tus - e.tus END ASC,
        |    (p.tus > e.tus) ASC,
        |    CASE WHEN p.tus <= e.tus THEN -p.event_id ELSE p.event_id END ASC
        |  LIMIT 1) n ON true""".stripMargin,
    "q_interval_merge" ->
      """WITH iv AS (
        |  SELECT user_id, event_id, epoch_us(ts) // 1000000 AS s0,
        |    epoch_us(ts) // 1000000 + 60 + CAST(floor(abs(value) * 60) AS BIGINT) AS e0
        |  FROM events),
        |f AS (
        |  SELECT user_id, event_id, s0, e0,
        |    CASE WHEN mep IS NULL OR s0 > mep THEN 1 ELSE 0 END AS is_new
        |  FROM (
        |    SELECT *, max(e0) OVER (PARTITION BY user_id ORDER BY s0, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mep
        |    FROM iv) z),
        |g AS (
        |  SELECT user_id, s0, e0,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY s0, event_id) AS BIGINT) AS island
        |  FROM f)
        |SELECT user_id, island, min(s0) AS start_s, max(e0) AS end_s,
        |  CAST(count(1) AS BIGINT) AS n_events
        |FROM g GROUP BY 1, 2""".stripMargin,
    "q_tpch_q17" ->
      """WITH pp AS (
        |  SELECT l_partkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |    count(1) AS cnt
        |  FROM lineitem GROUP BY 1)
        |SELECT p_brand,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
        |  CAST(count(1) AS BIGINT) AS n_lines
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_size <= 5
        |JOIN pp USING (l_partkey)
        |WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sum_qty
        |GROUP BY 1""".stripMargin,
    "q_tpch_q19" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(1) AS n_lines
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    // all-pairs oracle: quadratic is fine at gate scale; deletion-
    // neighborhood blocking is lossless at distance <= 1, so the row sets
    // must match exactly
    "q_fuzzy_join" ->
      """WITH dirty AS (
        |  SELECT c_custkey AS dirty_id,
        |    CASE
        |      WHEN c_custkey % 3 = 0 THEN
        |        substr(c_name, 1, CAST(1 + c_custkey % length(c_name) AS INT) - 1) ||
        |        substr(c_name, CAST(1 + c_custkey % length(c_name) AS INT) + 1)
        |      WHEN c_custkey % 3 = 1 THEN c_name
        |      ELSE
        |        substr(substr(c_name, 1, CAST(1 + c_custkey % length(c_name) AS INT) - 1) ||
        |               substr(c_name, CAST(1 + c_custkey % length(c_name) AS INT) + 1), 3)
        |    END AS name_dirty
        |  FROM customer)
        |SELECT d.dirty_id, c.c_custkey, d.name_dirty,
        |  CAST(levenshtein(d.name_dirty, c.c_name) AS INT) AS distance
        |FROM dirty d JOIN customer c ON levenshtein(d.name_dirty, c.c_name) <= 1""".stripMargin,
    "q_tpch_q2" ->
      """WITH ps AS (
        |  SELECT DISTINCT l.l_partkey AS partkey, l.l_suppkey AS suppkey FROM lineitem l),
        |cand AS (
        |  SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        |  FROM part p JOIN ps ON ps.partkey = p.p_partkey
        |  JOIN supplier s ON s.s_suppkey = ps.suppkey
        |  JOIN nation n ON n.n_nationkey = s.s_nationkey
        |  JOIN region r ON r.r_regionkey = n.n_regionkey
        |  WHERE p.p_size <= 10 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'),
        |mn AS (SELECT p_partkey, min(s_acctbal) AS mb FROM cand GROUP BY 1)
        |SELECT c.s_acctbal, c.s_name, c.n_name, c.p_partkey, c.p_name
        |FROM cand c JOIN mn ON mn.p_partkey = c.p_partkey AND c.s_acctbal = mn.mb
        |ORDER BY c.s_acctbal DESC, c.p_partkey ASC, c.s_suppkey ASC LIMIT 100""".stripMargin,
    "q_tpch_q4" ->
      """SELECT o_orderpriority, CAST(count(1) AS BIGINT) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-07-01' AND o.o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
        |              AND epoch_us(l.l_shipdate) // 1000000 > epoch_us(o.o_orderdate) // 1000000 + 60 * 86400)
        |GROUP BY 1""".stripMargin,
    "q_tpch_q6" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  CAST(count(1) AS BIGINT) AS n_lines
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q_tpch_q7" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(year(l.l_shipdate) AS INT) AS l_year,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem l
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        |WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        |   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
        |GROUP BY 1, 2, 3""".stripMargin,
    "q_tpch_q8" ->
      """WITH vols AS (
        |  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
        |    CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
        |    sn.n_name AS supp_nation
        |  FROM lineitem l
        |  JOIN part p ON p.p_partkey = l.l_partkey
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
        |  JOIN region r ON r.r_regionkey = cn.n_regionkey
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
        |  WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO')
        |SELECT o_year,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |    / CAST(sum(volume) AS DOUBLE) AS mkt_share
        |FROM vols GROUP BY 1""".stripMargin,
    "q_tpch_q9" ->
      """SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
        |           - CAST(p.p_retailprice AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE p.p_name LIKE '%red%'
        |GROUP BY 1, 2""".stripMargin,
    "q_tpch_q10" ->
      """SELECT c.c_custkey, c.c_name,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  c.c_acctbal, n.n_name
        |FROM customer c
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1996-04-01'
        |  AND l.l_returnflag = 'R'
        |GROUP BY 1, 2, 4, 5
        |ORDER BY revenue DESC, c.c_custkey ASC LIMIT 20""".stripMargin,
    "q_tpch_q11" ->
      """WITH pv AS (
        |  SELECT l.l_partkey AS partkey, sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS value_dec
        |  FROM lineitem l
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  JOIN nation n ON n.n_nationkey = s.s_nationkey
        |  JOIN region r ON r.r_regionkey = n.n_regionkey
        |  WHERE r.r_name = 'ASIA'
        |  GROUP BY 1),
        |tot AS (SELECT sum(value_dec) AS t FROM pv)
        |SELECT partkey, CAST(value_dec AS DOUBLE) AS value
        |FROM pv, tot WHERE value_dec * 10000 > 8 * t""".stripMargin,
    "q_tpch_q12" ->
      """SELECT CASE WHEN l.l_quantity < 15 THEN 'SMALL' WHEN l.l_quantity < 35 THEN 'MEDIUM' ELSE 'LARGE' END AS qty_band,
        |  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1""".stripMargin,
    "q_tpch_q13" ->
      """SELECT c_count, CAST(count(1) AS BIGINT) AS custdist FROM (
        |  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        |  FROM customer c LEFT JOIN orders o
        |    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY 1) t
        |GROUP BY 1""".stripMargin,
    "q_tpch_q14" ->
      """SELECT
        |  100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
        |                        ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |        / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS promo_revenue,
        |  CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
        |               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_part,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE l.l_shipdate >= TIMESTAMP '1997-09-01' AND l.l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin,
    "q_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l.l_suppkey AS suppkey, sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS total_rev
        |  FROM lineitem l
        |  WHERE l.l_shipdate >= TIMESTAMP '1996-10-01' AND l.l_shipdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1),
        |mx AS (SELECT max(total_rev) AS m FROM rev)
        |SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
        |FROM supplier s JOIN rev r ON r.suppkey = s.s_suppkey, mx
        |WHERE r.total_rev = mx.m""".stripMargin,
    "q_tpch_q16" ->
      """SELECT p.p_brand, p.p_type, p.p_size, CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
        |WHERE p.p_brand <> 'Brand#13' AND p.p_type <> 'PROMO'
        |  AND p.p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
        |  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin,
    "q_tpch_q20" ->
      """SELECT s.s_suppkey, s.s_name FROM supplier s
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |JOIN region r ON r.r_regionkey = n.n_regionkey
        |WHERE r.r_name = 'AMERICA'
        |  AND s.s_suppkey IN (
        |    SELECT l.l_suppkey FROM lineitem l
        |    JOIN part p ON p.p_partkey = l.l_partkey
        |    WHERE p.p_name LIKE 'red%'
        |      AND l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
        |    GROUP BY 1 HAVING sum(l.l_quantity) > 300)""".stripMargin,
    "q_tpch_q22" ->
      """WITH pool AS (
        |  SELECT c_custkey, c_acctbal, CAST(c_nationkey % 7 AS BIGINT) AS cntry
        |  FROM customer WHERE c_nationkey % 7 IN (1, 3, 5)),
        |avgbal AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(1) AS ab
        |  FROM pool WHERE c_acctbal > 0.0)
        |SELECT cntry, CAST(count(1) AS BIGINT) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM pool p, avgbal
        |WHERE p.c_acctbal > avgbal.ab
        |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = p.c_custkey AND o.o_orderdate >= TIMESTAMP '2000-06-01')
        |GROUP BY 1""".stripMargin,
    "q_tpch_q21" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_suppkey, epoch_us(l_shipdate) // 1000000 AS sd
        |  FROM lineitem),
        |ord AS (
        |  SELECT o_orderkey, epoch_us(o_orderdate) // 1000000 AS od
        |  FROM orders WHERE o_orderstatus = 'F'),
        |late AS (
        |  SELECT DISTINCT l_orderkey, l_suppkey
        |  FROM li JOIN ord ON l_orderkey = o_orderkey
        |  WHERE sd > od + 60 * 86400),
        |cand AS (
        |  SELECT l1.l_orderkey, l1.l_suppkey FROM late l1
        |  WHERE EXISTS (SELECT 1 FROM li l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey))
        |SELECT n_name, s_name, CAST(count(1) AS BIGINT) AS numwait
        |FROM cand
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2""".stripMargin,
    "q_cumulative_distinct" ->
      """WITH fd AS (
        |  SELECT user_id, min(epoch_us(ts) // 1000000 // 3600) AS first_hour
        |  FROM events GROUP BY 1),
        |nd AS (
        |  SELECT first_hour AS hour, CAST(count(1) AS BIGINT) AS new_users
        |  FROM fd GROUP BY 1)
        |SELECT hour, new_users,
        |  CAST(sum(new_users) OVER (ORDER BY hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        |FROM nd""".stripMargin,
    "q_string_agg" ->
      """SELECT n_name, string_agg(s_name, '|' ORDER BY s_name) AS suppliers,
        |  CAST(count(1) AS BIGINT) AS n_suppliers
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin,
    "q_mode" ->
      """WITH c AS (
        |  SELECT l_returnflag, l_quantity, count(1) AS cnt FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS mode_qty,
        |  CAST(cnt AS BIGINT) AS mode_n
        |FROM (SELECT *, row_number() OVER (PARTITION BY l_returnflag
        |        ORDER BY cnt DESC, l_quantity ASC) AS rn FROM c) z
        |WHERE rn = 1""".stripMargin,
    "q_lateral_topn" ->
      """SELECT o.o_orderkey, l.l_linenumber, l.l_extendedprice
        |FROM (SELECT o_orderkey FROM orders WHERE o_orderkey <= 400) o,
        |LATERAL (
        |  SELECT l_linenumber, l_extendedprice FROM lineitem
        |  WHERE l_orderkey = o.o_orderkey
        |  ORDER BY l_extendedprice DESC, l_linenumber ASC LIMIT 2) l""".stripMargin,
    "q_unpivot" ->
      """SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'retailprice' AS measure, p_retailprice AS value FROM part""".stripMargin,
    "q_window_dist" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC)""".stripMargin,
    "q_asof_join" ->
      // p is deduped to the max event_id per (user_id, ts): DuckDB's ASOF
      // tie choice is unspecified, while the Spark window deterministically
      // surfaces the largest p_event_id at a tied timestamp — the dedup
      // makes the oracle pick the same row if such ties ever appear
      """WITH p AS (
        |  SELECT user_id, ts, p_event_id, p_value FROM (
        |    SELECT user_id, ts, event_id AS p_event_id, value AS p_value,
        |      row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'purchase') t
        |  WHERE rn = 1)
        |SELECT e.event_id, e.user_id, e.event_type, e.ts, p.p_event_id, p.p_value,
        |  CAST(epoch_us(e.ts) - epoch_us(p.ts) AS BIGINT) AS lag_us
        |FROM events e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts""".stripMargin,
    "q_range_join" ->
      """SELECT c.event_id AS click_id, count(1) AS n_purch,
        |  CAST(min(epoch_us(p.ts) - epoch_us(c.ts)) AS BIGINT) AS min_lag_us
        |FROM events c JOIN events p
        |  ON p.user_id = c.user_id AND c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND epoch_us(p.ts) > epoch_us(c.ts)
        |  AND epoch_us(p.ts) <= epoch_us(c.ts) + CAST(14400 AS BIGINT) * 1000000
        |GROUP BY 1""".stripMargin,
    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(1) AS avg_qty,
        |  COUNT(1) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_stats" ->
      """SELECT l_returnflag, MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
        |  COUNT(1) AS cnt, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "q_group_having" ->
      """SELECT l_partkey, COUNT(1) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM lineitem GROUP BY l_partkey HAVING COUNT(1) >= 40""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(1) AS cnt,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(1) AS cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(1) AS cnt
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,
    "q_join_star" ->
      """SELECT r_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(1) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,
    "q_join_big" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(1) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,
    "q_semi_join" ->
      """SELECT c_mktsegment, COUNT(1) AS n_cust FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment""".stripMargin,
    "q_anti_join" ->
      """SELECT c_nationkey, COUNT(1) AS n_cust FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey""".stripMargin,
    "q_not_in" ->
      """WITH sub AS (
        |  SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END AS k
        |  FROM orders WHERE o_orderkey % 5 = 0)
        |SELECT 'with_nulls' AS arm, c_custkey FROM customer
        |WHERE c_custkey NOT IN (SELECT k FROM sub)
        |UNION ALL
        |SELECT 'nulls_filtered' AS arm, c_custkey FROM customer
        |WHERE c_custkey NOT IN (SELECT k FROM sub WHERE k IS NOT NULL)""".stripMargin,
    "q_left_join" ->
      """SELECT o_orderkey, COUNT(l_orderkey) AS n_lines
        |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderkey""".stripMargin,
    "q_full_outer" ->
      """WITH c AS (SELECT c_custkey, CAST(count(1) AS BIGINT) AS n_cust_rows
        |           FROM customer GROUP BY 1),
        |o AS (SELECT o_custkey, CAST(count(1) AS BIGINT) AS n_orders
        |      FROM orders GROUP BY 1)
        |SELECT coalesce(c_custkey, o_custkey) AS custkey,
        |  CAST(coalesce(n_cust_rows, 0) AS BIGINT) AS n_cust_rows,
        |  CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
        |  CASE WHEN c_custkey IS NULL THEN 'order_only'
        |       WHEN o_custkey IS NULL THEN 'customer_only'
        |       ELSE 'both' END AS presence
        |FROM c FULL OUTER JOIN o ON c_custkey = o_custkey""".stripMargin,
    "q_theta_join" ->
      """WITH bands AS (
        |  SELECT CAST(id AS INT) AS band,
        |    CAST(id * 12000 AS DOUBLE) AS bmin,
        |    CAST(CASE WHEN id = 4 THEN 1000000000 ELSE (id + 1) * 12000 END AS DOUBLE) AS bmax
        |  FROM (SELECT unnest(range(0, 5)) AS id) t)
        |SELECT band, CAST(count(1) AS BIGINT) AS n_lines
        |FROM lineitem JOIN bands
        |  ON CAST(l_extendedprice AS DOUBLE) >= bmin AND CAST(l_extendedprice AS DOUBLE) < bmax
        |GROUP BY band""".stripMargin,
    "q_merge_upsert" ->
      """WITH base AS (
        |  SELECT c_custkey AS key, c_mktsegment AS segment
        |  FROM customer WHERE c_custkey % 2 = 0),
        |latest AS (
        |  SELECT user_id AS key, event_type AS last_event_type, value AS last_value
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |                     ORDER BY ts DESC, event_id DESC) AS rn
        |        FROM events) t
        |  WHERE rn = 1)
        |SELECT coalesce(b.key, l.key) AS key,
        |  coalesce(b.segment, 'unknown') AS segment,
        |  coalesce(l.last_event_type, 'none') AS last_event_type,
        |  coalesce(l.last_value, 0.0) AS last_value,
        |  CASE WHEN b.segment IS NULL THEN 'insert'
        |       WHEN l.last_event_type IS NULL THEN 'keep'
        |       ELSE 'update' END AS action
        |FROM base b FULL OUTER JOIN latest l ON b.key = l.key""".stripMargin,
    "q_histogram" ->
      """SELECT CAST(least(floor(o_totalprice / 50000.0), 9) AS INT) AS bucket,
        |  COUNT(1) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1""".stripMargin,
    "q_tpch_q3" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1996-03-15'
        |  AND l_shipdate > TIMESTAMP '1996-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(sum_qty AS DOUBLE) AS total_qty
        |FROM (
        |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250) b
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_tpch_q5" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name""".stripMargin,
    "q_in_subquery" ->
      """SELECT o_orderstatus, COUNT(1) AS cnt FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |GROUP BY o_orderstatus""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT c_nationkey, COUNT(1) AS n_rich FROM customer
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(1) FROM customer)
        |GROUP BY c_nationkey""".stripMargin,
    "q_exists" ->
      """SELECT s_nationkey, COUNT(1) AS n_supp FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity >= 49)
        |GROUP BY s_nationkey""".stripMargin,
    "q_window_rank" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    CAST(RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rk
        |  FROM orders) t WHERE rk <= 3""".stripMargin,
    "q_window_running" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |    PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity, l_partkey, l_suppkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_qty
        |FROM lineitem""".stripMargin,
    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey,
        |  LAG(o_totalprice, 1) OVER w AS prev_price,
        |  LEAD(o_totalprice, 1) OVER w AS next_price,
        |  CAST(ROW_NUMBER() OVER w AS INT) AS rn
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "q_retention" ->
      """WITH wk AS (
        |  SELECT DISTINCT user_id,
        |    CAST((epoch_us(ts) // 1000000 - 1704067200) // 604800 AS INT) AS week
        |  FROM events),
        |c AS (SELECT user_id, min(week) AS cohort FROM wk GROUP BY 1)
        |SELECT c.cohort, wk.week - c.cohort AS week_offset, COUNT(1) AS n_users
        |FROM wk JOIN c ON wk.user_id = c.user_id
        |GROUP BY 1, 2""".stripMargin,
    "q_funnel" ->
      """WITH seq AS (
        |  SELECT user_id,
        |    list(event_type ORDER BY epoch_us(ts) // 1000000, event_id) AS types
        |  FROM events WHERE ts < TIMESTAMP '2024-01-04' GROUP BY 1),
        |st AS (
        |  SELECT user_id,
        |    CAST(list_reduce(list_prepend('0', types), (acc, x) -> CASE
        |      WHEN acc = '0' AND x = 'view' THEN '1'
        |      WHEN acc = '1' AND x = 'click' THEN '2'
        |      WHEN acc = '2' AND x = 'purchase' THEN '3'
        |      ELSE acc END) AS INT) AS stage
        |  FROM seq)
        |SELECT stage, COUNT(1) AS n_users FROM st GROUP BY 1""".stripMargin,
    "q_window_range" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_10min,
        |  COUNT(1) OVER w AS n_10min
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
        |             RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_window_frame" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS moving_sum,
        |  COUNT(1) OVER w AS n_in_frame
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q_union" ->
      """SELECT nationkey, side, COUNT(1) AS cnt FROM (
        |  SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier) t
        |GROUP BY nationkey, side""".stripMargin,
    "q_intersect" ->
      "SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier",
    "q_except" ->
      "SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier",
    "q_except_all" ->
      """SELECT nationkey, COUNT(1) AS cnt FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  EXCEPT ALL SELECT s_nationkey FROM supplier) t
        |GROUP BY nationkey""".stripMargin,
    "q_intersect_all" ->
      """SELECT nationkey, COUNT(1) AS cnt FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  INTERSECT ALL SELECT s_nationkey FROM supplier) t
        |GROUP BY nationkey""".stripMargin,
    "q_edit_distance" ->
      """WITH d AS (
        |  SELECT c_custkey, c_name,
        |    CASE WHEN c_custkey % 3 = 0 THEN substr(c_name, 1, 10) || 'X' || substr(c_name, 12)
        |         WHEN c_custkey % 3 = 1 THEN substr(c_name, 1, 10) || substr(c_name, 12)
        |         ELSE c_name END AS dirty
        |  FROM customer)
        |SELECT CAST(levenshtein(c_name, dirty) AS INT) AS d,
        |  CAST(CASE WHEN levenshtein(c_name, reverse(c_name)) > 3 THEN -1
        |            ELSE levenshtein(c_name, reverse(c_name)) END AS INT) AS d_rev_bounded,
        |  CAST(count(1) AS BIGINT) AS n
        |FROM d GROUP BY 1, 2""".stripMargin,
    "q_string_funcs" ->
      """SELECT p_partkey,
        |  UPPER(SUBSTRING(p_name, 1, 10)) AS up10,
        |  CAST(LENGTH(p_name) AS INT) AS name_len,
        |  REPLACE(p_brand, '#', '_') AS brand_clean,
        |  LOWER(p_type) || ':' || p_brand AS type_brand,
        |  CAST(STRPOS(p_name, 'a') AS INT) AS first_a,
        |  TRIM(p_name) AS trimmed
        |FROM part""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        |  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS o_month,
        |  CAST(EXTRACT(day FROM o_orderdate) AS INT) AS o_day,
        |  CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since
        |FROM orders""".stripMargin,
    "q_math_funcs" ->
      """SELECT c_custkey,
        |  ABS(c_acctbal) AS abs_bal,
        |  CAST(FLOOR(c_acctbal) AS BIGINT) AS floor_bal,
        |  CAST(CEIL(c_acctbal) AS BIGINT) AS ceil_bal,
        |  CAST(ROUND(CAST(c_acctbal AS DECIMAL(18,2)), 1) AS DOUBLE) AS round_bal,
        |  SQRT(ABS(c_acctbal)) AS sqrt_bal,
        |  c_custkey % 7 AS mod7
        |FROM customer""".stripMargin,
    "q_case_expr" ->
      """SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
        |            WHEN c_acctbal < 5000 THEN 'low'
        |            ELSE 'high' END AS bucket, COUNT(1) AS cnt
        |FROM customer GROUP BY 1""".stripMargin,
    "q_pivot" ->
      """SELECT user_id,
        |  COUNT(1) FILTER (WHERE event_type = 'click') AS click,
        |  COUNT(1) FILTER (WHERE event_type = 'error') AS error,
        |  COUNT(1) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  COUNT(1) FILTER (WHERE event_type = 'signup') AS signup,
        |  COUNT(1) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id""".stripMargin,
    "q_agg_variance" ->
      """SELECT c_nationkey, n, (s2 - s1 * s1 / n) / (n - 1) AS var_samp FROM (
        |  SELECT c_nationkey,
        |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2)) * CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS s2,
        |    COUNT(1) AS n
        |  FROM customer GROUP BY c_nationkey) t WHERE n > 1""".stripMargin,
    "q_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS p50_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  quantile_cont(l_extendedprice, 0.25) AS p25_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    // sketch estimates are engine-specific: the oracle checks the exact
    // value and pins the accuracy flag at 1 — a drifting sketch fails
    "q_approx_distinct" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_exact,
        |  CAST(1 AS INT) AS within_5pct
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_sketch_union" ->
      """SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact,
        |  CAST(1 AS INT) AS within_5pct
        |FROM orders""".stripMargin,
    "q_approx_quantile" ->
      """SELECT l_returnflag, CAST(count(1) AS BIGINT) AS n,
        |  CAST(1 AS INT) AS rank_within_2pct
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q_heavy_hitters" ->
      """SELECT l_partkey, CAST(count(1) AS BIGINT) AS cnt,
        |  CAST(1 AS INT) AS sketch_counts_match
        |FROM lineitem GROUP BY l_partkey
        |ORDER BY cnt DESC, l_partkey LIMIT 5""".stripMargin,
    "q_json_funcs" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_extracted,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_struct
        |FROM events""".stripMargin,
    "q_regexp_funcs" ->
      """SELECT p_partkey,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        |  regexp_replace(p_type, '[aeiou]', '', 'g') AS devoweled,
        |  CAST(regexp_matches(p_name, '^[a-m]') AS INT) AS starts_early
        |FROM part""".stripMargin,
    "q_null_funcs" ->
      """SELECT c_custkey,
        |  COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'SUPPRESSED') AS seg,
        |  GREATEST(c_acctbal, 0.0) AS pos_bal,
        |  LEAST(c_acctbal, 1000.0) AS capped_bal,
        |  CAST(c_acctbal IS NULL AS INT) AS is_null
        |FROM customer""".stripMargin,
    "q_merge_cdc" ->
      """WITH base AS (
        |  SELECT c_custkey AS key, c_mktsegment AS segment FROM customer
        |  WHERE c_custkey % 2 = 0),
        |latest AS (
        |  SELECT user_id AS key,
        |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |    value AS new_value
        |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |                     ORDER BY ts DESC, event_id DESC) AS rn
        |        FROM events) t
        |  WHERE rn = 1)
        |SELECT coalesce(b.key, l.key) AS key,
        |  coalesce(b.segment, 'unknown') AS segment,
        |  coalesce(l.new_value, 0.0) AS value,
        |  CASE WHEN b.segment IS NULL THEN 'insert'
        |       WHEN l.op IS NULL THEN 'keep'
        |       ELSE 'update' END AS action
        |FROM base b FULL OUTER JOIN latest l ON l.key = b.key
        |WHERE l.op IS NULL OR l.op <> 'D'""".stripMargin,
    "q_temporal_join" ->
      """WITH base AS (
        |  SELECT user_id, ts, event_id, event_type AS attr,
        |    LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_attr
        |  FROM events),
        |chg AS (SELECT user_id, ts, event_id, attr FROM base
        |        WHERE prev_attr IS NULL OR attr <> prev_attr),
        |dim AS (
        |  SELECT user_id, attr, ts AS eff_from,
        |    LEAD(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS eff_to,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS version
        |  FROM chg)
        |SELECT e.event_id, e.user_id, e.ts, d.attr, d.version
        |FROM events e JOIN dim d ON d.user_id = e.user_id
        |  AND e.ts >= d.eff_from AND (d.eff_to IS NULL OR e.ts < d.eff_to)""".stripMargin,
    "q_scd2" ->
      """WITH base AS (
        |  SELECT user_id, ts, event_id, event_type AS attr,
        |    LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_attr
        |  FROM events),
        |chg AS (SELECT user_id, ts, event_id, attr FROM base
        |        WHERE prev_attr IS NULL OR attr <> prev_attr)
        |SELECT user_id, attr, ts AS eff_from,
        |  LEAD(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS eff_to,
        |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS version
        |FROM chg""".stripMargin,
    "q_gapfill" ->
      """WITH hourly AS (
        |  SELECT user_id, epoch_us(ts) // 1000000 // 3600 AS h, COUNT(1) AS n_events
        |  FROM events WHERE user_id < 30 GROUP BY 1, 2),
        |spine AS (
        |  SELECT user_id, unnest(range(h0, h1 + 1)) AS h
        |  FROM (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1)),
        |j AS (
        |  SELECT s.user_id, s.h, COALESCE(hh.n_events, 0) AS n_events
        |  FROM spine s LEFT JOIN hourly hh ON hh.user_id = s.user_id AND hh.h = s.h)
        |SELECT user_id, CAST(h AS BIGINT) AS h, CAST(n_events AS BIGINT) AS n_events,
        |  CAST(CASE WHEN n_events = 0 THEN 1 ELSE 0 END AS INT) AS is_gap,
        |  CAST(last_value(CASE WHEN n_events > 0 THEN h END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY h
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS last_active_h
        |FROM j""".stripMargin,
    "q_ewma" ->
      """SELECT l_orderkey, CAST(count(1) AS BIGINT) AS n_lines,
        |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |    list(CAST(l_quantity AS DOUBLE) ORDER BY l_linenumber, l_quantity)),
        |    (a, b) -> (a + b) / 2) AS ewma
        |FROM lineitem GROUP BY 1""".stripMargin,
    // the same pinned left-to-right halving fold as q_ewma, with a
    // 2-element LIST state [level, trend] — every value a dyadic rational,
    // bit-exact cross-engine. The state is a list, NOT a struct: DuckDB
    // 1.0.0 mis-evaluates struct accumulators under CASE inside
    // list_reduce (verified: struct state returns non-dyadic garbage, list
    // state matches the reference fold exactly). Seeding with the first
    // element (no prepend) IS the init rule: level = first x, trend = 0.
    "q_holt" ->
      """SELECT key, n, st[1] AS level, st[2] AS trend, st[1] + st[2] AS forecast FROM (
        |  SELECT l_orderkey AS key, CAST(count(1) AS BIGINT) AS n,
        |    list_reduce(
        |      list_transform(list(CAST(l_quantity AS DOUBLE) ORDER BY l_linenumber, l_quantity),
        |        x -> [x, 0.0]),
        |      (a, b) -> [(b[1] + (a[1] + a[2])) / 2,
        |                 (((b[1] + (a[1] + a[2])) / 2 - a[1]) + a[2]) / 2]
        |    ) AS st
        |  FROM lineitem GROUP BY 1) q""".stripMargin,
    "q_forecast_seasonal" ->
      """WITH m AS MATERIALIZED (
        |  SELECT o_orderpriority AS priority,
        |         CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1, 2),
        |w AS (
        |  SELECT priority, month, rev,
        |    sum(rev) OVER (PARTITION BY priority, EXTRACT(month FROM month)
        |                   ORDER BY month
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hist_sum,
        |    count(rev) OVER (PARTITION BY priority, EXTRACT(month FROM month)
        |                     ORDER BY month
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hist_n
        |  FROM m)
        |SELECT priority, month, CAST(rev AS DOUBLE) AS revenue,
        |       CAST(hist_sum AS DOUBLE) / hist_n AS forecast
        |FROM w WHERE hist_n > 0""".stripMargin,
    // lower medians at integer rank (n+1)//2 — zero float interpolation,
    // so the two engines agree bit-for-bit (see anomalyMad scaladoc)
    "q_anomaly_mad" ->
      """WITH ev AS (SELECT user_id, event_id, value FROM events),
        |r1 AS (
        |  SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY value, event_id) AS rn,
        |    count(1) OVER (PARTITION BY user_id) AS n
        |  FROM ev),
        |med AS MATERIALIZED (SELECT user_id, value AS med FROM r1 WHERE rn = (n + 1) // 2),
        |d AS MATERIALIZED (
        |  SELECT e.user_id, e.event_id, m.med, abs(e.value - m.med) AS dev
        |  FROM ev e JOIN med m ON e.user_id = m.user_id),
        |r2 AS (
        |  SELECT user_id, med, dev,
        |    row_number() OVER (PARTITION BY user_id ORDER BY dev, event_id) AS rn,
        |    count(1) OVER (PARTITION BY user_id) AS n
        |  FROM d),
        |mad AS MATERIALIZED (SELECT user_id, dev AS mad FROM r2 WHERE rn = (n + 1) // 2)
        |SELECT d.user_id, d.med, a.mad,
        |  CAST(sum(CASE WHEN d.dev > (CAST(3.0 AS DOUBLE) * CAST(1.4826 AS DOUBLE)) * a.mad
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
        |  CAST(count(1) AS BIGINT) AS n_events
        |FROM d JOIN mad a ON d.user_id = a.user_id
        |GROUP BY d.user_id, d.med, a.mad""".stripMargin,
    // the lag/cumulative-sum decomposition of the merging session_window
    // aggregation (merge-on-touch: only diff > gap opens a session);
    // session_end = last event + gap, Spark's window-end convention
    "q_session_window" ->
      """WITH w AS (
        |  SELECT user_id, ts, event_id,
        |    LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, event_id,
        |    SUM(CASE WHEN prev_ts IS NULL
        |             OR EPOCH_US(ts) - EPOCH_US(prev_ts) > 1800000000
        |             THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM w)
        |SELECT user_id, min(ts) AS session_start,
        |       max(ts) + INTERVAL 1800 SECOND AS session_end,
        |       CAST(count(1) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,
    // pure-integer month arithmetic (year*12+month) — no interval types
    "q_cohort" ->
      """WITH first_m AS MATERIALIZED (
        |  SELECT o_custkey AS custkey,
        |    min(year(o_orderdate) * 12 + month(o_orderdate)) AS cm
        |  FROM orders GROUP BY 1)
        |SELECT CAST((f.cm - 1) // 12 AS BIGINT) AS cohort_year,
        |       CAST((f.cm - 1) % 12 + 1 AS BIGINT) AS cohort_month,
        |       CAST((year(o.o_orderdate) * 12 + month(o.o_orderdate)) - f.cm AS BIGINT) AS age_months,
        |       CAST(count(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
        |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders o JOIN first_m f ON o.o_custkey = f.custkey
        |GROUP BY 1, 2, 3""".stripMargin,
    "q_growth" ->
      """WITH m AS MATERIALIZED (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT month, rev,
        |    lag(rev, 1) OVER (ORDER BY month) AS prev,
        |    lag(rev, 12) OVER (ORDER BY month) AS yago
        |  FROM m)
        |SELECT month, CAST(rev AS DOUBLE) AS revenue,
        |  CAST(rev - prev AS DOUBLE) / CAST(prev AS DOUBLE) AS mom_pct,
        |  CAST(rev - yago AS DOUBLE) / CAST(yago AS DOUBLE) AS yoy_pct
        |FROM w""".stripMargin,
    "q_transition_matrix" ->
      """WITH w AS (
        |  SELECT user_id, event_type,
        |    LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |c AS MATERIALIZED (
        |  SELECT event_type, next_type, count(1) AS n
        |  FROM w WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT event_type, sum(n) AS tot FROM c GROUP BY 1)
        |SELECT c.event_type, c.next_type, CAST(c.n AS BIGINT) AS n,
        |       CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS prob
        |FROM c JOIN t ON c.event_type = t.event_type""".stripMargin,
    // quintile scores via the explicit integer formula ((rank-1)*5)//n + 1,
    // not builtin ntile — the Spark side derives ranks partition-parallel
    "q_rfm" ->
      """WITH agg AS MATERIALIZED (
        |  SELECT o_custkey AS custkey,
        |         max(o_orderdate) AS last_order,
        |         count(1) AS frequency,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
        |  FROM orders GROUP BY 1),
        |n AS (SELECT count(1) AS cnt FROM agg),
        |s AS (
        |  SELECT custkey, monetary,
        |    ((row_number() OVER (ORDER BY last_order, custkey) - 1) * 5) // cnt + 1 AS r_score,
        |    ((row_number() OVER (ORDER BY frequency, custkey) - 1) * 5) // cnt + 1 AS f_score,
        |    ((row_number() OVER (ORDER BY monetary, custkey) - 1) * 5) // cnt + 1 AS m_score
        |  FROM agg CROSS JOIN n)
        |SELECT r_score, f_score, m_score,
        |       CAST(count(1) AS BIGINT) AS n_customers,
        |       CAST(sum(monetary) AS DOUBLE) AS total_monetary
        |FROM s GROUP BY 1, 2, 3""".stripMargin,
    // exact-decimal Gini numerator; the ONLY IEEE step is the final divide
    "q_gini" ->
      """WITH v AS MATERIALIZED (
        |  SELECT c.c_mktsegment AS segment, o.o_custkey AS custkey,
        |         sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS spend
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT segment, spend,
        |    row_number() OVER (PARTITION BY segment ORDER BY spend, custkey) AS i,
        |    count(1) OVER (PARTITION BY segment) AS n
        |  FROM v)
        |SELECT segment, CAST(max(n) AS BIGINT) AS n_customers,
        |  CAST(sum(spend) AS DOUBLE) AS total_spend,
        |  CAST(2 * sum(i * spend) - (max(n) + 1) * sum(spend) AS DOUBLE)
        |    / (CAST(max(n) AS DOUBLE) * CAST(sum(spend) AS DOUBLE)) AS gini
        |FROM r GROUP BY segment""".stripMargin,
    "q_sessionize" ->
      """SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(1) AS n_events FROM (
        |  SELECT user_id,
        |    CASE WHEN prev_ts IS NULL OR EPOCH_US(ts) - EPOCH_US(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM (SELECT user_id, ts, event_id,
        |          LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |        FROM events) t) t2
        |GROUP BY user_id""".stripMargin,
  )
}
