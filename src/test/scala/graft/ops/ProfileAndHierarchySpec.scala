package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-6 additions: pointer-doubling hierarchy resolution
  * (`q_hierarchy`), the one-pass column profiler (`q_profile`), the
  * constraint-validation report (`q_dq_report`), and the manually salted
  * join (`q_salted_join`).
  *
  * Scale contracts pinned here:
  *   - hierarchy resolution converges in O(log depth) rounds — a 300-deep
  *     chain must NOT take 300 shuffle rounds;
  *   - the profiler's single distinct aggregate avoids the Expand rewrite
  *     (one scan, no #aggs-fold row multiplication);
  *   - the salted join's join keys include the salt (the skew spread is in
  *     the plan, not just the code) while the ANSWER equals the plain join.
  */
class ProfileAndHierarchySpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // --- q_hierarchy ------------------------------------------------------

  test("hierarchy: 300-deep chain resolves with O(log depth) rounds") {
    import spark.implicits._
    val chain = (0L until 300L).map(k => (k, math.max(0L, k - 1))).toDF("node", "parent")
    val (res, rounds) = IterativeQueries.resolveRootsWithRounds(chain)
    val rows = res.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(rows.size == 300)
    (0L until 300L).foreach { k =>
      assert(rows(k) == ((0L, k.toInt)), s"node $k")
    }
    // doubling reaches distance 2^r after r rounds; 2^9 >= 299, +1 round to
    // observe the fixpoint. Plain one-hop propagation would need ~300.
    assert(rounds <= 11, s"expected O(log depth) convergence, got $rounds rounds")
  }

  test("hierarchy: forest keeps roots apart; dangling parent freezes") {
    import spark.implicits._
    // two trees (roots 10, 20) + a node whose parent is absent from the table
    val nodes = Seq(
      (10L, 10L), (11L, 10L), (12L, 11L),
      (20L, 20L), (21L, 20L),
      (99L, 77L)).toDF("node", "parent")
    val rows = IterativeQueries.resolveRoots(nodes).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(rows(10L) == ((10L, 0)) && rows(11L) == ((10L, 1)) && rows(12L) == ((10L, 2)))
    assert(rows(20L) == ((20L, 0)) && rows(21L) == ((20L, 1)))
    assert(rows(99L) == ((77L, 1)), "dangling parent stays frozen at the dangling id")
  }

  test("q_hierarchy catalog entry: forest cut at the 8 top categories") {
    val rows = IterativeQueries.hierarchy(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(rows.size == 200)
    (0L until 8L).foreach(k => assert(rows(k) == ((k, 0)), s"top category $k"))
    assert(rows(9L) == ((4L, 1)), "9 -> parent 4 (root)")
    // spot-check a deep node: 199 -> 99 -> 49 -> 24 -> 11 -> 5 (root), depth 5
    assert(rows(199L) == ((5L, 5)))
  }

  // (cache lifecycle for q_hierarchy is pinned centrally: CacheLifecycleSpec
  // runs every public entry — including this one — under a checkpoint dir
  // and asserts an empty block store after each.)

  // --- q_profile --------------------------------------------------------

  test("q_profile plan: two-phase distinct (no Expand), global aggs (no Sort)") {
    import org.apache.spark.sql.catalyst.plans.logical.Expand
    val df = ProfileQueries.profile(spark, dir)
    assert(df.queryExecution.optimizedPlan.collect { case e: Expand => e }.isEmpty,
      "profiler must use the two-phase distinct plan, not Expand")
    // string min/max buffers force SortAggregate — fine for a GLOBAL
    // aggregate (no grouping => no ordering requirement), so the physical
    // plan must contain no Sort at all (the grouped-unpivot alternative
    // sorted the whole #rows x #cols stream twice: measured 10x slower)
    val physical = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!physical.contains("Sort "),
      s"profiler must not sort anything:\n$physical")
  }

  test("q_profile values: known invariants of the lineitem columns") {
    val rows = ProfileQueries.profile(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("l_quantity", "l_extendedprice", "l_discount",
      "l_orderkey", "l_returnflag", "l_linestatus"))
    val qty = rows("l_quantity")
    assert(qty.getLong(1) > 0 && qty.getLong(2) == 0L)
    assert(qty.getDouble(4) == 1.0 && qty.getDouble(5) == 50.0)
    val rf = rows("l_returnflag")
    assert(rf.getLong(3) == 3L && rf.getString(6) == "A" && rf.getString(7) == "R")
    assert(rf.isNullAt(4) && rf.isNullAt(5), "string column has no numeric min/max")
  }

  // --- q_dq_report ------------------------------------------------------

  test("q_dq_report: clean checks read zero, the seeded dup PK reads nonzero") {
    val rows = ProfileQueries.dqReport(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("range_discount", "range_quantity", "enum_returnflag",
      "null_extendedprice", "null_pk_lineitem", "pk_dup_lineitem", "pk_dup_orders",
      "fk_orphan_lineitem", "fk_orphan_orders"))
    assert(rows("fk_orphan_lineitem") == 0L && rows("fk_orphan_orders") == 0L)
    assert(rows("range_discount") == 0L && rows("pk_dup_orders") == 0L)
    assert(rows("null_pk_lineitem") == 0L, "testdata PKs are non-null")
    assert(rows("pk_dup_lineitem") > 0L,
      "testdata ships duplicate (orderkey, linenumber) pairs — the counter must see them")
  }

  // --- q_ivm_join -------------------------------------------------------

  test("q_ivm_join: delta + base view = full recompute; refresh is broadcast-only") {
    import org.apache.spark.sql.functions._
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getInt(1), r.getDouble(2), r.getString(3))
    val delta = RelationalQueries.ivmJoin(spark, dir)
    // the three branches are disjoint and their union with base-join-base
    // is exactly the full join — the IVM identity
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    val baseView = li.filter(pmod(col("l_linenumber"), lit(7)) =!= 3)
      .join(o.filter(pmod(col("o_custkey"), lit(10)) =!= 3),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("o_orderpriority"))
    val full = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("o_orderpriority"))
    val got = (delta.drop("src").collect() ++ baseView.collect()).map(key).sorted
    val want = full.collect().map(key).sorted
    assert(got.length == want.length && got.sameElements(want),
      "delta-join identity must reproduce the full join exactly")
    // plan: every branch joins a broadcast delta — the bases never shuffle
    // and never join each other
    val physical = delta.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("BroadcastHashJoin".r.findAllIn(physical).size == 3, physical.take(2000))
    assert(!physical.contains("SortMergeJoin") && !physical.contains("ShuffledHashJoin"),
      "view refresh must not shuffle the base tables")
  }

  // --- q_salted_join ----------------------------------------------------

  test("q_salted_join: salt is a join key in the plan; answer equals the plain join") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val salted = RelationalQueries.saltedJoin(spark, dir)
    val join = salted.queryExecution.optimizedPlan
      .collectFirst { case j: Join => j }.getOrElse(fail("no join"))
    assert(join.condition.get.references.map(_.name).count(_ == "__graft_salt_") >= 2,
      "both sides must join on the salt column")
    val got = salted.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val want = {
      import org.apache.spark.sql.functions._
      val li = Tables(spark, dir, "lineitem")
      val o = Tables(spark, dir, "orders")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("rev"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    }
    assert(got == want, "salting must be invisible in the answer")
  }
}
