package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterate-to-fixpoint query surface: the recursive-CTE workloads
  * (hierarchy resolution, transitive reachability) a warehouse answers with
  * `WITH RECURSIVE`, re-expressed as bounded-round distributed loops.
  *
  * The reference delegates recursion to the downstream warehouse (its DDL
  * targets Postgres/DuckDB, both recursive-CTE engines); Spark has no
  * recursive CTE, so the engine provides the standard substitute: pointer
  * doubling (path halving). Each round composes the ancestor pointer with
  * itself — `anc'(v) = anc(anc(v))`, `depth'(v) = depth(v) + depth(anc(v))`
  * — so a node at depth d resolves to its root in ceil(log2(d)) rounds, not
  * d rounds. At 100 TB that is the difference between ~40 shuffle rounds
  * for a billion-deep pathology and an unrunnable walk: every round is ONE
  * self-equi-join on the node id (shuffle on a long key), state is three
  * longs per vertex, and loop control reads only a 0/1 changed flag — no
  * driver-side data. Same lineage-truncation discipline as
  * [[DedupQueries.connectedComponentsWithRounds]]: the self-join embeds the
  * previous generation's plan twice, so the frame is rebuilt from the
  * materialized RDD every [[JumpCheckpointInterval]] rounds to keep logical
  * plan growth bounded.
  */
object IterativeQueries {

  private val JumpCheckpointInterval = 3

  /** Interval for REAL (RDD-graph) lineage truncation. The every-3-rounds
    * [[JumpCheckpointInterval]] rebuild resets only the LOGICAL plan; the
    * underlying RDD dependency graph still chains one generation to the
    * next, and task serialization walks it recursively — past ~50 rounds
    * that recursion overflows the stack. Legal forests converge in
    * O(log depth) rounds (≤ ~10 even for a 300-deep chain), so this
    * interval is unreachable on valid input; it exists so the PATHOLOGICAL
    * path (a cycle marching toward the depth-overflow guard at round 63)
    * dies with the contract's cycle error instead of a StackOverflowError
    * mid-serialization. Reliable checkpoint when the session has a
    * checkpoint dir, else local — the Lifecycle fallback rule; any blocks
    * the local branch leaves belong to an error path that ends in a throw.
    */
  private val DeepTruncateInterval = 24

  /** Hard cap on doubling rounds: depth doubles each round, so 64 rounds
    * resolve any acyclic chain shorter than 2^64 — unreachable for real
    * data. Hitting the cap therefore means the "forest" contract was
    * violated (a parent cycle): depth keeps growing and `changed` never
    * reaches 0, which without the cap would loop forever, burning a
    * shuffle + persist per round.
    */
  private val MaxDoublingRounds = 64

  /** Resolve every node to its tree root via pointer doubling.
    *
    * @param nodes (node: long, parent: long) — a forest: `parent == node`
    *              marks a root. Parents must themselves appear as nodes
    *              (a dangling parent freezes its children at the dangling
    *              id, like a recursive CTE that stops finding rows).
    * @return ((node, root, depth), rounds) — depth = edges walked to the
    *         root; rounds = doubling iterations to fixpoint, the observable
    *         the O(log depth) convergence spec pins.
    */
  private[graft] def resolveRootsWithRounds(nodes: DataFrame,
      maxRounds: Int = MaxDoublingRounds): (DataFrame, Int) = {
    import org.apache.spark.storage.StorageLevel
    val spark = nodes.sparkSession
    // generation 0: roots point at themselves with depth 0 (composing with
    // a root's state is the identity, so fixpoint needs no special-casing)
    var state = nodes.select(
        col("node"),
        col("parent").as("anc"),
        when(col("parent") === col("node"), lit(0L)).otherwise(lit(1L)).as("depth"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var backing = state
    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      if (rounds >= maxRounds) {
        backing.unpersist()
        throw new IllegalArgumentException(
          s"resolveRoots: no fixpoint after $maxRounds doubling rounds " +
            "(the default cap covers any acyclic depth < 2^64) — the parent graph " +
            "has a cycle; the contract requires a forest (parent == node marks a root)")
      }
      rounds += 1
      // anc'(v) = anc(anc(v)); depth adds the jumped segment's length.
      // Left join + coalesce keeps rows whose ancestor id has no state row
      // (dangling parent) frozen instead of dropping them. A row changed
      // this round iff the jumped segment had NONZERO length (composing
      // with a root adds 0) — computable in the SAME projection, so the
      // convergence check is a filter, not a second join per round. The
      // nonzero (not positive) movement test and the `try_add` matter on a
      // cycle: depth doubles per round, so round 63 overflows 2^63 — under
      // ANSI mode a plain `+` would abort the job with an opaque
      // ArithmeticException, and pre-fix (with `> 0` movement) a wrapped
      // jump could read as "no movement" and exit with corrupted state.
      // `try_add` turns the overflow into a NULL depth in any ANSI setting;
      // depth counts edges, so a legal forest can never reach 2^63 of them
      // — a NULL depth is proof of a cycle and throws immediately rather
      // than waiting for the round cap.
      val next = state.as("x")
        .join(state.select(col("node").as("pnode"), col("anc").as("panc"),
            col("depth").as("pdepth")).as("p"),
          col("x.anc") === col("p.pnode"), "left")
        .select(col("x.node"),
          coalesce(col("p.panc"), col("x.anc")).as("anc"),
          expr("try_add(x.depth, coalesce(p.pdepth, 0L))").as("depth"),
          (coalesce(col("p.pdepth"), lit(0L)) =!= 0).as("moved"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val overflowed = next.filter(col("depth").isNull).limit(1).count()
      if (overflowed > 0) {
        next.unpersist()
        backing.unpersist()
        throw new IllegalArgumentException(
          "resolveRoots: depth overflow — path length exceeds 2^63 edges, " +
            "which only a cycle can produce; the contract requires a " +
            "forest (parent == node marks a root)")
      }
      changed = next.filter(col("moved")).limit(1).count()
      val nextState = next.select(col("node"), col("anc"), col("depth"))
      backing.unpersist()
      backing = next
      state =
        if (rounds % DeepTruncateInterval == 0) {
          if (spark.sparkContext.getCheckpointDir.isDefined)
            nextState.checkpoint(eager = true)
          else nextState.localCheckpoint(eager = true)
        } else if (rounds % JumpCheckpointInterval == 0)
          spark.createDataFrame(nextState.rdd, nextState.schema)
        else nextState
    }
    val result = Lifecycle.released(
      state.select(col("node"), col("anc").as("root"),
        col("depth").cast("int").as("depth")),
      backing)
    (result, rounds)
  }

  def resolveRoots(nodes: DataFrame): DataFrame = resolveRootsWithRounds(nodes)._1

  /** Catalog entry: resolve the part catalog's implicit binary hierarchy
    * (parent(k) = (k-1)/2 — a category tree keyed by arithmetic, so the
    * edge list is derived deterministically from testdata) to a FOREST cut
    * at the 8 top categories (p_partkey < 8): every part gets its
    * top-category root and its depth under it. The DuckDB oracle walks the
    * same chains with `WITH RECURSIVE` — the warehouse formulation this
    * operator replaces on Spark.
    */
  def hierarchy(s: SparkSession, dir: String): DataFrame =
    resolveRoots(
      Tables(s, dir, "part").select(
        col("p_partkey").as("node"),
        when(col("p_partkey") < 8, col("p_partkey"))
          .otherwise(expr("(p_partkey - 1) div 2")).as("parent")))

  /** What hierarchy resolution is FOR: subtree aggregation. Every part's
    * retail price rolls up to its top category — one groupBy on the
    * resolved root (the iterative walk replaces the per-level self-join
    * cascade a naive rollup would run). Decimal-exact sum, one bounded
    * shuffle after [[resolveRoots]].
    */
  def hierarchyRollup(s: SparkSession, dir: String): DataFrame =
    hierarchy(s, dir)
      .join(Tables(s, dir, "part").select(col("p_partkey"), col("p_retailprice")),
        col("node") === col("p_partkey"))
      .groupBy(col("root"))
      .agg(count(lit(1)).as("n_parts"), max(col("depth")).as("max_depth"),
        sum(col("p_retailprice").cast("decimal(18,2)")).cast("double").as("subtree_price"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hierarchy" -> hierarchy,
    "q_hierarchy_rollup" -> hierarchyRollup,
  )

  val oracleSql: Map[String, String] = Map(
    "q_hierarchy" ->
      """WITH RECURSIVE walk AS (
        |  SELECT p_partkey AS node, p_partkey AS anc, 0 AS d FROM part
        |  UNION ALL
        |  SELECT node, (anc - 1) // 2, d + 1 FROM walk WHERE anc >= 8
        |)
        |SELECT CAST(node AS BIGINT) AS node, CAST(anc AS BIGINT) AS root,
        |  CAST(d AS INT) AS depth
        |FROM walk WHERE anc < 8""".stripMargin,
    "q_hierarchy_rollup" ->
      """WITH RECURSIVE walk AS (
        |  SELECT p_partkey AS node, p_partkey AS anc, 0 AS d FROM part
        |  UNION ALL
        |  SELECT node, (anc - 1) // 2, d + 1 FROM walk WHERE anc >= 8
        |),
        |resolved AS (SELECT node, anc AS root, d AS depth FROM walk WHERE anc < 8)
        |SELECT CAST(r.root AS BIGINT) AS root, CAST(count(1) AS BIGINT) AS n_parts,
        |  CAST(max(r.depth) AS INT) AS max_depth,
        |  CAST(sum(CAST(p.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS subtree_price
        |FROM resolved r JOIN part p ON p.p_partkey = r.node
        |GROUP BY r.root""".stripMargin,
  )
}
