package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The sketch-TABLE pattern behind `q_sketch_union`: persist per-group HLL
  * sketches as a parquet BinaryType column, read them back, and re-aggregate
  * along a DIFFERENT rollup without touching the fact table again. At 100 TB
  * the sketch table is group-cardinality-sized (bytes per group), so every
  * downstream distinct-count dashboard runs off it — this spec pins the
  * storage round trip the catalog query only exercises in memory.
  */
class SketchTableSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.01"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("per-group HLL sketches survive a parquet round trip and re-aggregate along a new rollup") {
    val orders = Tables(spark, dir, "orders")
    val path = Files.createTempDirectory("graft-sketchtab").toString
    // build the sketch table at the FINE grain: (status, orderpriority)
    orders.groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(expr("hll_sketch_agg(o_custkey, 14)").as("sk"),
        count(lit(1)).as("n_rows"))
      .write.mode("overwrite").parquet(path)

    val sketchTable = spark.read.parquet(path)
    // schema pin: the sketch column is a plain BinaryType — portable storage
    assert(sketchTable.schema("sk").dataType ==
      org.apache.spark.sql.types.BinaryType)
    // the sketch table is group-cardinality-sized, not fact-sized
    assert(sketchTable.count() < orders.count() / 10)

    // re-aggregate along a DIFFERENT rollup (status only) WITHOUT the fact
    // table: union the stored sketches, then compare each estimate to the
    // exact distinct count
    val rolled = sketchTable.groupBy(col("o_orderstatus"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val exact = orders.groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n_exact"))
    val both = rolled.join(exact, Seq("o_orderstatus")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (est, ex) = (r.getLong(1), r.getLong(2))
      assert(math.abs(est - ex) * 20 <= ex,
        s"status ${r.getString(0)}: stored-sketch estimate $est vs exact $ex")
    }

    // and the global rollup from the same stored sketches
    val globalEst = sketchTable
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")).head().getLong(0)
    val globalExact = orders.agg(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(math.abs(globalEst - globalExact) * 20 <= globalExact,
      s"global estimate $globalEst vs exact $globalExact")
  }

  test("incremental rollup maintenance: merging a new batch's partials equals the full recompute") {
    // The exact-aggregate twin of the sketch table: a rollup table keyed at
    // the update grain holds decomposable partials (count, decimal sum).
    // Appending a batch touches ONLY the batch's partials, and the merged
    // table answers the same queries as a full fact-table recompute — the
    // pattern that replaces 100 TB rescans with per-batch upkeep. (Works
    // for any commutative-monoid aggregate; avg = merged sum/count; exact
    // distinct does NOT decompose — that is what the HLL sketch table is
    // for.)
    val orders = Tables(spark, dir, "orders")
    val old = orders.filter(col("o_orderkey") % 10 =!= 0)
    val batch = orders.filter(col("o_orderkey") % 10 === 0)
    def partials(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("s"))
    val path = Files.createTempDirectory("graft-rollup").toString
    partials(old).write.mode("overwrite").parquet(s"$path/base")
    partials(batch).write.mode("overwrite").parquet(s"$path/b1")
    // merge = re-aggregate the UNION OF PARTIALS (rollup-table-sized, not
    // fact-sized); the fact table is never rescanned
    val merged = spark.read.parquet(s"$path/base").union(spark.read.parquet(s"$path/b1"))
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))
    val full = partials(orders)
    val diff = merged.exceptAll(full).count() + full.exceptAll(merged).count()
    assert(diff == 0, s"merged rollup differs from full recompute by $diff rows")
    // the coarser rollup (status only) also answers from the rollup table
    val coarseMerged = merged.groupBy(col("o_orderstatus"))
      .agg(sum(col("n")).as("n"), sum(col("s")).cast("double").as("s"))
    val coarseFull = orders.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("s"))
    assert(coarseMerged.exceptAll(coarseFull).isEmpty &&
      coarseFull.exceptAll(coarseMerged).isEmpty)
  }
}
