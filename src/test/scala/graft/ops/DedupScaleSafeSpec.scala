package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The scale-safe dedup variants must produce exactly the rows of their
  * quadratic all-pairs counterparts: prefix filtering (Jaccard >= 0.5) and
  * 11-band pigeonhole (hamming <= 10 over 32 bits) are provably lossless;
  * the hyperplane-LSH config is pinned to full recall on this corpus.
  */
class DedupScaleSafeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def rowSet(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("simhash multi-index banding equals the all-pairs hamming join") {
    val banded = rowSet(DedupQueries.simhashLsh(spark, dir))
    val quadratic = rowSet(DedupQueries.simhashPairs(spark, dir))
    assert(banded == quadratic,
      s"missing=${quadratic -- banded}, extra=${banded -- quadratic}")
  }

  test("simhash banding stays lossless at a non-default hamming threshold") {
    // pigeonhole regenerates the band layout from the threshold: 6 bands
    // over 32 bits for hamming <= 5 must still find EXACTLY the all-pairs
    // result filtered to that distance
    val banded = rowSet(DedupQueries.simhashLsh(spark, dir, hammingMax = 5))
    val quadratic = rowSet(DedupQueries.simhashPairs(spark, dir)
      .filter(org.apache.spark.sql.functions.col("hamming") <= 5))
    assert(banded == quadratic,
      s"missing=${quadratic -- banded}, extra=${banded -- quadratic}")
  }

  test("hammingMax=0: one 32-bit band keys on the full signature, not a collapsed mask") {
    // (1 << 32) in Int arithmetic wraps to 1, so the single band's mask would
    // be 0 and every key would collapse to 0 — the candidate join silently
    // degenerating to the per-language all-pairs it exists to avoid. The mask
    // is Long now: the band key must be the signature itself.
    import org.apache.spark.sql.functions.{col, countDistinct}
    val sigs = DedupQueries.simhash(spark, dir)
    val bands = DedupQueries.simhashBands(sigs, hammingMax = 0)
    val nKeys = bands.agg(countDistinct(col("key"))).head().getLong(0)
    val nSigs = sigs.agg(countDistinct(col("simhash"))).head().getLong(0)
    assert(nKeys == nSigs, s"band keys collapsed: $nKeys keys for $nSigs signatures")
    // and the output is exactly the signature-equality pairs
    val banded = rowSet(DedupQueries.simhashLsh(spark, dir, hammingMax = 0))
    val quadratic = rowSet(DedupQueries.simhashPairs(spark, dir)
      .filter(org.apache.spark.sql.functions.col("hamming") === 0))
    assert(banded == quadratic,
      s"missing=${quadratic -- banded}, extra=${banded -- quadratic}")
  }

  test("splitting minhash bands only adds verified pairs (recall dial is monotone)") {
    // a matching 4-row band key implies both 2-row sub-keys match, so the
    // finer banding's candidate set — and its verified output — is a superset
    val default = rowSet(DedupQueries.minhashLsh(spark, dir))
    val finer = rowSet(DedupQueries.minhashLsh(spark, dir,
      DedupQueries.MinHashConfig(k = 32, bands = 16)))
    assert(default.subsetOf(finer),
      s"finer banding lost pairs: ${default -- finer}")
  }

  test("wider hyperplane bands only lose pairs (the production-threshold dial is monotone)") {
    // 8x6 bands align on the 16x3 layout (each 6-bit band is two adjacent
    // 3-bit bands), so a 6-bit match implies both 3-bit matches: the wide
    // config's candidates — and its identically-verified output — must be a
    // subset of the default's
    val narrow = rowSet(DedupQueries.dedupEmbeddingLsh(spark, dir))
    val wide = rowSet(DedupQueries.dedupEmbeddingLsh(spark, dir,
      DedupQueries.EmbeddingLshConfig(bands = 8)))
    assert(wide.subsetOf(narrow), s"wide bands invented pairs: ${wide -- narrow}")
  }

  test("prefix-filtered Jaccard equals the full postings self-join") {
    val prefixed = rowSet(DedupQueries.dedupJaccardPrefix(spark, dir))
    val quadratic = rowSet(DedupQueries.dedupJaccard(spark, dir))
    assert(prefixed == quadratic,
      s"missing=${quadratic -- prefixed}, extra=${prefixed -- quadratic}")
  }

  test("hyperplane-LSH embedding near-dup equals the label-blocked all-pairs") {
    val lsh = rowSet(DedupQueries.dedupEmbeddingLsh(spark, dir))
    val quadratic = rowSet(DedupQueries.dedupEmbedding(spark, dir))
    assert(lsh == quadratic,
      s"missing=${quadratic -- lsh}, extra=${lsh -- quadratic}")
  }

  test("connected components: chain graph (high diameter), two components, singleton") {
    import spark.implicits._
    // chain 1-2-3-...-8 forces multiple propagation rounds (diameter 7);
    // component {20, 21, 22} is a triangle; 99 is isolated
    val edges = (1L to 7L).map(i => (i, i + 1)) ++
      Seq((20L, 21L), (21L, 22L), (20L, 22L))
    val vertices = ((1L to 8L) ++ Seq(20L, 21L, 22L, 99L)).toDF("id")
    val got = DedupQueries
      .connectedComponents(edges.toDF("src", "dst"), vertices)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (1L to 8L).map(_ -> 1L).toMap ++
      Seq(20L, 21L, 22L).map(_ -> 20L).toMap + (99L -> 99L)
    assert(got == want)
  }

  test("connected components: pointer doubling resolves a 256-vertex path in O(log n) rounds") {
    import spark.implicits._
    // a worst-case near-dup CHAIN: plain min propagation needs ~255 rounds
    // of full-graph shuffles here; propagation + label-of-label compression
    // must stay logarithmic (2^8 vertices -> well under 16 rounds)
    val n = 256L
    val edges = (0L until n - 1).map(i => (i, i + 1)).toDF("src", "dst")
    val vertices = (0L until n).toDF("id")
    val (labels, rounds) =
      DedupQueries.connectedComponentsWithRounds(edges, vertices)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == n && got.forall(_._2 == 0L),
      "every chain vertex joins component 0")
    assert(rounds <= 16, s"chain of $n took $rounds rounds — not logarithmic")
  }

  test("connected components releases its loop caches (no leak across a session)") {
    import spark.implicits._
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.size
    val edges = (1L to 7L).map(i => (i, i + 1)).toDF("src", "dst")
    val vertices = (1L to 8L).toDF("id")
    val labels = DedupQueries.connectedComponents(edges, vertices)
    assert(labels.count() == 8)
    // the symmetric edge list and every label generation must be gone; the
    // only surviving entry is the checkpointed result itself (released by
    // the ContextCleaner when the caller drops the DataFrame)
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 1,
      s"CC leaked ${after - before} cached RDDs: ${spark.sparkContext.getPersistentRDDs.keys}")
  }
}
