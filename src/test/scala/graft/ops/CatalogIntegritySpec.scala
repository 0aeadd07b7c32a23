package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Catalog wiring guards (no Spark session): `SparkEntry` concatenates 13
  * per-domain maps with `++`, which SILENTLY shadows duplicate keys — a
  * collision would drop an entry from the gate with no failure anywhere.
  * These checks were previously a manual end-of-round spark-shell ritual;
  * now every `sbt test` runs them.
  */
class CatalogIntegritySpec extends AnyFunSuite {

  private val queryMaps = Seq(
    "RelationalizeQueries" -> RelationalizeQueries.queries,
    "RelationalQueries" -> RelationalQueries.queries,
    "DedupQueries" -> DedupQueries.queries,
    "TextQueries" -> TextQueries.queries,
    "CurationQueries" -> CurationQueries.queries,
    "SimilarityQueries" -> SimilarityQueries.queries,
    "MultimodalQueries" -> MultimodalQueries.queries,
    "ProfileQueries" -> ProfileQueries.queries,
    "IterativeQueries" -> IterativeQueries.queries,
    "LayoutQueries" -> LayoutQueries.queries,
    "BpeTokenizer" -> BpeTokenizer.queries,
    "QualityTrain" -> QualityTrain.queries,
    "StreamingGate" -> graft.streaming.StreamingGate.queries)

  test("no key is shadowed across the concatenated query maps") {
    val all = queryMaps.flatMap { case (owner, m) => m.keys.map(_ -> owner) }
    val dups = all.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty, s"duplicate catalog keys (++ would shadow): " +
      dups.map { case (k, os) => s"$k in ${os.map(_._2).mkString("+")}" }.mkString(", "))
    assert(graft.SparkEntry.queries.size == all.size,
      "SparkEntry.queries concatenates a map this spec does not know about — " +
        "add it here so the shadowing check keeps covering everything")
  }

  test("every public entry and fenced baseline has an oracle, and none is orphaned") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert(q.diff(o).isEmpty,
      s"entries with NO DuckDB oracle (would gate rows-only/weak): ${q.diff(o)}")
    assert(o.diff(q).isEmpty, s"oracles without an entry: ${o.diff(q)}")
    assert(graft.SparkEntry.oracleBaselines.keySet ==
      graft.SparkEntry.baselineOracleSql.keySet,
      "fenced baselines and their oracles diverged")
  }

  test("bench headline names resolve, are unique, and memoized is a headline subset") {
    val q = graft.SparkEntry.queries.keySet
    val missing = graft.Bench.headline.filterNot(q.contains)
    assert(missing.isEmpty, s"headline names not in the catalog: $missing")
    val dup = graft.Bench.headline.diff(graft.Bench.headline.distinct)
    assert(dup.isEmpty, s"duplicate headline names (would double-count): $dup")
    val strayMemo = graft.Bench.memoized.diff(graft.Bench.headline.toSet)
    assert(strayMemo.isEmpty, s"memoized names outside the headline: $strayMemo")
  }
}
