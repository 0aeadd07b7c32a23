package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 pins, part 1: the dual-engine whitespace class.
  *
  * Java's `\s` includes vertical tab (\x0B) while RE2's (DuckDB's regex
  * engine) excludes it — the one byte where the engines' shorthand classes
  * disagree. Round 10 swept every dual-engine regex to the explicit class
  * [[Tokenize.WsClass]]; these pins keep the sweep from regressing:
  * a `\x0B`-bearing document must tokenize/canonicalize as whitespace on
  * the Spark side, and no oracle may reintroduce the `\s` shorthand.
  */
class Round10Spec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("Tokenize.Whitespace splits on every class member incl. \\x0B") {
    import spark.implicits._
    val df = Seq((1L, "a\u000Bb\tc\nd\fe\rf  g")).toDF("doc_id", "text")
    val toks = df.selectExpr(s"${Tokenize.Whitespace.sql("text")} AS t")
      .collect()(0).getSeq[String](0)
    assert(toks == Seq("a", "b", "c", "d", "e", "f", "g"),
      s"every whitespace byte must separate tokens, got $toks")
  }

  test("exact-dedup canonicalizer treats \\x0B as whitespace (merges with space form)") {
    import spark.implicits._
    val df = Seq((1L, "hello\u000Bworld"), (2L, "hello world"),
                 (3L, "hello  world"), (4L, "different")).toDF("doc_id", "text")
    val out = DedupQueries.dedupExactFrom(df).collect()
    assert(out.length == 2, s"docs 1-3 must share one fingerprint, got ${out.toSeq}")
    val big = out.find(_.getLong(2) == 3L)
    assert(big.exists(_.getLong(1) == 1L), "keeper of the merged group is min doc_id")
  }

  test("no oracle SQL reintroduces the \\s shorthand (dual-engine divergence)") {
    val offenders = graft.SparkEntry.oracleSql.collect {
      case (name, sql) if sql.contains("\\s") || sql.contains("\\S") => name
    }
    assert(offenders.isEmpty,
      s"oracles must spell whitespace as [${Tokenize.WsClass}]: $offenders")
  }

  test("WsClassSql is WsClass re-escaped for Spark SQL literals") {
    assert(Tokenize.WsClassSql == Tokenize.WsClass.replace("\\", "\\\\"))
    // and the Spark SQL literal round-trips to the same regex source text
    val parsed = spark.sql(s"SELECT '[${Tokenize.WsClassSql}]+' AS p")
      .collect()(0).getString(0)
    assert(parsed == s"[${Tokenize.WsClass}]+")
  }
}
