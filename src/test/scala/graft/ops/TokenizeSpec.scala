package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The tokenizer dial ([[Tokenize]]): whitespace (pinned catalog default)
  * vs Unicode word boundaries.
  *
  * Two pins: (1) on the pure-`[a-z0-9 ]` testdata corpus the modes are
  * token-for-token IDENTICAL — so flipping the dial cannot drift any
  * catalog oracle on this corpus; (2) on constructed multilingual text the
  * modes DIVERGE exactly as documented (CJK sentences stop being one
  * "token", punctuation-glued words split) — the reason the dial exists.
  */
class TokenizeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tokensOf(text: String, tok: Tokenizer): Seq[String] = {
    import spark.implicits._
    Seq((0L, text)).toDF("doc_id", "text")
      .selectExpr(tok.sql("text") + " AS t").collect().head.getSeq[String](0)
  }

  test("both modes produce identical token stats on the ASCII corpus") {
    val docs = Tables(spark, dir, "documents")
    val ws = TextQueries.tokenStatsFrom(docs, Tokenize.Whitespace)
    val uw = TextQueries.tokenStatsFrom(docs, Tokenize.UnicodeWords)
    assert(ws.exceptAll(uw).isEmpty && uw.exceptAll(ws).isEmpty,
      "whitespace and unicode-word tokenization must agree on [a-z0-9 ] text")
  }

  test("both modes produce identical quality-model scores on the ASCII corpus") {
    val docs = Tables(spark, dir, "documents")
    val ws = TextQueries.qualityModelFrom(docs, Tokenize.Whitespace)
    val uw = TextQueries.qualityModelFrom(docs, Tokenize.UnicodeWords)
    assert(ws.exceptAll(uw).isEmpty && uw.exceptAll(ws).isEmpty)
  }

  test("unicode mode splits punctuation-glued and accented tokens") {
    val text = "don't stop-now; café 3x rien"
    assert(tokensOf(text, Tokenize.Whitespace) ==
      Seq("don't", "stop-now;", "café", "3x", "rien"))
    assert(tokensOf(text, Tokenize.UnicodeWords) ==
      Seq("don", "t", "stop", "now", "café", "3x", "rien"),
      "\\p{L} must keep accented letters inside a token and split on ASCII punctuation")
  }

  test("unicode mode does not glue an unspaced CJK+latin run to punctuation") {
    // whitespace mode sees ONE token for an unspaced CJK clause + trailing
    // comma; unicode mode at least strips the punctuation and keeps the
    // letter/digit run intact (per-character CJK segmentation needs a real
    // segmenter — out of scope for a regex dial, documented in Tokenize)
    val text = "机器学习model42, end."
    assert(tokensOf(text, Tokenize.Whitespace) == Seq("机器学习model42,", "end."))
    assert(tokensOf(text, Tokenize.UnicodeWords) == Seq("机器学习model42", "end"))
  }

  test("unicode mode drops empty fragments at pattern-adjacent boundaries") {
    assert(tokensOf("\"quoted\" (parens)!", Tokenize.UnicodeWords) ==
      Seq("quoted", "parens"))
    assert(tokensOf("", Tokenize.UnicodeWords) == Seq.empty)
    assert(tokensOf("!!!", Tokenize.UnicodeWords) == Seq.empty)
  }
}
