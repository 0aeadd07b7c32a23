package graft.ops

/** The tokenizer dial shared by the text / dedup / curation surfaces.
  *
  * Every text operator tokenizes through one of these SQL fragments. The
  * pinned catalog default is [[Tokenize.Whitespace]] — correct for the
  * space-separated synthetic corpus and the common pre-cleaned crawl — but
  * `split('\\s+')` is WRONG for CJK text (no spaces: a whole sentence
  * becomes one "token") and for combining marks / punctuation-glued tokens
  * on a real multilingual crawl. [[Tokenize.UnicodeWords]] is the
  * multilingual dial: maximal runs of Unicode letters/digits. Both patterns
  * stay inside the RE2 ∩ java.util.regex dialect intersection (`\p{L}` /
  * `\p{N}` mean the same Unicode categories in both), the house rule that
  * keeps a DuckDB twin expressible when an oracle needs one.
  *
  * The catalog entries all run the pinned default, so their DuckDB oracles
  * are unchanged; the dial is exercised by TokenizeSpec (ASCII-corpus
  * equivalence + a constructed-Unicode divergence pin).
  */
sealed trait Tokenizer {
  /** SQL fragment producing `array<string>` of tokens from a text column. */
  def sql(col: String): String
}

object Tokenize {

  /** The explicit whitespace class shared by EVERY dual-engine regex pair:
    * regex source `[\t\n\x0B\f\r ]`. Java's `\s` includes vertical tab
    * (\x0B) while RE2's (DuckDB's regex engine) EXCLUDES it, so any regex
    * spelled `\s` on one engine and `\s` on the other silently diverges the
    * moment a corpus carries a vertical tab. Both engines interpret this
    * explicit class identically (Java semantics: \x0B IS whitespace).
    *
    * The value holds the escape TEXT (backslash-t, backslash-n, …). Use it
    * raw inside DuckDB SQL literals (standard SQL literals do not process
    * backslashes — RE2 receives the escapes) and in Scala-side regex APIs
    * (`rlike`, `Column` functions). Use [[WsClassSql]] when embedding in a
    * Spark SQL string literal, whose parser consumes one escaping level.
    */
  val WsClass: String = "\\t\\n\\x0B\\f\\r "

  /** [[WsClass]] re-escaped for Spark SQL string literals (`selectExpr`). */
  val WsClassSql: String = WsClass.replace("\\", "\\\\")

  /** Split on whitespace runs (the pinned default). `trim` first: Spark's
    * `split` keeps leading/trailing empty strings.
    */
  case object Whitespace extends Tokenizer {
    def sql(col: String): String = s"split(trim($col), '[$WsClassSql]+')"
  }

  /** Unicode word tokens: maximal runs of letters (`\p{L}`) and digits
    * (`\p{N}`) — separators are everything else (punctuation, symbols,
    * whitespace). The filter drops the empty fragments Spark's `split`
    * emits at pattern-adjacent boundaries (e.g. a leading quote).
    * On pure `[a-z0-9 ]` text this is token-for-token identical to
    * [[Whitespace]] (spec-pinned); on "don't stop-now" it yields
    * [don, t, stop, now] where whitespace yields [don't, stop-now].
    */
  case object UnicodeWords extends Tokenizer {
    def sql(col: String): String =
      s"filter(split($col, '[^\\\\p{L}\\\\p{N}]+'), t -> t <> '')"
  }
}
