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
    // Verify ships BOTH maps to DuckDB — the fenced baselines' oracles
    // can flake the gate exactly like the public ones
    val offenders = (graft.SparkEntry.oracleSql ++
        graft.ops.DedupQueries.baselineOracleSql).collect {
      case (name, sql) if sql.contains("\\s") || sql.contains("\\S") => name
    }
    assert(offenders.isEmpty,
      s"oracles must spell whitespace as [${Tokenize.WsClass}]: $offenders")
  }

  // --- true GPT-2 piece boundaries (lookahead closed) -------------------

  test("gpt2 pieces match true \\s+(?!\\S) lookahead boundaries on pinned fixtures") {
    import spark.implicits._
    // expectations computed with the REAL GPT-2 pattern (with lookahead)
    // via java.util.regex, which supports (?!\S); the engine expression
    // must reproduce them through the RE2-safe base + post-pass
    val fixtures = Seq(
      "a   b" -> Seq("a", "  ", " b"),
      "hello  world" -> Seq("hello", " ", " world"),
      // interior run's last space fuses into the following word piece;
      // a fused space before a contraction re-splits it: " '" + letters
      "a  's b" -> Seq("a", " ", " '", "s", " b"),
      "it's  fine, isn't   it?" ->
        Seq("it", "'s", " ", " fine", ",", " isn", "'t", "  ", " it", "?"),
      // non-space leftovers stand alone (` ?` only absorbs a literal space)
      "a \nb" -> Seq("a", " ", "\n", "b"),
      "a\n b" -> Seq("a", "\n", " b"),
      "tab\t\tx and  \t y" -> Seq("tab", "\t", "\t", "x", " and", "  \t", " y"),
      // terminal runs keep all their whitespace (lookahead succeeds at EOS)
      "end with spaces   " -> Seq("end", " with", " spaces", "   "),
      "   lead" -> Seq("  ", " lead"),
      "''quoted''  'll 'x" -> Seq("''", "quoted", "''", " ", " '", "ll", " '", "x"),
      // a re-split contraction's freed letters FUSE with a following
      // space-less letter run (`\p{L}+` runs through the base boundary) —
      // but not with digits, punct, or another contraction
      "a  'lldon't" -> Seq("a", " ", " '", "lldon", "'t"),
      "a  'll42" -> Seq("a", " ", " '", "ll", "42"),
      "a  'll'd" -> Seq("a", " ", " '", "ll", "'d"),
      "   " -> Seq("   "),
      "" -> Seq())
    // the java.util.regex ground truth, lookahead included — the spec's
    // own independent reference, not the implementation under test
    val truthPat = java.util.regex.Pattern.compile(
      "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\t\\n\\x0B\\f\\r \\p{L}\\p{N}]+" +
        "|[\\t\\n\\x0B\\f\\r ]+(?![^\\t\\n\\x0B\\f\\r ])|[\\t\\n\\x0B\\f\\r ]+")
    fixtures.foreach { case (text, want) =>
      val m = truthPat.matcher(text)
      val truth = Iterator.continually(m).takeWhile(_.find()).map(_.group()).toSeq
      assert(truth == want, s"fixture expectation wrong for '$text': regex says $truth")
    }
    val got = fixtures.map(_._1).toDF("text")
      .selectExpr("text", s"${TextQueries.gpt2PiecesSqlOf("text")} AS pieces")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    fixtures.foreach { case (text, want) =>
      assert(got(text) == want, s"'$text': got ${got(text)}, want $want")
      assert(got(text).mkString == text, s"'$text': pieces must concatenate losslessly")
    }
  }

  test("gpt2 pieces match the lookahead ground truth on 400 randomized fixtures") {
    import spark.implicits._
    // deterministic pseudo-random corpus over the constructs the post-pass
    // arbitrates: words, digits, punct, contractions, quotes, and ws runs
    // of every class member at lengths 1..4 — one DataFrame pass for all
    val atoms = Vector("ab", "Cd", "9", "42", "!", "?!", "'s", "'ll", "'x",
      "''", "don't", " ", "  ", "   ", "\t", "\t ", " \t", "\n\n ", "",
      "  ", "\f", "\r ", "    ")
    val rnd = new scala.util.Random(20261015L)
    val fixtures = (1 to 400).map { _ =>
      (0 until (1 + rnd.nextInt(12))).map(_ => atoms(rnd.nextInt(atoms.length))).mkString
    }.distinct
    val truthPat = java.util.regex.Pattern.compile(
      "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\t\\n\\x0B\\f\\r \\p{L}\\p{N}]+" +
        "|[\\t\\n\\x0B\\f\\r ]+(?![^\\t\\n\\x0B\\f\\r ])|[\\t\\n\\x0B\\f\\r ]+")
    def truth(text: String): Seq[String] = {
      val m = truthPat.matcher(text)
      Iterator.continually(m).takeWhile(_.find()).map(_.group()).toSeq
    }
    val got = fixtures.toDF("text")
      .selectExpr("text", s"${TextQueries.gpt2PiecesSqlOf("text")} AS pieces")
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    fixtures.foreach { text =>
      assert(got(text) == truth(text),
        s"divergence on ${text.map(c => f"\\u${c.toInt}%04x").mkString}: " +
          s"got ${got(text)}, want ${truth(text)}")
    }
  }

  // --- codegen'd box-filter resize --------------------------------------

  test("box_resize matches the retired hex-string SQL derivation byte-for-byte") {
    val dir = "/root/testdata/sf0.001"
    val fast = MultimodalQueries.mediaResizeReal(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))).toMap
    val anchor = MultimodalQueries.mediaResizeRealSqlAnchor(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4))).toMap
    assert(fast.nonEmpty && fast == anchor,
      "codegen'd BoxResize must reproduce the SQL hex derivation exactly")
  }

  test("BoxResize/ByteSum kernels: exact block means, truncation, edge cases") {
    import graft.functions.{BoxResizeImpl, ByteSumImpl}
    // 4x3 plane, factor 2 -> 2x1: trailing row dropped, means exact-integer
    val plane = Array[Byte](
      10, 20, 30, 40,
      50, 60, 70, 80,
      90, 91, 92, 93)
    val out = BoxResizeImpl.resize(plane, 4, 2)
    assert(out.toSeq == Seq[Byte](((10 + 20 + 50 + 60) / 4).toByte, ((30 + 40 + 70 + 80) / 4).toByte))
    // unsigned bytes: 0xFF block averages to 255, not -1/4
    val bright = BoxResizeImpl.resize(Array.fill[Byte](4)(0xFF.toByte), 2, 2)
    assert((bright(0) & 0xff) == 255)
    assert(BoxResizeImpl.resize(Array.empty[Byte], 4, 2) == null)
    assert(BoxResizeImpl.resize(plane, 4, 5) == null, "block larger than plane -> null")
    assert(ByteSumImpl.sum(Array[Byte](0xFF.toByte, 1, 0)) == 256L)
    assert(ByteSumImpl.sum(Array.empty[Byte]) == 0L)
    // Long accumulator: 255 * 2903^2 > Int.MaxValue — an Int sum wraps
    // negative and emits garbage where the exact block mean is 255
    val big = 2903
    val full = BoxResizeImpl.resize(
      Array.fill(big * big)(0xFF.toByte), big, big)
    assert(full.length == 1 && (full(0) & 0xff) == 255,
      s"factor-$big full block must average to 255, got ${full(0) & 0xff}")
  }

  test("box_resize and byte_sum run inside whole-stage codegen") {
    graft.functions.GraftFunctions.registerAll(spark)
    // range source so the chain can't constant-fold into a LocalTableScan
    val df = spark.range(4, 5)
      .selectExpr("id", "unhex(lpad(hex(id), 8, '0')) AS p") // bytes [0,0,0,4]
      .selectExpr("id", "byte_sum(box_resize(p, 2, 2)) AS s")
    assert(df.collect()(0).getLong(1) == (0 + 0 + 0 + 4) / 4)
    // the *(1) star marks the WholeStageCodegen span in the plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"expected codegen span:\n$plan")
  }

  // --- the rich-vocabulary text arm --------------------------------------

  test("rich corpus: deterministic shape, thousands-word vocabulary, planted near-dup structure") {
    val dir = "/root/testdata/sf0.001"
    val docs = TextQueries.richCorpus(spark, dir)
    val rows = docs.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(rows.size == 300, s"customer x 2 sides at sf0.001: ${rows.size}")
    val vocab = rows.values.flatMap(_.split(' ')).toSet
    assert(vocab.size > 500 && vocab.size <= TextQueries.RichVocab,
      s"vocabulary must be dictionary-sized, got ${vocab.size}")
    assert(vocab.forall(w => w.length == 10 && w.forall("0123456789abcdef".contains(_))),
      "hex pseudo-words, 10 chars")
    // determinism: a second derivation is bit-identical
    assert(TextQueries.richCorpus(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap == rows)
    // planted pairs (g % 5 = 0): sides share >= 14 of 16 positions
    val g5 = rows.keys.filter(id => id % 2 == 0 && (id / 2) % 5 == 0)
    g5.foreach { a =>
      val (sa, sb) = (rows(a).split(' '), rows(a + 1).split(' '))
      val shared = sa.zip(sb).count { case (x, y) => x == y }
      assert(shared >= 14, s"planted pair ($a,${a + 1}) shares only $shared positions")
    }
    // an unplanted pair's overlap sits at the random floor
    val g1 = rows.keys.find(id => id % 2 == 0 && (id / 2) % 5 == 1).get
    val inter = rows(g1).split(' ').toSet.intersect(rows(g1 + 1).split(' ').toSet)
    assert(inter.size <= 3, s"unplanted pair overlap ${inter.size} above the random floor")
  }

  test("rich arm jaccard: true pairs are the LINEAR planted set; prefix filter prunes the block universe") {
    val dir = "/root/testdata/sf0.001"
    val pairs = DedupQueries.dedupJaccardRich(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every true pair is a planted (2g, 2g+1) with g % 5 = 0 — no quadratic blob
    assert(pairs.nonEmpty && pairs.forall { case (a, b) =>
      b == a + 1 && a % 2 == 0 && (a / 2) % 5 == 0 },
      s"only planted sides may clear J >= 0.5: ${pairs.take(5)}")
    val st = DedupQueries.dedupJaccardRichStats(spark, dir).collect()(0)
    val (nDocs, nBlock, nCand, nTrue) =
      (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3))
    assert(nDocs == 300 && nTrue == pairs.size.toLong)
    assert(nCand < nBlock / 10,
      s"prefix+length filter must prune the block universe: $nCand of $nBlock")
    assert(nTrue <= nCand, "verification only ever shrinks the candidate set")
  }

  test("rich arm BPE: merges stay live (counts >= 2) far past the 31-word corpus's exhaustion shape") {
    val dir = "/root/testdata/sf0.001"
    val m = BpeTokenizer.learnFrom(TextQueries.richCorpus(spark, dir), nMerges = 24)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(m.length == 24 && m.forall(_._3 >= 2),
      s"24 live merges expected on the rich arm, got ${m.length}; min n = ${m.map(_._3).min}")
    // ranks are the learning order, 1-based and contiguous
    assert(m.map(_._1).toSeq == (1 to 24), "contiguous ranks")
  }

  test("WsClassSql is WsClass re-escaped for Spark SQL literals") {
    assert(Tokenize.WsClassSql == Tokenize.WsClass.replace("\\", "\\\\"))
    // and the Spark SQL literal round-trips to the same regex source text
    val parsed = spark.sql(s"SELECT '[${Tokenize.WsClassSql}]+' AS p")
      .collect()(0).getString(0)
    assert(parsed == s"[${Tokenize.WsClass}]+")
  }
}
