package graft.relationalize

import graft.core._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based structural invariants over random nested JSON documents
  * (SURVEY §5's engine test plan): row-count conservation per array, rid
  * referential integrity, value conservation, schema-merge equivalence.
  */
class RelationalizerPropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 150)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    (0 until n).foreach { _ =>
      f(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  // --- random JSON documents -------------------------------------------

  private val genScalar: Gen[String] = Gen.oneOf(
    Gen.chooseNum(-999L, 999L).map(_.toString),
    Gen.chooseNum(-9.5, 9.5).map(d => f"$d%.2f"),
    Gen.oneOf("true", "false", "null"),
    Gen.alphaLowerStr.map(s => "\"" + s.take(6) + "\""))

  private def genValue(depth: Int): Gen[String] =
    if (depth <= 0) genScalar
    else Gen.frequency(
      5 -> genScalar,
      2 -> Gen.lzy(genArray(depth - 1)),
      3 -> Gen.lzy(genObject(depth - 1)))

  private def genArray(depth: Int): Gen[String] =
    Gen.chooseNum(0, 3).flatMap(n =>
      Gen.listOfN(n, genValue(depth)).map(_.mkString("[", ",", "]")))

  private def genObject(depth: Int): Gen[String] =
    Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.oneOf("a", "b", "c", "d", "e"), genValue(depth)))
        .map(_.distinctBy(_._1).map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")))

  private val genDoc: Gen[String] = genObject(3)

  private val RidPattern = "R_[a-z0-9]{32}".r

  test("rid referential integrity: every __rid_ value appears as exactly one parent rid") {
    forAll(genDoc) { doc =>
      val out = Relationalizer.relationalizeLine(doc, "t", "prop:0")
      val emittedRids = out.flatMap(_._2.values).collect {
        case JString(s) if RidPattern.matches(s) => s
      }
      val childRids = out.flatMap(_._2).collect {
        case (k, JString(s)) if k.endsWith("__rid_") => s
      }
      // every child rid was minted by some parent (as a non-__rid_ column)
      val parentRids = out.flatMap(_._2).collect {
        case (k, JString(s)) if !k.endsWith("__rid_") && RidPattern.matches(s) => s
      }.toSet
      childRids.foreach(r => assert(parentRids.contains(r), s"orphan rid in $doc"))
      assert(emittedRids.distinct.size == emittedRids.toSet.size)
    }
  }

  test("row-count conservation: child rows per rid equal the source array length") {
    forAll(genDoc) { doc =>
      val out = Relationalizer.relationalizeLine(doc, "t", "prop:0")
      // group child rows by their __rid_; indexes must be exactly 0..n-1
      out.flatMap { case (_, row) =>
        row.collectFirst { case (k, JString(r)) if k.endsWith("__rid_") => r }
          .map(r => r -> row.collectFirst { case (k, JLong(i)) if k.endsWith("__index_") => i }.get)
      }.groupBy(_._1).foreach { case (rid, rows) =>
        val idxs = rows.map(_._2).sorted
        assert(idxs == idxs.indices.map(_.toLong).toVector, s"gap in indexes for $rid in $doc")
      }
    }
  }

  test("value conservation: every scalar leaf of the document appears in some flat row") {
    forAll(genDoc) { doc =>
      val out = Relationalizer.relationalizeLine(doc, "t", "prop:0")
      val emitted = out.flatMap(_._2.values)
      val leafStrings = "\"([a-z]{1,6})\"".r.findAllMatchIn(doc)
        .map(_.group(1)).filterNot(Set("a", "b", "c", "d", "e")).toList
      leafStrings.foreach { s =>
        assert(emitted.contains(JString(s)) ||
          // flatten collision (last-write-wins) may legitimately drop values
          doc.contains(s"_"), s"lost leaf $s from $doc")
      }
    }
  }

  test("schema inference over emitted rows is partition-order independent") {
    forAll(Gen.listOfN(8, genDoc)) { docs =>
      val rows = docs.zipWithIndex.flatMap { case (d, i) =>
        Relationalizer.relationalizeLine(d, "t", s"k:$i")
      }
      val byTable = rows.groupBy(_._1)
      byTable.foreach { case (_, tableRows) =>
        val seq = tableRows.foldLeft(ChoiceSchema.empty)((s, r) => s.observe(r._2))
        val shards = tableRows.grouped(3).map(g =>
          g.foldLeft(ChoiceSchema.empty)((s, r) => s.observe(r._2))).toList
        val merged = ChoiceSchema.merge(shards)
        assert(seq.columns.toMap == merged.columns.toMap)
        // convert round-trip: every row converts without error under the schema
        tableRows.foreach(r => seq.convert(r._2))
      }
    }
  }
}
