package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class GraftFunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftFunctions.registerAll(s)
    s
  }

  override def afterAll(): Unit = spark.stop()

  test("hash60 equals the portable md5-prefix composite (and survives codegen)") {
    import spark.implicits._
    val df = Seq("abc", "", "hello world", "日本語").toDF("s")
    val rows = df.selectExpr(
      "hash60(s) AS custom",
      "CAST(conv(substring(md5(CAST(s AS BINARY)), 1, 15), 16, 10) AS BIGINT) AS composite")
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("relationalize generator: LATERAL VIEW produces all tables with consistent rids") {
    import spark.implicits._
    Seq(
      """{"id": 1, "xs": [10, 20], "nested": {"a": "b"}}""",
      """{"id": 2, "xs": []}""").toDF("doc").createOrReplaceTempView("gen_docs")
    val out = spark.sql(
      "SELECT r.tbl, r.payload FROM gen_docs LATERAL VIEW relationalize(doc, 't') r AS tbl, payload")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.map(_._1).count(_ == "t") == 2)
    assert(out.map(_._1).count(_ == "t_xs") == 2)
    // parent rid in the root payload matches the child rows' __rid_
    val root1 = out.collect { case ("t", p) if p.contains("\"id\":1") => p }.head
    val rid = graft.core.Json.parseRow(root1)("xs").asInstanceOf[graft.core.JString].value
    val children = out.collect { case ("t_xs", p) => graft.core.Json.parseRow(p) }
    assert(children.forall(c => c("xs__rid_") == graft.core.JString(rid)))
    assert(children.map(_.apply("xs__val_")).toSet ==
      Set(graft.core.JLong(10), graft.core.JLong(20)))
    // struct flatten visible in the root payload
    assert(root1.contains("\"nested_a\":\"b\""))
  }

  test("relationalize generator: null input yields no rows") {
    import spark.implicits._
    Seq[Option[String]](None, Some("""{"k": 1}""")).toDF("doc")
      .createOrReplaceTempView("gen_null")
    val n = spark.sql(
      "SELECT r.tbl FROM gen_null LATERAL VIEW relationalize(doc, 't') r AS tbl, payload").count()
    assert(n == 1)
  }
}
