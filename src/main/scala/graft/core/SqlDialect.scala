package graft.core

/** SQL dialect abstraction for DDL generation.
  *
  * Mirrors the surface of the reference's `SQLDialect` ABC
  * (`relationalize/sql_dialects.py:12-36`): a base-type -> column-type map, a
  * per-column renderer, and a CREATE TABLE template.
  */
trait SqlDialect extends Serializable {
  /** base tag (bool/int/float/str/none/datetime) -> dialect column type */
  def typeMapping: Map[String, String]

  def ddlColumn(columnName: String, columnType: String): String = {
    val cleaned = columnName.replace("\"", "\"\"")
    s""""$cleaned" $columnType"""
  }

  def columnSeparator: String = "\n    , "

  def createTable(schemaName: String, tableName: String, columns: Seq[String]): String =
    s"""CREATE TABLE IF NOT EXISTS "$schemaName"."$tableName" (
       |    ${columns.mkString(columnSeparator)}
       |);""".stripMargin
}

/** Postgres/Redshift-flavored dialect (`sql_dialects.py:47-70`). */
object PostgresDialect extends SqlDialect {
  val typeMapping: Map[String, String] = Map(
    "int" -> "BIGINT",
    "datetime" -> "TIMESTAMP",
    "float" -> "FLOAT",
    "str" -> "VARCHAR(65535)",
    "bool" -> "BOOLEAN",
    "none" -> "BOOLEAN", // all-null column: arbitrary placeholder, per reference
  )
}

/** DuckDB-flavored dialect — same shape, ANSI types. */
object DuckDbDialect extends SqlDialect {
  val typeMapping: Map[String, String] = Map(
    "int" -> "BIGINT",
    "datetime" -> "TIMESTAMP",
    "float" -> "DOUBLE",
    "str" -> "VARCHAR",
    "bool" -> "BOOLEAN",
    "none" -> "BOOLEAN",
  )
}
