package graft.db

import org.scalatest.funsuite.AnyFunSuite

/** DDL parse validation (the reference's pydantic DDL models,
  * sayn/database/__init__.py:75-98; shapes from tests/test_ddl.py:19-278).
  */
class DdlSpec extends AnyFunSuite {

  test("parses names, types, renames and tests") {
    val Right(ddl) = Ddl.fromMap(Map("columns" -> Seq(
      "plain",
      Map("name" -> "id", "type" -> "BIGINT", "tests" -> Seq("unique", "not_null")),
      Map("name" -> "src", "dst_name" -> "renamed"),
      Map("name" -> "status",
        "tests" -> Seq(Map("allowed_values" -> Seq("a", "b")))))))
    assert(ddl.columns.map(_.name) == Seq("plain", "id", "src", "status"))
    assert(ddl.columns(1).tests == Seq(UniqueTest, NotNullTest))
    assert(ddl.columns(2).dstName.contains("renamed"))
    assert(ddl.columns(3).tests == Seq(AllowedValuesTest(Seq("a", "b"))))
  }

  test("rejects duplicate column names (test_ddl.py duplicate cases)") {
    val r = Ddl.fromMap(Map("columns" -> Seq(
      Map("name" -> "id"), "x", Map("name" -> "id", "type" -> "INT"))))
    assert(r.isLeft)
    assert(r.left.exists(_.toString.contains("duplicate")))
  }

  test("rejects unknown test types at parse") {
    assert(Ddl.fromMap(Map("columns" -> Seq(
      Map("name" -> "id", "tests" -> Seq("uniqe"))))).isLeft)
    assert(Ddl.fromMap(Map("columns" -> Seq(
      Map("name" -> "id", "tests" -> Seq(Map("values" -> Seq(1)))))))
      .isLeft)
  }

  test("rejects column entries without a name") {
    assert(Ddl.fromMap(Map("columns" -> Seq(Map("type" -> "INT")))).isLeft)
  }

  test("typeWarnings surface dropped VARCHAR lengths and TIME") {
    val Right(ddl) = Ddl.fromMap(Map("columns" -> Seq(
      Map("name" -> "a", "type" -> "VARCHAR(64)"),
      Map("name" -> "b", "type" -> "TIME"),
      Map("name" -> "c", "type" -> "VARCHAR"), // no length → nothing dropped
      Map("name" -> "d", "type" -> "BIGINT"))))
    val w = ddl.typeWarnings
    assert(w.size == 2)
    assert(w.exists(m => m.contains("column a") && m.contains("VARCHAR(64)")))
    assert(w.exists(_.contains("TIME")))
    assert(Ddl.empty.typeWarnings.isEmpty)
  }

  test("sparkType maps warehouse spellings, keeps decimal precision") {
    assert(Ddl.sparkType("varchar(12)") == "STRING")
    assert(Ddl.sparkType("NUMERIC(10,2)") == "DECIMAL(10,2)")
    assert(Ddl.sparkType("NUMBER") == "DECIMAL(38,18)")
    assert(Ddl.sparkType("int4") == "INT")
    assert(Ddl.sparkType("timestamptz") == "TIMESTAMP")
    // datetime.time has no Spark type: documented STRING divergence
    // (SURVEY §1.2), warned via typeWarnings above
    assert(Ddl.sparkType("TIME") == "STRING")
  }
}
