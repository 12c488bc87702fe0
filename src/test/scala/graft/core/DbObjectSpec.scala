package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the behavior matrix of the reference's object-naming tests
  * (/root/reference/tests/test_db_object.py:31-194) without copying them.
  */
class DbObjectSpec extends AnyFunSuite {

  val plain = new DbObjectCompiler("wh")

  test("table-only reference") {
    val Right(o) = plain.fromString("t1")
    assert(o == DbObject("wh", None, None, Some("t1")))
    assert(o.raw == "t1")
    assert(o.key == "wh:t1")
  }

  test("schema.table reference") {
    val Right(o) = plain.fromString("s1.t1")
    assert(o == DbObject("wh", None, Some("s1"), Some("t1")))
    assert(o.raw == "s1.t1")
  }

  test("db.schema.table reference") {
    val Right(o) = plain.fromString("d1.s1.t1")
    assert(o == DbObject("wh", Some("d1"), Some("s1"), Some("t1")))
  }

  test("connection-qualified reference") {
    val Right(o) = plain.fromString("other:t1")
    assert(o.connection == "other")
  }

  test("trailing dot = schema-level reference") {
    val Right(o) = plain.fromString("s1.")
    assert(o == DbObject("wh", None, Some("s1"), None))
    val Right(o2) = plain.fromString("d1.s1.")
    assert(o2 == DbObject("wh", Some("d1"), Some("s1"), None))
  }

  test("double trailing dot = database-level reference") {
    val Right(o) = plain.fromString("d1..")
    assert(o == DbObject("wh", Some("d1"), None, None))
    assert(o.raw == "d1..")
  }

  test("level parameter without dots") {
    val Right(o) = plain.fromString("s1", level = Some("schema"))
    assert(o == DbObject("wh", None, Some("s1"), None))
    val Right(o2) = plain.fromString("d1", level = Some("db"))
    assert(o2 == DbObject("wh", Some("d1"), None, None))
  }

  test("level/dots mismatch errors") {
    assert(plain.fromString("d1.s1..", level = Some("schema")).isLeft)
  }

  test("overflow errors: too many components for level") {
    assert(plain.fromString("d1.s1.t1.", level = Some("schema")).isLeft)
    assert(plain.fromString("d1.s1.t1", level = Some("db")).isLeft)
  }

  test("connection mismatch errors") {
    assert(plain.fromString("a:t1", connection = Some("b")).isLeft)
  }

  val mangled = new DbObjectCompiler(
    "wh",
    dev = StringifyConfig(
      schema = Mangling(prefix = Some("dev")),
      table = Mangling(prefix = Some("dev"))),
    prod = StringifyConfig(),
    fromProd = Seq("analytics\\.logs_.*"))

  test("dev prefix applies to out and src values") {
    val Right(o) = mangled.fromString("analytics.f_battles")
    assert(mangled.outValue(o) == "dev_analytics.dev_f_battles")
  }

  test("from_prod regex forces prod naming in src position only") {
    val Right(o) = mangled.fromString("analytics.logs_battles")
    assert(mangled.srcValue(o) == "analytics.logs_battles") // prod = identity
    assert(mangled.outValue(o) == "dev_analytics.dev_logs_battles")
  }

  test("non-default connection never mangles") {
    val Right(o) = mangled.fromString("other:analytics.t1")
    assert(mangled.srcValue(o) == "analytics.t1")
    assert(mangled.outValue(o) == "analytics.t1")
  }

  test("override format replaces the whole component") {
    val c = new DbObjectCompiler(
      "wh",
      dev = StringifyConfig(table = Mangling(overrideFmt = Some("u1_{table}"))))
    val Right(o) = c.fromString("s1.t1")
    assert(c.outValue(o) == "s1.u1_t1")
  }

  test("suffix mangling") {
    val c = new DbObjectCompiler(
      "wh",
      dev = StringifyConfig(table = Mangling(suffix = Some("tmp"))))
    val Right(o) = c.fromString("t1")
    assert(c.outValue(o) == "t1_tmp")
  }

  test("upstream-prod source set") {
    val c = new DbObjectCompiler(
      "wh",
      dev = StringifyConfig(table = Mangling(prefix = Some("dev"))))
    val Right(o) = c.fromString("t1")
    assert(c.srcValue(o) == "dev_t1")
    c.setSourcesFromProd(Set(o))
    assert(c.srcValue(o) == "t1")       // src now reads prod
    assert(c.outValue(o) == "dev_t1")   // out still writes dev
  }
}
