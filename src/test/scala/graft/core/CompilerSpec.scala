package graft.core

import org.scalatest.funsuite.AnyFunSuite
import Compiler.Context

class CompilerSpec extends AnyFunSuite {

  test("plain text passes through") {
    assert(Compiler.compile("SELECT 1", Context()) == Right("SELECT 1"))
  }

  test("parameter substitution incl. dotted paths") {
    val ctx = Context(params = Map(
      "user_prefix" -> "u1",
      "task" -> Map("name" -> "t1", "group" -> "g1"),
      "full_load" -> false,
      "start_dt" -> "2026-01-01"))
    assert(Compiler.compile("{{ user_prefix }}_x", ctx) == Right("u1_x"))
    assert(Compiler.compile("-- {{ task.name }} in {{ task.group }}", ctx) ==
      Right("-- t1 in g1"))
    assert(Compiler.compile("{{ full_load }}", ctx) == Right("false"))
    assert(Compiler.compile("'{{ start_dt }}'", ctx) == Right("'2026-01-01'"))
  }

  test("undefined variable errors") {
    assert(Compiler.compile("{{ nope }}", Context()).isLeft)
  }

  test("src/out macros resolve and can record lineage") {
    var srcs = List.empty[String]
    var outs = List.empty[String]
    val ctx = Context(
      src = { s => srcs ::= s; s"dev_$s" },
      out = { s => outs ::= s; s"dev_$s" })
    val r = Compiler.compile(
      "CREATE TABLE {{ out('f_battles') }} AS SELECT * FROM {{ src('logs_battles') }}",
      ctx)
    assert(r == Right("CREATE TABLE dev_f_battles AS SELECT * FROM dev_logs_battles"))
    assert(srcs == List("logs_battles") && outs == List("f_battles"))
  }

  test("config macro collects kwargs on first pass, renders empty") {
    var got: Map[String, Any] = Map.empty
    val ctx = Context(config = got = _, allowConfig = true)
    val r = Compiler.compile(
      "{{ config(materialisation='incremental', delete_key='id', tags=['nightly']) }}SELECT 1",
      ctx)
    assert(r == Right("SELECT 1"))
    assert(got == Map(
      "materialisation" -> "incremental",
      "delete_key" -> "id",
      "tags" -> Seq("nightly")))
  }

  test("config macro is ignored when not allowed (second pass)") {
    var called = false
    val ctx = Context(config = _ => called = true, allowConfig = false)
    assert(Compiler.compile("{{ config(materialisation='table') }}X", ctx) ==
      Right("X"))
    assert(!called)
  }

  test("control-flow blocks are rejected") {
    assert(Compiler.compile("{% if x %}y{% endif %}", Context()).isLeft)
  }

  test("arg parser: numbers, bools, lists, mixed kwargs") {
    val Right((pos, kw)) = Compiler.parseArgs("'a', 1, key=2.5, flag=true, xs=['p','q']")
    assert(pos == Seq("a", 1L))
    assert(kw == Map("key" -> 2.5, "flag" -> true, "xs" -> Seq("p", "q")))
  }
}
