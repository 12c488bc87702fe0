package graft.core

import graft.core.Result.Result
import scala.util.matching.Regex

/** A reference to a catalog object: `[connection:][database.][schema.]table`
  * plus 0-2 trailing dots marking partial (schema-/database-level) references.
  *
  * Semantics match the reference's object model (sayn/database/objects.py:
  * 10-279): `raw` is the project-code spelling, `key` is connection-qualified
  * identity. In Spark the resolved value is a `schema.table` (or
  * `catalog.schema.table`) identifier in the session catalog.
  */
final case class DbObject(
    connection: String,
    database: Option[String],
    schema: Option[String],
    table: Option[String]) {

  /** Project-code spelling (objects.py:26-40): `db.` keeps its trailing dot
    * when no schema follows, so raw round-trips through the parser.
    */
  val raw: String = {
    val sb = new StringBuilder
    database.foreach(d => sb.append(d).append('.'))
    schema.foreach(s => sb.append(s).append('.'))
    if (database.isDefined && schema.isEmpty) sb.append('.')
    table.foreach(sb.append(_))
    sb.result()
  }

  val key: String = s"$connection:$raw"
}

/** Per-component name-mangling spec: `prefix`/`suffix` compose around the
  * name, `override` (a `{database}`/`{schema}`/`{table}` format string)
  * replaces it entirely (objects.py:100-122).
  */
final case class Mangling(
    prefix: Option[String] = None,
    suffix: Option[String] = None,
    overrideFmt: Option[String] = None) {

  /** Build the final format template for this component type. */
  def template(componentType: String): String =
    overrideFmt.getOrElse {
      var t = "{" + componentType + "}"
      prefix.filter(_.nonEmpty).foreach(p => t = s"${p}_$t")
      suffix.filter(_.nonEmpty).foreach(s => t = s"${t}_$s")
      t
    }
}

/** Dev + prod mangling for the three component types. Dev components fall
  * back to prod when unset (objects.py:77-79).
  */
final case class StringifyConfig(
    database: Mangling = Mangling(),
    schema: Mangling = Mangling(),
    table: Mangling = Mangling())

/** Parser + stringifier for object references — the `src()`/`out()`
  * resolution core (objects.py:56-279).
  *
  * @param fromProd  regexes matched (prefix-match, like Python `re.match`)
  *                  against an object's *raw* name; hits resolve with prod
  *                  naming in `src` position.
  */
final class DbObjectCompiler(
    defaultDb: String,
    dev: StringifyConfig = StringifyConfig(),
    prod: StringifyConfig = StringifyConfig(),
    fromProd: Seq[String] = Nil) {

  private val fromProdRe: Seq[Regex] = fromProd.map(_.r)
  @volatile private var sourcesFromProd: Set[String] = Set.empty

  /** `-u/--upstream-prod`: sources not produced by this run read prod names
    * (sayn/core/app.py:503-511).
    */
  def setSourcesFromProd(objs: Set[DbObject]): Unit =
    sourcesFromProd = objs.map(_.key)

  private val ObjRe: Regex =
    "^\\s*(?:([^:]+):)?(?:([^.]+)\\.)?(?:([^.]+)\\.)?([^.]+)(\\.{0,2})\\s*$".r

  private val levelOf = Map[Option[String], Int](
    None -> 0, Some("schema") -> -1, Some("db") -> -2)

  /** Parse `[conn:][c1.][c2.]table[dots]`, honoring trailing-dot / `level`
    * partial references (objects.py:190-279).
    */
  def fromString(
      s: String,
      connection: Option[String] = None,
      level: Option[String] = None): Result[DbObject] = {
    if (!levelOf.contains(level))
      return Left(ParseError(s"incorrect reference level '${level.get}'"))
    s match {
      case ObjRe(connGroup, c1g, c2g, c3, dots) =>
        val connName = (Option(connGroup), connection) match {
          case (None, None) => defaultDb
          case (None, Some(c)) => c
          case (Some(g), None) => g
          case (Some(g), Some(c)) =>
            if (g != c) return Left(ParseError(s"connection name mismatch in '$s'"))
            else c
        }
        // c1-only means schema, not database (objects.py:238-240)
        var (c1, c2) = (Option(c1g), Option(c2g))
        if (c1.isDefined && c2.isEmpty) { c2 = c1; c1 = None }

        val periods = dots.length
        val providedLevel = level match {
          case None => -periods
          case some =>
            val l = levelOf(some)
            if (periods > -l)
              return Left(ParseError(
                s"reference level '${some.get}' and trailing periods mismatch in '$s'"))
            l
        }
        // rotate [c1, c2, c3] left by |providedLevel| (objects.py:262-273)
        val elems = Vector(c1, c2, Option(c3))
        if (elems.count(_.isEmpty) < -providedLevel)
          return Left(ParseError(
            s"object '$s' does not match reference level '${level.getOrElse("table")}'"))
        val k = ((-providedLevel) % 3 + 3) % 3
        val rotated = elems.drop(k) ++ elems.take(k)
        // reversed zip (table, schema, database)
        val Seq(tbl, sch, db) = rotated.reverse
        Right(DbObject(connName, db, sch, tbl))
      case _ => Left(ParseError(s"incorrect format for database object '$s'"))
    }
  }

  /** True when this object should resolve with prod naming in src position
    * (objects.py:124-139). Only objects on the default connection mangle.
    */
  def isFromProd(obj: DbObject): Boolean =
    obj.connection == defaultDb && (
      fromProdRe.exists(r => r.pattern.matcher(obj.raw).lookingAt()) ||
        sourcesFromProd.contains(obj.key))

  private def mangle(cfg: StringifyConfig, obj: DbObject): DbObject =
    obj.copy(
      database = obj.database.map(d =>
        cfg.database.template("database").replace("{database}", d)),
      schema = obj.schema.map(sc =>
        cfg.schema.template("schema").replace("{schema}", sc)),
      table = obj.table.map(tb =>
        cfg.table.template("table").replace("{table}", tb)))

  private def commonValue(obj: DbObject, runSensitive: Boolean): String = {
    val mangled =
      if (obj.connection != defaultDb) obj
      else if (runSensitive && isFromProd(obj)) mangle(prod, obj)
      else mangle(dev, obj)
    objStr(mangled)
  }

  /** `database.schema.table` rendering, skipping absent components
    * (sayn/database/__init__.py:144-154).
    */
  def objStr(obj: DbObject): String =
    Seq(obj.database, obj.schema, obj.table).flatten.mkString(".")

  /** Resolved physical name in src (read) position — from_prod sensitive. */
  def srcValue(obj: DbObject): String = commonValue(obj, runSensitive = true)

  /** Resolved physical name in out (write) position — always this env. */
  def outValue(obj: DbObject): String = commonValue(obj, runSensitive = false)

  def srcObj(obj: DbObject): Result[DbObject] =
    fromString(srcValue(obj), Some(obj.connection))
  def outObj(obj: DbObject): Result[DbObject] =
    fromString(outValue(obj), Some(obj.connection))
}
