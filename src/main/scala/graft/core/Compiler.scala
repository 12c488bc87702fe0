package graft.core

import graft.core.Result.Result
import scala.collection.mutable

/** Mini template engine covering the constructs the reference's projects
  * actually exercise (sayn/utils/compiler.py:31-135): `{{ expression }}`
  * substitution over parameters and globals (`full_load`, `start_dt`,
  * `end_dt`, `task.name`, `task.group`), plus the three macros
  * `src('obj')`, `out('obj')` and `config(key=value, ...)`.
  *
  * No Jinja control flow ({% %}) appears in reference SQL, so none is
  * implemented; encountering one is an explicit error rather than silent
  * passthrough.
  */
object Compiler {

  /** Macro hooks supplied per compilation pass. `config` fires only when
    * `allowConfig` (first compile; sayn/tasks/sql.py:159-165) and renders
    * as the empty string.
    */
  final case class Context(
      params: Map[String, Any] = Map.empty,
      src: String => String = identity,
      out: String => String = identity,
      config: Map[String, Any] => Unit = _ => (),
      allowConfig: Boolean = false)

  private val ExprRe = "\\{\\{(.*?)\\}\\}".r
  private val ControlRe = "\\{%.*?%\\}".r

  def compile(template: String, ctx: Context): Result[String] = {
    if (ControlRe.findFirstIn(template).isDefined)
      return Left(ParseError(
        "control-flow blocks ({% %}) are not supported by the template engine"))
    val sb = new StringBuilder
    var last = 0
    for (m <- ExprRe.findAllMatchIn(template)) {
      sb.append(template.substring(last, m.start))
      evalExpr(m.group(1).trim, ctx) match {
        case Right(v) => sb.append(v)
        case l @ Left(_) => return l
      }
      last = m.end
    }
    sb.append(template.substring(last))
    Right(sb.result())
  }

  private val CallRe = "^([a-zA-Z_][a-zA-Z0-9_]*)\\((.*)\\)$".r

  private def evalExpr(expr: String, ctx: Context): Result[String] =
    expr match {
      case CallRe(fn, argStr) =>
        parseArgs(argStr).flatMap { case (pos, kw) =>
          fn match {
            case "src" =>
              pos match {
                case Seq(one: String) => Right(ctx.src(one))
                case _ => Left(ParseError(s"src() takes one string argument: {{ $expr }}"))
              }
            case "out" =>
              pos match {
                case Seq(one: String) => Right(ctx.out(one))
                case _ => Left(ParseError(s"out() takes one string argument: {{ $expr }}"))
              }
            case "config" =>
              if (pos.nonEmpty)
                Left(ParseError(s"config() takes only keyword arguments: {{ $expr }}"))
              else {
                if (ctx.allowConfig) ctx.config(kw)
                Right("")
              }
            case other => Left(ParseError(s"unknown template function '$other'"))
          }
        }
      case path =>
        lookup(path, ctx.params) match {
          case Some(v) => Right(render(v))
          case None => Left(ParseError(s"undefined template variable '$path'"))
        }
    }

  private def lookup(path: String, params: Map[String, Any]): Option[Any] =
    path.split("\\.", -1).toList match {
      case head :: rest =>
        rest.foldLeft(params.get(head)) {
          case (Some(m: Map[_, _]), k) =>
            m.asInstanceOf[Map[String, Any]].get(k)
          case _ => None
        }
      case Nil => None
    }

  private def render(v: Any): String = v match {
    case s: String => s
    case null => ""
    case other => other.toString
  }

  /** Parse a macro argument list: positional literals and key=value pairs.
    * Literals: 'str', "str", numbers, true/false, [list, of, literals].
    */
  private[core] def parseArgs(s: String): Result[(Seq[Any], Map[String, Any])] = {
    val pos = mutable.ArrayBuffer.empty[Any]
    val kw = mutable.LinkedHashMap.empty[String, Any]
    var i = 0
    val n = s.length

    def skipWs(): Unit = while (i < n && s(i).isWhitespace) i += 1

    def parseValue(): Result[Any] = {
      skipWs()
      if (i >= n) return Left(ParseError(s"unexpected end of arguments in '$s'"))
      s(i) match {
        case '\'' | '"' =>
          val quote = s(i); i += 1
          val sb = new StringBuilder
          while (i < n && s(i) != quote) {
            if (s(i) == '\\' && i + 1 < n) { sb.append(s(i + 1)); i += 2 }
            else { sb.append(s(i)); i += 1 }
          }
          if (i >= n) return Left(ParseError(s"unterminated string in '$s'"))
          i += 1
          Right(sb.result())
        case '[' =>
          i += 1
          val items = mutable.ArrayBuffer.empty[Any]
          skipWs()
          if (i < n && s(i) == ']') { i += 1; return Right(items.toSeq) }
          var done = false
          while (!done) {
            parseValue() match {
              case Right(v) => items += v
              case l @ Left(_) => return l
            }
            skipWs()
            if (i < n && s(i) == ',') { i += 1 }
            else if (i < n && s(i) == ']') { i += 1; done = true }
            else return Left(ParseError(s"malformed list in '$s'"))
          }
          Right(items.toSeq)
        case _ =>
          val start = i
          while (i < n && !",=)]".contains(s(i)) && !s(i).isWhitespace) i += 1
          val tok = s.substring(start, i)
          tok.toLowerCase match {
            case "true" => Right(true)
            case "false" => Right(false)
            case "none" | "null" => Right(null)
            case num if num.matches("-?\\d+") => Right(num.toLong)
            case num if num.matches("-?\\d*\\.\\d+") => Right(num.toDouble)
            case "" => Left(ParseError(s"empty argument token in '$s'"))
            case other => Right(other) // bare word → string
          }
      }
    }

    skipWs()
    while (i < n) {
      // try key= lookahead
      val keyStart = i
      var j = i
      while (j < n && (s(j).isLetterOrDigit || s(j) == '_')) j += 1
      var k = j
      while (k < n && s(k).isWhitespace) k += 1
      if (j > keyStart && k < n && s(k) == '=' && (k + 1 >= n || s(k + 1) != '=')) {
        val key = s.substring(keyStart, j)
        i = k + 1
        parseValue() match {
          case Right(v) => kw(key) = v
          case Left(e) => return Left(e)
        }
      } else {
        parseValue() match {
          case Right(v) => pos += v
          case Left(e) => return Left(e)
        }
      }
      skipWs()
      if (i < n) {
        if (s(i) != ',')
          return Left(ParseError(s"expected ',' at position $i in '$s'"))
        i += 1
        skipWs()
      }
    }
    Right((pos.toSeq, kw.toMap))
  }
}
