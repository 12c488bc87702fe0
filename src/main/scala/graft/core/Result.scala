package graft.core

/** Error model threaded through every stage, mirroring the reference's
  * Ok/Err/Exc result monad (sayn/core/errors.py:9-56) as a plain
  * `Either[GraftError, A]`.
  */
sealed trait GraftError {
  def kind: String
  def msg: String
  override def toString: String = s"[$kind] $msg"
}

final case class ConfigError(msg: String) extends GraftError { val kind = "config" }
final case class DagError(msg: String) extends GraftError { val kind = "dag" }
final case class ParseError(msg: String) extends GraftError { val kind = "parse" }
final case class DbError(msg: String, cause: Option[Throwable] = None)
    extends GraftError { val kind = "database" }
final case class TaskFailed(msg: String, cause: Option[Throwable] = None)
    extends GraftError { val kind = "task" }
final case class TestFailed(msg: String, offending: Seq[String] = Nil)
    extends GraftError { val kind = "test" }

object Result {
  type Result[A] = Either[GraftError, A]

  def ok[A](a: A): Result[A] = Right(a)
  def err[A](e: GraftError): Result[A] = Left(e)

  /** Wrap an exception-throwing block (the reference's Exc case,
    * sayn/core/errors.py:44-56).
    */
  def attempt[A](what: => A): Result[A] =
    try Right(what)
    catch { case e: Throwable => Left(TaskFailed(Option(e.getMessage).getOrElse(e.toString), Some(e))) }

  /** Sequence results, stopping at the first error. */
  def sequence[A](rs: Seq[Result[A]]): Result[Seq[A]] =
    rs.foldLeft(ok(Vector.empty[A])) {
      case (Right(acc), Right(a)) => Right(acc :+ a)
      case (l @ Left(_), _) => l
      case (_, Left(e)) => Left(e)
    }
}
