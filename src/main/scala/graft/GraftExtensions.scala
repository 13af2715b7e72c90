package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.{DotProduct, L2Distance, RecursiveSplit}
import org.apache.spark.sql.types.IntegerType

/** Session extension registering graft's custom Catalyst expressions as
  * SQL functions, so `spark.sql("SELECT dot_product(a, b) ...")` works
  * anywhere DataFrame code does.
  *
  * Enable per session:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *     ...
  * }}}
  * or on an already-running session via [[GraftExtensions.registerAll]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other =>
      throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** (identifier, info, builder) triples for every SQL-exposed function. */
  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    (FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - dot product of two double arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (FunctionIdentifier("l2_distance"),
      info("l2_distance", "l2_distance(a, b) - Euclidean distance of two double arrays"),
      (args: Seq[Expression]) => L2Distance(args(0), args(1))),
    (FunctionIdentifier("recursive_split"),
      info("recursive_split",
        "recursive_split(text, size, overlap) - recursive character chunking"),
      (args: Seq[Expression]) => RecursiveSplit(args(0),
        intLit(args(1), "size"), intLit(args(2), "overlap"),
        RecursiveSplit.defaultSeparators)),
  )

  /** Register all functions into an existing session (e.g. a notebook
    * where the session was built without the extensions config). */
  def registerAll(spark: SparkSession): Unit =
    descriptors.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
}
