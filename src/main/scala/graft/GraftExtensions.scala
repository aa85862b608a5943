package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `SparkSessionExtensions` installer for the engine's custom Catalyst
  * expressions, so SQL users get them as first-class functions:
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * SELECT graft_cosine(embedding, other) FROM vectors
  * }}}
  *
  * The DataFrame API path (`Similarity.dot` / `Similarity.cosine`) does not
  * require the extension — it builds the expressions directly; this makes
  * the same codegen'd kernels reachable from `spark.sql` text and from
  * JDBC/Thrift-style SQL-only clients. `GraftExtensions.register` installs
  * the functions into an ALREADY RUNNING session (the extensions hook only
  * fires at session construction).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach { case (id, info, builder) =>
      ext.injectFunction((id, info, builder))
    }
}

object GraftExtensions {

  private type Builder = Seq[Expression] => Expression

  private def binary(name: String, usage: String,
                     make: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Builder) = {
    val builder: Builder = {
      case Seq(a, b) => make(a, b)
      case args => throw new IllegalArgumentException(
        s"$name expects exactly 2 arguments, got ${args.length}")
    }
    (new FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name, usage),
      builder)
  }

  private def unary(name: String, usage: String,
                    make: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Builder) = {
    val builder: Builder = {
      case Seq(a) => make(a)
      case args => throw new IllegalArgumentException(
        s"$name expects exactly 1 argument, got ${args.length}")
    }
    (new FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name, usage),
      builder)
  }

  /** The SQL-exposed function surface. */
  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    binary("graft_dot_product",
      "graft_dot_product(a, b) - left-to-right double dot product of two float/double arrays",
      expressions.DotProduct(_, _)),
    binary("graft_cosine",
      "graft_cosine(a, b) - fused single-pass cosine similarity of two float/double arrays",
      expressions.CosineSimilarity(_, _)),
    unary("graft_rolling_hash",
      "graft_rolling_hash(s) - polynomial rolling hash (131, mod 2^31-1) over code points",
      expressions.RollingHash(_)))

  /** Install into a session that already exists (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, info, builder(_))
    }
}
