package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function
import graft.functions.expressions.CosineSimilarity

/** Engine extension wiring: registers graft's native Catalyst
  * expressions with a SparkSession, either through the standard
  * `spark.sql.extensions=graft.functions.GraftExtensions` config or
  * programmatically via [[GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.cosineSimDescription)
  }
}

object GraftFunctions {

  private[functions] val cosineSimDescription:
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    { args: Seq[Expression] =>
      require(args.length == 2, "cosine_sim takes exactly 2 arguments")
      CosineSimilarity(args.head, args(1))
    })

  /** Idempotently register graft's native expressions on a session
    * (for sessions not launched with the extensions config). */
  def register(spark: SparkSession): Unit =
    if (!spark.catalog.functionExists("cosine_sim")) {
      val (id, info, builder) = cosineSimDescription
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }

  /** Codegen'd cosine similarity (see
    * [[graft.functions.expressions.CosineSimilarity]]); requires
    * [[register]] on the session first. Bit-identical to
    * [[VectorFunctions.cosine]]. */
  def cosineSim(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)
}
