package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension injector for the engine's native Catalyst
  * expressions, making them first-class SQL functions:
  *
  * {{{
  * val spark = SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // or
  *   .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
  *   .getOrCreate()
  * spark.sql("SELECT dot_product(a, b), json_all_keys_dollar(doc) ...")
  * }}}
  *
  * The Column-API forms ([[VectorFunctions.dot]],
  * [[functions.json_all_keys_dollar]]) build the same expressions
  * directly; registration only adds the SQL-surface names. No custom
  * optimizer rules or strategies are injected — SURVEY.md §7.3: every
  * engine operator lowers to built-in physical operators, so Catalyst
  * needs no planner help, only these scalar primitives.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "java_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    val dot: FunctionBuilder = { (children: Seq[Expression]) =>
      require(children.length == 2, "dot_product expects exactly 2 arguments")
      DotProduct(children(0), children(1))
    }
    val allDollar: FunctionBuilder = { (children: Seq[Expression]) =>
      require(children.length == 1, "json_all_keys_dollar expects exactly 1 argument")
      JsonAllKeysDollar(children.head)
    }
    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - sequential dot product of two array<double> columns"),
      dot))
    ext.injectFunction((FunctionIdentifier("json_all_keys_dollar"),
      info("json_all_keys_dollar", "json_all_keys_dollar(doc) - true iff every top-level key of the JSON object starts with '$'"),
      allDollar))
  }
}
