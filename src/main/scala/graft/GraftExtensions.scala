package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types.{IntegerType, StringType}
import graft.functions.{CatalystExprs, PyTextStatics}

/**
 * Spark-native registration surface (SURVEY.md §7 "custom Catalyst vs
 * built-in"): exposes the engine's scalar functions to `spark.sql(...)`.
 *
 * Two entry points:
 *  - `spark.sql.extensions=graft.GraftExtensions` at session build time
 *    (the SparkSessionExtensions injection path);
 *  - [[GraftExtensions.register]] on a live session (test/REPL path).
 *
 * SQL surface: normalize_ascii(s), py_title(s), utf16_to_cp(s, i),
 * cp_to_utf16(s, i).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.CatalystExprs", name),
        builder))
    }
}

object GraftExtensions {

  private val staticsClass = PyTextStatics.getClass

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "normalize_ascii" -> ((es: Seq[Expression]) =>
      CatalystExprs.NormalizeAscii(es.head)),
    "py_title" -> ((es: Seq[Expression]) =>
      StaticInvoke(staticsClass, StringType, "pyTitle", es,
        returnNullable = true)),
    "utf16_to_cp" -> ((es: Seq[Expression]) =>
      StaticInvoke(staticsClass, IntegerType, "utf16ToCp", es,
        returnNullable = false)),
    "cp_to_utf16" -> ((es: Seq[Expression]) =>
      StaticInvoke(staticsClass, IntegerType, "cpToUtf16", es,
        returnNullable = false)))

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
