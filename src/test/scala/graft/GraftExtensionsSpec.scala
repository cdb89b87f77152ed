package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("extension-injected builders resolve and evaluate mask functions") {
    val spark = SparkTestBase.spark
    import org.apache.spark.sql.{GraftBridge, SparkSessionExtensions}
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.functions.lit

    // capture what the extension injects (a fresh session per extension config
    // isn't possible inside one shared test JVM, so drive the injected
    // builders directly - they are exactly what a session would register)
    sys.props("graft.allowTestProfile") = "true" // no ETL_CONF_* env in the test JVM
    val captured = scala.collection.mutable.Map[String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression]()
    val ext = new SparkSessionExtensions {
      override def injectFunction(fd: (FunctionIdentifier, org.apache.spark.sql.catalyst.expressions.ExpressionInfo, Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression)): Unit =
        captured(fd._1.funcName) = fd._3
    }
    new GraftExtensions().apply(ext)
    assert(captured.keySet === Set(
      "mask_string", "mask_string_alphabet", "mask_string_alphabet_format",
      "mask_date", "mask_timestamp", "mask_decimal", "mask_name", "mask_email"))

    val e = captured("mask_string")(Seq(
      GraftBridge.expression(lit(16)), GraftBridge.expression(lit(true)), GraftBridge.expression(lit("alice"))))
    val row = spark.range(1).select(GraftBridge.column(e).as("m")).collect()(0)
    assert(row.getString(0).length === 16)
  }
}
