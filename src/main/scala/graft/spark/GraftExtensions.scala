package graft.spark

import graft.functions.NativeKernels
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._

/** SparkSessionExtensions entry point: registers the graft kernels as SQL
  * functions, so `spark.sql("SELECT graft_simhash(text) ...")` works and
  * the functions are usable from pure-SQL pipelines (and from thriftserver
  * sessions on a real cluster).
  *
  * Activate with either
  *   `.config("spark.sql.extensions", "graft.spark.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(NativeKernels.getClass.getName, null, name, usage,
      "", "", "", "", "", "", "java_udf")

  private def register(
      ext: SparkSessionExtensions, name: String, usage: String,
      dt: DataType, fn: String, arity: Int): Unit = {
    ext.injectFunction((
      FunctionIdentifier(name),
      info(name, usage),
      (children: Seq[Expression]) => {
        require(children.length == arity, s"$name expects $arity argument(s)")
        StaticInvoke(NativeKernels.getClass, dt, fn, children,
          inputTypes = Nil, propagateNull = true, returnNullable = false)
      }))
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "graft_simhash", "64-bit SimHash of a string", LongType, "simhash64", 1)
    register(ext, "graft_fingerprint", "rolling-hash document fingerprint", LongType, "fingerprint64", 1)
    register(ext, "graft_langid", "heuristic language id (n-gram + script)", StringType, "langId", 1)
    register(ext, "graft_hamming", "hamming distance of two 64-bit signatures", IntegerType, "hamming64", 2)
    register(ext, "graft_extract", "main-content extraction: (html binary, lang) -> text", StringType, "extractText", 2)
    register(ext, "graft_failure", "extraction failure taxonomy: (html binary, lang) -> class", StringType, "extractFailure", 2)
  }
}
