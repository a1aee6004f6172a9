package graft.functions

import org.apache.spark.sql.{Column, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper the generated code calls — one md5 + 4-byte fold, no
  * intermediate hex string. */
object GraftHash {
  // MessageDigest is stateful, not thread-safe, and costly to instantiate;
  // this is called millions of times per batch from generated code, so
  // reuse one instance per executor thread
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5Prefix32(b: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(b)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}

/** Native Catalyst expression for the engine's portable 32-bit content
  * hash: the first 4 md5 digest bytes as an unsigned big-endian long —
  * bit-identical to `('0x' || substr(md5(x),1,8))::BIGINT` in DuckDB and
  * to `conv(substring(md5(x),1,8),16,10)` in Spark SQL.
  *
  * Exists per the custom-operator preference order (builder prompt /
  * SURVEY §7.3): the composed built-in form materializes a 32-char hex
  * string and re-parses 8 chars of it per row; this fused expression
  * participates in whole-stage codegen via `defineCodeGen` and does one
  * digest + one integer fold. Used by every sketch operator (minhash,
  * simhash, LSH planes, fingerprints) — millions of evaluations per
  * document batch.
  */
case class Md5Prefix32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix32"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    GraftHash.md5Prefix32(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.md5Prefix32(($c).getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix32 =
    copy(child = newChild)
}

object Md5Prefix32 {
  def apply(c: Column): Column =
    GraftBridge.column(Md5Prefix32(GraftBridge.expression(c)))

  /** SQL registration: `md5_prefix32(expr)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_prefix32", es => Md5Prefix32(es.head), "scala_udf")
}
