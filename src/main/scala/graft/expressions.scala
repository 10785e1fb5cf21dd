package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression for the engine's canonicalize-then-digest
  * semantic (reference `hashObject`, EncodeTools.ts:1039-1047): XXH64
  * (seed 42) over the canonical little-endian layout
  * [n_tok:int32][tokens:int32...] of a token array.
  *
  * A UDF here would force ArrayData → Scala Seq conversion per row; this
  * expression reads the unsafe array in place and participates in
  * whole-stage codegen, so the digest column costs one tight loop per row.
  */
case class CanonicalXxh64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"canonical_xxh64 requires array<int>, got ${other.simpleString(10)}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "canonical_xxh64"

  override protected def nullSafeEval(input: Any): Any =
    Checksum.rowHash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.Checksum.rowHash($c);")

  override protected def withNewChildInternal(newChild: Expression): CanonicalXxh64 =
    copy(child = newChild)
}

/** Registration of engine SQL functions (the enum→dispatch surface of the
  * reference exposed to Spark SQL).
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "canonical_xxh64",
      (exprs: Seq[Expression]) => CanonicalXxh64(exprs.head),
      "built-in")
  }
}
