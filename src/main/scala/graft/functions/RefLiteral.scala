package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

/** Constants that change every crawl round (round number, cumulative
  * fetch offset) WITHOUT changing the generated code text.
  *
  * A plain `lit(round)` is folded into the whole-stage source as a
  * numeric literal, so each round's otherwise-identical plan produces
  * DIFFERENT source and misses the janino compilation cache — the crawl
  * paid a full recompile of its two heaviest codegen stages per round.
  * These expressions route the value through `ctx.addReferenceObj`
  * (the same mechanism BloomMightContain uses for its per-round shard
  * reader): the source text stays identical round over round — only the
  * references array differs — so the compiled class is reused.
  *
  * Deliberately non-foldable: constant folding would inline the value
  * right back into the source.
  */
case class RefLongLiteral(value: Long) extends LeafExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "ref_long"
  override def eval(input: InternalRow): Any = value
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftRefLong", java.lang.Long.valueOf(value), "java.lang.Long")
    ev.copy(code = code"final long ${ev.value} = $ref.longValue();", isNull = FalseLiteral)
  }
}

/** Double variant — the per-iteration scalar of iterative numeric loops
  * (hostRank's dangling mass): the value changes every iteration, the
  * compiled class must not. */
case class RefDoubleLiteral(value: Double) extends LeafExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "ref_double"
  override def eval(input: InternalRow): Any = value
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftRefDouble", java.lang.Double.valueOf(value), "java.lang.Double")
    ev.copy(code = code"final double ${ev.value} = $ref.doubleValue();", isNull = FalseLiteral)
  }
}

case class RefIntLiteral(value: Int) extends LeafExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "ref_int"
  override def eval(input: InternalRow): Any = value
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftRefInt", java.lang.Integer.valueOf(value), "java.lang.Integer")
    ev.copy(code = code"final int ${ev.value} = $ref.intValue();", isNull = FalseLiteral)
  }
}
