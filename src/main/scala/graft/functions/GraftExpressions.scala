package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `canonicalize_url(url, base)` — RFC 3986 canonicalization as a native
  * Catalyst expression with full codegen (BASELINE.json:6). `base` may be
  * null (absolute-only canonicalization); a null/invalid `url` yields null.
  */
case class CanonicalizeUrl(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "canonicalize_url"

  override def eval(input: InternalRow): Any = {
    val u = left.eval(input)
    if (u == null) null
    else {
      val b = right.eval(input)
      GraftRT.canonUTF8(u.asInstanceOf[UTF8String],
        if (b == null) null else b.asInstanceOf[UTF8String])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val baseVar = ctx.freshName("canonBase")
    ev.copy(code =
      code"""
        ${l.code}
        boolean ${ev.isNull} = true;
        UTF8String ${ev.value} = null;
        if (!${l.isNull}) {
          ${r.code}
          UTF8String $baseVar = null;
          if (!${r.isNull}) { $baseVar = (UTF8String) (Object) ${r.value}; }
          ${ev.value} = graft.functions.GraftRT.canonUTF8(${l.value}, $baseVar);
          ${ev.isNull} = ${ev.value} == null;
        }
      """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CanonicalizeUrl =
    copy(left = newLeft, right = newRight)
}

/** `extract_urls(text)` — link extraction (PINNED grammar, FIXTURES.md)
  * returning `array<string>` in document order; consumed via `posexplode`
  * so no custom Generator is needed (SURVEY.md §2.11). */
case class ExtractUrls(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "extract_urls"

  override protected def nullSafeEval(text: Any): Any =
    GraftRT.extractUTF8(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftRT.extractUTF8($c)")

  override protected def withNewChildInternal(newChild: Expression): ExtractUrls =
    copy(child = newChild)
}

/** `host_of(canonical_url)` — host component of an already-canonical URL.
  * Cheaper and deterministic vs `parse_url` (no java.net parsing). */
case class HostOf(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "host_of"
  override protected def nullSafeEval(u: Any): Any = GraftRT.hostUTF8(u.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftRT.hostUTF8($c)")
  override protected def withNewChildInternal(newChild: Expression): HostOf =
    copy(child = newChild)
}

/** `path_of(canonical_url)` — path component of an already-canonical URL. */
case class PathOf(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "path_of"
  override protected def nullSafeEval(u: Any): Any = GraftRT.pathUTF8(u.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftRT.pathUTF8($c)")
  override protected def withNewChildInternal(newChild: Expression): PathOf =
    copy(child = newChild)
}
