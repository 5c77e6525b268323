package graft.crawl

import graft.urls.{RobotsMatch, UrlCanon}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled per-host robots rule table, shipped inside the
  * [[RobotsAllows]] expression (task-serialized once per stage; rules are
  * ≪ frontier). Keeps the robots filter inside whole-stage codegen —
  * replacing the v0 Scala UDF, which forced an eval fallback in the
  * crawl's hottest filter. */
final class RobotsIndex(rulesByHost: Map[String, Array[(Boolean, String)]]) extends Serializable {
  def allowsUrl(host: UTF8String, urlCanon: UTF8String): Boolean = {
    val rules = rulesByHost.getOrElse(host.toString, null)
    if (rules == null || rules.isEmpty) true
    else RobotsMatch.allows(rules.toSeq, UrlCanon.pathOf(urlCanon.toString))
  }
}

/** `robots_allows(host, url_canon)` — Google-style longest-prefix-match
  * allow/deny (X6), full codegen via a referenced [[RobotsIndex]]. */
case class RobotsAllows(left: Expression, right: Expression, index: RobotsIndex)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "robots_allows"

  override protected def nullSafeEval(host: Any, url: Any): Any =
    index.allowsUrl(host.asInstanceOf[UTF8String], url.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("robotsIndex", index, "graft.crawl.RobotsIndex")
    defineCodeGen(ctx, ev, (h, u) => s"$idx.allowsUrl($h, $u)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): RobotsAllows =
    copy(left = newLeft, right = newRight)
}
