package graft.functions

import graft.urls.{UrlCanon, UrlExtract}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static runtime entry points for generated code.
  *
  * A top-level Scala object with no companion class gets static forwarder
  * methods, so whole-stage-codegen'd Java can call
  * `graft.functions.GraftRT.canonUTF8(...)` directly — the custom
  * expressions in [[GraftExpressions]] stay inside the codegen stage
  * instead of falling back to interpreted eval.
  */
object GraftRT {

  def canonUTF8(url: UTF8String, base: UTF8String): UTF8String = {
    if (url == null) return null
    val r = UrlCanon.canonicalize(url.toString, if (base == null) null else base.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  def hostUTF8(canonical: UTF8String): UTF8String =
    if (canonical == null) null
    else UTF8String.fromString(UrlCanon.hostOf(canonical.toString))

  def pathUTF8(canonical: UTF8String): UTF8String =
    if (canonical == null) null
    else UTF8String.fromString(UrlCanon.pathOf(canonical.toString))

  def extractUTF8(text: UTF8String): ArrayData = {
    val links = UrlExtract.extract(if (text == null) null else text.toString)
    val out = new Array[Any](links.length)
    var i = 0
    while (i < links.length) { out(i) = UTF8String.fromString(links(i)); i += 1 }
    new GenericArrayData(out)
  }
}
