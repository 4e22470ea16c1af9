package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

import graft.frontier.Robots
import graft.urls.UrlOps

/** Codegen entry point for the robots candidate gate (C4): RFC 9309
  * longest-match over the url's path+query, evaluated directly on Tungsten
  * ArrayData — no Seq materialization, no Scala-UDF serde wall. The gate
  * runs once per candidate url (millions per round), so it must stay inside
  * whole-stage codegen with the rest of the candidate chain.
  */
object RobotsCodegen {

  /** RFC 9309 §2.2.2 precedence over raw ArrayData rule lists: longest
    * matching rule decides, Allow wins ties — mirrors [[Robots.allowed]].
    */
  def allowed(url: UTF8String, allow: ArrayData, dis: ArrayData): Boolean = {
    val pathQuery = UrlOps.pathQueryOfCanonical(url.toString)
    var best = -1
    var i = 0
    val nd = dis.numElements()
    while (i < nd) {
      val p = dis.getUTF8String(i).toString
      if (p.length > best && Robots.matches(pathQuery, p)) best = p.length
      i += 1
    }
    if (best < 0) return true
    var bestAllow = -1
    i = 0
    val na = allow.numElements()
    while (i < na) {
      val p = allow.getUTF8String(i).toString
      if (p.length > bestAllow && Robots.matches(pathQuery, p)) bestAllow = p.length
      i += 1
    }
    bestAllow >= best
  }
}

/** `robots_allowed(url, allow, disallow)` — true iff the (canonical) url's
  * path+query survives the rule lists. Null-intolerant: callers express the
  * "host absent from the robots table = allowed" left-join-miss case as
  * `disallow.isNull || robots_allowed(...)` so the expression itself stays
  * a simple nullSafeEval/defineCodeGen pair.
  */
case class RobotsAllowed(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(url: Any, allow: Any, dis: Any): Any =
    RobotsCodegen.allowed(url.asInstanceOf[UTF8String],
      allow.asInstanceOf[ArrayData], dis.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (u, a, d) => s"graft.functions.RobotsCodegen.allowed($u, $a, $d)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): RobotsAllowed = copy(f, s, t)
}

object RobotsFunctions {
  import org.apache.spark.sql.graft.Bridge.{column, expression}
  def robots_allowed(url: Column, allow: Column, disallow: Column): Column =
    column(RobotsAllowed(expression(url), expression(allow), expression(disallow)))
}
