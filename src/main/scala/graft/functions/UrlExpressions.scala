package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.urls.UrlOps

/** Native Catalyst expressions for the url kernel (SURVEY.md §2.7 F1/F15) —
  * codegen'd via static calls into [[UrlOps]], so the frontier's
  * canonicalize/hash columns stay inside whole-stage codegen (no Scala-UDF
  * serde wall). Spark has no urljoin/canonicalize built-ins.
  */
object UrlCodegen {
  // Java-friendly entry points for generated code
  def canonicalize(u: UTF8String): UTF8String =
    UTF8String.fromString(UrlOps.canonicalize(u.toString))
  def host(u: UTF8String): UTF8String =
    UTF8String.fromString(UrlOps.hostOf(u.toString))
  def resolve(base: UTF8String, ref: UTF8String): UTF8String =
    UTF8String.fromString(UrlOps.resolve(base.toString, ref.toString))
  def urlHash(u: UTF8String): Long = UrlOps.urlHash64(u.toString)
}

case class CanonicalizeUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = UrlCodegen.canonicalize(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlCodegen.canonicalize($c)")
  override protected def withNewChildInternal(c: Expression): CanonicalizeUrl = copy(c)
}

case class UrlHost(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = UrlCodegen.host(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlCodegen.host($c)")
  override protected def withNewChildInternal(c: Expression): UrlHost = copy(c)
}

case class UrlHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = UrlCodegen.urlHash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlCodegen.urlHash($c)")
  override protected def withNewChildInternal(c: Expression): UrlHash64 = copy(c)
}

case class ResolveUrl(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(base: Any, ref: Any): Any =
    UrlCodegen.resolve(base.asInstanceOf[UTF8String], ref.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, r) => s"graft.functions.UrlCodegen.resolve($b, $r)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ResolveUrl =
    copy(l, r)
}

/** Column API + SQL registration for the graft function surface. */
object GraftFunctions {
  import org.apache.spark.sql.graft.Bridge.{column, expression}

  def canonicalize_url(c: Column): Column = column(CanonicalizeUrl(expression(c)))
  def url_host(c: Column): Column = column(UrlHost(expression(c)))
  def url_hash64(c: Column): Column = column(UrlHash64(expression(c)))
  def resolve_url(base: Column, ref: Column): Column =
    column(ResolveUrl(expression(base), expression(ref)))

  /** Shannon entropy of the value histogram of a string column (A-2) as a
    * reusable typed Aggregator, registered as SQL `graft_entropy`.
    */
  val entropyAgg: org.apache.spark.sql.expressions.Aggregator[String, Map[String, Long], Double] =
    new org.apache.spark.sql.expressions.Aggregator[String, Map[String, Long], Double] {
      def zero: Map[String, Long] = Map.empty
      def reduce(b: Map[String, Long], v: String): Map[String, Long] =
        b.updated(v, b.getOrElse(v, 0L) + 1L)
      def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
        b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
      def finish(m: Map[String, Long]): Double =
        graft.detect.Numeric.entropyOfCounts(m.values)
      def bufferEncoder = org.apache.spark.sql.Encoders.kryo[Map[String, Long]]
      def outputEncoder = org.apache.spark.sql.Encoders.scalaDouble
    }

  /** Register SQL-callable forms: graft_canonicalize_url, graft_url_host,
    * graft_url_hash64, graft_resolve_url, graft_entropy.
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("graft_canonicalize_url",
      es => CanonicalizeUrl(es.head), "scala_udf")
    registry.createOrReplaceTempFunction("graft_url_host",
      es => UrlHost(es.head), "scala_udf")
    registry.createOrReplaceTempFunction("graft_url_hash64",
      es => UrlHash64(es.head), "scala_udf")
    registry.createOrReplaceTempFunction("graft_resolve_url",
      es => ResolveUrl(es.head, es(1)), "scala_udf")
    spark.udf.register("graft_entropy", org.apache.spark.sql.functions.udaf(entropyAgg))
  }
}
