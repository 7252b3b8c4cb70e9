package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the F1-F9 sanitization family — the
  * silver-ingest hot path (SURVEY §7.3 flagged F1 as the codegen
  * candidate). Semantics are EXACTLY SteamParsers' (the same pure
  * functions are called; the spec suite pins them); these wrappers remove
  * the ScalaUDF boundary so the parse runs inside whole-stage codegen
  * with no serializer round-trip.
  *
  * Each static bridge returns a boxed value or null (None → SQL NULL). */
object ParserOps {
  def parseSteamPrice(s: UTF8String): java.lang.Double =
    SteamParsers.parseSteamPrice(s.toString)
      .map(java.lang.Double.valueOf).orNull

  def minorToMajor(s: UTF8String): java.lang.Double =
    SteamParsers.orderPriceMinorToMajor(s.toString)
      .map(java.lang.Double.valueOf).orNull

  def parseVolume(s: UTF8String): java.lang.Integer =
    SteamParsers.parseVolume(s.toString)
      .map(java.lang.Integer.valueOf).orNull

  def extractCurrency(s: UTF8String): UTF8String =
    SteamParsers.extractCurrency(s.toString)
      .map(UTF8String.fromString).orNull

  /** timestamp as micros-since-epoch, or null. */
  def parseSteamDatetime(s: UTF8String): java.lang.Long =
    SteamParsers.parseSteamDatetime(s.toString)
      .map(ts => java.lang.Long.valueOf(ts.getTime * 1000L)).orNull

  def parsePriceToFloat(s: UTF8String): java.lang.Double =
    SteamParsers.parsePriceToFloat(s.toString)
      .map(java.lang.Double.valueOf).orNull

  /** (price, currency, action) struct row, never null itself. */
  def parseActivityHtml(s: UTF8String): InternalRow = {
    val (p, c, a) = SteamParsers.parseActivityHtml(s.toString)
    new GenericInternalRow(Array[Any](
      p.map(java.lang.Double.valueOf).orNull,
      c.map(UTF8String.fromString).orNull,
      a.map(UTF8String.fromString).orNull))
  }
}

/** Shared shape: string in, boxed-or-null out via a ParserOps static. */
abstract class ParserExpr extends UnaryExpression {
  /** fully-qualified static call target, e.g. "parseSteamPrice". */
  def bridge: String
  override def nullable: Boolean = true
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("parsed")
      val box = CodeGenerator.javaType(dataType) match {
        case "double" => "java.lang.Double"
        case "int" => "java.lang.Integer"
        case "long" => "java.lang.Long"
        case other => other
      }
      val unbox = CodeGenerator.javaType(dataType) match {
        case "double" => s"$tmp.doubleValue()"
        case "int" => s"$tmp.intValue()"
        case "long" => s"$tmp.longValue()"
        case _ => tmp
      }
      s"""$box $tmp = ($box) graft.functions.ParserOps.$bridge($c);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $unbox; }""".stripMargin
    })
}

case class SteamPriceExpr(child: Expression) extends ParserExpr {
  override def dataType: DataType = DoubleType
  override def bridge: String = "parseSteamPrice"
  override def prettyName: String = "graft_steam_price"
  override protected def nullSafeEval(i: Any): Any =
    ParserOps.parseSteamPrice(i.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): SteamPriceExpr = copy(child = c)
}

case class MinorUnitsExpr(child: Expression) extends ParserExpr {
  override def dataType: DataType = DoubleType
  override def bridge: String = "minorToMajor"
  override def prettyName: String = "graft_minor_to_major"
  override protected def nullSafeEval(i: Any): Any =
    ParserOps.minorToMajor(i.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): MinorUnitsExpr = copy(child = c)
}

case class VolumeExpr(child: Expression) extends ParserExpr {
  override def dataType: DataType = IntegerType
  override def bridge: String = "parseVolume"
  override def prettyName: String = "graft_parse_volume"
  override protected def nullSafeEval(i: Any): Any =
    ParserOps.parseVolume(i.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): VolumeExpr = copy(child = c)
}

case class CurrencyExpr(child: Expression) extends ParserExpr {
  override def dataType: DataType = StringType
  override def bridge: String = "extractCurrency"
  override def prettyName: String = "graft_extract_currency"
  override protected def nullSafeEval(i: Any): Any =
    ParserOps.extractCurrency(i.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): CurrencyExpr = copy(child = c)
}

case class SteamDatetimeExpr(child: Expression) extends ParserExpr {
  override def dataType: DataType = TimestampType
  override def bridge: String = "parseSteamDatetime"
  override def prettyName: String = "graft_steam_datetime"
  override protected def nullSafeEval(i: Any): Any =
    ParserOps.parseSteamDatetime(i.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): SteamDatetimeExpr = copy(child = c)
}

case class PriceToFloatExpr(child: Expression) extends ParserExpr {
  override def dataType: DataType = DoubleType
  override def bridge: String = "parsePriceToFloat"
  override def prettyName: String = "graft_price_to_float"
  override protected def nullSafeEval(i: Any): Any =
    ParserOps.parsePriceToFloat(i.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(c: Expression): PriceToFloatExpr = copy(child = c)
}

case class ActivityHtmlExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("price", DoubleType),
    StructField("currency", StringType),
    StructField("action", StringType)))
  override def prettyName: String = "graft_parse_activity_html"
  override protected def nullSafeEval(i: Any): Any =
    ParserOps.parseActivityHtml(i.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ParserOps.parseActivityHtml($c)")
  override protected def withNewChildInternal(c: Expression): ActivityHtmlExpr = copy(child = c)
}
