package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Session extension adding `MATCH_RECOGNIZE` to `spark.sql(...)`:
  * a [[ParserInterface]] delegate that recognizes the row-pattern statement
  * shape and lowers it through [[MatchRecognize]]; everything else passes to
  * Spark's parser untouched. Activate with
  * `spark.sql.extensions=graft.sql.GraftSqlExtensions` (or
  * `builder.withExtensions(new GraftSqlExtensions)`).
  */
class GraftSqlExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectParser((session, delegate) => new MatchRecognizeParser(session, delegate))
}

final class MatchRecognizeParser(session: SparkSession, delegate: ParserInterface)
  extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case MatchRecognize.StatementRe(_, _) =>
      MatchRecognize.sql(session, sqlText).queryExecution.logical
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan = sqlText match {
    case MatchRecognize.StatementRe(_, _) =>
      MatchRecognize.sql(session, sqlText).queryExecution.logical
    case _ => delegate.parseQuery(sqlText)
  }

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
