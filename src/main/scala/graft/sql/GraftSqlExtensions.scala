package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Session extension making the library's surface reachable from PURE SQL:
  *
  *  - `MATCH_RECOGNIZE` statements via an injected [[ParserInterface]]
  *    delegate that recognizes the row-pattern statement shape and lowers
  *    it through [[MatchRecognize]]; everything else passes to Spark's
  *    parser untouched;
  *  - the native codegen'd pipeline expressions as SQL functions
  *    (`graft_charfold`, `graft_shingle_md5`, `graft_rotminhash`,
  *    `graft_simhash`, `graft_qdot`, `graft_lsh_bucket`), so a SQL-only
  *    user can build the same dedup/fingerprint pipelines the Column API
  *    exposes.
  *
  * Activate with `spark.sql.extensions=graft.sql.GraftSqlExtensions` (or
  * `builder.withExtensions(new GraftSqlExtensions)`).
  */
class GraftSqlExtensions extends (SparkSessionExtensions => Unit) {
  import graft.functions._

  private def intLit(e: Expression, fn: String, param: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $param must be an integer literal, got $other")
  }

  private def fn(name: String, builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo("graft.functions", name), builder)

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectParser((session, delegate) => new MatchRecognizeParser(session, delegate))
    e.injectFunction(fn("graft_charfold", {
      case Seq(s) => CharFoldHash(s, 0L)
      case Seq(s, seed) => CharFoldHash(s, intLit(seed, "graft_charfold", "seed").toLong)
      case args => throw new IllegalArgumentException(
        s"graft_charfold(str[, seed]): got ${args.length} arguments")
    }))
    e.injectFunction(fn("graft_shingle_md5", {
      case Seq(w) => ShingleMd5(w, 3)
      case Seq(w, n) => ShingleMd5(w, intLit(n, "graft_shingle_md5", "n"))
      case args => throw new IllegalArgumentException(
        s"graft_shingle_md5(words[, n]): got ${args.length} arguments")
    }))
    e.injectFunction(fn("graft_shingles", {
      case Seq(w) => ShingleStrings(w, 3)
      case Seq(w, n) => ShingleStrings(w, intLit(n, "graft_shingles", "n"))
      case args => throw new IllegalArgumentException(
        s"graft_shingles(words[, n]): got ${args.length} arguments")
    }))
    e.injectFunction(fn("graft_rotminhash", {
      case Seq(b, k) => RotMinHash(b, intLit(k, "graft_rotminhash", "k"))
      case args => throw new IllegalArgumentException(
        s"graft_rotminhash(base, k): got ${args.length} arguments")
    }))
    e.injectFunction(fn("graft_simhash", {
      case Seq(h, bits) => SimHashBits(h, intLit(bits, "graft_simhash", "bits"))
      case args => throw new IllegalArgumentException(
        s"graft_simhash(hashes, bits): got ${args.length} arguments")
    }))
    e.injectFunction(fn("graft_qdot", {
      case Seq(a, b) => QDot(a, b)
      case args => throw new IllegalArgumentException(
        s"graft_qdot(a, b): got ${args.length} arguments")
    }))
    e.injectFunction(fn("graft_lsh_bucket", {
      case Seq(q, planes) => LshBucket(q, intLit(planes, "graft_lsh_bucket", "planes"))
      case args => throw new IllegalArgumentException(
        s"graft_lsh_bucket(q, planes): got ${args.length} arguments")
    }))
  }
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
