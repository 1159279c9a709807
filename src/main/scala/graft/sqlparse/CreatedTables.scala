package graft.sqlparse

import scala.util.matching.Regex

/** Discover which tables a SQL script creates — the reference parses its
  * CTAS scripts to learn the publish set (`lib/parse_created_tables.py:
  * 12-38`, sqlparse-based, including chasing `ALTER TABLE x RENAME TO y`
  * so the FINAL name is reported; tested against three WOW SQL vintages
  * in `tests/test_parse_created_tables.py:48-63`).
  *
  * We keep the same contract. Statement-shape detection is intentionally
  * lexical (CREATE TABLE handles unparseable Postgres dialect scripts),
  * with rename-chasing applied on top — same robustness trade-off the
  * reference made by using sqlparse instead of a full parser.
  */
object CreatedTables {

  private val createRe: Regex =
    """(?is)\bCREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMP(?:ORARY)?\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w."]+)""".r
  private val renameRe: Regex =
    """(?is)\bALTER\s+TABLE\s+([\w."]+)\s+RENAME\s+TO\s+([\w."]+)""".r

  private def clean(name: String): String =
    name.replace("\"", "").split('.').last.toLowerCase

  /** Final created-table names after applying renames in script order. */
  def inSql(sql: String): Seq[String] = {
    val created = collection.mutable.LinkedHashSet.empty[String]
    // interleave CREATE/RENAME statements in source order
    val events: Seq[(Int, Either[String, (String, String)])] =
      createRe.findAllMatchIn(sql).map(m =>
        m.start -> Left(clean(m.group(1)))).toSeq ++
      renameRe.findAllMatchIn(sql).map(m =>
        m.start -> Right((clean(m.group(1)), clean(m.group(2))))).toSeq
    events.sortBy(_._1).foreach {
      case (_, Left(t)) => created += t
      case (_, Right((from, to))) =>
        if (created.remove(from)) created += to
    }
    created.toSeq
  }

  def inScripts(sqls: Seq[String]): Seq[String] =
    sqls.flatMap(inSql).distinct

  /** Parser-backed variant (SURVEY §2.11's recommendation): parse each
    * statement with Spark's own SQL parser and walk the logical plan
    * for CreateTable / CTAS / RenameTable nodes. Statements that don't
    * parse as Spark SQL (the reference's scripts are Postgres dialect)
    * fall back to the lexical scan — same robustness trade-off,
    * exact results whenever the dialect IS Spark's.
    */
  def inSqlViaParser(
      spark: org.apache.spark.sql.SparkSession, sql: String): Seq[String] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedIdentifier
    import org.apache.spark.sql.catalyst.plans.logical._
    val created = collection.mutable.LinkedHashSet.empty[String]
    def nameOf(plan: LogicalPlan): Option[String] = plan match {
      case u: UnresolvedIdentifier => Some(u.nameParts.last.toLowerCase)
      case _ => None
    }
    splitStatements(sql).foreach { stmt =>
      try {
        org.apache.spark.sql.graftshim.ColumnBridge
          .parsePlan(spark, stmt).foreach {
            case c: CreateTable => nameOf(c.name).foreach(created += _)
            case c: CreateTableAsSelect => nameOf(c.name).foreach(created += _)
            case c: ReplaceTableAsSelect => nameOf(c.name).foreach(created += _)
            case r: RenameTable =>
              r.child match {
                case u: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView =>
                  val from = u.multipartIdentifier.last.toLowerCase
                  val to = r.newName.last.toLowerCase
                  if (created.remove(from)) created += to
                case _ =>
              }
            case _ =>
          }
      } catch {
        case _: Exception => inSql(stmt).foreach(created += _)
      }
    }
    created.toSeq
  }

  private[sqlparse] def splitStatements(sql: String): Seq[String] =
    sql.split(";").map(_.trim).filter(_.nonEmpty).toSeq
}
