package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StructType}

/** The `injectParser` leg of SparkSessionExtensions — with it, all FOUR
  * extension hooks the engine can use are exercised (functions, optimizer
  * rule, planner strategy, parser). The canonical use of a parser
  * extension is a maintenance COMMAND grammar (Delta's VACUUM/OPTIMIZE
  * shape), so this parser adds exactly that for the engine's CDC version
  * store:
  *
  * {{{ GRAFT VACUUM VERSIONS '<targetDir>' KEEP <n> }}}
  *
  * → [[GraftVacuumCommand]] → `StreamingJobs.vacuumVersions(dir, n)`,
  * returning one `deleted_version` row per removed version. Everything
  * that does not start with the GRAFT keyword delegates verbatim to the
  * session's parser — stock SQL (and its error messages) are untouched.
  *
  * Trust model: the statement hands any SQL client a recursive delete,
  * so the guards live in the OPERATOR, exactly like the keepLast ≥ 2
  * floor — `vacuumVersions` refuses a target that does not carry the
  * committer's `_graft_version_store` marker (or, legacy, a well-formed
  * parquet `v=N` dir), so a path typo or hostile argument cannot destroy
  * a directory with coincidental `v=N` children; deletion runs under the
  * store's commit lock. A GRAFT-prefixed statement that matches no verb
  * (including paths with embedded single quotes, which the '...' literal
  * cannot carry) fails HERE with the grammar spelled out, instead of
  * falling through to the delegate's confusing generic error. */
case class GraftVacuumCommand(dir: String, keep: Int) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("deleted_version", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    graft.streaming.StreamingJobs.vacuumVersions(dir, keep).map(Row(_))
}

/** `GRAFT DATASET HASH '<sfDir>'` — the second statement of the
  * maintenance grammar: the q58 Merkle-bucket snapshot fingerprint as a
  * SQL command (the operational "checksum this snapshot" verb an operator
  * runs before/after a migration; pair two of them to diff — q61). */
case class GraftDatasetHashCommand(dir: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("table_name", org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("bucket", LongType, nullable = true)(),
    AttributeReference("n_rows", LongType, nullable = false)(),
    AttributeReference("xhash", LongType, nullable = true)(),
    AttributeReference("sum31", LongType, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] =
    graft.queries.Relational3.q58DatasetHash(spark, dir).collect().toSeq
}

/** `GRAFT CHECK '<sfDir>'` — the third maintenance verb: the q49
  * data-quality constraint suite (uniqueness, referential integrity,
  * null/range, cross-column consistency) as a SQL command — the "run the
  * expectation gate before publishing" step an operator issues around a
  * load, next to the fingerprint (`DATASET HASH`) and retention
  * (`VACUUM VERSIONS`) verbs. Output is one row per constraint — bounded
  * by the suite size, never by the data — so the Seq[Row] command
  * contract is safe at any scale. */
case class GraftCheckCommand(dir: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("constraint_name", org.apache.spark.sql.types.StringType, nullable = false)(),
    AttributeReference("n_rows", LongType, nullable = true)(),
    AttributeReference("n_violations", LongType, nullable = true)(),
    AttributeReference("passed", org.apache.spark.sql.types.BooleanType, nullable = true)())
  override def run(spark: SparkSession): Seq[Row] =
    graft.queries.Entity.q49Dq(spark, dir).collect().toSeq
}

class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  private val Vacuum =
    """(?is)\s*GRAFT\s+VACUUM\s+VERSIONS\s+'([^']+)'\s+KEEP\s+(\d+)\s*;?\s*""".r
  private val DatasetHash =
    """(?is)\s*GRAFT\s+DATASET\s+HASH\s+'([^']+)'\s*;?\s*""".r
  private val Check =
    """(?is)\s*GRAFT\s+CHECK\s+'([^']+)'\s*;?\s*""".r

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case Vacuum(dir, keep)  => GraftVacuumCommand(dir, keep.toInt)
    case DatasetHash(dir)   => GraftDatasetHashCommand(dir)
    case Check(dir)         => GraftCheckCommand(dir)
    case s if s.trim.toUpperCase(java.util.Locale.ROOT).startsWith("GRAFT") =>
      throw new IllegalArgumentException(
        "malformed GRAFT statement — expected one of:\n" +
          "  GRAFT VACUUM VERSIONS '<dir>' KEEP <n>\n" +
          "  GRAFT DATASET HASH '<dir>'\n" +
          "  GRAFT CHECK '<dir>'\n" +
          "(paths are '...' literals and cannot contain single quotes); got: " +
          s.trim.take(120))
    case _ => delegate.parsePlan(sqlText)
  }

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
}
