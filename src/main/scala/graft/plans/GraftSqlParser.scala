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
  * that is not this statement delegates verbatim to the session's parser
  * — stock SQL (and its error messages) are untouched, and the keepLast
  * floor (≥ 2, the replay-base invariant) is enforced by the operator,
  * surfacing through SQL like any command error. */
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
