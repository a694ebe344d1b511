package graft.cli

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession
import graft.core.StateStore
import graft.ingest.Ingest
import graft.push.PushJob

/** Entry dispatch (SURVEY §2A R12; `lambda_function.py:20-84`): parse a job
  * config, route `cc_to_s3` (pull) / `s3_to_cc` (push), loop all tables of
  * a domain with the per-table 3-strike failure budget
  * (`CommCareAPIHandler.py:44-55`), and apply the staging URL rewrite
  * (`lambda_function.py:28-31`).
  *
  * Spark-native shape: the per-table loop is driver-side orchestration of
  * independent jobs — each table's extraction is itself distributed (the
  * graft-rest source slices time ranges across executors), so the loop
  * adds breadth, not serialization of the data plane.
  */
object Main {
  final case class TableConf(name: String, usesIndexedOn: Boolean, limit: Int)
  /** One push target (`lambda_function.py:69-81`): a landing-dir specifier
    * with its own HTTP method (`CommCareAPIHandler.py:321` reads
    * `data_type['method']`) and per-specifier auth token. */
  final case class SpecifierConf(name: String, method: String = "POST",
                                 token: Option[String] = None)
  final case class JobConf(
    operationType: String, domain: String, isStaging: Boolean,
    tables: Seq[TableConf], urlBase: String, landingDir: String,
    bronzeDir: String, stateDir: String, endpoint: String, testMode: Boolean,
    specifiers: Seq[SpecifierConf] = Seq.empty,
    authToken: Option[String] = None)

  def parseConf(json: String): JobConf = {
    val n = new ObjectMapper().readTree(json)
    def str(k: String, d: String = ""): String =
      Option(n.get(k)).map(_.asText()).getOrElse(d)
    def bool(k: String): Boolean = Option(n.get(k)).exists(_.asBoolean())
    val tables = Option(n.get("tables")).map { t =>
      (0 until t.size()).map(t.get).map { tn =>
        TableConf(tn.get("name").asText(),
          Option(tn.get("uses_indexed_on")).exists(_.asBoolean()),
          Option(tn.get("limit")).map(_.asInt()).getOrElse(1000))
      }
    }.getOrElse(Seq.empty)
    val specifiers = Option(n.get("specifiers")).map { s =>
      (0 until s.size()).map(s.get).map { sn =>
        SpecifierConf(sn.get("name").asText(),
          Option(sn.get("method")).map(_.asText()).getOrElse("POST"),
          Option(sn.get("auth_token")).map(_.asText()).filter(_.nonEmpty))
      }
    }.getOrElse(Seq.empty)
    JobConf(str("operation_type"), str("domain"), bool("is_staging"), tables,
      str("url_base"), str("landing_dir"), str("bronze_dir"), str("state_dir"),
      str("endpoint"), bool("test_mode"), specifiers,
      Option(n.get("auth_token")).map(_.asText()).filter(_.nonEmpty))
  }

  /** `lambda_function.py:28-31`: staging domains address the staging server;
    * the `staging-` prefix is stripped from the effective domain. */
  def effectiveDomain(domain: String, isStaging: Boolean): String =
    if (isStaging) domain.stripPrefix("staging-") else domain

  def apiUrl(conf: JobConf, table: TableConf): String =
    s"${conf.urlBase}/${effectiveDomain(conf.domain, conf.isStaging)}/api/${table.name}"

  /** R12 pull loop with the R11 per-table budget: up to 3 table failures
    * are skipped-and-counted; the 4th aborts the run. Watermark state is
    * per (domain, table). Returns rows ingested per table. */
  def runPull(spark: SparkSession, conf: JobConf,
              pullTable: (SparkSession, JobConf, TableConf) => Long = defaultPull)
  : Map[String, Long] = {
    var failures = 0
    val results = scala.collection.mutable.Map[String, Long]()
    conf.tables.foreach { t =>
      try results(t.name) = pullTable(spark, conf, t)
      catch {
        case e: Exception =>
          failures += 1
          if (failures > 3)
            throw new IllegalStateException(
              s"table failure budget exceeded after ${t.name} (APIErrorMax, CommCareAPIHandler.py:23-24)", e)
          System.err.println(s"[cli] table ${t.name} failed (${failures}/3): ${e.getMessage}")
      }
    }
    results.toMap
  }

  /** `CommCareAPIHandler.py:71-73`: test-mode runs land in a `-test`
    * sibling of the type dir — production data is never mixed with a dry
    * run's output. */
  def typeDir(conf: JobConf, table: String): String =
    if (conf.testMode) s"$table-test" else table

  private def defaultPull(spark: SparkSession, conf: JobConf, t: TableConf): Long = {
    val state = new StateStore(conf.stateDir)
    Ingest.incrementalRun(spark, s"${conf.landingDir}/${t.name}",
      s"${conf.bronzeDir}/${typeDir(conf, t.name)}", state,
      s"${t.name}.last_successful_job_time")
  }

  def runPush(spark: SparkSession, conf: JobConf, specifier: String,
              method: String = "POST", token: Option[String] = None): Unit = {
    val df = spark.read.json(s"${conf.landingDir}/$specifier")
      .selectExpr("to_json(struct(*)) AS doc")
    PushJob.push(df, "doc", conf.endpoint, method = method,
      authToken = token.orElse(conf.authToken))
  }

  /** `lambda_function.py:69-81`: push ALL configured specifiers, each with
    * its own method and token. Returns the specifiers pushed, in order. */
  def runPushAll(spark: SparkSession, conf: JobConf): Seq[String] = {
    val specs =
      if (conf.specifiers.nonEmpty) conf.specifiers
      else Seq(SpecifierConf("default"))
    specs.map { sp =>
      runPush(spark, conf, sp.name, sp.method, sp.token)
      sp.name
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: graft.cli.Main <config.json> [specifier]")
    val conf = parseConf(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(0))), "UTF-8"))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try conf.operationType match {
      case "cc_to_s3" =>
        val res = runPull(spark, conf)
        println(res.map { case (k, v) => s"$k=$v" }.mkString("pulled: ", ", ", ""))
      case "s3_to_cc" =>
        val pushed =
          if (args.length > 1) { runPush(spark, conf, args(1)); Seq(args(1)) }
          else runPushAll(spark, conf)
        println(pushed.mkString("pushed: ", ", ", ""))
      case other => throw new IllegalArgumentException(s"unknown operation_type: $other")
    } finally spark.stop()
  }
}
