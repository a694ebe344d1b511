package graft

import graft.cli.Main

/** Unit/e2e spec for the R12 dispatch layer. */
class CliSpec extends SparkSpec {

  private val confJson =
    """{"operation_type": "cc_to_s3", "domain": "staging-acme", "is_staging": true,
      | "tables": [{"name": "case", "uses_indexed_on": true, "limit": 500},
      |            {"name": "form", "uses_indexed_on": false}],
      | "url_base": "http://api.example", "landing_dir": "/tmp/l",
      | "bronze_dir": "/tmp/b", "state_dir": "/tmp/s", "endpoint": "", "test_mode": true}""".stripMargin

  test("config parse + staging URL rewrite (lambda_function.py:28-31)") {
    val c = Main.parseConf(confJson)
    assert(c.operationType === "cc_to_s3")
    assert(c.tables.map(_.name) === Seq("case", "form"))
    assert(c.tables.head.limit === 500)
    assert(Main.effectiveDomain(c.domain, c.isStaging) === "acme")
    assert(Main.effectiveDomain("prod-acme", isStaging = false) === "prod-acme")
    assert(Main.apiUrl(c, c.tables.head) === "http://api.example/acme/api/case")
  }

  test("R12 multi-table loop tolerates 3 failures, aborts on the 4th") {
    val c = Main.parseConf(confJson).copy(tables =
      (1 to 5).map(i => Main.TableConf(s"t$i", usesIndexedOn = true, 100)),
      stateDir = java.nio.file.Files.createTempDirectory("cli").toString)
    // every table fails
    val e = intercept[IllegalStateException] {
      Main.runPull(spark, c, (_, _, _) => throw new RuntimeException("boom"))
    }
    assert(e.getMessage.contains("budget exceeded"))

    // 3 failures among successes: run completes, failed tables absent
    var n = 0
    val res = Main.runPull(spark, c, (_, _, t) => {
      n += 1
      if (n <= 3) throw new RuntimeException("flaky") else 7L
    })
    assert(res === Map("t4" -> 7L, "t5" -> 7L))
  }
}
