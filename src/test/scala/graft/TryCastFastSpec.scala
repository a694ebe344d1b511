package graft

import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Pins `TryCastFastPathRule` (the non-throwing TRY_CAST(string AS
  * INT/BIGINT) rewrite) to be semantics-identical to Spark's stock TRY
  * cast. The reference implementation is reached BELOW the optimizer:
  * `Cast(Literal(s), t, EvalMode.TRY).eval()` is the genuine
  * throw-and-catch Spark path, un-rewritable by any logical rule — so the
  * equivalence here is against Spark itself, not against our own code.
  */
class TryCastFastSpec extends SparkSpec {

  /** Genuine Spark TRY-cast of one string, expression-interpreted. */
  private def sparkTry(s: String, toLong: Boolean): Any = {
    val lit = Literal(UTF8String.fromString(s), StringType)
    val t = if (toLong) LongType else IntegerType
    Cast(lit, t, Some("UTC"), EvalMode.TRY).eval(null)
  }

  // The full failure/acceptance surface: trim forms, signs, leading zeros,
  // every dot position, exponent forms, overflow at both INT and BIGINT
  // boundaries, garbage, non-ASCII digits, embedded whitespace, empties.
  private val battery: Seq[String] = Seq(
    "42", " 42 ", "\t42\n", "7", "+5", "-5", "00042", "-00042",
    "3.5", "3.0", ".5", "5.", "+.5", "-0.", ".", "..", "1.2.3", "3.5x",
    "", " ", "\t", "N", "R", "A", "abc", "0x1F", "1e3", "1E3", "1,000",
    "4 2", "+", "-", "+-1", "--1", "2147483647", "2147483648",
    "-2147483648", "-2147483649", "9223372036854775807",
    "9223372036854775808", "-9223372036854775808", "-9223372036854775809",
    "0", "-0", "+0", "\u0664\u0662", "\uFF14\uFF12", "42 ", " 42",
    "9999999999999999999999999", "-9999999999999999999999999")

  private def fuzz(n: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val alphabet = "0123456789+-. eE\t,xINFabn "
    (0 until n).map { _ =>
      val len = rnd.nextInt(12)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    } ++ (0 until n).map { _ =>
      // digit-heavy strings clustered near the integral boundaries
      val base = BigInt(Int.MaxValue) + BigInt(rnd.nextInt(7) - 3)
      val s = if (rnd.nextBoolean()) base else -base
      (if (rnd.nextBoolean()) " " else "") + s.toString
    }
  }

  private val corpus: Seq[String] = battery ++ fuzz(4000, seed = 11L)

  test("fast path ≡ Spark TRY cast on battery + fuzz, codegen path") {
    import spark.implicits._
    val df = corpus.toDF("s")
    val got = df.select(col("s"),
      expr("try_cast(s AS INT)").as("i"),
      expr("try_cast(s AS BIGINT)").as("l")).collect()
    assert(got.length == corpus.length)
    got.foreach { r =>
      val s = r.getString(0)
      assert(r.get(1) == sparkTry(s, toLong = false),
        s"INT mismatch on ${s.map(_.toInt).mkString("[", ",", "]")}")
      assert(r.get(2) == sparkTry(s, toLong = true),
        s"BIGINT mismatch on ${s.map(_.toInt).mkString("[", ",", "]")}")
    }
  }

  test("interpreted (no-codegen) path matches codegen path") {
    import spark.implicits._
    val df = corpus.toDF("s")
    def run() = df.select(
      expr("try_cast(s AS INT)").as("i"),
      expr("try_cast(s AS BIGINT)").as("l")).collect().toSeq
    val gen = run()
    val interp = withInterpretedOnly { run() }
    assert(gen == interp)
  }

  test("rule fires: optimized plan carries try_to_int, not a TRY Cast") {
    // parquet-backed input — a LocalRelation would be constant-folded
    // straight through the project, leaving no expression to inspect
    val plan = spark.read.parquet(s"$sf001/lineitem.parquet")
      .selectExpr("try_cast(l_returnflag AS INT) AS x",
        "try_cast(l_linestatus AS BIGINT) AS y")
      .queryExecution.optimizedPlan
    val exprs = plan.expressions.map(_.toString).mkString(";")
    assert(exprs.contains("try_to_int"), exprs)
    assert(exprs.contains("try_to_long"), exprs)
    assert(!exprs.toLowerCase.contains("try_cast"), exprs)
  }

  test("conf off restores the stock TRY cast") {
    import spark.implicits._
    withConfs("spark.graft.tryCastFastPath" -> "false") {
      val df = Seq("N", "42", "3.5").toDF("s")
        .selectExpr("try_cast(s AS INT) AS x")
      val exprs = df.queryExecution.optimizedPlan.expressions
        .map(_.toString).mkString(";")
      assert(!exprs.contains("try_to_int"), exprs)
      assert(df.collect().map(_.get(0)).toSeq == Seq(null, 42, null))
    }
  }

  test("non-string and non-integral TRY casts are untouched") {
    import spark.implicits._
    // string→DOUBLE and int→string TRY casts must keep their stock form
    val plan = Seq(("1.5", 7)).toDF("s", "n")
      .selectExpr("try_cast(s AS DOUBLE) AS d", "try_cast(n AS STRING) AS t")
      .queryExecution.optimizedPlan
    val exprs = plan.expressions.map(_.toString).mkString(";")
    assert(!exprs.contains("try_to_"), exprs)
  }

  test("null input stays null; q20 lane columns unchanged at sf0.001") {
    import spark.implicits._
    val df = Seq[String](null, "7").toDF("s").selectExpr("try_cast(s AS INT) AS x")
    assert(df.collect().map(_.get(0)).toSeq == Seq(null, 7))
    // end-to-end: the lane that motivated the rule, against its oracle
    // columns on real data (bad_cast all-null, good_cast = linenumber)
    val lane = SparkEntry.queries("q20_try_funcs")(spark, sf001)
    val rows = lane.select("bad_cast", "good_cast", "l_linenumber").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.get(0) == null)
      assert(r.get(1) == r.get(2))
    }
  }
}
