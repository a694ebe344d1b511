package graft

import org.apache.spark.sql.functions._

import graft.queries.{Curate, Sampling, TextOps}

/** q52_curate_e2e — the composed curation funnel. Value-level correctness
  * is the DuckDB oracle's job; this spec pins the COMPOSITION invariants:
  * (1) the funnel is monotone and accounts for every train-split doc;
  * (2) stage 1 agrees with the standalone q23_langid lane (same docs in,
  * same verdicts out — shared definition, no drift);
  * (3) the decontamination attrition equals a naive independent recount
  * (array-overlap of 5-gram sets against the raw test split). */
class CurateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def funnel = Curate.q52CurateE2e(spark, dir).collect()

  test("funnel is monotone per row and covers the whole train split") {
    val rows = funnel
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(t, l, q, d, f) = (2 to 6).map(r.getLong(_))
      assert(t >= l && l >= q && q >= d && d >= f && f >= 0,
        s"non-monotone funnel row: $r")
    }
    val nTrain = rows.map(_.getLong(2)).sum
    val expected = graft.core.Tables.documents(spark, dir)
      .filter(expr(s"${TextOps.h60("CAST(doc_id AS STRING)")} % 100 < 80"))
      .count()
    assert(nTrain == expected, s"train accounting: $nTrain != $expected")
  }

  test("stage 1 equals the standalone q23_langid verdicts on the train split") {
    val fromLane = TextOps.q23LangId(spark, dir)
      .filter(expr(s"${TextOps.h60("CAST(doc_id AS STRING)")} % 100 < 80"))
      .filter(col("predicted") =!= "und").count()
    assert(funnel.map(_.getLong(3)).sum == fromLane)
  }

  test("decontamination attrition equals a naive independent recount") {
    val rows = funnel
    val attrition = rows.map(r => r.getLong(5) - r.getLong(6)).sum
    // naive recount: quality-surviving dedup winners whose 5-gram set
    // overlaps any raw test-split doc's (tiny corpus — cross shape is fine)
    val docs = graft.core.Tables.documents(spark, dir)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("bucket", expr(s"${TextOps.h60("CAST(doc_id AS STRING)")} % 100"))
      .withColumn("sh", expr(Sampling.sh5Spark))
    val testSh = docs.filter(col("bucket") >= 90)
      .agg(flatten(collect_list(col("sh"))).as("all_sh"))
    val verdicts = graft.queries.TextOps.q23FilterVerdict(spark, dir)
      .select(col("doc_id"), col("keep"))
    val fps = graft.queries.TextOps.q23Fingerprint(spark, dir)
    val langOk = TextOps.q23LangId(spark, dir)
      .select(col("doc_id"), (col("predicted") =!= "und").as("lang_ok"))
    val s2 = docs.filter(col("bucket") < 80)
      .join(verdicts, "doc_id").join(langOk, "doc_id").join(fps, "doc_id")
      .filter(col("keep") && col("lang_ok"))
    val winners = s2.join(
      s2.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id")), Seq("doc_id"), "left_semi")
    val naive = winners.crossJoin(broadcast(testSh))
      .filter(size(array_intersect(col("sh"), col("all_sh"))) > 0)
      .count()
    assert(attrition == naive, s"decontam attrition $attrition != naive $naive")
  }
}
