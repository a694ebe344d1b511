package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => PropTest}
import graft.core.ApiLimitCalculator

/** ScalaCheck properties (SURVEY §5d): invariants the reference needs but
  * never tests. Raw scalacheck runner (the scalatest bridge artifact isn't
  * in the offline cache). */
class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int = 100): Unit = {
    val res = PropTest.check(PropTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  test("limit calculator: result ≤ 10000 and projected size ≤ target·(1+ε)") {
    check(Prop.forAll(Gen.choose(1, 10000), Gen.choose(1024L, 64L * 1024 * 1024)) {
      (limit: Int, observed: Long) =>
        val next = ApiLimitCalculator.newLimit(limit, observed)
        val projected = observed.toDouble * next / limit
        next <= ApiLimitCalculator.MaxLimit && next >= 0 &&
          (projected <= ApiLimitCalculator.MaxFileSizeBytes *
            ApiLimitCalculator.GraceFactor * 1.001 ||
            next == ApiLimitCalculator.MaxLimit)
    })
  }

  test("simhash60 / minhash12: expressions equal their reference formulations on random inputs") {
    val spark = SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val sigRef = graft.queries.Similarity.sigSpark
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0L, graft.functions.MinHashFamily.P - 1))) {
      (hs: List[Long]) =>
        // one row, forced through an executor stage (LocalRelation folds)
        val df = Seq(hs).toDF("hs").repartition(1)
        val (fast, slow) = df.select(expr("minhash12(hs)").as("f"), expr(sigRef).as("s"))
          .as[(Seq[Long], Seq[Long])].head()
        val mh = fast == slow
        // simhash60 vs a Scala-side majority-vote oracle
        val sh = df.select(expr("simhash60(hs)")).as[Long].head()
        val votes = Array.fill(60)(0)
        hs.foreach(h => (0 until 60).foreach(b =>
          votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)))
        val want = (0 until 60).foldLeft(0L)((s, b) =>
          if (votes(b) > 0) s | (1L << b) else s)
        mh && sh == want
    }, n = 20)
  }

  test("tokenize_pos: substr/reconstruction laws hold on random space-ridden strings") {
    val spark = SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    // strings biased toward spaces (runs of separators are the edge case)
    val genText = Gen.listOf(Gen.frequency(
      3 -> Gen.const(' '), 5 -> Gen.alphaNumChar, 1 -> Gen.const('π')))
      .map(_.mkString)
    check(Prop.forAll(genText) { (s: String) =>
      val df = Seq(s).toDF("text").repartition(1)
        .select(col("text"), expr("tokenize_pos(text)").as(Seq("pos", "start_char", "tok")))
      val substrOk = df.filter(
        expr("substr(text, start_char + 1, length(tok)) != tok")).count() == 0L
      val rebuilt = df.orderBy(col("pos")).select(col("tok")).as[String].collect().toSeq
      substrOk && rebuilt == s.split(" ", -1).toSeq
    }, n = 30)
  }

  test("deflate_len: positive, deterministic, and never larger than raw + overhead") {
    val spark = SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    check(Prop.forAll(Gen.asciiPrintableStr) { (s: String) =>
      val n = Seq(s).toDF("t").repartition(1)
        .select(expr("deflate_len(t)")).as[Int].head()
      val again = graft.functions.DeflateLen.compressedLength(
        s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // raw deflate worst case: ~5 bytes per 16 KiB block + payload
      n > 0 && n == again && n <= s.getBytes("UTF-8").length + 11
    }, n = 30)
  }

  test("pack arithmetic: offsets in [0, cap), pack_id consistent with the prefix sum") {
    val spark = SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.functions._
    check(Prop.forAll(Gen.listOfN(25, Gen.choose(1, 120))) { (sizes: List[Int]) =>
      val d = java.nio.file.Files.createTempDirectory("graft_packprop").toString
      sizes.zipWithIndex.map { case (n, i) =>
        (i.toLong, (0 until n).map(j => s"t$j").mkString(" "), "en", "s0", 1L)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$d/documents.parquet")
      val rows = graft.queries.Sampling.q35Pack(spark, d)
        .select($"doc_id", $"n_toks", $"pack_id", $"pack_offset", $"spans_boundary")
        .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
      val cap = 512L
      var cum = 0L
      rows.forall { case (_, n, packId, off, spans) =>
        val start = cum; cum += n
        packId == start / cap &&
          off == start % cap &&
          off >= 0 && off < cap &&
          spans == ((cum - 1) / cap > packId)
      }
    }, n = 15)
  }

  test("dedup idempotence: dropDuplicates over overlapping extracts is a fixpoint") {
    val spark = SparkSpec.session
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(40, Gen.choose(0L, 19L)), Gen.choose(1, 4)) {
      (ids: List[Long], reps: Int) =>
        // overlapping extracts re-send rows (R2 >=-restart): union of `reps`
        // copies must collapse to the distinct key set, and re-applying
        // dedup must change nothing (fixpoint)
        val base = ids.map(i => (i, s"payload-$i")).toDF("id", "v")
        val overlapped = (1 to reps).map(_ => base).reduce(_ unionAll _)
        val once = overlapped.dropDuplicates(Seq("id"))
        once.count() == ids.distinct.size &&
          once.dropDuplicates(Seq("id")).count() == once.count() &&
          once.select($"id").except(base.select($"id")).count() == 0
    }, n = 20)
  }
}
