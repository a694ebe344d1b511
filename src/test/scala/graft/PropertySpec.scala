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
