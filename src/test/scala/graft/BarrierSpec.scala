package graft

/** core/Barrier.bounded (r12 VERDICT task 3): the three mechanisms must be
  * result-identical — the mode flag is a measurement instrument, never a
  * semantics knob — and an unknown mode must fail loudly rather than
  * silently skip the barrier.
  */
class BarrierSpec extends SparkSpec {
  import spark.implicits._

  test("checkpoint / persist / none are result-identical") {
    val base = Seq((1, "a"), (2, "b"), (1, "c")).toDF("k", "v")
      .groupBy("k").count()
    val results = Seq("checkpoint", "persist", "none").map { m =>
      sys.props("graft.barrier.mode") = m
      try graft.core.Barrier.bounded(base).orderBy("k").collect().toSeq
      finally {
        sys.props.remove("graft.barrier.mode")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    assert(results.distinct.size === 1, s"mechanism changed results: $results")
  }

  test("the default honors the call site; an unknown override fails loudly") {
    val df = Seq(1).toDF("x")
    // none-default site stays a plain plan (no LogicalRDD, no cache)
    val none = graft.core.Barrier.bounded(df, default = "none")
    assert(none.queryExecution.analyzed === df.queryExecution.analyzed)
    sys.props("graft.barrier.mode") = "bogus"
    try intercept[IllegalArgumentException](graft.core.Barrier.bounded(df))
    finally sys.props.remove("graft.barrier.mode")
  }

  test("production mains refuse a leaked A/B override (r13 task 7)") {
    // clean environment: a no-op
    graft.core.Barrier.assertNoOverride("SpecMain")
    sys.props("graft.barrier.mode") = "none"
    try {
      val e = intercept[IllegalStateException](
        graft.core.Barrier.assertNoOverride("SpecMain"))
      assert(e.getMessage.contains("SpecMain") &&
        e.getMessage.contains("graft.barrier.mode=none"))
    } finally sys.props.remove("graft.barrier.mode")
  }

  test("production mains also refuse a leaked hot-key gate override (r15)") {
    sys.props("graft.hotkey.gate.bytes") = "0"
    try {
      val e = intercept[IllegalStateException](
        graft.core.Barrier.assertNoOverride("SpecMain"))
      assert(e.getMessage.contains("graft.hotkey.gate.bytes=0"))
    } finally sys.props.remove("graft.hotkey.gate.bytes")
  }
}
