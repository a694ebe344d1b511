package graft

import org.scalatest.funsuite.AnyFunSuite

/** Anchor-normalized cross-round bench deltas (core/PrevBench.scala — r12
  * VERDICT task 4): the parser must read the DRIVER's wrapper layout
  * (pretty JSON, `tail` fragment of the full line + `parsed` compact line),
  * and the report must apply the documented conventions — time-like /
  * clock, CPU-rate × clock, fsync-rate / io — so BENCH_r{N}.json carries a
  * mechanical replacement for prose clock claims.
  */
class PrevBenchSpec extends AnyFunSuite {

  // a minimal driver-wrapper shape: tail carries the end of the FULL line
  // (per-lane noop dict), parsed carries the compact line
  private val wrapper =
    """{
      |  "n": 12,
      |  "rc": 0,
      |  "tail": "06,\"q62_triangles\":4.0,\"q67_cooccur_sim\":2.0,\"queries\":{\"q62_triangles\":4.0,\"q93_containment_full\":5.0},\"sf\":\"/x\"}",
      |  "parsed": {"metric":"total_noop","value":200.0,
      |    "ingest_rows_per_sec":200000.0,"stream_warm_rows_per_sec":70000.0,
      |    "push_rows_per_sec":20000.0,
      |    "anchor_s":0.8,"anchor_io_mbps":300.0,
      |    "queries":{"q93_containment_full":5.0,"q34_funnel":0.4}}
      |}""".stripMargin

  private def prevFile(): java.io.File = {
    val f = java.nio.file.Files.createTempFile("prevbench", ".json")
    java.nio.file.Files.write(f, wrapper.getBytes("UTF-8"))
    f.toFile
  }

  test("parses the driver wrapper: anchors, headline metrics, lane dicts") {
    val p = graft.core.PrevBench.load(prevFile()).get
    assert(p.anchorS === 0.8 && p.anchorIo === 300.0 && p.totalNoop === 200.0)
    assert(p.ingest === 200000.0 && p.streamWarm === 70000.0 && p.push === 20000.0)
    // lanes from BOTH the tail's queries dict and the compact line's
    assert(p.lanes("q62_triangles") === 4.0)
    assert(p.lanes("q93_containment_full") === 5.0)
    assert(p.lanes("q34_funnel") === 0.4)
  }

  test("report applies the normalization conventions") {
    val prev = graft.core.PrevBench.load(prevFile())
    // this round's box: 2x slower clock (anchor 1.6 vs 0.8), same disk
    val rpt = graft.core.PrevBench.report(
      anchorNow = 1.6, anchorIoNow = 300.0,
      totalNoopNow = 400.0,        // raw 2x slower == parity on a 2x-slower clock
      ingestNow = 200000.0,        // same raw fsync rate, same disk -> 1.0
      streamWarmNow = 35000.0,     // raw half -> 0.5 (io-normalized)
      pushNow = 10000.0,           // raw half, but clock 2x slower -> 1.0
      noopNow = Map("q62_triangles" -> 4.0,   // raw parity on 2x clock -> 0.5
        "q93_containment_full" -> 20.0),      // raw 4x on 2x clock -> 2.0
      prev = prev)
    def f(k: String): Double =
      ("\"" + k + "\":(-?[0-9.]+)").r.findFirstMatchIn(rpt).get.group(1).toDouble
    assert(f("clock_ratio") === 2.0)
    assert(f("io_ratio") === 1.0)
    assert(f("total_noop") === 1.0)
    assert(f("ingest") === 1.0)
    assert(f("stream_warm") === 0.5)
    assert(f("push") === 1.0)
    assert(f("q62_triangles") === 0.5)
    assert(f("q93_containment_full") === 2.0)
    // the biggest mover sorts first
    assert(rpt.indexOf("q93_containment_full") < rpt.indexOf("q62_triangles")
      || math.abs(math.log(2.0)) === math.abs(math.log(0.5)))
  }

  test("no previous artifact -> null, never a bench failure") {
    assert(graft.core.PrevBench.report(1.0, 300.0, 100.0, 1.0, 1.0, 1.0,
      Map.empty[String, Double], prev = None) === "null")
  }
}
