package graft

import org.apache.spark.sql.DataFrame
import graft.core.Hits

/** core/Hits: closed-form fixtures, a BigInt driver replica of the exact
  * fixed-point recurrence, two-strategy parity (fused vs supersteps forced
  * via gate 0), and the w<=0 / envelope-routing contracts.
  */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  private val H0 = 1000000L

  private def edgesDf(es: Seq[(Long, Long, Long)]): DataFrame =
    es.toDF("c", "s", "w")

  private def run(es: Seq[(Long, Long, Long)], iters: Int = 4,
                  h0: Long = H0, gate: Long = 4000000L): Map[String, Long] =
    Hits.run(edgesDf(es), iters, h0, gate).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Driver replica of the exact integer recurrence (BigInt throughout). */
  private def replica(es: Seq[(Long, Long, Long)], iters: Int,
                      h0: Long): Map[String, Long] = {
    val pos = es.filter(_._3 > 0)
    val cs = pos.map(_._1).distinct
    val ss = pos.map(_._2).distinct
    var hub = cs.map(_ -> BigInt(h0)).toMap
    var auth = ss.map(_ -> BigInt(0)).toMap
    def norm(raw: Map[Long, BigInt]): Map[Long, BigInt] = {
      val tot = raw.values.sum
      raw.map { case (k, v) =>
        k -> (if (tot == 0) BigInt(0) else v * h0 / tot)
      }
    }
    for (_ <- 1 to iters) {
      auth = norm(ss.map(s =>
        s -> pos.filter(_._2 == s).map(e => BigInt(e._3) * hub(e._1)).sum).toMap)
      hub = norm(cs.map(c =>
        c -> pos.filter(_._1 == c).map(e => BigInt(e._3) * auth(e._2)).sum).toMap)
    }
    hub.map { case (c, v) => s"C$c" -> v.toLong } ++
      auth.map { case (s, v) => s"S$s" -> v.toLong }
  }

  test("single edge: hub and authority both carry the full mass h0") {
    val got = run(Seq((1L, 10L, 3L)))
    assert(got === Map("C1" -> H0, "S10" -> H0))
  }

  test("star fixture matches the BigInt replica exactly") {
    val es = Seq((1L, 10L, 1L), (2L, 10L, 1L), (3L, 10L, 1L), (4L, 10L, 1L),
      (1L, 20L, 1L))
    assert(run(es) === replica(es, 4, H0))
    // the shared supplier out-ranks the exclusive one
    val got = run(es)
    assert(got("S10") > got("S20"))
  }

  test("seeded random graph matches the replica bit-for-bit") {
    val rnd = new scala.util.Random(88)
    val es = (0 until 200).map(_ =>
      (rnd.nextInt(12).toLong, 100L + rnd.nextInt(8), rnd.nextInt(5) + 1L))
      .distinct
    assert(run(es) === replica(es, 4, H0))
  }

  test("two strategies, one semantic: gate 0 (supersteps) equals fused") {
    val rnd = new scala.util.Random(89)
    val es = (0 until 150).map(_ =>
      (rnd.nextInt(10).toLong, 100L + rnd.nextInt(6), rnd.nextInt(4) + 1L))
      .distinct
    assert(run(es) === run(es, gate = 0L))
  }

  test("w <= 0 edges are dropped before the strategy gate (both paths)") {
    val base = Seq((1L, 10L, 2L), (2L, 10L, 1L))
    val noisy = base ++ Seq((3L, 10L, 0L), (4L, 20L, -5L))
    assert(run(noisy) === run(base))
    assert(run(noisy, gate = 0L) === run(base, gate = 0L))
  }

  test("weight envelope overflow routes to supersteps, same answer") {
    // h0 so large that h0 * sum(w) > Long.Max: the fused path's Long
    // accumulators would overflow, so run() must take the decimal path —
    // verified against the BigInt replica
    val es = Seq((1L, 10L, 1000L), (2L, 10L, 500L), (1L, 20L, 250L))
    val bigH0 = Long.MaxValue / 1000L
    assert(run(es, h0 = bigH0) === replica(es, 4, bigH0))
  }
}
