package graft

import org.apache.spark.sql.functions._

/** Delta-varint adjacency packing (functions/PackedLongs.scala — the q62
  * closing-join shuffle diet): round-trip identity, set-equivalence with
  * array_intersect on seeded random sorted-distinct lists (including the
  * per-copy-offset id shape ScaleSmoke widens with), loud unsorted-input
  * failure, and the byte-diet property itself (clustered ids pack at
  * 1–3 B/neighbor vs the flat 8 the exchange shipped before).
  */
class PackedLongsSpec extends SparkSpec {
  import spark.implicits._

  private def intersectViaPacked(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    Seq((a, b)).toDF("a", "b")
      .select(expr(
        "intersect_packed(pack_sorted_longs(a), pack_sorted_longs(b))").as("w"))
      .head().getSeq[Long](0)

  test("self-intersection round-trips the packed list exactly") {
    val xs = Seq(-9000000000L, -5L, 0L, 1L, 2L, 7L, 4096L, 3000000000L)
    assert(intersectViaPacked(xs, xs) === xs)
    assert(intersectViaPacked(Seq.empty, xs) === Seq.empty)
    assert(intersectViaPacked(xs, Seq.empty) === Seq.empty)
  }

  test("set-equivalent to array_intersect on seeded random sorted lists") {
    val rnd = new scala.util.Random(62)
    (0 until 50).foreach { trial =>
      // the ScaleSmoke shape: ids clustered in a per-copy window at a big
      // offset, some trials spanning copies / negatives for generality
      val off = rnd.nextInt(4) match {
        case 0 => 0L
        case 1 => 10000000L * rnd.nextInt(128)
        case 2 => -5000000L
        case _ => 1L << rnd.nextInt(60)
      }
      def mk(): Seq[Long] =
        Seq.fill(rnd.nextInt(120))(off + rnd.nextInt(20000).toLong)
          .distinct.sorted
      val (a, b) = (mk(), mk())
      val expected = a.toSet.intersect(b.toSet).toSeq.sorted
      assert(intersectViaPacked(a, b) === expected, s"trial $trial")
    }
  }

  test("unsorted input fails loudly instead of mis-walking downstream") {
    val ex = intercept[Exception] {
      Seq(Seq(5L, 3L)).toDF("a")
        .select(expr("pack_sorted_longs(a)")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("not strictly ascending")))
  }

  test("equal adjacent elements fail loudly — the deduplicated-list contract") {
    // r12 ADVICE: a gap-0 element used to pack silently and intersect_packed
    // then emitted duplicates, diverging from array_intersect's set result
    val ex = intercept[Exception] {
      Seq(Seq(3L, 3L, 5L)).toDF("a")
        .select(expr("pack_sorted_longs(a)")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("not strictly ascending")))
  }

  test("truncated varint binary fails diagnosably, not as AIOOBE") {
    // a lone continuation byte promises more bytes than the buffer holds;
    // the function is SQL-registered so arbitrary binaries can reach it
    val ex = intercept[Exception] {
      spark.range(1)
        .select(expr("intersect_packed(X'80', X'02')")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("truncated varint")))
  }

  test("clustered adjacency packs at 1-3 B/neighbor, never above flat-8") {
    // a realistic q62 adjacency row: ~100 sorted neighbors inside one
    // 20k-wide per-copy id window at a 10^9-scale offset
    val rnd = new scala.util.Random(7)
    val nbrs = Seq.fill(100)(1280000000L + rnd.nextInt(20000).toLong)
      .distinct.sorted
    val packed = Seq(nbrs).toDF("a")
      .select(expr("pack_sorted_longs(a)")).head().getAs[Array[Byte]](0)
    assert(packed.length <= 3 * nbrs.length + 10,
      s"${packed.length} B for ${nbrs.length} clustered neighbors")
    assert(packed.length < 8 * nbrs.length)
  }
}
