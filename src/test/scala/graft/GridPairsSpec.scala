package graft

import org.apache.spark.sql.functions._
import graft.core.SkewJoin

/** SkewJoin.gridSelfPairs — the 2-D grid must (a) emit every unordered
  * pair of a key's rows exactly once (no cell double-counts a pair, no
  * boundary pair is lost), and (b) actually bound per-cell work: the
  * whole point over 1-D salting is that a cell's pair count stays ~cap²
  * no matter how viral the key is.
  */
class GridPairsSpec extends SparkSpec {
  import spark.implicits._

  private val cap = 64

  /** keys with row counts straddling the cap: 100 (≈cap), 500, 3000. */
  private lazy val fixture = {
    val rows = Seq(("a", 100), ("b", 500), ("c", 3000)).flatMap {
      case (k, n) => (0 until n).map(i => (k, n.toLong, i.toLong))
    }
    rows.toDF("k", "f", "id").withColumn("e", struct(col("id").as("doc_id")))
      .select("k", "f", "e")
  }

  test("grid pairs == naive self-join pairs, each exactly once") {
    val grid = SkewJoin.gridSelfPairs(fixture, "k", "f", "e",
        carry = Seq.empty, cap = cap)
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("k"), col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .as[(String, Long, Long)].collect().toSeq
    // exactly once: no dedup applied above, so duplicates would surface
    assert(grid.size === grid.distinct.size, "a pair was emitted twice")
    val naive = Seq("a" -> 100, "b" -> 500, "c" -> 3000).flatMap {
      case (k, n) =>
        for (i <- 0 until n; j <- i + 1 until n)
          yield (k, i.toLong, j.toLong)
    }
    assert(grid.sorted === naive.sorted)
  }

  test("property: grid pairs == naive pairs for arbitrary multiplicity mixes") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    // keys with arbitrary row counts straddling the cap from both sides —
    // the boundary cases (f == cap, f == cap+1, f >> cap) all land here
    val mixGen = Gen.listOfN(4, Gen.chooseNum(1, 400))
    val prop = Prop.forAll(mixGen) { ns =>
      val keys = ns.zipWithIndex.map { case (n, i) => (s"k$i", n) }
      val df = keys.flatMap { case (k, n) =>
        (0 until n).map(i => (k, n.toLong, i.toLong))
      }.toDF("k", "f", "id")
        .withColumn("e", struct(col("id").as("doc_id")))
        .select("k", "f", "e")
      val grid = SkewJoin.gridSelfPairs(df, "k", "f", "e",
          carry = Seq.empty, cap = 32)
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("k"), col("x.doc_id"), col("y.doc_id"))
        .as[(String, Long, Long)].collect().toSeq
      val naive = keys.flatMap { case (k, n) =>
        for (i <- 0 until n; j <- i + 1 until n) yield (k, i.toLong, j.toLong)
      }
      grid.size == grid.distinct.size && grid.sorted == naive.sorted
    }
    val res = check(Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("per-cell pair output is bounded ~cap^2 regardless of key virality") {
    // reconstruct the cell of each pair: B = ceil(f/cap), cell =
    // (h(x) mod B, h(y) mod B) — same arithmetic as the implementation
    val cells = SkewJoin.gridSelfPairs(fixture, "k", "f", "e",
        carry = Seq.empty, cap = cap)
      .filter(col("x.doc_id") < col("y.doc_id"))
      .join(fixture.select("k", "f").distinct(), "k") // f is not in the pair output
      .withColumn("_b",
        greatest(lit(1), ceil(col("f").cast("double") / cap).cast("int")))
      .groupBy(col("k"), pmod(hash(col("x")), col("_b")).as("gi"),
        pmod(hash(col("y")), col("_b")).as("gj"))
      .count()
    val maxCell = cells.agg(max("count")).head().getLong(0)
    // hash slices are ~f/B ≈ cap rows ± variance; 4×cap² is a loose roof
    // that a single unsplit viral key (3000²/2 ≈ 4.5M pairs) exceeds 250×
    assert(maxCell <= 4L * cap * cap,
      s"cell with $maxCell pairs — grid failed to bound the viral key")
    // and the viral key really did split wide: B=ceil(3000/64)=47 slices
    val cCells = cells.filter(col("k") === "c").count()
    assert(cCells > 1000, s"viral key used only $cCells cells")
  }
}
