package graft.core

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** HITS hubs & authorities in FIXED-POINT integer arithmetic with per-
  * iteration L1 normalization — the directed counterpart of
  * [[PageRank]], holding the same determinism contract: every step is
  * integer `*`/`+`/`DIV` (floor), so scores are bit-identical at any
  * parallelism and a DuckDB oracle replays them exactly.
  *
  * Semantics per iteration over directed weighted edges (c → s, w > 0):
  *   arₛ  = Σ_{(c,s,w)} w · hub(c)          aₛ  = (arₛ · h0) DIV Σar
  *   hr_c = Σ_{(c,s,w)} w · auth(s)         h_c = (hr_c · h0) DIV Σhr
  * starting from hub ≡ h0. The L1 normalization keeps every score in
  * [0, h0] (arₛ ≤ Σar by positivity), so power-iteration blow-up cannot
  * occur; the per-node floor leaks ≤ 1 unit — ~1/h0 relative.
  *
  * Two execution strategies behind one semantic, size-gated like
  * [[PageRank]] (the per-superstep scheduling cost swamps small graphs):
  *
  *  - **fused** (edge count ≤ gateEdges AND h0·Σw < 2⁶³): one task, all
  *    iterations over primitive arrays. The envelope guarantees every
  *    Long accumulation is exact for EVERY iteration — after
  *    normalization Σ hub = Σ auth ≤ h0, so arₛ ≤ h0·inwₛ ≤ h0·Σw, and
  *    the iteration-1 uniform start obeys the same bound; only the
  *    (n-sized) normalize step needs width beyond 64 bits and runs in
  *    BigInteger. Graphs failing the weight envelope simply take the
  *    distributed path — one semantic, never a silent overflow.
  *  - **supersteps** (the 100 TB path): per half-iteration ONE
  *    shuffle-join of the score frame onto the edge partitioning + one
  *    map-side-combining sum + a single-row total broadcast back; raw
  *    products in DECIMAL(38,0) (no envelope needed). Lineage truncated
  *    per score frame with localCheckpoint — each raw frame is referenced
  *    twice (scores + its total), so an un-truncated ANALYZED tree grows
  *    ~4^iters and OOMs the driver before the first job (measured at 4
  *    iterations, sf0.1).
  */
object Hits {

  /** edges: (c: long, s: long, w: long) directed c→s. Returns
    * (node: string "C…"/"S…", score: long) — hubs and authorities after
    * `iters` rounds. Non-positive-weight edges are dropped up front (the
    * PageRank w<=0 lesson: both strategies must see one edge set). */
  def run(edges: DataFrame, iters: Int, h0: Long,
          gateEdges: Long = 4000000L): DataFrame = {
    require(iters >= 1 && h0 > 0)
    val e = edges.select(col("c").cast("long").as("c"),
        col("s").cast("long").as("s"), col("w").cast("long").as("w"))
      .filter(col("w") > 0)
      .persist()
    try {
      val stats = e.agg(count(lit(1)).as("n"), sum(col("w")).as("tw")).head()
      val nEdges = stats.getLong(0)
      val totalW = if (stats.isNullAt(1)) 0L else stats.getLong(1)
      val fits = totalW <= Long.MaxValue / math.max(h0, 1L)
      if (nEdges <= gateEdges && fits) fused(e, iters, h0)
      else supersteps(e, iters, h0)
    } finally e.unpersist()
  }

  /** All iterations in one task over primitive arrays (≤ gate). */
  private def fused(e: DataFrame, iters: Int, h0: Long): DataFrame = {
    val spark = e.sparkSession
    val out = e.as[(Long, Long, Long)](
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong))
      .coalesce(1)
      .mapPartitions { it =>
        val es = it.toArray
        val cIds = new java.util.HashMap[java.lang.Long, Integer]()
        val sIds = new java.util.HashMap[java.lang.Long, Integer]()
        val cKeys = scala.collection.mutable.ArrayBuffer[Long]()
        val sKeys = scala.collection.mutable.ArrayBuffer[Long]()
        def idOf(k: Long, m: java.util.HashMap[java.lang.Long, Integer],
                 ks: scala.collection.mutable.ArrayBuffer[Long]): Int = {
          val got = m.get(k)
          if (got ne null) got.intValue()
          else { m.put(k, Integer.valueOf(ks.size)); ks += k; ks.size - 1 }
        }
        val cI = new Array[Int](es.length)
        val sI = new Array[Int](es.length)
        val w = new Array[Long](es.length)
        var i = 0
        while (i < es.length) {
          cI(i) = idOf(es(i)._1, cIds, cKeys)
          sI(i) = idOf(es(i)._2, sIds, sKeys)
          w(i) = es(i)._3; i += 1
        }
        val nc = cKeys.size
        val ns = sKeys.size
        val H0 = java.math.BigInteger.valueOf(h0)
        // raw·h0 exceeds 2⁶³ (raw ≤ h0·Σw by the run() envelope, so
        // raw·h0 ≤ h0²·Σw); the n-sized normalize runs in BigInteger —
        // floor division matches DECIMAL div / HUGEINT // on positives
        def normalize(raw: Array[Long]): Array[Long] = {
          var tot = 0L // Σraw ≤ h0·Σw < 2⁶³ by the envelope
          var j = 0
          while (j < raw.length) { tot += raw(j); j += 1 }
          val T = java.math.BigInteger.valueOf(tot)
          val outA = new Array[Long](raw.length)
          j = 0
          while (j < raw.length) {
            outA(j) =
              if (tot == 0L) 0L
              else java.math.BigInteger.valueOf(raw(j))
                .multiply(H0).divide(T).longValueExact()
            j += 1
          }
          outA
        }
        var hub = Array.fill(nc)(h0)
        var auth: Array[Long] = new Array[Long](ns)
        var round = 0
        while (round < iters) {
          val ar = new Array[Long](ns)
          i = 0
          while (i < es.length) { ar(sI(i)) += w(i) * hub(cI(i)); i += 1 }
          auth = normalize(ar)
          val hr = new Array[Long](nc)
          i = 0
          while (i < es.length) { hr(cI(i)) += w(i) * auth(sI(i)); i += 1 }
          hub = normalize(hr)
          round += 1
        }
        cKeys.indices.iterator.map(j => ("C" + cKeys(j), hub(j))) ++
          sKeys.indices.iterator.map(j => ("S" + sKeys(j), auth(j)))
      }(Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .toDF("node", "score")
    out.localCheckpoint(true)
  }

  /** The distributed loop (the >gate / unbounded-weight path). */
  private def supersteps(e: DataFrame, iters: Int, h0: Long): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    def d(c: org.apache.spark.sql.Column) = c.cast(D)
    var hub = e.select(col("c")).distinct()
      .withColumn("h", lit(h0))
      .localCheckpoint()
    var auth: DataFrame = null
    for (i <- 1 to iters) {
      val araw = e.join(hub, Seq("c"))
        .groupBy(col("s")).agg(sum(d(col("w")) * d(col("h"))).as("ar"))
        .localCheckpoint()
      val atot = araw.agg(sum(col("ar")).as("at"))
      auth = araw.crossJoin(broadcast(atot))
        .select(col("s"), expr(s"CAST(CASE WHEN at = 0 THEN 0 ELSE (ar * $h0) div at END AS BIGINT)").as("a"))
        .localCheckpoint()
      val hraw = e.join(auth, Seq("s"))
        .groupBy(col("c")).agg(sum(d(col("w")) * d(col("a"))).as("hr"))
        .localCheckpoint()
      val htot = hraw.agg(sum(col("hr")).as("ht"))
      hub = hraw.crossJoin(broadcast(htot))
        .select(col("c"), expr(s"CAST(CASE WHEN ht = 0 THEN 0 ELSE (hr * $h0) div ht END AS BIGINT)").as("h"))
        .localCheckpoint(i == iters)
    }
    hub.select(concat(lit("C"), col("c").cast("string")).as("node"),
        col("h").as("score"))
      .unionAll(auth.select(concat(lit("S"), col("s").cast("string")).as("node"),
        col("a").as("score")))
  }
}
