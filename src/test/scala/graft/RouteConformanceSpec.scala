package graft

/** Machinery-conformance gate (r11 VERDICT task 1 — the q32_phash_dup drift
  * class): many pair lanes DOCUMENT that they route through the shared
  * hot-bucket/banding machinery (`Similarity.splitHotBuckets`,
  * `SkewJoin.gridSelfPairs`, `Similarity.bandKeysOf`, the compiled
  * `pair_expand`/`pair_expand_ids` expansion), and round 11's worst defect
  * was a lane whose comment claimed that routing while the code ran a plain
  * self-join — nothing asserted the claim mechanically, so the drift
  * shipped silently and surfaced only as a 27-minute straggler task at the
  * 128× rehearsal.
  *
  * This spec turns each claim into a plan assertion. Every shared path
  * leaves unforgeable markers in the ANALYZED logical plan of any lane that
  * actually routes through it:
  *
  *   - `splitHotBuckets` → its capped aggregation `collect_capped(` AND the
  *     grid attributes `_gi#`/`_gj#` from the `gridSelfPairs` hot branch
  *     (statically present even when the hot side is empty at runtime —
  *     AQE's empty-relation propagation happens at execution, not analysis);
  *   - compiled pair expansion → `pair_expand` (covers both the pruning
  *     `pair_expand` and the id-only `pair_expand_ids` forms);
  *   - `bandKeysOf` → the `minhash12(` signature expression (the banding
  *     arithmetic's single definition computes the signature through it).
  *
  * A lane that silently reverts to a hand-rolled join loses the marker and
  * fails here — the r11 pre-fix q32_phash_dup (plain band self-join) would
  * have failed all three grid markers. The negative control below keeps the
  * markers meaningful: a lane with no routing claim must carry none of
  * them, so the assertions cannot become vacuously true.
  *
  * Maintenance contract: any NEW lane whose commentary claims "same
  * machinery as …" / "routes through splitHotBuckets" must be added to
  * `claims` — the claim is not considered documented until it is asserted
  * here.
  */
class RouteConformanceSpec extends SparkSpec {

  private val HotBucketAgg = "collect_capped(" // splitHotBuckets' capped collect
  private val GridI = "_gi#" // gridSelfPairs 2-D cell coordinates
  private val GridJ = "_gj#"
  private val PairExpand = "pair_expand" // compiled i<j expansion (both variants)
  private val Banding = "minhash12(" // bandKeysOf's signature arithmetic

  private val hotBucketRoute = Seq(HotBucketAgg, GridI, GridJ)

  /** lane → the markers its design commentary claims. */
  private val claims: Seq[(String, Seq[String])] = Seq(
    // postings hot/cold split + grid salting + pruning pair expansion
    "q24_jaccard_pairs" -> (hotBucketRoute :+ PairExpand),
    // banded candidates; viral band buckets through the grid
    "q24_lsh_pairs" -> (hotBucketRoute :+ PairExpand :+ Banding),
    "q24_lsh_est" -> (hotBucketRoute :+ PairExpand :+ Banding),
    "q24_simhash_pairs" -> (hotBucketRoute :+ PairExpand),
    // banding arithmetic single-definition consumers
    "q24_minhash_sig" -> Seq(Banding),
    "q24_jaccard_sample" -> Seq(Banding),
    "q29_neardup_batch" -> Seq(Banding),
    "q33_decontam_fuzzy" -> Seq(Banding),
    // containment: banded audit (q92) and full-recall prefix filter whose
    // same-set expansion routes through the shared machinery (r12)
    "q92_containment" -> (hotBucketRoute :+ PairExpand :+ Banding),
    "q93_containment_full" -> (hotBucketRoute :+ PairExpand),
    "q26_span_dup" -> (hotBucketRoute :+ PairExpand),
    // incremental probe: bandKeysOf on the delta + hot/cold split
    "q26_incr_neardup" -> (hotBucketRoute :+ PairExpand :+ Banding),
    // the r11 drift lane itself: image band join through the same path
    "q32_phash_dup" -> (hotBucketRoute :+ PairExpand),
    // r13 VERDICT task 1: the basket-graph edge derivation routes viral
    // baskets through Entity.basketPairs → splitHotBuckets (collect_capped
    // + grid). q83 is the one basket lane whose FINAL plan keeps the edge
    // subtree visible (the other six checkpoint their edge/pair frames,
    // which truncates lineage behind a LogicalRDD — their routing is
    // asserted by BasketRouteSpec's source census + helper-plan markers
    // instead, since a checkpoint hides any upstream marker from here).
    "q83_degree_dist" -> (hotBucketRoute :+ PairExpand)
  )

  private def analyzedPlan(lane: String): String = {
    val df = SparkEntry.queries(lane)(spark, sf001)
    val plan = df.queryExecution.analyzed.toString
    // builders persist() shared frames for intra-query reuse; drop them so
    // one lane's cache never masks another's plan shape
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    plan
  }

  test("every claimed-router lane's analyzed plan carries its shared-path markers") {
    val misses = claims.flatMap { case (lane, markers) =>
      val plan = analyzedPlan(lane)
      markers.filterNot(plan.contains).map(m => s"$lane lacks '$m'")
    }
    assert(misses.isEmpty,
      "comment/code drift — lanes claiming shared machinery whose plan " +
        s"lacks the marker: ${misses.mkString("; ")}")
  }

  test("q34_funnel stays bounded: no per-key array collection in its plan") {
    // r12 VERDICT task 2: the funnel's stage chain must be associative
    // conditional-MIN aggregation (constant per-key state), never a
    // collect_list buffer one bot-grade user can OOM. The stage frames are
    // persist()ed (not checkpointed) precisely so the ANALYZED plan keeps
    // every subtree visible to this assertion.
    val plan = analyzedPlan("q34_funnel")
    assert(!plan.contains("collect_list"),
      "q34_funnel reintroduced an unbounded per-key collect_list buffer")
    assert(!plan.contains("collect_set"),
      "q34_funnel reintroduced an unbounded per-key collect_set buffer")
  }

  test("negative control: a no-claim lane carries none of the markers") {
    // q06_dedup_exact is a plain hash-group dedup — if the markers ever
    // appear in ITS plan, they have stopped identifying the shared paths
    // and every positive assertion above is vacuous.
    val plan = analyzedPlan("q06_dedup_exact")
    (hotBucketRoute :+ PairExpand :+ Banding).foreach { m =>
      assert(!plan.contains(m), s"marker '$m' leaked into a no-claim lane")
    }
  }
}
