package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side-pull conformance gate (r13, the ScanAuditSpec discipline
  * applied to the OTHER standing plan-hygiene claim): the repo asserts "no
  * .collect() in any hot path — every main-source site is bounded by
  * design" and "zero scalar udf( ) calls in main", and the round-12 review
  * verified both BY HAND. Nothing stopped a new lane from quietly adding an
  * unbounded driver pull or a non-codegen UDF, so this spec pins the claim:
  * the per-file .collect() census of src/main (dev tools excluded — they
  * are diagnostics, not query paths) must not GROW beyond the adjudicated
  * floor below, and udf( must stay absent entirely.
  *
  * The floor, each site bounded by construction:
  *   - queries/Similarity.scala ×6 — IVF/kmeans centroid pulls, ≤ 4096
  *     rows by the K ≈ √n cap (broadcast back as literals).
  *   - core/KMeans.scala ×4 — the same capped centroid frames inside the
  *     training loop.
  *   - plans/GraftSqlParser.scala ×2 — maintenance COMMANDS (dataset hash /
  *     dq gate verdicts), ≤ 256-row command output by contract.
  *   - queries/TextOps.scala ×1 — the BPE merge table, vocabulary-bounded
  *     (Heaps-law frame, rounds × top-1 rows).
  *
  * Shrinking is fine (update the floor); growth fails the build and the
  * new site must either lose the pull or be adjudicated here with a
  * boundedness argument, like the ScanAuditSpec allowlist.
  */
class CollectAuditSpec extends AnyFunSuite {

  private val root = java.nio.file.Paths.get("src/main/scala")

  private val floor: Map[String, Int] = Map(
    "queries/Similarity.scala" -> 6,
    "core/KMeans.scala" -> 4,
    "plans/GraftSqlParser.scala" -> 2,
    "queries/TextOps.scala" -> 1
  )

  private def mainSources(): Seq[java.nio.file.Path] = {
    val s = java.nio.file.Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(p => p.toString.endsWith(".scala"))
        .filterNot(p => p.toString.contains("/tools/")) // dev diagnostics
        .toSeq
    } finally s.close()
  }

  private def read(p: java.nio.file.Path): String =
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")

  test("the .collect() census never grows beyond the adjudicated floor") {
    val census = mainSources().map { p =>
      val rel = root.relativize(p).toString.stripPrefix("graft/")
      rel -> "\\.collect\\(\\)".r.findAllIn(read(p)).size
    }.filter(_._2 > 0).toMap
    val offenders = census.filter { case (f, n) => n > floor.getOrElse(f, 0) }
    assert(offenders.isEmpty,
      "new driver-side .collect() pull(s) outside the adjudicated floor — " +
        "either make the operator distributed or adjudicate the site here " +
        s"with a boundedness argument: ${offenders.map { case (f, n) =>
          s"$f($n, floor ${floor.getOrElse(f, 0)})" }.mkString("; ")}")
    // keep the floor honest downward too: a stale entry hides one new pull
    val shrunk = floor.filter { case (f, n) => census.getOrElse(f, 0) < n }
    shrunk.foreach { case (f, n) =>
      info(s"floor for $f is stale ($n declared, ${census.getOrElse(f, 0)} " +
        "found) — tighten it so the slack can't absorb a new site")
    }
  }

  // mapPartitions floor — the "only where an Expression cannot" claim:
  // JVM codec batches (Multimodal: imageio/sampled decode, the 64-row
  // inference-shaped slot), graph superstep cores (CC/PageRank/HITS
  // per-partition loops), and the bounded-heap physical operator.
  private val mapPartitionsFloor: Map[String, Int] = Map(
    "queries/Multimodal.scala" -> 15,
    "core/ConnectedComponents.scala" -> 3,
    "core/PageRank.scala" -> 2,
    "plans/TopKPerKey.scala" -> 1,
    "core/Hits.scala" -> 1
  )

  test("the mapPartitions census never grows beyond the adjudicated floor") {
    val census = mainSources().map { p =>
      val rel = root.relativize(p).toString.stripPrefix("graft/")
      rel -> "mapPartitions".r.findAllIn(read(p)).size
    }.filter(_._2 > 0).toMap
    val offenders = census.filter { case (f, n) =>
      n > mapPartitionsFloor.getOrElse(f, 0) }
    assert(offenders.isEmpty,
      "new mapPartitions site(s) — prefer a codegen Expression / built-in " +
        "functions; adjudicate genuinely imperative per-partition logic " +
        s"here: ${offenders.map { case (f, n) =>
          s"$f($n, floor ${mapPartitionsFloor.getOrElse(f, 0)})" }.mkString("; ")}")
  }

  test("no scalar udf() registration exists anywhere in main") {
    // the custom-function surface is codegen'd Catalyst Expressions +
    // typed imperative aggregates; a scalar udf() is never the right tool
    val hits = mainSources().flatMap { p =>
      val rel = root.relativize(p).toString
      "(?m)(?<![a-zA-Z_])udf\\s*\\(".r.findAllIn(read(p)).map(_ => rel)
    }
    assert(hits.isEmpty, s"scalar udf() call found in: ${hits.distinct.mkString(", ")}")
  }
}
