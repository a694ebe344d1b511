package graft.core

import org.apache.spark.sql.DataFrame

/** The repo's bounded-frame barrier, as a single switchable definition
  * (r12 VERDICT task 3 — the barrier-tax A/B).
  *
  * A "barrier" materializes a small derived frame so the several plan
  * branches that consume it re-READ instead of re-COMPUTE (Catalyst never
  * shares subplans across branches — the ScanAudit recompute class). Two
  * mechanisms exist, with different taxes:
  *
  *   - `localCheckpoint(true)`: truncates lineage behind a LogicalRDD.
  *     Costs an EAGER Spark job at DataFrame-CONSTRUCTION time (plan-only
  *     consumers like ScanAudit/explain pay it too) and hides the subtree
  *     from plan assertions; recovery-safe at any consumer count.
  *   - `persist()`: lazy — no job until an action, the analyzed plan keeps
  *     the subtree visible (plan specs can still assert on it), and AQE
  *     caveats aside the first action materializes the cache for every
  *     later consumer. Eviction recomputes (lineage intact).
  *
  * The r13 A/B (tools/BarrierAB, PLANS §Round-13) measures both against
  * no-barrier per lane; call sites encode the measured winner. The system
  * property `graft.barrier.mode` (checkpoint | persist | none) OVERRIDES
  * every `bounded` site at once — it exists for the A/B tool; the
  * production mains (Verify/Bench) call [[assertNoOverride]] at startup so
  * a leaked override dies loudly instead of shaping an artifact (r13
  * VERDICT task 7 — the old "must not be set" was prose, this is a gate).
  */
object Barrier {

  /** Barrier a bounded derived frame; default mechanism `default`
    * (the call site's measured winner), overridable via
    * -Dgraft.barrier.mode for A/B measurement. */
  def bounded(df: DataFrame, default: String = "checkpoint"): DataFrame =
    sys.props.getOrElse("graft.barrier.mode", default) match {
      case "persist"    => df.persist()
      case "none"       => df
      case "checkpoint" => df.localCheckpoint(true)
      case other => throw new IllegalArgumentException(
        s"graft.barrier.mode=$other — expected checkpoint | persist | none")
    }

  /** Production-leakage gate (r13 VERDICT task 7): the A/B overrides are
    * GLOBAL properties, so a stray `-Dgraft.barrier.mode=none` (or a leaked
    * hot-key gate threshold, r15) would silently reshape every routed lane
    * in a Verify/Bench run — correctness and bench artifacts from a mutant
    * engine, indistinguishable from real ones. The production mains call
    * this at startup and die loudly instead; the A/B tools and the gate
    * specs never call it. */
  def assertNoOverride(main: String): Unit =
    Seq("graft.barrier.mode", "graft.hotkey.gate.bytes").foreach { p =>
      sys.props.get(p).foreach { m =>
        throw new IllegalStateException(
          s"$p=$m is set while running $main — the A/B override properties " +
            "must never shape a production artifact (they exist solely for " +
            "the A/B tools and specs). Unset the property and re-run.")
      }
    }
}
