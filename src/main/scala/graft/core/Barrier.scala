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
  * every `bounded` site at once — it exists for the A/B tool and must not
  * be set in production paths.
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
}
