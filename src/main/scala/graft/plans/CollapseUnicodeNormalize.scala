package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.UnicodeNormalize

/** Optimizer rule: collapse nested Unicode normalizations.
  *
  * Unicode normalization is idempotent (UAX #15 conformance:
  * `norm_F(norm_F(x)) == norm_F(x)` for every form F), and a canonical
  * pre-normalization never changes a compatibility result
  * (canonically equivalent inputs normalize identically, so
  * `NFKC(NFC(x)) == NFKC(x)` and `NFKD(NFD(x)) == NFKD(x)`). Layered
  * pipelines hit this shape constantly — a cleaning stage normalizes
  * defensively, then a fingerprint/dedup stage normalizes again — and
  * without the rewrite every row pays the inner pass' String
  * round-trip for nothing.
  *
  * Registered two ways, mirroring the SQL functions: builder-time via
  * `graft.GraftExtensions` (`injectOptimizerRule`) and live-session
  * via `Engine.session` (`spark.experimental.extraOptimizations`).
  * This is the library's worked example of the Catalyst extension
  * ladder's rule tier — used where a REWRITE is provably semantics-
  * preserving, as opposed to the custom-Expression tier (new kernels)
  * the dedup/similarity operators use.
  */
object CollapseUnicodeNormalize extends Rule[LogicalPlan] {

  /** Does `outer` applied after `inner` make the inner pass redundant? */
  private def absorbs(outer: String, inner: String): Boolean =
    outer == inner ||
      (outer == "NFKC" && inner == "NFC") ||
      (outer == "NFKD" && inner == "NFD")

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case UnicodeNormalize(UnicodeNormalize(child, inner), outer)
          if absorbs(outer, inner) =>
        UnicodeNormalize(child, outer)
    }
}
