package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.NfkdNormalize

/** Catalyst optimizer rule: collapse nested NFKD normalizations.
  *
  * Unicode normalization is IDEMPOTENT by construction (UAX #15 §1.2:
  * `toNFKD(toNFKD(x)) = toNFKD(x)` — normalization forms are, in the
  * standard's words, "stable under repeated application"), so
  * `graft_nfkd(graft_nfkd(c))` is always `graft_nfkd(c)`. The nesting
  * arises naturally when composed `Column => Column` sanitize stages are
  * stacked by callers that each defensively normalize (the reference's
  * scrape path normalizes once per stage too,
  * sec_dl/utils/scrape_all_filings.py:99) — at 100 TB the inner pass is a
  * full extra scan-width of per-character work inside the hottest codegen
  * stage, and no built-in Catalyst rule can know a user function is
  * idempotent. Registered via [[graft.GraftExtensions]]
  * (`injectOptimizerRule`); the idempotence theorem itself is
  * property-tested in CollapseNfkdSpec against the JDK normalizer. */
object CollapseNfkd extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case NfkdNormalize(inner @ NfkdNormalize(_)) => inner
    }
}
