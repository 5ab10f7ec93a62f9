package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer extension: push deterministic filters through `SampleNode`.
  *
  * The reference's node is an explicit pushdown barrier (`expressions() =
  * []`, `/root/reference/src/logical/sample_extension.rs:51-53`) because
  * DataFusion's optimizer cannot see through unknown extension nodes. Spark
  * treats its own `Sample` as filter-transparent
  * (`PushPredicateThroughNonJoin`), and the same holds here: a Bernoulli
  * coin per row is independent of row content, so filter∘sample and
  * sample∘filter have identical distributions (not identical row sets for a
  * fixed seed — the coin-flip sequence shifts — but each plan is itself
  * deterministic under its seed).
  *
  * The win at scale: a predicate written after `.sampleExt(...)` still
  * reaches the parquet scan (PushedFilters), instead of materializing the
  * sampled superset first.
  */
object PushFilterThroughSample extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Filter(cond, SampleNode(fraction, seed, child)) if cond.deterministic =>
      SampleNode(fraction, seed, Filter(cond, child))
  }
}
