package graft.plans

import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}

/** Custom logical operator: Bernoulli row sampling.
  *
  * Spark-native rebuild of the reference's `Sample` extension node
  * (`/root/reference/src/logical/sample_extension.rs:12-77`):
  *   - schema-transparent — emits the child's output verbatim
  *     (`sample_extension.rs:47-49`);
  *   - expression-free — an opaque barrier to predicate pushdown, matching
  *     `expressions() = []` (`sample_extension.rs:51-53`);
  *   - participates in tree rewrites via `withNewChildInternal`, the Catalyst
  *     analog of `with_exprs_and_inputs` (`sample_extension.rs:63-76`);
  *   - renders in EXPLAIN like `fmt_for_explain`
  *     (`sample_extension.rs:55-61`).
  *
  * Unlike the reference we always carry a concrete seed (callers draw a
  * random one when the user passes None) so the plan itself stays
  * deterministic once constructed.
  */
case class SampleNode(fraction: Double, seed: Long, child: LogicalPlan)
    extends UnaryNode {

  override def output: Seq[Attribute] = child.output

  // Bernoulli sampling can only shrink the row count.
  override def maxRows: Option[Long] = child.maxRows

  override def simpleString(maxFields: Int): String =
    s"GraftSample fraction=$fraction, seed=$seed"

  override protected def withNewChildInternal(newChild: LogicalPlan): SampleNode =
    copy(child = newChild)
}
