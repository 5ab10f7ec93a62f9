package graft.connect

import java.util.Optional

import org.apache.spark.connect.proto
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connect.planner.SparkConnectPlanner
import org.apache.spark.sql.connect.plugin.RelationPlugin

import graft.plans.SampleNode

/** Spark Connect server-side decoder for the reference's `LSample`
  * extension relation — the runtime analog of the reference's logical
  * extension codec (`/root/reference/src/codec/extension.rs:39-80`:
  * `try_decode` matches the `LMessage` oneof and rebuilds the plan node;
  * unknown messages fall through to the next codec).
  *
  * Registered via `spark.connect.extensions.relation.classes`; the server
  * probes each configured plugin with the serialized `google.protobuf.Any`
  * from `Relation.extension`. We return `empty` for foreign type_urls
  * (the codec-chaining contract) and a `SampleNode` for ours — the same
  * logical operator the classic `df.sampleExt` path builds, so planning,
  * pushdown barriers, and EXPLAIN rendering are identical for remote and
  * local clients.
  *
  * Validation matches `/root/reference/src/dataframe/sample.rs:28-38`
  * (and `graft.implicits.sampleExt`): fraction in (0, 1], seed ≥ 0; a
  * missing seed draws a random one server-side, mirroring the reference's
  * `optional int64 seed`.
  */
class SampleRelationPlugin extends RelationPlugin {

  override def transform(
      raw: Array[Byte],
      planner: SparkConnectPlanner): Optional[LogicalPlan] =
    SampleProto.decodeAny(raw) match {
      case None => Optional.empty()
      case Some(msg) =>
        val fraction = msg.fraction.toDouble
        if (fraction <= 0.0 || fraction > 1.0) {
          throw new IllegalArgumentException(
            s"sample fraction should be in (0, 1] range, got: $fraction")
        }
        msg.seed.foreach { s =>
          if (s < 0) {
            throw new IllegalArgumentException(
              s"seed should be a positive value, got: $s")
          }
        }
        require(msg.child.nonEmpty, "LSample carries no child relation")
        // the child is a standard spark.connect.Relation — hand it back to
        // the planner, which resolves it exactly as a top-level relation
        val child = planner.transformRelation(proto.Relation.parseFrom(msg.child))
        // graft planning must be installed on the session behind this
        // connect endpoint, or SampleNode will have no physical strategy
        graft.GraftSession.ensureExtensions(planner.sessionHolder.session)
        val seed = msg.seed.getOrElse(
          java.util.concurrent.ThreadLocalRandom.current().nextLong(Long.MaxValue))
        Optional.of(SampleNode(fraction, seed, child))
    }
}
