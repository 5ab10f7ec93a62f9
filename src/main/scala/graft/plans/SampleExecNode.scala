package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, SortOrder}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.{CodegenSupport, SparkPlan, UnaryExecNode}

/** Fast, allocation-free xorshift64* PRNG (public-domain algorithm, Marsaglia
  * 2003 / Vigna 2016). Used instead of `java.util.Random` in the per-row hot
  * loop; Spark's own `XORShiftRandom` is `private[spark]`, so we carry our
  * own ~10-line equivalent. Public: whole-stage-generated code instantiates
  * it from the `org.apache.spark.sql.catalyst.expressions.GeneratedClass`
  * namespace.
  */
final class XorShift64Star(seed: Long) {
  // Avalanche the seed first so consecutive seeds (seed+partitionId) don't
  // produce correlated streams — same motivation as Spark's XORShiftRandom
  // hashing its init seed.
  private var state: Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    val s = z ^ (z >>> 31)
    if (s == 0L) 0x9e3779b97f4a7c15L else s
  }

  def nextLong(): Long = {
    var x = state
    x ^= x >>> 12
    x ^= x << 25
    x ^= x >>> 27
    state = x
    x * 0x2545f4914f6cdd1dL
  }

  /** Uniform double in [0, 1): top 53 bits scaled. */
  def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
}

/** Physical Bernoulli sampler — per-partition streaming filter.
  *
  * Spark-native rebuild of the reference's `SampleExec`
  * (`/root/reference/src/physical/sample_exec.rs:19-122`):
  *   - keep a row iff `rng.nextDouble() < fraction`
  *     (`sample_exec.rs:104-106`);
  *   - inherits the child's partitioning and ordering unchanged — sampling
  *     preserves both, so the operator adds NO exchange
  *     (`sample_exec.rs:55-57`);
  *   - pull-based streaming with no materialization. The reference's
  *     async channel pipelining (`sample_exec.rs:87,99`) is unnecessary on
  *     Spark — task pipelining within a stage is the execution model.
  *
  * Seeding: `seed + partitionIndex` per partition (Spark's convention),
  * deliberately diverging from the reference's identical-seed-per-partition
  * (`sample_exec.rs:94-97`) — per-partition seeding gives independent draws
  * across partitions (better statistics at 1000-executor scale) while keeping
  * the property both designs satisfy: same seed + same partitioning ⇒ same
  * output (SURVEY §4.2).
  *
  * Scale: O(1) memory per task, zero shuffle, narrow dependency; the sampled
  * stream feeds straight into downstream pipelined operators.
  */
case class SampleExecNode(fraction: Double, seed: Long, child: SparkPlan)
    extends UnaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override def simpleString(maxFields: Int): String =
    s"GraftSampleExec fraction=$fraction, seed=$seed"

  // ---- whole-stage codegen: the sampler fuses into the surrounding
  // pipeline (scan → sample → agg stays one generated loop) instead of
  // forcing an iterator boundary at the custom operator.
  override def inputRDDs(): Seq[RDD[InternalRow]] =
    child.asInstanceOf[CodegenSupport].inputRDDs()

  override protected def doProduce(ctx: CodegenContext): String =
    child.asInstanceOf[CodegenSupport].produce(ctx, this)

  override def doConsume(ctx: CodegenContext, input: Seq[ExprCode],
                         row: ExprCode): String = {
    val rng = ctx.addMutableState(classOf[XorShift64Star].getName, "graftRng")
    ctx.addPartitionInitializationStatement(
      s"$rng = new ${classOf[XorShift64Star].getName}(" +
        s"${seed}L + partitionIndex);")
    val numOutput = metricTerm(ctx, "numOutputRows")
    s"""
       |if ($rng.nextDouble() < $fraction) {
       |  $numOutput.add(1);
       |  ${consume(ctx, input)}
       |}
     """.stripMargin
  }

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val f = fraction
    val s = seed
    val numOutput = longMetric("numOutputRows")
    child.execute().mapPartitionsWithIndex(
      { (idx, iter) =>
        val rng = new XorShift64Star(s + idx)
        // Pass-through filter: rows are not buffered, no copies needed.
        iter.filter { _ =>
          val keep = rng.nextDouble() < f
          if (keep) numOutput += 1
          keep
        }
      },
      preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SampleExecNode =
    copy(child = newChild)
}
