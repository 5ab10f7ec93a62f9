package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}
import org.apache.spark.sql.execution.QueryExecution

/** Bridge into `private[sql]` constructors of the classic (non-Connect) Spark
  * implementation. The reference builds its DataFrame by wrapping a
  * `LogicalPlan` and reconstructing the frame
  * (`/root/reference/src/dataframe/sample.rs:40-50`); Spark's analog —
  * `Dataset.ofRows` — is package-private, so this one-file shim in the
  * `org.apache.spark.sql` package is the only place we reach past the public
  * API (SNIPPETS.md pattern [3], Apache-2.0 public pattern).
  */
object GraftSqlBridge {
  def classicSession(spark: SparkSession): CSparkSession =
    spark.asInstanceOf[CSparkSession]

  /** Build a DataFrame from a raw logical plan (analog of Dataset.ofRows). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(classicSession(spark), plan)

  /** Fork an isolated child session sharing the SparkContext and cloning
    * the session state (conf, function registry, temp views) — session
    * confs are per-session, so a conf the child sets can never leak into
    * writes running concurrently on the parent. Classic-only
    * (`cloneSession` is `private[sql]`, hence it lives in this shim). */
  def forkSession(spark: SparkSession): SparkSession =
    classicSession(spark).cloneSession()

  /** The analyzed logical plan underlying a DataFrame. */
  def logicalPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[CDataset[Row]].queryExecution.analyzed

  def queryExecution(df: DataFrame): QueryExecution =
    df.asInstanceOf[CDataset[Row]].queryExecution

  /** Idempotently install graft planner strategies on an existing session
    * (for sessions not built via `SparkSession.builder().withExtensions`).
    */
  def ensureStrategy(
      spark: SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = classicSession(spark).experimental
    if (!exp.extraStrategies.contains(strategy)) {
      exp.extraStrategies = exp.extraStrategies :+ strategy
    }
  }

  /** Idempotently add an optimizer rule to an existing session (post-hoc
    * analog of `SparkSessionExtensions.injectOptimizerRule`).
    */
  def ensureOptimizerRule(
      spark: SparkSession,
      rule: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val exp = classicSession(spark).experimental
    if (!exp.extraOptimizations.contains(rule)) {
      exp.extraOptimizations = exp.extraOptimizations :+ rule
    }
  }

  /** Column ⇄ catalyst Expression (classic implementation only). */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expressionOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Idempotently register a SQL function on an existing session (the
    * post-hoc analog of `SparkSessionExtensions.injectFunction`).
    */
  def ensureFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression): Unit = {
    val reg = classicSession(spark).sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier(name)
    if (!reg.functionExists(id)) {
      reg.registerFunction(
        id,
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions", name),
        builder)
    }
  }
}
