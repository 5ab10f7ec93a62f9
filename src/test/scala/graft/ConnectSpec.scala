package graft

import java.util.UUID

import org.apache.spark.connect.proto
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.connect.planner.SparkConnectPlanner
import org.apache.spark.sql.connect.plugin.SparkConnectPluginRegistry
import org.apache.spark.sql.connect.service.SessionHolder
import org.sparkproject.connect.protobuf.{Any => PAny}

import graft.connect.{SampleProto, SampleRelationPlugin}
import graft.implicits._
import graft.plans.SampleNode

/** Spark Connect transport parity with the reference's client→server plan
  * round-trip (`/root/reference/tests/e2e.rs:53-92`: the client ships the
  * extension node through the protobuf codec, the server decodes and
  * executes it, EXPLAIN renders the custom operator).
  *
  * The client payload is built by our hand-rolled wire codec
  * (`SampleProto`); `PAny.parseFrom` cross-checks those bytes against the
  * real protobuf runtime before the server-side planner decodes them via
  * the registered `SampleRelationPlugin`.
  */
class ConnectSpec extends GraftFunSuite {

  private def lineitemRelation: proto.Relation =
    proto.Relation.newBuilder()
      .setRead(proto.Read.newBuilder()
        .setDataSource(proto.Read.DataSource.newBuilder()
          .setFormat("parquet")
          .addPaths(s"$sf0001/lineitem.parquet")))
      .build()

  private def planner: SparkConnectPlanner = {
    val holder = new SessionHolder("graft-test", UUID.randomUUID().toString,
      GraftSqlBridge.classicSession(spark))
    new SparkConnectPlanner(holder, None)
  }

  test("wire codec round-trips LSample (client encode = server decode)") {
    val child = lineitemRelation.toByteArray
    val msg = SampleProto.LSample(0.25f, Some(7L), child)
    val decoded = SampleProto.decodeAny(SampleProto.encodeAny(msg))
    assert(decoded.isDefined)
    assert(decoded.get.fraction == 0.25f)
    assert(decoded.get.seed.contains(7L))
    assert(decoded.get.child.toSeq == child.toSeq)
  }

  test("hand-rolled Any bytes parse under the real protobuf runtime") {
    val bytes = SampleProto.encodeAny(
      SampleProto.LSample(0.5f, Some(33L), lineitemRelation.toByteArray))
    val any = PAny.parseFrom(bytes)
    assert(any.getTypeUrl == SampleProto.TypeUrl)
    assert(any.getValue.size() > 0)
  }

  test("plugin is registered via the static conf") {
    spark.sparkContext // force the context (registry reads SparkEnv conf)
    val names = SparkConnectPluginRegistry.relationRegistry.map(_.getClass.getName)
    assert(names.contains(classOf[SampleRelationPlugin].getName))
  }

  test("extension relation round-trips through the connect planner and " +
       "matches the classic API result (e2e.rs:53-92 analog)") {
    val anyBytes = SampleProto.encodeAny(
      SampleProto.LSample(0.5f, Some(33L), lineitemRelation.toByteArray))
    val rel = proto.Relation.newBuilder()
      .setExtension(PAny.parseFrom(anyBytes))
      .build()

    val plan = planner.transformRelation(rel)
    val sample = plan.collectFirst { case s: SampleNode => s }
    assert(sample.isDefined, s"no SampleNode in:\n$plan")
    assert(sample.get.fraction == 0.5 && sample.get.seed == 33L)

    val viaConnect = GraftSqlBridge.ofRows(spark, plan)
    val direct = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .sampleExt(0.5, Some(33L))
    // same seed + same source partitioning ⇒ bitwise-identical sample
    assert(viaConnect.collect().toSeq == direct.collect().toSeq)

    // EXPLAIN renders the custom operator at both levels (e2e.rs:74-92)
    assert(plan.toString.contains("GraftSample fraction=0.5, seed=33"))
    val physical = GraftSqlBridge.queryExecution(viaConnect)
      .executedPlan.toString
    assert(physical.contains("SampleExec"), s"physical plan:\n$physical")
  }

  test("server-side physical plan under the plugin renders identically to " +
       "the classic path (e2e.rs:72-92 analog)") {
    // the reference's last e2e test compares physical plans by rendered
    // EXPLAIN after serde; classic Spark's only client→server boundary is
    // the Connect relation, so the analog pin is: planning the decoded
    // relation yields the SAME physical plan text as the in-process API
    val anyBytes = SampleProto.encodeAny(
      SampleProto.LSample(0.5f, Some(33L), lineitemRelation.toByteArray))
    val rel = proto.Relation.newBuilder()
      .setExtension(PAny.parseFrom(anyBytes))
      .build()
    val viaConnect = GraftSqlBridge.ofRows(spark, planner.transformRelation(rel))
    val direct = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .sampleExt(0.5, Some(33L))
    def rendered(df: org.apache.spark.sql.DataFrame): String =
      GraftSqlBridge.queryExecution(df).executedPlan.toString
        .replaceAll("#\\d+", "#x") // expression ids are allocation-order
    assert(rendered(viaConnect) == rendered(direct),
      s"plans diverge:\n${rendered(viaConnect)}\n----\n${rendered(direct)}")
    assert(rendered(direct).contains("SampleExec"))
  }

  test("foreign type_url falls through to the next codec (extension.rs:75)") {
    val foreign = {
      val out = new java.io.ByteArrayOutputStream()
      // Any{type_url: "type.googleapis.com/other.Thing", value: 0x00}
      val url = "type.googleapis.com/other.Thing".getBytes("UTF-8")
      out.write(0x0a); out.write(url.length); out.write(url)
      out.write(0x12); out.write(1); out.write(0)
      out.toByteArray
    }
    assert(!new SampleRelationPlugin().transform(foreign, planner).isPresent)
  }

  test("full gRPC ExecutePlan round trip: client ships the extension " +
       "relation, server samples and streams results back") {
    import org.apache.spark.sql.connect.service.SparkConnectService
    SparkConnectService.start(spark.sparkContext)
    val channel = org.sparkproject.connect.grpc.ManagedChannelBuilder
      .forAddress("localhost", spark.sparkContext.getConf
        .getInt("spark.connect.grpc.binding.port", 15002))
      .usePlaintext().build()
    try {
      val stub = proto.SparkConnectServiceGrpc.newBlockingStub(channel)
      val anyBytes = SampleProto.encodeAny(
        SampleProto.LSample(0.5f, Some(33L), lineitemRelation.toByteArray))
      val req = proto.ExecutePlanRequest.newBuilder()
        .setSessionId(UUID.randomUUID().toString)
        .setUserContext(proto.UserContext.newBuilder().setUserId("graft-test"))
        .setPlan(proto.Plan.newBuilder().setRoot(proto.Relation.newBuilder()
          .setExtension(PAny.parseFrom(anyBytes))))
        .build()
      val responses = stub.executePlan(req)
      var rows = 0L
      while (responses.hasNext) {
        val r = responses.next()
        if (r.hasArrowBatch) rows += r.getArrowBatch.getRowCount
      }
      val expected = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .sampleExt(0.5, Some(33L)).count()
      assert(rows == expected,
        s"gRPC result rows $rows != direct API rows $expected")
    } finally {
      channel.shutdownNow()
      SparkConnectService.stop(scala.None, scala.None)
    }
  }

  test("validation parity over the wire (sample.rs:28-38)") {
    def shipped(fraction: Float): Unit = {
      val bytes = SampleProto.encodeAny(
        SampleProto.LSample(fraction, Some(1L), lineitemRelation.toByteArray))
      new SampleRelationPlugin().transform(bytes, planner)
    }
    val e = intercept[IllegalArgumentException](shipped(1.5f))
    assert(e.getMessage.contains("sample fraction should be in (0, 1] range"))
    val e2 = intercept[IllegalArgumentException](shipped(0.0f))
    assert(e2.getMessage.contains("sample fraction"))
  }
}
