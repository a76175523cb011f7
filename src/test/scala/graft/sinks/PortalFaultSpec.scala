package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SparkTestSession

/** REST fault injection over REAL sockets: the localhost sharing-REST
  * fixture misbehaves mid-flight — a broken response stream during the
  * DSv2 commit's data upload, and a token that expires between job
  * polls — and the client/commit paths must fail atomically (slot
  * pointer never flips) or recover (silent re-login), respectively.
  * These are the failure modes a long-lived 100-TB publish loop
  * actually meets; the happy paths live in [[PortalTransportSpec]]. */
class PortalFaultSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def mkServer() = new FakeAgolServer(
    new Portal(java.nio.file.Files.createTempDirectory("pt_fault").toString),
    "gcoos", "fixture-pass")

  test("mid-commit socket drop: DSv2 commit fails loudly, slot pointer and old payload survive") {
    import spark.implicits._
    val server = mkServer()
    val root = java.nio.file.Files.createTempDirectory("pt_fault_stage").toString
    def write(df: org.apache.spark.sql.DataFrame): Unit =
      df.repartition(1).write.format("portal")
        .option("root", root).option("item", "Fault item")
        .option("portalUrl", server.base)
        .option("username", "gcoos").option("password", "fixture-pass")
        .mode("append").save()

    // publish v1 cleanly
    write(Seq((1, "v1a"), (2, "v1b")).toDF("id", "v"))
    val item = server.portal.findByTitle("Fault item").get
    def props = server.portal.itemById(item.id).serviceProps
    val slot1 = props("activeSlot")
    val fp1 = props("fingerprint")
    val payload1 = server.dataStore(item.id)
    assert(payload1.contains("v1a"))

    // v2 upload dies on a truncated response stream (no error body —
    // the connection breaks). The commit must propagate the failure…
    server.dropNextDataUpdate = true
    val e = intercept[Exception] {
      write(Seq((1, "v2a"), (2, "v2b")).toDF("id", "v"))
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.isInstanceOf[java.io.IOException]),
      s"expected an IOException in the failure chain, got: ${chain(e).map(_.getClass.getName)}")

    // …and NOTHING portal-side moved: same slot, same fingerprint,
    // same payload — the A/B pointer is the transaction
    assert(props("activeSlot") == slot1)
    assert(props("fingerprint") == fp1)
    assert(server.dataStore(item.id) == payload1)

    // the read path still serves v1
    val back = spark.read.format("portal")
      .option("root", root).option("item", "Fault item")
      .option("portalUrl", server.base)
      .option("username", "gcoos").option("password", "fixture-pass")
      .load()
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq ==
      Seq("v1a", "v1b"))

    // the faulted flag is one-shot: the NEXT publish succeeds and flips
    server.dropNextDataUpdate = false
    write(Seq((1, "v3a")).toDF("id", "v"))
    assert(props("activeSlot") != slot1 && server.dataStore(item.id).contains("v3a"))
    server.stop()
  }

  test("token expiry during job poll: client re-logs-in silently and the publish completes") {
    val server = mkServer()
    val c = new PortalRestClient(server.base, "gcoos", "fixture-pass")
    val srcId = c.addItem("Async pub", "CSV", Seq("tfault"))
    // async job: 2 'processing' polls before 'completed'; the server
    // invalidates the session token right after poll 1, so poll 2's
    // first attempt gets the 499 error body and must re-login
    server.jobPollsUntilDone = 2
    server.rotateTokenAfterPolls = 1
    val tok0 = server.currentToken
    val svcId = c.publish(srcId)
    assert(svcId.nonEmpty && svcId != srcId)
    assert(server.currentToken != tok0, "rotation fired")
    // the job genuinely went through processing → completed (3 counted
    // polls; the 499-refused attempt is not counted)
    assert(server.jobPolls(s"job-$svcId") == 3)
    // and the published service exists portal-side, related to source
    assert(server.portal.allItems.exists(_.id == svcId))
    server.stop()
  }

  test("token expiry mid-poll on a FAILING job still surfaces the job failure, not an auth error") {
    val server = mkServer()
    val c = new PortalRestClient(server.base, "gcoos", "fixture-pass")
    val srcId = c.addItem("Async fail", "CSV", Seq("tfault2"))
    server.jobPollsUntilDone = 2
    server.failJobs = true
    server.rotateTokenAfterPolls = 1
    val e = intercept[java.io.IOException](c.publish(srcId))
    assert(e.getMessage.contains("job failed"),
      s"expected the job-failed tier, got: ${e.getMessage}")
    server.stop()
  }
}
