package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.file.{Files, Paths}

/** graft.Serve — the long-lived service interface (kiara zmq daemon twin:
  * reference src/kiara/zmq/service/__init__.py:116 service_loop,
  * client.py KiaraZmqClient). */
class ServeSpec extends SparkTestBase {

  private def session = new Serve.Session(spark)

  test("ping, service_status, shutdown semantics mirror the zmq loop") {
    val s = session
    assert(s.handle("""{"endpoint":"ping"}""")
      == """{"endpoint":"ping","result":"pong"}""")
    val status = s.handle("""{"endpoint":"service_status"}""")
    assert(status.contains(""""state":"running""""))
    assert(status.contains(""""requests":2""")) // this is the 2nd request
    assert(status.contains(""""spark":"""))
    assert(!s.isStopped)
    assert(s.handle("""{"endpoint":"stop"}""").contains(""""result":"ok""""))
    assert(s.isStopped)
  }

  test("query endpoint runs a registered query and returns a bounded JSON slice") {
    val s = session
    val resp = s.handle(
      s"""{"endpoint":"query","args":["q1_agg","$sfDir","3"]}""")
    assert(resp.startsWith("""{"endpoint":"query","rows":["""))
    assert(resp.contains("l_returnflag") && resp.contains("sum_qty"))
    // bounded: 3 row objects, no more
    assert(resp.split("l_returnflag", -1).length - 1 == 3)
    // an unknown query is an error OBJECT, not a dead service
    val bad = s.handle("""{"endpoint":"query","args":["nope","x"]}""")
    assert(bad.contains(""""error":"""") && bad.contains("unknown query"))
    assert(!s.isStopped)
    assert(s.handle("""{"endpoint":"ping"}""").contains("pong")) // still alive
  }

  test("cli endpoint exposes the registry/value surface over one live session") {
    import spark.implicits._
    val root = graft.sources.Export.tempDir("graft_serve_cli_").toString
    new GraftApi(spark, root).storeValue("corpus",
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), Some("cv"))
    val s = session
    val list = s.handle(s"""{"endpoint":"cli","args":["data","$root","list"]}""")
    assert(list.contains("corpus") && list.contains("aliases: cv"))
    val load = s.handle(s"""{"endpoint":"cli","args":["data","$root","load","cv","1"]}""")
    assert(load.contains("| id") && load.contains(""""stderr":"""""))
    // a CLI usage error comes back on stderr (zmq call_cli's capture contract)
    val err = s.handle("""{"endpoint":"cli","args":["no-such-verb"]}""")
    assert(err.contains(""""stdout":""""") && err.contains("usage"))
  }

  test("stream loop serves many requests and ends cleanly on shutdown") {
    val in = new ByteArrayInputStream(
      Seq("""{"endpoint":"ping"}""",
        """{"endpoint":"nope"}""",
        """{"endpoint":"shutdown"}""",
        """{"endpoint":"ping"}""" // after shutdown: must NOT be served
      ).mkString("\n").getBytes("UTF-8"))
    val out = new ByteArrayOutputStream()
    val served = Serve.loop(spark, in, out)
    val lines = out.toString("UTF-8").trim.split("\n").toSeq
    assert(served == 3) // ping, unknown, shutdown — not the trailing ping
    assert(lines.size == 3)
    assert(lines(0).contains("pong"))
    assert(lines(1).contains("unknown endpoint"))
    assert(lines(2).contains(""""result":"ok""""))
  }

  test("tcp transport: two requests over one live service, info file lifecycle") {
    val infoFile = graft.sources.Export.tempDir("graft_serve_tcp_").toString + "/svc.json"
    @volatile var port = 0
    val latch = new java.util.concurrent.CountDownLatch(1)
    val server = new Thread(() =>
      Serve.serveTcp(spark, 0, Some(infoFile), p => { port = p; latch.countDown() }))
    server.setDaemon(true)
    server.start()
    assert(latch.await(30, java.util.concurrent.TimeUnit.SECONDS))
    // service registered: pid/host/port discoverable (kiara zmq lock file)
    val info = new String(Files.readAllBytes(Paths.get(infoFile)), "UTF-8")
    assert(info.contains(s""""port":$port""") && info.contains(""""process_id":"""))
    // two requests over the live service (separate connections, REP-style)
    assert(Serve.request("127.0.0.1", port, """{"endpoint":"ping"}""").contains("pong"))
    val st = Serve.request("127.0.0.1", port, """{"endpoint":"service_status"}""")
    assert(st.contains(""""requests":2"""))
    // clean shutdown: loop exits, info file deleted
    assert(Serve.request("127.0.0.1", port, """{"endpoint":"shutdown"}""").contains("ok"))
    server.join(30000)
    assert(!server.isAlive)
    assert(!Files.exists(Paths.get(infoFile)))
  }

  test("bare JSON scalars in args are parsed, not silently dropped") {
    val s = session
    // unquoted row limit: {"args":["q1_agg","<dir>",2]} must bound to 2
    // rows, not fall back to the default 20
    val resp = s.handle(
      s"""{"endpoint":"query","args":["q1_agg","$sfDir",2]}""")
    assert(resp.startsWith("""{"endpoint":"query","rows":["""))
    assert(resp.split("l_returnflag", -1).length - 1 == 2)
    // booleans/null arrive as their literal token text
    val cli = s.handle("""{"endpoint":"cli","args":[true]}""")
    assert(cli.contains("usage")) // reached Cli.run with arg "true"
  }

  test("tcp transport: one misbehaving connection does not kill the service") {
    @volatile var port = 0
    val latch = new java.util.concurrent.CountDownLatch(1)
    val server = new Thread(() =>
      Serve.serveTcp(spark, 0, None, p => { port = p; latch.countDown() }))
    server.setDaemon(true)
    server.start()
    assert(latch.await(30, java.util.concurrent.TimeUnit.SECONDS))
    // client 1 connects, starts a request line, then resets the
    // connection without finishing — the accept loop must contain the
    // IOException and keep serving
    val bad = new java.net.Socket("127.0.0.1", port)
    bad.setSoLinger(true, 0) // RST on close, not FIN: a genuine abort
    bad.getOutputStream.write("""{"endpoint":"ping"""".getBytes("UTF-8"))
    bad.getOutputStream.flush()
    bad.close()
    // client 2 on a fresh connection is served normally
    assert(Serve.request("127.0.0.1", port, """{"endpoint":"ping"}""").contains("pong"))
    assert(Serve.request("127.0.0.1", port, """{"endpoint":"shutdown"}""").contains("ok"))
    server.join(30000)
    assert(!server.isAlive)
  }

  test("duplicate service registration is refused loudly") {
    val infoFile = graft.sources.Export.tempDir("graft_serve_dup_").toString + "/svc.json"
    Files.write(Paths.get(infoFile), "{}".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      Serve.serveTcp(spark, 0, Some(infoFile))
    }
    assert(e.getMessage.contains("already present"))
    assert(Files.exists(Paths.get(infoFile))) // the existing file is untouched
  }
}
