package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.config.DownloadConfig
import graft.operators.Downloader

/** Downloader concurrency semantics: the thread pool must hide
  * per-request latency (the reference's raison d'être — 256 threads
  * per core, README.md:349-357), tag failures, and retry.
  */
class DownloaderSpec extends SparkSpec {

  import spark.implicits._

  test("thread pool hides request latency: 64 slow urls ≪ serial time") {
    // Server sleeps 200 ms per request: serial = 12.8 s; with 32
    // threads the partition should finish in well under 3 s.
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/slow", (x: HttpExchange) => {
      Thread.sleep(200)
      val b = "payload".getBytes
      x.sendResponseHeaders(200, b.length); x.getResponseBody.write(b); x.close()
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(64))
    server.start()
    try {
      val urls = (0 until 64).map(i => s"http://127.0.0.1:${server.getAddress.getPort}/slow/$i")
      val df = urls.toDF("url").coalesce(1)
      val cfg = DownloadConfig(threadCount = 32)
      val t0 = System.nanoTime()
      val out = Downloader.download(df, cfg).collect()
      val secs = (System.nanoTime() - t0) / 1e9
      assert(out.length == 64)
      assert(out.forall(r => r.getAs[Array[Byte]]("_payload") != null))
      assert(secs < 5.0, s"64×200ms with 32 threads took $secs s — pool not concurrent")
    } finally server.stop(0)
  }

  test("retries recover from transient failures") {
    val fails = new java.util.concurrent.atomic.AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/flaky", (x: HttpExchange) => {
      if (fails.getAndIncrement() % 2 == 0) x.sendResponseHeaders(500, -1)
      else {
        val b = "ok".getBytes
        x.sendResponseHeaders(200, b.length); x.getResponseBody.write(b)
      }
      x.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/flaky"
      val cfg = DownloadConfig(threadCount = 1, retries = 2)
      val out = Downloader.download(Seq(url).toDF("url"), cfg).collect()(0)
      assert(out.getAs[Array[Byte]]("_payload") != null, "retry succeeded")
    } finally server.stop(0)
  }

  test("connection errors tagged, not thrown") {
    val cfg = DownloadConfig(threadCount = 2, timeoutSeconds = 1)
    val out = Downloader.download(
      Seq("http://127.0.0.1:1/nothing", "not a url at all").toDF("url"), cfg).collect()
    assert(out.forall(_.getAs[Array[Byte]]("_payload") == null))
    assert(out.forall(_.getAs[String]("_fetch_error") != null))
  }
}
