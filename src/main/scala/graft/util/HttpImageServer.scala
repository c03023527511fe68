package graft.util

import java.awt.image.BufferedImage
import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.operators.Resizer

/** Embedded test HTTP server mirroring the reference's harness
  * (`tests/http_server.py:7-26` + `tests/conftest.py:32-57`): the
  * seven `{width}_{height}.jpg` corpus images under `/allowed/`, the
  * same under `/disallowed/` with the full X-Robots-Tag header, and
  * anything else → 404.
  */
class HttpImageServer {
  /** The reference's seven test image dimensions (FIXTURES §3). */
  val sizes: Seq[(Int, Int)] = Seq(
    (123, 456), (208, 495), (321, 421), (389, 535), (416, 264), (456, 123), (524, 316))

  private val images: Map[String, Array[Byte]] = sizes.map { case (w, h) =>
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    val g = img.createGraphics()
    g.setColor(java.awt.Color.getHSBColor((w % 255) / 255.0f, 0.7f, 0.8f))
    g.fillRect(0, 0, w, h)
    g.setColor(java.awt.Color.WHITE)
    g.drawString(s"${w}x$h", 10, 20)
    g.dispose()
    s"${w}_$h.jpg" -> Resizer.encode(img, "jpg", 95)
  }.toMap

  private val server: HttpServer = HttpServer.create(new InetSocketAddress(0), 0)

  /** Request/error counters for pipeline forensics (r12 verdict: a
    * pathological bench run left no server-side evidence). `requests`
    * counts every exchange; `errors` counts 404s and handler
    * exceptions (e.g. client hang-ups mid-write under host pressure).
    * Monotonic over the server's life — callers bracket with deltas.
    */
  val requests = new java.util.concurrent.atomic.AtomicLong
  val errors = new java.util.concurrent.atomic.AtomicLong

  private def handler(robots: Boolean): HttpHandler = (x: HttpExchange) => {
    requests.incrementAndGet()
    try {
      val name = x.getRequestURI.getPath.split("/").last
      images.get(name) match {
        case Some(bytes) =>
          if (robots)
            x.getResponseHeaders.add("X-Robots-Tag",
              "noai, noimageai, noindex, noimageindex, nofollow")
          x.sendResponseHeaders(200, bytes.length)
          x.getResponseBody.write(bytes)
        case None =>
          errors.incrementAndGet()
          x.sendResponseHeaders(404, -1)
      }
    } catch {
      // NonFatal only (ADVICE r13): client hang-ups and handler bugs
      // count as errors; VM errors / InterruptedException must
      // propagate, not vanish in a dispatch thread
      case scala.util.control.NonFatal(_) => errors.incrementAndGet()
    }
    finally x.close()
  }

  server.createContext("/allowed", handler(robots = false))
  server.createContext("/disallowed", handler(robots = true))
  // Daemon threads + explicit shutdown in stop(): a lingering
  // non-daemon pool would keep the JVM alive after server.stop().
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8, r => {
    val t = new Thread(r); t.setDaemon(true); t
  })
  server.setExecutor(pool)
  server.start()

  val port: Int = server.getAddress.getPort
  def url(path: String): String = s"http://127.0.0.1:$port$path"
  def allowedUrls: Seq[String] = sizes.map { case (w, h) => url(s"/allowed/${w}_$h.jpg") }
  def disallowedUrls: Seq[String] = sizes.map { case (w, h) => url(s"/disallowed/${w}_$h.jpg") }
  def imageBytes(w: Int, h: Int): Array[Byte] = images(s"${w}_$h.jpg")
  def stop(): Unit = { server.stop(0); pool.shutdownNow() }
}
