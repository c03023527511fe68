package graft.operators

import java.io.ByteArrayOutputStream
import java.net.{HttpURLConnection, URI}
import java.util.concurrent.{ExecutorCompletionService, Executors, Semaphore}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{BinaryType, StringType, StructField, StructType}

import graft.config.DownloadConfig

/** Per-row HTTP byte fetch (S11/T1/F1) as a thread-pooled
  * `mapPartitions` — the performance-critical concurrency inversion
  * from SURVEY §4: Spark gives one thread per task, but hiding a
  * 10-second network timeout needs hundreds of in-flight requests per
  * core (reference: 256 threads/process, `downloader.py:224`,
  * rationale README.md:349-357).
  *
  * Inside each partition task:
  *  - a fixed thread pool of `cfg.threadCount` I/O threads;
  *  - a backpressure semaphore capped at 2× threads so at most 2·T
  *    responses are buffered (reference `downloader.py:203-211`);
  *  - results are yielded in COMPLETION order (`imap_unordered`
  *    semantics, O3) — keys carry the original order, so nothing
  *    downstream depends on iterator order;
  *  - the pool is shut down on task completion or failure (task-retry
  *    safe: no leaked threads on speculative or failed attempts).
  *
  * Failed rows are TAGGED, not dropped (`_fetch_error` set, payload
  * null) — the reference's "tag, don't drop" invariant (§2.2 note).
  *
  * X-Robots-Tag directives (F1, `downloader.py:21-35`): a response
  * carrying any of `cfg.disallowedHeaderDirectives` (bare or
  * `agent: directive` form) is rejected as disallowed.
  */
object Downloader {

  val PayloadCol = "_payload"
  val FetchErrorCol = "_fetch_error"

  /** Trust-all socket factory for `ignoreSslCertificate` — mirror of
    * the reference's CERT_NONE context (downloader.py:47-51). Built
    * once per executor.
    */
  private lazy val trustAllFactory: javax.net.ssl.SSLSocketFactory = {
    val tm: Array[javax.net.ssl.TrustManager] = Array(new javax.net.ssl.X509TrustManager {
      override def checkClientTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
      override def checkServerTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
      override def getAcceptedIssuers: Array[java.security.cert.X509Certificate] = Array.empty
    })
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(null, tm, new java.security.SecureRandom())
    ctx.getSocketFactory
  }

  /** One GET with timeout + UA; returns payload or error string. */
  private def fetchOnce(url: String, cfg: DownloadConfig): (Array[Byte], String) = {
    var conn: HttpURLConnection = null
    try {
      conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
      conn match {
        case https: javax.net.ssl.HttpsURLConnection if cfg.ignoreSslCertificate =>
          https.setSSLSocketFactory(trustAllFactory)
          https.setHostnameVerifier((_, _) => true)
        case _ =>
      }
      conn.setConnectTimeout(cfg.timeoutSeconds * 1000)
      conn.setReadTimeout(cfg.timeoutSeconds * 1000)
      val ua = "Mozilla/5.0 (X11; Ubuntu; Linux x86_64; rv:72.0) Gecko/20100101 Firefox/72.0" +
        cfg.userAgentToken.map(t => s" (compatible; $t; +https://github.com/rom1504/img2dataset)").getOrElse("")
      conn.setRequestProperty("User-Agent", ua)
      conn.setInstanceFollowRedirects(true)
      val code = conn.getResponseCode
      // F1: robots directives (downloader.py:20-35): an optional
      // "agent:" prefix scopes the directive list — it only applies
      // when unscoped or when the agent matches our UA token.
      val robotsTags: Seq[String] = {
        import scala.jdk.CollectionConverters._
        // ALL occurrences across ALL casings: HttpURLConnection keys the
        // map by header name as received, so `X-Robots-Tag` and
        // `x-robots-tag` land in separate entries (reference uses
        // headers.get_all, case-insensitive over every occurrence).
        conn.getHeaderFields.asScala.collect {
          case (k, v) if k != null && k.equalsIgnoreCase("X-Robots-Tag") => v.asScala.toSeq
        }.toSeq.flatten
      }
      val disallowed = robotsTags.exists { tag =>
        val parts = tag.split(":", 2)
        val (agent, directiveStr) =
          if (parts.length == 2) (Some(parts(0).trim.toLowerCase), parts(1)) else (None, tag)
        val applies = agent.isEmpty || cfg.userAgentToken.map(_.toLowerCase) == agent
        applies && directiveStr.split(",").map(_.trim.toLowerCase)
          .exists(cfg.disallowedHeaderDirectives.contains)
      }
      // >= 300: redirects the client did not follow (e.g. http→https
      // cross-protocol, which HttpURLConnection refuses) — the 3xx
      // body is NOT the image; treat as a download failure.
      if (code >= 300) (null, s"HTTP $code")
      else if (disallowed) (null, "Use of image disallowed by X-Robots-Tag directive")
      else {
        val in = conn.getInputStream
        val buf = new ByteArrayOutputStream()
        val chunk = new Array[Byte](64 * 1024)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        in.close()
        (buf.toByteArray, null)
      }
    } catch {
      // task kill (pool.shutdownNow) interrupts worker threads mid-
      // fetch: restore the interrupt flag (InterruptedException clears
      // it) so the retry loop sees the dying task and stops
      case e: InterruptedException =>
        Thread.currentThread().interrupt(); (null, "interrupted")
      case e: java.io.InterruptedIOException =>
        Thread.currentThread().interrupt(); (null, "interrupted")
      // NonFatal only: an OOM while buffering a payload must fail the
      // task, not be recorded as a per-row download error
      case scala.util.control.NonFatal(e) =>
        (null, Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
    } finally {
      if (conn != null) conn.disconnect()
    }
  }

  /** T1: retry wrapper (`downloader.py:66-85`). */
  private def fetchWithRetry(url: String, cfg: DownloadConfig): (Array[Byte], String) = {
    var attempt = 0
    var res = fetchOnce(url, cfg)
    // interrupt guard: a killed task must not launch fresh full-
    // timeout attempts from its dying pool threads
    while (res._1 == null && attempt < cfg.retries && !Thread.currentThread().isInterrupted) {
      attempt += 1
      res = fetchOnce(url, cfg)
    }
    res
  }

  /** Extend `df` with `_payload binary, _fetch_error string` by
    * fetching `url` per row with an internal thread pool. `progress`
    * accumulators (attempted, succeeded) are bumped once per completed
    * row from the single consumer thread (LongAccumulator is not
    * thread-safe for the pool's worker threads).
    */
  def download(df: DataFrame, cfg: DownloadConfig,
               progress: Option[(org.apache.spark.util.LongAccumulator,
                                 org.apache.spark.util.LongAccumulator)] = None): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField(PayloadCol, BinaryType, nullable = true),
      StructField(FetchErrorCol, StringType, nullable = true)))
    val urlIdx = df.schema.fieldIndex("url")
    val conf = cfg
    df.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else new Iterator[Row] {
        private val pool = Executors.newFixedThreadPool(conf.threadCount)
        // Task-kill safety: speculative/zombie attempts must not leak
        // threads — shut the pool down however the task ends.
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => pool.shutdownNow()))
        private val ecs = new ExecutorCompletionService[Row](pool)
        // ≤ 2×threads decoded payloads in flight (backpressure).
        private val permits = new Semaphore(conf.threadCount * 2)
        private var submitted = 0L
        private var drained = 0L

        private def submitSome(): Unit = {
          // Keep the pipe full without materializing the partition.
          while (rows.hasNext && permits.tryAcquire()) {
            val r = rows.next()
            submitted += 1
            ecs.submit { () =>
              val (payload, err) = fetchWithRetry(r.getString(urlIdx), conf)
              Row.fromSeq(r.toSeq :+ payload :+ err)
            }
          }
        }

        submitSome()

        override def hasNext: Boolean = {
          val more = drained < submitted || rows.hasNext
          if (!more) pool.shutdown()
          more
        }

        override def next(): Row = {
          submitSome()
          val row = try ecs.take().get() catch {
            case e: Throwable => pool.shutdownNow(); throw e
          }
          drained += 1
          permits.release()
          progress.foreach { case (att, suc) =>
            att.add(1L)
            if (row.isNullAt(row.length - 1)) suc.add(1L) // no fetch error
          }
          submitSome()
          row
        }
      }
    }(Encoders.row(outSchema))
  }
}
