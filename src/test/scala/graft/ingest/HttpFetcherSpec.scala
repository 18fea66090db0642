package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

import java.net.http.{HttpClient, HttpHeaders, HttpRequest, HttpResponse}
import java.nio.ByteBuffer
import java.nio.file.Files
import java.util.Optional
import java.util.concurrent.Flow

/** Offline exercise of the production HTTP binding at the HttpClient
  * seam (the same seam the reference stubs with FakeDownloadOperator,
  * data_provider/operators.py:122-136): a canned client drives real
  * BodyHandlers, so the string/file body plumbing, status handling and
  * truncate-on-rewrite behavior run exactly as against a live server.
  */
class HttpFetcherSpec extends AnyFunSuite {

  /** Canned routes: url -> (status, body bytes). Feeds the handler's
    * BodySubscriber through the reactive protocol like the real client.
    */
  private def stubClient(routes: Map[String, (Int, Array[Byte])]): HttpClient =
    new HttpClient {
      override def send[T](req: HttpRequest,
                           handler: HttpResponse.BodyHandler[T]): HttpResponse[T] = {
        val (status, bytes) = routes(req.uri().toString)
        val noHeaders = HttpHeaders.of(java.util.Map.of(), (_, _) => true)
        val sub = handler.apply(new HttpResponse.ResponseInfo {
          override def statusCode(): Int = status
          override def headers(): HttpHeaders = noHeaders
          override def version(): HttpClient.Version = HttpClient.Version.HTTP_1_1
        })
        sub.onSubscribe(new Flow.Subscription {
          private var delivered = false
          override def request(n: Long): Unit = if (!delivered) {
            delivered = true
            if (bytes.nonEmpty) sub.onNext(java.util.List.of(ByteBuffer.wrap(bytes)))
            sub.onComplete()
          }
          override def cancel(): Unit = ()
        })
        val bodyVal = sub.getBody.toCompletableFuture.get()
        new HttpResponse[T] {
          override def statusCode(): Int = status
          override def request(): HttpRequest = req
          override def previousResponse(): Optional[HttpResponse[T]] = Optional.empty()
          override def headers(): HttpHeaders = noHeaders
          override def body(): T = bodyVal
          override def sslSession(): Optional[javax.net.ssl.SSLSession] = Optional.empty()
          override def uri(): java.net.URI = req.uri()
          override def version(): HttpClient.Version = HttpClient.Version.HTTP_1_1
        }
      }
      override def sendAsync[T](req: HttpRequest, h: HttpResponse.BodyHandler[T]) =
        java.util.concurrent.CompletableFuture.completedFuture(send(req, h))
      override def sendAsync[T](req: HttpRequest, h: HttpResponse.BodyHandler[T],
                                p: HttpResponse.PushPromiseHandler[T]) =
        java.util.concurrent.CompletableFuture.completedFuture(send(req, h))
      override def cookieHandler(): Optional[java.net.CookieHandler] = Optional.empty()
      override def connectTimeout(): Optional[java.time.Duration] = Optional.empty()
      override def followRedirects(): HttpClient.Redirect = HttpClient.Redirect.NORMAL
      override def proxy(): Optional[java.net.ProxySelector] = Optional.empty()
      override def sslContext(): javax.net.ssl.SSLContext =
        javax.net.ssl.SSLContext.getDefault
      override def sslParameters(): javax.net.ssl.SSLParameters =
        new javax.net.ssl.SSLParameters()
      override def authenticator(): Optional[java.net.Authenticator] = Optional.empty()
      override def version(): HttpClient.Version = HttpClient.Version.HTTP_1_1
      override def executor(): Optional[java.util.concurrent.Executor] = Optional.empty()
    }

  private val page = """<a href="https://files.example/gtfs/latest.zip">download</a>"""
  private val zipBytes = "PKfake-zip-payload".getBytes("UTF-8")

  test("fetchPage returns the page body on 200") {
    val f = new Ingest.HttpFetcher(stubClient(Map(
      "https://provider.example/page" -> (200, page.getBytes("UTF-8")))))
    assert(f.fetchPage("https://provider.example/page") === page)
  }

  test("download streams the body to the destination file, truncating stale bytes") {
    val f = new Ingest.HttpFetcher(stubClient(Map(
      "https://files.example/gtfs/latest.zip" -> (200, zipBytes))))
    val dest = Files.createTempFile("fetch", ".zip~")
    Files.write(dest, ("x" * 4096).getBytes("UTF-8")) // stale longer content
    f.download("https://files.example/gtfs/latest.zip", dest)
    assert(Files.readAllBytes(dest).toSeq === zipBytes.toSeq)
    Files.delete(dest)
  }

  test("non-2xx raises instead of committing a body") {
    val f = new Ingest.HttpFetcher(stubClient(Map(
      "https://provider.example/gone" -> (404, "not here".getBytes("UTF-8")))))
    val e = intercept[java.io.IOException](f.fetchPage("https://provider.example/gone"))
    assert(e.getMessage.contains("404"))
  }

  test("non-2xx download deletes the staging file it streamed into") {
    val f = new Ingest.HttpFetcher(stubClient(Map(
      "https://files.example/err.zip" -> (503, "<html>maintenance</html>".getBytes("UTF-8")))))
    val dest = Files.createTempFile("fetch-err", ".zip~")
    val e = intercept[java.io.IOException](
      f.download("https://files.example/err.zip", dest))
    assert(e.getMessage.contains("503"))
    // ofFile consumed the error body before the status check — the
    // fetcher must not leave it behind in the staging area
    assert(!Files.exists(dest), "staging file with an error-page body survived")
  }

  test("extractor + HttpFetcher wire together on a canned provider page") {
    val f = new Ingest.HttpFetcher(stubClient(Map(
      "https://provider.example/page" -> (200, page.getBytes("UTF-8")))))
    val ex = Ingest.UrlExtractor("""href="([^"]+\.zip)"""".r)
    assert(ex.extract(f.fetchPage("https://provider.example/page"))
      === Some("https://files.example/gtfs/latest.zip"))
  }
}
