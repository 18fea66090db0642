package graft.ingest

import graft.gtfs.GtfsLoad

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.util.matching.Regex

/** Extract-pipeline surface (SURVEY §2.1 S1-S4, §2.2 K4, §2.13 X1-X3 —
  * reference: airflow/dags/extract_dag.py + airflow/plugins/data_provider/
  * operators.py in XComp/vbb-data-pipeline).
  *
  * Single-URL HTTP work is driver-side by design (not a Spark job); the
  * moment data lands it enters the distributed loader (GtfsLoad). Fetching
  * is behind a trait so tests (and this zero-egress container) bind a
  * local-file fetcher — the reference's own test seam
  * (FakeDownloadOperator, data_provider/operators.py:122-136).
  */
object Ingest {

  /** Page-fetch + byte-download abstraction (S1/S3/S4). */
  trait Fetcher {
    def fetchPage(url: String): String
    def download(url: String, dest: Path): Unit
  }

  /** Local-filesystem fetcher: `url` is a path — the test seam (and this
    * zero-egress container's only live binding).
    */
  final class LocalFileFetcher extends Fetcher {
    def fetchPage(url: String): String =
      new String(Files.readAllBytes(Paths.get(url)), "UTF-8")
    def download(url: String, dest: Path): Unit =
      Files.copy(Paths.get(url), dest, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Production HTTP binding over java.net.http (the page-scrape +
    * zip-download client of reference S1/S3, data_provider/
    * operators.py:54-61 — requests.get there, HttpClient here). The
    * client is injectable so specs exercise the request/response wiring
    * offline at the HttpClient seam; redirects follow (the reference
    * providers serve zips behind 302s) and downloads stream to the
    * staging file rather than buffering the archive on the heap. Non-2xx
    * responses raise — callers treat a failed fetch as a failed ingest
    * pass, never a partial file (the `.zip~` staging + atomic promote in
    * [[runProviderIngest]] guarantees that even mid-download crashes
    * leave no committed artifact).
    */
  final class HttpFetcher(
      client: java.net.http.HttpClient = java.net.http.HttpClient.newBuilder()
        .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
        .connectTimeout(java.time.Duration.ofSeconds(30))
        .build()) extends Fetcher {
    import java.net.http.{HttpRequest, HttpResponse}

    private def get[T](url: String,
                       handler: HttpResponse.BodyHandler[T]): HttpResponse[T] = {
      val req = HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMinutes(10)).GET().build()
      val resp = client.send(req, handler)
      if (resp.statusCode() / 100 != 2)
        throw new java.io.IOException(s"GET $url -> HTTP ${resp.statusCode()}")
      resp
    }

    def fetchPage(url: String): String =
      get(url, HttpResponse.BodyHandlers.ofString()).body()

    def download(url: String, dest: Path): Unit =
      // ofFile streams the body BEFORE the status check runs, so a non-
      // 2xx response would leave its error page sitting in the staging
      // file; delete it on the way out or a retry loop inspecting the
      // staging file sees garbage (the atomic promote already keeps it
      // from ever being committed — this keeps the staging area honest
      // too)
      try get(url, HttpResponse.BodyHandlers.ofFile(dest,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING))
      catch { case e: Throwable =>
        java.nio.file.Files.deleteIfExists(dest)
        throw e
      }
  }

  /** Provider-specific download-URL extraction strategies (S1/F1): regex
    * with capture group 1 over the provider page, optional relative->
    * absolute rebuild (F4). Mirrors the reference's three extractors
    * (extract_dag.py:15-54) as data, not code.
    */
  final case class UrlExtractor(pattern: Regex, baseUrl: Option[String] = None) {
    def extract(page: String): Option[String] =
      pattern.findFirstMatchIn(page).map { m =>
        baseUrl.fold(m.group(1))(b => b + m.group(1))
      }
  }

  /** Provider registry (X3): id -> (page url, extractor). */
  final case class ProviderSpec(id: String, pageUrl: String, extractor: UrlExtractor)

  /** Extraction outcome for observability/short-circuit decisions. */
  sealed trait IngestResult
  case object UrlUnchanged extends IngestResult
  case object DuplicateContent extends IngestResult
  case object AlreadyLoaded extends IngestResult
  final case class Loaded(runDate: String, counts: Map[String, Long]) extends IngestResult
  final case class ExtractFailed(reason: String) extends IngestResult

  /** URL-change memo (S2/X2): compare against `url.txt` next to the
    * provider's landing dir; unchanged -> short-circuit (note the
    * reference disables this in live config — check_url=False,
    * extract_dag.py:102-113 — so it's opt-in here too).
    *
    * Read and write are split: the memo is recorded only AFTER a
    * successful ingest — writing it up front would short-circuit every
    * retry of a failed download/load as UrlUnchanged forever.
    */
  def urlChanged(landingDir: Path, url: String): Boolean = {
    val memo = landingDir.resolve("url.txt")
    val prev = if (Files.exists(memo)) Files.readString(memo).trim else ""
    prev != url
  }

  def recordUrl(landingDir: Path, url: String): Unit = {
    Files.createDirectories(landingDir)
    Files.writeString(landingDir.resolve("url.txt"), url)
  }

  /** One provider's extract->download->stage->load pass (X1 composition):
    * scrape URL, optional memo short-circuit, download to a `.zip~`
    * staging file, atomically promote to `.zip` (K4), then hand to the
    * loader (which applies checksum + run-level idempotency).
    */
  def runProviderIngest(provider: ProviderSpec, fetcher: Fetcher,
                        landingBase: Path, loader: GtfsLoad,
                        runDate: String, checkUrl: Boolean = false): IngestResult = {
    val page = fetcher.fetchPage(provider.pageUrl)
    provider.extractor.extract(page) match {
      case None => ExtractFailed(s"no download url on ${provider.pageUrl}")
      case Some(url) =>
        val dir = landingBase.resolve(provider.id)
        if (checkUrl && !urlChanged(dir, url)) UrlUnchanged
        // run-level anti-join BEFORE the download (J2: new-data
        // identification precedes load in the reference DAG)
        else if (loader.identifyNewRuns(Seq((provider.id, runDate))).isEmpty)
          AlreadyLoaded
        else {
          Files.createDirectories(dir)
          val staged = dir.resolve(s"$runDate.zip~")
          val committed = dir.resolve(s"$runDate.zip")
          fetcher.download(url, staged)
          Files.move(staged, committed, StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
          val result = loader.loadArchive(provider.id, runDate, committed.toString) match {
            case Some(counts) => Loaded(runDate, counts)
            case None => DuplicateContent
          }
          if (checkUrl) recordUrl(dir, url) // memo only after success
          result
        }
    }
  }

  /** Directory catalog scan (S6): landing zips -> provider -> run dates
    * (filename stem = run date, database_loader/operators.py:31-59).
    */
  def discoverArchives(landingBase: Path): Map[String, Set[String]] = {
    if (!Files.exists(landingBase)) return Map.empty
    import scala.jdk.CollectionConverters._
    Files.list(landingBase).iterator().asScala
      .filter(Files.isDirectory(_))
      .map { providerDir =>
        val dates = Files.list(providerDir).iterator().asScala
          .map(_.getFileName.toString)
          .filter(_.endsWith(".zip"))
          .map(_.stripSuffix(".zip")).toSet
        providerDir.getFileName.toString -> dates
      }.filter(_._2.nonEmpty).toMap
  }
}
