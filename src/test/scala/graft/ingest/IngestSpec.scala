package graft.ingest

import graft.SparkSpec
import graft.gtfs.GtfsLoad

import java.io.{File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

class IngestSpec extends SparkSpec {
  import Ingest._

  private def makeZip(): File = {
    val f = new File(Files.createTempDirectory("ing").toFile, "feed.zip")
    val out = new ZipOutputStream(new FileOutputStream(f))
    Map(
      "agency.txt" -> "agency_id,agency_name\nx1,X",
      "stops.txt" -> "stop_id,stop_name,stop_lat,stop_lon\nS1,A,52.5,13.4",
      "calendar.txt" -> ("service_id,monday,tuesday,wednesday,thursday,friday,saturday,sunday,start_date,end_date\n" +
        "WD,1,1,1,1,1,0,0,20190201,20190331"),
    ).foreach { case (n, c) =>
      out.putNextEntry(new ZipEntry(n)); out.write(c.getBytes(StandardCharsets.UTF_8)); out.closeEntry()
    }
    out.close(); f
  }

  private def makePage(zipPath: String): String = {
    val p = Files.createTempFile("page", ".html")
    Files.writeString(p,
      s"""<html><a href="$zipPath" class="gtfs-download">GTFS-Daten</a></html>""")
    p.toString
  }

  private val extractor = UrlExtractor("""<a href="([^"]*)" class="gtfs-download">""".r)

  test("url extraction: capture group, relative rebuild, miss -> None") {
    assert(extractor.extract("""<a href="/x.zip" class="gtfs-download">""") === Some("/x.zip"))
    assert(UrlExtractor("""href="(/m/[0-9]*)"""".r, Some("https://ex.org"))
      .extract("""href="/m/42"""") === Some("https://ex.org/m/42"))
    assert(extractor.extract("<html>nothing</html>") === None)
  }

  test("end-to-end provider ingest: scrape, stage-commit, load, idempotency") {
    val zip = makeZip()
    val page = makePage(zip.getAbsolutePath)
    val landing = Files.createTempDirectory("landing")
    val wh = Files.createTempDirectory("wh").toString
    val loader = new GtfsLoad(spark, wh)
    val spec = ProviderSpec("xvv", page, extractor)

    runProviderIngest(spec, new LocalFileFetcher, landing, loader, "2019-02-21") match {
      case Loaded(_, counts) => assert(counts("stops") === 1)
      case other => fail(s"expected Loaded, got $other")
    }
    // staged file promoted: no .zip~ remains, .zip exists
    assert(Files.exists(landing.resolve("xvv/2019-02-21.zip")))
    assert(!Files.exists(landing.resolve("xvv/2019-02-21.zip~")))
    // re-ingest same date -> run-level skip before any download
    assert(runProviderIngest(spec, new LocalFileFetcher, landing, loader,
      "2019-02-21") === AlreadyLoaded)
    assert(loader.table("run").count() === 1)
    // same content different date -> checksum dedup
    assert(runProviderIngest(spec, new LocalFileFetcher, landing, loader,
      "2019-02-22") === DuplicateContent)
    // catalog scan sees both committed archives
    assert(discoverArchives(landing) ===
      Map("xvv" -> Set("2019-02-21", "2019-02-22")))
  }

  test("url memo short-circuits when enabled and url is unchanged") {
    val zip = makeZip()
    val page = makePage(zip.getAbsolutePath)
    val landing = Files.createTempDirectory("landing2")
    val loader = new GtfsLoad(spark, Files.createTempDirectory("wh2").toString)
    val spec = ProviderSpec("xvv", page, extractor)
    val r1 = runProviderIngest(spec, new LocalFileFetcher, landing, loader,
      "2019-02-21", checkUrl = true)
    assert(r1.isInstanceOf[Loaded])
    val r2 = runProviderIngest(spec, new LocalFileFetcher, landing, loader,
      "2019-02-22", checkUrl = true)
    assert(r2 === UrlUnchanged)
  }
}
