package graft.gtfs

import graft.Sessions

import java.io.{File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Runnable end-to-end GTFS pipeline demo: synthesizes a tiny feed zip
  * (when no archive is given), loads it through the full ingest path
  * (checksum dedup -> run registration -> FK-wave conform/append), runs
  * the arrivals query + geo filter, and prints the Kafka-shaped JSON.
  *
  * Usage: runMain graft.gtfs.GtfsDemo [zipPath providerId runDate]
  */
object GtfsDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4", "4")
    val wh = Files.createTempDirectory("gtfs_demo_wh").toString
    val loader = new GtfsLoad(spark, wh)

    val (zipPath, provider, runDate) = args match {
      case Array(z, p, d) => (z, p, d)
      case _ => (syntheticFeed(), "vbb", "2019-02-21")
    }

    // full extract pipeline: scrape page -> extract url -> stage-commit
    // download -> checksum/run dedup -> FK-wave load (SURVEY §3.2-§3.3)
    import graft.ingest.Ingest
    import graft.ingest.Ingest._
    val page = java.nio.file.Files.createTempFile("provider_page", ".html")
    java.nio.file.Files.writeString(page,
      s"""<html><a href="$zipPath" class="gtfs-download">GTFS-Daten</a></html>""")
    val spec = ProviderSpec(provider, page.toString,
      UrlExtractor("""<a href="([^"]*)" class="gtfs-download">""".r))
    val landing = java.nio.file.Files.createTempDirectory("gtfs_landing")

    println(s"== ingesting $provider/$runDate via scraped page into $wh")
    println("== first ingest: " + Ingest.runProviderIngest(
      spec, new LocalFileFetcher, landing, loader, runDate))
    println("== second ingest (idempotency): " + Ingest.runProviderIngest(
      spec, new LocalFileFetcher, landing, loader, runDate))
    println("== landing catalog: " + Ingest.discoverArchives(landing))

    val arrivals = ArrivalsQuery.arrivalsWithExceptions(
      loader.table("calendar"), loader.table("calendar_dates"),
      loader.table("trips"), loader.table("stop_times"), loader.table("stops"),
      "2019-02-18", "2019-02-25")
    println(s"== arrivals in window: ${arrivals.count()}")
    val berlin = ArrivalsQuery.withinRadius(arrivals, 52.52437, 13.41053, 30000)
    println(s"== within 30km of Alexanderplatz: ${berlin.count()}")
    println("== first 5 JSON records:")
    ArrivalsQuery.toArrivalJson(berlin).take(5).foreach(r => println(r.getString(0)))
    spark.stop()
  }

  private def syntheticFeed(): String = {
    val members = Map(
      "agency.txt" -> "agency_id,agency_name\nvbb1,VBB Demo",
      "stops.txt" -> ("stop_id,stop_name,stop_lat,stop_lon\n" +
        "S1,Alexanderplatz,52.52437,13.41053\nS2,Potsdam Hbf,52.39886,13.06566"),
      "routes.txt" -> "route_id,agency_id,route_short_name\nR1,vbb1,U2",
      "calendar.txt" -> ("service_id,monday,tuesday,wednesday,thursday,friday,saturday,sunday,start_date,end_date\n" +
        "WD,1,1,1,1,1,0,0,20190201,20190331"),
      "trips.txt" -> "route_id,service_id,trip_id\nR1,WD,T1",
      "stop_times.txt" -> ("trip_id,arrival_time,departure_time,stop_id,stop_sequence\n" +
        "T1,08:30:15,08:31:00,S1,1\nT1,25:10:00,25:11:00,S2,2"))
    val f = new File(Files.createTempDirectory("gtfs_demo").toFile, "2019-02-21.zip")
    val out = new ZipOutputStream(new FileOutputStream(f))
    members.foreach { case (name, content) =>
      out.putNextEntry(new ZipEntry(name))
      out.write(content.getBytes(StandardCharsets.UTF_8))
      out.closeEntry()
    }
    out.close()
    f.getAbsolutePath
  }
}
