package graft.gtfs

import org.apache.spark.sql.types._

/** Canonical schema registry for the GTFS data model.
  *
  * Mirrors the reference DDL (`airflow/script/dbinit/05-create-schema.sh:
  * 10-195` in XComp/vbb-data-pipeline) with Spark-native types:
  *  - NUMERIC(8) yyyymmdd date-ints stay IntegerType (codec in
  *    graft.functions.dates);
  *  - INTERVAL arrival/departure times become LongType seconds-past-
  *    midnight so GTFS's >24:00:00 post-midnight services survive
  *    (schema.sh:149-150);
  *  - every child table carries the provenance pair (run_id, provider_id)
  *    injected at load (database_loader/operators.py:156,164), which is
  *    also the partition key of the warehouse — partition pruning makes
  *    per-feed-version queries touch only their own files at 100 TB.
  */
object GtfsSchemas {

  private def s(name: String, nullable: Boolean = true) =
    StructField(name, StringType, nullable)
  private def i(name: String, nullable: Boolean = true) =
    StructField(name, IntegerType, nullable)
  private def d(name: String, nullable: Boolean = true) =
    StructField(name, DoubleType, nullable)
  private def b(name: String, nullable: Boolean = true) =
    StructField(name, BooleanType, nullable)
  private def l(name: String, nullable: Boolean = true) =
    StructField(name, LongType, nullable)

  /** Feed-file schemas, keyed by GTFS member stem ("agency" for
    * agency.txt). Excludes the provenance pair, which the loader prepends.
    */
  val feedTables: Map[String, StructType] = Map(
    "agency" -> StructType(Seq(
      s("agency_id", nullable = false), s("agency_name"), s("agency_url"),
      s("agency_timezone"), s("agency_lang"), s("agency_phone"),
      s("agency_fare_url"))),
    "stops" -> StructType(Seq(
      s("stop_id", nullable = false), s("stop_code"), s("stop_name"),
      s("stop_desc"), d("stop_lat", nullable = false),
      d("stop_lon", nullable = false), s("zone_id"), s("stop_url"),
      b("location_type"), s("parent_station"), s("stop_timezone"),
      s("wheelchair_boarding"))),
    "routes" -> StructType(Seq(
      s("route_id", nullable = false), s("agency_id", nullable = false),
      s("route_short_name"), s("route_long_name"), s("route_desc"),
      i("route_type"), s("route_url"), s("route_color"),
      s("route_text_color"))),
    "calendar" -> StructType(Seq(
      s("service_id", nullable = false),
      b("monday", nullable = false), b("tuesday", nullable = false),
      b("wednesday", nullable = false), b("thursday", nullable = false),
      b("friday", nullable = false), b("saturday", nullable = false),
      b("sunday", nullable = false),
      i("start_date", nullable = false), i("end_date", nullable = false))),
    "calendar_dates" -> StructType(Seq(
      s("service_id", nullable = false), i("date"), i("exception_type"))),
    "shapes" -> StructType(Seq(
      s("shape_id", nullable = false), d("shape_pt_lat"), d("shape_pt_lon"),
      i("shape_pt_sequence"), s("shape_dist_traveled"))),
    "trips" -> StructType(Seq(
      s("route_id", nullable = false), s("service_id", nullable = false),
      s("trip_id", nullable = false), s("trip_headsign"),
      s("trip_short_name"), b("direction_id"), s("block_id"), s("shape_id"),
      s("wheelchair_accessible"), s("bikes_allowed"))),
    "stop_times" -> StructType(Seq(
      s("trip_id", nullable = false),
      l("arrival_time"), l("departure_time"), // seconds past midnight, may exceed 86400
      s("stop_id", nullable = false), i("stop_sequence"), s("stop_headsign"),
      i("pickup_type"), i("drop_off_type"), i("shape_dist_traveled"))),
    "transfers" -> StructType(Seq(
      s("from_stop_id"), s("to_stop_id"), i("transfer_type"),
      i("min_transfer_time"), s("from_route_id"), s("to_route_id"),
      s("from_trip_id"), s("to_trip_id"))),
    "frequencies" -> StructType(Seq(
      s("trip_id", nullable = false), s("start_time"), s("end_time"),
      s("headway_secs"), s("exact_times"))),
  )

  /** Seconds-past-midnight columns parsed from HH:MM:SS (H may be >= 24). */
  val gtfsTimeColumns: Map[String, Seq[String]] = Map(
    "stop_times" -> Seq("arrival_time", "departure_time"))

  /** Primary-key columns per table (within a run) — the idempotent-append
    * dedup keys (reference ON CONFLICT DO NOTHING, utils/__init__.py:55-56).
    * Tables without a reference PK dedup on all columns.
    */
  val primaryKeys: Map[String, Seq[String]] = Map(
    "agency" -> Seq("provider_id", "agency_id"),
    "stops" -> Seq("run_id", "stop_id"),
    "routes" -> Seq("run_id", "route_id"),
    "calendar" -> Seq("run_id", "service_id"),
    "shapes" -> Seq("run_id", "shape_id"),
    "trips" -> Seq("run_id", "trip_id"),
  )

  /** FK-safe load waves (reference member-rank map,
    * database_loader/operators.py:136-141).
    */
  val loadWaves: Seq[Seq[String]] = Seq(
    Seq("agency", "calendar", "shapes", "stops"),
    Seq("calendar_dates", "routes"),
    Seq("trips"),
    Seq("frequencies", "stop_times", "transfers"))

  /** CHECK-constraint predicates (schema.sh:154-155) — Spark has no CHECK,
    * so the loader splits rows into (accepted, quarantined).
    */
  val checkConstraints: Map[String, org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.col
    Map("stop_times" ->
      ((col("pickup_type").isNull || col("pickup_type").between(0, 3)) &&
       (col("drop_off_type").isNull || col("drop_off_type").between(0, 3))))
  }

  /** Referential-integrity audit joins: child table -> (parent table,
    * join keys). Orphans = child left_anti parent (reference FKs,
    * schema.sh:136-160).
    */
  val foreignKeys: Map[String, Seq[(String, Seq[(String, String)])]] = Map(
    "routes" -> Seq(("agency", Seq("provider_id" -> "provider_id", "agency_id" -> "agency_id"))),
    "trips" -> Seq(
      ("routes", Seq("run_id" -> "run_id", "route_id" -> "route_id")),
      ("calendar", Seq("run_id" -> "run_id", "service_id" -> "service_id"))),
    "stop_times" -> Seq(
      ("trips", Seq("run_id" -> "run_id", "trip_id" -> "trip_id")),
      ("stops", Seq("run_id" -> "run_id", "stop_id" -> "stop_id"))),
  )
}
