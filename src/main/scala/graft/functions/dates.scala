package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date/time codecs for the GTFS data model.
  *
  * GTFS encodes dates as int `yyyymmdd` (reference
  * `airflow/script/dbinit/05-create-schema.sh:93-94`) and times of day as
  * `HH:MM:SS` strings that MAY exceed 24:00:00 for post-midnight service
  * (schema.sh:149-150). We keep seconds-past-midnight as LongType and roll
  * the day at timestamp materialisation — a `TimestampType` would destroy
  * 25:10:00.
  */
object dates {

  /** date → int yyyymmdd (reference GtfsDAO.java:51-53). */
  def encodeDateInt(d: Column): Column =
    year(d) * 10000 + month(d) * 100 + dayofmonth(d)

  /** int yyyymmdd → date (reference GtfsDAO.java:55-63, minus its
    * increment-the-int bug: using a real DateType is correct by
    * construction across month boundaries).
    */
  def decodeDateInt(i: Column): Column =
    to_date(i.cast("string"), "yyyyMMdd")

  /** "HH:MM:SS" (H may exceed 24) → seconds past midnight (Long). */
  def gtfsTimeToSeconds(t: Column): Column = {
    val p = split(t, ":")
    p.getItem(0).cast("long") * 3600 +
      p.getItem(1).cast("long") * 60 +
      p.getItem(2).cast("long")
  }

  /** (service date, seconds-past-midnight) → event timestamp, rolling
    * >24:00:00 into the following day(s) (reference GtfsDAO.java:55-63,117).
    */
  def gtfsEventTimestamp(serviceDate: Column, secs: Column): Column = {
    val dayRoll = (secs / 86400).cast("int")
    val rem = secs % 86400
    to_timestamp(date_add(serviceDate, dayRoll)) +
      make_dt_interval(lit(0), lit(0), lit(0), rem.cast("decimal(18,6)"))
  }

  /** Monday=0 … Sunday=6 (reference GtfsDAO.java:74 uses ISO getValue-1). */
  def weekdayIndex(d: Column): Column = weekday(d)

  /** JSON event-time format with 7 fractional digits, exact parity with
    * the reference's Jackson pattern (domain/GtfsArrival.java:34-36).
    * Spark's formatter caps at 6 fractional digits (microseconds), so pad
    * the 7th zero explicitly.
    */
  def gtfsLocalTimeString(ts: Column): Column =
    concat(date_format(ts, "yyyy-MM-dd HH:mm:ss.SSSSSS"), lit("0"))
}
