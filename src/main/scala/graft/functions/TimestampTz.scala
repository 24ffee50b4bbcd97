package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A `timestamp with time zone` VALUE type for the engine, closing the
  * one declared type divergence (SURVEY §7.4.1): Spark's TimestampType is
  * instant-only, so the per-value zone payload is carried in the
  * reference's own packed representation —
  * `presto-spi/src/main/java/io/prestosql/spi/type/DateTimeEncoding.java`
  * packs `millisUtc << 12 | zoneKey` into one BIGINT, with the low 12
  * bits indexing a bounded zone dictionary
  * (`TimeZoneKey.java`; the reference ships ~2200 keys, this engine a
  * documented deterministic subset). All operations are compositions of
  * codegen'd built-ins (shifts, masks, map literals, from_utc_timestamp):
  * no UDF, no Expression subclass needed.
  *
  * Semantics follow the reference:
  *  - equality/ordering/arithmetic act on the INSTANT (`instantMillis`,
  *    i.e. `packed >> 12` — the arithmetic shift preserves pre-1970
  *    instants because `millis << 12` keeps two's-complement low bits 0);
  *  - `at_timezone` changes only the zone key (same instant, new
  *    presentation zone — `AtTimeZone.java` semantics);
  *  - field extraction and `CAST AS VARCHAR` present the WALL time in the
  *    value's own zone (`'2021-03-14 01:30:00.123 America/New_York'`).
  */
object TimestampTz {

  /** The engine's zone dictionary: key → IANA id. Bounded and literal —
    * the reference's zone-index file re-expressed as a broadcastable map.
    * Keys are stable API: appending is allowed, renumbering is not.
    */
  val zoneKeys: Seq[(Int, String)] = Seq(
    0 -> "UTC",
    1 -> "America/Los_Angeles",
    2 -> "America/New_York",
    3 -> "America/Chicago",
    4 -> "America/Sao_Paulo",
    5 -> "Europe/London",
    6 -> "Europe/Paris",
    7 -> "Europe/Moscow",
    8 -> "Africa/Cairo",
    9 -> "Asia/Dubai",
    10 -> "Asia/Kolkata",
    11 -> "Asia/Kathmandu",
    12 -> "Asia/Shanghai",
    13 -> "Asia/Tokyo",
    14 -> "Australia/Sydney",
    15 -> "Pacific/Auckland")

  private val keyOf: Column = {
    val m = zoneKeys.flatMap { case (k, z) => Seq(lit(z), lit(k)) }
    map(m: _*)
  }

  private val zoneOf: Column = {
    val m = zoneKeys.flatMap { case (k, z) => Seq(lit(k), lit(z)) }
    map(m: _*)
  }

  /** Pack a UTC instant (session TimestampType) + zone id column into the
    * BIGINT encoding. Unknown zones yield NULL (map miss), the engine's
    * TRY-style behavior.
    */
  def pack(tsUtc: Column, zone: Column): Column =
    shiftleft(unix_millis(tsUtc), 12)
      .bitwiseOR(element_at(keyOf, zone).cast("long"))

  /** Zone id for a dictionary key column (NULL on unknown key). */
  def zoneName(key: Column): Column = element_at(zoneOf, key.cast("int"))

  /** The instant, in epoch millis (what comparisons/ordering act on). */
  def instantMillis(packed: Column): Column = shiftright(packed, 12)

  /** The instant as a session timestamp (ms precision). */
  def instant(packed: Column): Column =
    timestamp_millis(instantMillis(packed))

  /** The value's zone id string. */
  def zoneId(packed: Column): Column =
    element_at(zoneOf, packed.bitwiseAND(lit(4095L)).cast("int"))

  /** Reference `at_timezone`: same instant, new presentation zone. */
  def atTimezone(packed: Column, zone: Column): Column =
    shiftleft(instantMillis(packed), 12)
      .bitwiseOR(element_at(keyOf, zone).cast("long"))

  /** Wall-clock time in the value's own zone (naive timestamp). */
  def wall(packed: Column): Column =
    from_utc_timestamp(instant(packed), zoneId(packed))

  /** Reference `CAST(tstz AS VARCHAR)` shape:
    * `yyyy-MM-dd HH:mm:ss.SSS <zone id>`.
    */
  def toVarchar(packed: Column): Column =
    concat(date_format(wall(packed), "yyyy-MM-dd HH:mm:ss.SSS"),
      lit(" "), zoneId(packed))

  /** Field extraction in the value's zone (hour/minute/day/…). */
  def extract(field: String, packed: Column): Column = field match {
    case "hour"   => hour(wall(packed)).cast("long")
    case "minute" => minute(wall(packed)).cast("long")
    case "day"    => dayofmonth(wall(packed)).cast("long")
    case "month"  => month(wall(packed)).cast("long")
    case "year"   => year(wall(packed)).cast("long")
    case other    => throw new IllegalArgumentException(s"field: $other")
  }
}
