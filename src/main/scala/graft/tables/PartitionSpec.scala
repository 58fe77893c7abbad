package graft.tables

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hidden-partitioning transforms (the Iceberg partition-spec model —
  * spec §Partition Transforms; the reference's Iceberg catalog
  * advertises them even though its init SQL uses identity only,
  * /root/reference/docker/init/lakehouse_init.sql). A manifest
  * `partitionBy` entry is a SPEC string: a bare column name (identity —
  * the only form before r20, so every existing manifest parses
  * unchanged) or `days(col)` / `months(col)` / `years(col)` /
  * `bucket(n,col)`.
  *
  * The physical Hive directory column (`col__day=2024-01-03`,
  * `col__bucket=7`) is DERIVED from the source column at write time and
  * never enters the declared schema — users query the SOURCE column
  * only, exactly Iceberg's hidden-partitioning contract. Reads project
  * back to the declared schema; range reads on a time-transformed
  * leading spec prune whole `col__day=...` subdirs through the
  * transform ([[LakeTable.readBetween]]).
  *
  * Time transforms are pinned to UTC (the Iceberg stance): a
  * partition LAYOUT is persistent state, so two sessions with
  * different `spark.sql.session.timeZone` must agree on which subdir
  * an instant lives in or range pruning silently loses rows.
  * `date_format` renders in the session zone, so the write path
  * REQUIRES a UTC session when a time transform is present
  * ([[requireUtcSession]], loud error instead of a zone-skewed
  * layout), and [[timeDirValue]] maps read-side bounds in UTC
  * unconditionally — a non-UTC reader still prunes correctly against
  * the UTC-written dirs. Bucket derives `pmod(xxhash64(col), n)`;
  * it is zone-free and spreads writes
  * and bounds file counts per commit (not wire-compatible with
  * Iceberg's murmur3 bucket — self-consistent within graft tables).
  * NULL time values land in Hive's default-partition dir, which a range
  * prune correctly never selects (NULL satisfies no range predicate);
  * null bucket keys hash to the seed's bucket.
  */
sealed trait PartitionSpec {
  /** Source data column (in the declared schema). */
  def source: String
  /** Physical Hive directory column name. */
  def dirCol: String
  /** Directory value derived from the source column. */
  def derive(c: Column): Column
  /** Canonical spec string as stored in the manifest. */
  def spec: String
  def isIdentity: Boolean = false
}

final case class IdentityPart(source: String) extends PartitionSpec {
  def dirCol: String = source
  def derive(c: Column): Column = c
  def spec: String = source
  override def isIdentity: Boolean = true
}

/** Shared shape of the time transforms: the dir value is a fixed-width
  * prefix of the ISO rendering, so LEXICOGRAPHIC order on dir values IS
  * chronological order and a time-range prune is a string-range filter
  * over subdir names.
  */
sealed trait TimePart extends PartitionSpec {
  def pattern: String
  final def derive(c: Column): Column = date_format(c, pattern)
}

final case class DaysPart(source: String) extends TimePart {
  def dirCol: String = s"${source}__day"
  def pattern: String = "yyyy-MM-dd"
  def spec: String = s"days($source)"
}

final case class MonthsPart(source: String) extends TimePart {
  def dirCol: String = s"${source}__month"
  def pattern: String = "yyyy-MM"
  def spec: String = s"months($source)"
}

final case class YearsPart(source: String) extends TimePart {
  def dirCol: String = s"${source}__year"
  def pattern: String = "yyyy"
  def spec: String = s"years($source)"
}

final case class BucketPart(n: Int, source: String) extends PartitionSpec {
  require(n >= 2, s"bucket($n, $source): bucket count must be >= 2")
  def dirCol: String = s"${source}__bucket"
  def derive(c: Column): Column = pmod(xxhash64(c), lit(n.toLong)).cast("int")
  def spec: String = s"bucket($n,$source)"
}

object PartitionSpec {

  private val DaysRe = """days\(\s*([^()\s]+)\s*\)""".r
  private val MonthsRe = """months\(\s*([^()\s]+)\s*\)""".r
  private val YearsRe = """years\(\s*([^()\s]+)\s*\)""".r
  private val BucketRe = """bucket\(\s*(\d+)\s*,\s*([^()\s]+)\s*\)""".r

  private val KnownTransformRe =
    """(?i)(identity|bucket|truncate|void|years?|months?|days?|hours?|date(?:_trunc)?)\(.*\)""".r

  /** Parse a manifest spec string. Anything that is not a recognized
    * transform call is an identity column name — the pre-r20 format.
    * A KNOWN-but-unsupported transform keyword (e.g. `hours(ts)`,
    * `truncate(4,c)`) fails loudly rather than silently becoming an
    * identity column named `hours(ts)`; an arbitrary paren-bearing
    * name that matches no transform keyword stays an identity column,
    * so a legacy manifest whose partition column happened to contain
    * parentheses keeps parsing unchanged.
    */
  def parse(s: String): PartitionSpec = s.trim match {
    case DaysRe(c) => DaysPart(c)
    case MonthsRe(c) => MonthsPart(c)
    case YearsRe(c) => YearsPart(c)
    case BucketRe(n, c) => BucketPart(n.toInt, c)
    case other =>
      require(
        !KnownTransformRe.pattern.matcher(other).matches(),
        s"unsupported partition transform: $other " +
          "(supported: identity, days(col), months(col), years(col), bucket(n,col))")
      IdentityPart(other)
  }

  /** Writes deriving a time-transform dir column must run under a UTC
    * session: the dir value is rendered by `date_format` in the session
    * zone, and the persisted layout (plus every reader's prune, which
    * maps bounds in UTC) is defined as the UTC rendering. Failing
    * loudly here converts a cross-session zone skew — rows silently
    * missing from range reads — into an immediate, actionable error.
    */
  def requireUtcSession(spark: org.apache.spark.sql.SparkSession, specs: Seq[PartitionSpec]): Unit =
    if (specs.exists(_.isInstanceOf[TimePart])) {
      val z = spark.conf.get("spark.sql.session.timeZone")
      require(
        java.time.ZoneId.of(z).normalized() == java.time.ZoneOffset.UTC,
        s"time-transform partitioning (days/months/years) requires spark.sql.session.timeZone=UTC " +
          s"(got $z): the dir layout is pinned to UTC so every session prunes the same subdirs")
    }

  /** The same transform over a different (e.g. case-canonicalized)
    * source column.
    */
  def withSource(p: PartitionSpec, src: String): PartitionSpec = p match {
    case _: IdentityPart => IdentityPart(src)
    case _: DaysPart => DaysPart(src)
    case _: MonthsPart => MonthsPart(src)
    case _: YearsPart => YearsPart(src)
    case b: BucketPart => BucketPart(b.n, src)
  }

  /** The dir value a time-transformed bound maps to, in UTC (the
    * pinned layout zone — see [[requireUtcSession]]) — `None` when the
    * bound's type cannot be mapped (the caller must then scan
    * conservatively). String bounds must already be ISO-prefixed
    * (`yyyy-MM-dd...`).
    */
  def timeDirValue(t: TimePart, bound: Any): Option[String] = {
    val zone = java.time.ZoneOffset.UTC
    val localDate: Option[java.time.LocalDate] = bound match {
      case ts: java.sql.Timestamp => Some(ts.toInstant.atZone(zone).toLocalDate)
      case d: java.sql.Date => Some(d.toLocalDate)
      case d: java.time.LocalDate => Some(d)
      case i: java.time.Instant => Some(i.atZone(zone).toLocalDate)
      // LocalDateTime bounds are interpreted as UTC WALL TIME (the
      // layout's pinned zone): a caller holding a non-UTC local time
      // must convert to Instant/Timestamp first — taking the LocalDate
      // of a zoned wall time near midnight could otherwise select the
      // adjacent day's dir and prune live rows
      case ldt: java.time.LocalDateTime => Some(ldt.toLocalDate)
      case s: String if s.matches("""\d{4}-\d{2}-\d{2}.*""") =>
        Some(java.time.LocalDate.parse(s.take(10)))
      case _ => None
    }
    localDate.map { ld =>
      t match {
        case _: DaysPart => f"${ld.getYear}%04d-${ld.getMonthValue}%02d-${ld.getDayOfMonth}%02d"
        case _: MonthsPart => f"${ld.getYear}%04d-${ld.getMonthValue}%02d"
        case _: YearsPart => f"${ld.getYear}%04d"
      }
    }
  }
}
