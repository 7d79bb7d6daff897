package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level cleansing/typing helpers — the reference's per-feed scalar
  * transforms re-expressed as Catalyst column expressions (all codegen'd
  * built-ins, no UDFs — see SURVEY.md §2.8/§2.10 design rule).
  *
  * Reference citations (/root/reference):
  *  - null-filter + cast:        `card_funnel/emails_import.py:22-24`
  *  - ISO ts parse, tz-strip:    `card_funnel/emails_import.py:26-29`
  *  - epoch-seconds parse:       `card_funnel/emails_import_mailgun.py:28`
  *  - epoch-millis parse:        `card_funnel/emails_import_mongo.py:42`
  *  - event-time lower bound:    `card_funnel/emails_import.py:27`
  *  - IN / NOT-IN filters:       `emails_import_mongo.py:41`, `kafka_s3_to_silver.py:32`
  *  - array-overlap tag filter:  `card_funnel/emails_import_mailgun.py:22-26`
  *  - JSON parse / serialize:    `emails_import_mongo.py:16-19`, `s3_to_silver_prov.py:47-48`
  *  - date formatting:           `utils/sql_utils.py:66`
  *  - string escape chains:      `utils/sql_utils.py:59-63`
  */
object Cleanse {

  /** P3 — drop rows where `c` is null, cast survivors to `to`. */
  def filterNotNullCast(df: DataFrame, c: String, to: DataType): DataFrame =
    df.filter(col(c).isNotNull).withColumn(c, col(c).cast(to))

  /** P4 — ISO string → timestamp (session tz pinned UTC ⇒ tz-naive). */
  def parseIso(c: Column): Column = to_timestamp(c)

  /** P5 / P6 — epoch seconds / millis → timestamp. */
  def fromEpochSeconds(c: Column): Column = timestamp_seconds(c)
  def fromEpochMillis(c: Column): Column = timestamp_millis(c)

  /** P7 — event-time lower bound (batch twin of a watermark). */
  def filterSince(df: DataFrame, ts: String, isoDate: String): DataFrame =
    df.filter(col(ts) >= to_timestamp(lit(isoDate)))

  /** P8 / P9 — membership filters. */
  def filterIsIn(df: DataFrame, c: String, values: Seq[String]): DataFrame =
    df.filter(col(c).isin(values: _*))
  def filterNotIsIn(df: DataFrame, c: String, values: Seq[String]): DataFrame =
    df.filter(!col(c).isin(values: _*))

  /** P10 — "any element of array column ∈ set" (tag relevance filter). */
  def arrayOverlaps(c: Column, values: Seq[String]): Column =
    arrays_overlap(c, array(values.map(lit): _*))

  /** P11 — parse a JSON-string column with an explicit schema. */
  def parseJson(c: Column, schema: DataType): Column = from_json(c, schema)

  /** P15 — reference's `strftime('%b %d,%Y %H:%M:%S')`. */
  def referenceDateFormat(c: Column): Column =
    date_format(c, "MMM dd,yyyy HH:mm:ss")

  /** P16 — the reference's literal-SQL escape chain (`'`→CHR(39), `%`→`%%`),
    * kept as a scalar-expression demo; parameterized writes obsolete it. */
  def sqlLiteralEscape(c: Column): Column =
    regexp_replace(regexp_replace(c, "'", "CHR(39)"), "%", "%%")

  /** Money-safe arithmetic: cast to exact decimal BEFORE +-*, so Spark and
    * any ANSI engine (the DuckDB oracle included) agree bit-for-bit. */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Deterministic microsecond-precision string form of a timestamp —
    * used at output boundaries so oracle comparison is representation-proof. */
  def tsStr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
  def dateStr(c: Column): Column = date_format(c, "yyyy-MM-dd")
}
