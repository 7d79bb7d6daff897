package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-format scans — the reference's five S3 ingestion shapes
  * re-expressed over Spark's native readers (no custom DataSource needed;
  * SURVEY.md §2.1).
  *
  * Reference citations (/root/reference):
  *  - S1 parquet:          `utils/s3_utils.py:13-28`
  *  - S2 multiline JSON:   `utils/s3_utils.py:59-62` + `s3_to_silver.py:101-110`
  *  - S3 NDJSON:           `utils/s3_utils.py:65-70`
  *  - S4 double-encoded:   `utils/s3_utils.py:73-78` (each line is a JSON
  *                         *string literal* whose content is the event JSON)
  *  - S5 Kafka envelope:   `card_funnel/kafka_s3_to_silver.py:8-11`
  *  - S6 pruned file scan: `utils/s3_utils.py:81-87` (prefix+regex+mtime)
  */
object Sources {

  /** S1 — parquet scan; task retry replaces the reference's retry ladder. */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** S10 — schema-evolution scan: parquet written over time with columns
    * added/dropped between generations, read as one dataset. `mergeSchema`
    * unions footer schemas by name (absent columns → typed nulls); pushdown
    * and pruning still work per file because each footer keeps its own
    * physical schema. */
  def readParquetMerged(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.option("mergeSchema", true).parquet(paths: _*)

  /** S2 — one whole JSON document (object or array) per file. */
  def readJsonMultiline(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", true).json(path)

  /** S3 — newline-delimited JSON from files. */
  def readNdjson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** S3 — newline-delimited JSON already held as a Dataset of lines
    * (e.g. the value column of a Kafka batch). With no schema Spark runs an
    * extra inference pass over the data; at scale callers should pass the
    * declared schema so the read is single-pass. */
  def readNdjsonLines(lines: Dataset[String],
                      schema: Option[StructType] = None): DataFrame = {
    val r = lines.sparkSession.read
    schema.fold(r)(s => r.schema(s)).json(lines)
  }

  /** S4 — double-encoded NDJSON: each line is a JSON string literal
    * containing the real JSON. Decode the outer literal with `from_json`
    * (wrapping it into `{"v": <line>}` so the string type is reachable),
    * then parse the inner document. Both passes are Spark-native; no UDF.
    */
  def readDoubleEncodedJson(lines: Dataset[String],
                            schema: Option[StructType] = None): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    // normalize the column name: a Dataset[String] arriving from a select
    // of an arbitrarily-named column is just as legal as one from .as[String]
    // on a "value" frame (the sibling readNdjsonLines accepts both)
    val inner: Dataset[String] = lines.toDF("value")
      .select(from_json(concat(lit("{\"v\":"), col("value"), lit("}")),
        StructType(Seq(StructField("v", StringType)))).getField("v").as("v"))
      .as[String]
    // with no declared schema, read.json adds a full INFERENCE pass that
    // re-executes the whole upstream decode chain — fine for exploration,
    // wrong as a recurring 100 TB ingestion plan; production callers pass
    // the landing contract's schema and the decode is one pass
    schema match {
      case Some(s) => spark.read.schema(s).json(inner)
      case None => spark.read.json(inner)
    }
  }

  /** S5 — Kafka-envelope NDJSON (`topic,partition,offset,key,value`):
    * parse, then project the payload fields alongside the envelope,
    * exactly like the reference's `pd.concat([df, normalize(value)])`. */
  def readKafkaEnvelope(lines: Dataset[String],
                        payloadSchema: Option[StructType] = None): DataFrame = {
    val schema = payloadSchema.map(p => StructType(Seq(
      StructField("topic", StringType), StructField("partition", LongType),
      StructField("offset", LongType), StructField("key", StringType),
      StructField("value", p))))
    val df = readNdjsonLines(lines, schema)
    df.select((df.columns.toIndexedSeq.filterNot(_ == "value").map(col) :+
      col("value.*")): _*)
  }

  /** S8 — ORC scan: the other columnar format a lake commonly holds; same
    * pushdown/pruning machinery as parquet. */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S9 — CSV with a declared schema in PERMISSIVE mode: malformed rows
    * land whole in the corrupt-record column instead of killing a 100 TB
    * scan; well-formed rows parse normally. Callers split on
    * `_corrupt_record IS NULL` to route rows to the silver table vs the
    * quarantine sink. */
  def readCsvPermissive(lines: Dataset[String],
                        schema: StructType): DataFrame =
    lines.sparkSession.read
      .schema(schema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(lines)

  /** S6 — directory scan pruned by filename glob and modification time;
    * Spark's file index does the pruning before any bytes are read. */
  def readPrunedNdjson(spark: SparkSession, dir: String, glob: String,
                       modifiedAfter: Option[String] = None): DataFrame = {
    val r = spark.read.option("pathGlobFilter", glob)
    modifiedAfter.fold(r)(m => r.option("modifiedAfter", m)).json(dir)
  }
}
