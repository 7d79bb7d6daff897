package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, to_json}
import org.apache.spark.sql.types._

/** Sink-side helpers: schema-derived DDL, overwrite/append writers, and the
  * SQL script runner.
  *
  * Reference citations (/root/reference):
  *  - K2 schema→DDL with `*url*`→VARCHAR(2048) widening and nested→SUPER:
  *    `utils/sql_utils.py:20-33`, `s3_to_silver_prov.py:40-45`
  *  - K1 overwrite / K7 append-or-create: `s3_to_silver.py:112`,
  *    `utils/sql_utils.py:84-88` — modeled as parquet SaveModes (the JDBC
  *    target is out of engine scope; `df.write.jdbc` takes the same plan).
  *  - K8 script runner (split on `;`, `{}`-template substitution):
  *    `card_funnel/create_card_funnel_schema.py:12-21`
  */
object SinkDdl {

  /** K2 — map a field to its landing SQL type. `*url*` string columns widen
    * to VARCHAR(2048); nested types land as SUPER (Redshift's semi-
    * structured type in the reference; kept as the DDL-string analog). */
  def sqlType(f: StructField): String = f.dataType match {
    case StringType if f.name.toLowerCase.contains("url") => "VARCHAR(2048)"
    case StringType => "VARCHAR(256)"
    case LongType => "BIGINT"
    case IntegerType | ShortType | ByteType => "INTEGER"
    case DoubleType | FloatType => "DOUBLE PRECISION"
    case BooleanType => "BOOLEAN"
    case TimestampType | TimestampNTZType => "TIMESTAMP"
    case DateType => "DATE"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case _: StructType | _: ArrayType | _: MapType => "SUPER"
    case other => other.sql
  }

  def schemaToDdl(table: String, schema: StructType): String =
    schema.fields.map(f => s""""${f.name}" ${sqlType(f)}""")
      .mkString(s"CREATE TABLE IF NOT EXISTS $table (", ", ", ")")

  /** K1 — overwrite sink (parquet stand-in for the JDBC replace-load). */
  def overwriteParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** K7 — append-or-create (SaveMode.Append subsumes the exists-protocol). */
  def appendParquet(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** Nested columns can't ride a plain JDBC row protocol; serialize them to
    * JSON strings first (the reference lands them in a SUPER column via the
    * same stringify step, `s3_to_silver_prov.py:40-45`). */
  def jdbcReady(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case _: StructType | _: ArrayType | _: MapType =>
          d.withColumn(f.name, to_json(col(f.name)))
        case _ => d
      }
    }

  /** K1/K5 — the reference's actual terminal sink (`s3_to_silver.py:112`
    * `df.to_sql`): a real `df.write.jdbc` path. String columns get the same
    * width policy as [[sqlType]] via `createTableColumnTypes` (restricted to
    * types Spark's DDL parser accepts — numeric/timestamp columns keep the
    * dialect defaults); nested columns are JSON-serialized. Batching is the
    * writer's `batchsize`, which subsumes the reference's hand-chunked
    * INSERT ladder (`utils/sql_utils.py:84-140`). */
  def writeJdbc(df: DataFrame, url: String, table: String,
                props: java.util.Properties = new java.util.Properties,
                mode: SaveMode = SaveMode.Overwrite): Unit = {
    val ready = jdbcReady(df)
    // width policy comes from the ORIGINAL schema through the ONE rule
    // ([[sqlType]] — previously an inline copy that could silently
    // diverge): only originally-string columns get bounded VARCHARs. A
    // column [[jdbcReady]] JSON-serialized from a nested type keeps the
    // dialect's unbounded string default (Derby CLOB — the SUPER analog):
    // a 1 KB serialized struct must not hit a VARCHAR(256) wall.
    val overrides = df.schema.fields.collect {
      case f if f.dataType == StringType => s"${f.name} ${sqlType(f)}"
    }.mkString(", ")
    val w = ready.write.mode(mode).option("batchsize", 1000)
    (if (overrides.nonEmpty) w.option("createTableColumnTypes", overrides)
     else w).jdbc(url, table, props)
  }

  /** Execute one non-query statement over a raw JDBC connection (the
    * engine-side DELETE/DDL a JDBC sink needs around `df.write.jdbc`). */
  def execJdbc(url: String, sqlText: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute(sqlText) finally st.close()
    } finally conn.close()
  }

  /** Probe a JDBC-side table's existence (zero-row SELECT; any SQLException
    * means absent — the INFORMATION_SCHEMA probe of `sql_utils.py:41-45`
    * without dialect-specific catalog queries). */
  def jdbcTableExists(url: String, table: String): Boolean = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try { st.executeQuery(s"SELECT 1 FROM $table WHERE 1=0").close(); true }
      catch { case _: java.sql.SQLException => false }
      finally st.close()
    } finally conn.close()
  }

  /** K3 — drop-if-exists (`sql_utils.py:15-17`). */
  def dropTable(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")

  /** K4 — table-exists probe (`sql_utils.py:41-45`, INFORMATION_SCHEMA
    * count → catalog lookup). */
  def tableExists(spark: SparkSession, table: String): Boolean =
    spark.catalog.tableExists(table)

  /** Drop a managed table AND its warehouse location — the in-memory
    * catalog forgets tables across JVMs while their directories persist,
    * so a bare saveAsTable from a fresh session would hit
    * LOCATION_ALREADY_EXISTS. The location is removed through the Hadoop
    * FS API so ANY warehouse scheme works (round-7 review: the previous
    * java.nio form only handled file: warehouses, and the gold-schema
    * build carried its own divergent hadoop-FS copy — this is now the ONE
    * implementation). Spark stores managed tables under the LOWERCASED
    * name; both spellings are removed defensively. */
  def dropManagedTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(table, table.toLowerCase).distinct.foreach { t =>
      fs.delete(new org.apache.hadoop.fs.Path(warehouse, t), true)
    }
  }

  /** K8 — run a `;`-separated SQL script with `{key}` substitution. */
  def runSqlScript(spark: SparkSession, script: String,
                   subst: Map[String, String] = Map.empty): Seq[DataFrame] = {
    val filled = subst.foldLeft(script) { case (s, (k, v)) =>
      s.replace(s"{$k}", v)
    }
    filled.split(";").map(_.trim).filter(_.nonEmpty).toSeq
      .map(spark.sql)
  }
}
