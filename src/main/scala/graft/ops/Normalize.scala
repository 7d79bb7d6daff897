package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structural normalization: struct flattening with collision-prefixing,
  * column-name sanitization, empty-container-to-null.
  *
  * Reference semantics (cited from /root/reference):
  *  - `utils/df_utils.py:4-14` (normalize_df): each listed struct column is
  *    expanded into top-level columns named after its fields; when a field
  *    name collides with an existing column the new column is prefixed
  *    `{struct}_{field}`; the original struct column is dropped.
  *  - `card_funnel/emails_import.py:36-37`, `emails_import_mongo.py:55-56`:
  *    column names lower-cased, `.`/`-` replaced with `_`, `$` stripped.
  *  - `utils/sql_utils.py:56`: empty list/dict values become null.
  */
object Normalize {

  /** P1 — flatten the given struct columns, prefixing only colliding names. */
  def flattenStruct(df: DataFrame, structCols: Seq[String]): DataFrame =
    structCols.foldLeft(df) { (cur, c) =>
      val fields = cur.schema(c).dataType match {
        case s: StructType => s.fieldNames.toSeq
        case other => sys.error(s"flattenStruct: $c is ${other.simpleString}, not struct")
      }
      val keep = cur.columns.filterNot(_ == c)
      val existing = keep.toSet
      val expanded = fields.map { f =>
        val name = if (existing.contains(f)) s"${c}_$f" else f
        col(s"`$c`.`$f`").as(name)
      }
      cur.select(keep.toIndexedSeq.map(n => col(s"`$n`")) ++ expanded: _*)
    }

  /** P2 — lower-case, `.`/`-`/space → `_`, strip `$` (Mongo `$date` style). */
  def sanitizeName(n: String): String =
    n.toLowerCase.replaceAll("[.\\- ]", "_").replace("$", "")

  def sanitizeColumnNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(sanitizeName).toIndexedSeq: _*)

  /** P13 — empty array column → null (mirrors `len(x)==0 -> NaN`). */
  def nullIfEmptyArray(df: DataFrame, c: String): DataFrame =
    df.withColumn(c, when(size(col(c)) === 0, lit(null)).otherwise(col(c)))
}
