package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{StructField, StructType}

/** Column-name normalization and schema contracts.
  *
  * Reproduces the reference's identifier cleaning (every sink lowercases and
  * maps `' '`, `'-'`, `'.'` to `'_'` — /root/reference/data_extractor.py:304,
  * 352,387-390) and the required-column contract
  * (/root/reference/data_validator.py:148).
  *
  * Scale note: these are schema (metadata) transforms — zero data movement;
  * `df.toDF` only rewrites the plan's output attributes.
  */
object Schemas {

  /** Normalize one identifier: lowercase; ' ', '-', '.' → '_'. */
  def normalizeName(name: String): String =
    name.toLowerCase.replace(' ', '_').replace('-', '_').replace('.', '_')

  /** Normalize all column names of a DataFrame (reference P2/F6). */
  def normalizeColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(normalizeName).toIndexedSeq: _*)

  def normalizeStruct(schema: StructType): StructType =
    StructType(schema.fields.map(f => f.copy(name = normalizeName(f.name))))

  /** Metadata columns injected by every sink in the reference
    * (data_extractor.py:357-358, data_loader.py:426-427).
    */
  val MetadataColumns: Set[String] = Set("loaded_at", "load_date")

  /** Required downstream columns (data_validator.py:148). */
  val RequiredCdcColumns: Set[String] =
    Set("yearstart", "yearend", "locationabbr", "topic", "loaded_at", "load_date")

  /** Column-name set comparison, ignoring injected metadata columns
    * (reference U2, data_extractor.py:296-312).
    */
  def namesMatch(existing: StructType, incoming: StructType): Boolean =
    existing.fieldNames.toSet -- MetadataColumns ==
      incoming.fieldNames.toSet -- MetadataColumns

  /** Missing required fields (empty = pass). Both sides are lowercased —
    * a mixed-case required name must not report a column missing that the
    * (normalized) table actually has.
    */
  def missingRequired(schema: StructType, required: Set[String]): Set[String] =
    required.map(_.toLowerCase) -- schema.fieldNames.map(_.toLowerCase).toSet

  /** Per-column type comparison like the loader's SchemaValidator
    * (data_loader.py:140-177): returns (name, existingType, incomingType)
    * for every shared column whose types differ.
    */
  def typeMismatches(
      existing: StructType,
      incoming: StructType): Seq[(String, String, String)] = {
    val e = existing.fields.map(f => f.name -> f.dataType).toMap
    incoming.fields.flatMap { f =>
      e.get(f.name) match {
        case Some(t) if t != f.dataType =>
          Some((f.name, t.simpleString, f.dataType.simpleString))
        case _ => None
      }
    }.toSeq
  }

  private[engine] def fieldSet(s: StructType): Set[StructField] =
    s.fields.map(f => f.copy(metadata = org.apache.spark.sql.types.Metadata.empty)).toSet
}
