package graft.engine

import org.apache.spark.sql.types.StructType

/** Schema-evolution decision: reproduce the reference's truncate-vs-recreate
  * policy (/root/reference/data_extractor.py:314-377,
  * /root/reference/data_loader.py:199-246):
  *
  *   - table absent                      → CreateNew
  *   - column-name sets match (metadata
  *     columns ignored)                  → Truncate (keep DDL, wipe rows)
  *   - anything else                     → Recreate (drop + create from
  *                                         inferred schema)
  *
  * This is a plain-Scala decision over `StructType`s — not a Catalyst
  * concern. The executor-side equivalent of Truncate/Recreate is an atomic
  * `mode("overwrite")` write (Spark stages new files and commits, so a failed
  * load can't leave a half-replaced table, unlike the reference's
  * replace-then-append chunk loop at data_loader.py:429-433).
  */
object Evolution {

  sealed trait Decision
  /** No existing table: create from the incoming (inferred) schema. */
  case object CreateNew extends Decision
  /** Names match: keep DDL, wipe rows. */
  case object Truncate extends Decision
  /** Names differ: drop and re-create from the incoming schema. */
  case object Recreate extends Decision

  def plan(existing: Option[StructType], incoming: StructType): Decision =
    existing match {
      case None                                   => CreateNew
      case Some(e) if Schemas.namesMatch(e, incoming) => Truncate
      case Some(_)                                => Recreate
    }
}
