package graft.sources

import org.apache.spark.sql.SparkSession

/** B45 — the ALTER TABLE SQL skin over the AtomicMart DDL API
  * (VERDICT r12 #8): platform consumers hand schema migrations around
  * as SQL strings, so the engine accepts the three lake-standard
  * statements (Delta's public `ALTER TABLE` column surface) and maps
  * them onto the SAME engine calls the API contract uses — the skin
  * adds zero new semantics, so every guard (reserved `_gc<id>` names,
  * burned-name tombstones, schema-basis TOCTOU refusal, column-mapping
  * auto-enable on first rename) holds identically whether a migration
  * arrives as a string or a call.
  *
  * Grammar (case-insensitive keywords; the table reference is the
  * AtomicMart root path, single-quoted if it contains whitespace):
  *
  * {{{
  * ALTER TABLE <path> RENAME COLUMN <name> TO <name>
  * ALTER TABLE <path> ADD COLUMN <name> <ddl-type>
  * ALTER TABLE <path> DROP COLUMN <name>
  * VACUUM <path> [RETAIN <n> VERSIONS]
  * OPTIMIZE <path>
  * }}}
  *
  * `<ddl-type>` is any Spark DDL type string (validated eagerly by
  * [[AtomicMart.addColumn]] via `StructType.fromDDL`, so `DECIMAL(38,0)`
  * etc. work — and constrained there to exactly ONE field, so a type
  * string cannot smuggle extra columns past the per-name guards).
  * Anything else — including multi-statement input — is REFUSED loudly
  * rather than partially interpreted (the F33 reject-don't-degrade
  * rule): a migration string the engine cannot execute exactly must
  * never half-run.
  *
  * The two maintenance statements (VERDICT r13 #6) map onto the engine
  * maintenance API with its SAFE defaults: `VACUUM` keeps the last n
  * versions (default 1) and always leaves the 24 h concurrent-writer
  * grace window in force — the skin deliberately has NO syntax for
  * `graceMs=0`, because "I know no writer is live" is an operator
  * assertion that belongs on the API call, not in a migration string.
  * Delta's time-based `RETAIN 168 HOURS` shape is refused whole rather
  * than lossily mapped: this engine's retention contract is
  * version-count, and a silent unit reinterpretation is exactly what
  * F33 forbids. `OPTIMIZE` is [[AtomicMart.compact]] under the
  * manifest — a new committed version with identical rows.
  */
object MartSql {

  private val Ident = "[A-Za-z_][A-Za-z0-9_]*"
  private val TableRef = "'([^']+)'|([^\\s;']+)"

  private val Rename =
    s"(?is)\\s*ALTER\\s+TABLE\\s+(?:$TableRef)\\s+RENAME\\s+COLUMN\\s+($Ident)\\s+TO\\s+($Ident)\\s*;?\\s*".r
  private val Add =
    s"(?is)\\s*ALTER\\s+TABLE\\s+(?:$TableRef)\\s+ADD\\s+COLUMN\\s+($Ident)\\s+(.+?)\\s*;?\\s*".r
  private val Drop =
    s"(?is)\\s*ALTER\\s+TABLE\\s+(?:$TableRef)\\s+DROP\\s+COLUMN\\s+($Ident)\\s*;?\\s*".r
  private val Vacuum =
    s"(?is)\\s*VACUUM\\s+(?:$TableRef)(?:\\s+RETAIN\\s+(\\d+)\\s+VERSIONS)?\\s*;?\\s*".r
  private val Optimize =
    s"(?is)\\s*OPTIMIZE\\s+(?:$TableRef)\\s*;?\\s*".r

  private def path(quoted: String, bare: String): String =
    if (quoted != null) quoted else bare

  /** Execute one statement; returns the table's committed version
    * after it (VACUUM commits nothing — it returns the unchanged
    * head, having moved only the readability horizon). */
  def exec(spark: SparkSession, sql: String): Long = sql match {
    case Rename(q, b, from, to) => AtomicMart.renameColumn(spark, path(q, b), from, to)
    case Add(q, b, name, ddlType) => AtomicMart.addColumn(spark, path(q, b), name, ddlType)
    case Drop(q, b, name) => AtomicMart.dropColumn(spark, path(q, b), name)
    case Vacuum(q, b, n) =>
      val p = path(q, b)
      // engine guard (retainLast >= 1) fires before any deletion; the
      // 24 h grace default stays in force — see the contract above
      AtomicMart.vacuum(spark, p, retainLast = if (n == null) 1 else n.toInt)
      AtomicMart.currentVersion(spark, p).getOrElse(
        throw new IllegalArgumentException(s"no committed version at $p"))
    case Optimize(q, b) => AtomicMart.compact(spark, path(q, b))
    case _ => throw new IllegalArgumentException(
      "unsupported statement — the mart SQL surface accepts exactly: " +
        "ALTER TABLE <path> RENAME COLUMN a TO b | ADD COLUMN a <type> | " +
        "DROP COLUMN a | VACUUM <path> [RETAIN n VERSIONS] | " +
        s"OPTIMIZE <path> (got: ${sql.trim.take(120)})")
  }
}
