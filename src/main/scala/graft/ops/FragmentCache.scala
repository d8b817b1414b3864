package graft.ops

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.graftbridge.Bridge

/** I25 — session-scoped materialized-fragment reuse: when several
  * queries in one session share an expensive, parameter-identical
  * sub-plan (the BM25 content-scored frame feeds both the standalone
  * `q_bm25` ranking and the E49 hybrid-fusion feeder), the fragment is
  * computed once, `localCheckpoint`ed, and served to every consumer —
  * the DataFrame-level analogue of a materialized common subexpression
  * (Spark's own exchange reuse only fires within a single query DAG,
  * never across separate actions).
  *
  * Keys combine the application id, a REGISTERED per-session UUID
  * (identity-keyed, so two live sessions can never collide the way
  * `identityHashCode` could), a caller tag carrying every tuning
  * parameter, and the `semanticHash` of the input plan — a different
  * source path, session, or knob value is a different fragment.
  *
  * Only bounded frames belong here (content-sized contractions,
  * workload-sized scorings); corpus-sized frames must stay streaming.
  * That contract is now CHECKED, not just commented: every insert
  * row-counts the checkpointed fragment and rejects anything over
  * `maxRows`. Eviction is explicit — [[evictSession]] (or [[clear]])
  * unpersists the checkpoint blocks immediately rather than waiting
  * for the ContextCleaner. Note the side effect callers accept: the
  * FIRST consumer of a fragment runs a Spark job at DataFrame
  * CONSTRUCTION time (eager checkpoint + the bound count), not at its
  * own first action.
  */
object FragmentCache {

  /** Insert-time ceiling on fragment size. Fragments are content- or
    * workload-sized by contract — 50M rows is far above any legitimate
    * fragment and far below corpus scale, so tripping this means a
    * corpus-sized frame was about to be pinned in executor memory. */
  val MaxFragmentRows: Long = 50000000L

  /** One slot per key; the build runs under the slot's own lock, so a
    * concurrent first use blocks on the winner instead of materializing
    * (and orphaning) a second checkpoint. */
  private final class Slot(key: String, maxRows: Long,
                           build: () => DataFrame) {
    private var materialized: DataFrame = _
    def df: DataFrame = synchronized {
      if (materialized == null) {
        val out = build().localCheckpoint(true)
        val n = out.count()
        if (n > maxRows) {
          Bridge.checkpointRdd(out).foreach(_.unpersist(false))
          throw new IllegalStateException(
            s"FragmentCache: fragment '$key' has $n rows (max $maxRows). " +
              "Only bounded (content/workload-sized) frames may be " +
              "cached; corpus-sized frames must stay streaming.")
        }
        materialized = out
      }
      materialized
    }
    def drop(): Unit = synchronized {
      if (materialized != null) {
        Bridge.checkpointRdd(materialized).foreach(_.unpersist(false))
        materialized = null
      }
    }
  }

  private val frames =
    scala.collection.concurrent.TrieMap.empty[String, Slot]

  // WeakHashMap keys by identity (SparkSession keeps reference equals):
  // a stable UUID per live session, GC-collectable with the session.
  private val sessionIds =
    new java.util.WeakHashMap[SparkSession, String]

  private def sessionId(spark: SparkSession): String =
    sessionIds.synchronized {
      val got = sessionIds.get(spark)
      if (got != null) got
      else {
        val id = UUID.randomUUID().toString
        sessionIds.put(spark, id)
        id
      }
    }

  private def keyPrefix(spark: SparkSession): String =
    spark.sparkContext.applicationId + ":" + sessionId(spark) + ":"

  /** Serve the fragment for `tag` over `input`, computing + eagerly
    * checkpointing it on first use. `build` must be a pure function of
    * `input` and the parameters encoded in `tag`. */
  def materialize(spark: SparkSession, input: DataFrame, tag: String,
                  maxRows: Long = MaxFragmentRows)
                 (build: => DataFrame): DataFrame = {
    val key = keyPrefix(spark) + tag + ":" +
      input.queryExecution.analyzed.semanticHash()
    // getOrElseUpdate may race two Slot allocations but inserts one;
    // Slots are inert until .df, so the loser is garbage, not an
    // orphaned checkpoint.
    val slot = frames.getOrElseUpdate(key, new Slot(key, maxRows, () => build))
    try slot.df
    catch {
      case e: Throwable =>
        // a failed build (or bound violation) must not pin the slot —
        // the next caller deserves a fresh attempt with ITS parameters
        frames.remove(key, slot)
        throw e
    }
  }

  /** Evict every fragment owned by `spark`, unpersisting checkpoint
    * blocks immediately. Call when retiring a session whose JVM (and
    * application) lives on. */
  def evictSession(spark: SparkSession): Unit = {
    val prefix = keyPrefix(spark)
    frames.keys.filter(_.startsWith(prefix))
      .foreach(k => frames.remove(k).foreach(_.drop()))
  }

  /** Drop every fragment (all sessions), unpersisting eagerly. */
  def clear(): Unit =
    frames.keys.foreach(k => frames.remove(k).foreach(_.drop()))
}
