package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Cache lifecycle for operator-internal persists.
 *
 * Several composed operators (MinHash dedup, LSH near-dup, k-means,
 * vocabulary build) persist intermediate frames because one frame feeds
 * several sub-plans or an iterative lineage. Those frames are
 * implementation details the caller never sees, so the caller cannot
 * unpersist them — without a lifecycle they accumulate MEMORY_AND_DISK
 * blocks for the life of the session and evict useful cache at scale.
 *
 * The contract:
 *  - operators persist internals through [[Caching.persist]];
 *  - a caller that wants deterministic release wraps the ACTION (not
 *    just the plan construction) in [[Caching.scoped]] — every internal
 *    frame persisted while the scope is open is unpersisted when it
 *    closes;
 *  - with no scope open the behavior is exactly `df.persist(level)`
 *    (caller owns the session cache — the pre-existing contract, which
 *    `Bench` satisfies with `catalog.clearCache()` per run).
 *
 * Scopes nest (inner scopes release only their own frames) and are
 * per-thread: plan construction and the action happen on the calling
 * thread, so a thread-local stack is the right registry — concurrent
 * queries on other threads never release each other's frames.
 */
object Caching {

  private val scopes = new ThreadLocal[List[ArrayBuffer[DataFrame]]] {
    override def initialValue(): List[ArrayBuffer[DataFrame]] = Nil
  }

  /** Persist `df` at `level`, registering it with the innermost open
    * scope (if any) for release when the scope closes. */
  def persist(
      df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    df.persist(level)
    scopes.get() match {
      case head :: _ => head += df
      case Nil       =>
    }
    df
  }

  /** Release a frame persisted via [[persist]] BEFORE its scope closes —
    * for iterative operators whose superseded iterations should free
    * memory immediately (the new iteration's frame stays registered). */
  def release(df: DataFrame): Unit = df.unpersist(blocking = false)

  /** Is a [[scoped]] block open on this thread? */
  def hasScope: Boolean = scopes.get().nonEmpty

  /** Loud form of the scoped-only contract: an operator whose cache
    * lifecycle CANNOT be self-contained (an iterative lineage, or a
    * composition registering MULTIPLE corpus-scale persists that must
    * outlive the method and be released only after the caller's
    * action) calls this instead of documenting-and-hoping. Leaking N
    * corpus-scale frames per call is a scale bug a caller will not
    * notice locally; failing at construction is the API-level assert
    * the contract needs. Single-persist operators keep the documented
    * no-scope fallback above (one spillable frame, the pre-existing
    * `df.persist` contract); every method registering more than one
    * outliving persist asserts a scope. */
  def requireScope(op: String): Unit =
    if (!hasScope) throw new IllegalStateException(
      s"$op registers iteration caches that only a Caching.scoped block " +
        "can release — wrap the consuming action in graft.Caching.scoped { ... }")

  /** Run `body` with NO scope visible on this thread — the legacy
    * no-scope contract — restoring the caller's scope stack after.
    * This is the TEST hook for pinning [[requireScope]] failure modes
    * from inside a scoped harness (every ScalaTest body runs under a
    * suite-level scope); production callers have no use for it. */
  def unscoped[T](body: => T): T = {
    val saved = scopes.get()
    scopes.set(Nil)
    try body
    finally scopes.set(saved)
  }

  /** Register an ALREADY-persisted frame with the innermost open scope
    * (for operators that must materialize a frame before deciding it
    * outlives the method). No-op with no scope open. */
  def adopt(df: DataFrame): DataFrame = {
    scopes.get() match {
      case head :: _ => head += df
      case Nil       =>
    }
    df
  }

  /** Run `body` (typically plan construction PLUS the action consuming
    * it) and unpersist every operator-internal frame persisted during
    * it. Returns `body`'s result. */
  def scoped[T](body: => T): T = {
    scopes.set(ArrayBuffer.empty[DataFrame] :: scopes.get())
    try body
    finally {
      val head :: rest = scopes.get(): @unchecked
      scopes.set(rest)
      head.foreach(_.unpersist(blocking = false))
    }
  }
}
