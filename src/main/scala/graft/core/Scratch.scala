package graft.core

/** Process-unique scratch directories for queries that must persist
  * intermediate state to disk (the lifecycle gates' lakes, s09's
  * persisted ANN index).
  *
  * Invariants this utility exists to hold:
  *
  *   1. UNIQUENESS — every call gets a fresh directory
  *      (`Files.createTempDirectory`: process + counter unique), so
  *      two invocations of the same query can NEVER clobber each
  *      other's state. A fixed well-known path cannot give this: a
  *      `sbt test` JVM running a lifecycle gate at one fixture
  *      concurrently with a `Verify` JVM running it at another
  *      interleaves `fs.delete` + writes on the shared path, and the
  *      surviving dump is a silent mixture of the two fixtures
  *      (observed as a 10x-gate hash mismatch whose 2009 partitions
  *      carried sf0.001-density rows — two JVMs, one path).
  *   2. BOUNDED DISK — at most ONE live dir per prefix per THREAD:
  *      when a new invocation of the same gate registers from the
  *      same thread, the previous same-prefix dir is deleted
  *      immediately. Same-thread sequential re-invocation is the ONLY
  *      case where eager deletion is provably safe without a caller
  *      contract: the thread has returned from the prior invocation,
  *      and every gate materializes its result before returning — so
  *      the prior dir cannot still feed a live frame. A previous dir
  *      registered by a DIFFERENT thread may belong to a concurrently
  *      running suite (exactly the data-mixing class invariant 1
  *      guards against), so it is left alone and swept by the exit
  *      hook instead. The bounded-disk case that motivated this —
  *      bench reps and multi-fixture Verify re-running one gate in a
  *      long-lived JVM — is single-threaded, so it still holds.
  *   3. CLEANUP — one shared shutdown hook (not a thread per dir)
  *      deletes every still-registered dir at JVM exit. In-query
  *      deletion is impossible for dirs that must outlive a returned
  *      lazy DataFrame; process exit is the earliest safe point for
  *      the LAST dir of each prefix. A SIGKILL/OOM skips the hook
  *      and leaks the live dirs — unavoidable without cross-process
  *      coordination (a reaper that swept same-prefix dirs at
  *      startup would delete a CONCURRENT JVM's live state, the
  *      exact corruption invariant 1 exists to prevent); stale
  *      `graft_*` dirs under java.io.tmpdir after a kill must be
  *      removed manually.
  */
object Scratch {

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  // Keyed by (prefix, threadId), not prefix alone: with a shared
  // prefix key, thread B registering between two registrations by
  // thread A evicts A's entry, leaving A's earlier dir untracked —
  // never eagerly deleted, only swept at JVM exit. Per-thread keys
  // make invariant 2 ("at most ONE live dir per prefix per THREAD")
  // exact under any interleaving.
  private val lastByPrefix =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), String]()
  @volatile private var hookInstalled = false

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete(): Unit
  }

  private def installHook(): Unit =
    if (!hookInstalled) synchronized {
      if (!hookInstalled) {
        Runtime.getRuntime.addShutdownHook(new Thread(() =>
          registered.forEach(d => rm(new java.io.File(d)))))
        hookInstalled = true
      }
    }

  /** Register `dir` for recursive deletion at JVM exit (idempotent). */
  def deleteOnExit(dir: String): Unit = {
    installHook()
    registered.add(dir): Unit
  }

  /** A fresh scratch dir under java.io.tmpdir, deleted at JVM exit.
    * The previous dir created under the same prefix BY THIS THREAD
    * (if any) is deleted now — see invariant 2; a same-prefix dir
    * from another thread lives under a different map key and is
    * never touched (it may be live). The `registered.remove` guard
    * makes the delete single-shot even if the exit hook races it. */
  def dir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toString
    deleteOnExit(d)
    val me = Thread.currentThread().getId
    val prev = lastByPrefix.put((prefix, me), d)
    if (prev != null && registered.remove(prev))
      rm(new java.io.File(prev))
    d
  }
}
