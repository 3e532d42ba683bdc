package graft.core

/** Process-unique scratch directories for queries that must persist
  * intermediate state to disk (the lifecycle gates' lakes, s09's
  * persisted ANN index).
  *
  * Two invariants this utility exists to hold:
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
  *   2. CLEANUP — a shutdown hook deletes every registered dir, so
  *      repeated Verify/Bench runs don't leak corpus-sized parquet
  *      into java.io.tmpdir. In-query deletion is impossible for
  *      dirs that must outlive a returned lazy DataFrame; process
  *      exit is the earliest safe point.
  */
object Scratch {

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Register `dir` for recursive deletion at JVM exit (idempotent). */
  def deleteOnExit(dir: String): Unit =
    if (registered.add(dir))
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(new java.io.File(dir))
      }))

  /** A fresh scratch dir under java.io.tmpdir, deleted at JVM exit. */
  def dir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toString
    deleteOnExit(d)
    d
  }
}
