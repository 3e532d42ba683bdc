package graft.cdc

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Atomic delivery of binlog dump files into a directory watched by
  * [[graft.streaming.StreamOps.streamEvents]].
  *
  * CONTRACT: a file must become visible to the stream ATOMICALLY, with
  * its FINAL modification time. Spark's file source tracks the newest
  * mtime it has ever listed and ignores files older than
  * `latest - maxFileAge` (default 7 days, `SeenFilesMap.purge`). A
  * writer that creates the file in place and fixes its mtime
  * afterwards (`Files.write` → `setLastModified`) races the source's
  * continuously-polling trigger: if a listing lands in the gap, the
  * source records the transient creation mtime as `latest`, and every
  * subsequent file whose real mtime is older than that minus
  * maxFileAge is silently dropped — observed as the c16 gate's
  * kill-day batch never applying under a loaded scheduler.
  *
  * The reference delivers dumps the same way for the same reason:
  * `parse_binlogs.sh:146-151` rsyncs to a temp name and renames into
  * the consumed path. Here: write hidden (`.name.tmp` — the source's
  * listing filters dot-files), stamp the mtime, then `rename(2)` into
  * place (same directory ⇒ same filesystem ⇒ atomic; rename preserves
  * mtime).
  */
object BinlogFiles {

  /** Drop `text` as `mysql-bin.NNNNNN` (the mysqlbinlog naming
    * convention [[graft.streaming.StreamOps.streamEvents]] derives
    * seq windows from) into `dir`, visible atomically with `mtime`. */
  def drop(dir: String, num: Long, text: String, mtime: Long): Unit = {
    val name = f"mysql-bin.$num%06d"
    val tmp = Paths.get(dir, s".$name.tmp")
    Files.write(tmp, text.getBytes("UTF-8"))
    // Fail loudly if the filesystem rejects the stamp: renaming a
    // file that kept its creation mtime silently breaks the
    // ascending-mtime and maxFileAge contracts this class upholds.
    require(tmp.toFile.setLastModified(mtime),
      s"setLastModified($mtime) failed for $tmp — " +
        "filesystem cannot uphold the binlog mtime contract")
    Files.move(tmp, Paths.get(dir, name),
      StandardCopyOption.ATOMIC_MOVE): Unit
  }
}
