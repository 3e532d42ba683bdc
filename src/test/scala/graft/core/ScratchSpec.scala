package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Disk-bounding contract of [[Scratch]]: fresh unique dirs, at most
  * one live dir per prefix per thread, independent prefixes and other
  * threads' dirs untouched. */
class ScratchSpec extends AnyFunSuite {

  test("a new same-prefix dir deletes the previous one; other " +
      "prefixes are untouched") {
    val a1 = Scratch.dir("graft_scratch_spec_a")
    val b1 = Scratch.dir("graft_scratch_spec_b")
    assert(new java.io.File(a1).isDirectory)
    assert(new java.io.File(b1).isDirectory)
    val a2 = Scratch.dir("graft_scratch_spec_a")
    assert(a2 != a1, "dirs must be unique per invocation")
    assert(!new java.io.File(a1).exists(),
      "previous same-prefix dir must be deleted on re-registration")
    assert(new java.io.File(a2).isDirectory)
    assert(new java.io.File(b1).isDirectory,
      "a different prefix must not be swept")
  }

  test("previous dir deletion is recursive") {
    val d1 = Scratch.dir("graft_scratch_spec_rec")
    val nested = new java.io.File(d1, "x/y")
    assert(nested.mkdirs())
    java.nio.file.Files.write(
      nested.toPath.resolve("f.txt"), "data".getBytes)
    Scratch.dir("graft_scratch_spec_rec")
    assert(!new java.io.File(d1).exists())
  }

  test("a same-prefix dir registered by ANOTHER thread is never " +
      "eagerly deleted (it may be live — parallel suites)") {
    val prefix = "graft_scratch_spec_xthread"
    var other: String = null
    val t = new Thread(() => { other = Scratch.dir(prefix) })
    t.start(); t.join()
    assert(new java.io.File(other).isDirectory)
    val mine = Scratch.dir(prefix)
    assert(new java.io.File(other).isDirectory,
      "another thread's same-prefix dir must survive registration")
    // Same-thread re-registration still bounds disk: it deletes the
    // dir THIS thread registered, not the other thread's.
    val mine2 = Scratch.dir(prefix)
    assert(!new java.io.File(mine).exists(),
      "own previous same-prefix dir must be deleted")
    assert(new java.io.File(mine2).isDirectory)
    assert(new java.io.File(other).isDirectory,
      "the other thread's dir must still survive")
  }

  test("another thread registering BETWEEN two same-prefix " +
      "registrations does not untrack the first (per-thread keying)") {
    val prefix = "graft_scratch_spec_interleave"
    val a1 = Scratch.dir(prefix)
    var other: String = null
    val t = new Thread(() => { other = Scratch.dir(prefix) })
    t.start(); t.join()
    // Under prefix-only keying the other thread's registration
    // evicted a1 from tracking, so this call left a1 alive until JVM
    // exit; per-(prefix, thread) keying deletes it eagerly.
    val a2 = Scratch.dir(prefix)
    assert(!new java.io.File(a1).exists(),
      "own previous dir must be eagerly deleted even when another " +
        "thread registered in between")
    assert(new java.io.File(other).isDirectory)
    assert(new java.io.File(a2).isDirectory)
  }
}
