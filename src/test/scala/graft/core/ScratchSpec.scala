package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Disk-bounding contract of [[Scratch]]: fresh unique dirs, at most
  * one live dir per prefix per JVM, independent prefixes untouched. */
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
}
