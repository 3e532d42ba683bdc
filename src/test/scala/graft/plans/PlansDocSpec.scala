package graft.plans

import graft.{Plans, SparkSpec}

/** Anti-rot guard for PLANS.md: the committed snapshot must match a
  * live render byte-for-byte. Round 8 left PLANS.md showing Window
  * plans for s01–s08 that `PlanShapeSpec` forbids — the repo's plan
  * documentation contradicted its own spec. This spec makes that
  * state impossible: any plan change that isn't followed by
  * `sbt "runMain graft.Plans"` fails the build with a pointer to the
  * first diverging query section. */
class PlansDocSpec extends SparkSpec {

  test("PLANS.md matches live explain output") {
    GraftExtensions.install(spark)
    val live = Plans.render(spark, "/root/testdata/sf0.001")
    val committed = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/PLANS.md")), "UTF-8")
    if (committed != live) {
      // point at the first diverging section so the failure is
      // actionable without a manual diff
      def sections(s: String): Map[String, String] =
        s.split("\n(?=## )").iterator
          .filter(_.startsWith("## "))
          .map { sec =>
            val name = sec.linesIterator.next().stripPrefix("## ")
            (name, sec)
          }.toMap
      val c = sections(committed)
      val l = sections(live)
      val diverged = Plans.planQueries.filter(n =>
        c.get(n) != l.get(n))
      fail("PLANS.md is stale — regenerate with " +
        "`sbt \"runMain graft.Plans\"`. Diverging sections: " +
        (if (diverged.nonEmpty) diverged.mkString(", ")
         else "header/preamble"))
    }
  }
}
