package graft.llm

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Winnow

/** Winnowing fingerprint selection (t34) and the DSIR Gumbel-top-k
  * resample (t35): kernel-vs-model property checks plus the paper
  * guarantees the operators are used for. */
class WinnowResampleSpec extends SparkSpec {

  import spark.implicits._

  /** Independent brute-force model of the winnow spec: every window
    * of w consecutive hashes (one whole-array window when n <= w)
    * selects its minimum with the RIGHTMOST occurrence on ties; the
    * result is the distinct (1-based pos, hash) set in pos order. */
  private def model(hs: Array[Long], w: Int): Seq[(Int, Long)] = {
    val n = hs.length
    if (n == 0) return Seq.empty
    val starts = if (n <= w) Seq(0) else 0 to (n - w)
    starts.map { s =>
      val win = s until math.min(s + w, n)
      val m = win.map(hs).min
      val p = win.filter(i => hs(i) == m).max
      (p + 1, hs(p))
    }.distinct
  }

  private def kernel(hs: Array[Long], w: Int): Seq[(Int, Long)] = {
    val flat = Winnow.select(new GenericArrayData(hs), w)
    flat.grouped(2).map(a => (a(0).toInt, a(1))).toSeq
  }

  test("winnow kernel == brute-force window model on random arrays " +
      "(duplicate-heavy values so rightmost ties are exercised)") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val n = rnd.nextInt(61)
      val w = 1 + rnd.nextInt(12)
      // Tiny value domain forces frequent ties inside windows.
      val hs = Array.fill(n)(rnd.nextInt(7).toLong)
      assert(kernel(hs, w) == model(hs, w),
        s"n=$n w=$w hs=${hs.mkString(",")}")
    }
  }

  test("winnow positions are strictly increasing and density is " +
      "bounded by the window count") {
    val hs = Array.tabulate(500)(i => ((i * 2654435761L) % 1000L))
    val out = kernel(hs, 8)
    assert(out.nonEmpty)
    assert(out.map(_._1) == out.map(_._1).sorted)
    assert(out.map(_._1).distinct.size == out.size)
    assert(out.size <= 500 - 8 + 1)
    // Every w-window selects something, so gaps between consecutive
    // selected positions can never exceed w.
    out.map(_._1).sliding(2).foreach {
      case Seq(a, b) => assert(b - a <= 8)
      case _ =>
    }
  }

  test("paper guarantee: docs sharing a substring of length >= " +
      "w + k - 1 share a fingerprint hash") {
    val shared = "zqxjvkwpfyhgbdmcurtl" + "aeiounszq" // 29 chars
    val a = ("prefix one " + shared + " suffix alpha").toLowerCase
    val b = ("other lead " + shared + " tail beta").toLowerCase
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    // k=20 grams, w=8 windows: guarantee threshold 27 <= 29.
    val fps = Dedup.winnowFingerprints(df, gramChars = 20, window = 8)
      .select("doc_id", "fp").as[(Long, Long)].collect()
    val fa = fps.filter(_._1 == 1L).map(_._2).toSet
    val fb = fps.filter(_._1 == 2L).map(_._2).toSet
    assert((fa & fb).nonEmpty)
  }

  test("short-doc arm: a sub-gram-length doc yields exactly one " +
      "fingerprint at pos 1") {
    val df = Seq((1L, "tiny")).toDF("doc_id", "text")
    val out = Dedup.winnowFingerprints(df, gramChars = 20, window = 8)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Int]("pos") == 1)
  }

  test("winnowPairs surfaces a pair sharing two long substrings, " +
      "ignores an unrelated doc, and keeps id_a < id_b") {
    val s1 = "zqxjvkwpfyhgbdmcurtlaeiounszq" // 29 chars >= w+k-1
    val s2 = "mlkjhgfdsapoiuytrewqzxcvbnmlk"
    val df = Seq(
      (1L, s"alpha lead $s1 middle part $s2 tail one"),
      (2L, s"other start $s1 unrelated middle $s2 end two"),
      (3L, "completely different content about nothing shared here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(df, gramChars = 20, window = 8,
      minShared = 2L, maxDocsPerFp = 64L).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getAs[Long]("id_a") == 1L &&
      pairs.head.getAs[Long]("id_b") == 2L)
    assert(pairs.head.getAs[Long]("shared") >= 2L)
  }

  test("winnowPairs boilerplate cap: a fingerprint shared by more " +
      "docs than maxDocsPerFp pairs nobody") {
    val boiler = "thisboilerplatefooterappearsabsolutelyeverywhere"
    // Per-doc prefix is one repeated distinct letter, so even the
    // grams straddling the prefix/boiler junction are unique per doc
    // (a first draft used numeric ids — and docs 1 and 11 then
    // legitimately shared the rare "7padding this..." junction gram,
    // which the cap correctly KEPT; that was a fixture bug, not an
    // operator bug).
    val docs = (0L until 20L)
      .map(i => (i + 1,
        ('a' + i.toInt).toChar.toString * 25 + " " + boiler))
      .toDF("doc_id", "text")
    val capped = Dedup.winnowPairs(docs, gramChars = 20, window = 8,
      minShared = 1L, maxDocsPerFp = 8L).count()
    val uncapped = Dedup.winnowPairs(docs, gramChars = 20, window = 8,
      minShared = 1L, maxDocsPerFp = 1000L).count()
    assert(capped == 0, "boilerplate fingerprints must be dropped")
    assert(uncapped == 20L * 19 / 2,
      "without the cap every doc pair shares the boilerplate span")
  }

  test("dsirResample: k rows, keys are logw + deterministic Gumbel " +
      "of the id, ranked by rounded key with doc_id tie-break") {
    val docs = (0L until 400L).map { i =>
      val dom = if (i % 4 == 0) "src0" else s"src${i % 4}"
      val body = if (i % 4 == 0) "spark merge vector " * 5
        else s"noise token u$i w${i * 7 % 13} " * 4
      (i, body.trim, dom)
    }.toDF("doc_id", "text", "source")
    val target = col("source").isin("src0", "src1")
    val sel = Importance.dsirResample(docs, target, k = 50)
    val rows = sel.collect()
    assert(rows.length == 50)
    // Keys restate: gkey == round(logw + gumbel(lcg(doc_id)), 6).
    val m = 2147483648L
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val logw = r.getAs[Double]("logw")
      val lcg = (((id % m) + m) % m * 1103515245L + 12345L) % m
      val u = (lcg + 0.5) / m.toDouble
      val g = -math.log(-math.log(u))
      val expect = BigDecimal(logw + g)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("gkey") - expect) < 1e-12)
    }
    // The selected set is exactly the top-50 of the full weight+key
    // frame under (rounded key desc, doc_id asc).
    val all = Importance.dsirLogWeights(docs, target).collect().map {
      r =>
        val id = r.getAs[Long]("doc_id")
        val lcg = (((id % m) + m) % m * 1103515245L + 12345L) % m
        val u = (lcg + 0.5) / m.toDouble
        val key = BigDecimal(r.getAs[Double]("logw")
            - math.log(-math.log(u)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (key, id)
    }
    val expectIds = all.sortBy { case (k, id) => (-k, id) }
      .take(50).map(_._2).toSet
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == expectIds)
  }

  test("dsirResample is deterministic across runs") {
    val docs = (0L until 120L)
      .map(i => (i, s"alpha beta g$i d${i % 9}", s"src${i % 3}"))
      .toDF("doc_id", "text", "source")
    val t = col("source") === "src0"
    val a = Importance.dsirResample(docs, t, k = 20)
      .select("doc_id").as[Long].collect().toSet
    val b = Importance.dsirResample(docs, t, k = 20)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b && a.size == 20)
  }
}
