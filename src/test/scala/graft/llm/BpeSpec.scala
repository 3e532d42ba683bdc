package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE trainer vs an independent in-memory model of the published
  * algorithm (word-frequency dictionary, greedy leftmost in-word
  * merge, (count desc, lhs asc, rhs asc) tie-break). */
class BpeSpec extends SparkSpec {

  /** Code-point split — the symbol contract both engine sides use
    * (Java regex `.` and DuckDB/RE2 `.` each match one code point, so
    * an astral-plane char is ONE seed symbol, not a surrogate pair). */
  private def codePoints(w: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      b += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    b.result()
  }

  /** Reference model: trains on a word->freq map, symbols as
    * Vector[String], no string-replace shortcut — an independent
    * derivation of the same contract. */
  private def modelTrain(wordFreq: Map[String, Long],
      rounds: Int): Seq[Bpe.Merge] = {
    var dict: Map[Vector[String], Long] = wordFreq.map { case (w, f) =>
      (codePoints(w) :+ Bpe.EndMark) -> f
    }.groupMapReduce(_._1)(_._2)(_ + _)
    val out = Seq.newBuilder[Bpe.Merge]
    var step = 0
    var done = false
    while (step < rounds && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((syms, f) <- dict; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        step += 1
        out += Bpe.Merge(step, l, r, l + r, c)
        dict = dict.map { case (syms, f) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += syms(i); i += 1 }
          }
          (b.result(), f)
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    out.result()
  }

  private def modelSegment(word: String,
      merges: Seq[Bpe.Merge]): Vector[String] = {
    var syms = codePoints(word) :+ Bpe.EndMark
    for (m <- merges) {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == m.lhs &&
            syms(i + 1) == m.rhs) { b += m.merged; i += 2 }
        else { b += syms(i); i += 1 }
      }
      syms = b.result()
    }
    syms
  }

  private val texts = Seq(
    (1L, "low low low low low lower lower"),
    (2L, "newest newest newest newest newest newest"),
    (3L, "widest widest widest  NEWEST newest"),
    (4L, "a aa aaa aaaa lowly widest low"),
    (5L, "est est west best rest newest lowest"),
    // Astral-plane chars (U+1F600, caseless So) exercise the
    // code-point symbol contract: "lo😀w" must seed as 4 symbols +
    // EndMark, not 5 (a split-by-UTF-16-unit model would break the
    // emoji into surrogate halves and diverge). "</w>" as a literal
    // word proves the uppercase EndMark stays reserved.
    (6L, "lo😀w lo😀w lo😀w 😀😀 </w> </w>"))

  private def docs = {
    val s = spark
    import s.implicits._
    texts.toDF("doc_id", "text")
  }

  private def wordFreq: Map[String, Long] = texts
    .flatMap(_._2.toLowerCase.trim.split("\\s+")).filter(_.nonEmpty)
    .groupMapReduce(identity)(_ => 1L)(_ + _)

  test("merge table matches the independent model, incl. tie-breaks") {
    for (rounds <- Seq(0, 1, 5, 16)) {
      val got = Bpe.bpeMerges(docs, rounds = rounds)
        .orderBy("step").collect().toSeq
        .map(r => Bpe.Merge(r.getInt(0), r.getString(1),
          r.getString(2), r.getString(3), r.getLong(4)))
      assert(got == modelTrain(wordFreq, rounds),
        s"rounds=$rounds")
    }
  }

  test("whole-word fusion: single-char word survives deep training") {
    // 'a </w>' fuses to one symbol; later rounds must not emit a
    // descending index range on the size-1 sequence.
    val merges = Bpe.bpeMerges(docs, rounds = 40)
    assert(merges.count() <= 40)
    val model = modelTrain(wordFreq, 40)
    assert(merges.count() == model.size)
  }

  test("minFreq drops hapax words from training but not from counts") {
    val m2 = Bpe.bpeMerges(docs, rounds = 6, minFreq = 3)
    val modelWf = wordFreq.filter(_._2 >= 3)
    val gotPairs = m2.orderBy("step").select("lhs", "rhs")
      .collect().toSeq.map(r => (r.getString(0), r.getString(1)))
    assert(gotPairs == modelTrain(modelWf, 6).map(m => (m.lhs, m.rhs)))
  }

  test("token counts: dictionary join equals per-word model segmentation") {
    val rounds = 8
    val merges = modelTrain(wordFreq, rounds)
    val expected = texts.map { case (id, t) =>
      val ws = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
      (id, (ws.size.toLong,
        ws.map(w => modelSegment(w, merges).size.toLong).sum))
    }.toMap
    val got = Bpe.bpeTokenCounts(docs, rounds = rounds)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(got.keySet == expected.keySet)
    for ((id, pair) <- got)
      assert(pair == expected(id), s"doc $id")
  }

  test("token counts: minFreq>1 exercises the out-of-dictionary " +
      "fallback and still matches the model encoder") {
    val rounds = 8
    val minFreq = 2L
    val merges = modelTrain(wordFreq.filter(_._2 >= minFreq), rounds)
    val expected = texts.map { case (id, t) =>
      val ws = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
      (id, ws.map(w => modelSegment(w, merges).size.toLong).sum)
    }.toMap
    val got = Bpe.bpeTokenCounts(docs, rounds = rounds,
        minFreq = minFreq)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got == expected)
  }

  test("encode: token-id sequences match the model (vocabulary rank, " +
      "instance order, OOV as -1)") {
    val rounds = 8
    val minFreq = 2L
    val merges = modelTrain(wordFreq.filter(_._2 >= minFreq), rounds)
    val trainedWords = wordFreq.filter(_._2 >= minFreq).keys
    // Vocabulary rank is UTF-8 BYTE order (what Spark's UTF8String
    // comparison and DuckDB's binary collation both implement) — NOT
    // Scala's UTF-16 code-unit order, which ranks astral-plane
    // symbols below high-BMP ones. The fixture's emoji symbols keep
    // this distinction live.
    import scala.math.Ordering.Implicits._
    val byUtf8 = Ordering.by((s: String) =>
      s.getBytes("UTF-8").toSeq.map(b => b & 0xff))
    val vocab = trainedWords.flatMap(w => modelSegment(w, merges))
      .toSeq.distinct.sorted(byUtf8).zipWithIndex.toMap
    val expected = texts.map { case (id, t) =>
      val ws = t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
      val ids = ws.flatMap(w => modelSegment(w, merges))
        .map(s => vocab.getOrElse(s, -1))
      (id, (ids.size.toLong, ids.mkString(" ")))
    }.toMap
    val got = Bpe.bpeEncode(docs, rounds = rounds, minFreq = minFreq)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bpe_tokens"), r.getAs[String]("token_ids")))
      .toMap
    assert(got == expected)
    // The fixture's hapax words guarantee at least one OOV symbol.
    assert(got.values.exists(_._2.split(" ").contains("-1")))
  }

  test("learned merges can be reused without retraining") {
    val merges = modelTrain(wordFreq, 8)
    val a = Bpe.bpeTokenCounts(docs, rounds = 8).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val b = Bpe.bpeTokenCounts(docs, rounds = 8,
        learned = Some(merges)).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(a == b)
  }
}
