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

  test("batched merge loop equals the sequential model on random " +
      "low-alphabet corpora (ties, non-fresh products, deep rounds)") {
    // The r15 safe-prefix batching applies several merges per count
    // job; a 2–3 letter alphabet maximizes tie-breaks, interacting
    // candidates, and product-string collisions across rounds — the
    // exact hazards the batch-safety conditions guard. The sequential
    // driver-side model is the ground truth.
    val s = spark
    import s.implicits._
    for (seed <- Seq(11, 42, 97)) {
      val rnd = new scala.util.Random(seed)
      val alpha = "ab" + (if (seed % 2 == 0) "c" else "")
      val words = Vector.fill(40)(
        Vector.fill(1 + rnd.nextInt(5))(
          alpha(rnd.nextInt(alpha.length))).mkString)
      val wf = words.groupMapReduce(identity)(_ =>
        1L + rnd.nextInt(4))(_ + _)
      val text = wf.toSeq.flatMap { case (w, f) =>
        Seq.fill(f.toInt)(w) }.mkString(" ")
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val got = Bpe.bpeMerges(df, rounds = 24)
        .orderBy("step").collect().toSeq
        .map(r => Bpe.Merge(r.getInt(0), r.getString(1),
          r.getString(2), r.getString(3), r.getLong(4)))
      assert(got == modelTrain(wf, 24), s"seed=$seed")
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

  // ---- byte-level (GPT-2 shape) ----------------------------------

  /** Independent pre-tokenizer model: a hand-rolled leftmost-first
    * scanner over code points implementing [[Bpe.PreTokenPattern]]'s
    * alternation — NOT a regex, so it pins BOTH engines' regex
    * semantics (Java in Spark, RE2 in the oracle) against a third
    * derivation. */
  private def modelPretok(t: String): Vector[String] = {
    val cps = t.codePoints().toArray.toVector
    def isWs(c: Int) = c == ' ' || c == '\t' || c == '\n' ||
      c == '\f' || c == '\r'
    def isL(c: Int) = Character.isLetter(c)
    def isN(c: Int) = {
      val ty = Character.getType(c)
      ty == Character.DECIMAL_DIGIT_NUMBER ||
        ty == Character.LETTER_NUMBER || ty == Character.OTHER_NUMBER
    }
    def isOther(c: Int) = !isWs(c) && !isL(c) && !isN(c)
    val contractions =
      Seq("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")
        .map(_.codePoints().toArray.toVector)
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < cps.length) {
      val start = i
      val lit = contractions.find(c =>
        cps.slice(i, i + c.length) == c)
      if (lit.isDefined) i += lit.get.length
      else {
        // space-prefixed class runs, tried in pattern order; the
        // optional space matches only if a class char follows it.
        def run(cls: Int => Boolean): Boolean = {
          var j = i
          if (j < cps.length && cps(j) == ' ') j += 1
          if (j < cps.length && cls(cps(j))) {
            while (j < cps.length && cls(cps(j))) j += 1
            i = j; true
          } else false
        }
        if (!run(isL) && !run(isN) && !run(isOther)) {
          // whitespace run (always matches here: current cp is
          // whitespace or the space not followed by any class char)
          var j = i
          while (j < cps.length && isWs(cps(j))) j += 1
          i = j
        }
      }
      assert(i > start, s"scanner stalled at $start in ${t.take(40)}")
      out += cps.slice(start, i)
        .map(cp => new String(Character.toChars(cp))).mkString
    }
    out.result()
  }

  private def hexBytes(w: String): Vector[String] =
    w.getBytes("UTF-8").toVector.map(b => f"${b & 0xff}%02X")

  /** Byte-level model: [[modelTrain]]'s algebra without the EndMark,
    * over hex-byte symbols of the pre-token frequency map. */
  private def modelTrainBytes(wordFreq: Map[String, Long],
      rounds: Int): Seq[Bpe.Merge] = {
    var dict: Map[Vector[String], Long] = wordFreq
      .map { case (w, f) => hexBytes(w) -> f }
      .groupMapReduce(_._1)(_._2)(_ + _)
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

  private def modelSegmentBytes(word: String,
      merges: Seq[Bpe.Merge]): Vector[String] = {
    var syms = hexBytes(word)
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

  // Raw text (case preserved, contractions, digits, punctuation,
  // multi-space runs, emoji): everything the byte-level form must
  // carry that the char-level form normalizes away.
  private val byteTexts = Seq(
    (1L, "low low low Low lower don't"),
    (2L, "newest newest c42 c42 c42 it's"),
    (3L, "the  widest   gap, the widest!"),
    (4L, "a aa aaa 123 x1y2 we'll"),
    (5L, " leading space and trailing "),
    (6L, "loéw loéw 😀😀 café"))

  private def byteDocs = {
    val s = spark
    import s.implicits._
    byteTexts.toDF("doc_id", "text")
  }

  private def bytePretokFreq: Map[String, Long] = byteTexts
    .flatMap(t => modelPretok(t._2))
    .groupMapReduce(identity)(_ => 1L)(_ + _)

  test("byte-level: Spark pre-tokenizer matches the independent " +
      "scanner (incl. contractions, digit runs, multi-space, emoji)") {
    val s = spark
    import s.implicits._
    val got = byteDocs
      .select(col("doc_id"), Bpe.pretokens(col("text")).as("pt"))
      .as[(Long, Seq[String])].collect().toMap
    for ((id, t) <- byteTexts)
      assert(got(id) == modelPretok(t), s"doc $id")
    // the scanner must reproduce concatenation exactly (lossless)
    for ((id, t) <- byteTexts)
      assert(modelPretok(t).mkString == t, s"doc $id lossless")
  }

  test("byte-level: merge table matches the independent model") {
    for (rounds <- Seq(0, 1, 6, 20)) {
      val got = Bpe.bpeMergesBytes(byteDocs, rounds = rounds)
        .orderBy("step").collect().toSeq
        .map(r => Bpe.Merge(r.getInt(0), r.getString(1),
          r.getString(2), r.getString(3), r.getLong(4)))
      assert(got == modelTrainBytes(bytePretokFreq, rounds),
        s"rounds=$rounds")
    }
  }

  test("byte-level encode: ids match the model (byte value for " +
      "singles, 256+index for merges) and NO -1 appears even with " +
      "sub-minFreq pre-tokens") {
    val rounds = 8
    val minFreq = 2L
    val merges =
      modelTrainBytes(bytePretokFreq.filter(_._2 >= minFreq), rounds)
    val idOf: String => Int = {
      // first-wins on duplicate merge products (min id), matching
      // the operator's vocabulary contract
      val m = merges.zipWithIndex.foldLeft(Map.empty[String, Int]) {
        case (acc, (mg, i)) =>
          if (acc.contains(mg.merged)) acc
          else acc + (mg.merged -> (256 + i))
      }
      sym => if (sym.length == 2) Integer.parseInt(sym, 16)
             else m(sym)
    }
    val expected = byteTexts.map { case (id, t) =>
      val ids = modelPretok(t)
        .flatMap(w => modelSegmentBytes(w, merges)).map(idOf)
      (id, (ids.size.toLong, ids.mkString(" ")))
    }.toMap
    val got = Bpe.bpeEncodeBytes(byteDocs, rounds = rounds,
        minFreq = minFreq)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bpe_tokens"), r.getAs[String]("token_ids")))
      .toMap
    assert(got == expected)
    assert(!got.values.exists(_._2.split(" ").contains("-1")),
      "byte-level vocabulary is closed — no UNK id may appear")
  }

  test("byte-level: learned merges can be reused without retraining") {
    val merges = modelTrainBytes(bytePretokFreq, 8)
    val a = Bpe.bpeEncodeBytes(byteDocs, rounds = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val b = Bpe.bpeEncodeBytes(byteDocs, rounds = 8,
        learned = Some(merges)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(a.toSeq == b.toSeq)
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
