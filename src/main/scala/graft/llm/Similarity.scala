package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query
  * set against the corpus, exact, O(|corpus| * |queries| * dim), the
  * correctness oracle for the approximate paths.
  *
  * Scale paths: LSH-bucketed search — random-hyperplane signatures
  * (Charikar, STOC 2002) partition the corpus into 2^planes buckets;
  * each query probes its own bucket plus hamming-1 neighbors
  * (multi-probe LSH, Lv et al., VLDB 2007), so per-query work drops
  * from |corpus| to |bucket|. And IVF-flat — coarse quantization into
  * inverted lists with nProbe-nearest-list search, the cell-probe
  * architecture of Jegou et al.'s IVFADC ("Product quantization for
  * nearest neighbor search", TPAMI 2011) without the residual codes.
  * Bucket/list assignment is a narrow projection; probes are hash
  * joins on the bucket key.
  */
object Similarity {

  /** Deterministic LCG-ordered corpus sample of up to `n` (cid, cvec)
    * rows — the portable centroid bootstrap every clustered operator
    * shares (ivfTopK, ivfpqTopK, Dedup.semanticDedup); the identical
    * ORDER BY is baked into each operator's oracle SQL, so this is the
    * single Scala definition of the sampling convention. */
  private[llm] def sampleCentroids(corpus: DataFrame, n: Int)
      : DataFrame =
    corpus
      .orderBy(((col("id") * 1103515245L + 12345L) % 2147483648L).asc,
        col("id").asc)
      .limit(n)
      .select(col("id").as("cid"), col("vec").as("cvec"))

  /** Driver-collect a (bounded, <= nCentroids by construction)
    * centroid frame into the parallel arrays the in-row assignment
    * expression takes; fails fast with the caller's name on an empty
    * set. */
  private[llm] def collectCentroids(centroids: DataFrame, who: String)
      : (Array[Long], Array[Array[Double]]) = {
    val rows = centroids.select(col("cid"), col("cvec")).collect()
    require(rows.nonEmpty, s"$who: empty centroid set (empty corpus?)")
    (rows.map(_.getLong(0)), rows.map(_.getSeq[Double](1).toArray))
  }

  /** Driver-side two-level structure over a collected fine-centroid
    * set, for [[graft.functions.NearestCentroidProbed]]: the coarse
    * set is the first ceil(sqrt(k)) fine centroids in the SAME LCG
    * sample order as [[sampleCentroids]] (deterministic, restated by
    * the oracles as `row_number() <= ceil(sqrt(count(*)))`), and each
    * fine centroid maps to its highest-cosine coarse cell (ties to
    * the smaller coarse rank). Cost is k x sqrt(k) driver FLOPs over
    * an already-collected, bounded-by-construction set.
    *
    * @return (coarse vectors in LCG-rank order,
    *          fine-index -> coarse-index map)
    */
  private[llm] def probedStructure(cids: Array[Long],
      cvs: Array[Array[Double]]): (Array[Array[Double]], Array[Int]) = {
    val m = cids.length
    val nCoarse = math.ceil(math.sqrt(m.toDouble)).toInt
    val order = Array.range(0, m).sortBy(i =>
      ((cids(i) * 1103515245L + 12345L) % 2147483648L, cids(i)))
    val coarse = order.take(nCoarse).map(cvs)
    val f2c = Array.tabulate(m) { i =>
      var best = -1
      var bestCos = 0.0
      var j = 0
      while (j < coarse.length) {
        val cos = graft.functions.NearestCentroidProbed
          .cosineArrays(cvs(i), coarse(j))
        if (best < 0 || cos > bestCos) { best = j; bestCos = cos }
        j += 1
      }
      best
    }
    (coarse, f2c)
  }

  /** The in-row assignment column for a collected centroid set:
    * exact argmax ([[graft.functions.NearestCentroids]]) by default,
    * or the two-level probed form when `coarseProbes > 0`. */
  private[llm] def assignColumn(vec: Column, cids: Array[Long],
      cvs: Array[Array[Double]], coarseProbes: Int): Column =
    if (coarseProbes > 0) {
      val (coarse, f2c) = probedStructure(cids, cvs)
      GraftFunctions.nearestCentroidProbed(vec, coarse, cids, cvs,
        f2c, coarseProbes)
    } else
      element_at(GraftFunctions.nearestCentroids(vec, cids, cvs, 1), 1)

  /** Shared final ranking of a scored (qid, id, cosine) candidate
    * stream: per-query top-k via [[graft.functions.TopKByScoreAgg]].
    * Map-side partial heaps consume the candidate stream in the stage
    * that produced it, so only |queries| x k entries cross the
    * exchange — the window form this replaced shuffled EVERY scored
    * candidate row through a per-query sort (and for brute force,
    * where the stream is |corpus| x |probes| rows, the 100x stress
    * fixture OOM-killed that sort). Output-identical to
    * `row_number over (partition by qid order by cosine desc, id
    * asc)` filtered to `<= k`; the candidate generators guarantee
    * (qid, id) appears at most once, so heap slots are never wasted
    * on duplicates. */
  private def topKByCosine(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("qid"))
      .agg(GraftFunctions.topKByScore(col("cosine"), col("id"), k)
        .as("tk"))
      .select(col("qid"), posexplode(col("tk")))
      .select(col("qid"), col("col.id").as("id"),
        col("col.score").as("cosine"),
        (col("pos") + 1).cast("int").as("rank"))

  /** Shared ADC shortlist: per-query `shortlist` best ids by
    * approximate distance (asc, id asc on ties) — the same aggregate
    * with the score negated (adist is a DECIMAL-summed finite
    * non-negative double, so negation is a faithful order reversal;
    * no NaN cases to diverge on). Emits (qid, id) only. */
  private def shortlistByDistance(approx: DataFrame, shortlist: Int)
      : DataFrame =
    approx
      .groupBy(col("qid"))
      .agg(GraftFunctions.topKByScore(negate(col("adist")), col("id"),
        shortlist).as("tk"))
      .select(col("qid"), explode(col("tk.id")).as("id"))

  /** Exact brute-force top-k neighbors for each query vector.
    *
    * The scored stream is |corpus| x |queries| rows — the one frame in
    * the ANN family that must NEVER be shuffled; see [[topKByCosine]].
    *
    * @param corpus  (id, vec) rows
    * @param queries (qid, qvec) rows — expected driver-small; broadcast
    * @return (qid, id, cosine, rank) with rank 1..k, ties broken by id
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val joined = corpus.crossJoin(broadcast(queries))
      .where(if (excludeSelf) col("qid") =!= col("id") else lit(true))
      .withColumn("cosine",
        GraftFunctions.arrayCosine(col("qvec"), col("vec")))
    topKByCosine(joined, k)
  }

  /** Distributed Lloyd refinement of an initial centroid set (the
    * k-means step IVF quality depends on): each iteration assigns
    * every vector to its nearest centroid (broadcast join + windowed
    * argmax — one narrow pass over the corpus) and recomputes each
    * centroid as the per-dimension mean of its members. Clusters that
    * end an iteration empty are dropped (their list would never be
    * probed anyway).
    *
    * Means accumulate in DECIMAL(38,18) so the result is independent
    * of partition order (double addition is not associative) and
    * restatable bit-exactly by an external SQL oracle.
    *
    * At 100 TB: refine over a corpus SAMPLE (pass a sampled frame),
    * then assign the full corpus once against the final centroids —
    * the per-iteration cost here is |input| x nCentroids cosines plus
    * one (cid, dim)-keyed aggregation of |input| x dim rows.
    */
  def refineCentroids(corpus: DataFrame, initial: DataFrame,
      iterations: Int, coarseProbes: Int = 0): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    var cents = initial
    for (_ <- 1 to iterations) {
      // Driver-collect the current (<= nCentroids by construction)
      // centroid set each round: the corpus-side assignment becomes a
      // zero-shuffle in-row argmax ([[graft.functions
      // .NearestCentroids]] — same cosine evaluation order as the
      // former crossJoin+window shape, bit-identical result), and the
      // otherwise-growing iterative plan is truncated to bounded
      // driver state per round.
      // Shared collector: fails fast with the same descriptive
      // message as ivfTopK/ivfpqTopK on an empty corpus, instead of
      // letting an empty cids array surface later as silent null cids
      // from element_at.
      val (cids, cvs) = collectCentroids(cents, "refineCentroids")
      // coarseProbes > 0: the corpus-adaptive-k callers' knob — the
      // per-iteration assignment drops from k to ~sqrt(k)*(1+probes)
      // cosines per row via the two-level probed expression
      // ([[assignColumn]]); 0 keeps the exact argmax.
      val assigned = corpus
        .withColumn("cid",
          assignColumn(col("vec"), cids, cvs, coarseProbes))
        .select(col("cid"), col("vec"))
      val perDim = assigned
        .select(col("cid"), posexplode(col("vec")).as(Seq("i", "v")))
        .groupBy("cid", "i")
        .agg((sum(col("v").cast("decimal(38,18)")).cast("double")
          / count(lit(1))).as("mv"))
      cents = perDim.groupBy("cid")
        .agg(transform(
          array_sort(collect_list(struct(col("i"), col("mv")))),
          x => x.getField("mv")).as("cvec"))
    }
    // Materialize: the result is <= nCentroids rows by construction,
    // and a driver-side copy turns the refined set into a literal
    // input for the downstream assignments, exactly like the initial
    // plan-time sample.
    val spark = corpus.sparkSession
    spark.createDataFrame(
      java.util.Arrays.asList(cents.collect(): _*), cents.schema)
  }

  /** IVF-flat approximate top-k: partition the corpus into inverted
    * lists around centroids, probe only the `nProbe` lists nearest to
    * each query. Per-query work drops from |corpus| to
    * ~|corpus| * nProbe / nCentroids.
    *
    * Centroids start as deterministic corpus samples (hash-ordered
    * medoids) and are optionally refined with `lloydIterations` rounds
    * of distributed k-means ([[refineCentroids]]) — the refinement
    * changes only the (small, broadcast) centroid set, never the
    * assignment/probe dataflow.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int = 16, nProbe: Int = 4,
      excludeSelf: Boolean = true, lloydIterations: Int = 0): DataFrame = {
    val (centroids, lists) = ivfIndex(corpus, nCentroids,
      lloydIterations)
    ivfQuery(centroids, lists, queries, k, nProbe, excludeSelf)
  }

  /** Build the IVF index as two PERSISTABLE frames — the production
    * shape at 100 TB, where the index is built once per corpus
    * version and queried many times (mirrors
    * [[graft.llm.Retrieval]]'s persisted BM25 stats):
    *
    *  - `centroids` (cid, cvec): <= nCentroids rows;
    *  - `lists` (corpus columns + cid): every corpus vector tagged
    *    with its inverted-list cell — write it `partitionBy("cid")`
    *    and [[ivfQuery]]'s probe-cell filter becomes PARTITION
    *    PRUNING: a query batch physically reads only the nProbe cells
    *    it probes, ~|corpus| * nProbe / nCentroids bytes instead of
    *    the whole corpus.
    *
    * Centroids start as deterministic corpus samples
    * ([[sampleCentroids]]: an LCG step of the id, plain modular
    * arithmetic any engine reproduces) and are optionally refined
    * with `lloydIterations` rounds of distributed k-means
    * ([[refineCentroids]]). The (bounded, <= nCentroids) centroid set
    * is driver-collected and the corpus assigned in-row: the corpus
    * crosses NO exchange for its cell assignment — the former
    * crossJoin(broadcast)+window argmax shuffled |corpus| x
    * nCentroids rows through a per-group sort just to take a maximum.
    */
  def ivfIndex(corpus: DataFrame, nCentroids: Int = 16,
      lloydIterations: Int = 0): (DataFrame, DataFrame) = {
    GraftFunctions.register(corpus.sparkSession)
    val centroids0 = sampleCentroids(corpus, nCentroids)
    val centroids =
      if (lloydIterations > 0)
        refineCentroids(corpus, centroids0, lloydIterations)
      else centroids0
    val (cids, cvs) = collectCentroids(centroids, "ivfIndex")
    val lists = corpus.withColumn("cid", element_at(GraftFunctions
      .nearestCentroids(col("vec"), cids, cvs, 1), 1))
    (centroids, lists)
  }

  /** Query an IVF index ([[ivfIndex]] output, possibly reloaded from
    * parquet). Probes assign in-row against the driver-collected
    * centroid set; the distinct probed cells (<= nCentroids — bounded
    * driver state) become an `isin` filter on the lists side, which a
    * cid-partitioned lake layout answers by partition pruning — the
    * unprobed cells are never read. Results are identical to the
    * one-shot [[ivfTopK]] (the pruned cells contain no joinable
    * rows). Query batches up to `driverQueryCap` rows assign their
    * probe cells driver-side (one bounded collect); larger batches
    * switch to a distributed distinct over the probe assignments, so
    * batch size can never OOM the driver.
    *
    * `queries` is evaluated more than once (the capped size/probe
    * collect, then again on the join side) — a NONDETERMINISTIC
    * query frame (e.g. `limit`/`sample` over unordered data) could
    * otherwise present different rows to the pruning filter than to
    * the join and silently drop results. The over-cap fallback
    * therefore persists the probe assignment and derives BOTH the
    * distinct-cid filter and the join from that one materialized
    * frame; for the driver-side fast path, pass a deterministic
    * `queries` (a filter/selection, not an unordered limit). */
  def ivfQuery(centroids: DataFrame, lists: DataFrame,
      queries: DataFrame, k: Int, nProbe: Int = 4,
      excludeSelf: Boolean = true,
      driverQueryCap: Int = 65536): DataFrame = {
    GraftFunctions.register(lists.sparkSession)
    val (cids, cvs) = collectCentroids(centroids, "ivfQuery")
    val probes = queries.select(queries.columns.toIndexedSeq.map(col) :+
      explode(GraftFunctions.nearestCentroids(col("qvec"), cids,
        cvs, nProbe)).as("cid"): _*)
    // Probed cells for the lists-side pruning filter. Fast path:
    // computed DRIVER-SIDE with the exact kernel the expression
    // dispatches to (same cosine accumulation, same (cosine desc,
    // cid asc) selection) — queries are typically driver-small (a
    // probe batch, not a corpus), so this is one tiny collect of the
    // query vectors instead of a second distributed job. The collect
    // is CAPPED: limit(cap+1) bounds driver intake by construction,
    // and a batch that overflows the cap falls back to a fully
    // distributed `probes.cid distinct` (bounded by nCentroids rows
    // collected — never by batch size), re-running the in-row
    // assignment once more. A corpus-sized query batch therefore
    // costs one extra assignment pass instead of a driver OOM.
    val capped = queries.select(col("qvec"))
      .limit(driverQueryCap + 1).collect()
    val (probesForJoin, probedCids) =
      if (capped.length <= driverQueryCap)
        (probes, capped.iterator.filterNot(_.isNullAt(0))
          .flatMap { r =>
            // Null elements map to 0.0, exactly as the kernel's
            // isNullAt branch reads them in the expression path.
            val vec = r.getSeq[java.lang.Double](0)
              .map(d => if (d == null) 0.0 else d.doubleValue).toArray
            graft.functions.NearestCentroids.topN(
              new org.apache.spark.sql.catalyst.util
                .GenericArrayData(vec),
              cvs, cids, nProbe).toLongArray()
          }.toArray.distinct)
      else {
        // Over-cap fallback: persist the probe assignment so the
        // distinct-cid pruning filter and the join read the SAME
        // materialized rows — a nondeterministic `queries` can no
        // longer assign one cell set to the filter and another to
        // the join. The persist lives as long as the returned plan
        // (LRU-evictable); the fallback path is the rare
        // corpus-sized-batch case, not the probe hot path.
        val p = probes.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (p, p.select(col("cid")).distinct()
          .collect().map(_.getLong(0)))
      }
    val joined = lists
      .where(col("cid").isin(probedCids.toIndexedSeq.map(Long.box): _*))
      .join(probesForJoin, "cid")
      .where(if (excludeSelf) col("qid") =!= col("id") else lit(true))
      .withColumn("cosine",
        GraftFunctions.arrayCosine(col("qvec"), col("vec")))
    topKByCosine(joined, k)
  }

  /** Product-quantization ANN (the ADC half of Jegou et al.'s IVFADC,
    * TPAMI 2011): split each vector into `segments` subvectors,
    * quantize every subvector to its nearest codeword from a
    * per-segment codebook, and answer queries by ASYMMETRIC distance —
    * the query stays exact, each corpus vector is represented by its
    * `segments` code bytes, and the approximate distance is the sum of
    * per-segment query→codeword distances. A `shortlist` of best
    * approximate candidates is then reranked with exact cosine.
    *
    * Scale shape: codes are `segments` small ints per vector (the
    * 8-byte-per-vector compression that makes billion-vector search
    * feasible; production would pack them into one int column). The
    * code assignment is a broadcast join against `segments x
    * codebookSize` codewords + windowed argmin; the ADC scan joins the
    * tiny per-query lookup table (nq x segments x codebookSize rows)
    * to the codes on (segment, code) and sums per (query, id) —
    * DECIMAL accumulation so the ranking is partition-order
    * independent and externally restatable.
    *
    * Codebooks are LCG-ordered corpus samples (like [[ivfTopK]]'s
    * centroids — [[refineCentroids]] per segment is the production
    * refinement, dropped in the same way).
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      segments: Int = 4, codebookSize: Int = 16, shortlist: Int = 50,
      excludeSelf: Boolean = true): DataFrame = {
    val spark = corpus.sparkSession
    GraftFunctions.register(spark)
    require(dim % segments == 0, "dim must divide into segments")
    val segLen = dim / segments
    // Driver-side codebook: codebookSize sampled vectors (bounded
    // collect, like the refined centroids), code = sample rank.
    val sampled = corpus
      .orderBy(((col("id") * 1103515245L + 12345L) % 2147483648L).asc,
        col("id").asc)
      .limit(codebookSize)
      .select(col("vec")).collect().map(_.getSeq[Double](0))
    import spark.implicits._
    val codebook = (for {
      (v, code) <- sampled.zipWithIndex
      seg <- 0 until segments
    } yield (seg, code, v.slice(seg * segLen, (seg + 1) * segLen)))
      .toSeq.toDF("seg", "code", "cseg")

    def segmented(df: DataFrame, idCol: String, vecCol: String)
        : DataFrame =
      df.select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(segments - 1)),
          s => slice(col(vecCol), s * segLen + 1, lit(segLen)))))
        .withColumnRenamed("pos", "seg")
        .withColumnRenamed("col", "vseg")

    val l2 = aggregate(zip_with(col("vseg"), col("cseg"),
      (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, v) => acc + v)

    // Corpus codes: per (id, segment) the nearest codeword — in-row
    // argmin over the plan-time codebook ([[graft.functions
    // .PqCodes]]; same L2 fold order as `l2`, bit-identical codes).
    // The former posexplode+join+window shape shuffled |corpus| x
    // segments x codebookSize rows through a per-(id, seg) sort.
    val codeSegs = (for {
      code <- sampled.indices
      seg <- 0 until segments
    } yield sampled(code).slice(seg * segLen,
      (seg + 1) * segLen).toArray).toArray
    val codes = corpus
      .select(col("id"), posexplode(GraftFunctions.pqCodes(col("vec"),
        codeSegs, segments, segLen)))
      .withColumnRenamed("pos", "seg")
      .withColumnRenamed("col", "code")

    // Per-query lookup table: distance from each query subvector to
    // every codeword (nq x segments x codebookSize rows — tiny).
    val qlut = segmented(queries, "qid", "qvec")
      .join(broadcast(codebook), "seg")
      .withColumn("d", l2)
      .select(col("qid"), col("seg"), col("code"), col("d"))

    // ADC scan: sum the per-segment lookups; DECIMAL so the 4-way sum
    // is associative-safe across partitions.
    val approx = codes.join(broadcast(qlut), Seq("seg", "code"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("d").cast("decimal(38,18)")).cast("double")
        .as("adist"))
    val short = shortlistByDistance(approx
      .where(if (excludeSelf) col("qid") =!= col("id") else lit(true)),
      shortlist)

    // Exact rerank of the shortlist.
    val joined = short
      .join(corpus, "id")
      .join(queries.select(col("qid"), col("qvec")), "qid")
      .withColumn("cosine",
        GraftFunctions.arrayCosine(col("qvec"), col("vec")))
    topKByCosine(joined, k)
  }

  /** LSH-bucketed approximate top-k: probe the query's signature bucket
    * (plus all hamming-1 neighbor buckets when `multiProbe`), rank by
    * exact cosine within the probed set. Recall is tuned by `planes`
    * (fewer planes = bigger buckets = higher recall, more work). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
      planes: Int = 8, multiProbe: Boolean = true,
      excludeSelf: Boolean = true): DataFrame = {
    GraftFunctions.register(corpus.sparkSession)
    val csig = Dedup.hyperplaneSignature(col("vec"), dim, planes)
    val qsig = Dedup.hyperplaneSignature(col("qvec"), dim, planes)
    val bucketed = corpus.withColumn("bucket", csig)
    // Compute the signature ONCE per query row and derive the probed
    // buckets by XOR against exploded mask literals (0 = the home
    // bucket). Inlining the planes x dim signature tree per probe
    // variant would put thousands of expression nodes in one
    // projection — re-optimized on every invocation, the driver-side
    // cost then dominates small-probe-set runs for an identical
    // bucket set.
    val masks: Seq[org.apache.spark.sql.Column] =
      if (multiProbe) lit(0L) +: (0 until planes).map(p => lit(1L << p))
      else Seq(lit(0L))
    val probes = queries
      .withColumn("sig0", qsig)
      .withColumn("mask", explode(array(masks: _*)))
      .withColumn("bucket", col("sig0").bitwiseXOR(col("mask")))
      .drop("sig0", "mask")
    val joined = bucketed.join(broadcast(probes), "bucket")
      .where(if (excludeSelf) col("qid") =!= col("id") else lit(true))
      .withColumn("cosine",
        GraftFunctions.arrayCosine(col("qvec"), col("vec")))
    topKByCosine(joined, k)
  }

  /** IVF + PQ composed — the IVFADC scheme of Jegou et al. (TPAMI
    * 2011) and the production billion-vector shape (FAISS `IVFPQ`):
    * the inverted-file layer prunes the corpus to the query's
    * `nProbe` cells, the ADC layer scans only those candidates using
    * `segments` code bytes per vector, and a `shortlist` is reranked
    * with exact cosine. Scale shape: the ADC scan's pair volume is
    * (probed-cell corpus fraction) x nq instead of the full corpus —
    * at 1B vectors, nProbe/nCentroids is the pruning ratio — and each
    * corpus vector crosses the wire as its cell id + code bytes only.
    * Same LCG-ordered deterministic samples for both the centroids
    * and the codebooks as the individually-gated [[ivfTopK]] /
    * [[pqTopK]] stages. */
  def ivfpqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      dim: Int, nCentroids: Int = 16, nProbe: Int = 4,
      segments: Int = 4, codebookSize: Int = 16, shortlist: Int = 50,
      excludeSelf: Boolean = true): DataFrame = {
    val spark = corpus.sparkSession
    GraftFunctions.register(spark)
    require(dim % segments == 0, "dim must divide into segments")
    val segLen = dim / segments
    val lcg = ((col("id") * 1103515245L + 12345L) % 2147483648L).asc

    // IVF layer (as ivfTopK): 1 cell per corpus vector, nProbe per
    // query; candidate pairs come from the cell join alone. Same
    // shuffle-free in-row assignment as ivfTopK: the corpus crosses
    // no exchange to learn its cell.
    val (ccids, ccvs) = collectCentroids(
      sampleCentroids(corpus, nCentroids), "ivfpqTopK")
    def assign(df: DataFrame, idCol: String, vecCol: String,
        keep: Int): DataFrame =
      if (keep == 1)
        df.select(col(idCol), element_at(GraftFunctions
          .nearestCentroids(col(vecCol), ccids, ccvs, 1), 1).as("cid"))
      else
        df.select(col(idCol),
          explode(GraftFunctions.nearestCentroids(col(vecCol), ccids,
            ccvs, keep)).as("cid"))
    val lists = assign(corpus, "id", "vec", 1)
    val probes = assign(queries, "qid", "qvec", nProbe)
    val candidates = lists.join(probes, "cid")
      .where(if (excludeSelf) col("qid") =!= col("id") else lit(true))
      .select("qid", "id")

    // PQ layer (as pqTopK): codes for the whole corpus (built once,
    // reusable across queries), per-query lookup tables, ADC sum over
    // the CELL-PRUNED candidates only.
    val sampled = corpus.orderBy(lcg, col("id").asc)
      .limit(codebookSize)
      .select(col("vec")).collect().map(_.getSeq[Double](0))
    import spark.implicits._
    val codebook = (for {
      (v, code) <- sampled.zipWithIndex
      seg <- 0 until segments
    } yield (seg, code, v.slice(seg * segLen, (seg + 1) * segLen)))
      .toSeq.toDF("seg", "code", "cseg")
    def segmented(df: DataFrame, idCol: String, vecCol: String)
        : DataFrame =
      df.select(col(idCol), posexplode(
        transform(sequence(lit(0), lit(segments - 1)),
          s => slice(col(vecCol), s * segLen + 1, lit(segLen)))))
        .withColumnRenamed("pos", "seg")
        .withColumnRenamed("col", "vseg")
    val l2 = aggregate(zip_with(col("vseg"), col("cseg"),
      (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, v) => acc + v)
    // In-row per-segment argmin (see pqTopK): the corpus side learns
    // its codes with no exchange.
    val codeSegs = (for {
      code <- sampled.indices
      seg <- 0 until segments
    } yield sampled(code).slice(seg * segLen,
      (seg + 1) * segLen).toArray).toArray
    val codes = corpus
      .select(col("id"), posexplode(GraftFunctions.pqCodes(col("vec"),
        codeSegs, segments, segLen)))
      .withColumnRenamed("pos", "seg")
      .withColumnRenamed("col", "code")
    val qlut = segmented(queries, "qid", "qvec")
      .join(broadcast(codebook), "seg")
      .withColumn("d", l2)
      .select(col("qid"), col("seg"), col("code"), col("d"))

    val approx = candidates
      .join(codes.hint("shuffle_hash"), "id")
      .join(broadcast(qlut), Seq("qid", "seg", "code"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("d").cast("decimal(38,18)")).cast("double")
        .as("adist"))
    val short = shortlistByDistance(approx, shortlist)

    val joined = short
      .join(corpus, "id")
      .join(queries.select(col("qid"), col("qvec")), "qid")
      .withColumn("cosine",
        GraftFunctions.arrayCosine(col("qvec"), col("vec")))
    topKByCosine(joined, k)
  }
}
