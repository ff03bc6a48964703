package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication for training-data pipelines: exact, MinHash+LSH, SimHash,
  * and exact n-gram Jaccard verification.
  *
  * 100 TB design rule: candidate generation is ALWAYS a shuffle on a bucket
  * key (LSH band hash / SimHash chunk) followed by within-bucket self-joins —
  * never an all-pairs crossJoin. Verification runs only on candidate pairs.
  * Signatures are SQL higher-order-function expressions (codegen'd, no UDFs),
  * so the signature pass is map-only over the corpus.
  *
  * ANSI-mode note (Spark 4 default): all hash arithmetic is done mod
  * p = 2^31-1 so no 64-bit multiply can overflow-throw.
  */
object Dedup {

  private val P = 2147483647L // 2^31 - 1, Mersenne prime

  // ------------------------------------------------- components / clusters

  /** Near-duplicate pairs → duplicate CLUSTERS: connected components of
    * the pair graph by iterative hash-min label propagation, the step a
    * dedup pipeline needs between candidate mining and keep-one-per-group.
    * Returns (doc_id, cluster_id) for every doc appearing in ≥1 pair,
    * cluster_id = min doc_id reachable in its component.
    *
    * Each iteration is one equi-join + one groupBy-min — the standard
    * distributed-CC shape (hash-min; GraphX's CC is the same fixpoint).
    * Rounds needed = graph diameter; near-dup graphs are dense clusters
    * of tiny diameter, so this converges in 2-3 rounds where a 100 TB
    * corpus would still be <10. Convergence is an exact fixpoint check
    * (no label changed), not a round budget; `maxIters` only guards a
    * pathological path graph. Each round materializes through an EAGER
    * `localCheckpoint` — NOT `cache()`: caching truncates recompute but
    * leaves the logical plan growing (each round's plan embeds the
    * previous round's twice, via the propagate and the fixpoint check),
    * so by round ~10 the driver spends longer analyzing the 2^10-node
    * plan than running it. Checkpointing swaps the lineage for a scan of
    * the materialized blocks, keeping every round's plan constant-size —
    * the same reason GraphFrames checkpoints its CC iterations.
    *
    * Exhausting `maxIters` is an ERROR, not a result: non-converged labels
    * would silently break the `cluster_id = min reachable doc_id` contract
    * (split clusters shipping through a curation pipeline). Callers that
    * truly want best-effort labels on a >maxIters-diameter graph pass
    * `requireConvergence = false` and own the consequences. */
  def connectedComponents(pairs: DataFrame, idACol: String = "id_a",
                          idBCol: String = "id_b",
                          maxIters: Int = 20,
                          requireConvergence: Boolean = true,
                          smallGraphEdgeCap: Long = 2000000L): DataFrame = {
    // Adaptive small-graph path (the same small-side adaptivity as a
    // broadcast join): a near-dup pair graph is usually TINY next to its
    // corpus — LSH mining 100 TB may yield a few million edges — and each
    // distributed round below costs several cluster jobs. Under the cap
    // (≤ ~32 MB of ids on the driver, probed with a limit-bounded count,
    // integral id types only) an exact driver-side union-find replaces
    // 3+ rounds of jobs; the distributed hash-min fixpoint below remains
    // the unbounded-scale path (force it with smallGraphEdgeCap = 0, as
    // the convergence-budget specs do).
    val idType = pairs.schema(idACol).dataType
    val integralIds =
      idType == org.apache.spark.sql.types.LongType ||
        idType == org.apache.spark.sql.types.IntegerType
    if (integralIds && smallGraphEdgeCap > 0 && smallGraphEdgeCap < Int.MaxValue) {
      // ONE bounded job: take(cap+1) both probes the size and fetches the
      // edges (pair mining upstream is often expensive — a separate
      // count-then-collect would run it twice). Over-cap → fall through.
      val taken = pairs.select(col(idACol), col(idBCol))
        .take(smallGraphEdgeCap.toInt + 1)
      if (taken.length <= smallGraphEdgeCap)
        return connectedComponentsLocal(pairs.sparkSession, taken, idType)
    }
    val edges = pairs.select(col(idACol).as("u"), col(idBCol).as("v"))
      .union(pairs.select(col(idBCol).as("u"), col(idACol).as("v")))
      .distinct().localCheckpoint(true)
    var labels = edges.select(col("u")).distinct()
      .select(col("u").as("v"), col("u").as("lbl")).localCheckpoint(true)
    // fixpoint detection by aggregate signature: per-node labels only ever
    // DECREASE (min-propagation is monotone), so the (count, Σlabel) pair
    // is unchanged iff no node changed — one cheap scan of the checkpointed
    // blocks instead of a join-with-previous (which costs a second shuffle
    // per round). Σ in decimal(38,0) so arbitrary id magnitudes can't
    // overflow the signature.
    def sig(df: DataFrame): (Long, String) = {
      val r = df.agg(count(lit(1)).as("n"),
        sum(col("lbl").cast("decimal(38,0)")).as("s")).head()
      (r.getLong(0), String.valueOf(r.getDecimal(1)))
    }
    var prev = sig(labels)
    var i = 0
    var done = false
    while (!done && i < maxIters) {
      // label of u flows across (u, v); keep the min seen per node
      val next = edges.join(labels.withColumnRenamed("v", "u"), Seq("u"))
        .select(col("v"), col("lbl"))
        .union(labels)
        .groupBy("v").agg(min(col("lbl")).as("lbl"))
        .localCheckpoint(true)
      val cur = sig(next)
      done = cur == prev
      prev = cur
      labels = next
      i += 1
    }
    if (!done && requireConvergence) throw new IllegalStateException(
      s"connectedComponents did not reach its fixpoint within $maxIters rounds — " +
        "the pair graph's effective diameter exceeds the budget; raise maxIters " +
        "or pass requireConvergence = false for best-effort labels")
    labels.select(col("v").as("doc_id"), col("lbl").as("cluster_id"))
  }

  /** Exact union-find over a collected edge list (see the small-graph gate
    * in [[connectedComponents]]): union-by-min-root with path compression,
    * so every root IS its component's minimum id — identical labels to the
    * distributed fixpoint, exactly converged by construction. */
  private def connectedComponentsLocal(spark: org.apache.spark.sql.SparkSession,
                                       taken: Array[org.apache.spark.sql.Row],
                                       idType: org.apache.spark.sql.types.DataType): DataFrame = {
    def asLong(v: Any): Long = v match {
      case l: Long => l
      case i: Int => i.toLong
      case x => throw new IllegalStateException(s"non-integral id $x")
    }
    val es = taken.map(r => (asLong(r.get(0)), asLong(r.get(1))))
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // min root wins → root == component min at all times
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    val rows = parent.keys.toArray.sorted.map { n =>
      val root = find(n)
      if (idType == org.apache.spark.sql.types.IntegerType)
        org.apache.spark.sql.Row(n.toInt, root.toInt)
      else org.apache.spark.sql.Row(n, root)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", idType, nullable = false),
      org.apache.spark.sql.types.StructField("cluster_id", idType, nullable = false)))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  // ------------------------------------------------------------------ exact

  /** Exact dedup by content hash: keep the smallest id per md5(text).
    * One hash-shuffle; at 100 TB, hash first so the shuffle carries 32-byte
    * digests, not documents. */
  def exactDedup(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Decontamination (train/eval overlap removal — the step a training
    * corpus runs against every benchmark before anything ships): flag each
    * corpus document sharing at least `minShared` distinct word k-shingles
    * with the benchmark set. Returns (idCol, shared_shingles) for flagged
    * docs.
    *
    * Shape: inverted index, never all-pairs — the benchmark's distinct
    * shingle set (eval suites are small next to a 100 TB corpus) is
    * BROADCAST, the corpus side explodes per-doc distinct shingles and
    * counts hits per doc in one partial-agg-friendly groupBy. Corpus cost
    * is one scan + one aggregation; no shuffle carries document text. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    textCol: String = "text", idCol: String = "doc_id",
                    shingleK: Int = 3, minShared: Int = 3): DataFrame = {
    // production path shingles BOTH sides with the native one-pass
    // shingle_hashes64 kernel (codegen'd, no shingle strings ever
    // materialized — the hot per-row loop rule) and joins on 8-byte hashes.
    // The output carries only per-doc COUNTS, and 64-bit collisions are
    // ~n²/2⁶⁵, so the counts equal the string-set form's and the string
    // DuckDB oracle still checks this path exactly; decontaminatePortable
    // keeps the engine-portable string form (equality-tested in DedupSpec).
    graft.GraftFunctions.register(corpus.sparkSession)
    def hashed(df: DataFrame, cols: Column*) = df.select(
      (cols :+ explode(call_function("shingle_hashes64",
        col(textCol), lit(shingleK))).as("__s")): _*)
    sharedShingleCounts(hashed(corpus, col(idCol)), hashed(benchmark),
      idCol, minShared)
  }

  /** [[decontaminate]] with string shingles end-to-end — the portable twin
    * any engine with string n-grams reproduces bit-for-bit. */
  def decontaminatePortable(corpus: DataFrame, benchmark: DataFrame,
                            textCol: String = "text", idCol: String = "doc_id",
                            shingleK: Int = 3, minShared: Int = 3): DataFrame = {
    // shingles() resolves the registered word_shingles_distinct function —
    // register here so the builder works on sessions without GraftExtensions
    graft.GraftFunctions.register(corpus.sparkSession)
    def stringed(df: DataFrame, cols: Column*) = df.select(
      (cols :+ explode(shingles(col(textCol), shingleK)).as("__s")): _*)
    sharedShingleCounts(stringed(corpus, col(idCol)), stringed(benchmark),
      idCol, minShared)
  }

  /** Bloom-guided decontamination — [[decontaminate]] for a benchmark too
    * large to broadcast as a set (the d20 "sketch guards the exact op"
    * pattern): the benchmark's shingle hashes collapse into ONE fixed-size
    * Bloom filter (`bloom_agg64`, bits/8 bytes regardless of benchmark
    * cardinality), corpus docs are prefiltered MAP-SIDE by
    * `bloom_any64` inside the scan stage, and only the surviving sliver
    * re-runs the exact inverted-index count. No false negatives: a doc
    * sharing ≥1 shingle always probes positive, so the output is
    * bit-identical to [[decontaminate]] — false positives only cost
    * re-checked rows. At 100 TB the corpus-side win is that non-matching
    * documents (the overwhelming majority) never leave their scan task:
    * no explode, no shuffle, no join input.
    *
    * Capacity: at bloom_agg64's k=5 probes, ~1% fpp needs ~10 bits per
    * DISTINCT benchmark shingle (10⁶ shingles → ~1.2 MiB; 10⁹ → ~1.2 GiB —
    * a saturated filter stays CORRECT but prunes nothing). `bloomBits = 0`
    * (the default) therefore AUTO-SIZES: one approx-count-distinct pass
    * over the benchmark's shingles picks the next power of two ≥ 10× the
    * observed cardinality (floor 2²⁰ ≈ 128 KiB, cap 2³⁰ ≈ 128 MiB — still
    * broadcastable), logging the implied fpp. Pass explicit bits only when
    * the cardinality is already known. */
  def bloomDecontaminate(corpus: DataFrame, benchmark: DataFrame,
                         textCol: String = "text", idCol: String = "doc_id",
                         shingleK: Int = 3, minShared: Int = 3,
                         bloomBits: Int = 0): DataFrame = {
    graft.GraftFunctions.register(corpus.sparkSession)
    val sh = call_function("shingle_hashes64", col(textCol), lit(shingleK))
    val bits =
      if (bloomBits > 0) bloomBits
      else {
        val n = math.max(1L, benchmark.select(explode(sh).as("__s"))
          .agg(approx_count_distinct(col("__s"))).head().getLong(0))
        val b = math.min(1L << 30,
          math.max(1L << 20, java.lang.Long.highestOneBit(10L * n - 1) << 1)).toInt
        // fpp for a k-probe filter at n keys in m bits: (1 - e^{-kn/m})^k
        val fpp = math.pow(1.0 - math.exp(-5.0 * n / b), 5.0)
        org.slf4j.LoggerFactory.getLogger(getClass).info(
          f"bloomDecontaminate auto-sized filter: ~$n distinct shingles → " +
            f"$b bits (${b / 8 / 1024} KiB), implied fpp ≈ $fpp%.4g")
        b
      }
    // ONE row of bits/8 bytes — metadata-sized driver traffic by design
    val filter = benchmark
      .agg(call_function("bloom_agg64", sh, lit(bits)).as("f"))
      .head().getAs[Array[Byte]]("f")
    val survivors = corpus.filter(call_function("bloom_any64", lit(filter), sh))
    decontaminate(survivors, benchmark, textCol, idCol, shingleK, minShared)
  }

  /** Broadcast-inverted-index core of decontamination: corpus (idCol, __s)
    * ⋈ broadcast(distinct benchmark __s) → per-doc hit counts. Per-doc
    * shingles arrive distinct (both shingle front ends dedup), so the
    * count is exactly |shingles(doc) ∩ shingles(benchmark)|. */
  private def sharedShingleCounts(corpusShingles: DataFrame,
                                  benchShingles: DataFrame,
                                  idCol: String, minShared: Int): DataFrame =
    corpusShingles
      .join(broadcast(benchShingles.distinct()), Seq("__s"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("shared_shingles"))
      .filter(col("shared_shingles") >= minShared)

  // ------------------------------------------------- exact substring spans

  /** Exact substring-span dedup (the "dedup training data at the substring
    * level" pass — find every K-token window that also occurs in ANOTHER
    * document, and how much of each document those duplicated spans cover).
    * Doc-level near-dup (MinHash/SimHash) misses boilerplate: two distinct
    * pages sharing a 200-token license header are not near-dups, but the
    * header should still train once. Returns one row per document:
    * (doc_id, n_tokens, n_windows, n_dup_windows, covered_tokens) where
    * covered_tokens = |union of [start, start+K) over duplicated windows| —
    * exact interval-union arithmetic, so `covered_tokens / n_tokens` is the
    * fraction of the document lying inside some cross-doc duplicated span.
    *
    * Shape at 100 TB: the corpus never leaves its scan as text — the native
    * positional kernel (`shingle_hashes_pos`, one pass, codegen'd) turns
    * each doc into 8-byte window fingerprints, and everything downstream
    * moves (id, pos, hash) triples. One hash-shuffle finds cross-doc
    * hashes (min(doc) != max(doc) — a plain partial-aggregable min/max, NOT
    * a count-distinct Expand), one semi-join marks duplicated positions
    * (same key → AQE reuses the exchange), and the interval union is a
    * single window function over (doc, pos) — no K× position explode.
    * This is the sorted-fingerprint design of suffix-array substring dedup,
    * re-expressed as two aggregations. 64-bit fingerprints make false
    * positives ~n²/2⁶⁵ (same trust as [[decontaminate]]); the DuckDB oracle
    * rebuilds the windows as STRINGS, so the gate entry cross-checks the
    * hashed path against exact string equality. */
  def substringDupStats(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", k: Int = 16): DataFrame = {
    graft.GraftFunctions.register(docs.sparkSession)
    val wins = docs.select(col(idCol),
      posexplode(call_function("shingle_hashes_pos", col(textCol), lit(k))))
      .toDF(idCol, "pos", "__h")
    // cross-doc duplicated fingerprints: seen in >= 2 distinct docs.
    // min != max is the cheap exact test for ">=2 distinct" — partial-agg
    // friendly, no distinct-count Expand through the shuffle.
    val dup = wins.groupBy("__h")
      .agg(min(col(idCol)).as("__mn"), max(col(idCol)).as("__mx"))
      .filter(col("__mn") =!= col("__mx"))
      .select("__h")
    val marked = wins.join(dup, "__h").select(col(idCol), col("pos"))
    // interval union per doc: windows sorted by start; each contributes
    // its length minus the overlap with the furthest end seen so far.
    val w = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cov = marked
      .withColumn("__prev_end", max(col("pos") + lit(k)).over(w))
      .withColumn("__cov", greatest(lit(0), col("pos") + lit(k) -
        greatest(col("pos"), coalesce(col("__prev_end"), col("pos")))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dup_windows"),
        sum(col("__cov")).cast("long").as("covered_tokens"))
    val totals = docs.select(col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("n_windows", greatest(col("n_tokens") - (k - 1), lit(0L)))
    totals.join(cov, Seq(idCol), "left").select(col(idCol),
      col("n_tokens"), col("n_windows"),
      coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
      coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
  }

  // ---------------------------------------------------------------- minhash

  /** Word k-shingles (lowercased), the MinHash input set — the compiled
    * [[graft.functions.expr.WordShingles]] kernel (one pass, no interpreted
    * transform/slice/concat per window; bit-identical to
    * [[shinglesDeclarative]], equality-pinned in DedupSpec).
    *
    * Requires `word_shingles_distinct` to be registered on the session
    * (GraftExtensions, or call [[graft.GraftFunctions.register]] first —
    * the DataFrame-level builders here do so). */
  def shingles(text: Column, k: Int = 3): Column =
    call_function("word_shingles_distinct", text, lit(k))

  /** The declarative reference implementation of [[shingles]] (interpreted
    * higher-order pipeline) — kept for the kernel-equality spec. */
  private[graft] def shinglesDeclarative(text: Column, k: Int = 3): Column = {
    val toks = TextAnalysis.tokens(lower(text))
    when(size(toks) >= k,
      array_distinct(transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** MinHash signature (length = numHashes) via the universal hash family
    * h_i(s) = (a_i * h0(s) + b_i) mod p over PRE-HASHED shingles.
    *
    * ONE fold over the shingles, updating all components per element
    * (zip_with accumulator) — the shingle array is referenced exactly once,
    * so Catalyst's CollapseProject can't duplicate the upstream
    * text→shingle→hash work the way a per-component aggregate invites.
    * (a_i, b_i) are fixed Scala-side constants (seeded PRNG), so signature
    * generation is pure arithmetic: numHashes × |shingles| mults/adds.
    * a_i * h0 < 2^62 — ANSI-safe. */
  def minhashSignature(shingleHashes: Column, numHashes: Int = 64): Column = {
    val (as, bs) = graft.functions.expr.MinHashSignature.constants(numHashes)
    val abArr = arrays_zip(
      array(as.map(lit).toIndexedSeq: _*).as("a"),
      array(bs.map(lit).toIndexedSeq: _*).as("b"))
    aggregate(shingleHashes,
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, h0) => zip_with(acc, abArr,
        (accI, p) => least(accI,
          pmod(p.getField("a") * h0 + p.getField("b"), lit(P)))))
  }

  /** Shingle base hashes (xxhash64 mod p), the minhashSignature input —
    * compute ONCE per row (e.g. via withColumn) so the text→shingle→hash
    * pipeline doesn't re-run per signature component. */
  def shingleHashes(text: Column, k: Int = 3): Column =
    transform(shingles(text, k), s => pmod(xxhash64(s), lit(P)))

  /** Estimated Jaccard from two signatures: fraction of equal components. */
  def estJaccard(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x === y), e => e))
      .cast("double") / size(sigA)

  /** MinHash-LSH near-duplicate pairs: signature → band hashes → bucket
    * self-join (candidates share ≥1 band) → signature-estimate filter.
    * Returns (id_a, id_b, est_jaccard) with id_a < id_b.
    *
    * bands*rowsPerBand must equal numHashes. With 16×4 the collision curve
    * catches jaccard ≥ ~0.5 reliably.
    *
    * `family` picks the hash family, NEVER the plan shape (pinned
    * signatures → banded equi-join → estimate filter, both ways):
    *  - `"md5"` (default): the engine-portable family
    *    (expr.MinHashMd5 — word-3-shingles, component i =
    *    uint32(md5(s||"#"||i))), banded by the band SLICE itself, so an
    *    independent engine reproduces every pair bit-for-bit (this is
    *    what lets the gate oracle-check the production entry).
    *  - `"xx"`: one xxhash64-mixed hash per shingle + the universal
    *    (a·h+b) mod p family and xxhash-hashed band keys — k× fewer
    *    digests per shingle and 8-byte shuffle keys instead of
    *    rowsPer×8-byte slices; the raw-throughput choice at 100 TB. */
  def minhashLsh(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                 shingleK: Int = 3, numHashes: Int = 64,
                 bands: Int = 16, threshold: Double = 0.5,
                 family: String = "md5"): DataFrame = {
    val rowsPer = numHashes / bands
    require(rowsPer * bands == numHashes, "bands must divide numHashes")
    // fully native front end: compiled shingle hashing (no shingle strings
    // materialized) → codegen'd signature. The declarative shingleHashes/
    // minhashSignature pair is the reference implementation (equality of
    // the signature stage asserted in MinHashSignatureSpec).
    graft.GraftFunctions.register(docs.sparkSession)
    // pin signatures once: the banded self-join references them on BOTH
    // sides, and without the checkpoint each side re-runs text→shingle→sig
    // over the corpus (signatures are computed once and stored in any real
    // dedup system — this is that materialization)
    val sigs = (family match {
      case "md5" =>
        require(shingleK == 3, "the md5 family pins word-3-shingles")
        docs.select(col(idCol),
          call_function("minhash_md5", col(textCol), lit(numHashes)).as("sig"))
      case "xx" =>
        docs.select(col(idCol),
          call_function("shingle_hashes", col(textCol), lit(shingleK)).as("__h0"))
          .select(col(idCol), call_function("minhash_sig", col("__h0")).as("sig"))
      case other => throw new IllegalArgumentException(
        s"minhashLsh family must be 'md5' or 'xx', got '$other'")
    }).localCheckpoint(true)
    // md5 family bands by the SLICE (portable join key); xx hashes each
    // slice to one long (smaller shuffle key, and band-hash collisions can
    // only ADD candidates, which the estimate filter re-judges)
    val banded = (family match {
      case "md5" => sigs.select(col(idCol), col("sig"),
        posexplode(array((0 until bands).map(b =>
          slice(col("sig"), b * rowsPer + 1, rowsPer)): _*)))
      case _ => sigs.select(col(idCol), col("sig"),
        posexplode(call_function("minhash_bands", col("sig"), lit(bands))))
    }).withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
    val a = banded.select(col(idCol).as("id_a"), col("sig").as("sig_a"),
      col("band"), col("band_hash"))
    val b = banded.select(col(idCol).as("id_b"), col("sig").as("sig_b"),
      col("band"), col("band_hash"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        // native sig_overlap: compiled per-pair loop (estJaccard's zip_with
        // form is its interpreted reference implementation)
        call_function("sig_overlap", col("sig_a"), col("sig_b")).as("est_jaccard"))
      .groupBy("id_a", "id_b").agg(first("est_jaccard").as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** Boilerplate mining: the corpus-wide table of word k-shingles that
    * recur across ≥ `minDocs` DISTINCT documents, with document and
    * occurrence counts — the artifact cleaning rules are written from
    * (license headers, nav chrome, cookie banners all surface here;
    * [[substringDupStats]] measures per-document coverage, this names the
    * offending spans themselves). Shape: one shingle pass, a per-(shingle,
    * doc) pre-aggregation — so the final agg counts docs with a plain
    * count(*), no count-distinct Expand — then a vocabulary-sized
    * threshold filter. Both shuffles carry shingle-level rows, never
    * documents. */
  def boilerplateShingles(docs: DataFrame, textCol: String = "text",
                          idCol: String = "doc_id", shingleK: Int = 3,
                          minDocs: Int = 5): DataFrame = {
    // raw (NON-distinct) windows — occurrence counts need every repeat,
    // unlike the MinHash set front end. Compiled WordShingles kernel: the
    // declarative transform(slice → concat_ws) form is an interpreted
    // CodegenFallback that re-copies k tokens per window (t29 measured
    // ~5 s of task time in this one Project at sf0.1; the kernel builds
    // each window once from token spans).
    graft.GraftFunctions.register(docs.sparkSession)
    val raw = call_function("word_shingles", col(textCol), lit(shingleK))
    docs.select(col(idCol), explode(raw).as("shingle"))
      .groupBy(col("shingle"), col(idCol))
      .agg(count(lit(1)).as("__occ"))
      .groupBy("shingle")
      .agg(count(lit(1)).as("n_docs"), sum(col("__occ")).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Cross-table FUZZY JOIN / record linkage: match rows of `a` to
    * near-duplicate rows of `b` by MinHash-banded candidate buckets +
    * signature agreement — the "link scraped variants back to their
    * canonical documents" operator (near-dup detection ACROSS sources,
    * where exact dedup and the self-join family can't reach: ids differ,
    * bytes differ, content matches). Same banded-bucket scale shape as
    * [[minhashLsh]] — signatures pinned ONCE per side, candidates come
    * from a bucketed equi-join on (band, band key), never an a×b
    * cross-join — but the join is two-relation, so there is no id_a<id_b
    * symmetry cut and a row may link to several candidates (ranking is
    * the caller's policy). md5 hash family end-to-end → the whole
    * pipeline is engine-portable and oracle-checked (swap in the
    * xxhash `minhash_sig` family at scale, plan unchanged — the d2/d8
    * twin rule). */
  def fuzzyJoin(a: DataFrame, b: DataFrame,
                textCol: String = "text", idCol: String = "doc_id",
                numHashes: Int = 16, bands: Int = 4,
                minMatch: Int = 4): DataFrame = {
    val rowsPer = numHashes / bands
    require(rowsPer * bands == numHashes, "bands must divide numHashes")
    graft.GraftFunctions.register(a.sparkSession)
    def banded(df: DataFrame, id: String, sig: String) = df
      .select(col(idCol).as(id),
        call_function("minhash_md5", col(textCol), lit(numHashes)).as(sig))
      .localCheckpoint(true) // pinned once per side (minhashLsh rule)
      .select(col(id), col(sig), posexplode(array((0 until bands).map(bd =>
        slice(col(sig), bd * rowsPer + 1, rowsPer)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bk")
    banded(a, "id_a", "sa").join(banded(b, "id_b", "sb"), Seq("band", "bk"))
      .groupBy("id_a", "id_b").agg(first("sa").as("sa"), first("sb").as("sb"))
      .select(col("id_a"), col("id_b"),
        aggregate(zip_with(col("sa"), col("sb"),
          (x, y) => when(x === y, 1L).otherwise(0L)), lit(0L), (s, x) => s + x)
          .as("n_match"))
      .filter(col("n_match") >= minMatch)
  }

  /** Exact n-gram Jaccard for candidate pairs — the verify stage after LSH.
    * `pairs` must have id_a/id_b; joins shingle sets back in (two hash
    * joins on doc id, proportional to candidates, not corpus²). */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame,
                   textCol: String = "text", idCol: String = "doc_id",
                   shingleK: Int = 3): DataFrame = {
    // shingles() resolves the registered word_shingles_distinct function —
    // register here so the builder works on sessions without GraftExtensions
    graft.GraftFunctions.register(docs.sparkSession)
    val sh = docs.select(col(idCol), shingles(col(textCol), shingleK).as("sh"))
    pairs
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .drop("sh_a", "sh_b")
  }

  /** Exact n-gram Jaccard near-dup pairs over the whole corpus, via an
    * inverted shingle index: explode distinct shingles, self-join on the
    * shingle (pairs sharing ≥1 shingle), count shared shingles per pair,
    * union size from the per-doc set sizes. All-integer output
    * (id_a, id_b, inter, uni) with inter/uni ≥ num/den kept — no float
    * rounding anywhere, so any engine reproduces it bit-for-bit.
    *
    * Scale note: work is Σ_shingle df(s)² — fine when near-dups are rare
    * and shingles are k=3 word grams. A corpus-wide hot shingle (boilerplate
    * header, license block) makes one index key quadratic; `maxDocFreq > 0`
    * drops shingles appearing in more than that many docs from the INDEX
    * (candidate generation) only — the well-known stop-shingle cap. With
    * the cap, `inter` undercounts by at most the dropped shingles, so kept
    * pairs are exact-verified survivors of a slightly stricter test: no
    * false positives, and true near-dups (which share many rare shingles)
    * survive. At 100 TB the probabilistic path (minhashLsh → ngramJaccard
    * verify on candidates) is the default; this exact miner (cap off) is
    * the ground-truth/audit tool. */
  def ngramJaccardPairs(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id", shingleK: Int = 3,
                        num: Int = 3, den: Int = 10,
                        maxDocFreq: Long = 0L): DataFrame = {
    // native one-pass shingle hashing, full 64 bits: set arithmetic on longs
    // is exact up to hash collisions (~n²/2⁶⁵ ≈ 10⁻¹³ here), the index and
    // join never materialize shingle strings, and the shuffle carries 8-byte
    // keys. The string-set form (shingles/ngramJaccard) is the reference
    // implementation this is equality-tested against.
    graft.GraftFunctions.register(docs.sparkSession)
    // pinned once: the inverted index is exploded on both sides of the
    // candidate self-join (and again by the df cap), so without this the
    // corpus is re-shingled up to three times
    val sh = docs.select(col(idCol),
      call_function("shingle_hashes64", col(textCol), lit(shingleK)).as("sh"))
      .localCheckpoint(true)
    val idx0 = sh.select(col(idCol), size(col("sh")).cast("long").as("ns"),
      explode(col("sh")).as("s"))
    val idx =
      if (maxDocFreq <= 0) idx0
      else idx0.join(
        idx0.groupBy("s").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= maxDocFreq).select("s"), Seq("s"))
    val a = idx.select(col(idCol).as("id_a"), col("ns").as("na"), col("s"))
    val b = idx.select(col(idCol).as("id_b"), col("ns").as("nb"), col("s"))
    a.join(b, Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b", "na", "nb").agg(count(lit(1)).as("inter"))
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .filter(col("inter") * den >= col("uni") * num)
      .select("id_a", "id_b", "inter", "uni")
  }

  // ---------------------------------------------------------------- simhash

  /** SimHash as 4×16-bit chunks (array<long>, chunk c = bits [16c,16c+16)).
    * Bit k's per-token sign comes from an independent hash xxhash64(k, tok):
    * bit k = 1 iff Σ_tokens ±1 > 0. Chunked form avoids variable 64-bit
    * shifts (not expressible ANSI-safely) and feeds banding directly. */
  def simhashChunks(text: Column): Column =
    simhashChunksFromHashes(transform(TextAnalysis.tokens(lower(text)), t => xxhash64(t)))

  /** simhashChunks over pre-hashed tokens. ONE fold over the tokens
    * accumulating all 64 bit-sums (zip_with accumulator), then the chunk
    * assembly runs in `aggregate`'s finish lambda — the bit-sum array is a
    * lambda variable there, evaluated exactly once (no CollapseProject
    * re-expansion). */
  def simhashChunksFromHashes(tokenHashes: Column): Column = {
    val pow2 = array((0 until 16).map(j => lit(1L << j)): _*)
    val bits = array((0 until 64).map(lit): _*)
    aggregate(
      tokenHashes,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, bits,
        (s, b) => s + when(pmod(xxhash64(b, h), lit(2)) === 1, 1L).otherwise(-1L)),
      sums => transform(sequence(lit(0), lit(3)), c =>
        aggregate(sequence(lit(0), lit(15)), lit(0L), (acc, j) =>
          acc.bitwiseOR(
            when(element_at(sums, (c * 16 + j + 1).cast("int")) > 0,
              element_at(pow2, j + 1)).otherwise(lit(0L))))))
  }

  /** The chunks packed into one 64-bit value (display/compare form). */
  def simhash64(text: Column): Column = {
    val ch = simhashChunks(text)
    element_at(ch, 1)
      .bitwiseOR(shiftleft(element_at(ch, 2), 16))
      .bitwiseOR(shiftleft(element_at(ch, 3), 32))
      .bitwiseOR(shiftleft(element_at(ch, 4), 48))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming, found by
    * chunk-banding (pigeonhole: ≤3 differing bits over 4 16-bit chunks ⇒
    * some chunk equal) then exact xor-popcount verify.
    *
    * `family` picks the TOKEN hash family only — the chunk join key is
    * the chunk value itself either way, so only the signature stage
    * differs: `"md5"` (default) is the engine-portable expr.SimHashMd5
    * family (bit j of token t = bit j of md5(t) — what lets the gate
    * oracle-check this entry); `"xx"` is one xxhash64 per token, the
    * raw-throughput choice at 100 TB. */
  def simhashNearDup(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id", maxHamming: Int = 3,
                     family: String = "md5"): DataFrame = {
    // native codegen'd chunks (graft.functions.expr.SimHashChunks) — the
    // declarative simhashChunksFromHashes stays as the documented fold form
    graft.GraftFunctions.register(docs.sparkSession)
    // pinned once across the chunk self-join (see minhashLsh)
    val sigs = (family match {
      case "md5" => docs.select(col(idCol),
        call_function("simhash_md5", col(textCol)).as("ch"))
      case "xx" => docs.select(col(idCol),
        call_function("token_hashes", col(textCol)).as("__th"))
        .select(col(idCol), call_function("simhash_chunks", col("__th")).as("ch"))
      case other => throw new IllegalArgumentException(
        s"simhashNearDup family must be 'md5' or 'xx', got '$other'")
    }).localCheckpoint(true)
    val chunked = sigs.select(col(idCol), col("ch"), posexplode(col("ch")))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "chunk_val")
    val a = chunked.select(col(idCol).as("id_a"), col("ch").as("ch_a"),
      col("chunk"), col("chunk_val"))
    val b = chunked.select(col(idCol).as("id_b"), col("ch").as("ch_b"),
      col("chunk"), col("chunk_val"))
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        aggregate(zip_with(col("ch_a"), col("ch_b"),
          (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")), lit(0L),
          (s, x) => s + x).as("hamming"))
      .groupBy("id_a", "id_b").agg(first("hamming").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
