package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths, as a 100 TB pipeline needs:
  *  - brute-force cosine top-k — the exact baseline. Distributed compute
  *    (broadcast the queries, scan the corpus once), but O(|Q|·N) work:
  *    correct at any scale, expensive at 100 TB.
  *  - bucketed ANN — multi-table random-hyperplane LSH, and an IVF variant
  *    with a DataFrame-native Lloyd refinement: candidates only within
  *    matching buckets/cells, so the join is a hash shuffle on bucket id,
  *    never all-pairs.
  *
  * Parameter note: defaults (L=12 tables × 6 planes; 16 cells / 8 probes)
  * are tuned for the near-isotropic synthetic testdata (10th-neighbor angle
  * ≈75°). Real embedding corpora are far more clustered — raise planes /
  * cells and lower probes there; the knobs are the API.
  *
  * Cosine math runs in double via the native codegen'd `cosine_sim`
  * expression (graft.functions.expr.CosineSimilarity); the declarative
  * `zip_with`/`aggregate` form stays as the equality-tested reference.
  */
object Similarity {

  /** cosine(a, b) as a declarative column expression (double) — the
    * documented reference form. Higher-order functions run interpreted
    * (CodegenFallback), so every hot path below scores with the NATIVE
    * [[graft.functions.expr.CosineSimilarity]] instead ([[cosF]]);
    * CosineSimilaritySpec pins the two to 1e-12 agreement. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (s, x) => s + x)
    val na = sqrt(aggregate(a, lit(0.0), (s, x) => s + x.cast("double") * x.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0), (s, x) => s + x.cast("double") * x.cast("double")))
    dot / (na * nb)
  }

  /** Native codegen'd cosine (see [[graft.functions.expr.CosineSimilarity]]).
    * Callers must have run `GraftFunctions.register` on the session. */
  private def cosF(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  private def registerOn(df: DataFrame): Unit =
    graft.GraftFunctions.register(df.sparkSession)

  /** MAXIMAL MARGINAL RELEVANCE re-ranking (Carbonell & Goldstein 1998 —
    * the diversity-aware context selection every RAG stack and dedup-
    * aware retrieval pipeline needs): from each query's top-`kCand`
    * exact-cosine candidates, greedily pick `k` where step 1 takes the
    * most relevant and every later step maximizes
    * `mmr_u = 7·rel_u − 3·max_sim_u` (λ=0.7 in tenth-micro integer
    * units — NO division, so there is no floor-vs-truncate hazard and
    * the scores are engine/partitioning-exact; ties break on doc_id).
    *
    * Shape at 100 TB: the corpus is touched once by the candidate
    * generator (swap [[ivfTopK]]'s bucketed candidates in for the exact
    * scan — the greedy logic is unchanged); everything after is
    * queries×kCand-sized. The greedy selection runs as ONE compiled
    * per-group loop (`mmr_select`) over each query's collected candidate
    * and pairwise-sim lists — work per group is O(k·kCand²), groups
    * shuffle once. (The k−1-round DataFrame formulation is kept as
    * [[mmrRerankLoop]], the equality-pinned reference: per round it paid
    * a max-sim agg, two joins, a rank window and an eager checkpoint over
    * kCand²-bounded relations — round-trip latency, not bytes.) Pairwise
    * candidate similarities are computed ONCE (kCand² per query). */
  def mmrRerank(emb: DataFrame, queries: DataFrame, k: Int = 5,
                kCand: Int = 20, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    val (cand, pairs) = mmrInputs(emb, queries, kCand, idCol, vecCol)
    val candAgg = cand.groupBy("query_id")
      .agg(collect_list(struct(col("doc_id"), col("rel_u"))).as("__cs"))
    val pairAgg = pairs.groupBy("query_id")
      .agg(collect_list(struct(col("a"), col("b"), col("sim_u"))).as("__ps"))
    candAgg
      // left: a query whose candidate set is a singleton has no pairs but
      // still emits its step-1 pick (the loop's union-of-step-1 behavior)
      .join(pairAgg, Seq("query_id"), "left")
      .select(col("query_id"), explode(call_function("mmr_select", col("__cs"),
        coalesce(col("__ps"), array().cast("array<struct<a:bigint,b:bigint,sim_u:bigint>>")),
        lit(k))).as("__sel"))
      .select(col("query_id"), col("__sel.doc_id").as("doc_id"),
        col("__sel.step").as("step"), col("__sel.mmr_u").as("mmr_u"))
  }

  /** Candidate and pairwise-similarity relations shared by [[mmrRerank]]
    * and its reference loop: per query the top-`kCand` candidates with
    * integer relevance, and all directed candidate pairs with integer
    * cosine. `cand` is pinned (read by both the pair join and the
    * aggregation); `pairs` is consumed once per formulation. */
  private[graft] def mmrInputs(emb: DataFrame, queries: DataFrame, kCand: Int,
                               idCol: String = "vec_id",
                               vecCol: String = "embedding"): (DataFrame, DataFrame) = {
    registerOn(emb)
    val cand = bruteForceTopK(emb, queries, kCand, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        round(col("cos_sim") * lit(1e6)).cast("long").as("rel_u"))
      .localCheckpoint(true)
    val vecs = emb.select(col(idCol).as("__vid"), col(vecCol).as("__v"))
    val withVec = cand.join(vecs, cand("doc_id") === col("__vid"))
    val aSide = withVec.select(col("query_id"), col("doc_id").as("a"),
      col("__v").as("__va"))
    val bSide = withVec.select(col("query_id"), col("doc_id").as("b"),
      col("__v").as("__vb"))
    val pairs = aSide.join(bSide, Seq("query_id"))
      .filter(col("a") =!= col("b"))
      .select(col("query_id"), col("a"), col("b"),
        round(cosF(col("__va"), col("__vb")) * lit(1e6)).cast("long").as("sim_u"))
    (cand, pairs)
  }

  /** The k-round DataFrame formulation of [[mmrRerank]]'s greedy selection —
    * the reference implementation the compiled `mmr_select` kernel is
    * equality-tested against (SimilaritySpec). */
  private[graft] def mmrRerankLoop(cand: DataFrame, pairs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("mmr_u").desc, col("doc_id"))
    var selected = cand
      .withColumn("mmr_u", lit(7L) * col("rel_u"))
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("query_id"), col("doc_id"), lit(1L).as("step"), col("mmr_u"))
      .localCheckpoint(true)
    for (i <- 2 to k) {
      val maxSim = pairs
        .join(selected.select(col("query_id"), col("doc_id").as("b")),
          Seq("query_id", "b"))
        .groupBy(col("query_id"), col("a").as("doc_id"))
        .agg(max(col("sim_u")).as("ms_u"))
      val next = cand
        .join(selected.select("query_id", "doc_id"),
          Seq("query_id", "doc_id"), "left_anti")
        .join(maxSim, Seq("query_id", "doc_id"))
        .withColumn("mmr_u", lit(7L) * col("rel_u") - lit(3L) * col("ms_u"))
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col("query_id"), col("doc_id"), lit(i.toLong).as("step"),
          col("mmr_u"))
      selected = selected.unionByName(next).localCheckpoint(true)
    }
    selected
  }

  /** Johnson–Lindenstrauss RANDOM PROJECTION — dimensionality reduction
    * for embedding pipelines (cheap pre-filter before exact verification;
    * JL: pairwise distances survive to (1±ε) at k = O(log n / ε²) dims).
    * Projection matrix is ±1 signs derived from md5 of the (out-dim, in-
    * dim) index pair — no learned state, engine-portable (oracle entry
    * s52), identical across retries/partitionings. Map-only: each output
    * dim is one fold over the input array, zero shuffles; rounded to 6 dp
    * so the doubles are comparison-stable cross-engine (the s9 rule). At
    * 100 TB this is a pure narrow map over the vectors — swap the
    * interpreted fold for a native Expression (the `cosine_sim`
    * treatment) if it ever sits on a hot path. */
  def randomProject(df: DataFrame, outDims: Int = 8,
                    embCol: String = "embedding",
                    idCol: String = "vec_id"): DataFrame = {
    val d = df.select(size(col(embCol))).head().getInt(0)
    def md5hex8(s: String): Long = {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(dig.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val cols = (0 until outDims).map { k =>
      val signs = (0 until d).map(j =>
        if (md5hex8(s"rp#$k#$j") % 2 == 0) 1.0 else -1.0)
      round(aggregate(
        zip_with(col(embCol), array(signs.map(lit): _*),
          (x, s) => x.cast("double") * s),
        lit(0.0), (acc, x) => acc + x), 6).as(s"p$k")
    }
    df.select(col(idCol) +: cols: _*)
  }

  /** Exact top-k neighbors for each query vector (queries broadcast; one
    * corpus scan; per-query top-k via window). Excludes self-matches. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    registerOn(corpus)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = corpus.select(col(idCol), col(vecCol))
      .join(broadcast(q), col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(cosF(col("qv"), col(vecCol)), 6).as("cos_sim"))
    topKPerQuery(scored, k)
  }

  /** Contrastive pair mining (the DPR/SimCSE training-batch construction
    * step): for every query vector, its POSITIVE (the single most similar
    * corpus vector with cos ≥ `posMin` — the near-dup that should embed
    * close) and its k HARD NEGATIVES (the most similar vectors BELOW
    * `negMax` — maximally confusable non-matches, the pairs that actually
    * move a contrastive loss; random negatives are trivially separable).
    * Output: (query_id, neighbor_id, cos_sim, role ∈ pos|neg, rank).
    *
    * One scored corpus scan (queries broadcast, native codegen'd cosine)
    * feeds BOTH selections; the two windows hash-partition on the same
    * query_id key. A query with no neighbor ≥ posMin emits negatives
    * only. Exact-scored brute force is the oracle-able baseline; at
    * 100 TB swap the scored scan for a bucketed candidate generator
    * (IVF cells / LSH bands, [[ivfTopK]]) — the pairing logic is
    * unchanged. Scores are rounded to 6 dp with neighbor_id tie-break,
    * so ranks are total-ordered and engine-reproducible. */
  def contrastivePairs(corpus: DataFrame, queries: DataFrame, kNeg: Int = 5,
                       posMin: Double = 0.4, negMax: Double = 0.4,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    registerOn(corpus)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = corpus.select(col(idCol), col(vecCol))
      .join(broadcast(q), col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(cosF(col("qv"), col(vecCol)), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    val pos = scored.filter(col("cos_sim") >= posMin)
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"),
        lit("pos").as("role"), lit(1).as("rank"))
    val neg = scored.filter(col("cos_sim") < negMax)
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= kNeg)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"),
        lit("neg").as("role"), col("__rn").as("rank"))
    pos.unionByName(neg)
  }

  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** One LSH table's bucket id — the documented REFERENCE form (interpreted
    * higher-order fold; hot paths use the native [[lshBuckets]] instead,
    * pinned equal in SimilaritySpec). `planes` hyperplane sign bits packed
    * into a long. Plane j's component i is a deterministic pseudo-uniform
    * value in [-1,1) from xxhash64(seed,j,i) — no driver randomness, so
    * corpus and queries bucket identically on any cluster. */
  def lshBucketRef(vec: Column, planes: Int, seed: Column): Column = {
    val pow2 = array((0 until planes).map(j => lit(1L << j)): _*)
    aggregate(sequence(lit(0), lit(planes - 1)), lit(0L), (acc, j) => {
      val dot = aggregate(zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, i) => x.cast("double") *
          (pmod(xxhash64(seed, j, i), lit(2000001L)).cast("double") / 1000000.0 - 1.0)),
        lit(0.0), (s, x) => s + x)
      acc.bitwiseOR(when(dot > 0, element_at(pow2, (j + 1).cast("int"))).otherwise(lit(0L)))
    })
  }

  /** All `tables` bucket ids for a vector — reference form of [[lshBuckets]]. */
  def lshBucketsRef(vec: Column, planes: Int, tables: Int): Column =
    transform(sequence(lit(0), lit(tables - 1)), l => lshBucketRef(vec, planes, l))

  /** All `tables` bucket ids for a vector (array<long>, one per table) via
    * the native codegen'd expression (graft.functions.expr.LshBuckets) —
    * one fused loop per row, plane matrix computed once per executor.
    * Callers must have run `GraftFunctions.register` on the session. */
  def lshBuckets(vec: Column, planes: Int, tables: Int): Column =
    call_function("lsh_buckets", vec, lit(planes), lit(tables))

  /** ANN top-k via multi-table LSH: a candidate is any vector sharing a
    * bucket with the query in ≥1 of `tables` tables; queries additionally
    * probe all 1-bit-flip neighbor buckets (multi-probe). The candidate
    * join shuffles on (table, bucket) only. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
              planes: Int = 6, tables: Int = 12, multiProbe: Boolean = true,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    registerOn(corpus)
    val pow2 = array((0 until planes).map(p => lit(1L << p)): _*)
    val c = corpus.select(col(idCol), col(vecCol),
      posexplode(lshBuckets(col(vecCol), planes, tables)))
      .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")
    val qb = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      posexplode(lshBuckets(col(vecCol), planes, tables)))
      .withColumnRenamed("pos", "table").withColumnRenamed("col", "b0")
    val probes =
      if (!multiProbe) qb.select(col("query_id"), col("qv"), col("table"), col("b0").as("bucket"))
      else qb.select(col("query_id"), col("qv"), col("table"),
        explode(concat(array(col("b0")),
          transform(sequence(lit(0), lit(planes - 1)),
            j => col("b0").bitwiseXOR(element_at(pow2, (j + 1).cast("int"))))))
          .as("bucket"))
    val scored = c.join(probes, Seq("table", "bucket"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(cosF(col("qv"), col(vecCol)), 6).as("cos_sim"))
      .groupBy("query_id", "neighbor_id").agg(first("cos_sim").as("cos_sim"))
    topKPerQuery(scored, k)
  }

  /** Portable-LSH ANN: the [[lshTopK]] pipeline (bucketing → candidate
    * equi-join on (table, bucket) → exact cosine top-k) over md5-derived
    * hyperplanes ([[graft.functions.expr.LshBucketsMd5]]), so an
    * independent SQL engine rebuilds the identical planes, buckets,
    * candidates, and ranking — gate entries `s20_ann_lsh_portable`
    * (single-probe) and `s10_ann_lsh` (`multiProbe = true`: queries
    * additionally probe every 1-bit-flip neighbor bucket — the full
    * production pipeline shape, bit-for-bit oracle-checkable because the
    * probe set is pure integer XOR arithmetic). The xxhash-family
    * [[lshTopK]] stays the documented production plane source
    * (SimilaritySpec recall-pins it against the exact top-k). */
  def lshTopKPortable(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                      planes: Int = 8, tables: Int = 4,
                      multiProbe: Boolean = false,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    registerOn(corpus)
    def buckets(vec: Column) = call_function("lsh_buckets_md5", vec, lit(planes), lit(tables))
    val pow2 = array((0 until planes).map(p => lit(1L << p)): _*)
    val c = corpus.select(col(idCol), col(vecCol), posexplode(buckets(col(vecCol))))
      .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")
    val qb = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      posexplode(buckets(col(vecCol))))
      .withColumnRenamed("pos", "table").withColumnRenamed("col", "b0")
    val probes =
      if (!multiProbe)
        qb.select(col("query_id"), col("qv"), col("table"), col("b0").as("bucket"))
      else qb.select(col("query_id"), col("qv"), col("table"),
        explode(concat(array(col("b0")),
          transform(sequence(lit(0), lit(planes - 1)),
            j => col("b0").bitwiseXOR(element_at(pow2, (j + 1).cast("int"))))))
          .as("bucket"))
    val scored = c.join(probes, Seq("table", "bucket"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(cosF(col("qv"), col(vecCol)), 6).as("cos_sim"))
      .groupBy("query_id", "neighbor_id").agg(first("cos_sim").as("cos_sim"))
    topKPerQuery(scored, k)
  }

  /** IVF-style ANN: corpus assigned to the nearest of `nCells` centroids;
    * queries probe the `nProbe` nearest cells. Centroids start from a
    * deterministic hash-ordered seed pick and get `refineIters` Lloyd
    * iterations — each one assign + re-mean (posexplode + groupBy(cell,dim)).
    *
    * The assign step is ONE projection through the native `nearest_cells`
    * expression over driver-collected centroids (bounded: nCells×dim
    * doubles) — no row blow-up, no shuffle, whole-stage codegen. The
    * previous shape (cross-join ×nCells + row_number window per Lloyd
    * iteration) moved N×nCells rows through an extra shuffle to compute a
    * per-row argmax; at 10^9 vectors that join IS the job. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
              nCells: Int = 16, nProbe: Int = 8, refineIters: Int = 1,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    registerOn(corpus)
    // cell ids via monotonically_increasing_id over the single sorted
    // partition the limit produces — deterministic, and avoids a global
    // window (Spark folds away constant partition keys, so even a lit()
    // partition spec would fall back to the one-partition WindowExec)
    // seeding, each Lloyd iteration, and the final assign all re-read the
    // corpus: pin the (id, vector) projection ONCE so refinement scans
    // materialized blocks instead of re-running the source scan
    // refineIters+2 times (eager localCheckpoint also keeps every
    // iteration's plan constant-size)
    val pinned = corpus.select(col(idCol), col(vecCol)).localCheckpoint(true)
    var centroids = collectCentroids(seedCentroids(pinned, nCells, idCol, vecCol))

    def assign(df: DataFrame, v: String): DataFrame =
      df.withColumn("cell_id", element_at(nearestCells(col(v), centroids, 1), 1))

    for (_ <- 0 until refineIters) {
      val assigned = assign(pinned, vecCol)
      centroids = collectCentroids(assigned
        .select(col("cell_id"), posexplode(col(vecCol)))
        .groupBy(col("cell_id"), col("pos")).agg(avg(col("col")).as("m"))
        .groupBy(col("cell_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("cv")))
    }

    val assigned = assign(pinned, vecCol)
    val qProbes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(nearestCells(col(vecCol), centroids, nProbe)).as("cell_id"))
    val scored = assigned.join(qProbes, Seq("cell_id"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(cosF(col("qv"), col(vecCol)), 6).as("cos_sim"))
      .groupBy("query_id", "neighbor_id").agg(first("cos_sim").as("cos_sim"))
    topKPerQuery(scored, k)
  }

  /** Brute-force top-k over the int8-QUANTIZED corpus (`quantize127`):
    * per-vector scales cancel inside cosine, so quantized search is plain
    * integer-vector cosine — 4× less data scanned per probe at the cost
    * of ≤1/254-per-component rounding in the scores. The compressed-
    * corpus search path for 100 TB embedding stores; gate entry
    * `s24_ann_quantized` pins it against DuckDB reproducing the same
    * quantization + ranking. */
  def quantizedBruteTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    registerOn(corpus)
    def quantized(df: DataFrame, idAs: String, vAs: String) = df.select(
      col(idCol).as(idAs),
      call_function("quantize127", col(vecCol)).getField("q")
        .cast("array<double>").as(vAs))
    val q = quantized(queries, "query_id", "qa")
    val scored = quantized(corpus, "cid", "qb")
      .join(broadcast(q), col("cid") =!= col("query_id"))
      .select(col("query_id"), col("cid").as("neighbor_id"),
        round(cosF(col("qa"), col("qb")), 6).as("qcos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .drop("__rn")
  }

  // ------------------------------------------------- product quantization

  /** Collect the fixed PQ codebook: the quantized vectors of the `nCodes`
    * lowest ids (the same engine-portable fixed-seed convention as
    * [[ivfTopKFixed]]'s centroids). Returns (sorted codebook ids, flat
    * [K][dim] quantized values). Tiny: K × dim longs on the driver. */
  private def pqCodebook(corpus: DataFrame, nCodes: Int,
                         idCol: String, vecCol: String): (Array[Long], Array[Long]) = {
    registerOn(corpus)
    val rows = corpus.filter(col(idCol) < nCodes)
      .select(col(idCol).cast("long"),
        call_function("quantize127", col(vecCol)).getField("q"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    require(rows.nonEmpty, "pq: empty codebook — no ids below nCodes")
    (rows.map(_._1), rows.flatMap(_._2))
  }

  /** PQ-encode the corpus (`s32`): int8-quantize (one fused native pass),
    * then assign each of `m` subvectors its nearest codebook entry by
    * EXACT integer squared L2 — the native [[graft.functions.expr.PqEncode]]
    * kernel, one codegen'd loop per row. Long-form output
    * (vec_id, m, code), code = the codebook member's own id, so any
    * engine reproduces it bit-for-bit (all arithmetic is integer).
    *
    * 100 TB shape: map-only over the corpus (codebook is a literal in the
    * plan); runs once at ingest, after which the corpus ships as m small
    * codes + a scale per vector instead of 4·dim bytes. */
  def pqEncode(corpus: DataFrame, m: Int = 4, nCodes: Int = 64,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (cids, flat) = pqCodebook(corpus, nCodes, idCol, vecCol)
    registerOn(corpus)
    corpus
      .select(col(idCol),
        posexplode(call_function("pq_encode",
          call_function("quantize127", col(vecCol)).getField("q"),
          typedlit(flat.toSeq), lit(m))))
      .select(col(idCol), col("pos").cast("long").as("m"),
        element_at(typedlit(cids.toSeq), col("col").cast("int") + 1).as("code"))
  }

  /** PQ-ADC top-k (`s33`): search the COMPRESSED corpus. Per query, a
    * lookup table of integer distances from its quantized subvectors to
    * every codebook entry is built driver-side (m × K longs) and
    * broadcast; the scan then scores each corpus vector as the sum of m
    * table lookups over its codes — never touching the original
    * embeddings. All-integer distances make this approximate path exactly
    * reproducible (and so fully ORACLE-CHECKED — unlike float PQ, where
    * argmin/rank ties drift across engines).
    *
    * 100 TB shape: one scan of the m-byte codes with broadcast LUTs —
    * the memory-bandwidth-bound ADC loop every PQ system (FAISS IVFPQ)
    * runs; compose with the IVF cell restriction for sublinear search. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
             m: Int = 4, nCodes: Int = 64,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (cids, flat) = pqCodebook(corpus, nCodes, idCol, vecCol)
    registerOn(corpus)
    val dim = flat.length / cids.length
    require(dim % m == 0, s"pq: dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    val qRows = queries
      .select(col(idCol).cast("long"),
        call_function("quantize127", col(vecCol)).getField("q"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    // LUT[mi*K + kk] = |query sub mi − codebook[kk] sub mi|² (exact ints)
    val luts = qRows.map { case (qid, qv) =>
      val lut = new Array[Long](m * cids.length)
      for (mi <- 0 until m; kk <- cids.indices) {
        var d = 0L
        var j = 0
        while (j < subDim) {
          val diff = qv(mi * subDim + j) - flat(kk * dim + mi * subDim + j)
          d += diff * diff
          j += 1
        }
        lut(mi * cids.length + kk) = d
      }
      (qid, lut.toSeq)
    }.toSeq
    val spark = corpus.sparkSession
    import spark.implicits._
    val qdf = luts.toDF("query_id", "lut")
    val codes = corpus.select(col(idCol),
      call_function("pq_encode",
        call_function("quantize127", col(vecCol)).getField("q"),
        typedlit(flat.toSeq), lit(m)).as("__codes"))
    // static expansion over m: element_at chains stay inside codegen (no
    // higher-order fallback in the scan)
    val adist = (0 until m).map(mi =>
      element_at(col("lut"),
        element_at(col("__codes"), mi + 1).cast("int") + lit(mi * cids.length) + 1))
      .reduce(_ + _)
    val scored = codes.join(broadcast(qdf), col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"), adist.as("adist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** IVF probe path with FIXED, engine-portable centroids: the `nCells`
    * lowest-id vectors ARE the centroids (cell_id = vec_id), no Lloyd
    * refinement. Exists to pin the entire IVF machinery — native argmax
    * assign ([[graft.functions.expr.NearestCells]]), multi-probe cell
    * fan-out, bucketed candidate join, native cosine scoring, per-query
    * top-k — against an independent engine: every step is deterministic
    * and SQL-expressible, so the DuckDB oracle reproduces it exactly
    * (gate entry `s18_ann_ivf_portable`). Production path with
    * hash-seeded, Lloyd-refined centroids: [[ivfTopK]]. */
  def ivfTopKFixed(corpus: DataFrame, queries: DataFrame, k: Int = 10,
                   nCells: Int = 8, nProbe: Int = 4,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    registerOn(corpus)
    val centroids = collectCentroids(
      corpus.filter(col(idCol) < nCells)
        .select(col(idCol).cast("long").as("cell_id"),
          transform(col(vecCol), _.cast("double")).as("cv")))
    val assigned = corpus.select(col(idCol), col(vecCol))
      .withColumn("cell_id", element_at(nearestCells(col(vecCol), centroids, 1), 1))
    val qProbes = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(nearestCells(col(vecCol), centroids, nProbe)).as("cell_id"))
    // each corpus vector lives in exactly one cell, so (query, neighbor)
    // pairs are unique even under multi-probe — no dedup stage needed
    val scored = assigned.join(qProbes, Seq("cell_id"))
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(cosF(col("qv"), col(vecCol)), 6).as("cos_sim"))
    topKPerQuery(scored, k)
  }

  /** Driver-side centroid snapshot, ordered by cell id (parallel id/vector
    * sequences — the literal arguments of `nearest_cells`). */
  private def collectCentroids(df: DataFrame): (Seq[Long], Seq[Seq[Double]]) = {
    val rows = df.select(col("cell_id"), col("cv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    (rows.toSeq.map(_._1), rows.toSeq.map(_._2))
  }

  /** Column form of the native nearest-cells argmax (ids/centroids embedded
    * as foldable literals). */
  private def nearestCells(vec: Column, centroids: (Seq[Long], Seq[Seq[Double]]),
                           nProbe: Int): Column =
    call_function("nearest_cells", vec,
      typedLit(centroids._1), typedLit(centroids._2), lit(nProbe))

  /** Fixed-centroid IVF cell ASSIGNMENT relation (vec_id → cell_id): the
    * index table an ANN serving layer keeps next to the corpus, here with
    * the engine-portable fixed centroids (the `nCells` lowest-id vectors
    * of `centroidSource` — pass the ORIGINAL corpus so assignments stay
    * comparable across corpus updates). One native argmax per vector, no
    * row blow-up; the lake entry `s43` maintains this relation
    * incrementally from the embeddings changelog. */
  def assignCellsFixed(corpus: DataFrame, centroidSource: DataFrame,
                       nCells: Int = 8, idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    registerOn(corpus)
    val centroids = collectCentroids(
      centroidSource.filter(col(idCol) < nCells)
        .select(col(idCol).cast("long").as("cell_id"),
          transform(col(vecCol), _.cast("double")).as("cv")))
    corpus.select(col(idCol), col(vecCol))
      .withColumn("cell_id", element_at(nearestCells(col(vecCol), centroids, 1), 1))
      .select(idCol, "cell_id")
  }

  /** Embedding near-dup pairs via IVF cells: every vector is assigned to
    * its `nProbe` nearest of `nCells` centroids, candidates are pairs
    * sharing a cell, verified exactly with the native cosine.
    *
    * This is the moderate-threshold mining shape: at cos ≈ 0.4-0.6 a
    * sign-LSH band rarely agrees (collision prob per 8-plane table ≈ 3%),
    * so hyperplane banding needs dozens of tables and still floods the
    * verify stage; centroid cells exploit the corpus's own geometry
    * instead. Candidate volume ≈ Σ_cells C(|cell|·nProbe, 2) — linear in
    * corpus size for fixed cell occupancy (scale nCells with N). For true
    * near-dups (cos ≥ 0.9) prefer [[embeddingNearDup]]. */
  def embeddingNearDupIvf(corpus: DataFrame, threshold: Double = 0.4,
                          nCells: Int = 32, nProbe: Int = 2,
                          idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    registerOn(corpus)
    val centroids = collectCentroids(seedCentroids(corpus, nCells, idCol, vecCol))
    val assigned = corpus.select(col(idCol), col(vecCol),
      explode(nearestCells(col(vecCol), centroids, nProbe)).as("cell_id"))
    val a = assigned.select(col(idCol).as("id_a"), col(vecCol).as("va"), col("cell_id"))
    val b = assigned.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("cell_id"))
    a.join(b, Seq("cell_id"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosF(col("va"), col("vb")), 6).as("cos_sim"))
      .groupBy("id_a", "id_b").agg(first("cos_sim").as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** [[embeddingNearDupIvf]] with FIXED portable centroids (the `nCells`
    * lowest-id vectors, cell_id = vec_id) — the near-dup MINING shape
    * pinned against DuckDB end-to-end (assign, multi-probe cell co-
    * occupancy, exact cosine verify, threshold); gate entry
    * `d13_embed_neardup_portable`. */
  def embeddingNearDupFixed(corpus: DataFrame, threshold: Double = 0.4,
                            nCells: Int = 8, nProbe: Int = 2,
                            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    registerOn(corpus)
    val centroids = collectCentroids(
      corpus.filter(col(idCol) < nCells)
        .select(col(idCol).cast("long").as("cell_id"),
          transform(col(vecCol), _.cast("double")).as("cv")))
    val assigned = corpus.select(col(idCol), col(vecCol),
      explode(nearestCells(col(vecCol), centroids, nProbe)).as("cell_id"))
    val a = assigned.select(col(idCol).as("id_a"), col(vecCol).as("va"), col("cell_id"))
    val b = assigned.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("cell_id"))
    a.join(b, Seq("cell_id"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosF(col("va"), col("vb")), 6).as("cos_sim"))
      .groupBy("id_a", "id_b").agg(first("cos_sim").as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** Deterministic seed centroids: the `nCells` hash-smallest vectors,
    * upcast to double (shared by [[ivfTopK]] and [[embeddingNearDupIvf]]). */
  private def seedCentroids(corpus: DataFrame, nCells: Int,
                            idCol: String, vecCol: String): DataFrame =
    corpus
      .select(col(idCol), col(vecCol), pmod(xxhash64(col(idCol)), lit(1000000L)).as("__h"))
      .orderBy(col("__h"), col(idCol)).limit(nCells).coalesce(1)
      .select(monotonically_increasing_id().as("cell_id"),
        transform(col(vecCol), _.cast("double")).as("cv"))

  /** K-MEANS embedding clustering, engine-deterministic (Lloyd's
    * algorithm with fixed seeding — the clustering step of
    * cluster-balanced curation: cluster the corpus, then cap or reweight
    * per cluster so no semantic mode dominates the training mix):
    *
    *  - seeds = the k lowest-id vectors (the [[ivfTopKFixed]] rule);
    *  - assignment = native `nearest_cells` argmax — ONE narrow
    *    projection per round, no row blow-up, ties → lowest cell id;
    *  - update = per-cell component means computed in the INTEGER
    *    domain: components quantized to micros (round(x·1e6) as long)
    *    and summed as longs — exact and order/partitioning-invariant
    *    where a distributed double sum is not — then divided and rounded
    *    to 6 dp. Every round is bit-reproducible across engines,
    *    partitionings, and retries (DuckDB replays the whole recurrence
    *    in the d29 oracle);
    *  - empty cells keep their previous centroid (oracle mirrors this).
    *
    * Each round is one groupBy whose aggregate state is (k × dims)-sized
    * — never corpus-sized — collected to drive the next round's literal
    * centroids (the Lloyd-inside-[[ivfTopK]] shape). Plans stay
    * constant-size: the corpus is re-scanned per round, centroids travel
    * as DATA (foldable literals), so there is no iterative lineage to
    * checkpoint. */
  def kmeansFixed(corpus: DataFrame, k: Int = 8, rounds: Int = 2,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    registerOn(corpus)
    require(k > 0 && rounds >= 0, s"kmeansFixed needs k > 0, rounds >= 0")
    var centroids = collectCentroids(
      corpus.filter(col(idCol) < k)
        .select(col(idCol).cast("long").as("cell_id"),
          transform(col(vecCol), _.cast("double")).as("cv")))
    require(centroids._1.nonEmpty, s"no seed vectors with $idCol < $k")
    var r = 0
    while (r < rounds) {
      val sums = corpus
        .select(element_at(nearestCells(col(vecCol), centroids, 1), 1).as("cell_id"),
          posexplode(transform(col(vecCol),
            x => round(x.cast("double") * 1e6).cast("long"))))
        .groupBy(col("cell_id"), col("pos"))
        .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
        .select(col("cell_id"), col("pos"),
          round(col("s").cast("double") / (col("n").cast("double") * lit(1e6)), 6)
            .as("m"))
        .collect() // k × dims rows — metadata-sized, like Lloyd in ivfTopK
      val byCell = sums.groupBy(_.getLong(0)).map { case (c, rows) =>
        c -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }
      val next = centroids._1.zip(centroids._2).map { case (c, old) =>
        c -> byCell.getOrElse(c, old) } // empty cell keeps its centroid
      centroids = (next.map(_._1), next.map(_._2))
      r += 1
    }
    corpus.select(col(idCol),
      element_at(nearestCells(col(vecCol), centroids, 1), 1).as("cluster"))
  }

  /** Embedding-cosine near-duplicate pairs (cos ≥ threshold), LSH-bucketed:
    * vectors sharing any of the multi-table buckets are compared exactly.
    * True near-duplicates (cos ≈ 1) collide in essentially every table.
    * id_a < id_b. */
  def embeddingNearDup(corpus: DataFrame, threshold: Double = 0.95,
                       planes: Int = 8, tables: Int = 4,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    registerOn(corpus)
    nearDupViaBuckets(corpus, lshBuckets(col(vecCol), planes, tables),
      threshold, idCol, vecCol)
  }

  /** [[embeddingNearDup]] — the SAME bucketed plan shape (posexplode →
    * (table, bucket) self-equi-join → exact cosine verify) — over
    * md5-derived PORTABLE hyperplanes ([[graft.functions.expr
    * .LshBucketsMd5]], the s20 plane family), so a DuckDB oracle rebuilds
    * the identical buckets, candidate pairs, and verified output
    * bit-for-bit: the production sign-LSH near-dup PATH itself is
    * oracle-checked, not a stand-in (gate `d28`; the xxhash family stays
    * the production default). */
  def embeddingNearDupPortable(corpus: DataFrame, threshold: Double = 0.4,
                               planes: Int = 8, tables: Int = 4,
                               idCol: String = "vec_id",
                               vecCol: String = "embedding"): DataFrame = {
    registerOn(corpus)
    nearDupViaBuckets(corpus,
      call_function("lsh_buckets_md5", col(vecCol), lit(planes), lit(tables)),
      threshold, idCol, vecCol)
  }

  /** Shared bucketed near-dup core: pairs sharing ANY table's bucket are
    * compared exactly; id_a < id_b; pairs dedup across tables BEFORE the
    * threshold filter (one first() agg). */
  private def nearDupViaBuckets(corpus: DataFrame, buckets: Column,
                                threshold: Double, idCol: String,
                                vecCol: String): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol), posexplode(buckets))
      .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")
    val a = c.select(col(idCol).as("id_a"), col(vecCol).as("va"), col("table"), col("bucket"))
    val b = c.select(col(idCol).as("id_b"), col(vecCol).as("vb"), col("table"), col("bucket"))
    a.join(b, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosF(col("va"), col("vb")), 6).as("cos_sim"))
      .groupBy("id_a", "id_b").agg(first("cos_sim").as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
