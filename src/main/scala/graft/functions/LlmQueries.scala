package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Driver-contract wrappers for the LLM-data-pipeline operators over the
  * `documents` / `embeddings` testdata tables. Oracle-expressible ops have
  * matching DuckDB SQL in SparkEntry.oracleSql; the rest are rows-only
  * entries backed by ScalaTest suites (recall, determinism). */
object LlmQueries {

  /** Exact dedup by content hash (oracle-checked). */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactDedup(Tables.documents(spark, dir))

  /** MinHash-LSH near-dup candidate pairs, oracle-checked bit-for-bit:
    * the portable md5 family is the gate-scale default (the xxhash
    * family sits behind `family = "xx"` for raw throughput at 100 TB —
    * same plan, different digests; recall additionally tested in
    * DedupSpec). */
  def minhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(Tables.documents(spark, dir), threshold = 0.3)

  /** SimHash near-dup pairs, hamming ≤ 3, oracle-checked bit-for-bit
    * (portable md5 token family by default; xxhash behind `family`). */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDup(Tables.documents(spark, dir))

  /** IVF-cell embedding near-dup at cos >= 0.4 — the highest pair
    * similarity in the testdata corpus is ~0.51 (see d7's exact sweep), so
    * a near-dup-tuned threshold matches nothing here. At this moderate
    * similarity, centroid cells bound the candidate volume where sign-LSH
    * banding floods the verify stage (see Similarity.embeddingNearDupIvf);
    * recall vs d7's exact sweep asserted in SimilaritySpec. */
  def embedNearDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.embeddingNearDupIvf(Tables.embeddings(spark, dir),
      threshold = 0.4, nCells = 64, nProbe = 6)

  /** Deterministic ~20% sample of documents by md5(doc_id) (oracle-checked:
    * md5 is engine-portable, rand() is not even retry-stable). */
  def hashSample(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.hashSample(
      Tables.documents(spark, dir), "doc_id", num = 1, den = 5)

  /** Per-language quota: at most 50 docs per lang, drawn deterministically
    * by md5 bucket (the anti-domination cap of a curation pipeline). */
  def quotaSample(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.quotaPerGroup(
      Tables.documents(spark, dir), groupCol = "lang", keyCol = "doc_id", n = 50)

  /** The FULL MinHash+LSH pipeline, oracle-checked bit-for-bit: portable
    * md5-family signatures (16 components), 4 bands x 4 rows, candidate
    * pairs from band-bucket equality, component-match count >= 4
    * (est. Jaccard >= 0.25). The xxhash-family d2 stays the production
    * path; this proves the sketch+banding MACHINERY against an independent
    * engine, the way t5/t6/t7 do for sampling and fingerprints. */
  def minhashPortable(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftFunctions.register(spark)
    // pinned once across the banded self-join (see Dedup.minhashLsh)
    val sigs = Tables.documents(spark, dir)
      .select(col("doc_id"), call_function("minhash_md5", col("text"), lit(16)).as("sig"))
      .localCheckpoint(true)
    val banded = sigs.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(b => slice(col("sig"), b * 4 + 1, 4)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bk")
    val a = banded.select(col("doc_id").as("id_a"), col("sig").as("sa"),
      col("band"), col("bk"))
    val b = banded.select(col("doc_id").as("id_b"), col("sig").as("sb"),
      col("band"), col("bk"))
    a.join(b, Seq("band", "bk"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(first("sa").as("sa"), first("sb").as("sb"))
      // compiled per-pair match count (sig_matches) — the interpreted
      // aggregate-over-zip_with form allocated an array per candidate pair
      .select(col("id_a"), col("id_b"),
        call_function("sig_matches", col("sa"), col("sb")).as("n_match"))
      .filter(col("n_match") >= 4)
  }

  /** Cross-source record linkage, oracle-checked: treat `doc_id % 7 == 0`
    * documents — re-keyed (+1,000,000) and prefix-perturbed — as an
    * incoming scrape, and [[Dedup.fuzzyJoin]] them back against the full
    * corpus. Every incoming row must link to its canonical original (high
    * signature agreement survives the perturbation); additional links
    * surface canonical docs that were near-dups already. */
  def fuzzyJoinDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val incoming = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("copy doc "), col("text")).as("text"))
    Dedup.fuzzyJoin(docs, incoming)
  }

  /** Portable SimHash signatures (md5 token family, 4x16-bit chunks),
    * oracle-checked bit-for-bit — the d3 production path keeps the
    * splitmix family; this proves the sign-accumulation sketch against an
    * independent engine (see expr/SimHashMd5). */
  def simhashPortable(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftFunctions.register(spark)
    Tables.documents(spark, dir)
      .select(col("doc_id"), call_function("simhash_md5", col("text")).as("ch"))
      .select(col("doc_id"),
        element_at(col("ch"), 1).as("c0"), element_at(col("ch"), 2).as("c1"),
        element_at(col("ch"), 3).as("c2"), element_at(col("ch"), 4).as("c3"))
  }

  /** Token/char/punct stats (oracle-checked). */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.textStats(Tables.documents(spark, dir))

  /** Language-ID + quality + fingerprint enrichment (rows-only: heuristic
    * outputs; accuracy asserted in TextAnalysisSpec on real-language text). */
  def textEnrich(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftFunctions.register(spark)
    Tables.documents(spark, dir).select(
      col("doc_id"),
      TextAnalysis.langIdNative(col("text")).as("lang_pred"),
      TextAnalysis.qualityScoreNative(col("text")).as("quality"),
      TextAnalysis.fingerprint(col("text")).as("fingerprint"))
  }

  /** [[textEnrich]] with the engine-portable fingerprint (md5 family) —
    * the oracle twin pinning the COMPOSED enrich output cross-engine
    * (t3 itself stays rows-only: xxhash64 has no DuckDB analog; its
    * components are twinned by t4/t7, this entry twins the composition). */
  def textEnrichPortable(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftFunctions.register(spark)
    Tables.documents(spark, dir).select(
      col("doc_id"),
      TextAnalysis.langIdNative(col("text")).as("lang_pred"),
      TextAnalysis.qualityScoreNative(col("text")).as("quality"),
      TextAnalysis.fingerprintPortable(col("text")).as("fp"))
  }

  /** Brute-force cosine top-10 for query vectors vec_id < 5 (oracle-checked
    * against DuckDB list_cosine_similarity on DOUBLE[]). */
  def annBrute(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
      .select("query_id", "neighbor_id", "cos_sim")
  }

  /** Contrastive pair mining over the embeddings table (gate entry s38):
    * every 20th vector is a training query; see
    * [[Similarity.contrastivePairs]]. */
  def contrastiveMine(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.contrastivePairs(emb, emb.filter(col("vec_id") % 20 === 0))
  }

  /** Brute-force top-10 again, scored by the NATIVE codegen'd cosine
    * expression (graft.functions.expr.CosineSimilarity) — same oracle as
    * s9, so the custom expression is hash-checked against DuckDB too. */
  def annBruteNative(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(call_function("cosine_sim", col("qv"), col("embedding")), 6).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= 10)
      .drop("__rn")
  }

  /** LSH-bucketed ANN, same queries (rows-only; recall tested ≥ 0.9). */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    // fixed md5 planes + FULL multi-probe (every 1-bit-flip neighbor
    // bucket): the complete production pipeline shape, oracle-checked
    // bit-for-bit since r14 — probe sets are integer XOR arithmetic an
    // independent engine replays exactly. The xxhash plane family
    // (Similarity.lshTopK) remains the documented production source,
    // recall-pinned in SimilaritySpec rather than oracled (xxhash64 has
    // no DuckDB equivalent).
    val emb = Tables.embeddings(spark, dir)
    Similarity.lshTopKPortable(emb, emb.filter(col("vec_id") < 5), k = 10,
        multiProbe = true)
      .select("query_id", "neighbor_id", "cos_sim")
  }

  /** IVF-style ANN, same queries (rows-only). */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
      .select("query_id", "neighbor_id", "cos_sim")
  }

  /** Multimodal plumbing: binary payload + metadata → stub-decoded features
    * through the mapPartitions decode boundary. The ppm byte-histogram stub
    * is exact integer math, so this is oracle-checked end to end; width/
    * height (xxhash64-derived fakes) are excluded — no DuckDB equivalent. */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(Multimodal.attachBinary(Tables.documents(spark, dir)))
      .drop("width", "height")

  /** Multimodal typed-metadata side (oracle-checked: payload byte length
    * is SQL-expressible; the fake dims aren't). */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.attachBinary(Tables.documents(spark, dir))
      .select(col("doc_id"), col("meta.byte_len").as("byte_len"),
        col("meta.mime").as("mime"))

  /** Exact n-gram Jaccard near-dup pairs (oracle-checked: all-integer
    * intersection/union sizes, Jaccard ≥ 0.3 as 10·inter ≥ 3·uni). The
    * ground-truth twin of d2's MinHash estimate. */
  def ngramJaccardPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(Tables.documents(spark, dir))

  /** Integer-exact PageRank over the n-gram near-dup graph (d6 pairs as
    * undirected edges, 3 rounds) — centrality of each document inside its
    * duplicate neighborhood, the signal a curation pipeline uses to pick
    * cluster representatives by importance instead of min-id. Micro-unit
    * long arithmetic makes the fixpoint rounds engine-reproducible
    * (see [[graft.operators.Graph.pageRank]]); oracle replays the same
    * recurrence in DuckDB. */
  def pageRankNearDup(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.pageRank(
      Dedup.ngramJaccardPairs(Tables.documents(spark, dir)))
      .select(col("node").as("doc_id"), col("rank").as("rank_ppm"))

  /** Per-document TRIANGLE COUNTS over the d6/d19 near-dup graph
    * ([[graft.operators.Graph.triangleCount]] — degree-ordered wedge
    * enumeration, the local-clustering-density signal for template/
    * boilerplate families), oracle-checked: DuckDB replays the triple
    * join over the SAME pair definition. */
  def triangleNearDup(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Graph.triangleCount(
        Dedup.ngramJaccardPairs(Tables.documents(spark, dir)))
      .select(col("node").as("doc_id"), col("n_triangles"))

  /** Exact all-pairs embedding near-dup (cos ≥ 0.4 on the rounded score,
    * oracle-checked). O(N²) ground truth for d4's LSH-bucketed variant —
    * audit tool, not the 100 TB path. Scored by the native codegen'd
    * cosine expression. */
  def embedNearDupExact(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, dir)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(call_function("cosine_sim", col("va"), col("vb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= 0.4)
  }

  /** Language-ID + composite quality score (oracle-checked — both are pure
    * column arithmetic, mirrored in DuckDB SQL; the fingerprint stays in t3
    * because xxhash64 has no DuckDB equivalent). */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftFunctions.register(spark)
    Tables.documents(spark, dir).select(
      col("doc_id"),
      TextAnalysis.langIdNative(col("text")).as("lang_pred"),
      TextAnalysis.qualityScoreNative(col("text")).as("quality"))
  }

  /** IVF with fixed portable centroids (the 8 lowest-id vectors), probe 4
    * cells — pins the full IVF machinery (argmax assign, multi-probe,
    * bucketed join, cosine top-k) bit-for-bit against DuckDB; see
    * Similarity.ivfTopKFixed. The production Lloyd-refined path is s11. */
  def annIvfPortable(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.ivfTopKFixed(emb, emb.filter(col("vec_id") < 5), k = 10)
      .select("query_id", "neighbor_id", "cos_sim")
  }

  /** Multi-table LSH ANN over md5-derived hyperplanes — pins the FULL LSH
    * pipeline (plane construction, sign bucketing, candidate equi-join,
    * cosine top-k) bit-for-bit against DuckDB; see
    * Similarity.lshTopKPortable. The production xxhash-plane path is s10. */
  def annLshPortable(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.lshTopKPortable(emb, emb.filter(col("vec_id") < 5), k = 10)
      .select("query_id", "neighbor_id", "cos_sim")
  }

  /** Symmetric int8 embedding quantization (native `quantize127`): one
    * (vec_id, i, q, scale) row per component, oracle-checked — the
    * storage-side transform for 100 TB embedding corpora (int8 + one
    * float per vector instead of 4 bytes per component). */
  def embedQuantize(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftFunctions.register(spark)
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), call_function("quantize127", col("embedding")).as("qz"))
      .select(col("vec_id"), round(col("qz.scale"), 6).as("scale"),
        posexplode(col("qz.q")))
      .select(col("vec_id"), col("pos").cast("long").as("i"), col("col").as("q"),
        col("scale"))
  }

  /** Intra-document repetition ratio (the Gopher/MassiveText-style
    * repetition filter): 1 − distinct/total word-3-shingles. The
    * denominator derives from the token count (|tokens| − 2), so the
    * shingle array is consumed exactly ONCE (array_distinct) — the
    * CollapseProject re-inlining trap this repo's rules call out. */
  def repetitionRatio(spark: SparkSession, dir: String): DataFrame = {
    // compiled one-pass distinct-shingle kernel — size(array_distinct(sh))
    // over the interpreted transform(sequence→slice→concat_ws) ladder is
    // exactly size(word_shingles_distinct(text, 3)) (equality pinned in
    // DedupSpec, incl. <k-token, empty and NULL degenerates); the token
    // count for the denominator needs no lowercasing (case preserves count)
    graft.GraftFunctions.register(spark)
    val nTok = TextAnalysis.tokenCount(col("text"))
    val nSh = when(nTok >= 3, nTok - lit(2)).otherwise(lit(1))
    Tables.documents(spark, dir).select(col("doc_id"),
      round(lit(1.0) -
        size(call_function("word_shingles_distinct", col("text"), lit(3)))
          .cast("double") / greatest(nSh, lit(1)), 6).as("rep_ratio"))
  }

  /** Per-label mean embedding (class centroids): map-side posexplode
    * collapses into the partial average immediately, so the shuffle moves
    * one (label, component) row per task — grouped vector aggregation
    * with no row blow-up through the exchange. */
  /** K-means clustering over the embeddings corpus
    * ([[Similarity.kmeansFixed]] — fixed k-lowest-id seeding, 2 Lloyd
    * rounds, integer-micro centroid updates), oracle-checked: DuckDB
    * replays both rounds — the assignment argmax (cosine DESC, cell ASC)
    * and the per-cell micro-sum means with the empty-cell keep rule —
    * and must land every vector in the same cluster. */
  def kmeansClusters(spark: SparkSession, dir: String): DataFrame =
    Similarity.kmeansFixed(Tables.embeddings(spark, dir), k = 8, rounds = 2)

  /** CLUSTER-BALANCED corpus cut — the diversity-aware sampling step
    * cluster-cap pipelines run after clustering the embedding space: the
    * d29 k-means labels joined back to the documents, then the
    * md5-ordered per-CLUSTER quota ([[graft.operators.Sampling
    * .quotaPerGroup]], the t6 rule with cluster as the group) keeps at
    * most 40 docs per cluster so no semantic mode dominates the training
    * mix. Every stage engine-deterministic: labels from the replayable
    * Lloyd recurrence, the cut a pure key function. At scale the join is
    * an id-keyed shuffle of two corpus-sized relations (labels are never
    * collected), the quota one window over cluster-sized partitions. */
  def clusterBalance(spark: SparkSession, dir: String): DataFrame = {
    val clusters = kmeansClusters(spark, dir) // (vec_id, cluster)
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    val joined = docs.join(clusters, col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("lang"), col("cluster"))
    graft.operators.Sampling.quotaPerGroup(joined, "cluster", "doc_id", 40)
  }

  def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), posexplode(col("embedding")))
      .groupBy("label", "pos").agg(round(avg(col("col")), 6).as("m"))
      .select(col("label"), col("pos").cast("long").as("i"), col("m"))

  /** ANN over the int8-quantized corpus (see Similarity.quantizedBruteTopK)
    * — quantize at ingest, search the compressed vectors. */
  def annQuantized(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.quantizedBruteTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
      .select("query_id", "neighbor_id", "qcos")
  }

  /** Sequence packing over documents: whitespace token counts, 2048-token
    * bins, 8 parallel packing streams (see Sampling.sequencePack). */
  def sequencePack(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    graft.operators.Sampling.sequencePack(docs, keyCol = "doc_id",
      tokenCol = TextAnalysis.tokenCount(col("text")))
  }

  /** TOKEN-BUDGET mix cut ([[graft.operators.Sampling.tokenBudgetSample]]),
    * oracle-checked: per language, the greedy md5-order prefix of
    * documents whose predecessors total under the language's token budget
    * (en gets 5000, everything else 3000) — the "N tokens of source X"
    * half of mix composition, as a pure key function DuckDB reproduces
    * exactly. */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.tokenBudgetSample(
      Tables.documents(spark, dir).select("doc_id", "lang", "text"),
      groupCol = "lang", keyCol = "doc_id",
      tokenCol = TextAnalysis.tokenCount(col("text")),
      budgets = Map("en" -> 5000L), defaultBudget = 3000L)
      .select("doc_id", "lang", "n_tokens")

  /** EPOCH-salted reshuffle ([[graft.operators.Sampling.corpusShuffle]]
    * with a salt): two training epochs of the same corpus, each a fresh
    * deterministic permutation + shard assignment keyed off
    * `md5(key + "#" + salt)` — epochs never repeat an order, yet every
    * epoch is reproducible bit-for-bit. */
  def epochShuffles(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "lang")
    val e1 = graft.operators.Sampling.corpusShuffle(docs, "doc_id", 4, salt = "epoch1")
      .withColumn("epoch", lit(1L))
    val e2 = graft.operators.Sampling.corpusShuffle(docs, "doc_id", 4, salt = "epoch2")
      .withColumn("epoch", lit(2L))
    e1.unionByName(e2).select("doc_id", "lang", "epoch", "shard_id", "pos")
  }

  /** Deterministic CORPUS SHUFFLE + SHARD WRITER, oracle-checked
    * end-to-end: the post-packing handoff ([[graft.operators.Sampling
    * .corpusShuffle]]/`writeShards`) writes the documents table as 8
    * md5-ordered shard dirs and reads them BACK — what the returned rows
    * prove is the whole loop: shard assignment, the 1-based md5-order
    * positions, and the writer round-trip, all pure key functions DuckDB
    * reproduces bit-for-bit. */
  def corpusShards(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id", "lang")
    val out = graft.TempDirs.create("shards")
    graft.operators.Sampling.writeShards(docs, "doc_id", nShards = 8, out)
    graft.TempDirs.materializeAndDelete(
      spark.read.parquet(out) // partition discovery restores shard_id
        .select(col("doc_id"), col("lang"),
          col("shard_id").cast("long").as("shard_id"), col("pos")),
      out)
  }

  /** The END-TO-END curation pipeline a training-data run actually
    * executes, composed from the individually-proven stages and
    * oracle-checked as a WHOLE: quality gate (t4's score ≥ 0.5) → exact
    * dedup (min doc_id per md5(text)) → near-dup cluster dedup (keep only
    * cluster canonicals, clusters = d12's components over the full-corpus
    * md5 pair graph) → deterministic per-language quota (25 per lang, t6's
    * md5 order). Every stage is a shuffle on a bounded key (digest,
    * bucket, lang) — the whole pipeline is 100 TB-shaped. */
  def curationPipeline(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir)
    val scored = docs
      .withColumn("quality", TextAnalysis.qualityScoreNative(col("text")))
      .filter(col("quality") >= 0.5)
    val exact = Dedup.exactDedup(scored)
    val clusters = Dedup.connectedComponents(minhashPortable(spark, dir))
    val kept = exact.join(clusters, Seq("doc_id"), "left_outer")
      .filter(col("cluster_id").isNull || col("cluster_id") === col("doc_id"))
    graft.operators.Sampling.quotaPerGroup(
      kept.select("doc_id", "lang", "quality"), groupCol = "lang",
      keyCol = "doc_id", n = 25)
  }

  /** IVF-cell near-dup mining with fixed portable centroids — the d4
    * mining shape oracle-checked end-to-end (see
    * Similarity.embeddingNearDupFixed); d4 keeps the hash-seeded
    * production centroids. */
  def embedNearDupPortable(spark: SparkSession, dir: String): DataFrame =
    Similarity.embeddingNearDupFixed(Tables.embeddings(spark, dir),
      threshold = 0.4, nCells = 8, nProbe = 2)

  /** The sign-LSH near-dup PATH under oracle check (gate d28): the d4
    * production plan shape through [[Similarity.embeddingNearDupPortable]]
    * (md5 planes — the s20 family), DuckDB-reproducible bit-for-bit. */
  def embedNearDupLshPortable(spark: SparkSession, dir: String): DataFrame =
    Similarity.embeddingNearDupPortable(Tables.embeddings(spark, dir),
      threshold = 0.4, planes = 8, tables = 4)

  /** Near-dup pairs → duplicate clusters: connected components over the
    * oracle-checked d8 pair graph (portable md5 family), so the DuckDB
    * recursive-CTE oracle reproduces the exact same clusters the
    * iterative hash-min propagation computes. */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(minhashPortable(spark, dir))

  /** Semantic dedup (the SemDeDup curation step): embedding near-dup
    * pairs (fixed portable IVF centroids, cos ≥ 0.4 — the d13 graph) →
    * connected components → keep ONE representative per semantic cluster
    * (the min id) plus every unpaired vector. Oracle-checked end-to-end:
    * candidate mining, clustering, and the keep rule all reproduce in
    * DuckDB. 100 TB shape: cell-bounded candidates, checkpointed CC
    * (driver union-find under the small-graph cap), one anti-join. */
  def semanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val pairs = Similarity.embeddingNearDupFixed(emb,
      threshold = 0.4, nCells = 8, nProbe = 2)
    val clusters = Dedup.connectedComponents(pairs)
    emb.join(clusters.filter(col("doc_id") =!= col("cluster_id"))
        .select(col("doc_id").as("vec_id")),
      Seq("vec_id"), "left_anti")
      .select("vec_id", "label")
  }

  /** Corpus-level MinHash union via the minhash_agg custom aggregate over
    * the PORTABLE md5 shingle family, one (source, slot, h) row per
    * signature component — pins the set-union TypedImperativeAggregate
    * itself against DuckDB (per-slot min across every shingle of every doc
    * in the group; sig(A ∪ B) = elementwise-min). The d5 production path
    * keeps the xxhash family. */
  def minhashGroupsPortable(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftFunctions.register(spark)
    Tables.documents(spark, dir)
      .select(col("source"), call_function("minhash_md5", col("text"), lit(16)).as("sig"))
      .groupBy("source").agg(call_function("minhash_agg", col("sig"), lit(16)).as("gsig"))
      .select(col("source"), posexplode(col("gsig")))
      .select(col("source"), col("pos").cast("long").as("slot"), col("col").as("h"))
  }

  /** Corpus-level MinHash via the minhash_agg custom aggregate: one
    * signature per source (set-union = elementwise min), then pairwise
    * estimated Jaccard between sources. Oracle-checked: the portable md5
    * signature family (the gate-scale default across the dedup family —
    * swap `family` for xxhash raw throughput at 100 TB, plan unchanged;
    * d11 additionally pins the aggregate's raw registers). */
  def minhashGroups(spark: SparkSession, dir: String,
                    family: String = "md5"): DataFrame = {
    graft.GraftFunctions.register(spark)
    val perDoc = family match {
      case "md5" => Tables.documents(spark, dir)
        .select(col("source"), call_function("minhash_md5", col("text"), lit(64)).as("sig"))
      case _ => Tables.documents(spark, dir)
        .select(col("source"), Dedup.shingleHashes(col("text")).as("__h0"))
        .select(col("source"), call_function("minhash_sig", col("__h0")).as("sig"))
    }
    val sigs = perDoc
      .groupBy("source").agg(call_function("minhash_agg", col("sig"), lit(64)).as("gsig"))
    val a = sigs.select(col("source").as("src_a"), col("gsig").as("ga"))
    val b = sigs.select(col("source").as("src_b"), col("gsig").as("gb"))
    a.join(b, col("src_a") < col("src_b"))
      // compiled sig_overlap == estJaccard on equal-length sigs (eq / 64)
      .select(col("src_a"), col("src_b"),
        round(call_function("sig_overlap", col("ga"), col("gb")), 6).as("est_jaccard"))
  }

  /** Unigram log-prob quality scoring, oracle-checked (see
    * [[TextAnalysis.unigramLogProb]]). */
  def unigramLogProb(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramLogProb(Tables.documents(spark, dir))

  /** PQ encode, oracle-checked end-to-end (see [[Similarity.pqEncode]]):
    * every distance is integer, so the approximate codes are bit-exact
    * across engines. */
  def pqEncode(spark: SparkSession, dir: String): DataFrame =
    Similarity.pqEncode(Tables.embeddings(spark, dir))

  /** PQ-ADC compressed-domain ANN, oracle-checked end-to-end (see
    * [[Similarity.pqTopK]]) — the first APPROXIMATE search path the oracle
    * reproduces exactly (integer LUT distances). */
  def pqAdcAnn(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.pqTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
  }

  /** Perplexity bucketing (CCNet's head/middle/tail split on the LM
    * quality proxy): assign each document a bucket by its unigram
    * log-prob score. Cutoffs are FIXED values (chosen once from the score
    * distribution, as CCNet learns its thresholds from a sample corpus) —
    * assignment is then map-only over the scored corpus, no global sort
    * at any scale. Oracle-checked end-to-end on the rounded score. */
  def perplexityBuckets(spark: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramLogProb(Tables.documents(spark, dir))
      .withColumn("bucket",
        when(col("avg_logprob") < 3.40, "head")
          .when(col("avg_logprob") < 3.41, "middle")
          .otherwise("tail"))

  /** Decontamination, oracle-checked: treat `doc_id % 17 == 0` documents
    * as the benchmark/eval set and flag every remaining corpus document
    * sharing ≥3 distinct word 3-shingles with it (broadcast inverted
    * index — see [[Dedup.decontaminate]]). */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.decontaminate(
      corpus = docs.filter(col("doc_id") % 17 =!= 0),
      benchmark = docs.filter(col("doc_id") % 17 === 0))
  }

  /** Bloom-guided decontamination, oracle-checked against the SAME exact
    * result as t11 (the prefilter has no false negatives, so the composed
    * output is bit-identical) — the fixed-size-sketch path for benchmarks
    * too large to broadcast as a set (see [[Dedup.bloomDecontaminate]]). */
  def bloomDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.bloomDecontaminate(
      corpus = docs.filter(col("doc_id") % 17 =!= 0),
      benchmark = docs.filter(col("doc_id") % 17 === 0))
  }

  /** Weighted domain-mixture sample, oracle-checked: per-language keep
    * fractions (en 1/2, es 1/4, de 1/8, fr 1/16, zh default 1/10) —
    * map-only deterministic downsampling to a target training mix (see
    * [[graft.operators.Sampling.mixtureSample]]). */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.mixtureSample(
      Tables.documents(spark, dir).select("doc_id", "lang", "source"),
      groupCol = "lang", keyCol = "doc_id",
      weights = Seq(("en", 1L, 2L), ("es", 1L, 4L), ("de", 1L, 8L), ("fr", 1L, 16L)),
      default = (1L, 10L))

  /** Mixture UP-sampling, oracle-checked: fractional epoch replication
    * (en 2.5, es 1.25, de 3.0, default 0.5 epochs) — see
    * [[graft.operators.Sampling.mixtureResample]]. */
  def mixtureEpochs(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.mixtureResample(
      Tables.documents(spark, dir).select("doc_id", "lang"),
      groupCol = "lang", keyCol = "doc_id",
      epochs = Seq(("en", 5L, 2L), ("es", 5L, 4L), ("de", 3L, 1L)),
      default = (1L, 2L))

  /** BM25 keyword retrieval, oracle-checked end-to-end: the first three
    * documents act as queries against the whole corpus; fixed-point
    * micro-unit scores make the ranking deterministic across engines and
    * partitionings (see [[Retrieval.bm25TopK]]). */
  def bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val queries = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"), col("text").as("qtext"))
    Retrieval.bm25TopK(docs, queries)
  }

  /** HYBRID retrieval with reciprocal-rank fusion (the BM25 ⊕ dense-ANN
    * combination every RAG/curation stack ships): the same three query
    * docs are ranked twice — sparse ([[Retrieval.bm25TopK]], k=20) and
    * dense (exact cosine over the aligned embeddings, k=20, the s9
    * machinery) — and the two rankings fuse by RRF:
    * `rrf_u = Σ_lists 1000000000 div (60 + rank)` (Cormack et al.'s
    * k=60, scaled to INTEGER units with `div` so the fused scores are
    * engine/partitioning-exact — no float-sum nondeterminism), top-10 per
    * query under the (rrf_u DESC, doc_id) total order.
    *
    * Scale shape: both branch rankings are already bounded (k·queries
    * rows); the fusion is a full outer join of two TINY relations + one
    * window over ≤2k rows per query. The corpus is touched exactly twice
    * — once tokenized (BM25's one postings pass), once scanned for
    * cosine (swap in [[Similarity.ivfTopK]]'s bucketed candidates at
    * 100 TB; the fusion logic is unchanged). */
  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    val queries = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"), col("text").as("qtext"))
    val sparse = Retrieval.bm25TopK(docs, queries, k = 20)
      .select(col("query_id"), col("doc_id"), col("rank").as("s_rank"))
    val dw = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    val dense = Similarity
      .bruteForceTopK(emb, emb.filter(col("vec_id") < 3), k = 20)
      .withColumn("d_rank", row_number().over(dw).cast("long"))
      .select(col("query_id"), col("neighbor_id").as("doc_id"), col("d_rank"))
    val fused = sparse.join(dense, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_u",
        coalesce(expr("1000000000 div (60 + s_rank)"), lit(0L)) +
          coalesce(expr("1000000000 div (60 + d_rank)"), lit(0L)))
    val fw = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_u").desc, col("doc_id"))
    fused.withColumn("fused_rank", row_number().over(fw).cast("long"))
      .filter(col("fused_rank") <= 10)
      .select("query_id", "doc_id", "rrf_u", "fused_rank")
  }

  /** EDIT-DISTANCE verification stage over banded candidates (gate entry
    * d32 — the record-linkage-grade second stage after sketch banding):
    * the d8 MinHash+LSH candidate pairs are re-scored with TRUE
    * Levenshtein distance and kept when edits ≤ 30% of the longer text —
    * written as the pure integer inequality `10·dist ≤ 3·max_len`, no
    * division, so the verdict is engine-exact. The expensive O(|a|·|b|)
    * DP runs ONLY on the collision-bounded candidate set (never
    * all-pairs); texts join back by id so the banded shuffle carries
    * signatures, not documents. */
  def editVerifiedPairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    minhashPortable(spark, dir).select("id_a", "id_b")
      .join(docs.select(col("doc_id").as("id_a"), col("text").as("__ta")), Seq("id_a"))
      .join(docs.select(col("doc_id").as("id_b"), col("text").as("__tb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__ta"), col("__tb")).cast("long").as("dist"),
        greatest(length(col("__ta")), length(col("__tb"))).cast("long").as("mx"))
      .filter(col("dist") * lit(10L) <= col("mx") * lit(3L))
      .select("id_a", "id_b", "dist")
  }

  /** BINARY-payload near-dup over the multimodal table (gate entry m3):
    * byte-level media dedup — the exact-math cousin of perceptual
    * hashing, and the technique that works TODAY on opaque payloads (no
    * codec needed): SimHash over the payload's non-overlapping 4-byte
    * windows (hex-encoded; each window is one token of the md5 family),
    * chunk-pigeonhole candidate pairs, hamming ≤ 3. The SAME production
    * kernel and banded self-join as d3 ([[Dedup.simhashNearDup]]),
    * pointed at bytes instead of words — identical payloads land at
    * hamming 0, re-encoded/trimmed variants within the window noise.
    * Map-only window construction; candidates bounded by chunk
    * collisions, never all-pairs. */
  def binaryNearDup(spark: SparkSession, dir: String): DataFrame = {
    val mm = Multimodal.attachBinary(Tables.documents(spark, dir))
    val hexp = hex(col("payload"))
    val nwin = (col("meta.byte_len") / lit(4)).cast("int")
    val toks = when(nwin > lit(0), concat_ws(" ",
      transform(sequence(lit(0), nwin - lit(1)),
        i => hexp.substr(i * lit(8) + lit(1), lit(8)))))
      .otherwise(lit(""))
    Dedup.simhashNearDup(mm.select(col("doc_id"), toks.as("btok")),
      textCol = "btok")
  }

  /** MMR diversified re-ranking over the embeddings table (gate entry
    * t44): the same three query vectors as t43, top-20 exact-cosine
    * candidates, 5 greedy λ=0.7 rounds — see [[Similarity.mmrRerank]].
    * The oracle replays every greedy round in DuckDB on the identical
    * integer score arithmetic. */
  def mmrRerank(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    Similarity.mmrRerank(emb, emb.filter(col("vec_id") < 3), k = 5, kCand = 20)
  }

  /** Per-source HLL registers over the portable md5 hash family — pins the
    * hll_agg TypedImperativeAggregate itself against DuckDB (slot-max of
    * leading-zero ranks; see [[Sketch.registers]]). */
  def hllRegisters(spark: SparkSession, dir: String): DataFrame =
    Sketch.registers(spark, Tables.documents(spark, dir), "source",
      graft.operators.Sampling.hashBucket(col("text")))

  /** Per-source approximate distinct texts from the d15 sketch, with the
    * exact count alongside — oracle-checked including the harmonic-mean
    * estimate arithmetic (see [[Sketch.estimate]]). */
  def hllEstimate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val est = Sketch.estimate(
      Sketch.registers(spark, docs, "source",
        graft.operators.Sampling.hashBucket(col("text"))), "source")
    val exact = docs.groupBy("source")
      .agg(count_distinct(col("text")).as("n_exact"))
    est.join(exact, Seq("source"))
  }

  /** Per-source count-min sketch registers over whitespace tokens — pins
    * the cms_agg TypedImperativeAggregate itself against DuckDB (sum
    * counters, md5-substr bucketing; see [[Sketch.cmsRegisters]]). */
  def cmsRegisters(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir).select(col("source"),
      explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
    Sketch.cmsRegisters(spark, tok, "source", col("token"))
  }

  /** Count-min point estimates for a hash-sampled quarter of the per-source
    * vocabulary, next to the exact counts — oracle-checked including the
    * min-over-rows estimate arithmetic, so `est >= n_exact` (the CMS
    * one-sided error bound) is pinned cross-engine, not just asserted. */
  def cmsEstimate(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir).select(col("source"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
      .localCheckpoint(true) // one tokenize pass; registers + candidates read it
    val regs = Sketch.cmsRegisters(spark, tok, "source", col("token"))
    val cand = tok
      .filter(graft.operators.Sampling.hashBucket(col("token")) < 1073741824L)
      .groupBy("source", "token").agg(count(lit(1)).as("n_exact"))
    Sketch.cmsEstimate(regs, cand, "source", "token")
      .join(cand, Seq("source", "token")) // vocab-sized, hash-sampled: small
  }

  /** Per-event-type histogram-sketch registers over `value` — pins the
    * hist_agg TypedImperativeAggregate itself (bin-index arithmetic,
    * overflow slots, zero interior bins) against DuckDB. Domain
    * [0, 500) × 64 bins covers the generator's value range. */
  def histRegisters(spark: SparkSession, dir: String): DataFrame =
    Sketch.histRegisters(spark, Tables.events(spark, dir), "event_type",
      col("value"), lo = 0.0, hi = 500.0, bins = 64)

  /** Quantile estimates (p25/p50/p90) from the d23 sketch — oracle-checked
    * including the cumulative-scan + in-bin interpolation arithmetic, next
    * to the exact percentile they approximate in spirit (the sketch path
    * is what survives 100 TB; `r25` holds the exact form). */
  def histQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val regs = Sketch.histRegisters(spark, Tables.events(spark, dir),
      "event_type", col("value"), lo = 0.0, hi = 500.0, bins = 64)
    Sketch.histQuantiles(regs, "event_type", Seq(0.25, 0.5, 0.9),
      lo = 0.0, hi = 500.0, bins = 64)
  }

  /** Distribution DRIFT detection between two epochs, integer-exact: the
    * per-group L1 distance between the two halves' histogram sketches,
    * cross-multiplied into the long domain (Σ |c1·N2 − c2·N1| over slots)
    * so no normalization division ever leaves integers — the monitor a
    * 100 TB ingest runs per source/day to catch value-distribution shifts
    * without rescanning history (epoch sketches are the d23 registers,
    * storable and mergeable in the lake). Cost: two register relations
    * (groups × bins), one join, one agg — never corpus-sized twice. */
  def histDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("event_type", "value", "ts_ns")
    val b = ev.agg(min(col("ts_ns")).as("mn"), max(col("ts_ns")).as("mx")).head()
    val mid = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2
    def regs(half: DataFrame) = Sketch.histRegisters(spark, half, "event_type",
      col("value"), lo = 0.0, hi = 500.0, bins = 64)
    val r1 = regs(ev.filter(col("ts_ns") <= mid)).withColumnRenamed("cnt", "c1")
    val r2 = regs(ev.filter(col("ts_ns") > mid)).withColumnRenamed("cnt", "c2")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    // FULL outer: an event type seen in only one half must still report
    // (with the absent half zero-filled), matching the oracle's
    // all-groups × all-slots frame — an inner join would silently drop it.
    // Each half's registers are already dense (66 slots per present type),
    // so the unmatched side is exactly the half-sided types.
    r1.join(r2, Seq("event_type", "slot"), "full_outer")
      .na.fill(0L, Seq("c1", "c2"))
      .withColumn("n1", sum(col("c1")).over(w))
      .withColumn("n2", sum(col("c2")).over(w))
      .groupBy("event_type")
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        sum(abs(col("c1") * col("n2") - col("c2") * col("n1"))).as("l1_scaled"))
  }

  /** The approx-count-distinct OPTIMIZER REWRITE, oracle-checked: the
    * query says exact `count_distinct`; the session conf swaps in the HLL
    * sketch ([[graft.plans.ApproxDistinctRewrite]], md5 family) — and the
    * DuckDB oracle reproduces the rewritten plan's output bit-for-bit,
    * registers through estimate through the final half-up bigint. The
    * eager checkpoint forces planning while the conf is on (and keeps the
    * toggle from leaking into sibling gate entries). */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.graft.approxCountDistinct", "md5")
    try Tables.documents(spark, dir)
      .groupBy("source")
      .agg(count_distinct(col("text")).as("approx_texts"))
      .localCheckpoint(true)
    finally spark.conf.unset("spark.graft.approxCountDistinct")
  }

  /** Exact substring-span dedup over the corpus (gate entry d22): per-doc
    * duplicated-span statistics at K = 16 tokens. See
    * [[Dedup.substringDupStats]] for the fingerprint design; the oracle
    * rebuilds every window as a STRING in DuckDB, so the 64-bit hashed
    * production path is checked against exact string equality. */
  def substringDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.substringDupStats(Tables.documents(spark, dir))

  /** Heavy hitters, sketch-guided: tokens occurring ≥ 40 times in a source.
    * The CMS answers "which tokens MIGHT be heavy" without a
    * vocabulary-sized shuffle — est ≥ exact means no false negatives, so
    * filtering candidates by est ≥ N then re-counting EXACTLY only the
    * survivors (semi-join, then a groupBy over the filtered stream) returns
    * the precise answer while the only full-width aggregation state ever
    * built is groups × (d·w) counters. Oracle is the plain exact HAVING —
    * the two-phase plan must reproduce it verbatim. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir).select(col("source"),
        explode(TextAnalysis.tokens(lower(col("text")))).as("token"))
      .localCheckpoint(true) // one tokenize pass, three consumers
    val regs = Sketch.cmsRegisters(spark, tok, "source", col("token"))
    val cand = Sketch.cmsEstimate(regs, tok.distinct(), "source", "token")
      .filter(col("est") >= 40L)
    tok.join(cand.select("source", "token"), Seq("source", "token"), "left_semi")
      .groupBy("source", "token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 40L)
  }

  /** PII redaction, oracle-checked byte-for-byte: deterministic synthetic
    * PII (email / IPv4 / phone keyed on doc_id — the testdata corpus
    * carries none of its own) is injected identically on both engines,
    * then redacted with the shared lookaround-free patterns. Output pins
    * the full redacted text via md5 plus independent per-pattern counts. */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val injected = Tables.documents(spark, dir).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com now"))).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
            lit(".1"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0, lit(" call 555-867-5309"))
          .otherwise(lit(""))).as("t"))
    injected.select(
      col("doc_id"),
      TextAnalysis.piiCount(col("t"), TextAnalysis.EmailRe).as("n_email"),
      TextAnalysis.piiCount(col("t"), TextAnalysis.Ipv4Re).as("n_ip"),
      TextAnalysis.piiCount(col("t"), TextAnalysis.PhoneRe).as("n_phone"),
      length(TextAnalysis.redactPii(col("t"))).cast("long").as("clean_len"),
      md5(TextAnalysis.redactPii(col("t"))).as("clean_md5"))
  }
}
