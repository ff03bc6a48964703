package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization stats, quality scoring, language ID, and document
  * fingerprinting. Everything is built from codegen'd
  * `org.apache.spark.sql.functions` / SQL higher-order functions — no Scala
  * UDFs — so the whole pipeline stays inside WholeStageCodegen and scales
  * linearly with input splits (100 TB = map-only over parquet row groups).
  */
object TextAnalysis {

  /** Whitespace tokens, empties dropped (robust to leading/trailing space). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy count: GPT-style pre-tokenizer classes — runs of
    * letters, single digits, or single non-alphanumeric marks. A cheap,
    * deterministic stand-in for a real tokenizer's token count. (Pattern is
    * lookaround-free so the DuckDB/RE2 oracle can express it too.) */
  def bpeishCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))

  /** Punctuation character ratio (over all chars). */
  def punctRatio(text: Column): Column =
    round((length(text) - length(regexp_replace(text, "[.,!?;:]", ""))).cast("double")
      / greatest(length(text), lit(1)), 6)

  /** Stopword ratio over whitespace tokens (small English stopword set). */
  def stopwordRatio(text: Column, stopwords: Seq[String] = EnStopwords): Column = {
    val sw = array(stopwords.map(lit): _*)
    round(size(filter(tokens(lower(text)), t => array_contains(sw, t))).cast("double")
      / greatest(size(tokens(text)), lit(1)), 6)
  }

  /** Composite quality score in [0,1] — the usual pretraining-filter shape:
    * length in a sane band, not punctuation-soup, some stopword mass
    * (fluent prose has 20-60%), reasonable mean token length. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val meanTokLen = length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(nTok, lit(1))
    val lenOk = when(nTok.between(10, 100000), 1.0).otherwise(0.0)
    val punctOk = when(punctRatio(text) < 0.1, 1.0).otherwise(0.0)
    val swr = stopwordRatio(text)
    val swOk = when(swr.between(0.05, 0.7), 1.0).otherwise(0.0)
    val tokLenOk = when(meanTokLen.between(2.0, 12.0), 1.0).otherwise(0.0)
    round((lenOk + punctOk + swOk + tokLenOk) / 4.0, 4)
  }

  /** [[qualityScore]] as the native one-pass expression
    * (graft.functions.expr.TextQuality) — the production path for quality
    * gating a 100 TB scan; the declarative form above stays the
    * documented reference, pinned equal in TextAnalysisSpec. Requires
    * `GraftFunctions.register` / the session extension. */
  def qualityScoreNative(text: Column): Column =
    org.apache.spark.sql.functions.call_function("text_quality", text)

  /** Language ID over {en,es,de,fr,zh}: CJK character ratio decides zh;
    * otherwise the highest stopword-profile hit rate wins (ties → en).
    * Pure column expressions — a 100 TB scan stays map-only. */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    def hitRate(profile: Seq[String]): Column = {
      val arr = array(profile.map(lit): _*)
      size(filter(toks, t => array_contains(arr, t))).cast("double") /
        greatest(size(toks), lit(1))
    }
    val cjkRatio = (length(text) -
      length(regexp_replace(text, "[\\u4e00-\\u9fff]", ""))).cast("double") /
      greatest(length(text), lit(1))
    val en = hitRate(EnStopwords); val es = hitRate(EsStopwords)
    val de = hitRate(DeStopwords); val fr = hitRate(FrStopwords)
    when(cjkRatio > 0.05, "zh")
      .when(es > en && es >= de && es >= fr, "es")
      .when(de > en && de >= fr, "de")
      .when(fr > en, "fr")
      .otherwise("en")
  }

  /** [[langId]] as the native one-pass expression
    * (graft.functions.expr.LangId) — the production path; the declarative
    * form stays the documented reference, pinned equal in
    * TextAnalysisSpec. Requires registration. */
  def langIdNative(text: Column): Column =
    org.apache.spark.sql.functions.call_function("lang_id", text)

  /** 64-bit document fingerprint: min of Rabin-Karp-style rolling hashes of
    * 5-token windows (winnowing's keep-the-min rule collapsed to one value).
    * Deterministic; equal for texts that share their minimal window. */
  def fingerprint(text: Column, window: Int = 5): Column = {
    val toks = tokens(lower(text))
    val n = size(toks)
    val windows = when(n >= window,
      transform(sequence(lit(0), n - window),
        i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(window))))))
      .otherwise(array(xxhash64(concat_ws(" ", toks))))
    array_min(windows)
  }

  /** [[fingerprint]] with an engine-portable hash: first 8 hex chars of md5
    * as a 32-bit value (the same construction DuckDB/any SQL engine can
    * evaluate), so the fingerprint is oracle-checkable bit-for-bit. Use the
    * xxhash64 form in production (one compiled hash vs md5's allocation);
    * use this one when two engines must agree. */
  /** Overlapping token-window chunking — the RAG/pretraining prep step
    * that turns long documents into fixed-budget context pieces. Chunk k
    * covers tokens [k·stride, k·stride + size); the final chunk may be
    * shorter; every token is covered and consecutive chunks share
    * (size − stride) tokens. One map-side explode over a generated start
    * sequence — rows out ≈ rows in × (len/stride), no shuffle, and the
    * chunk text is pinned by md5 so the output stays narrow at 100 TB.
    * Requires stride ≥ 1 and ≤ size (gaps would drop tokens). */
  def chunkDocs(docs: DataFrame, size: Int = 50, stride: Int = 40,
                textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(stride >= 1 && stride <= size, s"need 1 <= stride <= size, got $stride/$size")
    docs
      .select(col(idCol), tokens(lower(col(textCol))).as("__t"))
      .withColumn("__n", size_(col("__t")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__t"),
        explode(sequence(lit(0), col("__n") - 1, lit(stride))).as("__s"))
      .select(col(idCol), (col("__s") / stride).cast("long").as("chunk_id"),
        slice(col("__t"), col("__s") + 1, lit(size)).as("__c"))
      .select(col(idCol), col("chunk_id"),
        size_(col("__c")).cast("long").as("n_tokens"),
        md5(concat_ws(" ", col("__c"))).as("chunk_md5"))
  }

  /** PARAGRAPH-level exact dedup (the C4/RefinedWeb "remove duplicated
    * paragraphs, keep the first occurrence" pass — doc-level near-dup
    * misses a paragraph shared by otherwise-distinct pages, and span
    * stats alone don't tell you what survives): documents chunk into
    * NON-overlapping `size`-token paragraphs ([[chunkDocs]] at stride =
    * size), each distinct paragraph content keeps exactly its FIRST
    * occurrence corpus-wide (deterministic: min (doc_id, chunk_id)), and
    * the result is one row per document with its surviving budget —
    * (doc_id, n_chunks, n_kept, kept_tokens). 100 TB shape: one shuffle
    * by 128-bit content hash (the dedup window) + the per-doc agg — never
    * an all-pairs comparison, state per distinct paragraph is O(1). */
  def paragraphDedup(docs: DataFrame, size: Int = 20,
                     textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val chunks = chunkDocs(docs, size, stride = size, textCol, idCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("chunk_md5")).orderBy(col(idCol), col("chunk_id"))
    chunks.withColumn("__rn", row_number().over(w))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        count(when(col("__rn") === 1, 1)).as("n_kept"),
        sum(when(col("__rn") === 1, col("n_tokens")).otherwise(0L)).as("kept_tokens"))
  }

  private def size_(c: Column): Column = size(c)

  def fingerprintPortable(text: Column, window: Int = 5): Column = {
    def h(c: Column) = conv(substring(md5(c), 1, 8), 16, 10).cast("long")
    val toks = tokens(lower(text))
    val n = size(toks)
    val windows = when(n >= window,
      transform(sequence(lit(0), n - window),
        i => h(concat_ws(" ", slice(toks, i + 1, lit(window))))))
      .otherwise(array(h(concat_ws(" ", toks))))
    array_min(windows)
  }

  /** One-pass stats projection over a documents table. */
  /** PII scrubbing (training corpora redact contact data before anything
    * trains on them). Patterns are deliberately lookaround-free so the
    * exact same regexes run under Java regex (Spark codegen'd
    * `regexp_replace`) and RE2 (the DuckDB oracle). Redaction order is
    * fixed (email → IPv4 → phone) and token-stable, so the output is
    * engine-portable byte-for-byte. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Match count for one PII pattern (counted on the ORIGINAL text —
    * per-pattern counts are independent of redaction order). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Unigram log-probability scoring (the CCNet-style LM-perplexity proxy
    * for corpus quality bucketing): per document, the mean negative log
    * probability of its tokens under the corpus's own unigram
    * distribution. Rare-token-heavy (noisy) documents score high, common
    * prose scores low; downstream pipelines bucket on it the way CCNet
    * buckets on KenLM perplexity.
    *
    * Shape at scale: one explode + one groupBy builds the term-frequency
    * table (vocabulary-sized, NOT corpus-sized), the corpus token total is
    * a scalar aggregate, and the per-doc score is one join + groupBy —
    * every stage partial-agg friendly, nothing collected but the scalar.
    * The exploded token relation has THREE consumers (frequency table,
    * scalar total, final join), so it is pinned once with an eager
    * localCheckpoint — without it every consumer re-tokenizes the corpus,
    * and at 100 TB tokenization is the dominant cost ×3. */
  def unigramLogProb(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.functions.{log => lnF}
    val toks = docs.select(col(idCol), explode(tokens(lower(col(textCol)))).as("__w"))
      .localCheckpoint(true)
    val freq = toks.groupBy(col("__w")).agg(count(lit(1)).cast("double").as("__c"))
    val total = toks.count().toDouble // scalar aggregate, not a data collect
    toks.join(freq, Seq("__w"))
      .groupBy(col(idCol))
      .agg(round(avg(-lnF(col("__c") / lit(total))), 6).as("avg_logprob"))
  }

  /** Bigram language-model score with add-k smoothing (the CCNet/KenLM-
    * style fluency proxy one order up from [[unigramLogProb]]): per doc,
    * the average of −ln((C(w1,w2) + k) / (C(w1) + k·V)) over its adjacent
    * token pairs, where C are corpus counts and V the unigram vocabulary
    * size. Repetitive, formulaic text scores low (predictable bigrams);
    * word salad scores high.
    *
    * Shape at scale: ONE tokenize pass (the token-array projection is
    * pinned with an eager localCheckpoint and feeds unigrams AND bigrams);
    * bigram construction is map-side `arrays_zip(slice, slice)` over the
    * pinned array — no window, no self-join; both frequency tables are
    * vocabulary-sized; V is a scalar aggregate, never a data collect.
    * Documents with fewer than two tokens have no bigrams and drop out
    * (mirrored by the oracle's inner joins). */
  def bigramLogProb(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id", k: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.functions.{log => lnF}
    val arr = docs.select(col(idCol), tokens(lower(col(textCol))).as("__a"))
      .localCheckpoint(true)
    val toks = arr.select(col(idCol), explode(col("__a")).as("__w"))
    val n1 = greatest(size(col("__a")) - 1, lit(0))
    val bi = arr.select(col(idCol), explode(arrays_zip(
        slice(col("__a"), lit(1), n1), slice(col("__a"), lit(2), n1))).as("__p"))
      .select(col(idCol),
        col("__p").getField("0").as("__w1"), col("__p").getField("1").as("__w2"))
    val uf = toks.groupBy(col("__w").as("__w1"))
      .agg(count(lit(1)).cast("double").as("__cu"))
    val vocabV = uf.count().toDouble // scalar aggregate, not a data collect
    val bf = bi.groupBy(col("__w1"), col("__w2"))
      .agg(count(lit(1)).cast("double").as("__cb"))
    bi.join(bf, Seq("__w1", "__w2")).join(uf, Seq("__w1"))
      .groupBy(col(idCol))
      .agg(round(avg(-lnF((col("__cb") + lit(k)) / (col("__cu") + lit(k * vocabV)))), 6)
        .as("avg_bigram_logprob"))
  }

  /** Pointwise mutual information over adjacent token pairs — the
    * collocation/word-association statistic (multi-word-expression mining,
    * tokenizer-merge candidates, topic drift probes):
    * pmi = ln(c12·Nt² / (Nb·c1·c2)) with token counts c1/c2, bigram count
    * c12, and corpus totals Nt/Nb. Pairs below `minCount` are cut (PMI is
    * unstable on rare pairs). Same single-tokenize-pass shape as
    * [[bigramLogProb]]: pinned arrays, map-side bigram construction,
    * vocabulary-sized count tables. */
  def pmiPairs(docs: DataFrame, minCount: Long = 5L,
               textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions.{log => lnF}
    val arr = docs.select(tokens(lower(col(textCol))).as("__a"))
      .localCheckpoint(true)
    val toks = arr.select(explode(col("__a")).as("__w"))
    val n1 = greatest(size(col("__a")) - 1, lit(0))
    val bi = arr.select(explode(arrays_zip(
        slice(col("__a"), lit(1), n1), slice(col("__a"), lit(2), n1))).as("__p"))
      .select(col("__p").getField("0").as("w1"), col("__p").getField("1").as("w2"))
    val uf = toks.groupBy(col("__w")).agg(count(lit(1)).as("__cu"))
    val tot = toks.count().toDouble // scalar aggregates, not data collects
    val totB = bi.count().toDouble
    bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
      .join(uf.withColumnRenamed("__w", "w1").withColumnRenamed("__cu", "__c1"), Seq("w1"))
      .join(uf.withColumnRenamed("__w", "w2").withColumnRenamed("__cu", "__c2"), Seq("w2"))
      .select(col("w1"), col("w2"), col("c12"),
        round(lnF(col("c12").cast("double") * lit(tot) * lit(tot) /
          (lit(totB) * col("__c1").cast("double") * col("__c2").cast("double"))), 6)
          .as("pmi"))
  }

  /** DSIR-style importance log-weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every document
    * by how much more likely its hashed-token bag is under the TARGET
    * distribution (rows matching `targetCond` — the trusted/high-quality
    * subset) than under the raw corpus. weight(d) = Σ_tokens ln(p̂_f) −
    * ln(q̂_f) over md5-hashed feature buckets with add-1 smoothing; docs
    * that look like the target get positive weights and survive the
    * downstream resample.
    *
    * Shape at scale: ONE tokenize+hash pass pinned with localCheckpoint
    * (feeds both count tables AND the scoring join); both distributions
    * live in a single `buckets`-sized table (one groupBy, broadcast back);
    * totals are one scalar aggregate. The md5 bucket family is
    * engine-portable, so the whole pipeline is oracle-checkable. */
  def dsirWeights(docs: DataFrame, targetCond: Column, buckets: Int = 1024,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.functions.{log => lnF}
    val toks = docs.select(col(idCol), targetCond.as("__t"),
        explode(tokens(lower(col(textCol)))).as("__w"))
      .withColumn("__f",
        conv(substring(md5(col("__w")), 1, 8), 16, 10).cast("long") % buckets)
      .drop("__w")
      .localCheckpoint(true)
    val stats = toks.groupBy(col("__f")).agg(
      count(lit(1)).cast("double").as("__qc"),
      sum(when(col("__t"), 1L).otherwise(0L)).cast("double").as("__pc"))
    val tot = toks.agg(count(lit(1)).cast("double"),
      sum(when(col("__t"), 1L).otherwise(0L)).cast("double")).head()
    val (qTot, pTot) = (tot.getDouble(0), tot.getDouble(1))
    toks.join(broadcast(stats), Seq("__f"))
      .groupBy(col(idCol))
      .agg(round(sum(
        lnF((col("__pc") + lit(1.0)) / lit(pTot + buckets)) -
          lnF((col("__qc") + lit(1.0)) / lit(qTot + buckets))), 6)
        .as("dsir_logweight"))
  }

  /** Vocabulary induction + per-doc out-of-vocabulary rate (the tokenizer-
    * coverage check run before committing to a vocab size): the top-V
    * tokens by corpus frequency become the vocabulary (total order =
    * count DESC, token ASC — deterministic through ties, so the vocab is
    * identical across partitionings and engines), then every document
    * reports how many of its token OCCURRENCES fall outside it.
    *
    * Shape at scale: the frequency table is vocabulary-sized, the top-V
    * cut is a TakeOrdered over that table (V rows to the driver, never
    * corpus data), and the per-doc count is one BROADCAST left join over
    * the exploded tokens + one groupBy — corpus touched by exactly one
    * tokenize pass (the exploded relation has two consumers, so it is
    * pinned with an eager localCheckpoint, the [[unigramLogProb]] rule). */
  def vocabOov(docs: DataFrame, vocabSize: Int = 25, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(lower(col(textCol)))).as("__w"))
      .localCheckpoint(true)
    val vocab = toks.groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w")).limit(vocabSize)
      .select(col("__w"), lit(1).as("__v"))
    toks.join(broadcast(vocab), Seq("__w"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__v").isNull, 1L).otherwise(0L)).as("n_oov"))
  }

  def textStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).as("n_chars"),
      tokenCount(col("text")).as("n_tokens"),
      bpeishCount(col("text")).as("n_bpeish"),
      punctRatio(col("text")).as("punct_ratio"))

  /** Hashed linear quality-classifier INFERENCE (the fastText-style filter
    * CCNet/RedPajama-class pipelines run over every document): each token
    * hashes to one of `buckets` features, each feature carries an integer
    * micro-weight, and the document's score is the weight sum — one
    * tokenize pass, map-side feature hash, a single per-doc aggregate.
    * Zero joins and zero shuffles beyond the doc groupBy: the weight here
    * is a pure md5 function of the bucket id (a deterministic stand-in for
    * trained weights, making the whole path engine-portable — oracle entry
    * t27); swapping in LEARNED weights is a broadcast join against a
    * buckets-sized weight table, the [[vocabOov]] shape, and changes
    * nothing else. Integer micros end-to-end: scores are hash-exact across
    * engines, partitionings, and retries. */
  def linearQualityScore(docs: DataFrame, buckets: Int = 4096,
                         textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), explode(tokens(lower(col(textCol)))).as("__w"))
      .withColumn("__f",
        conv(substring(md5(col("__w")), 1, 8), 16, 10).cast("long") % buckets)
      .withColumn("__wt",
        conv(substring(md5(concat(lit("w#"), col("__f").cast("string"))), 1, 8),
          16, 10).cast("long") % 1000001L - 500000L)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__wt")).as("score_micros"))
      .withColumn("keep", col("score_micros") > 0)

  /** BPE vocabulary induction (Sennrich et al. — the tokenizer-training
    * step of an LLM data pipeline): learn `rounds` byte-pair merges over
    * the corpus. Returns the merge table (merge_rank, lhs, rhs, freq) —
    * rank-ordered, the artifact a tokenizer ships.
    *
    * Scale shape: ONE corpus-sized tokenize+count collapses everything to
    * the word-frequency table (vocabulary-sized — Heaps' law, ~10^6 rows
    * at 100 TB, not corpus-sized); every round after that is one small
    * groupBy over adjacent symbol pairs + one map-side merge apply,
    * `localCheckpoint`ed per round (iterative-algorithm rule: cache()
    * would embed each round's plan in the next — lineage must truncate).
    * The per-round best pair is a 1-row collect. Only [a-z0-9]+ tokens
    * enter (the oracle-portable scope: no separator/char-splitting
    * ambiguity cross-engine); the operator generalizes to any alphabet.
    *
    * Merge application is the greedy left-to-right fold: a merged token
    * never re-merges as LEFT within its round (its string is lhs||rhs ≠
    * lhs — rhs is nonempty), which makes the declarative `aggregate` fold
    * exactly the classic positional scan, and the same fold is expressible
    * in any SQL engine with lambdas (oracle entry t26 replays it in DuckDB
    * via a separator-delimited `list_reduce`). */
  /** One greedy left-to-right BPE merge pass over a symbol array: merge
    * when the accumulated tail token is `l` and the incoming symbol is `r`
    * (try_element_at: null-safe on the empty accumulator — ANSI
    * element_at would throw). Shared by training ([[bpeMerges]]) and
    * inference ([[bpeEncode]]) so the two can never drift. */
  private def applyMerge(s: Column, l: String, r: String): Column = {
    val lL = lit(l); val rL = lit(r)
    aggregate(s, array().cast("array<string>"),
      (acc, x) => when(
        try_element_at(acc, lit(-1)) === lL && x === rL,
        concat(slice(acc, lit(1), size(acc) - 1), array(concat(lL, rL))))
        .otherwise(concat(acc, array(x))))
  }

  def bpeMerges(spark: org.apache.spark.sql.SparkSession, docs: DataFrame,
                rounds: Int = 4, textCol: String = "text"): DataFrame = {
    val words = docs
      .select(explode(tokens(lower(col(textCol)))).as("w"))
      .filter(col("w").rlike("^[a-z0-9]+$"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    var syms = words.select(col("cnt"),
        transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1))).as("s"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var rank = 1
    var dry = false
    while (rank <= rounds && !dry) {
      // adjacent-pair frequencies: arrays_zip over two slices (fields come
      // back "0"/"1" — non-attribute zip args, see build notes)
      val best = syms.select(col("cnt"),
          explode(arrays_zip(
            slice(col("s"), lit(1), size(col("s")) - 1),
            slice(col("s"), lit(2), size(col("s")) - 1))).as("pr"))
        .select(col("pr").getField("0").as("l"),
          col("pr").getField("1").as("r"), col("cnt"))
        .groupBy("l", "r").agg(sum("cnt").as("freq"))
        .orderBy(col("freq").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) dry = true
      else {
        val (l, r, f) = (best.head.getString(0), best.head.getString(1),
          best.head.getLong(2))
        merges += ((rank.toLong, l, r, f))
        syms = syms.select(col("cnt"), applyMerge(col("s"), l, r).as("s"))
          .localCheckpoint(true)
        rank += 1
      }
    }
    spark.createDataFrame(merges.toSeq)
      .toDF("merge_rank", "lhs", "rhs", "freq")
  }

  /** BPE ENCODING — tokenizer inference with a learned merge table (the
    * other half of the tokenizer story: [[bpeMerges]] trains the artifact,
    * this applies it), producing per-document subword counts — the token
    * budget number every context-length/packing/pricing decision reads.
    *
    * Scale shape: the merge table is rank-many rows (driver-side by
    * construction); encoding runs ONCE PER DISTINCT WORD on the
    * vocabulary-sized table (rank-ordered [[applyMerge]] folds — the same
    * shared fold as training, so inference can never drift from the
    * artifact), and the corpus pass is one tokenize + a broadcast join
    * against the (word → n_subwords) table + one per-doc aggregate. The
    * corpus is never folded per-row: at 100 TB the folds touch ~10⁶ vocab
    * rows while the join is map-side. Same scope rule as training
    * ([a-z0-9]+ words — the engine-portable alphabet). */
  def bpeEncode(spark: org.apache.spark.sql.SparkSession, docs: DataFrame,
                rounds: Int = 4, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val merges = bpeMerges(spark, docs, rounds, textCol)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))) // rank-many rows, tiny
    val vocab = docs
      .select(explode(tokens(lower(col(textCol)))).as("w"))
      .filter(col("w").rlike("^[a-z0-9]+$")).distinct()
    var enc = vocab.select(col("w"),
      transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1))).as("s"))
    merges.foreach { case (l, r) =>
      enc = enc.select(col("w"), applyMerge(col("s"), l, r).as("s"))
    }
    val nSym = enc.select(col("w"), size(col("s")).cast("long").as("n_sym"))
      .localCheckpoint(true) // pin the folds: computed once, vocab-sized
    docs.select(col(idCol), explode(tokens(lower(col(textCol)))).as("w"))
      .filter(col("w").rlike("^[a-z0-9]+$"))
      .join(broadcast(nSym), Seq("w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_bpe_tokens"))
  }

  /** Gopher-style repetition/quality rule set (Rae et al. 2021 §A1.1, the
    * document filters most public pretraining pipelines re-implement):
    * per-document duplicate-line and duplicate-paragraph fractions, the
    * fraction of characters inside the single most-repeated word bigram,
    * symbol-to-word ratio (`#` and `...`), alphabetic-word fraction, mean
    * word length, bullet/ellipsis line fractions, and the conjunction
    * `gopher_pass` at the paper's published thresholds.
    *
    * Shape at scale: one `localCheckpoint` pins the tokenized/split
    * arrays (CollapseProject would otherwise re-inline the splits into
    * every consuming metric), the scalar metrics are map-only over that
    * pin, and the only shuffle is the per-document bigram mode — keyed by
    * `doc_id`, so its cardinality is bounded by document count, never by
    * corpus size, and the mode itself is a two-level groupBy (no window,
    * no per-corpus state). The bigram tie-break is total (max count, then
    * lexicographically largest pair via struct ordering) so the result is
    * engine-portable — the DuckDB oracle reproduces it exactly. */
  def gopherRules(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    val base = docs.select(col(idCol), t.as("__t"),
        tokens(lower(t)).as("__toks"),
        filter(split(t, "\n"), l => l =!= "").as("__lines"),
        filter(split(t, "\n\n"), p => p =!= "").as("__paras"),
        length(regexp_replace(t, "\\s+", "")).as("__chars"))
      .localCheckpoint(true) // pin: feeds the metric select AND the bigram mode
    val nW = greatest(size(col("__toks")), lit(1))
    val nL = greatest(size(col("__lines")), lit(1))
    val nP = greatest(size(col("__paras")), lit(1))
    val metrics = base.select(
      col(idCol),
      size(col("__toks")).cast("long").as("n_words"),
      round(lit(1.0) - size(array_distinct(col("__lines"))).cast("double") / nL, 6)
        .as("dup_line_frac"),
      round(lit(1.0) - size(array_distinct(col("__paras"))).cast("double") / nP, 6)
        .as("dup_para_frac"),
      round(regexp_count(col("__t"), lit("#|\\.\\.\\.")).cast("double") / nW, 6)
        .as("symbol_word_ratio"),
      round(size(filter(col("__toks"), w => w.rlike("[a-z]"))).cast("double") / nW, 6)
        .as("alpha_word_frac"),
      round(col("__chars").cast("double") / nW, 6).as("mean_word_len"),
      round(size(filter(col("__lines"), l => l.rlike("^\\s*[-*]"))).cast("double") / nL, 6)
        .as("bullet_line_frac"),
      // \z, not $: Java's un-anchored $ also matches BEFORE a final line
      // terminator, so a CRLF line ("...\r") would count here but not in
      // the native endsWith kernel or the RE2 oracle (where $ already
      // means end-of-text). \z is end-of-input in all three engines.
      round(size(filter(col("__lines"), l => l.rlike("\\.\\.\\.\\z"))).cast("double") / nL, 6)
        .as("ellipsis_line_frac"))
    val n1 = greatest(size(col("__a")) - 1, lit(0))
    val bi = base.select(col(idCol), col("__chars"), col("__toks").as("__a"))
      .select(col(idCol), col("__chars"), explode(arrays_zip(
        slice(col("__a"), lit(1), n1), slice(col("__a"), lit(2), n1))).as("__p"))
      // arrays_zip over non-attribute slices names the struct fields "0"/"1"
      .select(col(idCol), col("__chars"),
        col("__p").getField("0").as("w1"), col("__p").getField("1").as("w2"))
    val top = bi.groupBy(col(idCol), col("__chars"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol), col("__chars"))
      .agg(max(struct(col("c"), col("w1"), col("w2"))).as("m"))
      .select(col(idCol),
        round(col("m.c").cast("double") * (length(col("m.w1")) + length(col("m.w2")))
          / greatest(col("__chars"), lit(1)), 6).as("top_bigram_char_frac"))
    metrics.join(top, Seq(idCol), "left")
      .na.fill(0.0, Seq("top_bigram_char_frac"))
      .withColumn("gopher_pass",
        col("n_words").between(50, 100000) &&
        col("mean_word_len").between(3.0, 10.0) &&
        col("symbol_word_ratio") <= 0.1 &&
        col("alpha_word_frac") >= 0.8 &&
        col("bullet_line_frac") <= 0.9 &&
        col("ellipsis_line_frac") <= 0.3 &&
        col("dup_line_frac") <= 0.3 &&
        col("dup_para_frac") <= 0.3 &&
        col("top_bigram_char_frac") <= 0.2)
  }

  /** Language-routed quality score (CCNet-style per-language curation
    * routing): [[qualityScore]]'s shape with the stopword gate evaluated
    * against the DECLARED language's own stopword list — an English
    * stopword gate run on Spanish prose flunks fluent text, which is why
    * multilingual pipelines route the gate per language. Languages
    * without a curated list here (zh) SKIP the stopword gate rather than
    * fail it. Same map-only cost as the base score. */
  def qualityScoreByLang(text: Column, lang: Column): Column = {
    val nTok = tokenCount(text)
    val meanTokLen = length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(nTok, lit(1))
    val lenOk = when(nTok.between(10, 100000), 1.0).otherwise(0.0)
    val punctOk = when(punctRatio(text) < 0.1, 1.0).otherwise(0.0)
    def band(r: Column) = when(r.between(0.05, 0.7), 1.0).otherwise(0.0)
    val swOk = when(lang === "en", band(stopwordRatio(text, EnStopwords)))
      .when(lang === "es", band(stopwordRatio(text, EsStopwords)))
      .when(lang === "de", band(stopwordRatio(text, DeStopwords)))
      .when(lang === "fr", band(stopwordRatio(text, FrStopwords)))
      .otherwise(lit(1.0))
    val tokLenOk = when(meanTokLen.between(2.0, 12.0), 1.0).otherwise(0.0)
    round((lenOk + punctOk + swOk + tokLenOk) / 4.0, 4)
  }

  /** Within-document duplicate-LINE removal (the rewrite counterpart to
    * [[gopherRules]]' dup_line_frac score — the CCNet/RefinedWeb cleaning
    * step that drops repeated lines, keeping the FIRST occurrence in
    * order, and rejoins the survivors). Returns `doc_id`, the cleaned
    * text's md5 (engine-portable), and the line counts before/after.
    *
    * Declarative reference: the keep-first filter is
    * `array_position(lines, l) == i` over the indexed line array — an
    * O(n²)-per-doc interpreted fold, which is why the production path is
    * the one-pass native kernel ([[dedupLinesNative]]). Map-only either
    * way: no shuffle, no cross-document state (cross-doc boilerplate
    * removal is [[graft.functions.Dedup.boilerplateShingles]]' job). */
  def dedupLines(docs: DataFrame, textCol: String = "text",
                 idCol: String = "doc_id"): DataFrame = {
    val lines = filter(split(col(textCol), "\n"), l => l =!= "")
    val base = docs.select(col(idCol), lines.as("__lines"))
      .localCheckpoint(true) // pin: the filter consumes the array thrice
    val kept = filter(transform(col("__lines"),
        (l, i) => struct(l.as("l"), i.as("i"))),
      s => array_position(col("__lines"), s.getField("l")) === s.getField("i") + 1)
    base.select(col(idCol),
      md5(array_join(transform(kept, s => s.getField("l")), "\n")).as("clean_md5"),
      size(col("__lines")).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"))
  }

  /** [[dedupLines]] as the native one-pass expression
    * (graft.functions.expr.DedupLines): hash-set keep-first in a single
    * row kernel — O(n) per document instead of the declarative form's
    * O(n²) interpreted array_position probe, and it stays inside
    * WholeStageCodegen. Pinned equal in TextAnalysisSpec. Requires
    * `GraftFunctions.register` / the session extension. */
  def dedupLinesNative(docs: DataFrame, textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    graft.GraftFunctions.register(docs.sparkSession)
    val g = org.apache.spark.sql.functions.call_function(
      "dedup_lines", col(textCol))
    docs.select(col(idCol), g.as("__d"))
      .select(col(idCol), md5(col("__d.clean_text")).as("clean_md5"),
        col("__d.n_lines").as("n_lines"), col("__d.n_kept").as("n_kept"))
  }

  /** Unicode-hygiene cleaning pass (the pre-tokenization fixup every
    * web-scale pipeline runs: CRLF soup → `\n`, C0 controls / DEL
    * stripped, NFC composition so decomposed accents stop fragmenting
    * vocabularies and byte-exact dedup) — one compiled pass per row via
    * the native `unicode_clean` kernel (Spark has no built-in NFC; the
    * correctness reference is the DuckDB `nfc_normalize` oracle, t41,
    * byte-compared via md5). Returns per-doc
    * (clean_md5, n_before, n_after, changed); counts are code points. */
  def unicodeClean(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    graft.GraftFunctions.register(docs.sparkSession)
    val g = org.apache.spark.sql.functions.call_function(
      "unicode_clean", col(textCol))
    docs.select(col(idCol), g.as("__u"))
      .select(col(idCol),
        md5(col("__u.clean_text")).as("clean_md5"),
        col("__u.n_before").as("n_before"),
        col("__u.n_after").as("n_after"),
        col("__u.changed").as("changed"))
  }

  /** C4 cleaning rule set (Raffel et al. 2020 §2.2 — the line filters
    * behind the C4 corpus, complementing the document-level Gopher gate):
    * keep only lines ending in terminal punctuation (`.` `!` `?` `"`)
    * with ≥3 words and no "javascript"; a document passes iff its CLEANED
    * text has ≥5 sentences and the original carries no "lorem ipsum" and
    * no `{`. Returns per-doc (total_lines, kept_lines, n_sentences,
    * c4_pass, clean_md5). DECLARATIVE REFERENCE — interpreted
    * higher-order line filters; the production path is [[c4RulesNative]]
    * (one compiled pass, pinned equal in TextAnalysisSpec). */
  def c4Rules(docs: DataFrame, textCol: String = "text",
              idCol: String = "doc_id"): DataFrame = {
    val lines = split(col(textCol), "\n")
    // \z, not $: end-of-INPUT terminal anchor on every engine (Java $
    // would also match before a CRLF line's trailing \r; RE2 $ would not)
    val keep = (l: Column) => l.rlike("[.!?\"]\\z") &&
      size(regexp_extract_all(l, lit("\\S+"), lit(0))) >= 3 &&
      !lower(l).contains("javascript")
    val kept = filter(lines, keep)
    val cleaned = array_join(kept, "\n")
    val sentences = regexp_count(cleaned, lit("[.!?]")).cast("long")
    docs.select(col(idCol),
      size(lines).cast("long").as("total_lines"),
      size(kept).cast("long").as("kept_lines"),
      sentences.as("n_sentences"),
      (sentences >= 5 && !lower(col(textCol)).contains("lorem ipsum") &&
        !col(textCol).contains("{")).as("c4_pass"),
      md5(cleaned).as("clean_md5"))
  }

  /** [[c4Rules]] as the native one-pass expression
    * (graft.functions.expr.C4Rules) — the production path: the whole
    * line/document rule set in one compiled scan per row, map-only,
    * zero shuffles, WholeStageCodegen; the kernel returns clean_text and
    * Spark's own `md5` hashes it (the dedup_lines pattern). Pinned equal
    * to the declarative reference in TextAnalysisSpec. Requires
    * `GraftFunctions.register` / the session extension. */
  def c4RulesNative(docs: DataFrame, textCol: String = "text",
                    idCol: String = "doc_id"): DataFrame = {
    graft.GraftFunctions.register(docs.sparkSession)
    val g = org.apache.spark.sql.functions.call_function(
      "c4_rules", col(textCol))
    docs.select(col(idCol), g.as("__c"))
      .select(col(idCol),
        col("__c.total_lines").as("total_lines"),
        col("__c.kept_lines").as("kept_lines"),
        col("__c.n_sentences").as("n_sentences"),
        col("__c.c4_pass").as("c4_pass"),
        md5(col("__c.clean_text")).as("clean_md5"))
  }

  /** [[gopherRules]] as the native one-pass struct expression
    * (graft.functions.expr.GopherMetrics) — the production path: the
    * per-document bigram mode moves into the row kernel, so the whole
    * rule set is map-only with ZERO shuffles (the declarative form needs
    * an explode + doc-keyed two-level groupBy for the same statistic).
    * The struct is expanded in one projection; whole-stage codegen's
    * subexpression elimination evaluates the kernel once per row. Pinned
    * equal to the declarative reference in TextAnalysisSpec. Requires
    * `GraftFunctions.register` / the session extension. */
  def gopherRulesNative(docs: DataFrame, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    graft.GraftFunctions.register(docs.sparkSession)
    val g = org.apache.spark.sql.functions.call_function(
      "gopher_metrics", col(textCol))
    docs.select(col(idCol), g.as("__g"))
      .select(col(idCol) +:
        graft.functions.expr.GopherMetrics.Schema.fieldNames.toSeq
          .map(f => col(s"__g.$f").as(f)): _*)
  }

  /** The rest of the Gopher repetition family (Rae et al. 2021 §A1.1):
    * `top_{3,4}gram_char_frac` (characters in the single most-repeated
    * n-gram; max-count then binary-largest joined gram tie-break) and
    * `dup_{5..10}gram_char_frac` (characters COVERED by any occurrence
    * of a duplicated n-gram — union of covered token positions, overlap
    * counted once), plus `repetition_pass` at the paper's thresholds.
    * The 2-gram member lives in [[gopherRules]].
    *
    * Declarative reference: per-n positional explode → per-(doc, n, gram)
    * count → top pick / duplicated-occurrence coverage union → pivot.
    * Every shuffle is doc-keyed (cardinality bounded by document count),
    * but it is cross-row machinery for a per-row statistic — the
    * production path is [[gopherNgramsNative]]'s one-pass kernel. */
  def gopherNgrams(docs: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    val ns = Seq(3, 4, 5, 6, 7, 8, 9, 10)
    val base = docs.select(col(idCol), tokens(lower(col(textCol))).as("__toks"),
        length(regexp_replace(col(textCol), "\\s+", "")).as("__chars"))
      .localCheckpoint(true) // pin: feeds occurrences, coverage, and the final join
    val withN = base.select(col(idCol), col("__chars"), col("__toks"),
      explode(array(ns.map(lit): _*)).as("n"))
    // sequence(1, 0) would DESCEND ([1, 0]); guard the empty case
    val m = size(col("__toks")) - col("n") + 1
    val posSeq = when(m >= 1, sequence(lit(1), m))
      .otherwise(array().cast("array<int>"))
    val occ = withN.select(col(idCol), col("__chars"), col("n"),
        explode(transform(posSeq, i => struct(i.as("i"),
          array_join(slice(col("__toks"), i, col("n")), " ").as("g")))).as("o"))
      .select(col(idCol), col("__chars"), col("n"),
        col("o.i").as("i"), col("o.g").as("g"))
    val cnt = occ.groupBy(col(idCol), col("__chars"), col("n"), col("g"))
      .agg(count(lit(1)).as("c"))
    val tops = cnt.filter(col("n") <= 4)
      .groupBy(col(idCol), col("__chars"), col("n"))
      .agg(max(struct(col("c"), col("g"))).as("m"))
      .select(col(idCol), col("n"),
        round(col("m.c").cast("double") * (length(col("m.g")) - (col("n") - 1))
          / greatest(col("__chars"), lit(1)), 6).as("frac"))
    val dupCovered = occ.filter(col("n") >= 5)
      .join(cnt.filter(col("c") >= 2)
        .select(col(idCol), col("n"), col("g")), Seq(idCol, "n", "g"))
      .select(col(idCol), col("n"),
        explode(sequence(col("i"), col("i") + col("n") - 1)).as("j"))
      .distinct() // overlap counted once
    val dups = dupCovered.join(base, Seq(idCol))
      .select(col(idCol), col("n"), col("__chars"),
        length(element_at(col("__toks"), col("j"))).as("len"))
      .groupBy(col(idCol), col("__chars"), col("n"))
      .agg(sum(col("len")).as("cov"))
      .select(col(idCol), col("n"),
        round(col("cov").cast("double") / greatest(col("__chars"), lit(1)), 6)
          .as("frac"))
    val wide = tops.unionByName(dups)
      .groupBy(col(idCol)).pivot("n", ns)
      .agg(first(col("frac")))
    val named = ns.map(n => if (n <= 4) s"top_${n}gram_char_frac"
      else s"dup_${n}gram_char_frac")
    val out = ns.zip(named).foldLeft(base.select(col(idCol))
        .join(wide, Seq(idCol), "left")) { case (d, (n, nm)) =>
      d.withColumn(nm, coalesce(col(s"`$n`"), lit(0.0))).drop(n.toString)
    }
    out.withColumn("repetition_pass",
      col("top_3gram_char_frac") <= 0.18 && col("top_4gram_char_frac") <= 0.16 &&
      col("dup_5gram_char_frac") <= 0.15 && col("dup_6gram_char_frac") <= 0.14 &&
      col("dup_7gram_char_frac") <= 0.13 && col("dup_8gram_char_frac") <= 0.12 &&
      col("dup_9gram_char_frac") <= 0.11 && col("dup_10gram_char_frac") <= 0.10)
  }

  /** [[gopherNgrams]] as the native one-pass expression
    * (graft.functions.expr.GopherNgrams): all eight n-gram statistics in
    * a single row kernel — map-only, zero shuffles, WholeStageCodegen.
    * Pinned equal to the declarative reference in TextAnalysisSpec.
    * Requires `GraftFunctions.register` / the session extension. */
  def gopherNgramsNative(docs: DataFrame, textCol: String = "text",
                         idCol: String = "doc_id"): DataFrame = {
    graft.GraftFunctions.register(docs.sparkSession)
    val g = org.apache.spark.sql.functions.call_function(
      "gopher_ngrams", col(textCol))
    docs.select(col(idCol), g.as("__g"))
      .select(col(idCol) +:
        graft.functions.expr.GopherNgrams.Schema.fieldNames.toSeq
          .map(f => col(s"__g.$f").as(f)): _*)
  }

  val EnStopwords: Seq[String] = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "that", "for", "on", "with", "as", "was", "at", "by")
  val EsStopwords: Seq[String] = Seq("el", "la", "los", "las", "un", "una", "y",
    "o", "de", "en", "es", "que", "por", "con", "para", "del", "se", "no")
  val DeStopwords: Seq[String] = Seq("der", "die", "das", "ein", "eine", "und",
    "oder", "von", "zu", "im", "ist", "dass", "für", "auf", "mit", "als", "den")
  val FrStopwords: Seq[String] = Seq("le", "la", "les", "un", "une", "et", "ou",
    "de", "en", "est", "que", "pour", "sur", "avec", "du", "au", "des", "ne")
}
