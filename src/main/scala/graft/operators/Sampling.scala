package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation at scale.
  *
  * Both operators key off `md5(key)` rather than `rand()`: the sample is a
  * pure function of the data, so re-runs, retries, and incremental reruns
  * over new partitions select the SAME rows (a rand() sample re-drawn per
  * task attempt is not even self-consistent under speculative execution),
  * and the oracle can reproduce it bit-for-bit (md5 is the same function
  * in every engine, unlike xxhash64/rand seeds).
  *
  * Scale shape: `hashSample` is a pure filter — no shuffle, pushes through
  * any plan, trivially parallel. `quotaPerGroup` is one hash shuffle on the
  * group key + a bounded per-group sort (the same shape as any windowed
  * top-k); group skew salts like any keyed operator.
  */
object Sampling {

  /** First 8 hex chars of md5 as a uniform 32-bit bucket value. */
  def hashBucket(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")

  /** Sequence PACKING for training runs: assign each document to a
    * fixed-token-budget context bin, deterministically. Docs are spread
    * over `nBuckets` independent packing streams by md5 (so the packing
    * parallelizes — one global greedy stream would be a single-partition
    * window, the anti-pattern), take the md5 order within their stream,
    * and bin k holds the docs whose running predecessor token total lies
    * in [k·budget, (k+1)·budget) — greedy packing where a boundary doc
    * overflows its bin rather than splitting. One hash shuffle + one
    * bounded window; every step is md5-deterministic, so retries and
    * other engines reproduce the exact same bins (oracle entry
    * `t9_sequence_pack`). `tokenCol` is any precomputed length column. */
  def sequencePack(df: DataFrame, keyCol: String, tokenCol: Column,
                   budget: Int = 2048, nBuckets: Int = 8): DataFrame = {
    val h = hashBucket(col(keyCol))
    val w = Window.partitionBy(col("bucket")).orderBy(col("__h"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__h", h)
      .withColumn("n_tokens", tokenCol.cast("long"))
      .withColumn("bucket", pmod(col("__h"), lit(nBuckets.toLong)))
      .withColumn("__cum", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin_id", expr(s"__cum div $budget"))
      .select(col(keyCol), col("bucket"), col("bin_id"), col("n_tokens"))
  }

  /** Keep ~`num/den` of rows, deterministically by key: rows whose md5
    * bucket falls in [0, num/den) of the 32-bit space. */
  def hashSample(df: DataFrame, keyCol: String, num: Long, den: Long): DataFrame = {
    require(num >= 0 && den > 0 && num <= den, s"bad fraction $num/$den")
    // 2^32 * num / den, exact in Long arithmetic
    df.filter(hashBucket(col(keyCol)) < lit((4294967296L * num) / den))
  }

  /** Weighted domain-MIXTURE sampling: keep a different deterministic
    * fraction of each group — the way a training mix is composed (60% web,
    * 20% code, 20% books) when groups must be DOWN-sampled to hit target
    * proportions. `weights` maps group value → (num, den) keep-fraction;
    * unlisted groups keep `default`. Unlike [[quotaPerGroup]] (exact count
    * cap, one shuffle) this is a PURE FILTER — rate-based, no shuffle, no
    * window — so it composes with any scan and runs map-only at 100 TB;
    * each row's fate depends only on its own key's md5, so retries,
    * incremental re-runs, and other engines select the same rows. */
  def mixtureSample(df: DataFrame, groupCol: String, keyCol: String,
                    weights: Seq[(String, Long, Long)],
                    default: (Long, Long) = (0L, 1L)): DataFrame = {
    def thresh(num: Long, den: Long): Long = {
      require(num >= 0 && den > 0 && num <= den, s"bad fraction $num/$den")
      (4294967296L * num) / den // 2^32 * num / den, exact in Long
    }
    val cutoff = weights.foldLeft(when(lit(false), lit(0L))) {
      case (acc, (g, num, den)) => acc.when(col(groupCol) === g, lit(thresh(num, den)))
    }.otherwise(lit(thresh(default._1, default._2)))
    df.filter(hashBucket(col(keyCol)) < cutoff)
  }

  /** TEMPERATURE-balanced mixture (the multilingual sampling rule of
    * mBERT/XLM-R/mT5: languages are drawn with probability ∝ p^α, α ∈
    * (0, 1] flattening the natural distribution so head languages stop
    * drowning the tail). Unlike [[mixtureSample]] (caller-supplied
    * weights), the per-group keep RATES derive from the OBSERVED
    * distribution: r_g = (cnt_min / cnt_g)^(1−α), ppm-quantized — the
    * sampled counts are then ∝ p_g^α with the smallest group kept whole
    * (pure down-sampling; compose [[mixtureEpochs]] to up-sample the
    * tail instead). Cost: ONE metadata-sized groupBy (|groups| rows to
    * the driver) to fix the rates, then the same md5-deterministic
    * map-only filter as mixtureSample — retry/engine-stable, composes
    * with any scan at 100 TB. */
  def temperatureSample(df: DataFrame, groupCol: String, keyCol: String,
                        alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"temperature alpha must be in (0, 1], got $alpha")
    val counts = df.groupBy(col(groupCol)).count().collect()
      .map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toSeq
    require(counts.nonEmpty, "temperatureSample over an empty relation")
    val cMin = counts.map(_._2).min
    val weights = counts.map { case (g, n) =>
      (g, math.floor(1e6 * math.pow(cMin.toDouble / n, 1 - alpha)).toLong, 1000000L)
    }
    mixtureSample(df, groupCol, keyCol, weights)
  }

  /** Mixture UP-sampling: replicate each group's rows to a fractional
    * epoch count — the other half of training-mix composition (a 2.5-epoch
    * source repeats every doc twice and a deterministic half of them a
    * third time; cf. the multi-epoch treatment high-quality sources get in
    * published pretraining mixes). `epochs` maps group → (num, den) with
    * num/den ≥ 0 allowed above 1; unlisted groups get `default`. Each row
    * emits floor(num/den) copies plus one more iff its key's md5 bucket
    * falls under the fractional remainder — so the expected multiplicity
    * is exactly num/den, the DRAW is a pure function of the key (retries,
    * engines agree), and the whole operator is one explode over a
    * generated epoch sequence: map-side row generation, no shuffle, no
    * window. Output keeps every input column plus `epoch` (1-based). */
  def mixtureResample(df: DataFrame, groupCol: String, keyCol: String,
                      epochs: Seq[(String, Long, Long)],
                      default: (Long, Long) = (1L, 1L)): DataFrame = {
    def whole(num: Long, den: Long): Long = { require(num >= 0 && den > 0); num / den }
    def fracThresh(num: Long, den: Long): Long = (4294967296L * (num % den)) / den
    val wholeCol = epochs.foldLeft(when(lit(false), lit(0L))) {
      case (acc, (g, num, den)) => acc.when(col(groupCol) === g, lit(whole(num, den)))
    }.otherwise(lit(whole(default._1, default._2)))
    val fracCol = epochs.foldLeft(when(lit(false), lit(0L))) {
      case (acc, (g, num, den)) => acc.when(col(groupCol) === g, lit(fracThresh(num, den)))
    }.otherwise(lit(fracThresh(default._1, default._2)))
    val copies = wholeCol + when(hashBucket(col(keyCol)) < fracCol, 1L).otherwise(0L)
    df.withColumn("__n", copies)
      .filter(col("__n") > 0)
      .withColumn("epoch", explode(sequence(lit(1L), col("__n"))))
      .drop("__n")
  }

  /** Deterministic train/valid/test split assignment: the key's md5 bucket
    * against cumulative fraction thresholds — a pure map-side projection,
    * stable under retries, re-runs, and engines, and consistent for a key
    * across tables (join-safe: a doc and its embeddings land in the same
    * split). `splits` are (label, fraction) with fractions summing ≤ 1;
    * the remainder falls to `rest`. */
  def assignSplits(df: DataFrame, keyCol: String,
                   splits: Seq[(String, Double)] = Seq("train" -> 0.8, "valid" -> 0.1),
                   rest: String = "test"): DataFrame = {
    val thresholds = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
      .map(f => (f * 4294967296.0).toLong)
    val h = hashBucket(col(keyCol))
    val label = splits.zip(thresholds).foldLeft(when(lit(false), lit(""))) {
      case (acc, ((name, _), t)) => acc.when(h < t, name)
    }.otherwise(rest)
    df.withColumn("split", label)
  }

  /** TOKEN-BUDGET sampling: per group, keep documents in the
    * deterministic md5 order until the group's TOKEN budget is exhausted
    * — a training mix is specified in tokens, not documents ("50 B tokens
    * of web, 5 B of code"), so the per-group cut must land on a token
    * boundary of a reproducible order. A document is kept iff the token
    * total of its md5-order PREDECESSORS is below the budget — the greedy
    * prefix; the boundary document overflows rather than splitting (the
    * [[sequencePack]] bin rule). Groups absent from `budgets` keep
    * nothing (budget 0) unless `defaultBudget` says otherwise.
    *
    * Scale shape: the same two-level rank as [[corpusShuffle]] — the
    * first md5 BYTE sub-buckets each group in order-key-prefix order, so
    * per-(group, bucket) token sums (metadata-sized) broadcast as prefix
    * offsets and each running-sum window holds group/256 rows, never one
    * task per group. Output keeps the input columns plus `n_tokens`. */
  def tokenBudgetSample(df: DataFrame, groupCol: String, keyCol: String,
                        tokenCol: Column, budgets: Map[String, Long],
                        defaultBudget: Long = 0L): DataFrame = {
    val withH = df
      .withColumn("n_tokens", tokenCol.cast("long"))
      .withColumn("__h", md5(col(keyCol).cast("string")))
      .withColumn("__b", conv(substring(col("__h"), 1, 2), 16, 10).cast("int"))
    val offsets = withH.groupBy(col(groupCol), col("__b"))
      .agg(sum(col("n_tokens")).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(
        Window.partitionBy(col(groupCol)).orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__n")
    val budgetCol = budgets.foldLeft(when(lit(false), lit(0L))) {
      case (acc, (g, b)) => acc.when(col(groupCol) === g, lit(b))
    }.otherwise(lit(defaultBudget))
    withH.join(broadcast(offsets), Seq(groupCol, "__b"))
      .withColumn("__pre", col("__off") + coalesce(sum(col("n_tokens")).over(
        Window.partitionBy(col(groupCol), col("__b"))
          .orderBy(col("__h"), col(keyCol))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("__pre") < budgetCol)
      .select(df.columns.map(col).toSeq :+ col("n_tokens"): _*)
  }

  /** Deterministic CORPUS SHUFFLE + shard assignment — the training-data
    * handoff after packing: every row gets a shard (`pmod(md5-bucket, n)`)
    * and a 1-based position within its shard under the md5 total order,
    * so the "shuffled" epoch order is a pure function of the data — the
    * exact reproducibility contract of [[hashSample]]/[[assignSplits]]
    * (retries, re-runs and other engines produce byte-identical shards,
    * which a `rand()` shuffle cannot).
    *
    * Scale shape: positions are NOT a per-shard global window (one task
    * per shard would sort corpus/n rows — dead at 100 TB). The first md5
    * BYTE is a sub-bucket that agrees with the md5 order (it is the order
    * key's prefix), so per-(shard, bucket) counts — a metadata-sized
    * aggregate — yield broadcastable prefix offsets, and the rank inside
    * each (shard, bucket) window is corpus/(n·256) rows per task:
    * `pos = offset(shard, bucket) + rank within (shard, bucket)`. One
    * hash shuffle + one bounded window, same as [[sequencePack]]. */
  def corpusShuffle(df: DataFrame, keyCol: String, nShards: Int,
                    /** Epoch salt: a non-empty salt (e.g. "epoch2") keys
                      * the order AND shard off `md5(key + "#" + salt)` —
                      * each epoch re-shuffles into a fresh deterministic
                      * permutation, still a pure function of (data,
                      * salt). Empty = the canonical order (`t32`). */
                    salt: String = ""): DataFrame = {
    require(nShards > 0, s"corpusShuffle needs a positive shard count, got $nShards")
    val keyExpr =
      if (salt.isEmpty) col(keyCol).cast("string")
      else concat(col(keyCol).cast("string"), lit("#" + salt))
    val withH = df
      .withColumn("__h", md5(keyExpr))
      .withColumn("shard_id", pmod(hashBucket(keyExpr), lit(nShards.toLong)))
      .withColumn("__b", conv(substring(col("__h"), 1, 2), 16, 10).cast("int"))
    val offsets = withH.groupBy(col("shard_id"), col("__b"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(
        Window.partitionBy(col("shard_id")).orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__n")
    withH.join(broadcast(offsets), Seq("shard_id", "__b"))
      .withColumn("pos",
        col("__off") + row_number().over(
          Window.partitionBy(col("shard_id"), col("__b"))
            .orderBy(col("__h"), col(keyCol))).cast("long"))
      // the using-join fronts its keys — pin the user-facing order
      // (input columns, then shard_id/pos) explicitly
      .select(df.columns.map(col).toSeq ++ Seq(col("shard_id"), col("pos")): _*)
  }

  /** GPT-style CONCAT-AND-CHUNK packing: the corpus laid out as ONE
    * deterministic token stream (md5 order, document boundaries ignored
    * — the other packing discipline next to [[sequencePack]]'s
    * per-document bins) and cut into fixed `seqLen`-token training
    * windows. Per document: its global token start offset and the
    * first/last window ids it lands in (a doc spans
    * `last_window - first_window + 1` windows).
    *
    * The global offset is a PREFIX SUM over the total md5 order —
    * computed two-level like [[corpusShuffle]]'s rank: first-md5-byte
    * sub-buckets give a metadata-sized (256-row) bucket-total relation
    * whose running sum broadcasts back as each bucket's base offset, and
    * a window partitioned BY BUCKET adds the intra-bucket running sum —
    * so no single-partition global window ever materializes, at any
    * corpus size. Pure key functions end to end: retry/engine
    * deterministic (oracle t42 replays the cumulative sum in DuckDB). */
  def concatPack(df: DataFrame, keyCol: String, tokenCol: Column,
                 seqLen: Long): DataFrame = {
    require(seqLen > 0, s"concatPack needs a positive seqLen, got $seqLen")
    val withH = df
      .withColumn("__t", tokenCol.cast("long"))
      .withColumn("__h", md5(col(keyCol).cast("string")))
      .withColumn("__b", conv(substring(col("__h"), 1, 2), 16, 10).cast("int"))
    val offsets = withH.groupBy(col("__b"))
      .agg(sum(col("__t")).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(
        Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__n") // 256 rows — the only "global" state, broadcast back
    withH.join(broadcast(offsets), Seq("__b"))
      .withColumn("start_offset",
        col("__off") + coalesce(sum(col("__t")).over(
          Window.partitionBy(col("__b")).orderBy(col("__h"), col(keyCol))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_tokens", col("__t"))
      .withColumn("first_window", expr(s"start_offset div ${seqLen}L"))
      .withColumn("last_window",
        expr(s"greatest(start_offset, start_offset + n_tokens - 1) div ${seqLen}L"))
      .select(col(keyCol), col("n_tokens"), col("start_offset"),
        col("first_window"), col("last_window"))
  }

  /** The shard WRITER half of [[corpusShuffle]]: one dir per shard
    * (`shard_id=<k>/`), rows inside each file in the deterministic md5
    * order (`sortWithinPartitions` after clustering by shard — a range
    * exchange plus local sort, never a single-task shard sort). Returns
    * the written shard dirs. */
  def writeShards(df: DataFrame, keyCol: String, nShards: Int,
                  outDir: String): Seq[String] = {
    corpusShuffle(df, keyCol, nShards)
      .repartition(nShards, col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("pos"))
      .write.partitionBy("shard_id").mode("overwrite").parquet(outDir)
    (0 until nShards).map(k => s"$outDir/shard_id=$k")
  }

  /** Per-group quota: at most `n` rows per value of `groupCol`, chosen as
    * the n smallest md5 buckets (a deterministic uniform draw). The cap a
    * curation pipeline puts on any one source/domain so no group dominates
    * the training mix.
    *
    * Scale shape (the [[corpusShuffle]] two-level trick): a plain
    * `row_number` over `partitionBy(group)` sorts EVERY row of a group in
    * one task — dead when one domain approaches partition size at 100 TB.
    * The top 8 bits of the 32-bit order key form a sub-bucket that agrees
    * with the (hashBucket, key) total order (it is the order key's
    * prefix), so per-(group, bucket) counts — a metadata-sized aggregate —
    * give each bucket's prefix offset, buckets wholly past the quota drop
    * BEFORE any ranking (for n ≪ group only ~n/group of each group ever
    * enters a window), and the remaining rank windows are group/256-sized.
    * The selected row set is EXACTLY the old single-window `row_number ≤ n`
    * (SamplingSpec pins the equality). */
  def quotaPerGroup(df: DataFrame, groupCol: String, keyCol: String, n: Int): DataFrame = {
    val withB = df.withColumn("__qh", hashBucket(col(keyCol)))
      .withColumn("__qb", shiftright(col("__qh"), 24).cast("int"))
    val offsets = withB.groupBy(col(groupCol), col("__qb"))
      .agg(count(lit(1)).as("__qn"))
      .withColumn("__qoff", coalesce(sum(col("__qn")).over(
        Window.partitionBy(col(groupCol)).orderBy(col("__qb"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("__qoff") < n) // whole buckets past the quota never rank
      .drop("__qn")
    val w = Window.partitionBy(col(groupCol), col("__qb"))
      .orderBy(col("__qh"), col(keyCol)) // key tiebreak: total order
    withB.join(offsets, Seq(groupCol, "__qb")) // inner join prunes dropped buckets
      .withColumn("__qrn", row_number().over(w) + col("__qoff"))
      .filter(col("__qrn") <= n)
      .select(df.columns.map(col): _*) // the join reordered; pin caller order
  }
}
