package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{log => lnF, _}

/** Keyword retrieval over a document corpus: the inverted index + BM25
  * ranking a curation pipeline uses to pull topical slices out of a
  * pretraining corpus (and the classic "find near-matches of this eval
  * prompt" forensics query).
  *
  * Scale shape: the postings list (doc, term, tf) is ONE tokenize +
  * groupBy over the corpus, checkpointed once because four consumers
  * derive from it (doc lengths, document frequencies, corpus stats, the
  * query join — the t13 lesson: never re-tokenize). The query set is
  * broadcast — scoring touches only postings whose term appears in some
  * query, so a 100 TB corpus is filtered down map-side before the
  * (query, doc) aggregation shuffle. Top-k per query is a bounded window.
  *
  * Scoring is FIXED-POINT: each term's BM25 contribution is rounded to
  * integer micro-units and summed as a long. Floating-point accumulation
  * order is nondeterministic under re-partitioning (the same query can
  * rank differently run-to-run at the ulp level); integer accumulation
  * makes scores total-order deterministic across partitionings AND
  * engines — which is also what makes the DuckDB oracle (t16) exact.
  */
object Retrieval {

  /** Whitespace postings: one (docCol, term, tf) row per distinct token
    * per document. */
  def postings(docs: DataFrame, textCol: String = "text",
               docCol: String = "doc_id"): DataFrame =
    docs.select(col(docCol), explode(TextAnalysis.tokens(lower(col(textCol)))).as("term"))
      .groupBy(col(docCol), col("term")).agg(count(lit(1)).as("tf"))

  /** BM25 top-k: score every corpus document against every query row
    * (`queries` must have columns (query_id, qtext) and be SMALL — it is
    * broadcast). Lucene's non-negative idf variant
    * ln(1 + (N - df + 0.5)/(df + 0.5)); k1=1.2, b=0.75. Returns
    * (query_id, doc_id, score_u, rank) with score_u in integer
    * micro-units (score = score_u / 1e6). */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int = 10,
               textCol: String = "text", docCol: String = "doc_id"): DataFrame = {
    val tf = postings(docs, textCol, docCol).localCheckpoint(true)
    val dl = tf.groupBy(col(docCol)).agg(sum(col("tf")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sdl")).first()
    val n = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / n // one division, engine-identical

    val qterms = queries.select(col("query_id"),
      explode(array_distinct(TextAnalysis.tokens(lower(col("qtext"))))).as("term"))

    // idf and tf-norm written in the exact operand order the oracle uses,
    // so the double product is bit-identical before fixed-point rounding.
    val idf = lnF(lit(1.0) + (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = col("tf") * lit(2.2) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl)))
    val contrib = round(idf * tfNorm * lit(1000000.0)).cast("long")

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_u").desc, col(docCol))
    tf.join(broadcast(qterms), Seq("term"))
      .join(dl, Seq(docCol))
      .join(dfreq, Seq("term"))
      .groupBy(col("query_id"), col(docCol))
      .agg(sum(contrib).as("score_u"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
