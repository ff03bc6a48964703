package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = graft.Tables.embeddings(spark, TestSpark.sfDir).cache()
  private lazy val queries = emb.filter($"vec_id" < 5)

  test("mmr_select kernel == k-round DataFrame loop (same inputs, bit-identical)") {
    graft.GraftFunctions.register(spark)
    // real corpus inputs + the synthetic flip corpus; compare full rows
    def rowsOf(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "doc_id", "step", "mmr_u")
      .collect().map(_.toSeq).toSet
    val (cand, pairs) = Similarity.mmrInputs(emb, queries, kCand = 20)
    val kernel = Similarity.mmrRerank(emb, queries, k = 5, kCand = 20)
    val loop = Similarity.mmrRerankLoop(cand, pairs, k = 5)
    assert(rowsOf(kernel) == rowsOf(loop),
      "compiled greedy selection must equal the k-round loop")
    // k larger than the candidate pool: both stop at pool exhaustion
    val tiny = emb.filter($"vec_id" < 4)
    val (c2, p2) = Similarity.mmrInputs(tiny, tiny.filter($"vec_id" === 0), kCand = 3)
    assert(rowsOf(Similarity.mmrRerank(tiny, tiny.filter($"vec_id" === 0),
        k = 9, kCand = 3)) ==
      rowsOf(Similarity.mmrRerankLoop(c2, p2, k = 9)))
    // k <= 0: the reference loop still emits its unconditional step-1 pick
    // (its round loop is 2..k = empty); the kernel must match, not crash
    assert(rowsOf(Similarity.mmrRerank(tiny, tiny.filter($"vec_id" === 0),
        k = 0, kCand = 3)) ==
      rowsOf(Similarity.mmrRerankLoop(c2, p2, k = 0)))
  }

  test("mmrRerank: diversity flips the greedy pick; deterministic under repartition") {
    // q=(1,0,0,0); a,b near-duplicates at rel≈0.707/0.702; c diverse at
    // rel≈0.697. Pure relevance ranks (a, b, c); MMR's step 2 must take
    // c — b's 3·max_sim penalty to the already-picked a (~1.0) dwarfs its
    // relevance edge, while cos(a, c)≈0.5.
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // the query
      (1L, Seq(0.7f, 0.70f, 0.0f, 0.0f)),  // a
      (2L, Seq(0.7f, 0.71f, 0.0f, 0.0f)),  // b ≈ a
      (3L, Seq(0.69f, 0.0f, 0.71f, 0.0f)), // c, diverse
      (4L, Seq(0.0f, 0.1f, 0.0f, 1.0f)))   // filler, low relevance
      .toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(rows, rows.filter($"vec_id" === 0),
      k = 3, kCand = 4)
      .orderBy("query_id", "step").collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[Long]("doc_id")))
    assert(got.toSeq == Seq(1L -> 1L, 2L -> 3L, 3L -> 2L),
      s"expected greedy picks a, c, b — got ${got.mkString(", ")}")
    // pure relevance would have picked b second
    val pure = Similarity.bruteForceTopK(rows, rows.filter($"vec_id" === 0), k = 2)
      .orderBy($"cos_sim".desc).collect().map(_.getAs[Long]("neighbor_id"))
    assert(pure.toSeq == Seq(1L, 2L))
    // partitioning invariance: same integer scores, same picks
    val re = Similarity.mmrRerank(rows.repartition(7),
      rows.filter($"vec_id" === 0), k = 3, kCand = 4)
      .orderBy("query_id", "step").collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("mmr_u")))
    val base = Similarity.mmrRerank(rows, rows.filter($"vec_id" === 0),
      k = 3, kCand = 4)
      .orderBy("query_id", "step").collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("mmr_u")))
    assert(re.toSeq == base.toSeq)
    // structure over the real corpus: k rows per query, distinct docs,
    // step-1 equals the relevance argmax
    val corpus = Similarity.mmrRerank(emb, queries, k = 5, kCand = 20)
      .cache()
    assert(corpus.groupBy("query_id").count().collect()
      .forall(_.getLong(1) == 5))
    assert(corpus.select("query_id", "doc_id").distinct().count() == corpus.count())
    val top1 = Similarity.bruteForceTopK(emb, queries, k = 1)
      .select($"query_id", $"neighbor_id".as("doc_id"))
    assert(corpus.filter($"step" === 1).select("query_id", "doc_id")
      .except(top1).isEmpty)
    corpus.unpersist()
  }

  test("cosine: unit self-similarity, sign sanity") {
    val r = emb.limit(3).select(Similarity.cosine($"embedding", $"embedding").as("c"))
      .collect().map(_.getDouble(0))
    r.foreach(c => assert(math.abs(c - 1.0) < 1e-9))
  }

  test("randomProject: scalar sign recomputation; JL distances roughly preserved") {
    val proj = Similarity.randomProject(emb, outDims = 32).cache()
    // scalar recompute for one vector: same md5 sign family, same fold
    def md5hex8(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    val v0 = emb.filter($"vec_id" === 0).head().getAs[scala.collection.Seq[Float]]("embedding")
    val p0 = proj.filter($"vec_id" === 0).head()
    (0 until 8).foreach { k =>
      var acc = 0.0
      v0.indices.foreach { j =>
        val s = if (md5hex8(s"rp#$k#$j") % 2 == 0) 1.0 else -1.0
        acc += v0(j).toDouble * s
      }
      val expect = BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(p0.getAs[Double](s"p$k") - expect) < 1e-9, s"dim $k")
    }
    // JL sanity on the synthetic corpus: projected cosine correlates with
    // the original cosine over a deterministic pair sample
    val pairs = emb.filter($"vec_id" < 40).select($"vec_id".as("a"), $"embedding".as("ea"))
      .crossJoin(emb.filter($"vec_id" >= 40 && $"vec_id" < 80)
        .select($"vec_id".as("b"), $"embedding".as("eb")))
      .select($"a", $"b", Similarity.cosine($"ea", $"eb").as("orig"))
    val pcols = array((0 until 32).map(k => col(s"p$k")): _*)
    val pj = proj.select($"vec_id", pcols.as("pv"))
    val both = pairs
      .join(pj.select($"vec_id".as("a"), $"pv".as("pa")), Seq("a"))
      .join(pj.select($"vec_id".as("b"), $"pv".as("pb")), Seq("b"))
      .select($"orig", Similarity.cosine($"pa", $"pb").as("pc"))
    val corr = both.agg(org.apache.spark.sql.functions.corr($"orig", $"pc")).head().getDouble(0)
    assert(corr > 0.5, s"projected cosine should track original cosine, corr=$corr")
    proj.unpersist()
  }

  test("brute-force top-k: k rows per query, descending, no self") {
    val tk = Similarity.bruteForceTopK(emb, queries, k = 10).cache()
    val counts = tk.groupBy("query_id").count().collect().map(_.getLong(1))
    assert(counts.forall(_ == 10))
    assert(tk.filter($"query_id" === $"neighbor_id").isEmpty)
    val perQ = tk.filter($"query_id" === 0).orderBy(desc("cos_sim")).collect()
    assert(perQ.map(_.getAs[Double]("cos_sim")).sliding(2).forall(w => w(0) >= w(1)))
    tk.unpersist()
  }

  test("LSH ANN recall ≥ 0.9 of brute force at k=10 (multi-probe)") {
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & approx).size.toDouble / brute.size
    assert(recall >= 0.9, s"LSH recall $recall")
  }

  test("IVF ANN recall ≥ 0.6 at nProbe=4/16 cells") {
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & approx).size.toDouble / brute.size
    assert(recall >= 0.6, s"IVF recall $recall")
  }

  test("ivfTopKFixed with full probe (nProbe = nCells) == brute force exactly") {
    // every cell probed ⇒ every corpus vector is a candidate ⇒ the portable
    // IVF path must reproduce the exact top-k, scores included
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = Similarity.ivfTopKFixed(emb, queries, k = 10, nCells = 8, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(full == brute)
  }

  test("d4 config (IVF cells) recalls >= 0.8 of the exact cos>=0.4 pairs") {
    val exact = emb.as("a").join(emb.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("id_a"), $"b.vec_id".as("id_b"),
        Similarity.cosine($"a.embedding", $"b.embedding").as("cos"))
      .filter($"cos" >= 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "testdata should contain cos>=0.4 pairs")
    val ivf = Similarity.embeddingNearDupIvf(emb, threshold = 0.4, nCells = 64, nProbe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF near-dup recall $recall of ${exact.size} exact pairs")
  }

  test("native lsh_buckets == declarative reference, bit-for-bit") {
    graft.GraftFunctions.register(spark)
    val diff = emb.limit(200).select(
        Similarity.lshBuckets($"embedding", 6, 12).as("native"),
        Similarity.lshBucketsRef($"embedding", 6, 12).as("ref"))
      .filter($"native" =!= $"ref").count()
    assert(diff == 0, s"$diff rows disagree")
  }

  test("lsh_buckets survives codegen (no interpreted fallback)") {
    graft.GraftFunctions.register(spark)
    val df = emb.limit(10).select(Similarity.lshBuckets($"embedding", 6, 12).as("b"))
    val covered = df.queryExecution.executedPlan.exists {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        w.toString().contains("lsh_buckets")
      case _ => false
    }
    assert(covered, df.queryExecution.executedPlan.toString())
    assert(df.collect().forall(_.getSeq[Long](0).length == 12))
  }

  test("quantized brute-force recalls ≥ 0.9 of exact top-10 (int8 rounding only)") {
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.quantizedBruteTopK(emb, queries, k = 10)
      .select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & quant).size.toDouble / brute.size
    assert(recall >= 0.9, s"quantized recall $recall")
  }

  test("quantize127: scale = max|v|, dequant error ≤ half a step, codegen") {
    graft.GraftFunctions.register(spark)
    val df = emb.limit(50).select($"vec_id", $"embedding",
      org.apache.spark.sql.functions.call_function("quantize127", $"embedding").as("qz"))
    val covered = df.queryExecution.executedPlan.exists {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        w.toString().contains("quantize127")
      case _ => false
    }
    assert(covered, df.queryExecution.executedPlan.toString())
    df.collect().foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      val qz = r.getStruct(2)
      val scale = qz.getDouble(0); val q = qz.getSeq[Long](1)
      assert(math.abs(scale - v.map(math.abs).max) < 1e-12)
      assert(q.forall(x => x >= -127 && x <= 127))
      v.indices.foreach { i =>
        val dq = q(i) * scale / 127.0
        assert(math.abs(dq - v(i)) <= scale / 254.0 + 1e-9,
          s"component $i of vec ${r.getLong(0)}: $dq vs ${v(i)}")
      }
    }
  }

  test("lsh_buckets_md5: matches an independent plane rebuild, survives codegen") {
    graft.GraftFunctions.register(spark)
    val (planes, tables) = (8, 4)
    // independent reimplementation of the md5 plane family (the formula the
    // DuckDB s20 oracle uses), applied in plain Scala to a few vectors
    def md5int(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    def expected(v: Seq[Float]): Seq[Long] =
      (0 until tables).map { t =>
        (0 until planes).foldLeft(0L) { (acc, j) =>
          val dot = v.indices.foldLeft(0.0) { (s, i) =>
            s + v(i) * ((md5int(s"p#$t#$j#$i") % 2000000L - 1000000L).toDouble / 1000000.0)
          }
          if (dot > 0) acc | (1L << j) else acc
        }
      }
    val df = emb.limit(20).select($"vec_id", $"embedding",
      org.apache.spark.sql.functions.call_function(
        "lsh_buckets_md5", $"embedding", lit(planes), lit(tables)).as("b"))
    val covered = df.queryExecution.executedPlan.exists {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        w.toString().contains("lsh_buckets_md5")
      case _ => false
    }
    assert(covered, df.queryExecution.executedPlan.toString())
    df.collect().foreach { r =>
      assert(r.getSeq[Long](2) == expected(r.getSeq[Float](1)),
        s"vec ${r.getLong(0)} buckets diverge")
    }
  }

  test("nearest_cells matches the cosine-window argmax it replaced") {
    graft.GraftFunctions.register(spark)
    import org.apache.spark.sql.expressions.Window
    val nCells = 16
    // the same seed-centroid pick ivfTopK uses, rebuilt declaratively
    val cents = emb
      .select($"vec_id", $"embedding", pmod(xxhash64($"vec_id"), lit(1000000L)).as("__h"))
      .orderBy($"__h", $"vec_id").limit(nCells).coalesce(1)
      .select(monotonically_increasing_id().as("cell_id"),
        transform($"embedding", _.cast("double")).as("cv"))
    val ids = cents.select("cell_id").collect().map(_.getLong(0)).sorted.toSeq
    val cvs = cents.collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).map(_._2).toSeq
    // old shape: cross join × nCells, score, row_number window
    val w = Window.partitionBy($"vec_id").orderBy($"__d".desc, $"cell_id")
    val viaWindow = emb.select($"vec_id", $"embedding")
      .join(broadcast(cents), lit(true))
      .withColumn("__d", call_function("cosine_sim", $"embedding", $"cv"))
      .withColumn("__rn", row_number().over(w)).filter($"__rn" === 1)
      .select($"vec_id", $"cell_id")
    // new shape: one projection
    val viaExpr = emb.select($"vec_id",
      element_at(call_function("nearest_cells", $"embedding",
        typedLit(ids), typedLit(cvs), lit(1)), 1).as("cell_id"))
    assert(viaWindow.exceptAll(viaExpr).isEmpty && viaExpr.exceptAll(viaWindow).isEmpty)
  }

  test("contrastivePairs: one positive >= posMin, dense-ranked hard negatives below negMax") {
    val queries = emb.filter($"vec_id" % 20 === 0)
    val rows = Similarity.contrastivePairs(emb, queries, kNeg = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getString(3), r.getInt(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (q, n, sim, role, rank) =>
      assert(q != n, "self pair leaked")
      if (role == "pos") { assert(sim >= 0.4 && rank == 1) }
      else { assert(sim < 0.4 && rank >= 1 && rank <= 5) }
    }
    // at most ONE positive per query; negative ranks dense from 1
    rows.groupBy(t => (t._1, t._4)).foreach { case ((_, role), g) =>
      if (role == "pos") assert(g.length == 1)
      else assert(g.map(_._5).sorted.sameElements(1 to g.length))
    }
    // hard negatives are the CLOSEST sub-threshold vectors: every kept
    // negative scores >= any unkept candidate for the same query (spot
    // check via one query's full scored set)
    val q0 = rows.head._1
    val kept = rows.filter(t => t._1 == q0 && t._4 == "neg").map(_._2).toSet
    val minKept = rows.filter(t => t._1 == q0 && t._4 == "neg").map(_._3).min
    val all = Similarity.bruteForceTopK(emb, queries.filter($"vec_id" === q0),
      k = Int.MaxValue - 1).collect()
      .map(r => (r.getLong(1), r.getDouble(2))).filter(_._2 < 0.4)
    assert(all.filter(t => !kept.contains(t._1)).forall(_._2 <= minKept))
  }

  test("embeddingNearDup finds planted near-duplicates only via buckets") {
    // plant: vec 9000 = copy of vec 0 with tiny noise; vec 9001 = negation
    val baseRow = emb.filter($"vec_id" === 0).head()
    val base = baseRow.getSeq[Float](baseRow.fieldIndex("embedding"))
    val near = base.toSeq.zipWithIndex.map { case (v, i) => v + (if (i % 7 == 0) 1e-4f else 0f) }
    val far = base.toSeq.map(v => -v)
    val planted = Seq((9000L, near), (9001L, far)).toDF("vec_id", "embedding")
    val all = emb.select($"vec_id", $"embedding").unionByName(planted)
    val pairs = Similarity.embeddingNearDup(all, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 9000L)))
    assert(!pairs.exists(p => p._1 == 9001L || p._2 == 9001L))
  }

  test("kmeansFixed: planted blobs converge; deterministic under repartition; empty cells keep centroids") {
    // blob A around (1, 0): ids 0, 2..10; seed 1 leans toward blob B so
    // Lloyd pulls its centroid into B within one round
    def jitter(i: Int): Float = (i % 3) * 0.01f
    val a = (Seq(0) ++ (2 to 10)).map(i =>
      (i.toLong, Seq(1.0f, jitter(i), 0.0f, 0.1f)))
    val b = (11 to 20).map(i =>
      (i.toLong, Seq(jitter(i), 1.0f, 0.1f, 0.0f)))
    val seed1 = Seq((1L, Seq(0.6f, 0.8f, 0.05f, 0.05f)))
    val corpus = (a ++ seed1 ++ b).toDF("vec_id", "embedding")
    val got = Similarity.kmeansFixed(corpus, k = 2, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val blobA = a.map(_._1).toSet
    val blobB = b.map(_._1).toSet + 1L
    assert(blobA.forall(got(_) == 0L), "blob A must land in cluster 0")
    assert(blobB.forall(got(_) == 1L), "blob B (incl. the leaning seed) in cluster 1")
    // determinism: a different partitioning must reproduce every label
    // (centroid sums are exact longs, so no float-order drift)
    val re = Similarity.kmeansFixed(corpus.repartition(7), k = 2, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(re == got)
    // rounds = 0 is the plain fixed-seed assignment
    val r0 = Similarity.kmeansFixed(corpus, k = 2, rounds = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fixed = Similarity.assignCellsFixed(corpus, corpus, nCells = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r0 == fixed)
    // a seed DUPLICATING a lower id loses every argmax tie (tie → lowest
    // cell id), so its cell is EMPTY in the seed assignment — the update
    // round must hit the keep-centroid rule rather than crash, and after
    // updates the clustering is still total and deterministic
    val dup = corpus.filter($"vec_id" =!= 2L).unionByName(
      Seq((2L, Seq(1.0f, 0.0f, 0.0f, 0.1f))).toDF("vec_id", "embedding"))
    val seed3 = Similarity.kmeansFixed(dup, k = 3, rounds = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!seed3.values.exists(_ == 2L),
      "the duplicate seed's cell must start empty (tie -> lowest cell id)")
    val got3 = Similarity.kmeansFixed(dup, k = 3, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got3.size == seed3.size && got3.values.forall(c => c >= 0 && c < 3))
    val got3b = Similarity.kmeansFixed(dup.repartition(5), k = 3, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got3b == got3)
  }
}
