package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("token counts: whitespace-robust, bpe-ish splits on classes") {
    val df = Seq("  hello   world ", "a-b c.d 42!", "").toDF("text")
      .select(TextAnalysis.tokenCount($"text").as("nt"),
        TextAnalysis.bpeishCount($"text").as("nb"))
    val rows = df.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    // "a-b c.d 42!": [a,-,b,c,.,d,4,2,!] = 9 bpe-ish pieces
    assert(rows == Seq((2, 2), (3, 9), (0, 0)))
  }

  test("linearQualityScore: integer scores match a scalar md5 recomputation") {
    val docs = Seq(("d1", "Alpha beta beta gamma"), ("d2", "x"), ("d3", "  "))
      .toDF("doc_id", "text")
    val got = TextAnalysis.linearQualityScore(docs, buckets = 4096)
      .collect().map(r => r.getAs[String]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("score_micros"),
          r.getAs[Boolean]("keep"))).toMap
    def md5hex8(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
    }
    def score(tokens: Seq[String]): Long = tokens.map { t =>
      val f = md5hex8(t) % 4096
      md5hex8(s"w#$f") % 1000001L - 500000L
    }.sum
    val d1 = score(Seq("alpha", "beta", "beta", "gamma"))
    assert(got("d1") == ((4L, d1, d1 > 0)))
    val d2 = score(Seq("x"))
    assert(got("d2") == ((1L, d2, d2 > 0)))
    assert(!got.contains("d3"), "token-free docs emit no score")
  }

  test("bpeMerges: learned merge table equals a scalar BPE replay (greedy edges included)") {
    // corpus chosen to exercise ties (lexicographic pair tie-break),
    // overlapping pairs ('aaaa' under a->a a), and multi-round merges
    val docs = Seq(
      "low lower lowest low low",
      "aaaa aaa lower low",
      "newest widest newest the lowest",
      "Mixed-CASE tokens! are filtered; low lower").toDF("text")
    val got = TextAnalysis.bpeMerges(spark, docs, rounds = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq

    // scalar reference: classic positional greedy BPE over the same words
    var words: Map[Vector[String], Long] = docs.collect().map(_.getString(0))
      .flatMap(_.toLowerCase.split("\\s+")).filter(_.matches("[a-z0-9]+"))
      .groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toVector -> ws.length.toLong }
    val expect = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (rank <- 1 to 5) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, c) <- words; i <- 0 until s.length - 1)
        pairs((s(i), s(i + 1))) = pairs.getOrElse((s(i), s(i + 1)), 0L) + c
      val ((l, r), f) = pairs.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
      expect += ((rank.toLong, l, r, f))
      words = words.toSeq.map { case (s, c) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { out += l + r; i += 2 }
          else { out += s(i); i += 1 }
        }
        (out.result(), c)
      }.groupBy(_._1).map { case (s, cs) => s -> cs.map(_._2).sum }
    }
    assert(got == expect.toSeq)
    // the classic corpus learns the classic first merges: 'lo' then 'low'
    assert(got.take(2).map(m => (m._2, m._3)) == Seq(("l", "o"), ("lo", "w")))
  }

  test("bpeEncode: per-doc subword counts equal a scalar encode with the learned merges") {
    val docs = Seq(
      (0L, "low lower lowest low low"),
      (1L, "aaaa aaa lower low"),
      (2L, "newest widest newest the lowest"),
      (3L, "Mixed-CASE tokens! are filtered; low lower")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(spark, docs.select($"text"), rounds = 5)
      .collect().sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2)))
    // scalar reference: greedy positional encode of every word with the
    // SAME merge sequence, summed per doc
    def encode(w: String): Int = {
      var s = w.map(_.toString).toVector
      for ((l, r) <- merges) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == l && s(i + 1) == r) { out += l + r; i += 2 }
          else { out += s(i); i += 1 }
        }
        s = out.result()
      }
      s.length
    }
    val expect = docs.collect().map { row =>
      val ws = row.getString(1).toLowerCase.split("\\s+")
        .filter(_.matches("[a-z0-9]+"))
      (row.getLong(0), (ws.length.toLong, ws.map(encode(_).toLong).sum))
    }.toMap
    val got = TextAnalysis.bpeEncode(spark, docs, rounds = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect)
    // sanity: merges actually compress ('low' appears 7×, so n_bpe < chars)
    assert(got(0L)._2 < "low lower lowest low low".count(_ != ' '))
  }

  test("langId: real-language snippets classify correctly") {
    val samples = Seq(
      ("en", "the cat sat on the mat and it was happy with the sun"),
      ("es", "el gato se sienta en la alfombra y es feliz con el sol"),
      ("de", "die katze sitzt auf der matte und ist mit der sonne zufrieden"),
      ("fr", "le chat est assis sur le tapis et il est content avec le soleil"),
      ("zh", "猫坐在垫子上，它对阳光很满意"))
    val got = samples.toDF("want", "text")
      .select($"want", TextAnalysis.langId($"text").as("got")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"want ${r.getString(0)} got ${r.getString(1)}"))
  }

  test("qualityScore: fluent prose beats keyboard mash") {
    val df = Seq(
      ("good", "the quick brown fox jumps over the lazy dog and then it runs away to the forest with joy"),
      ("bad", ";;;;; !!!! ,,,, :::: x y")
    ).toDF("tag", "text")
      .select($"tag", TextAnalysis.qualityScore($"text").as("q"))
    val m = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("good") >= 0.75)
    assert(m("bad") <= 0.5)
  }

  test("native lang_id == declarative langId on corpus and edge strings") {
    graft.GraftFunctions.register(spark)
    val edges = Seq("", "   ", "的是在有我他这个们中和了对就要下",
      "de la en que un", // es/fr-ambiguous: tie-breaks must match
      "der die und von als den", "le les et pour sur avec",
      "the of and to in is").toDF("text")
    val corpus = graft.Tables.documents(spark, TestSpark.sfDir).select("text")
    Seq(edges, corpus).foreach { df =>
      val diff = df.select(TextAnalysis.langId($"text").as("ref"),
        TextAnalysis.langIdNative($"text").as("native"))
        .filter($"ref" =!= $"native").count()
      assert(diff == 0, s"$diff rows diverge")
    }
  }

  test("native text_quality == declarative qualityScore, survives codegen") {
    graft.GraftFunctions.register(spark)
    // real corpus + adversarial edges: empty, whitespace-only, all-punct,
    // CJK, a stopword-heavy string near the 0.05/0.7 ratio boundaries
    val edges = Seq("", "   ", ".,!?;:", "的 是 在 有 我 他 这 个 们 中",
      "the a an and of to in is it that for on with as was at by word",
      "x " * 40, "supercalifragilistic " * 12).toDF("text")
    val corpus = graft.Tables.documents(spark, TestSpark.sfDir).select("text")
    Seq(edges, corpus).foreach { df =>
      val diff = df.select(
        TextAnalysis.qualityScore($"text").as("ref"),
        TextAnalysis.qualityScoreNative($"text").as("native"))
        .filter($"ref" =!= $"native").count()
      assert(diff == 0, s"$diff rows diverge")
    }
    val plan = corpus.select(TextAnalysis.qualityScoreNative($"text"))
      .queryExecution.executedPlan
    val covered = plan.exists {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        w.toString().contains("text_quality")
      case _ => false
    }
    assert(covered, plan.toString())
  }

  test("native gopher_metrics == declarative gopherRules, survives codegen") {
    graft.GraftFunctions.register(spark)
    // adversarial edges: empty text, ws-only, repeated lines/paragraphs,
    // bullet/ellipsis lines, symbol soup, bigram count ties (the struct
    // tie-break), single-token docs (no bigram)
    val edges = Seq(
      "", "   ", "solo",
      "the cat sat\nthe cat sat\nnew line here\n\npara one\n\npara one",
      "- bullet one\n * bullet two\nplain...\n...\n#tag # tag ###",
      "a b a b a b c d c d c d",
      "x y\nx y\n\nx y\n\nx y").zipWithIndex
      .map { case (t, i) => (s"e$i", t) }.toDF("doc_id", "text")
    val corpus = graft.Tables.documents(spark, TestSpark.sfDir)
      .select(concat_ws("-", lit("c"), $"doc_id").as("doc_id"),
        // synthesize line structure as the t35 gate entry does
        replace(replace($"text", lit(" table "), lit("\n\n")),
          lit(" the "), lit("\n")).as("text"))
    Seq(edges, corpus).foreach { df =>
      val ref = TextAnalysis.gopherRules(df).collect()
        .map(r => r.getAs[String]("doc_id") -> r.toSeq.tail).toMap
      val nat = TextAnalysis.gopherRulesNative(df).collect()
        .map(r => r.getAs[String]("doc_id") -> r.toSeq.tail).toMap
      assert(ref.keySet == nat.keySet)
      val diverged = ref.keys.filter(k => ref(k) != nat(k))
      assert(diverged.isEmpty,
        diverged.take(3).map(k => s"$k: ref=${ref(k)} native=${nat(k)}").mkString("; "))
    }
    val plan = TextAnalysis.gopherRulesNative(
      graft.Tables.documents(spark, TestSpark.sfDir)).queryExecution.executedPlan
    val covered = plan.exists {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        w.toString().contains("gopher_metrics")
      case _ => false
    }
    assert(covered, plan.toString())
  }

  test("dedupLines: keep-first rewrite, hand-checked; native == declarative") {
    graft.GraftFunctions.register(spark)
    val hand = Seq(("h1", "a\nb\na\nc\nb"), ("h2", ""), ("h3", "only"),
      ("h4", "x\n\nx\n\n\ny")).toDF("doc_id", "text")
    val got = TextAnalysis.dedupLinesNative(hand).collect()
      .map(r => r.getAs[String]("doc_id") ->
        (r.getAs[String]("clean_md5"), r.getAs[Long]("n_lines"),
          r.getAs[Long]("n_kept"))).toMap
    val expMd5 = hand.sparkSession.range(1)
      .select(md5(lit("a\nb\nc")).as("m"), md5(lit("")).as("e"),
        md5(lit("x\ny")).as("x")).head()
    assert(got("h1") == ((expMd5.getString(0), 5L, 3L)))
    assert(got("h2") == ((expMd5.getString(1), 0L, 0L)))
    assert(got("h3")._2 == 1L && got("h3")._3 == 1L)
    assert(got("h4") == ((expMd5.getString(2), 3L, 2L)),
      "empty lines drop before dedup; survivors rejoin in first-seen order")
    val corpus = graft.Tables.documents(spark, TestSpark.sfDir)
      .select(concat_ws("-", lit("c"), $"doc_id").as("doc_id"),
        replace(replace($"text", lit(" table "), lit("\n\n")),
          lit(" the "), lit("\n")).as("text"))
    Seq(hand, corpus).foreach { df =>
      val ref = TextAnalysis.dedupLines(df).collect()
        .map(r => r.getAs[String]("doc_id") -> r.toSeq.tail).toMap
      val nat = TextAnalysis.dedupLinesNative(df).collect()
        .map(r => r.getAs[String]("doc_id") -> r.toSeq.tail).toMap
      assert(ref == nat)
    }
    val plan = TextAnalysis.dedupLinesNative(
      graft.Tables.documents(spark, TestSpark.sfDir)).queryExecution.executedPlan
    assert(plan.exists {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        w.toString().contains("dedup_lines")
      case _ => false
    }, plan.toString())
  }

  test("qualityScoreByLang: the stopword gate routes per declared language") {
    val es = "el perro grande de la casa es que una obra para los dias y " * 3
    val df = Seq(("d1", "es", es), ("d2", "en", es), ("d3", "zh", "汉字 " * 20))
      .toDF("doc_id", "lang", "text")
    val got = df.select($"doc_id",
        TextAnalysis.qualityScoreByLang($"text", $"lang").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // fluent Spanish passes all four gates under es routing...
    assert(got("d1") == 1.0, s"es-routed: $got")
    // ...but the SAME text under the English stopword gate loses a point
    // (zero en-stopword mass) — the misroute multilingual pipelines avoid
    assert(got("d2") == 0.75, s"en-misrouted: $got")
    // zh has no curated list: the gate is skipped, not failed
    assert(got("d3") == 1.0, s"zh skips the stopword gate: $got")
  }

  test("gopherNgrams: hand-computed top/dup n-gram fractions; native == declarative") {
    graft.GraftFunctions.register(spark)
    // "a b c" x3: top3 = 3 occurrences x 3 chars / 9; top4 ties at c=2 ->
    // binary-largest gram "c a b c"; dup5/dup6 cover ALL positions; 7+ unique
    val docs = Seq(
      ("g1", "a b c a b c a b c"),
      ("g2", (1 to 12).map(i => s"t$i").mkString(" ")),
      ("g3", "x"), ("g4", "")).toDF("doc_id", "text")
    val got = TextAnalysis.gopherNgramsNative(docs).collect()
      .map(r => r.getAs[String]("doc_id") -> r).toMap
    val g1 = got("g1")
    assert(g1.getAs[Double]("top_3gram_char_frac") == 1.0)
    assert(g1.getAs[Double]("top_4gram_char_frac") == 0.888889)
    assert(g1.getAs[Double]("dup_5gram_char_frac") == 1.0)
    assert(g1.getAs[Double]("dup_6gram_char_frac") == 1.0)
    assert(g1.getAs[Double]("dup_7gram_char_frac") == 0.0)
    assert(g1.getAs[Double]("dup_10gram_char_frac") == 0.0)
    assert(!g1.getAs[Boolean]("repetition_pass"))
    val g2 = got("g2")
    // all 3-grams unique; tie-break picks binary-largest "t9 t10 t11" (8
    // chars of 27) — single occurrences still produce a top fraction
    assert(g2.getAs[Double]("top_3gram_char_frac") == 0.296296)
    assert(g2.getAs[Double]("dup_5gram_char_frac") == 0.0)
    assert(got("g3").getAs[Double]("top_3gram_char_frac") == 0.0)
    assert(got("g4").getAs[Boolean]("repetition_pass"),
      "an empty doc has zero repetition everywhere")
    val corpus = graft.Tables.documents(spark, TestSpark.sfDir)
      .select(concat_ws("-", lit("c"), $"doc_id").as("doc_id"), $"text")
    Seq(docs, corpus).foreach { df =>
      val ref = TextAnalysis.gopherNgrams(df).collect()
        .map(r => r.getAs[String]("doc_id") -> r.toSeq.tail).toMap
      val nat = TextAnalysis.gopherNgramsNative(df).collect()
        .map(r => r.getAs[String]("doc_id") -> r.toSeq.tail).toMap
      assert(ref.keySet == nat.keySet)
      val bad = ref.keys.filter(k => ref(k) != nat(k))
      assert(bad.isEmpty, bad.take(3).map(k =>
        s"$k: ref=${ref(k)} native=${nat(k)}").mkString("; "))
    }
    val plan = TextAnalysis.gopherNgramsNative(
      graft.Tables.documents(spark, TestSpark.sfDir)).queryExecution.executedPlan
    assert(plan.exists {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
        w.toString().contains("gopher_ngrams")
      case _ => false
    }, plan.toString())
  }

  test("fuzz: native gopher_metrics/gopher_ngrams/dedup_lines == declarative on 300 random texts") {
    // deterministic generator (fixed seed): small vocab + adversarial
    // separators — newlines, blank lines, bullets, ellipses, hashes,
    // mixed-case tokens, high-repetition runs that force bigram ties
    val rnd = new scala.util.Random(42)
    // İ (U+0130) lowercases to TWO code points ('i' + combining dot) —
    // pins the ngram denominator to the ORIGINAL text's char count; \r\n
    // separators pin the ellipsis rule to end-of-input (\z) semantics
    val vocab = Vector("aa", "Bb", "ccc", "d", "-x", "*y", "#", "...", "e.e",
      "the", "THE", "zz9", "İst", "done.", "ok!", "why?", "q\"",
      "JavaScript", "{x}")
    val seps = Vector(" ", " ", " ", "\n", "\n", "\n\n", "  ", " \n ", "\r\n")
    val docs = (0 until 300).map { i =>
      val n = rnd.nextInt(40)
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        sb.append(vocab(rnd.nextInt(vocab.size)))
        sb.append(seps(rnd.nextInt(seps.size)))
      }
      (s"f$i", sb.toString)
    }.toDF("doc_id", "text")
    val gRef = TextAnalysis.gopherRules(docs).collect()
      .map(r => r.getAs[String]("doc_id") -> r.toSeq.tail).toMap
    val gNat = TextAnalysis.gopherRulesNative(docs).collect()
      .map(r => r.getAs[String]("doc_id") -> r.toSeq.tail).toMap
    val gBad = gRef.keys.filter(k => gRef(k) != gNat(k))
    assert(gBad.isEmpty, gBad.take(3).map(k =>
      s"$k: ref=${gRef(k)} native=${gNat(k)}").mkString("; "))
    val dRef = TextAnalysis.dedupLines(docs).collect()
      .map(r => r.getAs[String]("doc_id") -> r.toSeq.tail).toMap
    val dNat = TextAnalysis.dedupLinesNative(docs).collect()
      .map(r => r.getAs[String]("doc_id") -> r.toSeq.tail).toMap
    assert(dRef == dNat)
    val nRef = TextAnalysis.gopherNgrams(docs).collect()
      .map(r => r.getAs[String]("doc_id") -> r.toSeq.tail).toMap
    val nNat = TextAnalysis.gopherNgramsNative(docs).collect()
      .map(r => r.getAs[String]("doc_id") -> r.toSeq.tail).toMap
    val nBad = nRef.keys.filter(k => nRef(k) != nNat(k))
    assert(nBad.isEmpty, nBad.take(3).map(k =>
      s"$k: ref=${nRef(k)} native=${nNat(k)}").mkString("; "))
    val cRef = TextAnalysis.c4Rules(docs).collect()
      .map(r => r.getAs[String]("doc_id") -> r.toSeq.tail).toMap
    val cNat = TextAnalysis.c4RulesNative(docs).collect()
      .map(r => r.getAs[String]("doc_id") -> r.toSeq.tail).toMap
    val cBad = cRef.keys.filter(k => cRef(k) != cNat(k))
    assert(cBad.isEmpty, cBad.take(3).map(k =>
      s"$k: ref=${cRef(k)} native=${cNat(k)}").mkString("; "))
  }

  test("unicodeClean: NFC composition, control strip, CRLF normalization, code-point counts") {
    val docs = Seq(
      ("u1", "café time"),     // decomposed accent → NFC é: 10 → 9
      ("u2", "abc"),     // BEL + DEL stripped: 5 → 3
      ("u3", "l1\r\nl2\rl3"),        // CRLF and lone CR → \n: 9 → 8
      ("u4", "keep\tthis\nplain"),   // \t and \n survive, unchanged
      ("u5", "")).toDF("doc_id", "text")
    val got = TextAnalysis.unicodeClean(docs).collect()
      .map(r => r.getAs[String]("doc_id") -> r).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val u1 = got("u1")
    assert(u1.getAs[Long]("n_before") == 10L && u1.getAs[Long]("n_after") == 9L)
    assert(u1.getAs[Boolean]("changed"))
    assert(u1.getAs[String]("clean_md5") == md5hex("café time"))
    val u2 = got("u2")
    assert(u2.getAs[Long]("n_after") == 3L && u2.getAs[String]("clean_md5") == md5hex("abc"))
    val u3 = got("u3")
    assert(u3.getAs[Long]("n_before") == 9L && u3.getAs[Long]("n_after") == 8L)
    assert(u3.getAs[String]("clean_md5") == md5hex("l1\nl2\nl3"))
    val u4 = got("u4")
    assert(!u4.getAs[Boolean]("changed") &&
      u4.getAs[String]("clean_md5") == md5hex("keep\tthis\nplain"))
    val u5 = got("u5")
    assert(u5.getAs[Long]("n_before") == 0L && !u5.getAs[Boolean]("changed"))
  }

  test("c4Rules: line filters, sentence gate, doc gates; native == declarative") {
    val d1 = Seq(
      "Good line one two three.",            // keep
      "short one.",                          // <3 words
      "no terminal punct here",              // no terminal
      "Another good sentence, right here!",  // keep
      "JavaScript is required here.",        // javascript
      "Is this kept? Yes it is.",            // keep
      "Fourth good line stays.",             // keep
      "Fifth keeps the page alive.").mkString("\n") // keep
    val d2 = (1 to 6).map(i => s"Good line number $i here.").mkString("\n")
    val docs = Seq(
      ("d1", d1),
      ("d2", "Lorem Ipsum dolor sit amet.\n" + d2), // doc gate: lorem ipsum
      ("d3", "var x = one {two} three.\n" + d2),    // doc gate: curly brace
      ("d4", "One good line right here."),          // <5 sentences
      ("d5", "")).toDF("doc_id", "text")
    val ref = TextAnalysis.c4Rules(docs).collect()
      .map(r => r.getAs[String]("doc_id") -> r).toMap
    val r1 = ref("d1")
    assert(r1.getAs[Long]("total_lines") == 8L)
    assert(r1.getAs[Long]("kept_lines") == 5L)
    // kept lines carry . ! ? . . . = 6 terminal marks
    assert(r1.getAs[Long]("n_sentences") == 6L)
    assert(r1.getAs[Boolean]("c4_pass"))
    assert(!ref("d2").getAs[Boolean]("c4_pass"), "lorem ipsum must fail the doc")
    assert(ref("d2").getAs[Long]("kept_lines") == 7L, "lorem line passes LINE rules")
    assert(!ref("d3").getAs[Boolean]("c4_pass"), "curly brace must fail the doc")
    assert(!ref("d4").getAs[Boolean]("c4_pass"), "4 sentences < 5 must fail")
    val r5 = ref("d5")
    assert(r5.getAs[Long]("total_lines") == 1L && r5.getAs[Long]("kept_lines") == 0L)
    val nat = TextAnalysis.c4RulesNative(docs).collect()
      .map(r => r.getAs[String]("doc_id") -> r.toSeq.tail).toMap
    val refT = ref.map { case (k, r) => k -> r.toSeq.tail }
    assert(refT == nat, "native c4_rules must equal the declarative reference")
  }

  test("fingerprint: stable under distant edits, equal on shared minimal window") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val edited = base + " lambda mu"   // appended tail, same min window likely
    val df = Seq(base, base, edited).toDF("text")
      .select(TextAnalysis.fingerprint($"text").as("fp"))
    val fps = df.collect().map(_.getLong(0))
    assert(fps(0) == fps(1))           // deterministic
    assert(fps(0) == fps(2) || fps(0) != 0) // appended text keeps or changes min — just must be stable
  }

  test("gopherRules: hand-computed repetition metrics, tie-broken top bigram, pass flag") {
    val d1 = "the cat sat\nthe cat sat\nnew line here\n\npara one\n\npara one"
    val d2 = (1 to 60).map(i => s"w${i}word").mkString(" ")
    val got = TextAnalysis.gopherRules(
        Seq(("d1", d1), ("d2", d2), ("d3", "solo")).toDF("doc_id", "text"),
        idCol = "doc_id")
      .collect().map(r => r.getAs[String]("doc_id") -> r).toMap
    val r1 = got("d1")
    // 5 non-empty lines, 3 distinct; 3 paragraphs, 2 distinct; 13 words,
    // 43 non-space chars; top bigram = max(count, w1, w2) struct order =
    // ("the","cat") x2 over the other count-2 ties -> 2*6/43
    assert(r1.getAs[Long]("n_words") == 13L)
    assert(r1.getAs[Double]("dup_line_frac") == 0.4)
    assert(r1.getAs[Double]("dup_para_frac") == 0.333333)
    assert(r1.getAs[Double]("mean_word_len") == 3.307692)
    assert(r1.getAs[Double]("alpha_word_frac") == 1.0)
    assert(r1.getAs[Double]("symbol_word_ratio") == 0.0)
    assert(r1.getAs[Double]("top_bigram_char_frac") == 0.27907)
    assert(!r1.getAs[Boolean]("gopher_pass"), "13 words is under the 50-word floor")
    val r2 = got("d2")
    assert(r2.getAs[Double]("dup_line_frac") == 0.0)
    assert(r2.getAs[Boolean]("gopher_pass"), s"clean 60-word doc must pass: $r2")
    val r3 = got("d3")
    assert(r3.getAs[Double]("top_bigram_char_frac") == 0.0,
      "a bigram-free doc joins as zero, not null")
    assert(!r3.getAs[Boolean]("gopher_pass"))
  }

  test("textStats over documents runs and is sane") {
    val stats = TextAnalysis.textStats(graft.Tables.documents(spark, TestSpark.sfDir))
    val r = stats.agg(min("n_tokens"), max("punct_ratio")).head()
    assert(r.getInt(0) >= 1)
    assert(r.getDouble(1) <= 1.0)
  }

  test("unigramLogProb matches hand-computed corpus unigram scores") {
    import spark.implicits._
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    // total 5 tokens; p(a)=2/5, p(b)=2/5, p(c)=1/5
    val got = TextAnalysis.unigramLogProb(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - math.log(2.5)) < 1e-6)                  // 3× -ln(2/5)
    assert(math.abs(got(2L) - (math.log(2.5) + math.log(5)) / 2) < 1e-6)
    // rare-token docs score strictly higher than common-token docs
    assert(got(2L) > got(1L))
  }

  test("bigramLogProb: hand-computed add-1 bigram scores; short docs drop") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "a c"), (3L, "solo"), (4L, "")).toDF("doc_id", "text")
    // corpus bigrams: doc1 [ab,ba,ab], doc2 [ac]; unigrams a=3,b=2,c=1,solo=1 → V=4
    // C(ab)=2 C(ba)=1 C(ac)=1; C1(a)=3 C1(b)=2
    val got = TextAnalysis.bigramLogProb(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ab = -math.log((2 + 1.0) / (3 + 4.0)) // -ln(3/7)
    val ba = -math.log((1 + 1.0) / (2 + 4.0)) // -ln(2/6)
    val ac = -math.log((1 + 1.0) / (3 + 4.0)) // -ln(2/7)
    assert(math.abs(got(1L) - (2 * ab + ba) / 3) < 1e-5)
    assert(math.abs(got(2L) - ac) < 1e-5)
    assert(!got.contains(3L) && !got.contains(4L), "sub-2-token docs have no bigrams")
  }

  test("dsirWeights: target-like docs score above target-unlike docs") {
    import spark.implicits._
    // target = lang en; doc 3 is raw-only but written in target vocabulary,
    // doc 4 is raw-only with disjoint vocabulary
    val docs = Seq(
      (1L, "en", "good clean prose text sample"),
      (2L, "en", "good clean prose text corpus"),
      (3L, "xx", "good clean prose text sample"),
      (4L, "xx", "zz1 zz2 zz3 zz4 zz5"),
    ).toDF("doc_id", "lang", "text")
    val w = TextAnalysis.dsirWeights(docs, col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.size == 4)
    assert(w(3L) > w(4L), "target-vocabulary doc must outscore disjoint-vocabulary doc")
    assert(w(1L) > w(4L))
    // identical text ⇒ identical weight regardless of own label (pure content score)
    assert(math.abs(w(1L) - w(3L)) < 1e-9)
  }

  test("redactPii scrubs emails, IPv4s, phones; counts are independent") {
    import spark.implicits._
    val df = Seq(
      ("mail me at a.user+tag@sub.example.org or 10.20.30.40, call 555-123-4567",
        1L, 1L, 1L),
      ("two mails x@y.io z@w.co and versions 1.2.3 (not an ip)", 2L, 0L, 0L),
      ("no pii here", 0L, 0L, 0L))
      .toDF("t", "e", "i", "p")
    val got = df.select(
      TextAnalysis.redactPii(col("t")).as("clean"),
      TextAnalysis.piiCount(col("t"), TextAnalysis.EmailRe).as("ne"),
      TextAnalysis.piiCount(col("t"), TextAnalysis.Ipv4Re).as("ni"),
      TextAnalysis.piiCount(col("t"), TextAnalysis.PhoneRe).as("np"),
      col("e"), col("i"), col("p")).collect()
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(4) && r.getLong(2) == r.getLong(5) &&
        r.getLong(3) == r.getLong(6), r.toString)
    }
    assert(got(0).getString(0) == "mail me at <EMAIL> or <IP>, call <PHONE>")
    assert(got(1).getString(0) == "two mails <EMAIL> <EMAIL> and versions 1.2.3 (not an ip)")
    assert(got(2).getString(0) == "no pii here")
  }

  test("chunkDocs: every token covered, stride overlap, short docs = one chunk") {
    val docs = Seq(
      (1L, (1 to 95).map(i => s"w$i").mkString(" ")), // 95 tokens → 3 chunks
      (2L, "tiny doc"),                               // 2 tokens → 1 chunk
      (3L, (1 to 40).map(i => s"x$i").mkString(" "))  // exactly one stride
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocs(docs, size = 50, stride = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 0L) -> 50L, (1L, 1L) -> 50L, (1L, 2L) -> 15L,
      (2L, 0L) -> 2L, (3L, 0L) -> 40L), got.toString)
    // chunk k starts at k*stride: chunk ids are dense 0..k per doc, and
    // total coverage = n + overlaps: 95 + 2*10 = 115 for doc 1
    assert(got.collect { case ((1L, _), n) => n }.sum == 115L)
    // chunk hash is the md5 of the re-joined token slice (portable pin)
    val h = TextAnalysis.chunkDocs(docs, size = 50, stride = 40)
      .filter($"doc_id" === 2L).select("chunk_md5").as[String].head()
    assert(h == java.security.MessageDigest.getInstance("MD5")
      .digest("tiny doc".getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("vocabOov: top-V cut is tie-deterministic; OOV counts occurrences") {
    // freqs: a=4, b=3, c=3, d=2, e=1 — V=3 must cut {a, b, c} with the
    // b/c tie broken by token order, never by partition order
    val docs = Seq(
      (1L, "a b c a b c"),
      (2L, "a b c d d A"), // lowercased: 'A' counts toward a
      (3L, "e")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabOov(docs, vocabSize = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> ((6L, 0L)), 2L -> ((6L, 2L)), 3L -> ((1L, 1L))))
    // same corpus, V=4: d enters the vocab, e is the only OOV token left
    val got4 = TextAnalysis.vocabOov(docs, vocabSize = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got4 == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }
}
