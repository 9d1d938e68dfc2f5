package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Invariants for the r11 curation operators (recall audit, temperature
  * mixture, chunk materialization, semantic decontamination, boilerplate
  * detector, perplexity) on the sf0.001 fixture — the oracle gate pins
  * engine parity; these pin the SEMANTIC claims each query's doc comment
  * makes, so a refactor that keeps both engines wrong in the same way
  * still fails here.
  */
class CurationOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("q_dedup_recall: detected <= truth, detected <= candidates, and " +
      "recall is their exact ratio") {
    val r = Docs.queries("q_dedup_recall")(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    val (nTrue, nDet, recall, nCand) = (row.getLong(0), row.getLong(1),
      row.getDouble(2), row.getLong(3))
    assert(nDet <= nTrue)
    assert(nDet <= nCand)
    assert(recall == math.rint(nDet.toDouble / nTrue * 10000) / 10000)
  }

  test("q_mixture_temperature: rates anti-monotone in source size, the " +
      "smallest source keeps 100%, and kept tokens never exceed the " +
      "source's total") {
    val docs = t(spark, dir, "documents")
      .select(col("source"), graft.ext.Text.nTokens(col("text")).as("nt"))
      .groupBy("source").agg(sum("nt").as("n_s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val out = Docs.queries("q_mixture_temperature")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(out.nonEmpty)
    val pct = out.map { case (s, p, _) => s -> p }.toMap
    // anti-monotone: a strictly larger source never keeps a higher rate
    for ((sa, pa) <- pct; (sb, pb) <- pct
         if docs(sa) < docs(sb)) assert(pa >= pb)
    val smallest = docs.minBy(_._2)._1
    if (pct.contains(smallest)) assert(pct(smallest) == 100L)
    out.foreach { case (s, _, kept) => assert(kept <= docs(s)) }
  }

  test("q_mixture_temperature rates are scale-invariant: replicating the " +
      "whole corpus uniformly changes no source's keep rate") {
    import spark.implicits._
    val base = t(spark, dir, "documents")
    val tmp = java.nio.file.Files.createTempDirectory("graft-temp-scale")
    try {
      // 3x the corpus with distinct ids: every source grows by the same
      // factor, so n_min/n_s — and every pct — must be unchanged
      (0 until 3).map(r => base.withColumn("doc_id",
          col("doc_id") + lit(r * 1000000L)))
        .reduce(_ unionAll _)
        .write.parquet(s"$tmp/documents.parquet")
      def rates(d: String) =
        Docs.queries("q_mixture_temperature")(spark, d)
          .select("source", "pct")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rates(tmp.toString) == rates(dir))
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  test("q_chunk_text: every chunk is the exact token slice of its doc at " +
      "stride 24, width <= 32") {
    val texts = t(spark, dir, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ")).toMap
    val chunks = Docs.queries("q_chunk_text")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(chunks.nonEmpty)
    chunks.foreach { case (id, idx, text) =>
      val toks = texts(id)
      val start = (idx * 24).toInt
      val expect = toks.slice(start, start + math.min(32, toks.length - start))
      assert(text == expect.mkString(" "),
        s"doc $id chunk $idx mismatch")
    }
    // coverage: concatenating each doc's chunk STRIDES (first 24 tokens of
    // every chunk, all of the last) reproduces the full token stream
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val ordered = cs.sortBy(_._2).map(_._3.split(" ").toSeq)
      val rebuilt = ordered.init.flatMap(_.take(24)) ++ ordered.last
      assert(rebuilt.toSeq == texts(id).toSeq,
        s"doc $id chunk coverage broken")
    }
  }

  test("q_semantic_decontam: flags only train docs, offenders are eval " +
      "docs, and every hit clears the threshold") {
    val rows = Vectors.queries("q_semantic_decontam")(spark, dir).collect()
    assert(rows.nonEmpty)
    val splitOf = t(spark, dir, "embeddings")
      .select(col("vec_id"), splitCol(col("vec_id")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      assert(splitOf(r.getLong(0)) == "train")
      assert(splitOf(r.getLong(3)) != "train")
      assert(r.getDouble(2) >= 0.35)
      assert(r.getLong(1) >= 1L)
    }
  }

  test("q_boilerplate_shingles: spread-ordered, threshold respected, and " +
      "every reported shingle really occurs in >= n_docs distinct docs") {
    val rows = Docs.queries("q_boilerplate_shingles")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 3))
    assert(rows.forall { case (_, nd, nt) => nt >= nd })
    val spreads = rows.map(_._2).toSeq
    assert(spreads == spreads.sortBy(-_))
    // spot-verify the top row's doc spread against a direct count
    val (top, nDocs, _) = rows.head
    val direct = graft.ext.Dedup
      .docShingles(t(spark, dir, "documents"), "doc_id", "text")
      .filter(col("shingle") === top)
      .select("doc_id").distinct().count()
    assert(direct == nDocs)
  }

  test("q_perplexity: positive nll, token counts match the tokenizer, " +
      "every doc scored") {
    val n = t(spark, dir, "documents").count()
    val rows = Docs.queries("q_perplexity")(spark, dir).collect()
    assert(rows.length == n)
    val texts = t(spark, dir, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == texts(r.getLong(0)).split(" ", -1).length)
      assert(r.getDouble(2) > 0.0)
    }
  }

  test("q_perplexity_bigram: JM bigram model scores deterministic " +
      "boilerplate below high-branching prose; n_bigrams = tokens - 1") {
    import spark.implicits._
    // doc 1: alternating "a b" — every bigram is deterministic
    // (c(prev,w) = c(prev,·)), so the bigram term is ~1 and nll is low.
    // doc 2: prefix x fans out to 10 distinct successors — each bigram
    // carries P(w|x) = 1/10, which only an order-2 model can see (both
    // docs look similar to a unigram model: 20 tokens, low-frequency
    // vocab). The assertion is the discriminative claim of the upgrade.
    val tmp = java.nio.file.Files.createTempDirectory("graft-pplx-bigram")
    try {
      val d1 = Seq.fill(10)("a b").mkString(" ")
      val d2 = "ppp qqq rrr sss ttt uuu vvv www yyy zzz"
        .split(" ").map(w => s"x $w").mkString(" ")
      Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
        .write.parquet(s"$tmp/documents.parquet")
      val rows = Docs.queries("q_perplexity_bigram")(spark, tmp.toString)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(2))).toMap
      assert(rows(1L)._1 == 19L && rows(2L)._1 == 19L)
      assert(rows(1L)._2 < rows(2L)._2,
        s"boilerplate ${rows(1L)._2} must score below prose ${rows(2L)._2}")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("q_perplexity_kn: Kneser-Ney separates deterministic boilerplate " +
      "from fan-out prose, and its smoother actually differs from JM") {
    import spark.implicits._
    // Same discriminative fixture as the JM pin: doc 1's bigrams are
    // deterministic, doc 2's prefix fans out 10 ways — an order-2 model
    // must score 1 below 2. The second assertion pins that the
    // continuation-count back-off is not silently identical to JM's
    // frequency back-off (the two smoothers must disagree somewhere on
    // this fixture, else the "new method" is a rename).
    val tmp = java.nio.file.Files.createTempDirectory("graft-pplx-kn")
    try {
      val d1 = Seq.fill(10)("a b").mkString(" ")
      val d2 = "ppp qqq rrr sss ttt uuu vvv www yyy zzz"
        .split(" ").map(w => s"x $w").mkString(" ")
      Seq((1L, d1), (2L, d2)).toDF("doc_id", "text")
        .write.parquet(s"$tmp/documents.parquet")
      val kn = Docs.queries("q_perplexity_kn")(spark, tmp.toString)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getDouble(2))).toMap
      assert(kn(1L)._1 == 19L && kn(2L)._1 == 19L)
      assert(kn(1L)._2 < kn(2L)._2,
        s"boilerplate ${kn(1L)._2} must score below prose ${kn(2L)._2}")
      val jm = Docs.queries("q_perplexity_bigram")(spark, tmp.toString)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(jm.exists { case (id, s) => s != kn(id)._2 },
        "KN and JM must disagree on at least one doc")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("q_quality_gopher: keep is the conjunction of the five rules and " +
      "each rule trips on its designed violator") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-gopher")
    try {
      val good = Seq.fill(12)("the data with table merge").mkString(" ")
      val short_ = "the with data"
      val noStop = Seq.fill(12)("big data from table merge").mkString(" ")
      val hashes = Seq.fill(60)("#").mkString(" ")
      Seq((1L, "en", good), (2L, "en", short_), (3L, "en", noStop),
        (4L, "en", hashes)).toDF("doc_id", "lang", "text")
        .write.parquet(s"$tmp/documents.parquet")
      val rows = Docs.queries("q_quality_gopher")(spark, tmp.toString)
        .collect().map(r => r.getLong(0) -> r).toMap
      def flags(id: Long): Seq[Boolean] =
        (5 to 9).map(i => rows(id).getBoolean(i))
      def keep(id: Long): Boolean = rows(id).getBoolean(10)
      assert(flags(1L).forall(identity) && keep(1L))
      assert(!rows(2L).getBoolean(5) && // r_word_count
        flags(2L).drop(1).forall(identity) && !keep(2L))
      assert(!rows(3L).getBoolean(9) && // r_stop
        flags(3L).take(4).forall(identity) && !keep(3L))
      // 60 '#' tokens: word count passes, mean length / alpha / symbol /
      // stop all fail
      assert(rows(4L).getBoolean(5) && !rows(4L).getBoolean(6) &&
        !rows(4L).getBoolean(7) && !rows(4L).getBoolean(8) &&
        !rows(4L).getBoolean(9) && !keep(4L))
      // keep == conjunction, on every row
      rows.keys.foreach(id => assert(keep(id) == flags(id).forall(identity)))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("q_perplexity_band: bands partition every language into tertiles " +
      "(sizes within 1) and band NLLs are monotone head <= middle <= tail") {
    val rows = Docs.queries("q_perplexity_band")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val langCounts = t(spark, dir, "documents")
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (lang, g) =>
      assert(g.map(_._3).sum == langCounts(lang),
        s"$lang: bands must partition the language's docs")
      val sizes = g.map(_._3)
      assert(sizes.max - sizes.min <= 1,
        s"$lang: tertile sizes $sizes differ by > 1")
      val byBand = g.map(x => x._2 -> x._5).toMap
      // ordered per-doc means ⇒ ordered token-weighted band means; the
      // 1e-5 slack covers a boundary pair separated only below the
      // round-6 rank key's resolution
      for (Seq(a, b) <- Seq("head", "middle", "tail").sliding(2)
           if byBand.contains(a) && byBand.contains(b))
        assert(byBand(a) <= byBand(b) + 1e-5,
          s"$lang: $a nll ${byBand(a)} > $b nll ${byBand(b)}")
    }
    // every token accounted for exactly once
    val totalTokens = t(spark, dir, "documents")
      .agg(sum(size(split(col("text"), " ")))).head().getLong(0)
    assert(rows.map(_._4).sum == totalTokens)
  }

  test("q_dedup_soft: each content unit carries total weight ~1, and a " +
      "3-copy cluster weighs in at 2 effective docs beside a singleton") {
    val rows = Docs.queries("q_dedup_soft")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, eff, ct, effc) =>
      assert(eff > 0.0 && eff <= n)
      assert(effc > 0.0 && effc <= ct)
    }
    // soft dedup's invariant: total effective docs == distinct content
    // units (each cluster's k members contribute k·(1e9 div k)/1e9 ≈ 1,
    // singletons exactly 1) — and units is exactly what hard dedup keeps
    val units = Docs.queries("q_dedup_kept")(spark, dir)
      .agg(sum(col("n_kept"))).head().getLong(0)
    val totalEff = rows.map(_._3).sum
    assert(math.abs(totalEff - units) < 0.01,
      s"effective docs $totalEff != content units $units")
    // hand fixture: 3 identical copies + 1 unique doc → 2.0 effective docs
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-soft-dedup")
    try {
      val dup = "alpha beta gamma delta epsilon zeta eta theta"
      val uniq = "one two three four five six seven eight"
      Seq((1L, dup), (2L, dup), (3L, dup), (4L, uniq))
        .map { case (id, tx) => (id, tx, "en", "s", tx.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$tmp/documents.parquet")
      val r = Docs.queries("q_dedup_soft")(spark, tmp.toString).collect()
      assert(r.length == 1)
      assert(r.head.getLong(1) == 4L)
      assert(r.head.getDouble(2) == 2.0,
        s"3-copy cluster + singleton must yield 2.0, got ${r.head.getDouble(2)}")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("q_dedup_savings: dropped <= totals per source, rate is the exact " +
      "ratio, and the dropped volume complements q_dedup_kept") {
    val rows = Docs.queries("q_dedup_savings")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, nd, ct, cd, rate) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))
      assert(nd <= n && cd <= ct)
      assert(rate == math.rint(nd.toDouble / n * 10000) / 10000)
    }
    val keptChars = Docs.queries("q_dedup_kept")(spark, dir)
      .agg(sum(col("chars_kept"))).head().getLong(0)
    val (tot, dropped) = (rows.map(_.getLong(3)).sum, rows.map(_.getLong(4)).sum)
    assert(tot - dropped == keptChars,
      "savings' complement must equal the kept corpus volume")
  }

  test("q_decontam_kept: kept + flagged partitions the train split") {
    val kept = Docs.queries("q_decontam_kept")(spark, dir)
      .agg(sum(col("n_docs"))).head().getLong(0)
    val flagged = Docs.queries("q_decontam_ngram")(spark, dir).count()
    val train = t(spark, dir, "documents")
      .filter(splitCol(col("doc_id")) === "train").count()
    assert(kept + flagged == train,
      s"kept $kept + flagged $flagged != train $train")
  }

  test("q_split_parity: shares sum to 1 within every split and counts " +
      "cover the corpus") {
    val rows = Docs.queries("q_split_parity")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(4)))
    val total = t(spark, dir, "documents").count()
    assert(rows.map(_._2).sum == total)
    rows.groupBy(_._1).foreach { case (split, g) =>
      val s = g.map(_._3).sum
      assert(math.abs(s - 1.0) < 0.01, // each share rounds to 4 decimals
        s"split $split shares sum to $s")
    }
  }

  test("q_event_transitions: per-from probabilities sum to 1 and counts " +
      "total events minus one per active user") {
    val rows = Events.queries("q_event_transitions")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (from, g) =>
      val s = g.map(_._3).sum
      assert(math.abs(s - 1.0) < 0.01, s"from $from probs sum to $s")
    }
    val ev = t(spark, dir, "events")
    val expected = ev.count() -
      ev.select("user_id").distinct().count()
    assert(rows.map(_._2).sum == expected,
      "each user contributes (events - 1) transitions")
  }

  test("q_mad_outliers: outliers bounded by n, MAD nonnegative, and the " +
      "flag count matches a direct recount") {
    val rows = Events.queries("q_mad_outliers")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, _, mad, out) =>
      assert(mad >= 0.0 && out <= n)
    }
    // direct recount for one type using the same exact percentiles
    val (ty, _, _, _, reported) = rows.head
    val ev = t(spark, dir, "events").filter(col("event_type") === ty)
    val med = ev.agg(expr("percentile(value, 0.5)")).head().getDouble(0)
    val mad = ev.agg(expr(s"percentile(abs(value - $med), 0.5)"))
      .head().getDouble(0)
    val direct = ev.filter(abs(col("value") - med) > 3.0 * 1.4826 * mad)
      .count()
    assert(direct == reported, s"$ty: direct $direct vs $reported")
  }

  test("q_nb: scores are consistent with the eval cells, the classifier " +
      "beats the majority-class baseline on the weak labels, and the " +
      "feature table is sign-consistent") {
    val scores = Docs.queries("q_nb_scores")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    // predicted is exactly score > 0.
    scores.values.foreach { case (_, _, sc, p) => assert(p == (sc > 0)) }
    val ev = Docs.queries("q_nb_eval")(spark, dir).head()
    val (tp, fp, fn, tn) = (ev.getLong(0), ev.getLong(1), ev.getLong(2),
      ev.getLong(3))
    assert(tp + fp + fn + tn == scores.size.toLong)
    // The held-out weak labels recomputed directly; accuracy must beat
    // always-predict-the-majority-class (the classifier learned
    // SOMETHING from the unigram counts).
    val majority = math.max(tp + fn, fp + tn).toDouble / scores.size
    assert(ev.getDouble(4) >= majority - 1e-9,
      s"accuracy ${ev.getDouble(4)} below majority baseline $majority")
    // f1 from the cells, one division.
    assert(ev.getDouble(7) ==
      math.rint(2.0 * tp / (2 * tp + fp + fn) * 10000) / 10000)
    val feats = Docs.queries("q_nb_top_features")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val pos = feats.filter(_._5 == "pos").map(_._4)
    val neg = feats.filter(_._5 == "neg").map(_._4)
    assert(pos.nonEmpty && neg.nonEmpty)
    // Every pos-side weight >= every neg-side weight (they are the two
    // ends of one ranked table).
    assert(pos.min >= neg.max ||
      pos.toSet.intersect(neg.toSet).nonEmpty)
  }

  test("q_rm3: expansion terms are non-query tokens and the expanded " +
      "score dominates the plain BM25 score on every ranked doc") {
    val exp = Docs.queries("q_rm3_terms")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(exp.length == 3)
    assert(exp.map(_._1).toSet
      .intersect(Set("spark", "hash", "merge")).isEmpty)
    assert(exp.forall(_._2 > 0))
    val plain = Docs.queries("q_bm25_topk")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rm3 = Docs.queries("q_bm25_rm3")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // Expansion contributions are nonnegative integer-halved micro
    // scores, so wherever both rankings surface a doc the expanded
    // score can only have grown.
    rm3.keySet.intersect(plain.keySet).foreach { id =>
      assert(rm3(id) >= plain(id) - 1e-9, s"doc $id shrank")
    }
  }

  /** Independent plain-Scala reimplementation of the synthetic multi-line
    * ladder behind q_quality_gopher_lines / q_quality_c4 — a SEPARATE
    * formulation (Vector ops, no Spark expressions), so agreement pins
    * the HOF construction rather than re-running it.
    */
  private def refLines(docId: Long, text: String): Vector[String] = {
    val toks = text.split(" ", -1).toVector
    val lw = (docId % 5 + 4).toInt
    val nl = (toks.size + lw - 1) / lw
    val base = (0 until nl).map { i =>
      val line = toks.slice(i * lw, math.min(i * lw + lw, toks.size))
        .mkString(" ")
      if ((docId + i) % 3 != 0) line + "." else line
    }.toVector
    var out = base
    if (docId % 5 == 0) out = out ++ base.take(1)
    if (docId % 11 == 0) out = out ++ base.take(2)
    if (docId % 7 == 0)
      out :+= "please enable javascript and accept our cookie policy"
    if (docId % 101 == 0) out :+= "lorem ipsum { }"
    if (docId % 13 == 0) out = Docs.headerLines.toVector ++ out
    out
  }

  test("q_quality_gopher_lines: every count matches an independent Scala " +
      "reimplementation of the line ladder, across the whole corpus") {
    val texts = t(spark, dir, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Docs.queries("q_quality_gopher_lines")(spark, dir).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val id = r.getLong(r.fieldIndex("doc_id"))
      val lines = refLines(id, texts(id))
      val paras = lines.grouped(2).map(_.mkString(" ")).toVector
      def dup(v: Vector[String]) = v.size - v.distinct.size
      def dupChars(v: Vector[String]) =
        v.map(_.length).sum - v.distinct.map(_.length).sum
      assert(r.getLong(r.fieldIndex("n_lines")) == lines.size, s"doc $id")
      assert(r.getLong(r.fieldIndex("n_dup_lines")) == dup(lines))
      assert(r.getLong(r.fieldIndex("dup_lines_chars")) == dupChars(lines))
      assert(r.getLong(r.fieldIndex("n_paras")) == paras.size)
      assert(r.getLong(r.fieldIndex("n_dup_paras")) == dup(paras))
      assert(r.getLong(r.fieldIndex("dup_paras_chars")) == dupChars(paras))
      assert(r.getBoolean(r.fieldIndex("keep")) ==
        (dup(lines) * 10 <= lines.size * 3 &&
          dupChars(lines) * 5 <= lines.map(_.length).sum &&
          dup(paras) * 10 <= paras.size * 3 &&
          dupChars(paras) * 5 <= paras.map(_.length).sum))
    }
    // Separation: the ladder must produce real positives AND survivors —
    // a vacuous rule (all-keep or all-drop) would pass parity while
    // testing nothing.
    val keeps = rows.map(r => r.getBoolean(r.fieldIndex("keep")))
    assert(keeps.contains(true) && keeps.contains(false))
    assert(rows.exists(r => r.getLong(r.fieldIndex("n_dup_paras")) > 0))
  }

  test("q_quality_c4: per-line rule counts match the independent ladder, " +
      "and keep_page separates") {
    val texts = t(spark, dir, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Docs.queries("q_quality_c4")(spark, dir).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val id = r.getLong(r.fieldIndex("doc_id"))
      val lines = refLines(id, texts(id))
      def punct(l: String) = ".!?\"".contains(l.last)
      def policy(l: String) =
        l.contains("javascript") || l.contains("cookie")
      def short(l: String) = l.split(" ", -1).length < 3
      val kept = lines.count(l => punct(l) && !short(l) && !policy(l))
      assert(r.getLong(r.fieldIndex("n_lines")) == lines.size, s"doc $id")
      assert(r.getLong(r.fieldIndex("n_unpunct_lines")) ==
        lines.count(!punct(_)))
      assert(r.getLong(r.fieldIndex("n_short_lines")) == lines.count(short))
      assert(r.getLong(r.fieldIndex("n_policy_lines")) ==
        lines.count(policy))
      assert(r.getLong(r.fieldIndex("n_kept_lines")) == kept)
      assert(r.getBoolean(r.fieldIndex("has_lorem")) ==
        lines.exists(_.contains("lorem ipsum")))
      assert(r.getBoolean(r.fieldIndex("has_brace")) ==
        lines.exists(_.contains("{")))
      assert(r.getBoolean(r.fieldIndex("keep_page")) ==
        (kept >= 5 && !lines.exists(_.contains("lorem ipsum")) &&
          !lines.exists(_.contains("{"))))
    }
    val keeps = rows.map(r => r.getBoolean(r.fieldIndex("keep_page")))
    assert(keeps.contains(true) && keeps.contains(false))
    assert(rows.exists(r => r.getLong(r.fieldIndex("n_policy_lines")) > 0))
  }

  test("q_dedup_cross_source: unordered pair key is normalized and pair " +
      "counts sum to the verified pair total") {
    val rows = Docs.queries("q_dedup_cross_source")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    rows.foreach { case (lo, hi, _) => assert(lo <= hi) }
    val total = graft.ext.Dedup.minhashVerifiedPairs(
      t(spark, dir, "documents"), "doc_id", "text", 0.5).count()
    assert(rows.map(_._3).sum == total)
  }
}
