package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFns
import graft.operators.TextOps

class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = TestSpark.sf0001

  test("tokens drop empty tokens (empty-value filter, " +
    "exclusion_requests.py:158)") {
    val got = Seq("a  b ", " ", "x").toDF("text")
      .select(TextFns.tokens($"text")).as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("a", "b"), Seq(), Seq("x")))
  }

  test("shingles: n-2 shingles for n tokens, empty below n") {
    val got = Seq("a b c d", "a b", "").toDF("text")
      .select(TextFns.shingles($"text", 3)).as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("a b c", "b c d"), Seq(), Seq()))
  }

  test("fingerprintShape is token-order invariant, fingerprintExact is not") {
    val Seq((s1, e1), (s2, e2)) = Seq("x y z", "z  y x").toDF("text")
      .select(TextFns.fingerprintShape($"text"), TextFns.fingerprintExact($"text"))
      .as[(String, String)].collect().toSeq
    assert(s1 == s2)
    assert(e1 != e2)
  }

  test("minhash: identical shingle sets give identical signatures") {
    // same tokens, different multiplicity/order → same distinct-shingle
    // derived signature only when shingle sets match exactly
    val df = Seq((1L, "a b c a b c"), (2L, "a b c a b c")).toDF("doc_id", "text")
    df.createOrReplaceTempView("dup_docs")
    val sh = df.select($"doc_id", explode(TextFns.shingles($"text", 3)).as("shingle"))
      .distinct()
      .groupBy("doc_id").agg(TextFns.minhashLeg($"shingle", 0).as("h0"))
      .orderBy("doc_id").as[(Long, String)].collect()
    assert(sh(0)._2 == sh(1)._2)
  }

  test("q_text_dedup: n_copies sums to row count; keepers unique") {
    val out = TextOps.q_text_dedup(spark, dir).collect()
    val total = Tables(spark, dir, "documents").count()
    assert(out.map(_.getLong(2)).sum == total)
    val keepers = out.map(_.getLong(1))
    assert(keepers.distinct.length == keepers.length)
  }

  test("q_dedup_ngram: jaccard within (0,1], pairs ordered a<b") {
    val out = TextOps.q_dedup_ngram(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val j = r.getDouble(5)
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("ngram df-cap truncation is observable, not silent") {
    // skewed fixture: one shingle above the cap, one below
    val sh = ((1 to 6).map(i => (i.toLong, "hot")) ++
      Seq((1L, "cold"), (2L, "cold"))).toDF("doc_id", "shingle")
    val dropped = TextOps.shingleDfCapDropped(sh, 5).collect()
    assert(dropped.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("hot", 6L)))
    // the production cap drops nothing on this fixture — "no silent
    // truncation" is auditable, not assumed
    val real = Tables(spark, dir, "documents")
      .select($"doc_id", explode(TextFns.shingles($"text", 3)).as("shingle"))
      .distinct()
    assert(TextOps.shingleDfCapDropped(real, TextOps.maxShingleDf).isEmpty)
  }

  test("q_dedup_simhash: identical docs would be hamming 0; " +
    "all reported pairs within threshold") {
    TextOps.q_dedup_simhash(spark, dir).collect()
      .foreach(r => assert(r.getLong(2) <= TextOps.simhashHammingMax))
  }

  test("simhash: 64-bit signature as two 32-bit halves; block-combination " +
    "banding is lossless for the verify and keys ≥30 bits per bucket") {
    val sig = TextOps.simhashSignatures(spark, dir)
    val sigs = sig.as[(Long, Long, Long)].collect()
    assert(sigs.nonEmpty)
    sigs.foreach { case (_, hi, lo) =>
      assert(hi >= 0L && hi < (1L << 32))
      assert(lo >= 0L && lo < (1L << 32))
    }
    // geometry: 6 blocks tile the 64 bits exactly, C(6,3) = 20
    // combinations, every combination keys ≥ 30 bits — vs the
    // round-2…4 layouts' CONSTANT 2^9 / 2^16 bucket spaces (the
    // sf100 spot measured the 2^16 space saturating at 10M docs)
    assert(TextOps.simhashBlocks.map(_._3).sum == TextOps.simhashBits)
    assert(TextOps.simhashCombos.size == 20)
    val minKeyBits = TextOps.simhashCombos
      .map(c => c.map(TextOps.simhashBlocks(_)._3).sum).min
    assert(minKeyBits >= 30)
    // pigeonhole losslessness: hammingMax flips dirty ≤ hammingMax
    // blocks, and each combination takes nBlocks − hammingMax clean
    // blocks, so the all-clean combination always exists
    assert(TextOps.simhashCombos.head.size ==
      TextOps.simhashNBlocks - TextOps.simhashHammingMax)
    // observed bucket ids actually use the widened range: beyond
    // anything the old 16-bit band space could produce
    val bands = TextOps.simhashBandRows(sig)
    assert(bands.agg(max($"bucket")).as[Long].head() >= (1L << 16))
    // each doc fans to exactly one row per combination
    assert(bands.count() == sigs.length.toLong * TextOps.simhashCombos.size)
  }

  test("q_bpe_train: merge counts are monotone nonincreasing, symbol " +
    "counts strictly decrease by the merge count, and the first " +
    "merge matches a brute-force pair count") {
    val out = TextOps.q_bpe_train(spark, dir)
      .as[(Long, String, String, Long, Long)].collect()
    assert(out.length == TextOps.bpeTrainMerges)
    assert(out.map(_._1).toSeq == (1L to TextOps.bpeTrainMerges).toSeq)
    out.foreach { case (_, pair, merged, cnt, _) =>
      assert(pair.count(_ == ' ') == 1)
      assert(merged == pair.replace(" ", ""))
      assert(cnt >= 1)
    }
    // each merge replaces `applications` pair occurrences, and every
    // application removes exactly one symbol, so the corpus symbol
    // count strictly decreases round over round (never by more than
    // the round's pair count — overlapping occurrences can't all be
    // applied)
    val symbols = out.map(_._5)
    symbols.zip(symbols.tail).zip(out.tail).foreach {
      case ((before, after), r) =>
        assert(after < before, s"step ${r._1} did not shrink the corpus")
        assert(before - after <= r._4, s"step ${r._1} removed more than cnt")
    }
    // argmax counts are monotone nonincreasing (a new pair formed by
    // the merged symbol can occur at most as often as the merge did)
    val cnts = out.map(_._4)
    cnts.zip(cnts.tail).foreach { case (a, b) => assert(b <= a) }
    // brute-force the FIRST merge from the raw corpus
    val words = Tables(spark, dir, "documents")
      .select(explode(graft.functions.TextFns.tokens($"text")).as("tok"))
      .groupBy("tok").count().as[(String, Long)].collect()
    val pairCounts = scala.collection.mutable.Map[String, Long]()
    words.foreach { case (w, c) =>
      w.toSeq.sliding(2).filter(_.length == 2).foreach { p =>
        val key = s"${p(0)} ${p(1)}"
        pairCounts(key) = pairCounts.getOrElse(key, 0L) + c
      }
    }
    val bestBrute = pairCounts.toSeq.sortBy { case (p, c) => (-c, p) }.head
    assert(out.head._2 == bestBrute._1 && out.head._4 == bestBrute._2,
      s"first merge ${out.head._2}/${out.head._4} vs brute $bestBrute")
  }

  test("q_bpe_encode: per-doc symbol totals reconcile with the " +
    "trainer's final corpus count and bound between words and chars") {
    val enc = TextOps.q_bpe_encode(spark, dir)
      .as[(Long, Long, Long)].collect()
    val train = TextOps.q_bpe_train(spark, dir)
      .as[(Long, String, String, Long, Long)].collect()
    // Σ per-doc symbols == the trainer's symbols_after at the last
    // merge (the two queries share one declared convention)
    assert(enc.map(_._3).sum == train.last._5)
    enc.foreach { case (_, nTok, nSym) =>
      assert(nSym >= nTok, "a word never encodes below one symbol")
    }
    // every doc is present
    assert(enc.length == Tables(spark, dir, "documents").count())
  }

  test("q_quality_vs_dup: bands partition the corpus, removed totals " +
    "reconcile with q_dup_share, and the removed rule is identical") {
    val out = TextOps.q_quality_vs_dup(spark, dir)
      .as[(Double, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    assert(out.map(_._1).forall(Set(0.0, 0.5, 1.0)))
    assert(out.map(_._2).sum == Tables(spark, dir, "documents").count())
    val dupShare = TextOps.q_dup_share(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(out.map(_._3).sum == dupShare.map(_._3).sum,
      "one 'removed' rule across both audits")
    out.foreach { r =>
      assert(r._4 >= 0.0 && r._4 <= 1.0)
      assert(r._3 <= r._2)
    }
  }

  test("q_dedup_eval_sweep: the τ=1/2 row reproduces q_dedup_eval; " +
    "truth sets nest and precision is monotone in τ") {
    val sweep = TextOps.q_dedup_eval_sweep(spark, dir)
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(sweep.keySet == Set("1/3", "1/2", "2/3"))
    val single = TextOps.q_dedup_eval(spark, dir).collect().head
    val half = sweep("1/2")
    assert(half._2 == single.getLong(0) && half._3 == single.getLong(1)
      && half._4 == single.getLong(2))
    assert(half._5 == single.getDouble(5) && half._6 == single.getDouble(6))
    // by fraction value: 1/3 < 1/2 < 2/3
    val ordered = Seq(sweep("1/3"), sweep("1/2"), sweep("2/3"))
    // tightening τ shrinks truth (nested) and with a FIXED candidate
    // set, tp shrinks with it, so precision is monotone nonincreasing
    ordered.map(_._2).sliding(2).foreach { case Seq(a, b) => assert(b <= a) }
    ordered.map(_._4).sliding(2).foreach { case Seq(a, b) => assert(b <= a) }
    ordered.map(_._5).sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9)
    }
    // candidate set identical across rows
    assert(ordered.map(_._3).distinct.size == 1)
    ordered.foreach { r => assert(r._4 <= math.min(r._2, r._3)) }
  }

  test("q_coverage_curve: deciles reconcile with the corpus and the " +
    "distinct-shingle universe; curve is monotone ending at 1.0") {
    val out = TextOps.q_coverage_curve(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq == (1L to 10L))
    assert(out.map(_._2).sum ==
      Tables(spark, dir, "documents").count())
    val totalShingles = Tables(spark, dir, "documents")
      .select(explode(graft.functions.TextFns.shingles($"text", 3))
        .as("sh")).select("sh").distinct().count()
    assert(out.map(_._3).sum == totalShingles)
    assert(out.last._4 == totalShingles && out.last._5 == 1.0)
    val cums = out.map(_._4)
    cums.zip(cums.tail).foreach { case (a, b) => assert(b >= a) }
    // first decile carries the largest marginal contribution on an
    // id-ordered pass (every shingle seen there is new)
    assert(out.head._3 == out.map(_._3).max)
  }

  test("q_decontaminate: eval docs never flagged; hits bounded by " +
    "eval shingle count; eval side broadcast") {
    val out = TextOps.q_decontaminate(spark, dir).collect()
    out.foreach { r =>
      assert(r.getLong(0) % 50 != 0, "eval split must not flag itself")
      assert(r.getLong(1) >= 1L && r.getLong(2) >= 1L)
      assert(r.getLong(1) >= r.getLong(2) ||
        r.getLong(2) >= 1L) // n_hit >= 1, n_eval_docs >= 1
    }
    // the eval shingle set must ride a broadcast join, never a shuffle
    val plan = TextOps.q_decontaminate(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("q_pack: offsets are exact running sums, bins cut every " +
    "packBudget tokens, shards partition the corpus") {
    val out = TextOps.q_pack(spark, dir)
      .as[(Long, String, Long, Long, Long, Long)].collect()
    assert(out.map(_._1).distinct.length ==
      Tables(spark, dir, "documents").count())
    // per (lang, shard) chain: offset = sum of predecessors' n_tok,
    // bin = offset / budget
    out.groupBy(r => (r._2, r._3)).foreach { case (_, chain) =>
      var run = 0L
      chain.sortBy(_._1).foreach { case (_, _, shard, nTok, bin, off) =>
        assert(shard >= 0L && shard < TextOps.packShards)
        assert(off == run, "offset must be the exact running sum")
        assert(bin == off / TextOps.packBudget)
        run += nTok
      }
    }
  }

  test("q_dedup_incremental: probes only the new batch against " +
    "history, and every hit is a whole-corpus candidate pair") {
    val hits = TextOps.q_dedup_incremental(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hits.nonEmpty)
    hits.foreach { case (newId, n, firstMatch) =>
      assert(newId % 5 == 0, "only new-batch docs may be flagged")
      assert(firstMatch % 5 != 0, "matches must come from history")
      assert(n >= 1L)
    }
    // the incremental probe is a restriction of the full pairing:
    // (new, first_match) must appear among q_dedup_minhash's pairs
    val full = TextOps.q_dedup_minhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    hits.foreach { case (newId, _, m) =>
      assert(full.contains((math.min(newId, m), math.max(newId, m))),
        s"($newId, $m) missing from the whole-corpus pairing")
    }
  }

  test("q_mixture_weights: shares sum to 1, weight inverts the " +
    "observed share against the uniform target") {
    val rows = TextOps.q_mixture_weights(spark, dir).collect()
      .map(r => (r.getLong(2), r.getDouble(4), r.getDouble(5), r.getLong(6)))
    val cells = rows.length
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-2) // 4dp rounding drift
    rows.foreach { case (nDocs, share, weight, repeat) =>
      assert(nDocs >= 1L && share > 0.0 && weight > 0.0)
      // weight * share ≈ uniform target share (both 4dp-rounded)
      assert(math.abs(weight * share - 1.0 / cells) < 1e-3)
      // repeat = ceil(unrounded weight); the weight column is
      // 4dp-rounded, so check the ceil envelope with that slack
      assert(repeat >= 1L && repeat.toDouble >= weight - 1e-4 &&
        repeat.toDouble < weight + 1.0 + 1e-4)
    }
  }

  test("q_token_entropy: 0 <= H <= ln(n_types) and 0 < ttr <= 1; " +
    "uniform and constant docs hit the bounds") {
    TextOps.q_token_entropy(spark, dir).collect().foreach { r =>
      val (n, types, h, ttr) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      // h is rounded to 4dp in the output, so allow half-ulp of that
      assert(h >= -1e-9 && h <= math.log(types.toDouble) + 5e-5,
        s"entropy $h outside [0, ln($types)]")
      assert(ttr > 0.0 && ttr <= 1.0 && types <= n)
    }
    // closed-form sanity on controlled docs: all-same-token → H = 0,
    // all-distinct → H = ln(n)
    val probe = Seq((1L, "a a a a"), (2L, "a b c d")).toDF("doc_id", "text")
    val tf = probe.select($"doc_id", explode(TextFns.tokens($"text")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("c"))
    val got = tf.groupBy("doc_id")
      .agg((log(sum($"c")) - sum($"c" * log($"c")) / sum($"c")).as("h"))
      .orderBy("doc_id").as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L)) < 1e-12)
    assert(math.abs(got(2L) - math.log(4.0)) < 1e-12)
  }

  test("q_lm_score: nll is the cross-entropy vs the corpus LM, so it " +
    "dominates each doc's own entropy; uniform corpus hits ln(V)") {
    // Gibbs: H(p_doc, q_corpus) >= H(p_doc) — join the two declared
    // queries and assert the information inequality row by row
    val nll = TextOps.q_lm_score(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    val ent = TextOps.q_token_entropy(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(nll.nonEmpty && nll.keySet == ent.keySet)
    nll.foreach { case (id, (n, ppl)) =>
      assert(n >= ent(id) - 1e-4, s"doc $id: nll $n < entropy ${ent(id)}")
      assert(math.abs(ppl - math.exp(n)) < math.exp(n) * 1e-3)
    }
    // all-uniform probe corpus: every doc scores exactly ln(V)
    val probe = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val tk = probe.select($"doc_id", explode(TextFns.tokens($"text")).as("tok"))
    val tf = tk.groupBy("tok").agg(count(lit(1)).as("tf"))
    val got = tk.join(tf, Seq("tok"))
      .groupBy("doc_id")
      .agg((log(lit(4.0)) - sum(log($"tf")) / count(lit(1))).as("nll"))
      .as[(Long, Double)].collect().toMap
    assert(got.values.forall(v => math.abs(v - math.log(4.0)) < 1e-12))
  }

  test("q_chunk: windows tile every token exactly, overlap = " +
    "size - stride, and chunking is a map-only plan") {
    val docs = Tables(spark, dir, "documents")
      .select($"doc_id", size(TextFns.tokens($"text")).as("n"))
      .as[(Long, Int)].collect().toMap
    val chunks = TextOps.q_chunk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    docs.filter(_._2 > 0).foreach { case (id, n) =>
      val cs = chunks(id).sortBy(_._2)
      // starts are consecutive stride multiples from 0; last start < n
      assert(cs.map(_._3).toSeq ==
        cs.indices.map(_.toLong * TextOps.chunkStride))
      assert(cs.last._3 < n)
      // every chunk is clipped exactly at the doc boundary:
      // n_tok = min(size, n - start) ⇒ full coverage, no overrun
      cs.foreach(c =>
        assert(c._4 == math.min(TextOps.chunkSize.toLong, n - c._3)))
      assert(cs.map(c => c._3 + c._4).max == n)
    }
    // chunk generation itself shuffles nothing: the only Exchange in
    // the plan is the final declared ORDER BY's range partitioning
    val plan = TextOps.q_chunk(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan.take(1500))
  }

  test("q_boilerplate: ratio bounds, counts consistent with the " +
    "declared df threshold") {
    val out = TextOps.q_boilerplate(spark, dir).collect()
    assert(out.length == Tables(spark, dir, "documents").count())
    out.foreach { r =>
      val (nSh, nB, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nB <= nSh)
      assert(ratio >= 0.0 && ratio <= 1.0)
      if (nSh > 0)
        assert(math.abs(ratio - nB.toDouble / nSh) < 5e-5)
    }
    // a shingle every doc shares must count as boilerplate everywhere
    val probe = (1L to 5L).map(i => (i, "common three gram x" + i))
      .toDF("doc_id", "text")
    probe.createOrReplaceTempView("probe_boiler")
    val sh = probe.select($"doc_id",
      explode(TextFns.shingles($"text", 3)).as("shingle")).distinct()
    val dfs = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val boiler = sh.join(dfs, "shingle")
      .filter($"df" >= TextOps.boilerplateMinDf)
      .select("doc_id").distinct().count()
    assert(boiler == 5)
  }

  test("q_cooccur: vocabulary bounded, n_pair <= min(df), pmi " +
    "matches the closed form") {
    val out = TextOps.q_cooccur(spark, dir).collect()
    assert(out.nonEmpty)
    val vocabSeen = out.flatMap(r => Seq(r.getString(0), r.getString(1)))
      .distinct
    assert(vocabSeen.length <= TextOps.cooccurVocab)
    val nDocs = Tables(spark, dir, "documents").count().toDouble
    out.foreach { r =>
      val (a, b, np, dfa, dfb, pmi) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(a < b, "pairs must be ordered a < b")
      assert(np >= TextOps.cooccurMinPairDf && np <= math.min(dfa, dfb))
      val expect = math.log(np * nDocs / (dfa * dfb))
      assert(math.abs(pmi - expect) < 5e-5)
    }
  }

  test("q_dedup_span: coverage/run invariants and symmetry of the " +
    "shared relation") {
    val w = TextOps.dedupSpanW
    val out = TextOps.q_dedup_span(spark, dir).collect()
    assert(out.nonEmpty, "fixture has no duplicated spans at W=" + w)
    out.foreach { r =>
      val (nShared, covered, maxSpan) =
        (r.getLong(1), r.getLong(2), r.getLong(3))
      // every shared window is at least one window long
      assert(maxSpan >= w && nShared >= 1)
      // the longest span's tokens are a subset of all covered tokens,
      // and coverage can't exceed W tokens per shared window
      assert(covered >= maxSpan && covered <= nShared * w)
      // n runs = total shared minus (run-1) merges; max run ≤ n_shared
      assert(maxSpan - (w - 1) <= nShared)
    }
    // sharing is symmetric: a single doc can never be the only one
    // with shared windows
    assert(out.length != 1)
  }

  test("q_outlier: integer flag agrees with the rounded z at 2 sigma") {
    val out = TextOps.q_outlier(spark, dir).collect()
    assert(out.length == Tables(spark, dir, "documents").count())
    out.foreach { r =>
      val (z, flag) = (r.getDouble(3), r.getLong(4))
      // the flag is exact integer arithmetic; z is rounded to 4dp, so
      // the two can only disagree within rounding distance of the cut
      if (flag == 1L) assert(math.abs(z) > 2.0 - 1e-4)
      else assert(math.abs(z) <= 2.0 + 1e-4)
    }
    // per-language z-scores must standardize: mean ~0 (z sums to ~0)
    val byLang = out.groupBy(_.getString(1))
    byLang.foreach { case (_, rows) =>
      val zsum = rows.map(_.getDouble(3)).sum
      assert(math.abs(zsum) < rows.length * 1e-3)
    }
  }

  test("fuzzyJoin: deletion-neighborhood blocking admits distance-2 " +
    "false positives and the levenshtein verify discards them") {
    // "ab" and "ba" share deletion variants "a" and "b" but are at
    // edit distance 2 — they MUST be blocked as candidates yet absent
    // from the verified output; matches at 0 and 1 survive
    val dict = Seq("ab", "kitten", "sittin").toDF("term")
    val vocab = Seq("ba", "ab", "mitten", "sitting", "kitten").toDF("tok")
    val got = graft.operators.TextOps.fuzzyJoin(dict, vocab)
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(
      ("ab", "ab", 0L), // exact
      ("kitten", "kitten", 0L),
      ("kitten", "mitten", 1L), // substitution (shared variant "itten")
      ("sittin", "sitting", 1L))) // insertion (sitting minus 'g')
    assert(!got.exists { case (a, b, _) => a == "ab" && b == "ba" })
  }

  /** Independent greedy reference for applyBpeMerge: leftmost
    * non-overlapping replacement in one left-to-right pass.
    */
  private def greedyMerge(toks: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toSeq
  }

  test("applyBpeMerge: greedy left-to-right, matches independent fold") {
    // the canonical overlap trap: (a,a) over [a,a,a] must give [aa,a],
    // and over [a,a,a,a] must give [aa,aa]
    val cases = Seq(
      ("a a a", "a", "a"),
      ("a a a a", "a", "a"),
      ("x a b a b x", "a", "b"),
      ("a b", "a", "b"),
      ("b a", "a", "b"),
      ("", "a", "b"),
      ("q", "a", "b"),
      ("a b a b a b", "b", "a"))
    for ((text, a, b) <- cases) {
      val got = Seq(text).toDF("text")
        .select(TextOps.applyBpeMerge(TextFns.tokens($"text"), a, b))
        .as[Seq[String]].head()
      val want = greedyMerge(text.split(" ").filter(_.nonEmpty).toSeq, a, b)
      assert(got == want, s"text='$text' pair=($a,$b): $got != $want")
    }
  }

  test("applyBpeMerge on the fixture corpus: token counts drop by " +
    "exactly the merged-pair occurrences, nothing else changes") {
    val (a, b) = {
      // most frequent adjacent pair from the declared trainer stats
      val top = TextOps.q_bpe_pairs(spark, dir).head()
      val Array(x, y) = top.getString(0).split(" ", 2)
      (x, y)
    }
    val rows = Tables(spark, dir, "documents")
      .select($"doc_id", TextFns.tokens($"text").as("toks"))
      .select($"doc_id", $"toks",
        TextOps.applyBpeMerge($"toks", a, b).as("merged"))
      .as[(Long, Seq[String], Seq[String])].collect()
    assert(rows.exists { case (_, t, m) => m.length < t.length })
    rows.foreach { case (id, t, m) =>
      assert(m == greedyMerge(t, a, b), s"doc $id diverges from reference")
    }
  }

  test("q_feature_hash: bucket masses partition the token stream and " +
    "signs bound the signed mass") {
    val out = TextOps.q_feature_hash(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4)))
    assert(out.nonEmpty)
    assert(out.forall { case (b, _, _) => "0123456789abcdef".contains(b) })
    val totalTokens = Tables(spark, dir, "documents")
      .select(explode(TextFns.tokens($"text")).as("tok")).count()
    assert(out.map(_._2).sum == totalTokens,
      "bucket token counts do not partition the corpus token stream")
    out.foreach { case (b, n, mass) =>
      assert(math.abs(mass) <= n, s"bucket $b |signed_mass| > n_tokens")
      assert((mass - n) % 2 == 0, // mass = n_plus - n_minus, n = sum
        s"bucket $b mass/count parity violated")
    }
  }

  test("q_pii_scan: the audit agrees with the scrubber — a document " +
    "counts as PII-bearing iff q_redact would touch it") {
    val scan = TextOps.q_pii_scan(spark, dir).collect()
    scan.foreach { r =>
      assert(r.getLong(4) >= r.getLong(2)) // hits >= docs_with
      assert(r.getLong(5) >= r.getLong(3))
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 100.0)
      assert(r.getDouble(7) >= 0.0 && r.getDouble(7) <= 100.0)
    }
    val nDocs = scan.map(_.getLong(1)).sum
    assert(nDocs == Tables(spark, dir, "documents").count())
    // cross-check total PII-bearing docs against redact's touched set
    val touched = TextOps.q_redact(spark, dir)
      .filter(org.apache.spark.sql.functions.col("chars_redacted") > 0)
      .count()
    val anyPii = TextOps.q_pii_scan(spark, dir).collect()
    // docs_with_email + docs_with_number >= touched (a doc with both
    // is counted twice on the left), and each alone is <= touched
    assert(anyPii.map(r => r.getLong(2) + r.getLong(3)).sum >= touched)
    assert(anyPii.map(_.getLong(2)).sum <= touched)
    assert(anyPii.map(_.getLong(3)).sum <= touched)
  }

  test("q_dedup_eval: confusion-matrix identities hold and the " +
    "ratios are consistent with the counts") {
    val r = TextOps.q_dedup_eval(spark, dir).collect().head
    val (nt, nc, tp, fp, fn) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    assert(tp + fp == nc, "fp must be the non-true candidates")
    assert(tp + fn == nt, "fn must be the missed true pairs")
    val (p, rec) = (r.getDouble(5), r.getDouble(6))
    assert(p >= 0.0 && p <= 1.0 && rec >= 0.0 && rec <= 1.0)
    if (nc == 0) assert(p == 0.0)
    else assert(math.abs(p - tp.toDouble / nc) < 1e-4)
    if (nt == 0) assert(rec == 0.0)
    else assert(math.abs(rec - tp.toDouble / nt) < 1e-4)
  }

  test("q_cluster_stats: size classes partition the corpus and the " +
    "checksum column is exact") {
    val out = TextOps.q_cluster_stats(spark, dir).collect()
    out.foreach { r =>
      assert(r.getLong(2) == r.getLong(0) * r.getLong(1),
        "n_docs must equal csize * n_clusters")
    }
    assert(out.map(_.getLong(2)).sum ==
      Tables(spark, dir, "documents").count(),
      "size classes must cover every document exactly once")
  }

  test("q_entity_resolve: canonical is the lexicographic min member " +
    "and counts match group sizes") {
    val out = TextOps.q_entity_resolve(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.nonEmpty)
    assert(out.map(_._2).distinct.length == out.length,
      "a surface form resolved to two entities")
    out.groupBy(_._1).foreach { case (ent, members) =>
      assert(members.map(_._2).min == ent,
        s"entity $ent is not its own min member")
      assert(members.forall(_._3 == members.length),
        s"entity $ent count mismatch")
      assert(members.length >= 2,
        s"entity $ent has no variant pair")
    }
  }

  test("q_distinct_ngrams: one row per n with consistent integer " +
    "totals and an exact brute-force recount for n=2") {
    val out = TextOps.q_distinct_ngrams(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    out.foreach { case (n, total, dist, ratio) =>
      assert(dist > 0 && dist <= total, s"n=$n distinct/total inconsistent")
      assert(math.abs(ratio - dist.toDouble / total) < 1e-6)
    }
    // each doc with k >= n tokens contributes exactly k-n+1 n-grams,
    // so totals strictly decrease with n on any non-degenerate corpus
    assert(out(0)._2 > out(1)._2 && out(1)._2 > out(2)._2)
    // brute-force recount of the n=2 row via a direct shingle explode
    val docs = Tables(spark, dir, "documents")
    val g2 = docs.select(explode(
      graft.functions.TextFns.shingles(col("text"), 2)).as("g"))
    assert(out(1)._2 == g2.count(), "total 2-grams recount mismatch")
    assert(out(1)._3 == g2.distinct().count(), "distinct 2-grams mismatch")
  }

  test("q_dedup_containment: the integer gate, the ratio, and the " +
    "contained side are internally consistent on every emitted pair") {
    val out = TextOps.q_dedup_containment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getLong(6)))
    out.foreach { case (a, b, inter, na, nb, c, contained) =>
      assert(a < b, "pair not ordered")
      assert(inter >= 2 && inter <= math.min(na, nb),
        s"($a,$b) inter $inter outside [2, min($na,$nb)]")
      assert(2 * inter >= math.min(na, nb), s"($a,$b) fails the 1/2 gate")
      assert(c >= 0.5 && c <= 1.0, s"($a,$b) containment $c out of range")
      assert(math.abs(c - BigDecimal(inter.toDouble / math.min(na, nb))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      assert(contained == (if (na <= nb) a else b),
        s"($a,$b) contained side mislabeled")
      // containment always dominates Jaccard on the same pair
      val jac = inter.toDouble / (na + nb - inter)
      assert(c >= jac - 1e-9, s"($a,$b) containment below Jaccard")
    }
  }

  test("q_kl_mixture: every source appears once; KL is nonnegative " +
    "up to per-term rounding slack") {
    val out = TextOps.q_kl_mixture(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val nSources = Tables(spark, dir, "documents")
      .select("source").distinct().count()
    assert(out.length == nSources, "a source is missing from the report")
    assert(out.map(_._1).distinct.length == out.length)
    out.foreach { case (src, nTerms, kl) =>
      assert(nTerms > 0, s"$src has no terms")
      // Gibbs: true KL >= 0; each term is rounded to 1e-6 before the
      // sum, so the floor is -5e-7 * n_terms
      assert(kl >= -5e-7 * nTerms, s"$src KL=$kl below rounding floor")
    }
    assert(out.exists(_._3 > 0.0), "no source diverges from the blend")
  }

  test("q_source_profile: volumes cover the corpus and the language " +
    "yield reconciles with q_lang_id") {
    val out = TextOps.q_source_profile(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    val docs = Tables(spark, dir, "documents")
    assert(out.map(_._2).sum == docs.count())
    val enTotal = TextOps.q_lang_id(spark, dir).collect()
      .count(_.getString(3) == "en").toLong
    assert(out.map(_._4).sum == enTotal,
      "per-source en yield diverges from q_lang_id")
    out.foreach { case (src, n, tok, en, score, avgTok) =>
      assert(en <= n, s"$src: n_en exceeds n_docs")
      assert(score >= 0.0 && score <= 1.0, s"$src avg_score $score")
      assert(math.abs(avgTok - tok.toDouble / n) < 0.005 + 1e-9,
        s"$src avg_tok inconsistent with totals")
    }
    Caches.releaseAll()
  }

  test("q_dup_matrix: pair mass partitions the candidate list and " +
    "cells are unordered source pairs") {
    val out = TextOps.q_dup_matrix(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nPairs = TextOps.minhashCandidatePairs(spark, dir).count()
    assert(out.map(_._3).sum == nPairs,
      "matrix mass != candidate pair count")
    out.foreach { case (a, b, n) =>
      assert(a <= b, s"cell ($a,$b) not canonically ordered")
      assert(n >= 1)
    }
    assert(out.map(p => (p._1, p._2)).distinct.length == out.length)
    Caches.releaseAll()
  }

  test("q_hamming_hist: bounded distances, monotone cumulative, and " +
    "the below-threshold mass equals q_dedup_simhash's pair count") {
    val out = TextOps.q_hamming_hist(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    out.foreach { case (h, n, _, share) =>
      assert(h >= 0 && h <= TextOps.hammingAuditMax,
        s"hamming $h past the audit ceiling")
      assert(n > 0)
      assert(share > 0.0 && share <= 1.0 + 1e-9)
    }
    val sorted = out.sortBy(_._1)
    assert(sorted.map(_._2).sum == sorted.last._3,
      "cumulative tail is not the total")
    assert(math.abs(sorted.last._4 - 1.0) < 1e-9)
    sorted.zip(sorted.tail).foreach { case (a, b) =>
      assert(a._3 < b._3, "cumulative counts not strictly increasing")
    }
    val gated = TextOps.q_dedup_simhash(spark, dir).count()
    assert(sorted.filter(_._1 <= TextOps.simhashHammingMax)
      .map(_._2).sum == gated,
      "histogram mass below the verify threshold diverges from the dedup")
    Caches.releaseAll()
  }

  test("q_degree_dist: degree mass is twice the pair count and nodes " +
    "cover the pair universe") {
    val out = TextOps.q_degree_dist(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairs = TextOps.minhashCandidatePairs(spark, dir).collect()
    assert(out.map { case (d, n) => d * n }.sum == 2L * pairs.length,
      "sum of degrees != 2|E|")
    assert(out.map(_._2).sum ==
      pairs.flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct.length)
    out.foreach { case (d, n) => assert(d >= 1 && n >= 1) }
    Caches.releaseAll()
  }

  test("q_topic_terms: ranks are contiguous, scores non-increasing, " +
    "and the top terms match a brute-force log-odds recompute") {
    val out = TextOps.q_topic_terms(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))
    val bySrc = out.groupBy(_._1)
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (src, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a._4 >= b._4, s"$src scores increase at rank ${b._2}")
      }
    }
    // brute-force reference on the raw token stream
    val toks = Tables(spark, dir, "documents")
      .select(col("source"),
        explode(graft.functions.TextFns.tokens(col("text"))).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val st = toks.groupBy(identity).map { case ((s0, t0), xs) =>
      ((s0, t0), xs.length.toLong) }
    val ts = st.groupBy(_._1._1).map { case (s0, m) => (s0, m.values.sum) }
    val ct = st.groupBy(_._1._2).map { case (t0, m) => (t0, m.values.sum) }
    val tt = ct.values.sum
    def r6(d: Double) =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = st.keys.groupBy(_._1).map { case (s0, keys) =>
      val scored = keys.map { case (_, t0) =>
        val c = st((s0, t0)); val co = ct(t0) - c
        val num = (c + 1).toDouble * (tt - ts(s0) - co + 1).toDouble
        val den = (ts(s0) - c + 1).toDouble * (co + 1).toDouble
        (t0, r6(math.log(num / den)))
      }.toSeq.sortBy { case (t0, sc) => (-sc, t0) }
        .take(TextOps.topicTermsK)
      (s0, scored)
    }
    bySrc.foreach { case (src, rows) =>
      val got = rows.sortBy(_._2).map(r => (r._3, r._4)).toSeq
      assert(got == want(src), s"$src top terms diverge from reference")
    }
    Caches.releaseAll()
  }

  test("q_source_overlap: one row per source pair; inter and jaccard " +
    "match a brute-force set recompute") {
    val out = TextOps.q_source_overlap(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    val sets = Tables(spark, dir, "documents")
      .select(col("source"), explode(
        graft.functions.TextFns.shingles(col("text"), 3)).as("sh"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2).toSet) }
    val srcs = sets.keys.toSeq.sorted
    assert(out.size == srcs.combinations(2).size,
      "missing or extra source pairs")
    for (Seq(a, b) <- srcs.combinations(2)) {
      val (inter, na, nb, jac) = out((a, b))
      val trueInter = (sets(a) intersect sets(b)).size.toLong
      assert(inter == trueInter, s"($a,$b) inter $inter != $trueInter")
      assert(na == sets(a).size && nb == sets(b).size)
      assert(math.abs(jac - BigDecimal(
        trueInter.toDouble / (na + nb - trueInter))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
    Caches.releaseAll()
  }

  test("q_dup_share: per-source counts reconcile with the corpus and " +
    "with q_dedup_cluster's non-representative members") {
    val out = TextOps.q_dup_share(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val docs = Tables(spark, dir, "documents")
    assert(out.map(_._2).sum == docs.count(), "n_docs does not cover corpus")
    out.foreach { case (src, n, rem, keep, share) =>
      assert(rem + keep == n, s"$src: removed+keep != n_docs")
      assert(share >= 0.0 && share < 1.0, s"$src share $share")
    }
    val clusterRemoved = TextOps.q_dedup_cluster(spark, dir).collect()
      .count(r => r.getLong(0) != r.getLong(1)).toLong
    assert(out.map(_._3).sum == clusterRemoved,
      "total removed diverges from the cluster assignment")
    Caches.releaseAll()
  }

  test("q_zipf: slope is negative on natural-ish text and matches a " +
    "driver-side OLS recompute to rounding") {
    val Array(row) = TextOps.q_zipf(spark, dir).collect()
    val (n, slope, icept) =
      (row.getLong(0), row.getDouble(1), row.getDouble(2))
    val vocab = Tables(spark, dir, "documents")
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("t"))
      .distinct().count()
    assert(n == math.min(TextOps.zipfTopN.toLong, vocab),
      s"n_terms $n vs min(topN, vocab $vocab)")
    assert(slope < 0.0, s"Zipf slope $slope not negative")
    // driver-side reference on the same top-N counts
    val counts = Tables(spark, dir, "documents")
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("t"))
      .groupBy("t").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }.take(TextOps.zipfTopN)
    def r6(d: Double) =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pts = counts.zipWithIndex.map { case ((_, c), i) =>
      (r6(math.log(i + 1.0)), r6(math.log(c.toDouble))) }
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val nn = pts.length.toDouble
    val cov = nn * sxy - sx * sy
    val vx = nn * sxx - sx * sx
    assert(math.abs(slope - cov / vx) < 1e-4,
      s"slope $slope vs reference ${cov / vx}")
    assert(math.abs(icept - (sy - cov / vx * sx) / nn) < 1e-4)
    Caches.releaseAll()
  }

  test("q_cms_err: count-min never undercounts, is exact for the " +
    "top token when its buckets are uncontended, and overcounts are " +
    "within the eps*N sketch envelope on the fixture") {
    val rows = TextOps.q_cms_err(spark, dir).collect()
    assert(rows.length == TextOps.cmsProbeTopN)
    val totalToks = Tables(spark, dir, "documents")
      .select(explode(TextFns.tokens(col("text"))).as("t"))
      .count()
    rows.foreach { r =>
      val (exact, est, over) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(over >= 0, s"CMS undercounted ${r.getString(0)}")
      assert(est == exact + over)
      // d=4, w=256: realized error should sit well inside e/w * N
      assert(over <= (math.E / 256.0) * totalToks + 1,
        s"overcount $over beyond sketch envelope for ${r.getString(0)}")
    }
    // exact counts are descending (probe list is the exact top-N)
    val exacts = rows.map(_.getLong(1)).toSeq
    assert(exacts == exacts.sorted.reverse)
    Caches.releaseAll()
  }

  test("q_mixture_sample: quotas hit the ceil targets, short sources " +
    "cap at availability, selection is deterministic and within range") {
    val rows = TextOps.q_mixture_sample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val n = Tables(spark, dir, "documents").count()
    val k = rows.length.toLong
    val per = (((n + TextOps.mixSampleDen - 1) / TextOps.mixSampleDen)
      + k - 1) / k
    rows.foreach { case (src, nAvail, quota, nTaken, idSum, idMin, idMax) =>
      assert(quota == per, s"$src quota $quota != $per")
      assert(nTaken == math.min(nAvail, quota), s"$src cap violated")
      assert(idMin <= idMax && idSum >= idMin && idSum <= nTaken * idMax)
    }
    // determinism: a second evaluation picks the identical sets
    val again = TextOps.q_mixture_sample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(4))).toMap
    rows.foreach { case (src, _, _, _, idSum, _, _) =>
      assert(again(src) == idSum, s"$src selection not deterministic")
    }
  }

  test("q_langid_eval: cells partition the corpus, per-truth rates " +
    "sum to 1, and cells agree with a q_lang_id recount") {
    val rows = TextOps.q_langid_eval(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))))
    val n = Tables(spark, dir, "documents").count()
    assert(rows.map(_._2._1).sum == n, "cells do not partition the corpus")
    rows.groupBy(_._1._1).foreach { case (lang, cs) =>
      assert(math.abs(cs.map(_._2._3).sum - 1.0) < 1e-4,
        s"$lang rates do not sum to 1")
      assert(cs.map(_._2._2).toSet.size == 1)
    }
    // recount from the per-doc q_lang_id output
    val recount = TextOps.q_lang_id(spark, dir).collect()
      .map(r => (r.getString(4), r.getString(3)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { case (key, (cn, _, _, _)) =>
      assert(recount(key) == cn, s"cell $key $cn vs recount ${recount(key)}")
    }
  }

  test("q_anova: F-statistic matches a driver-side brute-force " +
    "recompute; MSB/MSW are non-negative; group means within [0,1]") {
    val rows = TextOps.q_anova(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val scores = TextOps.q_quality_score(spark, dir)
      .join(Tables(spark, dir, "documents").select("doc_id", "source"),
        "doc_id")
      .select("source", "score").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val groups = scores.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nt = scores.length.toDouble
    val k = groups.size.toDouble
    val grand = scores.map(_._2).sum / nt
    val ssb = groups.values.map { xs =>
      val m = xs.sum / xs.length; xs.length * (m - grand) * (m - grand)
    }.sum
    val ssw = groups.values.map { xs =>
      val m = xs.sum / xs.length; xs.map(x => (x - m) * (x - m)).sum
    }.sum
    val f = (ssb / (k - 1)) / (ssw / (nt - k))
    rows.foreach { case (src, n, mean, msb, msw, fs) =>
      assert(n == groups(src).length)
      assert(math.abs(mean - groups(src).sum / n) < 1e-6)
      assert(mean >= 0.0 && mean <= 1.0)
      assert(msb >= 0.0 && msw >= 0.0)
      assert(math.abs(fs - f) < 1e-2, s"F $fs vs brute $f")
    }
  }

  test("q_dedup_canonical: clusters match q_dedup_cluster's multi-doc " +
    "groups, the keeper is the true quality argmax, dropped checksum " +
    "accounts for everyone else") {
    val assign = TextOps.q_dedup_cluster(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val scores = TextOps.q_quality_score(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    val groups = assign.groupBy(_._2).filter(_._2.length > 1)
    val rows = TextOps.q_dedup_canonical(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4)))).toMap
    assert(rows.keySet == groups.keySet, "cluster universes differ")
    groups.foreach { case (cid, members) =>
      val ids = members.map(_._1)
      val (csize, keepId, keepScore, droppedSum) = rows(cid)
      assert(csize == ids.length)
      val expectKeep = ids.minBy(id => (-scores(id), id))
      assert(keepId == expectKeep, s"cluster $cid keeper $keepId")
      assert(keepScore == scores(expectKeep))
      assert(droppedSum == ids.filter(_ != expectKeep).sum)
    }
    Caches.releaseAll()
  }

  test("q_sparse_sim: ia<ib and cosine within [tau,1] on the fixture") {
    val got = TextOps.q_sparse_sim(spark, dir).collect()
    got.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val cos = r.getDouble(3)
      assert(cos >= TextOps.sparseSimTau && cos <= 1.0)
    }
    Caches.releaseAll()
  }

  test("sparseSimFromTf: prefix completeness — identical docs are " +
    "always paired at cosine exactly 1, scaled copies too, and an " +
    "unrelated doc pairs with neither") {
    // doc 1 ≡ doc 2 (identical bags); doc 3 = 2×doc 1 (proportional
    // ⇒ cos 1.0 IF candidate — shares the same rarest tokens); doc 4
    // disjoint vocabulary
    val tf = Seq(
      (1L, "alpha", 2L), (1L, "beta", 1L), (1L, "gamma", 3L),
      (2L, "alpha", 2L), (2L, "beta", 1L), (2L, "gamma", 3L),
      (3L, "alpha", 4L), (3L, "beta", 2L), (3L, "gamma", 6L),
      (4L, "delta", 5L), (4L, "epsilon", 1L)
    ).toDF("doc_id", "tok", "tf")
    val dfTok = tf.groupBy("tok").agg(countDistinct("doc_id").as("df"))
    val got = TextOps.sparseSimFromTf(tf, dfTok).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(got.get((1L, 2L)).contains(1.0), s"identical pair: $got")
    assert(got.get((1L, 3L)).contains(1.0), s"proportional pair: $got")
    assert(got.get((2L, 3L)).contains(1.0))
    assert(!got.keySet.exists(p => p._1 == 4L || p._2 == 4L),
      "disjoint doc must not pair")
    // exact integer dot: 2*2 + 1*1 + 3*3 = 14 for (1,2)
    val dot12 = TextOps.sparseSimFromTf(tf, dfTok)
      .filter(col("ia") === 1 && col("ib") === 2)
      .select("dot").as[Long].head()
    assert(dot12 == 14L)
  }

  test("q_logreg: the distributed trainer matches an independent " +
    "driver-side reference BIT-EXACTLY (weights, accuracy), and loss " +
    "decreases from init to trained") {
    import java.math.{BigDecimal => JBD, RoundingMode => RM}
    val scale = TextOps.logregScale
    val d = TextOps.logregFeatureNames.length
    // the design matrix itself is per-row deterministic, so collecting
    // it is fair game; the TRAINING LOOP below is the independent
    // derivation under test
    val rows = TextOps.logregFeatures(spark, dir)
      .collect()
      .map(r => (r.getDouble(0),
        Array(r.getDouble(1), r.getDouble(2), r.getDouble(3),
          r.getDouble(4))))
    assert(rows.nonEmpty)
    // Spark's round(double, 9) + cast to DECIMAL(38,9), reproduced:
    // HALF_UP at 9 dp, then the rounded double's canonical decimal
    def term9(t: Double): JBD = JBD.valueOf(
      JBD.valueOf(t).setScale(9, RM.HALF_UP).doubleValue)
      .setScale(9, RM.HALF_UP)
    def margin(w: Array[Double], x: Array[Double]): Double =
      (0 until d).map(j => x(j) * w(j)).reduce(_ + _)
    def step(w: Seq[JBD]): Seq[JBD] = {
      val wd = w.map(_.doubleValue).toArray
      val g = Array.fill(d)(JBD.ZERO)
      rows.foreach { case (y, x) =>
        val sig = 1.0 / (1.0 + math.exp(-margin(wd, x)))
        for (j <- 0 until d) g(j) = g(j).add(term9((sig - y) * x(j)))
      }
      val n = JBD.valueOf(rows.length.toLong)
      (0 until d).map(j => w(j)
        .subtract(TextOps.logregEta.multiply(g(j))
          .divide(n, scale, RM.HALF_UP))
        .setScale(scale, RM.HALF_UP))
    }
    def loss(w: Seq[JBD]): Double = {
      val wd = w.map(_.doubleValue).toArray
      rows.map { case (y, x) =>
        val sig = 1.0 / (1.0 + math.exp(-margin(wd, x)))
        -(y * math.log(math.max(sig, 1e-15)) +
          (1.0 - y) * math.log(math.max(1.0 - sig, 1e-15)))
      }.sum / rows.length
    }
    var wRef = TextOps.logregInit(d)
    val w0 = wRef
    for (_ <- 1 to TextOps.logregSteps) wRef = step(wRef)
    // 1. bit-exact weight agreement with the distributed trainer
    val feats = TextOps.logregFeatures(spark, dir)
    val wGot = TextOps.logregTrain(feats, TextOps.logregSteps)
    assert(wGot.map(_.toPlainString) == wRef.map(_.toPlainString),
      s"weights diverged: got=$wGot ref=$wRef")
    // 2. training made progress: loss strictly decreased
    assert(loss(wRef) < loss(w0),
      s"loss did not decrease: ${loss(w0)} -> ${loss(wRef)}")
    // 3. the declared query reports the same weights and the reference
    // decision-boundary accuracy, above a useful floor
    val out = TextOps.q_logreg(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val wd = wRef.map(_.doubleValue).toArray
    val accRef = JBD.valueOf(rows.count { case (y, x) =>
      (margin(wd, x) >= 0) == (y == 1.0)
    }.toDouble / rows.length).setScale(6, RM.HALF_UP).doubleValue
    assert(out.map(_._1).toSeq == TextOps.logregFeatureNames.sorted)
    val wByName = TextOps.logregFeatureNames.zip(wd).toMap
    out.foreach { case (f, w, acc) =>
      assert(w == wByName(f), s"$f: $w != ${wByName(f)}")
      assert(acc == accRef, s"acc $acc != $accRef")
    }
    assert(accRef >= 0.9, s"boundary accuracy too weak: $accRef")
    // 4. the signal-free distractor (digit_ratio) stays near its init
    // while the real signal (n_tok100) dominates — the trainer learned
    // the gate, not noise
    assert(math.abs(wByName("digit_ratio")) <
      math.abs(wByName("n_tok100")) / 4,
      s"distractor weight did not shrink: $wByName")
    Caches.releaseAll()
  }

  test("q_boost: the distributed AdaBoost matches an independent " +
    "driver-side reference stump-for-stump (features, thresholds, " +
    "polarities, alphas), every round's weighted error < 1/2, and " +
    "the ensemble clears the accuracy floor") {
    import java.math.{BigDecimal => JBD, RoundingMode => RM}
    val rows = TextOps.boostFeatures(spark, dir)
      .collect()
      .map(r => (r.getDouble(0),
        Array(r.getDouble(1), r.getDouble(2), r.getDouble(3)))) // x1..x3
    assert(rows.nonEmpty)
    def bin(x: Double): Int = math.min(math.floor(x * 8).toInt, 15)
    def stumpH(f: Int, k: Int, pol: Int, x: Array[Double]): Double =
      if (x(f - 1) < k.toDouble / 8) pol.toDouble else -pol.toDouble
    def margin(model: Seq[(Int, Int, Int, JBD)], x: Array[Double]): Double =
      model.foldLeft(0.0) { case (acc, (f, k, p, a)) =>
        acc + stumpH(f, k, p, x) * a.doubleValue }
    def term12(t: Double): JBD = JBD.valueOf(
      JBD.valueOf(t).setScale(12, RM.HALF_UP).doubleValue)
      .setScale(12, RM.HALF_UP)
    var model = Vector.empty[(Int, Int, Int, JBD)]
    val epsSeen = scala.collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to TextOps.boostRounds) {
      // weighted class histograms, mirroring the engine's cell math
      val wp = Array.fill(3, 16)(JBD.ZERO)
      val wn = Array.fill(3, 16)(JBD.ZERO)
      rows.foreach { case (y, x) =>
        val s = 2 * y - 1
        val e = math.max(math.min(-s * margin(model, x), 25.0), -25.0)
        val w = term12(math.exp(e))
        for (j <- 1 to 3) {
          val b = bin(x(j - 1))
          if (y == 1.0) wp(j - 1)(b) = wp(j - 1)(b).add(w)
          else wn(j - 1)(b) = wn(j - 1)(b).add(w)
        }
      }
      // every row lands in exactly one bin PER FEATURE, so feature 1's
      // histogram sums are the class totals (mirrors the engine)
      val totP = wp(0).foldLeft(JBD.ZERO)(_.add(_))
      val totN = wn(0).foldLeft(JBD.ZERO)(_.add(_))
      var best: (JBD, Int, Int, Int) = null
      for (j <- 1 to 3) {
        var bp = JBD.ZERO; var bn = JBD.ZERO
        for (k <- 1 until 16) {
          bp = bp.add(wp(j - 1)(k - 1)); bn = bn.add(wn(j - 1)(k - 1))
          for ((err, pol) <- Seq(
            (bn.add(totP.subtract(bp)), 1),
            (bp.add(totN.subtract(bn)), -1))) {
            if (best == null || err.compareTo(best._1) < 0 ||
              (err.compareTo(best._1) == 0 &&
                (j < best._2 || (j == best._2 && (k < best._3 ||
                  (k == best._3 && pol < best._4))))))
              best = (err, j, k, pol)
          }
        }
      }
      val eps = math.min(math.max(best._1
        .divide(totP.add(totN), 15, RM.HALF_UP).doubleValue, 1e-6),
        1 - 1e-6)
      epsSeen += eps
      val alpha = JBD.valueOf(0.5 * math.log((1 - eps) / eps))
        .setScale(TextOps.boostScale, RM.HALF_UP)
      model = model :+ ((best._2, best._3, best._4, alpha))
    }
    // 1. the boosting precondition held every round
    epsSeen.zipWithIndex.foreach { case (e, i) =>
      assert(e < 0.5, s"round ${i + 1} weighted error $e >= 1/2") }
    // 2. the declared query reports the same ensemble, stump for stump
    val out = TextOps.q_boost(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    assert(out.length == TextOps.boostRounds)
    out.zip(model).zipWithIndex.foreach {
      case (((m, f, thr, pol, a, _), (rf, rk, rp, ra)), i) =>
        assert(m == i + 1)
        assert(f == TextOps.boostFeatureNames(rf - 1), s"round ${i + 1} feature")
        assert(thr == rk.toDouble / 8, s"round ${i + 1} threshold")
        assert(pol == rp.toLong, s"round ${i + 1} polarity")
        assert(a == ra.doubleValue, s"round ${i + 1} alpha: $a vs $ra")
    }
    // 3. accuracy: query column equals the reference count, above floor
    val accRef = JBD.valueOf(rows.count { case (y, x) =>
      (margin(model, x) >= 0) == (y == 1.0)
    }.toDouble / rows.length).setScale(6, RM.HALF_UP).doubleValue
    assert(out.forall(_._6 == accRef), s"train_acc != $accRef")
    assert(accRef >= 0.9, s"ensemble accuracy too weak: $accRef")
    // 4. the two-rule teacher forced genuine COMPOSITION: the fitted
    // ensemble uses at least two distinct features, and it beats the
    // best single stump (which cannot express the AND)
    assert(model.map(_._1).distinct.size >= 2,
      s"ensemble collapsed to one feature: $model")
    val oneStumpAcc = (for ((f, k, p) <- model.map(m => (m._1, m._2, m._3)))
      yield rows.count { case (y, x) =>
        (stumpH(f, k, p, x) >= 0) == (y == 1.0) }.toDouble / rows.length).max
    assert(accRef > oneStumpAcc,
      s"ensemble ($accRef) no better than its best stump ($oneStumpAcc)")
    Caches.releaseAll()
  }

  test("q_pipeline_build: audit chain is internally consistent, the " +
    "near-dup stage equals q_curate's survivor set, and every stage " +
    "applies its standalone twin's rule") {
    val rows = TextOps.q_pipeline_build(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
    val stages = Seq("input", "lang_gate", "quality_gate", "exact_dedup",
      "near_dup", "decontam", "mixture_quota", "split_assign", "pack")
    assert(rows.map(_._2).toSeq == stages, "stage order drifted")
    assert(rows.map(_._1).toSeq == (0L until 9L), "stage ordinals")
    // n_in chains exactly: stage k's input is stage k-1's output
    rows.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur._3 == prev._4, s"${cur._2}: n_in ${cur._3} != ${prev._4}")
      assert(cur._5 == cur._3 - cur._4, s"${cur._2}: n_dropped")
    }
    // pack drops nothing and is the only stage with a manifest
    val pack = rows.last
    assert(pack._3 == pack._4 && pack._5 == 0L, "pack dropped rows")
    assert(pack._9 != 0L, "pack manifest empty")
    rows.init.foreach(r => assert(r._9 == 0L, s"${r._2} has a manifest"))
    // monotone: no stage grows the corpus
    rows.sliding(2).foreach { case Array(p, c) =>
      assert(c._4 <= p._4, s"${c._2} grew the survivor set") }
    // the composed front half IS q_curate: same count, same id-sum
    val curate = TextOps.q_curate(spark, TestSpark.sf0001)
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.col("doc_id")))
      .collect()(0)
    val nearDup = rows(4)
    assert(nearDup._4 == curate.getLong(0),
      s"near_dup n_out ${nearDup._4} != q_curate ${curate.getLong(0)}")
    assert(nearDup._6 == curate.getLong(1),
      s"near_dup id_sum ${nearDup._6} != q_curate ${curate.getLong(1)}")
    // split stage applies q_split_assign's train rule to the quota set
    val s6ids = rows(6)._4
    val s7 = rows(7)
    assert(s7._4 <= s6ids && s7._4 > 0, "split kept nothing or everything?")
    Caches.releaseAll()
  }

  test("q_nbayes matches an independent exact-integer reference " +
    "cell-for-cell (counts, smoothing, micro-grid posteriors, " +
    "argmax tie-break), and the held-out split is non-trivial") {
    // independent reference: re-derive features from raw text (plain
    // split-on-space tokens, non-space char count), train counts on
    // the % 5 != 0 split, score % 5 == 0 with BigInt posteriors on
    // the same micro grid
    val k = BigInt(TextOps.nbScale)
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val lab = docs.map { case (id, text) =>
      val ntok = text.split(" ").count(_.nonEmpty).toLong
      val nospace = text.count(_ != ' ').toLong
      val f = Seq(
        if (ntok >= 50) 1L else 0L,
        if (ntok <= 1000) 1L else 0L,
        if (nospace >= ntok * 3) 1L else 0L,
        if (nospace <= ntok * 10) 1L else 0L)
      (id, f, if (f.sum == 4) 1L else 0L)
    }
    val train = lab.filter(_._1 % 5 != 0)
    val test0 = lab.filter(_._1 % 5 == 0)
    assert(train.nonEmpty && test0.nonEmpty)
    assert(train.exists(_._3 == 1L) && train.exists(_._3 == 0L),
      "degenerate teacher: one-class training split")
    val n = BigInt(train.length)
    val n1 = BigInt(train.count(_._3 == 1L))
    val n0 = n - n1
    def cCount(c: Long, j: Int) =
      BigInt(train.count(r => r._3 == c && r._2(j) == 1L))
    def posterior(c: Long, f: Seq[Long]): BigInt = {
      val nc = if (c == 1L) n1 else n0
      val pri = (nc + 1) * k / (n + 2)
      (0 until 4).foldLeft(pri) { (acc, j) =>
        val cj = cCount(c, j)
        val t = if (f(j) == 1L) (cj + 1) * k / (nc + 2)
                else (nc - cj + 1) * k / (nc + 2)
        acc * t
      }
    }
    val want = test0
      .map { case (id, f, y) =>
        (y, if (posterior(1, f) >= posterior(0, f)) 1L else 0L, id)
      }
      .groupBy(t => (t._1, t._2))
      .map { case ((y, yh), v) =>
        (y, yh, v.length.toLong, v.map(_._3).sum)
      }
      .toSeq.sorted
    val got = TextOps.q_nbayes(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want, s"got ${got.toList} want ${want.toList}")
    // the distillation is a real measurement: the model must at least
    // beat always-predict-majority on the held-out split
    val acc = got.filter(r => r._1 == r._2).map(_._3).sum.toDouble /
      got.map(_._3).sum
    val majority = math.max(test0.count(_._3 == 1L),
      test0.count(_._3 == 0L)).toDouble / test0.length
    assert(acc >= majority,
      s"NB accuracy $acc below majority baseline $majority")
    Caches.releaseAll()
  }

  /** Shared doc-shape reference frame for the dtree/kmeans specs:
    * features re-derived from raw text, independently of the engine's
    * expression pipeline.
    */
  private def docShapeRef(): Seq[(Long, Long, Long, Long)] =
    Tables(spark, dir, "documents").select("doc_id", "text").collect()
      .map { r =>
        val (id, text) = (r.getLong(0), r.getString(1))
        val ntok = text.split(" ").count(_.nonEmpty).toLong
        val nospace = text.count(_ != ' ').toLong
        val x2 = nospace * 8 / math.max(ntok, 1L)
        val y = if (ntok >= 50 && ntok <= 1000 &&
          nospace >= ntok * 3 && nospace <= ntok * 10) 1L else 0L
        (id, ntok, x2, y)
      }.toSeq

  test("q_dtree matches an independent exact-integer CART reference " +
    "node-for-node (grid scan, micro-grid Gini, tie-breaks, ancestor " +
    "fallback labels) and the fitted tree is non-trivial") {
    val k = BigInt(TextOps.dtreeScale)
    val all = docShapeRef()
    val train = all.filter(_._1 % 5 != 0)
    val ho = all.filter(_._1 % 5 == 0)
    assert(train.exists(_._4 == 1L) && train.exists(_._4 == 0L),
      "degenerate teacher: one-class training split")
    def xOf(r: (Long, Long, Long, Long), j: Int) = if (j == 1) r._2 else r._3
    // full candidate scan with exact BigInt weighted-Gini (2·p·q mass)
    def best(rows: Seq[(Long, Long, Long, Long)]): Option[(Int, Long)] = {
      val n = BigInt(rows.size); val p = BigInt(rows.count(_._4 == 1L))
      if (p == 0 || p == n) return None
      TextOps.dtreeThr.flatMap { case (j, thr) =>
        val l = rows.filter(r => xOf(r, j) < thr)
        val nl = BigInt(l.size); val pl = BigInt(l.count(_._4 == 1L))
        val nr = n - nl
        if (nl == 0 || nr == 0) None
        else {
          val pr = p - pl
          val m = pl * (nl - pl) * nr + pr * (nr - pr) * nl
          Some((2 * m * k / (nl * nr), j, thr))
        }
      }.sortBy(t => (t._1, t._2, t._3)).headOption.map(t => (t._2, t._3))
    }
    def labOf(rows: Seq[(Long, Long, Long, Long)]): Long =
      if (BigInt(rows.count(_._4 == 1L)) * 2 >= BigInt(rows.size)) 1L else 0L
    val root = best(train)
    assert(root.isDefined, "reference tree failed to split the root")
    val (rj, rt) = root.get
    val lRows = train.filter(r => xOf(r, rj) < rt)
    val rRows = train.filterNot(r => xOf(r, rj) < rt)
    def node(rows: Seq[(Long, Long, Long, Long)], parentLab: Long)
      : (Long, Long, Long, Long) = best(rows) match {
      case Some((j, t)) =>
        val gl = rows.filter(r => xOf(r, j) < t)
        val gr = rows.filterNot(r => xOf(r, j) < t)
        (j.toLong, t, labOf(gl), labOf(gr))
      case None =>
        val lab = if (rows.nonEmpty) labOf(rows) else parentLab
        (0L, -1L, lab, lab)
    }
    val rootLab = labOf(train)
    val (lj, lt, labLL, labLR) = node(lRows, rootLab)
    val (rcj, rct, labRL, labRR) = node(rRows, rootLab)
    def score(r: (Long, Long, Long, Long)): Long =
      if (xOf(r, rj) < rt) {
        if (lj > 0 && xOf(r, lj.toInt) < lt) labLL else labLR
      } else {
        if (rcj > 0 && xOf(r, rcj.toInt) < rct) labRL else labRR
      }
    val wantConf = ho.map(r => (r._4, score(r), r._1))
      .groupBy(t => (t._1, t._2))
      .map { case ((y, yh), v) => (y, yh, v.size.toLong, v.map(_._3).sum) }
      .toSeq.sorted
    val got = TextOps.q_dtree(spark, dir).collect()
    val gotConf = got.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(gotConf == wantConf, s"confusion: $gotConf vs $wantConf")
    val d = got.head
    val gotDesc = (4 until 14).map(d.getLong)
    val wantDesc =
      Seq(rj.toLong, rt, lj, lt, rcj, rct, labLL, labLR, labRL, labRR)
    assert(gotDesc == wantDesc, s"descriptor: $gotDesc vs $wantDesc")
    // the tree must actually use its depth (a depth-2 fit of a
    // four-edge conjunction should split at least one child) and
    // beat the majority baseline on the holdout
    assert(lj > 0 || rcj > 0, "neither child split")
    val acc = gotConf.filter(r => r._1 == r._2).map(_._3).sum.toDouble /
      gotConf.map(_._3).sum
    val majority = math.max(ho.count(_._4 == 1L),
      ho.count(_._4 == 0L)).toDouble / ho.size
    assert(acc >= majority,
      s"dtree accuracy $acc below majority baseline $majority")
    Caches.releaseAll()
  }

  test("q_gbt matches an independent exact-integer LS-Boost reference " +
    "tree-for-tree (SSE-reduction argmax, shifted floor-div leaves, " +
    "nu=1/2 shrinkage), train SSE descends, and the boosted model " +
    "beats the majority baseline on the holdout") {
    val scale = TextOps.gbtScale
    val shift = TextOps.gbtShift
    val all = docShapeRef()
    val train = all.filter(_._1 % 5 != 0)
    val ho = all.filter(_._1 % 5 == 0)
    def xOf(r: (Long, Long, Long, Long), j: Int) = if (j == 1) r._2 else r._3
    def leafC(s: BigInt, n: BigInt): Long =
      (((s + n * shift) / n) / 2 - shift / 2).toLong
    def best(rows: Seq[((Long, Long, Long, Long), Long)])
      : Option[(Int, Long, Long, BigInt)] = {
      val n = rows.size.toLong
      val stot = rows.map(r => BigInt(r._2)).sum
      var bestv: Option[(BigInt, Int, Long, Long, BigInt)] = None
      for ((j, thr) <- TextOps.dtreeThr) {
        val l = rows.filter(r => xOf(r._1, j) < thr)
        val nl = l.size.toLong
        val sl = l.map(r => BigInt(r._2)).sum
        val nr = n - nl
        if (nl > 0 && nr > 0) {
          val sr = stot - sl
          val sc = (sl * sl * nr + sr * sr * nl) * scale / (BigInt(nl) * nr)
          if (bestv.forall { case (bs, bj, bt, _, _) =>
            sc > bs || (sc == bs && (j < bj || (j == bj && thr < bt))) })
            bestv = Some((sc, j, thr, nl, sl))
        }
      }
      bestv.map { case (_, j, thr, nl, sl) => (j, thr, nl, sl) }
    }
    val n0 = train.size.toLong
    val f0 = (train.map(r => BigInt(r._4)).sum * scale / n0).toLong
    var fMap = train.map(r => r._1 -> f0.toLong).toMap
    case class T(rf: Int, rt: Long, lf: Int, lt: Long, rf2: Int, rt2: Long,
      cll: Long, clr: Long, crl: Long, crr: Long)
    def contrib(t: T, r: (Long, Long, Long, Long)): Long =
      if (t.rf > 0 && xOf(r, t.rf) < t.rt) {
        if (t.lf > 0 && xOf(r, t.lf) < t.lt) t.cll else t.clr
      } else {
        if (t.rf2 > 0 && xOf(r, t.rf2) < t.rt2) t.crl else t.crr
      }
    var refTrees = Vector.empty[T]
    var refSses = Vector.empty[Long]
    for (_ <- 1 to TextOps.gbtRounds) {
      val rs = train.map(r => (r, r._4 * scale - fMap(r._1)))
      val stot = rs.map(r => BigInt(r._2)).sum
      val tree = best(rs) match {
        case None =>
          val c = leafC(stot, BigInt(n0))
          T(0, -1L, 0, -1L, 0, -1L, c, c, c, c)
        case Some((rj, rt, _, _)) =>
          val lrs = rs.filter(r => xOf(r._1, rj) < rt)
          val rrs = rs.filterNot(r => xOf(r._1, rj) < rt)
          def child(side: Seq[((Long, Long, Long, Long), Long)])
            : (Int, Long, Long, Long) = {
            val sn = side.size.toLong
            val ss = side.map(r => BigInt(r._2)).sum
            best(side) match {
              case None =>
                val c = leafC(ss, BigInt(sn)); (0, -1L, c, c)
              case Some((j, thr, nl, sl)) =>
                (j, thr, leafC(sl, BigInt(nl)),
                  leafC(ss - sl, BigInt(sn - nl)))
            }
          }
          val (lj, lt2, cll, clr) = child(lrs)
          val (rj2, rt2, crl, crr) = child(rrs)
          T(rj, rt, lj, lt2, rj2, rt2, cll, clr, crl, crr)
      }
      refTrees = refTrees :+ tree
      fMap = train.map(r => r._1 -> (fMap(r._1) + contrib(tree, r))).toMap
      refSses = refSses :+ train.map { r =>
        val d = r._4 * scale - fMap(r._1); d * d }.sum
    }
    val got = TextOps.q_gbt(spark, dir).collect()
    assert(got.length == TextOps.gbtRounds)
    got.zipWithIndex.foreach { case (row, i) =>
      val t = refTrees(i)
      val want = Seq(i.toLong + 1, t.rf.toLong, t.rt, t.lf.toLong, t.lt,
        t.rf2.toLong, t.rt2, t.cll, t.clr, t.crl, t.crr, refSses(i))
      val gotRow = (0 until 12).map(row.getLong)
      assert(gotRow == want, s"round ${i + 1}: $gotRow vs $want")
      assert(row.getLong(12) == f0, "f0 mismatch")
    }
    // descent (each leaf's floor slack can cost at most 1 milli-unit
    // per row, so allow that much)
    refSses.zip(refSses.tail).foreach { case (a, b) =>
      assert(b <= a + train.size, s"SSE not descending: $refSses") }
    // holdout confusion + baseline
    def fOf(r: (Long, Long, Long, Long)): Long =
      f0 + refTrees.map(contrib(_, r)).sum
    val wantConf = ho.map { r =>
      val yh = if (fOf(r) >= scale / 2) 1L else 0L; (r._4, yh, r._1) }
    val tp = wantConf.count(c => c._1 == 1L && c._2 == 1L).toLong
    val fp = wantConf.count(c => c._1 == 0L && c._2 == 1L).toLong
    val fnc = wantConf.count(c => c._1 == 1L && c._2 == 0L).toLong
    val tn = wantConf.count(c => c._1 == 0L && c._2 == 0L).toLong
    val posId = wantConf.filter(_._2 == 1L).map(_._3).sum
    val row = got.head
    val gotConf = (14 to 18).map(row.getLong)
    assert(gotConf == Seq(tp, fp, fnc, tn, posId),
      s"confusion: $gotConf vs ${Seq(tp, fp, fnc, tn, posId)}")
    assert(row.getLong(13) == ho.size.toLong)
    val acc = (tp + tn).toDouble / ho.size
    val majority = math.max(ho.count(_._4 == 1L),
      ho.count(_._4 == 0L)).toDouble / ho.size
    assert(acc >= majority,
      s"gbt accuracy $acc below majority baseline $majority")
    // boosting must actually compose cuts: at least one round's tree
    // splits a child (depth 2 in use, not a stump ensemble)
    assert(refTrees.exists(t => t.lf > 0 || t.rf2 > 0),
      "no round used depth 2")
    Caches.releaseAll()
  }

  test("q_crossval matches an independent per-fold stump reference " +
    "(each fold's model fit WITHOUT that fold, q_dtree objective and " +
    "tie-breaks, exact ppm accuracies and cross-fold mean)") {
    val k = BigInt(TextOps.dtreeScale)
    val all = docShapeRef()
    def xOf(r: (Long, Long, Long, Long), j: Int) = if (j == 1) r._2 else r._3
    def labOf(rows: Seq[(Long, Long, Long, Long)]): Long =
      if (BigInt(rows.count(_._4 == 1L)) * 2 >= BigInt(rows.size)) 1L else 0L
    // per-fold reference: stump fit on the OTHER folds (the full
    // candidate scan + exact BigInt Gini, q_dtree's objective), then
    // scored on the held-out fold
    val want = (0L until TextOps.cvFolds.toLong).flatMap { f =>
      val train = all.filter(_._1 % TextOps.cvFolds != f)
      val test = all.filter(_._1 % TextOps.cvFolds == f)
      if (test.isEmpty) None
      else {
        val n = BigInt(train.size); val p = BigInt(train.count(_._4 == 1L))
        val pick =
          if (p == 0 || p == n) None
          else TextOps.dtreeThr.flatMap { case (j, thr) =>
            val l = train.filter(r => xOf(r, j) < thr)
            val nl = BigInt(l.size); val pl = BigInt(l.count(_._4 == 1L))
            if (nl == 0 || nl == n) None
            else {
              val pr = p - pl; val nr = n - nl
              val m = pl * (nl - pl) * nr + pr * (nr - pr) * nl
              Some((2 * m * k / (nl * nr), j, thr))
            }
          }.sortBy(t => (t._1, t._2, t._3)).headOption
        val (feat, thr, labL, labR) = pick match {
          case Some((_, j, t)) =>
            val l = train.filter(r => xOf(r, j) < t)
            (j.toLong, t, labOf(l), labOf(train.diff(l)))
          case None =>
            val lab = labOf(train); (0L, -1L, lab, lab)
        }
        def yh(r: (Long, Long, Long, Long)): Long =
          if (feat > 0 && xOf(r, feat.toInt) < thr) labL else labR
        val nCorrect = test.count(r => yh(r) == r._4).toLong
        Some((f, feat, thr, labL, labR, test.size.toLong, nCorrect,
          test.map(_._1).sum, nCorrect * 1000000L / test.size))
      }
    }
    val meanPpm = want.map(_._9).sum / TextOps.cvFolds
    val got = TextOps.q_crossval(spark, dir).collect()
    assert(got.length == want.length, s"${got.length} vs ${want.length}")
    got.zip(want).foreach { case (row, w) =>
      val gotRow = (0 until 9).map(row.getLong)
      val wantRow = Seq(w._1, w._2, w._3, w._4, w._5, w._6, w._7, w._8, w._9)
      assert(gotRow == wantRow, s"fold ${w._1}: $gotRow vs $wantRow")
      assert(row.getLong(9) == meanPpm,
        s"mean ppm ${row.getLong(9)} vs $meanPpm")
    }
    // the CV estimate must be an honest out-of-sample number: every
    // fold's accuracy beats the GLOBAL majority rate's ppm floor
    // (the teacher is learnable by one cut only approximately, so
    // equality would flag a degenerate constant model)
    val majPpm = math.max(all.count(_._4 == 1L), all.count(_._4 == 0L))
      .toLong * 1000000L / all.size
    assert(want.forall(w => w._9 >= majPpm),
      s"some fold under the majority floor $majPpm: ${want.map(_._9)}")
    assert(want.exists(w => w._2 > 0), "no fold found a split")
    Caches.releaseAll()
  }

  test("q_feat_hash matches an independent df/bucket/dominant-term " +
    "reference and the fixture actually exercises collisions") {
    def md5Hex(v: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(v.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val df = docs.flatMap { case (id, text) =>
      text.split(" ").filter(_.nonEmpty).distinct.map(t => (id, t))
    }.distinct.groupBy(_._2).map { case (t, v) => t -> v.length.toLong }
    val byBucket = df.groupBy { case (t, _) =>
      java.lang.Long.parseLong(md5Hex(s"fh:$t").substring(0, 8), 16) %
        TextOps.fhBuckets
    }
    val want = byBucket.toSeq.map { case (b, terms) =>
      val (topT, topDf) = terms.toSeq.sortBy { case (t, d) => (-d, t) }.head
      val dfSum = terms.values.sum
      (b, terms.size.toLong, dfSum, topT, topDf,
        (dfSum - topDf) * 1000000L / dfSum)
    }.sortBy(_._1)
    val got = TextOps.q_feat_hash(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want, s"${got.take(3)}... vs ${want.take(3)}...")
    assert(want.exists(_._2 > 1), "no bucket has a collision to audit")
    assert(want.exists(_._6 > 0), "no conflated mass anywhere")
    Caches.releaseAll()
  }

  test("q_learning_curve matches an independent prefix-bucket stump " +
    "reference per fraction (nested subsets, q_dtree objective, exact " +
    "ppm curve) and more data does not hurt the full-fraction fit") {
    val k = BigInt(TextOps.dtreeScale)
    val all = docShapeRef()
    def xOf(r: (Long, Long, Long, Long), j: Int) = if (j == 1) r._2 else r._3
    def labOf(rows: Seq[(Long, Long, Long, Long)]): Long =
      if (BigInt(rows.count(_._4 == 1L)) * 2 >= BigInt(rows.size)) 1L else 0L
    def md5Hex(v: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(v.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def bktOf(id: Long): Long =
      java.lang.Long.parseLong(md5Hex(s"lc:$id").substring(0, 1), 16)
    val pool = all.filter(_._1 % 5 != 0)
    val ev = all.filter(_._1 % 5 == 0)
    val want = TextOps.lcFracs.map { f =>
      val train = pool.filter(r => bktOf(r._1) < f)
      val n = BigInt(train.size); val p = BigInt(train.count(_._4 == 1L))
      val pick =
        if (n == 0 || p == 0 || p == n) None
        else TextOps.dtreeThr.flatMap { case (j, thr) =>
          val l = train.filter(r => xOf(r, j) < thr)
          val nl = BigInt(l.size); val pl = BigInt(l.count(_._4 == 1L))
          if (nl == 0 || nl == n) None
          else {
            val pr = p - pl; val nr = n - nl
            val m = pl * (nl - pl) * nr + pr * (nr - pr) * nl
            Some((2 * m * k / (nl * nr), j, thr))
          }
        }.sortBy(t => (t._1, t._2, t._3)).headOption
      val (feat, thr, labL, labR) = pick match {
        case Some((_, j, t)) =>
          val l = train.filter(r => xOf(r, j) < t)
          (j.toLong, t, labOf(l), labOf(train.diff(l)))
        case None => val lab = labOf(train); (0L, -1L, lab, lab)
      }
      def yh(r: (Long, Long, Long, Long)): Long =
        if (feat > 0 && xOf(r, feat.toInt) < thr) labL else labR
      val nCorrect = ev.count(r => yh(r) == r._4).toLong
      val posIdSum = ev.filter(r => yh(r) == 1L).map(_._1).sum
      Seq(f, train.size.toLong, feat, thr, labL, labR, ev.size.toLong,
        nCorrect, posIdSum, nCorrect * 1000000L / ev.size)
    }
    val got = TextOps.q_learning_curve(spark, dir).collect()
      .map(r => (0 until 10).map(r.getLong))
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"frac ${w.head}: $g vs $w") }
    // nesting sanity: n_train strictly grows, and the full fit is at
    // least as good as the smallest fraction's (monotone-ish curve;
    // exact monotonicity is not guaranteed for a stump)
    assert(want.map(_(1)) == want.map(_(1)).sorted)
    assert(want.last.last >= want.head.last,
      s"full-fraction fit worse than the smallest: ${want.map(_.last)}")
    Caches.releaseAll()
  }

  test("q_chi2 matches an independent exact contingency/phi-squared " +
    "reference per grid candidate (BigInt, degenerate-margin sentinel, " +
    "rank tie-breaks) and the top candidate is genuinely predictive") {
    val all = docShapeRef()
    def xOf(r: (Long, Long, Long, Long), j: Int) = if (j == 1) r._2 else r._3
    val n = BigInt(all.size)
    val p = BigInt(all.count(_._4 == 1L))
    val want = TextOps.dtreeThr.map { case (j, thr) =>
      val lt = all.filter(r => xOf(r, j) < thr)
      val nl = BigInt(lt.size)
      val a = BigInt(lt.count(_._4 == 1L))
      val b = nl - a; val c = p - a; val d = (n - nl) - c
      val den = nl * (n - nl) * p * (n - p)
      val phi2 = if (den == 0) BigInt(0)
        else { val diff = a * d - b * c; diff * diff * TextOps.chi2Scale / den }
      (j.toLong, thr, a.toLong, b.toLong, c.toLong, d.toLong, phi2.toLong)
    }.sortBy { case (j, thr, _, _, _, _, phi2) => (-phi2, j, thr) }
      .zipWithIndex.map { case (t, i) => (i.toLong + 1) +: t.productIterator
        .map(_.asInstanceOf[Long]).toSeq }
    val got = TextOps.q_chi2(spark, dir).collect()
      .map(r => (0 until 8).map(r.getLong))
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"rank ${w.head}: $g vs $w") }
    // the screen must separate: the top candidate's phi2 clears a
    // real floor and the spread between best and worst is non-trivial
    assert(want.head.last > 100000L,
      s"top phi2_ppm ${want.head.last} too weak to rank by")
    assert(want.head.last > want.last.last, "no spread across the grid")
    Caches.releaseAll()
  }

  test("q_auc matches the brute-force pairwise Mann-Whitney count " +
    "exactly (2U = 2·#{pos>neg} + #{pos=neg}) and token count is a " +
    "genuinely predictive feature") {
    val all = docShapeRef()
    def refU2(score: ((Long, Long, Long, Long)) => Long): (Long, Long, Long) = {
      val pos = all.filter(_._4 == 1L).map(score)
      val neg = all.filter(_._4 == 0L).map(score)
      val u2 = (for (p <- pos; q <- neg) yield {
        if (p > q) 2L else if (p == q) 1L else 0L
      }).sum
      (pos.size.toLong, neg.size.toLong, u2)
    }
    val want = Seq(1L -> refU2(_._2), 2L -> refU2(_._3)).map {
      case (f, (np, nn, u2)) => (f, np, nn, u2)
    }
    val got = TextOps.q_auc(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want, s"auc u2: $got vs $want")
    // the doubled-U identity makes auc = u2 / (2·n⁺·n⁻); the gate's
    // main band is a token-count interval, so feature 1 must separate
    // better than chance
    val (f1, np, nn, u2) = got.head
    assert(f1 == 1L)
    assert(u2.toDouble / (2.0 * np * nn) > 0.55,
      "token-count AUC not better than chance")
    Caches.releaseAll()
  }

  test("q_kmeans matches an independent exact-integer Lloyd reference " +
    "(assignment key, floor-division updates, empty-cluster carry) and " +
    "iteration monotonically reduces inertia") {
    val pts = docShapeRef().map(r => (r._1, r._2, r._3))
    def assign(cent: Seq[(Long, Long, Long)], x1: Long, x2: Long): Long =
      cent.map { case (c, cu, cv) =>
        ((x1 - cu) * (x1 - cu) + (x2 - cv) * (x2 - cv)) * 4 + c
      }.min
    def inertia(cent: Seq[(Long, Long, Long)]): Long =
      pts.map(p => assign(cent, p._2, p._3) / 4).sum
    var cent = TextOps.kmInit
    var lastInertia = inertia(cent)
    (1 to TextOps.kmIters).foreach { _ =>
      val byC = pts.groupBy(p => assign(cent, p._2, p._3) % 4)
      cent = cent.map { case (c, cu, cv) =>
        byC.get(c) match {
          case Some(m) =>
            (c, m.map(_._2).sum / m.size, m.map(_._3).sum / m.size)
          case None => (c, cu, cv)
        }
      }
      val in = inertia(cent)
      // floor-division centroids sit within [0,1) of the exact mean
      // per coordinate; the linear term cancels around the mean
      // (Σ(x−m) = 0 within a cluster), leaving at most Σδ² ≤ 2·|pts|
      // of truncation slack on Lloyd's monotone descent
      assert(in <= lastInertia + 2L * pts.size,
        s"Lloyd iteration increased inertia: $lastInertia -> $in")
      lastInertia = in
    }
    val byC = pts.groupBy(p => assign(cent, p._2, p._3) % 4)
    val want = cent.map { case (c, cu, cv) =>
      val m = byC.getOrElse(c, Seq.empty)
      (c, cu, cv, m.size.toLong, m.map(_._1).sum,
        m.map(p => assign(cent, p._2, p._3) / 4).sum)
    }
    val got = TextOps.q_kmeans(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want, s"kmeans: $got vs $want")
    // the clustering is non-degenerate: at least two populated
    // clusters, memberships cover every doc exactly once
    assert(got.count(_._4 > 0) >= 2, "fewer than 2 populated clusters")
    assert(got.map(_._4).sum == pts.size.toLong)
    Caches.releaseAll()
  }

  test("q_forest matches an independent bagged-stump reference " +
    "(md5 Poisson draws, weighted-error argmin, exact OOB majority " +
    "vote) tree-for-tree, and OOB evaluation is non-trivial") {
    val thr1 = TextOps.dtreeThr.filter(_._1 == 1).map(_._2)
    val thr2 = TextOps.dtreeThr.filter(_._1 == 2).map(_._2)
    val cdf = graft.operators.Relational.bootstrapCdf
    val B = TextOps.forestB
    def wfun(b: Int, id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$b:$id".getBytes("UTF-8"))
      val u = h.take(4).foldLeft(0L)((a, x) => (a << 8) | (x & 0xffL))
      cdf.count(u >= _).toLong
    }
    val all = docShapeRef()
    def binOf(x: Long, thrs: Seq[Long]) = thrs.count(x >= _)
    // per-bag exact stump fit
    case class St(feat: Int, thr: Long, pol: Int, err: Long, tot: Long)
    val stumps = (0 until B).map { b =>
      val w = all.map(r => r._1 -> wfun(b, r._1)).toMap
      var best: (Long, Int, Long, Int) = null
      val totP = all.filter(_._4 == 1L).map(r => w(r._1)).sum
      val totN = all.filter(_._4 == 0L).map(r => w(r._1)).sum
      for ((j, thrs, xf) <- Seq(
        (1, thr1, (r: (Long, Long, Long, Long)) => r._2),
        (2, thr2, (r: (Long, Long, Long, Long)) => r._3))) {
        for (k <- 1 to thrs.size) {
          val t = thrs(k - 1)
          val bp = all.filter(r => r._4 == 1L && binOf(xf(r), thrs) < k)
            .map(r => w(r._1)).sum
          val bn = all.filter(r => r._4 == 0L && binOf(xf(r), thrs) < k)
            .map(r => w(r._1)).sum
          for ((err, pol) <- Seq((bn + (totP - bp), -1),
            (bp + (totN - bn), 1))) {
            if (best == null || err < best._1 || (err == best._1 &&
              (j < best._2 || (j == best._2 && (t < best._3 ||
                (t == best._3 && pol < best._4))))))
              best = (err, j, t, pol)
          }
        }
      }
      St(best._2, best._3, best._4, best._1, totP + totN)
    }
    // OOB vote reference
    val conf = scala.collection.mutable.Map[(Long, Long), Long]()
      .withDefaultValue(0L)
    var posIdSum = 0L
    var nOob = 0L
    for ((id, x1, x2, y) <- all) {
      val oobTrees = (0 until B).filter(b => wfun(b, id) == 0L)
      if (oobTrees.nonEmpty) {
        nOob += 1
        val v = oobTrees.map { b =>
          val st = stumps(b)
          val xv = if (st.feat == 1) x1 else x2
          val p = if (st.pol == 1) (if (xv >= st.thr) 1L else 0L)
                  else (if (xv < st.thr) 1L else 0L)
          p
        }.sum
        val yh = if (2 * v >= oobTrees.size) 1L else 0L
        conf((y, yh)) += 1
        if (yh == 1L) posIdSum += id
      }
    }
    val out = TextOps.q_forest(spark, dir).collect()
    assert(out.length == B)
    out.zipWithIndex.foreach { case (r, b) =>
      val st = stumps(b)
      assert(r.getLong(0) == b.toLong)
      assert(r.getString(1) == (if (st.feat == 1) "n_tok" else "density8"),
        s"tree $b feature")
      assert(r.getLong(2) == st.thr, s"tree $b thr")
      assert(r.getLong(3) == st.pol.toLong, s"tree $b pol")
      assert(r.getLong(4) == st.err, s"tree $b err")
      assert(r.getLong(5) == st.tot, s"tree $b tot")
      // the boosting precondition holds per bag: error < half the mass
      assert(2 * st.err < st.tot, s"tree $b err >= 1/2")
    }
    val h = out.head
    assert(h.getLong(6) == conf((1L, 1L)), "oob_tp")
    assert(h.getLong(7) == conf((0L, 1L)), "oob_fp")
    assert(h.getLong(8) == conf((1L, 0L)), "oob_fn")
    assert(h.getLong(9) == conf((0L, 0L)), "oob_tn")
    assert(h.getLong(10) == posIdSum, "oob_pos_id_sum")
    assert(h.getLong(11) == all.size - nOob, "n_oob_excluded")
    // OOB is a real evaluation: nearly every doc lands out-of-bag at
    // least once (p(all B bags sample it) ~ (1-e^-1)^15), and the
    // stump forest beats the majority baseline without reaching the
    // 4-cut teacher's ceiling
    assert(nOob >= all.size * 9L / 10L, "OOB covered most docs")
    val acc = (conf((1L, 1L)) + conf((0L, 0L))).toDouble / nOob
    val base = math.max(conf((1L, 1L)) + conf((1L, 0L)),
      conf((0L, 1L)) + conf((0L, 0L))).toDouble / nOob
    assert(acc >= base, s"forest $acc below majority baseline $base")
    Caches.releaseAll()
  }
}
