package graft

import org.apache.spark.sql.functions._

import graft.ops.{Association, Dedup, Eval, Packing, Sampling, TextOps}

/** Round-10 training-data pipeline operators: sequence packing,
  * repeated-substring spans, mixture planning, repetition profiling,
  * co-occurrence, calibration, and MRR — hand-computable goldens plus
  * partition-invariance where the op rides a global order.
  */
class TrainingDataOpsSpec extends SparkSpec {

  import spark.implicits._

  test("packBins conserves tokens, keeps bins contiguous, and ignores partitioning") {
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long").as("ntok"))
    val L = 256
    val packed = Packing.packBins(docs, "doc_id", "ntok", L).cache()
    val rows = packed.collect()
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    assert(total == docs.agg(sum("ntok")).head().getLong(0), "token mass conserved")
    val maxEnd = rows.map(_.getAs[Long]("bin_end")).max
    assert(maxEnd == (total - 1) / L, "last bin index = ceil(total/L) - 1")
    // Every bin in [0, maxEnd] is covered by some document's span (the
    // stream has no holes).
    val covered = rows.flatMap(r =>
      r.getAs[Long]("bin_start") to r.getAs[Long]("bin_end")).toSet
    assert(covered == (0L to maxEnd).toSet, "bin coverage has holes")
    rows.foreach { r =>
      assert(r.getAs[Boolean]("straddles") ==
        (r.getAs[Long]("bin_end") > r.getAs[Long]("bin_start")))
    }
    // Global order ⇒ result must not depend on input partitioning.
    val again = Packing.packBins(docs.repartition(13), "doc_id", "ntok", L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet == again,
      "packBins depends on partitioning")
    val summary = Packing.binSummary(packed, L)
    assert(summary.agg(sum("n_starting")).head().getLong(0) == rows.length,
      "every document starts in exactly one bin")
    // exact per-bin token mass: Σ = stream total; every bin but the
    // ragged last holds exactly L tokens
    assert(summary.agg(sum("n_tokens")).head().getLong(0) == total,
      "bin token mass must sum to the stream total")
    val short = summary.filter(col("n_tokens") =!= L.toLong).collect()
    assert(short.length <= 1 && short.forall(_.getAs[Long]("bin") == maxEnd),
      "only the last bin may be ragged")
    packed.unpersist()
  }

  test("repeatedTokenSpans merges adjacent repeated windows into maximal spans") {
    val d1 = (1 to 16).map(i => s"t$i").mkString(" ") // windows [t1-t4][t5-t8][t9-t12][t13-t16]
    val d2 = (1 to 8).map(i => s"t$i").mkString(" ") // copy of d1's first 2 windows
    val d3 = ((1 to 4).map(i => s"t$i") ++ Seq("z1", "z2", "z3", "z4") ++
      (9 to 12).map(i => s"t$i")).mkString(" ") // w0 and w2 repeat, w1 unique
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val got = Dedup.repeatedTokenSpans(docs, "doc_id", "text", k = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("dup_windows"), r.getAs[Long]("n_spans"),
          r.getAs[Long]("longest_span"), r.getAs[Long]("dup_tokens"))).toMap
    // d1: windows 0,1 (shared with d2), 2 (shared with d3) — 0,1,2 adjacent
    // ⇒ ONE span of 3; window 3 unique.
    assert(got(1L) == ((3L, 1L, 3L, 12L)), s"d1: ${got(1L)}")
    assert(got(2L) == ((2L, 1L, 2L, 8L)), s"d2: ${got(2L)}")
    // d3: repeated windows 0 and 2 are NOT adjacent ⇒ two spans of 1.
    assert(got(3L) == ((2L, 2L, 1L, 8L)), s"d3: ${got(3L)}")
  }

  test("mixturePlan computes exact targets, epoch ceilings, and fractions") {
    val docs = Seq.tabulate(4)(i => ("a", 25L)) ++ Seq.tabulate(3)(i => ("b", 100L))
    val df = docs.toDF("source", "ntok")
    val plan = Sampling.mixturePlan(
        df, "source", "ntok",
        budget = lit(400L),
        weightOf = src => when(src === "a", 3L).otherwise(1L))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("weight"), r.getAs[Long]("target_tokens"),
          r.getAs[Long]("epochs_ceil"), r.getAs[Double]("sample_frac"))).toMap
    assert(plan("a") == ((100L, 3L, 300L, 3L, 3.0)), s"a: ${plan("a")}")
    assert(plan("b") == ((300L, 1L, 100L, 1L, 100.0 / 300.0)), s"b: ${plan("b")}")
    // Relative budget: total_corpus_tokens is in scope for the budget
    // expression (400 tokens total ⇒ identical plan).
    val rel = Sampling.mixturePlan(
        df, "source", "ntok",
        budget = col("total_corpus_tokens"),
        weightOf = src => when(src === "a", 3L).otherwise(1L))
      .collect().map(r => (r.getString(0), r.getAs[Long]("target_tokens"))).toMap
    assert(rel == Map("a" -> 300L, "b" -> 100L))
  }

  test("ngramRepetitionProfile matches the hand-counted Gopher measures") {
    val docs = Seq((1L, "x y x y z")).toDF("doc_id", "text")
    val r = TextOps.ngramRepetitionProfile(docs, "doc_id", "text", 2, 3).head()
    // 2-grams: "x y","y x","x y","y z" → total 4, dup mass 2, top 2.
    assert(r.getAs[Long]("g2_total") == 4L)
    assert(r.getAs[Long]("g2_dup") == 2L)
    assert(r.getAs[Long]("g2_top") == 2L)
    assert(r.getAs[Double]("g2_dup_frac") == 0.5)
    assert(r.getAs[Double]("g2_top_frac") == 0.5)
    // 3-grams: all distinct → dup mass 0.
    assert(r.getAs[Long]("g3_total") == 3L)
    assert(r.getAs[Long]("g3_dup") == 0L)
  }

  test("cooccurrence counts unordered within-window pairs exactly once") {
    val docs = Seq((1L, "a b a")).toDF("doc_id", "text")
    val got = Association.cooccurrence(docs, "doc_id", "text", window = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // pairs: (p0,p1)=(a,b), (p0,p2)=(a,a), (p1,p2)=(b,a)→(a,b)
    assert(got == Map(("a", "b") -> 2L, ("a", "a") -> 1L), s"got $got")
    // window=1 drops the distance-2 pair
    val w1 = Association.cooccurrence(docs, "doc_id", "text", window = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(w1 == Map(("a", "b") -> 2L), s"got $w1")
  }

  test("voteCalibration buckets by vote level with exact accuracy") {
    val df = Seq((5L, true), (5L, true), (5L, false), (3L, true))
      .toDF("votes", "correct")
    val got = Eval.voteCalibration(df, "votes", k = 5, "correct")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getAs[Long]("n"), r.getAs[Long]("n_correct"),
          r.getAs[Double]("accuracy"))).toMap
    assert(got(5L) == ((1.0, 3L, 2L, 2.0 / 3.0)), s"got ${got(5L)}")
    assert(got(3L) == ((0.6, 1L, 1L, 1.0)), s"got ${got(3L)}")
  }

  test("meanReciprocalRank uses the exact lcm rational, misses count as zero") {
    val ranked = Seq(
      // q1: first relevant at rank 2
      (1L, 1L, false), (1L, 2L, true), (1L, 3L, true),
      // q2: no relevant hit
      (2L, 1L, false), (2L, 2L, false),
      // q3: hit at rank 1
      (3L, 1L, true)).toDF("qid", "rank", "relevant")
    val r = Eval.meanReciprocalRank(ranked, "qid", "rank", "relevant").head()
    assert(r.getAs[Long]("n_queries") == 3L)
    assert(r.getAs[Long]("n_hits") == 2L)
    assert(r.getAs[Double]("hit_rate") == 2.0 / 3.0)
    assert(r.getAs[Double]("mrr") == 0.5, s"mrr ${r.getAs[Double]("mrr")}") // (1/2 + 0 + 1)/3
  }

  test("LDiversity check counts rows in under-diverse groups; profile flags the weakest") {
    import graft.ops.Validate
    // group g1: sensitive {a, b} (diverse); g2: {a, a, a} (3 rows at risk)
    val df = Seq(
      ("g1", "a"), ("g1", "b"),
      ("g2", "a"), ("g2", "a"), ("g2", "a")).toDF("q", "s")
    val checked = Validate.validate(df, Seq(Validate.LDiversity(Seq("q"), "s", l = 2)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(checked.toSeq == Seq(("l_diversity_q_s", 3L, false)), s"got ${checked.toSeq}")
    val prof = Validate.lDiversityProfile(df, Seq("q"), "s")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Long]("l_distinct"), r.getAs[Boolean]("weakest"))).toMap
    assert(prof("g1") == ((2L, 2L, false)))
    assert(prof("g2") == ((3L, 1L, true)))
  }

  test("spearman is exact under ties and matches the textbook d-squared form") {
    import graft.ops.Profile
    // perfect monotone (with a tie) → 1; reversed → −1
    val mono = Seq((1L, 10L), (2L, 20L), (2L, 20L), (3L, 30L)).toDF("x", "y")
    assert(Profile.spearman(mono, "x", "y").head().getAs[Double]("rho") == 1.0)
    val anti = Seq((1L, 30L), (2L, 20L), (2L, 20L), (3L, 10L)).toDF("x", "y")
    assert(Profile.spearman(anti, "x", "y").head().getAs[Double]("rho") == -1.0)
    // tie-free: 1 − 6·Σd²/(n(n²−1)) = 1 − 6·6/60 = 0.4
    val mixed = Seq((1L, 10L), (2L, 40L), (3L, 20L), (4L, 30L)).toDF("x", "y")
    val r = Profile.spearman(mixed, "x", "y").head()
    assert(r.getAs[Double]("rho") == 0.4, s"rho ${r.getAs[Double]("rho")}")
    // constant column → NULL (undefined), never a divide-by-zero
    val const = Seq((1L, 5L), (2L, 5L)).toDF("x", "y")
    assert(Profile.spearman(const, "x", "y").head().isNullAt(4))
  }

  test("fairnessAudit flags groups under 4/5 of the best rate, exact comparisons") {
    import graft.ops.Eval
    val df = (Seq.fill(8)(("g1", true)) ++ Seq.fill(2)(("g1", false)) ++
      Seq.fill(5)(("g2", true)) ++ Seq.fill(5)(("g2", false)) ++
      Seq.fill(7)(("g3", true)) ++ Seq.fill(3)(("g3", false))).toDF("g", "pos")
    val got = Eval.fairnessAudit(df, "g", "pos")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("pos"), r.getString(4), r.getAs[Double]("impact_ratio"),
          r.getAs[Boolean]("adverse_impact"))).toMap
    assert(got("g1") == ((8L, "g1", 1.0, false)))
    assert(got("g2") == ((5L, "g1", 0.625, true)), s"got ${got("g2")}") // 0.5/0.8
    assert(got("g3") == ((7L, "g1", 0.875, false))) // 0.7/0.8 ≥ 4/5
    // rate tie for best → smallest group key takes the reference slot
    val tie = (Seq.fill(4)(("a", true)) ++ Seq.fill(4)(("b", true))).toDF("g", "pos")
    assert(Eval.fairnessAudit(tie, "g", "pos")
      .collect().forall(_.getString(4) == "a"))
  }

  test("kendallTau matches textbook values with and without ties") {
    import graft.ops.Profile
    val plain = Seq((1L, 1L), (2L, 3L), (3L, 2L)).toDF("x", "y")
    val r1 = Profile.kendallTau(plain, "x", "y").head()
    assert((r1.getAs[Long]("c"), r1.getAs[Long]("d")) == ((2L, 1L)))
    assert(r1.getAs[Double]("tau_b") == (2.0 - 1.0) / 3.0)
    // ties on both axes: C=1, D=0, n0=3, n1=1, n2=1 → τ-b = 1/√4 = 0.5
    val tied = Seq((1L, 1L), (1L, 2L), (2L, 2L)).toDF("x", "y")
    val r2 = Profile.kendallTau(tied, "x", "y").head()
    assert((r2.getAs[Long]("c"), r2.getAs[Long]("d"),
      r2.getAs[Long]("n1"), r2.getAs[Long]("n2")) == ((1L, 0L, 1L, 1L)))
    assert(r2.getAs[Double]("tau_b") == 0.5)
    // all-tied axis → NULL (undefined), never a divide-by-zero
    val flat = Seq((1L, 1L), (1L, 2L)).toDF("x", "y")
    assert(Profile.kendallTau(flat, "x", "y").head().isNullAt(5))
  }

  test("gainsTable splits equal-population tiers with exact lift and capture") {
    import graft.ops.Eval
    val df = Seq((1L, 4L, true), (2L, 3L, false), (3L, 2L, true), (4L, 1L, false))
      .toDF("id", "score", "pos")
    val got = Eval.gainsTable(df, "score", "id", "pos", buckets = 2)
      .collect().map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n"), r.getAs[Long]("pos"), r.getAs[Double]("rate"),
          r.getAs[Double]("lift"), r.getAs[Double]("capture"))).toMap
    // top tier: scores {4, 3} → 1 positive of 2; base rate 2/4 → lift 1.0
    assert(got(0L) == ((2L, 1L, 0.5, 1.0, 0.5)), s"got ${got(0L)}")
    assert(got(1L) == ((2L, 1L, 0.5, 1.0, 1.0)), s"got ${got(1L)}")
    // a perfectly ranked outcome doubles top-tier lift
    val sharp = Seq((1L, 4L, true), (2L, 3L, true), (3L, 2L, false), (4L, 1L, false))
      .toDF("id", "score", "pos")
    val top = Eval.gainsTable(sharp, "score", "id", "pos", buckets = 2)
      .collect().find(_.getAs[Long]("bucket") == 0L).get
    assert(top.getAs[Double]("lift") == 2.0 && top.getAs[Double]("capture") == 1.0)
  }

  test("coec folds per-position expectations in fixed order") {
    import graft.ops.Eval
    // pos 1: 3 imps, 2 clicks (ctr 2/3); pos 2: 2 imps, 1 click (ctr 1/2)
    val imp = Seq(
      ("a", 1L, true), ("a", 1L, false), ("b", 1L, true),
      ("a", 2L, false), ("b", 2L, true)).toDF("item", "pos", "click")
    val got = Eval.coec(imp, "item", "pos", "click")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("imps"), r.getAs[Long]("clicks"),
          r.getAs[Double]("expected"), r.getAs[Double]("coec"))).toMap
    val expA = 2.0 * 2.0 / 3.0 + 1.0 * 1.0 / 2.0 // same chain as the op
    assert(got("a") == ((3L, 1L, expA, 1.0 / expA)), s"got ${got("a")}")
    val expB = 1.0 * 2.0 / 3.0 + 1.0 * 1.0 / 2.0
    assert(got("b") == ((2L, 2L, expB, 2.0 / expB)), s"got ${got("b")}")
  }

  test("covariateShiftWeights matches target mix exactly and flags uncovered mass") {
    import graft.ops.Experiment
    val src = (Seq.fill(4)("b1") ++ Seq.fill(4)("b2")).toDF("bucket")
    val tgt = (Seq.fill(2)("b1") ++ Seq.fill(6)("b2") ++ Seq.fill(2)("b3")).toDF("bucket")
    val got = Experiment.covariateShiftWeights(src, tgt, "bucket")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_src"), r.getAs[Long]("n_tgt"),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getAs[Boolean]("uncovered"), r.getAs[Double]("ess"))).toMap
    assert(got("b1") == ((4L, 2L, Some(0.4), false, 6.4)), s"got ${got("b1")}")
    assert(got("b2") == ((4L, 6L, Some(1.2), false, 6.4)))
    assert(got("b3") == ((0L, 2L, None, true, 6.4)))
    // invariant: weighted source mass = n_src · covered-target-fraction
    // (4·0.4 + 4·1.2 = 6.4 = 8 · 8/10) and ESS = (Σw)²/Σw² = 6.4 here
  }

  test("conformalThreshold selects the exact ceil((n+1)(1-alpha)) order statistic") {
    import graft.ops.Eval
    val cal = (1L to 10L).toDF("sc")
    val r1 = Eval.conformalThreshold(cal, "sc", 1, 10).head()
    assert((r1.getAs[Long]("n_cal"), r1.getAs[Long]("target_rank"),
      r1.getAs[Long]("threshold")) == ((10L, 10L, 10L))) // ceil(11·0.9) = 10
    val r2 = Eval.conformalThreshold(cal, "sc", 1, 2).head()
    assert((r2.getAs[Long]("target_rank"), r2.getAs[Long]("threshold")) == ((6L, 6L)))
    val r3 = Eval.conformalThreshold((1L to 19L).toDF("sc"), "sc", 1, 10).head()
    assert((r3.getAs[Long]("target_rank"), r3.getAs[Long]("threshold")) == ((18L, 18L)))
    // ties: rank resolves within the tied cell
    val tied = Seq(1L, 2L, 2L, 2L, 3L).toDF("sc")
    val r4 = Eval.conformalThreshold(tied, "sc", 1, 2).head()
    assert(r4.getAs[Long]("threshold") == 2L) // rank ceil(6·0.5)=3 → value 2
  }

  test("poissonBootstrapCI brackets the mean and is reproducible") {
    import graft.ops.Experiment
    val df = (1L to 500L).map(i => (i, 100L + (i % 7))).toDF("id", "v")
    val r = Experiment.poissonBootstrapCI(df, "id", "v", b = 100).head()
    val mean = r.getAs[Double]("mean")
    val (lo, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(lo < mean && mean < hi, s"CI [$lo, $hi] does not bracket $mean")
    assert(hi - lo < 2.0, s"CI absurdly wide for a near-constant column: [$lo, $hi]")
    // hash-derived weights ⇒ bit-identical on rerun and under repartition
    val again = Experiment.poissonBootstrapCI(df.repartition(7), "id", "v", b = 100).head()
    assert((again.getAs[Double]("ci_lo"), again.getAs[Double]("ci_hi")) == ((lo, hi)))
  }

  test("brierDecomposition matches hand-computed bins and the Murphy identity") {
    import graft.ops.Eval
    // bin v=5 (conf 1.0): 2 rows, 1 correct; bin v=3 (conf 0.6): 2 rows, 2 correct
    val df = Seq((5L, true), (5L, false), (3L, true), (3L, true)).toDF("votes", "correct")
    val r = Eval.brierDecomposition(df, "votes", 5, "correct").head()
    val brier = r.getAs[Double]("brier")
    // per-row (conf−y)²: (1−1)²+(1−0)²+(.6−1)²+(.6−1)² = 1 + 0.32 over 4
    assert(math.abs(brier - (1.0 + 2 * 0.4 * 0.4) / 4.0) < 1e-12, s"brier $brier")
    val id = r.getAs[Double]("reliability") - r.getAs[Double]("resolution") +
      r.getAs[Double]("uncertainty")
    assert(math.abs(brier - id) < 1e-12, s"Murphy identity broke: $brier vs $id")
  }

  test("mantelHaenszel pools 2x2 strata into the textbook odds ratio") {
    import graft.ops.Experiment
    // stratum s1: a=4 b=1 c=1 d=4 (OR 16); s2: a=2 b=2 c=2 d=2 (OR 1)
    def rows(s: String, t: Boolean, y: Boolean, k: Int) = Seq.fill(k)((s, t, y))
    val df = (rows("s1", true, true, 4) ++ rows("s1", true, false, 1) ++
      rows("s1", false, true, 1) ++ rows("s1", false, false, 4) ++
      rows("s2", true, true, 2) ++ rows("s2", true, false, 2) ++
      rows("s2", false, true, 2) ++ rows("s2", false, false, 2))
      .toDF("stratum", "treated", "outcome")
    val r = Experiment.mantelHaenszel(df, "stratum", "treated", "outcome").head()
    // Σad/n = 16/10 + 4/8 = 2.1 ; Σbc/n = 1/10 + 4/8 = 0.6 → OR 3.5
    assert(r.getAs[Long]("n_strata") == 2L)
    assert(math.abs(r.getAs[Double]("or_mh") - 3.5) < 1e-12,
      s"or_mh ${r.getAs[Double]("or_mh")}")
  }

  test("scriptMixProfile counts script masses and flags homoglyph tokens") {
    import graft.ops.TextOps
    val docs = Seq(
      (1L, "plain latin words"),
      (2L, "pаypаl has two cyrillic a chars"), // а = U+0430
      (3L, "чисто русский текст")) // pure Cyrillic: NOT mixed
      .toDF("doc_id", "text")
    val got = TextOps.scriptMixProfile(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_latin"), r.getAs[Long]("n_cyrillic"),
          r.getAs[Long]("n_mixed_tokens"), r.getAs[Boolean]("suspicious"))).toMap
    assert(got(1L)._2 == 0L && !got(1L)._4)
    assert(got(2L) == ((24L, 2L, 1L, true)), s"got ${got(2L)}")
    assert(got(3L)._1 == 0L && got(3L)._3 == 0L && !got(3L)._4,
      "pure-Cyrillic text must not be flagged")
  }

  test("temporalReachability respects nondecreasing edge times") {
    import graft.ops.Graph
    // 1→2 at t=10, 2→3 at t=5 (FIRES BEFORE ARRIVAL — unusable),
    // 2→4 at t=20 (usable), 5→3 unreachable from the seed
    val edges = Seq((1L, 2L, 10L), (2L, 3L, 5L), (2L, 4L, 20L), (5L, 3L, 99L))
      .toDF("src", "dst", "ts")
    val seeds = Seq(Tuple1(1L)).toDF("v")
    val got = Graph.temporalReachability(edges, seeds, seedTs = 0L, maxHops = 3)
      .collect().map(r => r.getLong(0) -> (r.getAs[Long]("arrival"), r.getAs[Long]("hops")))
      .toMap
    assert(got == Map(1L -> ((0L, 0L)), 2L -> ((10L, 1L)), 4L -> ((20L, 2L))),
      s"got $got — plain BFS would also have reached 3")
  }

  test("negativeSamplingWeights damps counts by the sqrt identity and shares sum to ~1") {
    import graft.ops.TextOps
    val docs = Seq((1L, "a a a a b b c")).toDF("id", "text")
    val rows = TextOps.negativeSamplingWeights(docs, "text", topV = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getAs[Double]("w075"))).toMap
    assert(rows("a") == ((4L, math.sqrt(4.0 * math.sqrt(4.0)))))
    assert(rows("b") == ((2L, math.sqrt(2.0 * math.sqrt(2.0)))))
    val shares = TextOps.negativeSamplingWeights(docs, "text", 10)
      .agg(sum("share")).head().getDouble(0)
    assert(math.abs(shares - 1.0) < 1e-12)
  }
}
