package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.{Tables => T}

/** Text-analysis operators over the documents table (SURVEY.md §2.10):
  * exact dedup, token statistics, quality scoring + language-ID
  * heuristics, and document fingerprinting — the per-document stages of
  * a training-data pipeline. All pure `functions._` expressions
  * (codegen'd, shuffle-free per-row work except the final ordering), so
  * the shapes stream over 100 TB of text without skew concerns.
  */
object TextOps {
  type Q = (SparkSession, String) => DataFrame

  /** q137's fixed subword vocabulary, by piece length. Defined ONCE
    * and interpolated into both the Spark expression and the oracle
    * SQL, so the greedy segmentation is specified in a single place
    * (the fold-constants-once discipline from the sketch estimates).
    * Single characters (letters, digits, light punctuation) guarantee
    * the tokenizer always advances; anything else → '<unk>'. */
  private val vocab: Map[Int, Seq[String]] = Map(
    4 -> Seq("tion", "ment", "ness", "able", "less"),
    3 -> Seq("ing", "ion", "ent", "ate", "est", "ter", "the", "and"),
    2 -> Seq("th", "er", "on", "an", "re", "in", "ed", "es", "at", "or",
      "st", "ll"),
    1 -> (('a' to 'z').map(_.toString) ++ ('0' to '9').map(_.toString) ++
      Seq("_", "-", ".", ",")))
  private def vocabIn(n: Int): String =
    vocab(n).map(p => s"'$p'").mkString(", ")

  /** Learned BPE merge table (3 rounds) — the TRAINING half of a
    * byte-pair-encoding tokenizer (Sennrich et al. 2016), the other
    * bookend to q137's fixed-vocabulary wordpiece APPLY.
    *
    * Scale design — the classic BPE trick: training never iterates
    * over the corpus. One corpus pass builds the DISTINCT-WORD
    * frequency dict (one combine-able count shuffle; ~10⁵–10⁶ rows at
    * 100 TB, independent of corpus size); every merge round then runs
    * over the dict alone: map-side adjacent-pair explode weighted by
    * word count, one keyed count aggregation, a 1-row argmax
    * (orderBy+limit → TakeOrderedAndProject, never a global window),
    * and a map-side rewrite with the winning pair broadcast.
    *
    * Determinism: symbols travel in `[sym]` sentinel form, so the
    * literal `replace(seq, '[a][b]', '[ab]')` can only fire on exact
    * symbol boundaries, and both engines share replace's
    * non-overlapping left-to-right scan (= BPE's greedy merge order).
    * Argmax tie-break is total: (count DESC, left, right). Memoized
    * per (session, dataset): the merge table is persisted model state
    * — q148 emits it, q149 applies it — like the trained IVF codebook.
    */
  private val bpeCache = new SessionMemo[String]
  private def bpeMerges(s: SparkSession, dir: String): DataFrame =
    bpeCache.getOrElseUpdate(s, dir) {
      import s.implicits._
      val chars = expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))")
      var wd = T.documents(s, dir)
        .select(explode(split(trim($"text"), "\\s+")).as("w"))
        .filter(length($"w") > 0)
        .groupBy($"w").agg(count(lit(1)).as("cnt"))
        .select(concat(lit("["), concat_ws("][", chars), lit("]")).as("seq"),
          $"cnt")
      var merges: DataFrame = null
      for (r <- 1 to 3) {
        val best = wd
          .select($"cnt", expr(
            "split(substring(seq, 2, length(seq) - 2), '\\\\]\\\\[')").as("sym"))
          .filter(size($"sym") >= 2) // sequence(1,0) would run DESCENDING
          .select($"cnt", explode(expr(
            """transform(sequence(1, size(sym) - 1),
              |  i -> struct(element_at(sym, i) AS a,
              |              element_at(sym, i + 1) AS b))""".stripMargin)).as("p"))
          .groupBy($"p.a".as("a"), $"p.b".as("b"))
          .agg(sum($"cnt").as("pc"))
          .orderBy($"pc".desc, $"a", $"b").limit(1)
          .select(lit(r.toLong).as("merge_rank"), $"a".as("left_sym"),
            $"b".as("right_sym"), $"pc".as("pair_count"))
        merges = if (merges == null) best else merges.unionByName(best)
        wd = wd.crossJoin(broadcast(best))
          .select(expr(
            """replace(seq, concat('[', left_sym, '][', right_sym, ']'),
              |             concat('[', left_sym, right_sym, ']'))""".stripMargin)
            .as("seq"), $"cnt")
      }
      merges.localCheckpoint()
    }

  /** q142's gram spine — every document's distinct (gram, count)
    * array from the native NgramCounts pass, the query's one
    * corpus-sized compute. Both the profile-training branch and the
    * scoring branch consume it; un-memoized the expression ran TWICE
    * PER CALL, and one pass is ~60% of the query's isolated sf10
    * wall-clock (measured round 12: 14.3 s of 23.1 s). Memoized +
    * persisted like the dedup shingle spine; released by
    * SessionMemo.releaseAll with the rest of the family's spines.
    * Storage tier follows the MEASURED mass (the Dedup.spineLevel
    * rule): entries/doc sampled from ≤1024 docs once per (app,
    * dataset), charged 56 B per entry deserialized (3-codepoint
    * UTF8String + struct + long) + 80 B per doc row, in memory under
    * a quarter of the cluster pool, DISK_ONLY past it (the spine
    * never competes with execution memory; production analog =
    * checkpoint to SSD). */
  private val gramSpineCache = new SessionMemo[String]
  private val gramEntriesCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), Double]
  private def sampledGramEntriesPerDoc(s: SparkSession, dir: String): Double =
    gramEntriesCache.getOrElseUpdate((s.sparkContext.applicationId, dir), {
      import s.implicits._
      val gcf = graft.functions.NgramCounts.gramCounts(s) _
      val r = T.documents(s, dir).select($"text").limit(1024)
        .select(size(gcf($"text")).cast("double").as("n"))
        .agg(avg($"n")).head()
      if (r.isNullAt(0)) 0.0 else r.getDouble(0)
    })
  private def gramSpine(s: SparkSession, dir: String): DataFrame =
    gramSpineCache.getOrElseUpdate(s, dir) {
      import s.implicits._
      val gcf = graft.functions.NgramCounts.gramCounts(s) _
      val mass = (T.documents(s, dir).count() *
        (sampledGramEntriesPerDoc(s, dir) * 56.0 + 80.0)).toLong
      val level =
        if (mass > Dedup.clusterHeapBytes(s) / 4)
          org.apache.spark.storage.StorageLevel.DISK_ONLY
        else org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      T.documents(s, dir)
        .select($"doc_id", $"lang", gcf($"text").as("ga"))
        .persist(level)
    }

  val queries: Map[String, Q] = Map(
    // BPE merge training — see [[bpeMerges]]. Output = the ranked
    // merge table itself (the tokenizer model artifact).
    "q148_bpe_train" -> ((s, dir) => {
      import s.implicits._
      bpeMerges(s, dir).orderBy($"merge_rank")
    }),

    // BPE APPLY: run the learned merges (in rank order, each a single
    // sentinel-form literal replace — greedy left-to-right, exactly
    // the training-time semantics) over every word occurrence and
    // report per-document subword counts + compression vs raw chars.
    // Entirely map-side after the 3-row merge table broadcast; the
    // only shuffle is the per-doc count aggregation.
    "q149_bpe_apply" -> ((s, dir) => {
      import s.implicits._
      val m = bpeMerges(s, dir)
      def b(r: Int) = broadcast(m.filter($"merge_rank" === r.toLong)
        .select($"left_sym".as(s"l$r"), $"right_sym".as(s"r$r")))
      val chars = expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))")
      def merged(src: String, r: Int) = expr(
        s"""replace($src, concat('[', l$r, '][', r$r, ']'),
           |              concat('[', l$r, r$r, ']'))""".stripMargin)
      val nsym = (c: Column) =>
        (length(c) - length(regexp_replace(c, "\\[", ""))).cast("long")
      T.spread(T.documents(s, dir))
        .select($"doc_id", explode(split(trim($"text"), "\\s+")).as("w"))
        .filter(length($"w") > 0)
        .withColumn("seq", concat(lit("["), concat_ws("][", chars), lit("]")))
        .crossJoin(b(1)).crossJoin(b(2)).crossJoin(b(3))
        .withColumn("s1", merged("seq", 1))
        .withColumn("s2", merged("s1", 2))
        .withColumn("s3", merged("s2", 3))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum(nsym($"seq")).as("n_chars_sym"),
          sum(nsym($"s3")).as("n_subwords"))
        .select($"doc_id", $"n_words", $"n_chars_sym", $"n_subwords",
          Exact.trunc6($"n_subwords".cast("double") / $"n_chars_sym".cast("double"))
            .as("compression"))
        .orderBy($"doc_id")
    }),

    // Exact dedup idiom: keep the first row per key via
    // row_number()=1 (partition-local, deterministic tie-break).
    "q50_exact_dedup" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"lang", $"source").orderBy($"doc_id")
      T.documents(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("n_docs", count(lit(1)).over(Window.partitionBy($"lang", $"source")))
        .filter($"rn" === 1)
        .select($"lang", $"source", $"doc_id".as("keep_id"), $"n_docs")
        .orderBy($"lang", $"source")
    }),

    // Stratified deterministic sampling — the data-mixing primitive:
    // exactly `k` documents per language stratum, chosen by a keyed
    // md5 order so the sample is reproducible across runs, engines,
    // and partitionings (rand()-based sampling is none of those).
    // Per-group rank over a hash order = grouped top-k, so the plan
    // gets the same map-side WindowGroupLimit pushdown as q84 —
    // shuffle carries ≤ k rows per stratum.
    "q87_stratified_sample" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"lang").orderBy($"h", $"doc_id")
      T.documents(s, dir)
        .select($"doc_id", $"lang",
          md5(concat($"doc_id".cast("string"), lit(":strat"))).as("h"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 20L)
        .select($"doc_id", $"lang", $"rn")
        .orderBy($"lang", $"rn")
    }),

    // Domain-mixture reweighting — the step after measuring per-source
    // token shares: compute the per-source sampling rate that hits a
    // uniform target mixture (rate = min(1, fair_share / source_share))
    // and the tokens that survive it. Pure arithmetic over a
    // |sources|-row aggregate; the whole-frame window on that tiny
    // frame is the deliberate pattern (the corpus itself never sees a
    // global window). This is how a 100 TB pipeline decides how hard
    // to downsample an overrepresented crawl before training.
    "q89_mixture_weights" -> ((s, dir) => {
      import s.implicits._
      val t = T.documents(s, dir)
        .select($"source",
          size(split(trim($"text"), "\\s+")).cast("long").as("n_toks"))
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"), sum($"n_toks").as("n_tokens"))
      val wAll = Window.partitionBy(lit(1))
      val fairShare = sum($"n_tokens").over(wAll).cast("double") /
        count(lit(1)).over(wAll).cast("double")
      val rate = least(lit(1.0), fairShare / $"n_tokens".cast("double"))
      t.select($"source", $"n_docs", $"n_tokens",
          rate.as("rate"),
          (rate * $"n_tokens".cast("double")).as("expected_tokens"))
        .orderBy($"source")
    }),

    // Executable form of q89's mixture weights: apply the per-source
    // sampling rate with a DETERMINISTIC keyed-hash coin (md5 fraction
    // per doc < rate), so the sampled corpus is reproducible across
    // runs, engines, and partitionings — rand()-based sampling is
    // none of those. Per-source kept counts/tokens land near
    // rate·total without any global coordination: the coin is pure
    // map-side scalar work, the rate table is a broadcast |sources|
    // rows. This is the step that actually downsamples the
    // overrepresented crawl before training.
    "q101_mixture_sample" -> ((s, dir) => {
      import s.implicits._
      val tok = T.documents(s, dir)
        .select($"source", $"doc_id",
          size(split(trim($"text"), "\\s+")).cast("long").as("n_toks"))
      val wAll = Window.partitionBy(lit(1))
      val fairShare = sum($"n_tokens").over(wAll).cast("double") /
        count(lit(1)).over(wAll).cast("double")
      val rates = tok.groupBy($"source")
        .agg(sum($"n_toks").as("n_tokens"))
        .select($"source",
          least(lit(1.0), fairShare / $"n_tokens".cast("double")).as("rate"))
      val hfrac = conv(substring(
        md5(concat($"doc_id".cast("string"), lit(":mix"))), 1, 13), 16, 10)
        .cast("double") / 4503599627370496.0
      tok.join(broadcast(rates), "source")
        .withColumn("keep", hfrac < $"rate")
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          count(when($"keep", 1)).as("n_kept"),
          sum(when($"keep", $"n_toks").otherwise(0L)).as("kept_tokens"),
          first($"rate").as("rate"))
        .orderBy($"source")
    }),

    // Deterministic train/val/test split + stratification audit — the
    // FIRST thing a training pipeline does to a corpus, and the thing
    // rand() must never do (irreproducible across runs/partitionings).
    // The split is a keyed md5 threshold on the 13-hex-digit hash
    // domain (the q49/q141/q185 device): u < ⌊0.8·2^52⌋ → train,
    // u < ⌊0.9·2^52⌋ → val, else test — integer compares, thresholds
    // folded once in Scala and interpolated into BOTH engines. The
    // audit reports, per (split, language), the stratum share against
    // the corpus-wide share in integer micro-units (decimal-widened
    // div, the q226 discipline) — the skew a stratified splitter
    // would drive to zero. Scale shape: one map-side hash + one
    // combine-able count; every window below runs on the
    // |splits|×|langs| aggregate frame (≤ dozens of rows).
    // The hashing trick (Weinberger et al., ICML 2009): fixed-width
    // feature vectors with NO vocabulary pass — each token maps
    // straight to one of 64 buckets by hash, with a second hash bit
    // choosing ±1 so colliding features cancel in expectation instead
    // of biasing upward. The whole featurizer is one map-side explode
    // + one combine-able integer aggregation (doc × 64 bounded
    // output); at 100 TB it needs no dictionary broadcast, no second
    // scan, and no driver state — which is exactly why feature
    // hashing beats dictionary one-hot at corpus scale. Zero-sum
    // buckets (pure cancelled collisions) are dropped: they carry no
    // signal and their absence keeps the row count ≤ nnz.
    "q248_feature_hashing" -> ((s, dir) => {
      import s.implicits._
      val toks = T.spread(T.documents(s, dir))
        .select($"doc_id", explode(split(trim($"text"), "\\s+")).as("term"))
      val h = md5($"term")
      toks.select($"doc_id",
          (conv(substring(h, 1, 4), 16, 10).cast("long") % 64).as("bucket"),
          when(conv(substring(h, 5, 1), 16, 10).cast("long") % 2 === 0,
            lit(1L)).otherwise(lit(-1L)).as("sgn"))
        .groupBy($"doc_id", $"bucket")
        .agg(sum($"sgn").as("w"))
        .filter($"w" =!= 0)
        .orderBy($"doc_id", $"bucket")
    }),

    "q240_hash_split" -> ((s, dir) => {
      import s.implicits._
      val C = 4503599627370496L // 2^52, shared with the oracle
      val (tr, va) = (C * 8L / 10L, C * 9L / 10L)
      val u = conv(substring(
        md5(concat($"doc_id".cast("string"), lit(":split"))), 1, 13), 16, 10)
        .cast("long")
      val g = T.documents(s, dir)
        .select($"lang",
          when(u < tr, "train").when(u < va, "val").otherwise("test")
            .as("split"))
        .groupBy($"split", $"lang").agg(count(lit(1)).as("n_docs"))
      g.withColumn("split_total",
          sum($"n_docs").over(Window.partitionBy($"split")))
        .withColumn("lang_total",
          sum($"n_docs").over(Window.partitionBy($"lang")))
        .withColumn("total_docs",
          sum($"n_docs").over(Window.partitionBy(lit(1))))
        .select($"split", $"lang", $"n_docs", $"split_total",
          expr("(CAST(n_docs AS DECIMAL(38,0)) * 1000000) div split_total")
            .as("share_in_split_micro"),
          expr("(CAST(lang_total AS DECIMAL(38,0)) * 1000000) div total_docs")
            .as("overall_share_micro"),
          (expr("(CAST(n_docs AS DECIMAL(38,0)) * 1000000) div split_total") -
            expr("(CAST(lang_total AS DECIMAL(38,0)) * 1000000) div total_docs"))
            .as("skew_micro"))
        .orderBy($"split", $"lang")
    }),

    // Vocabulary coverage curve — what fraction of all token
    // OCCURRENCES the top-k most frequent terms cover, the number that
    // sizes a tokenizer vocab (k = 100 / 1k / 10k). Never ranks the
    // vocab: term counts fold to (count value, #terms) RUNS — at most
    // O(√N) distinct count values exist (Σc·k = N bounds them) — and
    // the cumulative walk runs over that sub-linear runs domain (the
    // q165 device). The rank-k boundary may SPLIT a run: the run
    // containing rank k contributes (k − prev_terms)·c occurrences by
    // closed form. Everything is exact integer arithmetic; the
    // coverage share is a decimal-widened floor div (micro-units).
    "q241_vocab_coverage" -> ((s, dir) => {
      import s.implicits._
      val toks = T.documents(s, dir)
        .select(explode(split(trim($"text"), "\\s+")).as("w"))
        .filter(length($"w") > 0)
      val runs = toks.groupBy($"w").agg(count(lit(1)).as("c"))
        .groupBy($"c").agg(count(lit(1)).as("k"))
      val wD = Window.orderBy($"c".desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = runs
        .withColumn("prev_terms", coalesce(sum($"k").over(wD), lit(0L)))
        .withColumn("prev_occ", coalesce(sum($"c" * $"k").over(wD), lit(0L)))
      val tot = runs.agg(sum($"k").as("total_terms"),
        sum($"c" * $"k").as("total_occ"))
      val ks = s.range(1)
        .select(explode(array(lit(100L), lit(1000L), lit(10000L)))
          .as("k_req"))
      ks.crossJoin(broadcast(tot))
        .withColumn("kk", least($"k_req", $"total_terms"))
        .crossJoin(broadcast(cum))
        .filter($"prev_terms" < $"kk" && $"kk" <= $"prev_terms" + $"k")
        .groupBy($"k_req", $"kk", $"total_occ")
        .agg(min($"prev_occ" + ($"kk" - $"prev_terms") * $"c")
          .as("covered_occ"))
        .select($"k_req".as("k"), $"kk".as("n_terms_used"),
          $"covered_occ", $"total_occ",
          expr("(CAST(covered_occ AS DECIMAL(38,0)) * 1000000) div total_occ")
            .as("coverage_micro"))
        .orderBy($"k")
    }),

    // Priority sampling (Duffield–Lund–Thorup, JACM 2007) — weighted
    // sampling without replacement with an unbiased subset-sum
    // estimator: priority q_i = w_i / u_i, keep the k largest, and
    // estimate each kept weight as max(w_i, τ) where τ is the (k+1)-th
    // priority. u_i comes from a keyed md5 (u = (h+1)/2^52), so the
    // sample is reproducible across runs, engines, and partitionings,
    // and the priority is built from int→double casts + one IEEE
    // multiply + one IEEE divide — bit-identical in any engine, no
    // libm. Scale shape: priorities are map-side scalars; the top-k+1
    // is TakeOrderedAndProject (per-partition heads, never a global
    // sort); the window runs over k+1 rows. This is how a 100 TB
    // pipeline draws a quality-weighted eval slice whose total token
    // mass is still estimable.
    "q141_priority_sample" -> ((s, dir) => {
      import s.implicits._
      val C = 4503599627370496.0 // 2^52 — folded once, shared with the oracle
      val w = size(split(trim($"text"), "\\s+")).cast("long")
      val h = conv(substring(
        md5(concat($"doc_id".cast("string"), lit(":prio"))), 1, 13), 16, 10)
        .cast("long")
      val t = T.documents(s, dir)
        .select($"doc_id", w.as("weight"), h.as("h"))
        .select($"doc_id", $"weight",
          ($"weight".cast("double") * C / ($"h" + lit(1L)).cast("double"))
            .as("priority"))
      val top = t.orderBy($"priority".desc, $"doc_id").limit(26)
      val wAll = Window.partitionBy(lit(1))
      top
        .withColumn("rn", row_number()
          .over(Window.partitionBy(lit(1)).orderBy($"priority".desc, $"doc_id"))
          .cast("long"))
        .withColumn("tau", max(when($"rn" === 26L, $"priority")).over(wAll))
        .filter($"rn" <= 25L)
        .select($"rn", $"doc_id", $"weight", $"priority",
          greatest($"weight".cast("double"), $"tau").as("est_weight"))
        .orderBy($"rn")
    }),

    // N-gram language identification (Cavnar–Trenkle, SDAIR 1994):
    // per-language character-trigram RANK profiles (padded-word
    // trigrams, top-100 by frequency), per-document profiles (top-40),
    // and the out-of-place distance Σ |doc_rank − lang_rank| with a
    // fixed penalty of 100 for grams absent from a language's profile;
    // predict argmin. Everything is INTEGER arithmetic (counts, ranks,
    // |Δrank| sums) with total tie-breaks (count desc, gram asc;
    // dist asc, lang asc), so the classification is bit-reproducible
    // in any engine and under any partitioning — no floats, no libm.
    // Scale shape: gram explosion and doc profiling are map-side;
    // the trained profile table is ≤ |langs|×100 rows → broadcast;
    // the 5-row candidate-language fan-out is a bounded broadcast
    // (the q60 query-set shape). On this fixture the lang labels are
    // decorative (all labels share one synthetic vocabulary), so
    // predictions are not linguistically meaningful — the query
    // verifies the TRAINING+SCORING dataflow, which is what a real
    // corpus would run unchanged.
    // Multinomial Naive Bayes text classification — train on 80% of
    // the corpus (doc_id % 5 ≠ 0), score the held-out 20%: the
    // labeled-data sibling of q142's unsupervised rank-profile
    // language ID, and the classic "cheap but strong" baseline any
    // corpus-curation stack keeps around (topic routing, quality
    // tiers). Everything is counting: per-(label, token) Laplace
    // likelihoods and per-label doc priors — ALL combine-able
    // aggregates (one shuffle each), so training is a single pass at
    // any scale, and the model is a table, not a driver object.
    // Scoring joins held-out token counts against the likelihood
    // table on token (vocab-bounded build side), with the per-label
    // unseen-token floor carried on the 5-row label stats frame
    // (broadcast cross — the BM25 1-row-stats idiom). Float
    // discipline: each log-likelihood is rounded to integer
    // micro-nats at the (label, token) grain (the q118 contract), so
    // per-doc scores are order-free integer sums and the argmax is
    // deterministic (ties break to the lexicographically first
    // label). Oracle: the same counts and micro-nat rounding in SQL.
    "q160_naive_bayes" -> ((s, dir) => {
      import s.implicits._
      val docs = T.spread(T.documents(s, dir)).select($"doc_id", $"lang", $"text")
      val toks = docs
        .select($"doc_id", $"lang", explode(split(trim($"text"), "\\s+")).as("w"))
        .filter(length($"w") > 0)
      val train = toks.filter($"doc_id" % 5L =!= 0L)
      val vsz = train.agg(countDistinct($"w").as("vsz"))
      val pri = docs.filter($"doc_id" % 5L =!= 0L)
        .groupBy($"lang").agg(count(lit(1)).as("nd"))
        .withColumn("ndtot", sum($"nd").over(Window.partitionBy(lit(1))))
      val cls = train.groupBy($"lang").agg(count(lit(1)).as("cl"))
      val labelStats = cls.join(pri, "lang").crossJoin(broadcast(vsz))
        .select($"lang".as("cand"),
          round(log(lit(1.0) / ($"cl" + $"vsz").cast("double")) * 1e6)
            .cast("long").as("lp0"),
          round(log($"nd".cast("double") / $"ndtot".cast("double")) * 1e6)
            .cast("long").as("prior"))
      val lp = train.groupBy($"lang", $"w").agg(count(lit(1)).as("c"))
        .join(cls, "lang").crossJoin(broadcast(vsz))
        .select($"lang".as("cand"), $"w",
          round(log(($"c" + lit(1L)).cast("double") /
            ($"cl" + $"vsz").cast("double")) * 1e6).cast("long").as("lp"))
      val testCounts = toks.filter($"doc_id" % 5L === 0L)
        .groupBy($"doc_id", $"w").agg(count(lit(1)).as("k"))
      val totals = testCounts.crossJoin(broadcast(labelStats))
        .join(lp, Seq("cand", "w"), "left")
        .groupBy($"doc_id", $"cand")
        .agg((sum($"k" * coalesce($"lp", $"lp0")) + first($"prior"))
          .as("score_micro"))
      val best = totals.groupBy($"doc_id").agg(max($"score_micro").as("mx"))
      val pred = totals.join(best, "doc_id")
        .filter($"score_micro" === $"mx")
        .groupBy($"doc_id").agg(min($"cand").as("pred_lang"),
          max($"mx").as("score_micro"))
      docs.filter($"doc_id" % 5L === 0L).select($"doc_id", $"lang")
        .join(pred, "doc_id")
        .select($"doc_id", $"lang".as("actual_lang"), $"pred_lang",
          $"score_micro", ($"pred_lang" === $"lang").as("correct"))
        .orderBy($"doc_id")
    }),

    "q142_langid_ngram" -> ((s, dir) => {
      import s.implicits._
      // Per-doc distinct-gram counts fold MAP-SIDE in one native
      // expression pass (functions/NgramCounts — codepoint-exact
      // mirror of the split/pad/substring built-ins): no
      // row-per-character explode ever exists and the lang-profile
      // shuffle carries per-doc DISTINCT grams. Scoring is the FUSED
      // functions/LangIdScore pass: the trained profile (≤ |langs|·100
      // rows — a model) and the candidate list collapse to 1-row
      // broadcast arrays (the q76 stats idiom), and each doc's top-40
      // selection + out-of-place distances + argmin all run inside one
      // expression — the old posexplode / ×|langs| fan-out / grouped
      // re-agg / per-doc rank window (two shuffles of 40·n and
      // |langs|·n rows) are gone. Post-scan the scoring stage has NO
      // shuffle: at 100 TB it is a single map stage over a broadcast
      // model, the production langid shape.
      val scf = graft.functions.LangIdScore.langidScore(s) _
      val ga = gramSpine(s, dir)
      // NULL lang is not a language: a NULL-labeled doc can train no
      // profile and be no candidate. Both sides filter it EXPLICITLY —
      // collect_list would silently drop a NULL candidate anyway, but
      // the profile groupBy would keep a NULL training group; making
      // the intent explicit keeps the two sides (and the oracle)
      // agreeing even if a future fixture carries unlabeled docs.
      val gc = ga.filter($"lang".isNotNull)
        .select($"doc_id", $"lang", explode($"ga").as("x"))
        .select($"doc_id", $"lang", $"x.g".as("g"), $"x.c".as("count"))
      // Two-level EXACT top-100 per lang: a row_number window
      // partitioned by lang alone sorts the whole (lang, gram) count
      // domain at |langs|-way parallelism — and that domain grows with
      // the corpus until the gram grid saturates (ScaleUp's injective
      // token rename makes the growth linear, the worst case). Level 1
      // ranks inside (lang, hash(g) mod 32) buckets — 32× the
      // parallelism — and keeps each bucket's local top-100; the global
      // top-100 by the SAME total order (cnt desc, g) is necessarily a
      // subset of the union of bucket-local top-100s, so level 2 ranks
      // ≤ 3200 survivors per lang. Bit-identical model, no
      // domain-sized single-lang sort anywhere.
      val gagg = gc.groupBy($"lang", $"g").agg(sum($"count").as("cnt"))
        .withColumn("__b", pmod(xxhash64($"g"), lit(32L)))
      val wLoc = Window.partitionBy($"lang", $"__b")
        .orderBy($"cnt".desc, $"g")
      val lp = gagg
        .withColumn("__lr", row_number().over(wLoc))
        .filter($"__lr" <= 100)
        .withColumn("lang_rank", row_number().over(
          Window.partitionBy($"lang").orderBy($"cnt".desc, $"g")).cast("long"))
        .filter($"lang_rank" <= 100L)
        .select($"lang".as("lcand"), $"g".as("lg"), $"lang_rank")
      val prof = lp.groupBy()
        .agg(collect_list(struct($"lcand", $"lg", $"lang_rank")).as("prof"))
      val cands = T.documents(s, dir).select($"lang".as("cand"))
        .filter($"cand".isNotNull).distinct()
        .groupBy().agg(collect_list($"cand").as("cands"))
      ga.crossJoin(broadcast(prof)).crossJoin(broadcast(cands))
        .select($"doc_id", $"lang", scf($"ga", $"prof", $"cands").as("sc"))
        .filter($"sc".isNotNull) // empty-gram docs: the old posexplode drop
        .select($"doc_id", $"lang", $"sc.pred_lang".as("pred_lang"),
          $"sc.dist".as("dist"))
        .orderBy($"doc_id")
    }),

    // Collocation extraction by PMI lift (Church & Hanks 1990): rank
    // adjacent-token bigrams by p(ab)/(p(a)p(b)) with an n_ab ≥ 3
    // count floor (the classic guard against one-off pairs dominating
    // sparse-count PMI). The lift is computed as a FIXED sequence of
    // IEEE ops over exact integer counts — ((n_ab·N)/n_a)·(N/B)/n_b,
    // identical parse in both engines — so no log/libm and no
    // overflow: products of raw counts would blow past int64 at
    // 100 TB (N ~ 10¹⁴), but each intermediate here stays near the
    // lift's magnitude. Spark builds bigrams MAP-SIDE from the token
    // array (one transform per doc, no join); the oracle uses a
    // positional self-join — cross-formulation parity. Corpus totals
    // travel as a broadcast 1-row cross (the q76 stats shape).
    "q146_pmi_collocations" -> ((s, dir) => {
      import s.implicits._
      val docs = T.documents(s, dir)
        .select($"doc_id", split(trim($"text"), "\\s+").as("a"))
      val toks = docs.select(explode($"a").as("w"))
      val bi = docs.filter(size($"a") >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(a) - 2), i -> struct(element_at(a, i + 1) AS w1, element_at(a, i + 2) AS w2))"))
          .as("p"))
        .select($"p.w1", $"p.w2")
      val uni = toks.groupBy($"w").agg(count(lit(1)).as("n"))
      val tot = toks.agg(count(lit(1)).as("nn"))
      val btot = bi.agg(count(lit(1)).as("bb"))
      val bc = bi.groupBy($"w1", $"w2").agg(count(lit(1)).as("n_ab"))
        .filter($"n_ab" >= 3L)
      val lift =
        (($"n_ab".cast("double") * $"nn".cast("double")) /
          $"n_a".cast("double")) *
          ($"nn".cast("double") / $"bb".cast("double")) /
          $"n_b".cast("double")
      bc.join(uni.select($"w".as("w1"), $"n".as("n_a")), "w1")
        .join(uni.select($"w".as("w2"), $"n".as("n_b")), "w2")
        .crossJoin(broadcast(tot)).crossJoin(broadcast(btot))
        .select($"w1", $"w2", $"n_ab", $"n_a", $"n_b", lift.as("lift"))
        // top-30 via TakeOrderedAndProject (per-partition heads — never
        // a global rank window over every bigram), then rank the 30
        // survivors in a ≤30-row window.
        .orderBy($"lift".desc, $"w1", $"w2").limit(30)
        .withColumn("rank", row_number().over(
          Window.partitionBy(lit(1))
            .orderBy($"lift".desc, $"w1", $"w2")).cast("long"))
        .orderBy($"rank")
    }),

    // Token counting (whitespace tokenizer) + length statistics.
    "q54_token_stats" -> ((s, dir) => {
      import s.implicits._
      val toks = size(split(trim($"text"), "\\s+")).cast("long")
      val nonSpace = length(regexp_replace($"text", "\\s", "")).cast("long")
      // BPE-ish pretokenizer pieces: letter runs, digit runs, and
      // single punctuation marks — the split a GPT-style byte-pair
      // tokenizer applies before merging. Counting pieces bounds the
      // real token count from below, which is what budget estimation
      // over a 100 TB corpus needs from a scan-speed scalar.
      val pieces = size(expr(
        "regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)"))
        .cast("long")
      T.documents(s, dir)
        .select($"doc_id", $"lang", $"source",
          length($"text").cast("long").as("n_chars_actual"),
          toks.as("n_tokens"),
          pieces.as("n_bpe_pieces"),
          nonSpace.as("n_nonspace"),
          (nonSpace.cast("double") / toks.cast("double")).as("avg_token_len"))
        .orderBy($"doc_id")
    }),

    // Shannon token entropy per document — the information-theoretic
    // quality signal (low entropy ⇒ repetitive/templated text). The
    // float fold is the interesting part: Σ c·ln(c) over per-token
    // counts is order-dependent in IEEE arithmetic, so both engines
    // fold the counts in ONE pinned order (tokens sorted, sequential
    // left-to-right `aggregate`/`list_reduce`) — deterministic at any
    // parallelism because the fold happens INSIDE a row, not across
    // rows. Entirely map-side (per-doc O(distinct·n) array work at
    // document granularity); the only shuffle is the output ordering.
    "q102_token_entropy" -> ((s, dir) => {
      import s.implicits._
      T.spread(T.documents(s, dir))
        .select($"doc_id", split(trim($"text"), "\\s+").as("ws"))
        .withColumn("toks", sort_array(array_distinct($"ws")))
        .withColumn("fold", expr(
          """aggregate(
            |  transform(toks, x -> CAST(size(filter(ws, y -> y = x)) AS DOUBLE)),
            |  CAST(0.0 AS DOUBLE), (acc, c) -> acc + c * ln(c))""".stripMargin))
        .select($"doc_id",
          size($"ws").cast("long").as("n_tokens"),
          size($"toks").cast("long").as("n_distinct"),
          round(log(size($"ws").cast("double")) -
            $"fold" / size($"ws").cast("double"), 6).as("token_entropy"),
          when(size($"toks") > 1,
            round((log(size($"ws").cast("double")) -
              $"fold" / size($"ws").cast("double")) /
              log(size($"toks").cast("double")), 6)).as("norm_entropy"))
        .orderBy($"doc_id")
    }),

    // Quality scoring + n-gram-free language-ID heuristic (stopword
    // hit counting via the replace trick — pure scalar, no explode).
    "q55_text_quality" -> ((s, dir) => {
      import s.implicits._
      val padded = concat(lit(" "), $"text", lit(" "))
      def hits(wrd: String) =
        ((length(padded) - length(regexp_replace(padded, s" $wrd ", " "))) /
          lit(wrd.length + 1)).cast("long")
      val nTok = size(split(trim($"text"), "\\s+")).cast("long")
      val digitRatio = length(regexp_replace($"text", "[^0-9]", "")).cast("double") /
        length($"text").cast("double")
      val stopHits = hits("the") + hits("a") + hits("of")
      T.documents(s, dir)
        .select($"doc_id", $"lang",
          nTok.as("n_tokens"),
          stopHits.as("stopword_hits"),
          digitRatio.as("digit_ratio"),
          (least(lit(1.0), nTok.cast("double") / 50.0) * (lit(1.0) - digitRatio))
            .as("quality_score"),
          when(stopHits > 0, "en").otherwise("unknown").as("lang_guess"))
        .orderBy($"doc_id")
    }),

    // Gopher/C4-style composite quality filter: token count bounds,
    // mean word length band, duplicate-token fraction, top-token
    // fraction → one boolean keep decision per document. Thresholds
    // chosen to genuinely split the fixture corpus (medians: 56
    // tokens, 0.54 dup_frac, 0.093 top_frac, 4.5 mean_word_len).
    //
    // Shape: explode → count per (doc, token) → roll up per doc. Both
    // shuffles carry combine-able integer counts (partial aggregation
    // runs map-side), so at 100 TB each stage moves one row per
    // distinct (doc, token), not one per token occurrence.
    "q58_quality_filter" -> ((s, dir) =>
      qualitySignals(s, dir).orderBy(col("doc_id"))),

    // Repetition signals (the Gopher "repetitious text" battery on a
    // corpus with no line structure): duplicate 3-gram fraction and
    // most-frequent-bigram mass. Entirely MAP-SIDE via higher-order
    // array functions — per-document O(distinct² ) inner loop is fine
    // at document granularity (docs are bounded; the corpus is not),
    // and the only shuffle is the final ordering.
    "q59_repetition" -> ((s, dir) => {
      import s.implicits._
      T.spread(T.documents(s, dir))
        .select($"doc_id", split(trim($"text"), "\\s+").as("ws"))
        .filter(size($"ws") >= 3)
        .withColumn("bg", expr(
          """transform(sequence(1, size(ws) - 1),
            |  i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1)))""".stripMargin))
        .withColumn("tg", expr(
          """transform(sequence(1, size(ws) - 2),
            |  i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1),
            |                 element_at(ws, i + 2)))""".stripMargin))
        .select($"doc_id",
          size($"tg").cast("long").as("n_trigrams"),
          (size($"tg") - size(array_distinct($"tg"))).cast("long").as("n_dup_trigrams"),
          ((size($"tg") - size(array_distinct($"tg"))).cast("double") /
            size($"tg").cast("double")).as("dup_trigram_frac"),
          (expr("array_max(transform(array_distinct(bg), x -> size(filter(bg, y -> y = x))))")
            .cast("double") / size($"bg").cast("double")).as("top_bigram_frac"))
        .orderBy($"doc_id")
    }),

    // PII / URL scrubbing: regex redaction with per-document match
    // counts. The fixture text is clean, so the query injects a
    // deterministic contact line per document and then scrubs it —
    // the point is the redaction operator, not the synthetic line.
    // Pure per-row regex work: shuffle-free except the final ordering,
    // and the patterns stay in Java/RE2-common syntax so both engines
    // agree byte-for-byte.
    "q72_pii_scrub" -> ((s, dir) => {
      import s.implicits._
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val urlRe = "https?://[^\\s]+"
      val pii = concat($"text", lit(" contact user"), $"doc_id",
        lit("@mail.example.com or https://ex.am/p/"), $"doc_id")
      T.documents(s, dir)
        .select($"doc_id", pii.as("raw"))
        .select($"doc_id",
          regexp_count($"raw", lit(emailRe)).cast("long").as("n_emails"),
          regexp_count($"raw", lit(urlRe)).cast("long").as("n_urls"),
          regexp_replace(regexp_replace($"raw", urlRe, "<URL>"),
            emailRe, "<EMAIL>").as("scrubbed"))
        .orderBy($"doc_id")
    }),

    // Corpus-level n-gram census: top-50 bigrams by count (the
    // contamination/memorization analysis primitive). Partial
    // aggregation combines map-side; the global top-k is a
    // TakeOrderedAndProject (per-partition heads → single merge),
    // never a full sort of the n-gram space. Count ties broken by the
    // bigram itself for a total order.
    "q73_ngram_topk" -> ((s, dir) => {
      import s.implicits._
      T.spread(T.documents(s, dir))
        .select($"doc_id", split(trim($"text"), "\\s+").as("ws"))
        .filter(size($"ws") >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(ws) - 1),
            |  i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1)))""".stripMargin))
          .as("bigram"))
        .groupBy($"bigram").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"bigram")
        .limit(50)
    }),

    // BM25 + TF-IDF relevance scoring — the ranking primitive of a
    // corpus search/contamination service. tf/df/dl are integer-exact
    // aggregations; the only floating-point beyond int ratios is the
    // ln() in the idf, rounded to 6 decimals on both engines (the
    // post-round-6 pattern the cosine queries established). Corpus
    // stats (N, avgdl) travel as a broadcast 1-row cross join, never a
    // driver scalar. Top-5 terms per sampled doc for bounded output.
    "q76_bm25" -> ((s, dir) => {
      import s.implicits._
      val tf = T.spread(T.documents(s, dir))
        .select($"doc_id", explode(split(trim($"text"), "\\s+")).as("term"))
        .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
        .cache() // feeds dl, df, and the scoring join
      val dl = tf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
      val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      val stats = dl.agg(sum($"dl").as("tot"), count(lit(1)).as("nd"))
        .select(($"tot".cast("double") / $"nd".cast("double")).as("avgdl"),
          $"nd".cast("double").as("nd"))
      val tfD = $"tf".cast("double")
      val dfD = $"df".cast("double")
      val dlD = $"dl".cast("double")
      val idf = log(($"nd" - dfD + 0.5) / (dfD + 0.5) + 1.0)
      val bm25 = idf * (tfD * 2.2) /
        (tfD + lit(1.2) * (lit(1.0) - 0.75 + lit(0.75) * dlD / $"avgdl"))
      val tfidf = tfD * log($"nd" / dfD)
      val w = Window.partitionBy($"doc_id").orderBy($"bm25".desc, $"term")
      tf.filter($"doc_id" % 50 === 0)
        .join(dl, "doc_id").join(dfreq, "term").crossJoin(broadcast(stats))
        .select($"doc_id", $"term", $"tf", $"df",
          round(bm25, 6).as("bm25"), round(tfidf, 6).as("tfidf"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter($"rank" <= 5)
        .orderBy($"doc_id", $"rank")
    }),

    // Inverted-index build: term → SEGMENTED posting lists, the storage
    // layout of a distributed full-text/contamination search service
    // (and the artifact q76's BM25 would query at scale). Postings are
    // sharded by doc_id range (segment = doc_id div 100): each
    // (term, segment) row carries a bounded, sorted, comma-joined doc
    // list — no row ever holds a full corpus-wide posting list, which
    // is what makes the build one combine-able groupBy at 100 TB
    // (per-segment lists build map-side within each range shard;
    // a stop-word-dense term costs many bounded rows, not one huge
    // one). Global df rides alongside for query-time pruning.
    "q132_postings" -> ((s, dir) => {
      import s.implicits._
      val terms = T.spread(T.documents(s, dir))
        .select($"doc_id", explode(split(trim($"text"), "\\s+")).as("term"))
        .distinct()
      val dfreq = terms.groupBy($"term").agg(count(lit(1)).as("df"))
      terms
        .withColumn("segment", expr("doc_id DIV 100"))
        .groupBy($"term", $"segment")
        .agg(count(lit(1)).as("seg_df"),
          expr("array_join(transform(array_sort(collect_list(doc_id))," +
            " x -> CAST(x AS STRING)), ',')").as("postings"))
        .join(dfreq.filter($"df" >= 5), Seq("term"))
        .select($"term", $"segment", $"df", $"seg_df", $"postings")
        .orderBy($"term", $"segment")
    }),

    // INCREMENTAL inverted-index maintenance (the q122/q135/q136
    // discipline applied to q132's postings layout): the stored index
    // rows for the old corpus slice (doc_id < 400 — in production the
    // persisted artifact) are NOT rebuilt when a delta batch arrives;
    // the delta's postings build from delta docs alone, and because
    // segments are doc-id ranges the new rows are DISJOINT from the
    // stored ones — the union is the merge. Only the global df
    // re-aggregates, and that folds over (term, segment) index rows
    // (|vocab|·|segments|), never the corpus. Hash-equality with the
    // full-rebuild oracle proves the maintenance lossless; refresh
    // cost ∝ delta + index size, the 100 TB requirement.
    "q190_postings_incremental" -> ((s, dir) => {
      import s.implicits._
      def seg(docs: DataFrame): DataFrame = docs
        .select($"doc_id", explode(split(trim($"text"), "\\s+")).as("term"))
        .distinct()
        .withColumn("segment", expr("doc_id DIV 100"))
        .groupBy($"term", $"segment")
        .agg(count(lit(1)).as("seg_df"),
          expr("array_join(transform(array_sort(collect_list(doc_id))," +
            " x -> CAST(x AS STRING)), ',')").as("postings"))
      val all = T.spread(T.documents(s, dir))
      val stored = seg(all.filter($"doc_id" < 400))  // the persisted index
      val delta = seg(all.filter($"doc_id" >= 400))  // new batch only
      val merged = stored.unionByName(delta)
      val dfreq = merged.groupBy($"term").agg(sum($"seg_df").as("df"))
      merged.join(dfreq.filter($"df" >= 5), Seq("term"))
        .select($"term", $"segment", $"df", $"seg_df", $"postings")
        .orderBy($"term", $"segment")
    }),

    // q190 as a RUNNABLE NIGHTLY JOB (the q238 pattern applied to the
    // postings index): the stored index generation lives in a BUCKETED
    // TABLE ON DISK (bucketed by term — the df re-aggregation and
    // query-time probe key), not a session-memoized DataFrame. Each
    // run re-READS generation 1, builds the delta's postings from
    // delta docs alone, and writes the ADVANCED index back as
    // generation 2, from which the output is served — the full state
    // round-trip a scheduler would execute. The split is ALIGNED to a
    // segment boundary (segments are doc_id ranges), so stored and
    // delta rows stay disjoint and the union IS the merge; only the
    // |vocab|·|segments|-sized df fold re-aggregates. Output ≡ q190 ≡
    // the full-rebuild oracle (MaintenanceSpec asserts the g1→g2
    // round-trip and the memoized-path parity).
    "q265_postings_disk" -> ((s, dir) => {
      import s.implicits._
      def seg(docs: DataFrame): DataFrame = docs
        .select($"doc_id", explode(split(trim($"text"), "\\s+")).as("term"))
        .distinct()
        .withColumn("segment", expr("doc_id DIV 100"))
        .groupBy($"term", $"segment")
        .agg(count(lit(1)).as("seg_df"),
          expr("array_join(transform(array_sort(collect_list(doc_id))," +
            " x -> CAST(x AS STRING)), ',')").as("postings"))
      val all = T.spread(T.documents(s, dir))
      val maxId = all.agg(max($"doc_id")).head().getLong(0)
      val cut = (maxId - maxId / 5) / 100 * 100 // segment-aligned
      val key = Scratch.stateKey(s, dir)
      val postT = s"graft_state_postings_$key"
      Seq(postT, s"${postT}_g2").foreach(Scratch.sweepStaleState(s, _))
      if (!s.catalog.tableExists(postT))
        Catalog.bucketize(seg(all.filter($"doc_id" < cut)), postT,
          "term", buckets = 8)
      val delta = seg(all.filter($"doc_id" >= cut))
      Catalog.bucketize(s.table(postT).unionByName(delta),
        s"${postT}_g2", "term", buckets = 8)
      val merged = s.table(s"${postT}_g2")
      val dfreq = merged.groupBy($"term").agg(sum($"seg_df").as("df"))
      merged.join(dfreq.filter($"df" >= 5), Seq("term"))
        .select($"term", $"segment", $"df", $"seg_df", $"postings")
        .orderBy($"term", $"segment")
    }),

    // Greedy longest-match SUBWORD TOKENIZATION (the wordpiece
    // segmentation step of a BPE/WordPiece pipeline, with a fixed
    // vocabulary): each whitespace token is consumed left-to-right,
    // taking at every position the longest vocabulary piece (4 > 3 >
    // 2 > 1 chars) that prefixes the remainder; out-of-vocabulary
    // characters emit '<unk>' and advance one char, so segmentation
    // always terminates. ENTIRELY MAP-SIDE: per document one nested
    // higher-order expression (transform over tokens, aggregate over
    // character positions — the fold consumes ≥1 char per step, so
    // |token| iterations always suffice); no shuffle until the final
    // sort. At 100 TB this is the shape a tokenizer-throughput pass
    // takes: pure per-row codegen'd work, linear scan, no state. The
    // vocabulary is interpolated from ONE Scala literal into both the
    // Spark expression and the oracle SQL (the fold-constants-once
    // rule), where DuckDB replays the identical greedy loop as a
    // per-token recursive CTE.
    "q137_wordpiece" -> ((s, dir) => {
      import s.implicits._
      def inList(n: Int) = vocabIn(n)
      val segExpr =
        s"""aggregate(
           |  sequence(1, length(tok)),
           |  named_struct('p', 1, 'parts', cast(array() as array<string>)),
           |  (st, i) -> CASE
           |    WHEN st.p > length(tok) THEN st
           |    WHEN substr(tok, st.p, 4) IN (${inList(4)})
           |      THEN named_struct('p', st.p + 4,
           |        'parts', array_append(st.parts, substr(tok, st.p, 4)))
           |    WHEN substr(tok, st.p, 3) IN (${inList(3)})
           |      THEN named_struct('p', st.p + 3,
           |        'parts', array_append(st.parts, substr(tok, st.p, 3)))
           |    WHEN substr(tok, st.p, 2) IN (${inList(2)})
           |      THEN named_struct('p', st.p + 2,
           |        'parts', array_append(st.parts, substr(tok, st.p, 2)))
           |    WHEN substr(tok, st.p, 1) IN (${inList(1)})
           |      THEN named_struct('p', st.p + 1,
           |        'parts', array_append(st.parts, substr(tok, st.p, 1)))
           |    ELSE named_struct('p', st.p + 1,
           |      'parts', array_append(st.parts, '<unk>'))
           |  END,
           |  st -> st.parts)""".stripMargin
      T.spread(T.documents(s, dir))
        .filter(length(trim($"text")) > 0) // '' would split to one empty token
        .select($"doc_id", split(lower(trim($"text")), "\\s+").as("ws"))
        .withColumn("pieces", expr(s"flatten(transform(ws, tok -> $segExpr))"))
        .select($"doc_id",
          size($"ws").cast("long").as("n_tokens"),
          size($"pieces").cast("long").as("n_pieces"),
          expr("CAST(size(filter(pieces, p -> p = '<unk>')) AS BIGINT)")
            .as("n_unk"),
          array_join($"pieces", " ").as("pieces_str"))
        .orderBy($"doc_id")
    }),

    // Document fingerprint: whitespace-normalized md5 + 4-hex-char
    // prefix bucket (the shard key a 100 TB dedup would partition by).
    "q56_fingerprint" -> ((s, dir) => {
      import s.implicits._
      val fp = md5(lower(trim(regexp_replace($"text", "\\s+", " "))))
      T.documents(s, dir)
        .select($"doc_id", fp.as("fingerprint"),
          substring(fp, 1, 4).as("bucket"))
        .orderBy($"doc_id")
    }),

    // Corpus-trained bigram LM fluency — the perplexity-filter stage of
    // a CCNet-style quality pipeline, with the corpus itself as the LM:
    // per-doc mean conditional log-prob (1/(n-1))·Σ ln(C(wᵢ,wᵢ₊₁)/C(wᵢ))
    // over corpus bigram/unigram counts. Unsmoothed is total here
    // because every scored bigram exists in the training corpus (it IS
    // the corpus); a held-out scorer would add-one. Shapes: two
    // combine-able count aggregations (bigram + unigram vocab, the
    // only corpus-sized shuffles), a vocab-keyed join, then a per-doc
    // sum. Float determinism: each ln is scaled to integer micro-nats
    // BEFORE the per-doc sum, so the reduction is exact integer
    // addition (the Exact discipline) — no partition-order drift, and
    // the oracle replays the identical rounding. At 100 TB the bigram
    // table is the LM artifact you'd persist; pruning it to the top-k
    // bigrams bounds the join's build side.
    "q118_bigram_fluency" -> ((s, dir) => {
      import s.implicits._
      fluencySpine(s, dir)
        .select($"doc_id", $"n_bigrams",
          Exact.trunc6($"s".cast("double") / 1e6 / $"n_bigrams".cast("double"))
            .as("mean_logprob"))
        .orderBy($"doc_id")
    }),

    // BLEU-2 pairwise overlap scoring (Papineni et al. 2002) — the
    // generation-eval metric, run candidate-vs-reference over adjacent
    // doc pairs (odd doc scores against its even predecessor; in a
    // real eval the pairing key is the prompt id). Modified n-gram
    // precision is a ratio of EXACT INTEGERS (clipped overlap via a
    // per-gram least() under a left join / total candidate grams);
    // add-one smoothing keeps zero-overlap pairs finite (smoothing
    // method 1). Everything stays in log space as micro-nat INTEGERS
    // — ln of integer ratios, the brevity penalty min(0, 1 − r/c) as
    // one rounded IEEE term — so the corpus fold is order-free and no
    // exp() runs at query time. Shapes: two count aggregations + two
    // gram-keyed equi-joins per n-gram order, grouped per pair —
    // embarrassingly parallel by pair at any scale.
    "q186_bleu" -> ((s, dir) => {
      import s.implicits._
      val docs = T.spread(T.documents(s, dir))
        .select($"doc_id", split(trim($"text"), "\\s+").as("ws"))
      val uni = docs.select($"doc_id", explode($"ws").as("g"))
        .groupBy($"doc_id", $"g").agg(count(lit(1)).as("cnt"))
      val bi = docs.filter(size($"ws") >= 2)
        .select($"doc_id", explode(expr(
          """transform(sequence(1, size(ws) - 1),
            |  i -> concat_ws(' ', element_at(ws, i), element_at(ws, i + 1)))""".stripMargin))
          .as("g"))
        .groupBy($"doc_id", $"g").agg(count(lit(1)).as("cnt"))
      def overlap(counts: DataFrame): DataFrame = {
        val cand = counts.filter($"doc_id" % 2 === 1)
          .select($"doc_id".as("cand_id"), ($"doc_id" - 1L).as("ref_id"),
            $"g", $"cnt".as("ccnt"))
        val ref = counts
          .select($"doc_id".as("ref_id"), $"g", $"cnt".as("rcnt"))
        cand.join(ref, Seq("ref_id", "g"), "left")
          .groupBy($"cand_id", $"ref_id")
          .agg(sum(least($"ccnt", coalesce($"rcnt", lit(0L)))).as("num"),
            sum($"ccnt").as("den"))
      }
      val o1 = overlap(uni).select($"cand_id", $"ref_id",
        $"num".as("p1_num"), $"den".as("c_len"))
      val o2 = overlap(bi).select($"cand_id", $"ref_id",
        $"num".as("p2_num"), $"den".as("p2_den"))
      val rlen = uni.groupBy($"doc_id").agg(sum($"cnt").as("r_len"))
        .select($"doc_id".as("ref_id"), $"r_len")
      o1.join(o2, Seq("cand_id", "ref_id")).join(rlen, "ref_id")
        .withColumn("lnp1_micro", round(log(
          ($"p1_num" + 1L).cast("double") / ($"c_len" + 1L).cast("double"))
          * 1e6).cast("long"))
        .withColumn("lnp2_micro", round(log(
          ($"p2_num" + 1L).cast("double") / ($"p2_den" + 1L).cast("double"))
          * 1e6).cast("long"))
        .withColumn("bp_micro", when($"c_len" < $"r_len",
          floor((lit(1.0) - $"r_len".cast("double") / $"c_len".cast("double"))
            * 1e6 + lit(0.5)).cast("long")).otherwise(lit(0L)))
        .withColumn("logbleu_micro", $"bp_micro" +
          round(($"lnp1_micro" + $"lnp2_micro").cast("double") / 2.0)
            .cast("long"))
        .select($"cand_id", $"ref_id", $"c_len", $"r_len",
          $"p1_num", $"p2_num", $"p2_den", $"lnp1_micro", $"lnp2_micro",
          $"bp_micro", $"logbleu_micro",
          round($"logbleu_micro".cast("double") / 1e6, 6).as("log_bleu2"))
        .orderBy($"cand_id")
    }),

    // Unigram-LM subword segmentation (Kudo 2018, the SentencePiece
    // model) — the THIRD tokenizer of the family: q148 trains BPE
    // merges, q137 segments greedily against a fixed vocab, this one
    // finds the OPTIMAL (minimum total cost) segmentation by Viterbi
    // DP under corpus-trained piece costs. Model: every substring of
    // length ≤ 4 is a piece; cost(piece) = micro-nats of
    // ln(T / cnt(piece)) with occurrence counts weighted by word
    // frequency — ints through the ln, the established device. The
    // DICTIONARY iterates, never the corpus (q148's scale trick): per
    // distinct word ≤ 80 candidate pieces collect into an array and
    // one bounded higher-order fold runs the DP — best[e] carries
    // (cost·32 + (8−len)) so the integer MIN is simultaneously the
    // Viterbi minimum and a deterministic longest-piece tie-break
    // (min over a set — collect order cannot matter). A second
    // bounded fold backtracks the chosen piece lengths. Shapes: two
    // count aggregations + one piece-keyed equi-join + one per-word
    // collect — no iteration over positions ever schedules a round.
    "q189_unigram_viterbi" -> ((s, dir) => {
      import s.implicits._
      val words = T.spread(T.documents(s, dir))
        .select(explode(split(trim($"text"), "\\s+")).as("w"))
        .filter(length($"w") > 0)
        .groupBy($"w").agg(count(lit(1)).as("f"))
      // all (word, start, piece) candidates, length ≤ 4
      val cands = words.select($"w", $"f", explode(expr(
        """flatten(transform(sequence(1, length(w)),
          |  s -> transform(sequence(1, least(4, length(w) - s + 1)),
          |    l -> named_struct('s', s, 'l', l,
          |      'piece', substring(w, s, l)))))""".stripMargin)).as("c"))
        .select($"w", $"f", $"c.s".as("s"), $"c.l".as("l"),
          $"c.piece".as("piece"))
      val vocab = cands.groupBy($"piece").agg(sum($"f").as("cnt"))
      val tot = vocab.agg(sum($"cnt").as("t"))
      val costs = vocab.crossJoin(broadcast(tot))
        .select($"piece",
          round(log($"t".cast("double") / $"cnt".cast("double")) * 1e6)
            .cast("long").as("cost"))
      val packed = cands.join(costs, "piece")
        .groupBy($"w", $"f")
        .agg(collect_list(struct($"s", $"l", $"cost")).as("cands"))
      // Viterbi forward pass: best(0..n) as encoded ints
      val withBest = packed.withColumn("best", expr(
        """aggregate(
          |  sequence(1, length(w)),
          |  CAST(array(0) AS ARRAY<BIGINT>),
          |  (best, e) -> array_append(best,
          |    aggregate(
          |      filter(cands, c -> c.s + c.l - 1 = e),
          |      CAST(4000000000000000 AS BIGINT),
          |      (m, c) -> least(m,
          |        (element_at(best, c.s) div 32 + c.cost) * 32
          |          + (8 - c.l)))))""".stripMargin))
      withBest
        .withColumn("pieces", expr(
          """aggregate(
            |  sequence(1, length(w)),
            |  named_struct('e', length(w),
            |    'parts', CAST(array() AS ARRAY<STRING>)),
            |  (st, i) -> CASE WHEN st.e <= 0 THEN st ELSE named_struct(
            |    'e', st.e - (8 - CAST(element_at(best, st.e + 1) % 32 AS INT)),
            |    'parts', array_prepend(st.parts,
            |      substring(w,
            |        st.e - (8 - CAST(element_at(best, st.e + 1) % 32 AS INT)) + 1,
            |        8 - CAST(element_at(best, st.e + 1) % 32 AS INT)))) END,
            |  st -> st.parts)""".stripMargin))
        .select($"w", $"f",
          expr("CAST(size(pieces) AS BIGINT)").as("n_pieces"),
          expr("element_at(best, length(w) + 1) div 32").as("cost_micro"),
          expr("array_join(pieces, ' ')").as("pieces_str"))
        .orderBy($"w")
    }),

    // Heaps'-law vocabulary growth curve: distinct-vocabulary size as
    // a function of cumulative tokens seen, at EXPONENTIAL doc-count
    // checkpoints (bucket = bit-length of doc_id + 1 — an exact
    // integer device via bin()/printf('%b') string length, no float
    // log near power-of-two boundaries). Log-spaced checkpoints are
    // what a growth curve wants AND what makes it scale: ≤ ~40
    // buckets at ANY corpus size, so the cumulative window folds
    // bounded rows — vs linear checkpoints whose window grows with
    // the corpus. "First doc containing each term" is one combine-able
    // min per term; per-bucket token mass one combine-able count —
    // nothing rescans the corpus. The per-checkpoint Heaps exponent
    // ln(V)/ln(N) is the corpus-health signal (vocabulary saturating
    // vs exploding — tokenizer drift, boilerplate floods, language
    // mix shifts all bend it).
    "q195_vocab_growth" -> ((s, dir) => {
      import s.implicits._
      val toks = T.spread(T.documents(s, dir))
        .select($"doc_id", explode(split(trim($"text"), "\\s+")).as("term"))
      val bucketOfDoc = expr("CAST(length(bin(doc_id + 1)) - 1 AS BIGINT)")
      val bucketOfFirst = expr("CAST(length(bin(first_doc + 1)) - 1 AS BIGINT)")
      val perBucket = toks.groupBy(bucketOfDoc.as("bucket"))
        .agg(count(lit(1)).as("n_tokens"))
      val newTerms = toks.groupBy($"term").agg(min($"doc_id").as("first_doc"))
        .groupBy(bucketOfFirst.as("bucket"))
        .agg(count(lit(1)).as("n_new_terms"))
      val w = Window.orderBy($"bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perBucket.join(newTerms, Seq("bucket"), "left")
        .select($"bucket", $"n_tokens",
          coalesce($"n_new_terms", lit(0L)).as("n_new_terms"))
        .withColumn("cum_tokens", sum($"n_tokens").over(w))
        .withColumn("cum_vocab", sum($"n_new_terms").over(w))
        .withColumn("heaps_beta",
          when($"cum_tokens" > 1L,
            round(log($"cum_vocab".cast("double")) /
              log($"cum_tokens".cast("double")), 6)))
        .orderBy($"bucket")
    }),

    // INCREMENTAL vocabulary-census maintenance (the q122/q156/q190
    // discipline on the term census q195 consumes): the stored
    // per-term (first_doc, occurrence) rows for the old corpus slice
    // are NOT rebuilt when a delta batch arrives — the delta's census
    // builds from delta docs alone, and because BOTH metrics are
    // merge-closed (min for first-occurrence, sum for occurrences)
    // the union + one |vocab|-sized re-aggregation is the whole
    // refresh: cost ∝ delta + vocabulary, never the corpus. The
    // oracle is the FULL-REBUILD census, so hash equality proves the
    // maintenance lossless — exactly the property that lets a 100 TB
    // corpus keep its vocabulary stats current per ingest batch.
    "q201_incremental_vocab" -> ((s, dir) => {
      import s.implicits._
      def census(docs: DataFrame): DataFrame = docs
        .select($"doc_id", explode(split(trim($"text"), "\\s+")).as("term"))
        .groupBy($"term")
        .agg(min($"doc_id").as("first_doc"), count(lit(1)).as("occ"))
      val all = T.spread(T.documents(s, dir))
      val stored = census(all.filter($"doc_id" < 400)) // the persisted rows
      val delta = census(all.filter($"doc_id" >= 400)) // new batch only
      stored.unionByName(delta)
        .groupBy($"term")
        .agg(min($"first_doc").as("first_doc"), sum($"occ").as("occ"))
        .orderBy($"term")
    }),

    // q201 as a RUNNABLE NIGHTLY JOB (the q238/q265 pattern applied to
    // the vocabulary census): generation 1 of the per-term
    // (first_doc, occ) census lives in a BUCKETED TABLE ON DISK
    // (bucketed by term, the merge key), each run re-reads it, builds
    // the delta census from delta docs alone, folds the two with the
    // merge-closed (min, sum) pair — one |vocab|-sized shuffle over
    // census rows, never the corpus — and writes the advanced census
    // back as generation 2, from which the output is served.
    // Unlike q265's postings no split alignment is needed: (min, sum)
    // absorb ANY overlap. Output ≡ q201 ≡ the full-rebuild oracle.
    "q266_vocab_disk" -> ((s, dir) => {
      import s.implicits._
      def census(docs: DataFrame): DataFrame = docs
        .select($"doc_id", explode(split(trim($"text"), "\\s+")).as("term"))
        .groupBy($"term")
        .agg(min($"doc_id").as("first_doc"), count(lit(1)).as("occ"))
      val all = T.spread(T.documents(s, dir))
      val maxId = all.agg(max($"doc_id")).head().getLong(0)
      val cut = maxId - maxId / 5
      val key = Scratch.stateKey(s, dir)
      val vocT = s"graft_state_vocab_$key"
      Seq(vocT, s"${vocT}_g2").foreach(Scratch.sweepStaleState(s, _))
      if (!s.catalog.tableExists(vocT))
        Catalog.bucketize(census(all.filter($"doc_id" <= cut)), vocT,
          "term", buckets = 8)
      val delta = census(all.filter($"doc_id" > cut))
      val merged = s.table(vocT).unionByName(delta)
        .groupBy($"term")
        .agg(min($"first_doc").as("first_doc"), sum($"occ").as("occ"))
      Catalog.bucketize(merged, s"${vocT}_g2", "term", buckets = 8)
      s.table(s"${vocT}_g2").select($"term", $"first_doc", $"occ")
        .orderBy($"term")
    }),

    // Zipf rank-frequency slope: fit ln(freq) ~ ln(rank) by OLS over
    // the vocabulary — the q172 integer-moment device applied to the
    // q195/q201 census. A healthy natural-language corpus slopes near
    // −1; boilerplate floods and dedup failures flatten it, tokenizer
    // drift steepens it — this is the one-number corpus-shape alarm
    // beside q195's growth curve. Determinism: ln(rank) and ln(freq)
    // are micro-nat INTEGERS (ln of exact integers, the q175 device);
    // the five OLS moments are exact integer sums (Σxy/Σx² as
    // DECIMAL(38)/HUGEINT — vocab-sized, converts to double once);
    // slope/intercept are a fixed IEEE tail. The rank window walks
    // |vocab| rows — dictionary-sized, never the corpus.
    "q210_zipf_slope" -> ((s, dir) => {
      import s.implicits._
      val tf = T.spread(T.documents(s, dir))
        .select(explode(split(trim($"text"), "\\s+")).as("term"))
        .groupBy($"term").agg(count(lit(1)).as("freq"))
      val w = Window.orderBy($"freq".desc, $"term")
      val xy = tf.withColumn("rank", row_number().over(w).cast("long"))
        .select(
          round(log($"rank".cast("double")) * 1e6).cast("long").as("x"),
          round(log($"freq".cast("double")) * 1e6).cast("long").as("y"))
      val m = xy.agg(count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum(($"x" * $"y").cast("decimal(38,0)")).as("sxy"),
        sum(($"x" * $"x").cast("decimal(38,0)")).as("sxx"))
      val nd = $"n".cast("double")
      val sxd = $"sx".cast("double"); val syd = $"sy".cast("double")
      val slope = (nd * $"sxy".cast("double") - sxd * syd) /
        (nd * $"sxx".cast("double") - sxd * sxd)
      val intercept = (syd - slope * sxd) / nd
      m.select($"n".as("n_terms"),
        Exact.trunc6(slope).as("zipf_slope"),
        Exact.trunc6(intercept / lit(1000000.0)).as("ln_c"))
    }))

  /** (doc_id, n_bigrams, s = Σ micro-nat log-probs) fluency spine —
    * shared by q118 and the refinery-v2 gate (q119), memoized like the
    * other cross-query spines. See q118's doc comment for the shapes
    * and the integer-exactness argument. */
  private val fluencyCache = new SessionMemo[String]
  private[engine] def fluencySpine(s: SparkSession, dir: String): DataFrame =
    fluencyCache.getOrElseUpdate(s, dir) {
      import s.implicits._
      val toks = T.spread(T.documents(s, dir))
        .select($"doc_id", posexplode(split(trim($"text"), "\\s+")))
        .select($"doc_id", $"pos", $"col".as("w"))
      // adjacent pairs via lead() inside the per-doc window (the q111
      // idiom): one shuffle by doc, no positional self-join
      val w = Window.partitionBy($"doc_id").orderBy($"pos")
      val bi = toks
        .withColumn("b", lead($"w", 1).over(w))
        .filter($"b".isNotNull)
        .select($"doc_id", $"w".as("a"), $"b")
      // pre-aggregate to DISTINCT per-doc bigrams (combine-able) so
      // the LM join carries one row per (doc, bigram), weighted by its
      // in-doc multiplicity — not one row per occurrence
      val docBi = bi.groupBy($"doc_id", $"a", $"b").agg(count(lit(1)).as("k"))
      val cBi = docBi.groupBy($"a", $"b").agg(sum($"k").as("c_ab"))
      val cUni = toks.groupBy($"w".as("a")).agg(count(lit(1)).as("c_a"))
      docBi.join(cBi, Seq("a", "b")).join(cUni, Seq("a"))
        .select($"doc_id", $"k",
          round(log($"c_ab".cast("double") / $"c_a".cast("double")) * 1e6)
            .cast("long").as("lp_micro"))
        .groupBy($"doc_id")
        .agg(sum($"k").as("n_bigrams"), sum($"lp_micro" * $"k").as("s"))
        .localCheckpoint()
    }

  /** Per-document quality signals + composite keep decision (q58; also
    * stage 1 of Pipeline.refinery). Shape: explode → count per (doc,
    * token) → roll up per doc; both shuffles carry combine-able integer
    * counts, so at 100 TB each stage moves one row per distinct (doc,
    * token), not one per token occurrence. */
  def qualitySignals(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val perTok = T.spread(T.documents(s, dir))
      .select($"doc_id", explode(split(trim($"text"), "\\s+")).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("cnt"))
    perTok.groupBy($"doc_id").agg(
        sum($"cnt").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max($"cnt").as("top_cnt"),
        sum(length($"w").cast("long") * $"cnt").as("tok_chars"))
      .select($"doc_id", $"n_tokens", $"n_distinct",
        ($"tok_chars".cast("double") / $"n_tokens".cast("double")).as("mean_word_len"),
        (lit(1.0) - $"n_distinct".cast("double") / $"n_tokens".cast("double")).as("dup_tok_frac"),
        ($"top_cnt".cast("double") / $"n_tokens".cast("double")).as("top_tok_frac"))
      .withColumn("keep",
        $"n_tokens".between(20L, 80L) &&
          $"mean_word_len" >= 4.0 && $"mean_word_len" <= 5.0 &&
          $"dup_tok_frac" < 0.6 && $"top_tok_frac" < 0.15)
  }

  /** Shared oracle CTE chain for BPE training: distinct-word dict →
    * 3 rounds of (pair count → argmax → sentinel replace). DuckDB's
    * `replace` shares Spark's non-overlapping left-to-right scan, so
    * the greedy merge semantics replay exactly. */
  private val bpeOracleCtes =
    """WITH wdict AS (
      |  SELECT '[' || array_to_string(string_split(w, ''), '][') || ']' AS seq,
      |    count(*) AS cnt
      |  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
      |        FROM documents) t
      |  WHERE len(w) > 0 GROUP BY 1),
      |r1 AS (SELECT seq, cnt,
      |    unnest(string_split(substr(seq, 2, len(seq) - 2), '][')) AS s,
      |    generate_subscripts(string_split(substr(seq, 2, len(seq) - 2), ']['), 1) AS pos
      |  FROM wdict),
      |p1 AS (SELECT cnt, s AS a, lead(s) OVER (PARTITION BY seq ORDER BY pos) AS b FROM r1),
      |b1 AS (SELECT a, b, CAST(sum(cnt) AS BIGINT) AS pc FROM p1
      |  WHERE b IS NOT NULL GROUP BY a, b ORDER BY pc DESC, a, b LIMIT 1),
      |w1 AS (SELECT replace(seq, '[' || b1.a || '][' || b1.b || ']',
      |    '[' || b1.a || b1.b || ']') AS seq, cnt FROM wdict, b1),
      |r2 AS (SELECT seq, cnt,
      |    unnest(string_split(substr(seq, 2, len(seq) - 2), '][')) AS s,
      |    generate_subscripts(string_split(substr(seq, 2, len(seq) - 2), ']['), 1) AS pos
      |  FROM w1),
      |p2 AS (SELECT cnt, s AS a, lead(s) OVER (PARTITION BY seq ORDER BY pos) AS b FROM r2),
      |b2 AS (SELECT a, b, CAST(sum(cnt) AS BIGINT) AS pc FROM p2
      |  WHERE b IS NOT NULL GROUP BY a, b ORDER BY pc DESC, a, b LIMIT 1),
      |w2 AS (SELECT replace(seq, '[' || b2.a || '][' || b2.b || ']',
      |    '[' || b2.a || b2.b || ']') AS seq, cnt FROM w1, b2),
      |r3 AS (SELECT seq, cnt,
      |    unnest(string_split(substr(seq, 2, len(seq) - 2), '][')) AS s,
      |    generate_subscripts(string_split(substr(seq, 2, len(seq) - 2), ']['), 1) AS pos
      |  FROM w2),
      |p3 AS (SELECT cnt, s AS a, lead(s) OVER (PARTITION BY seq ORDER BY pos) AS b FROM r3),
      |b3 AS (SELECT a, b, CAST(sum(cnt) AS BIGINT) AS pc FROM p3
      |  WHERE b IS NOT NULL GROUP BY a, b ORDER BY pc DESC, a, b LIMIT 1)""".stripMargin

  val oracle: Map[String, String] = Map(
    // Identical bit-length checkpoint buckets (printf('%b') mirrors
    // bin()), identical combine-able counts, cumulative over the
    // bounded bucket axis; ln-ratio rounded on both engines.
    "q195_vocab_growth" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents),
        |bt AS (
        |  SELECT CAST(length(printf('%b', doc_id + 1)) - 1 AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_tokens
        |  FROM toks GROUP BY 1),
        |fd AS (SELECT term, min(doc_id) AS first_doc FROM toks GROUP BY term),
        |nt AS (
        |  SELECT CAST(length(printf('%b', first_doc + 1)) - 1 AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_new_terms
        |  FROM fd GROUP BY 1),
        |cum AS (
        |  SELECT bt.bucket, bt.n_tokens,
        |    CAST(coalesce(nt.n_new_terms, 0) AS BIGINT) AS n_new_terms,
        |    CAST(sum(bt.n_tokens) OVER (ORDER BY bt.bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_tokens,
        |    CAST(sum(coalesce(nt.n_new_terms, 0)) OVER (ORDER BY bt.bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_vocab
        |  FROM bt LEFT JOIN nt ON nt.bucket = bt.bucket)
        |SELECT bucket, n_tokens, n_new_terms, cum_tokens, cum_vocab,
        |  CASE WHEN cum_tokens > 1 THEN
        |    round(ln(CAST(cum_vocab AS DOUBLE)) / ln(CAST(cum_tokens AS DOUBLE)), 6)
        |  END AS heaps_beta
        |FROM cum ORDER BY bucket""".stripMargin,

    // FULL REBUILD census — hash equality with the engine's
    // stored-plus-delta union proves the incremental maintenance
    // lossless (min and sum are merge-closed).
    "q201_incremental_vocab" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents)
        |SELECT term, min(doc_id) AS first_doc,
        |  CAST(count(*) AS BIGINT) AS occ
        |FROM toks GROUP BY term ORDER BY term""".stripMargin,

    // Same full-rebuild census: the disk-state path must land on the
    // identical hash — the round-trip through bucketed tables is
    // invisible to the output.
    "q266_vocab_disk" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents)
        |SELECT term, min(doc_id) AS first_doc,
        |  CAST(count(*) AS BIGINT) AS occ
        |FROM toks GROUP BY term ORDER BY term""".stripMargin,

    // Identical micro-nat coordinates, exact integer moments (HUGEINT
    // sums → one double conversion), identical OLS tail.
    "q210_zipf_slope" ->
      """WITH tf AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS freq FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS term
        |    FROM documents) t
        |  GROUP BY term),
        |xy AS (
        |  SELECT
        |    CAST(round(ln(CAST(rank AS DOUBLE)) * 1e6) AS BIGINT) AS x,
        |    CAST(round(ln(CAST(freq AS DOUBLE)) * 1e6) AS BIGINT) AS y
        |  FROM (
        |    SELECT freq,
        |      CAST(row_number() OVER (ORDER BY freq DESC, term) AS BIGINT)
        |        AS rank
        |    FROM tf) r),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS DOUBLE) AS sxy,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx
        |  FROM xy),
        |s AS (
        |  SELECT n,
        |    (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      AS slope,
        |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        |  FROM m)
        |SELECT n AS n_terms,
        |  floor((slope) * 1000000.0) / 1000000.0 AS zipf_slope,
        |  floor(((syd - slope * sxd) / CAST(n AS DOUBLE) / 1000000.0)
        |    * 1000000.0) / 1000000.0 AS ln_c
        |FROM s""".stripMargin,

    "q148_bpe_train" -> (bpeOracleCtes +
      """
        |SELECT CAST(1 AS BIGINT) AS merge_rank, a AS left_sym,
        |  b AS right_sym, pc AS pair_count FROM b1
        |UNION ALL SELECT CAST(2 AS BIGINT), a, b, pc FROM b2
        |UNION ALL SELECT CAST(3 AS BIGINT), a, b, pc FROM b3
        |ORDER BY merge_rank""".stripMargin),

    "q149_bpe_apply" -> (bpeOracleCtes +
      """,
        |words AS (
        |  SELECT doc_id,
        |    '[' || array_to_string(string_split(w, ''), '][') || ']' AS seq
        |  FROM (SELECT doc_id,
        |          unnest(string_split_regex(trim(text), '\s+')) AS w
        |        FROM documents) t
        |  WHERE len(w) > 0),
        |applied AS (
        |  SELECT doc_id, seq,
        |    replace(replace(replace(seq,
        |      '[' || b1.a || '][' || b1.b || ']', '[' || b1.a || b1.b || ']'),
        |      '[' || b2.a || '][' || b2.b || ']', '[' || b2.a || b2.b || ']'),
        |      '[' || b3.a || '][' || b3.b || ']', '[' || b3.a || b3.b || ']') AS s3
        |  FROM words, b1, b2, b3)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(len(seq) - len(replace(seq, '[', ''))) AS BIGINT) AS n_chars_sym,
        |  CAST(sum(len(s3) - len(replace(s3, '[', ''))) AS BIGINT) AS n_subwords,
        |  floor((CAST(sum(len(s3) - len(replace(s3, '[', ''))) AS DOUBLE)
        |    / CAST(sum(len(seq) - len(replace(seq, '[', ''))) AS DOUBLE))
        |    * 1000000.0) / 1000000.0 AS compression
        |FROM applied GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    "q118_bigram_fluency" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(text), '\s+')) AS w,
        |    generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS pos
        |  FROM documents),
        |bi AS (
        |  SELECT doc_id, w AS a,
        |    lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS b
        |  FROM raw),
        |bi2 AS (SELECT doc_id, a, b FROM bi WHERE b IS NOT NULL),
        |c_bi AS (SELECT a, b, count(*) AS c_ab FROM bi2 GROUP BY a, b),
        |c_uni AS (SELECT w AS a, count(*) AS c_a FROM raw GROUP BY w),
        |scored AS (
        |  SELECT bi2.doc_id,
        |    CAST(round(ln(CAST(c_ab AS DOUBLE) / CAST(c_a AS DOUBLE)) * 1000000)
        |      AS BIGINT) AS lp_micro
        |  FROM bi2 JOIN c_bi USING (a, b) JOIN c_uni USING (a))
        |SELECT doc_id, count(*) AS n_bigrams,
        |  floor((CAST(sum(lp_micro) AS DOUBLE) / 1000000.0
        |        / CAST(count(*) AS DOUBLE)) * 1000000.0) / 1000000.0
        |    AS mean_logprob
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q89_mixture_weights" ->
      """WITH t AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT))
        |      AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source)
        |SELECT source, n_docs, n_tokens,
        |  least(1.0, (CAST(sum(n_tokens) OVER () AS DOUBLE)
        |              / CAST(count(*) OVER () AS DOUBLE))
        |             / CAST(n_tokens AS DOUBLE)) AS rate,
        |  least(1.0, (CAST(sum(n_tokens) OVER () AS DOUBLE)
        |              / CAST(count(*) OVER () AS DOUBLE))
        |             / CAST(n_tokens AS DOUBLE))
        |    * CAST(n_tokens AS DOUBLE) AS expected_tokens
        |FROM t ORDER BY source""".stripMargin,

    "q101_mixture_sample" ->
      """WITH tok AS (
        |  SELECT source, doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_toks
        |  FROM documents),
        |agg AS (SELECT source, CAST(sum(n_toks) AS BIGINT) AS n_tokens
        |        FROM tok GROUP BY source),
        |rates AS (
        |  SELECT source,
        |    least(1.0, (CAST(sum(n_tokens) OVER () AS DOUBLE)
        |                / CAST(count(*) OVER () AS DOUBLE))
        |               / CAST(n_tokens AS DOUBLE)) AS rate
        |  FROM agg),
        |coin AS (
        |  SELECT t.source, t.doc_id, t.n_toks, r.rate,
        |    CAST(CAST(('0x' || substr(md5(CAST(t.doc_id AS VARCHAR) || ':mix'), 1, 13))
        |      AS BIGINT) AS DOUBLE) / 4503599627370496.0 < r.rate AS keep
        |  FROM tok t JOIN rates r ON r.source = t.source)
        |SELECT source, count(*) AS n_docs,
        |  CAST(count(CASE WHEN keep THEN 1 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN keep THEN n_toks ELSE 0 END) AS BIGINT) AS kept_tokens,
        |  min(rate) AS rate
        |FROM coin GROUP BY source ORDER BY source""".stripMargin,

    // Priority replay: identical md5-keyed u, identical (w*C)/(h+1)
    // association order, τ from the rank-26 row.
    "q141_priority_sample" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS weight,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':prio'), 1, 13))
        |      AS BIGINT) AS h
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, weight,
        |    CAST(weight AS DOUBLE) * 4503599627370496.0
        |      / CAST(h + 1 AS DOUBLE) AS priority
        |  FROM t),
        |top AS (
        |  SELECT doc_id, weight, priority,
        |    CAST(row_number() OVER (ORDER BY priority DESC, doc_id) AS BIGINT) AS rn
        |  FROM p QUALIFY rn <= 26),
        |tt AS (SELECT top.*, max(CASE WHEN rn = 26 THEN priority END) OVER () AS tau
        |       FROM top)
        |SELECT rn, doc_id, weight, priority,
        |  greatest(CAST(weight AS DOUBLE), tau) AS est_weight
        |FROM tt WHERE rn <= 25 ORDER BY rn""".stripMargin,

    // PMI replay via positional self-join bigrams (the Spark side is
    // map-side array transforms — cross-formulation parity); identical
    // ((n_ab·N)/n_a)·(N/B)/n_b IEEE sequence over exact counts.
    "q146_pmi_collocations" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS a
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest(a) AS w, generate_subscripts(a, 1) AS pos
        |  FROM docs),
        |b AS (
        |  SELECT t1.w AS w1, t2.w AS w2
        |  FROM toks t1 JOIN toks t2
        |    ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1),
        |uni AS (SELECT w, count(*) AS n FROM toks GROUP BY w),
        |tot AS (SELECT count(*) AS nn FROM toks),
        |btot AS (SELECT count(*) AS bb FROM b),
        |bc AS (
        |  SELECT w1, w2, count(*) AS n_ab FROM b
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |scored AS (
        |  SELECT bc.w1, bc.w2, bc.n_ab, u1.n AS n_a, u2.n AS n_b,
        |    ((CAST(bc.n_ab AS DOUBLE) * CAST(tot.nn AS DOUBLE))
        |       / CAST(u1.n AS DOUBLE))
        |      * (CAST(tot.nn AS DOUBLE) / CAST(btot.bb AS DOUBLE))
        |      / CAST(u2.n AS DOUBLE) AS lift
        |  FROM bc
        |  JOIN uni u1 ON u1.w = bc.w1
        |  JOIN uni u2 ON u2.w = bc.w2
        |  CROSS JOIN tot CROSS JOIN btot)
        |SELECT w1, w2, n_ab, n_a, n_b, lift, rank FROM (
        |  SELECT *, CAST(row_number() OVER (ORDER BY lift DESC, w1, w2)
        |    AS BIGINT) AS rank
        |  FROM scored) r
        |WHERE rank <= 30 ORDER BY rank""".stripMargin,

    // Cavnar–Trenkle replay: identical trigram extraction (padded
    // words, positions 1..len), identical integer rank profiles and
    // out-of-place distance; the static 20-row position table covers
    // the fixture's ≤8-char words on both engines.
    "q160_naive_bayes" ->
      """WITH toks AS (
        |  SELECT * FROM (
        |    SELECT doc_id, lang,
        |      unnest(string_split_regex(trim(text), '\s+')) AS w
        |    FROM documents) WHERE length(w) > 0),
        |train AS (SELECT * FROM toks WHERE doc_id % 5 <> 0),
        |v AS (SELECT count(DISTINCT w) AS vsz FROM train),
        |cls AS (SELECT lang, count(*) AS cl FROM train GROUP BY lang),
        |pri AS (
        |  SELECT lang, count(*) AS nd, sum(count(*)) OVER () AS ndtot
        |  FROM documents WHERE doc_id % 5 <> 0 GROUP BY lang),
        |label_stats AS (
        |  SELECT cls.lang AS cand,
        |    CAST(round(ln(1.0 / CAST(cl + vsz AS DOUBLE)) * 1000000)
        |      AS BIGINT) AS lp0,
        |    CAST(round(ln(CAST(nd AS DOUBLE) / CAST(ndtot AS DOUBLE))
        |      * 1000000) AS BIGINT) AS prior
        |  FROM cls JOIN pri ON pri.lang = cls.lang CROSS JOIN v),
        |lp AS (
        |  SELECT t.lang AS cand, t.w,
        |    CAST(round(ln(CAST(c + 1 AS DOUBLE) / CAST(cl + vsz AS DOUBLE))
        |      * 1000000) AS BIGINT) AS lp
        |  FROM (SELECT lang, w, count(*) AS c FROM train GROUP BY lang, w) t
        |  JOIN cls ON cls.lang = t.lang CROSS JOIN v),
        |test_counts AS (
        |  SELECT doc_id, w, count(*) AS k FROM toks
        |  WHERE doc_id % 5 = 0 GROUP BY doc_id, w),
        |totals AS (
        |  SELECT tc.doc_id, ls.cand,
        |    CAST(sum(k * coalesce(lp.lp, ls.lp0)) + any_value(ls.prior)
        |      AS BIGINT) AS score_micro
        |  FROM test_counts tc CROSS JOIN label_stats ls
        |  LEFT JOIN lp ON lp.cand = ls.cand AND lp.w = tc.w
        |  GROUP BY tc.doc_id, ls.cand),
        |best AS (SELECT doc_id, max(score_micro) AS mx FROM totals
        |  GROUP BY doc_id),
        |pred AS (
        |  SELECT totals.doc_id, min(cand) AS pred_lang,
        |    max(totals.score_micro) AS score_micro
        |  FROM totals JOIN best ON best.doc_id = totals.doc_id
        |    AND totals.score_micro = best.mx
        |  GROUP BY totals.doc_id)
        |SELECT d.doc_id, d.lang AS actual_lang, pred_lang, score_micro,
        |  pred_lang = d.lang AS correct
        |FROM documents d JOIN pred ON pred.doc_id = d.doc_id
        |WHERE d.doc_id % 5 = 0
        |ORDER BY d.doc_id""".stripMargin,

    "q142_langid_ngram" ->
      """WITH words AS (
        |  SELECT * FROM (
        |    SELECT doc_id, lang,
        |      unnest(string_split_regex(trim(text), '\s+')) AS w
        |    FROM documents) WHERE length(w) > 0),
        |grams AS (
        |  SELECT doc_id, lang, substr('_' || w || '_', CAST(p.i AS INT), 3) AS g
        |  FROM words, (SELECT range AS i FROM range(1, 20)) p
        |  WHERE p.i <= length(w)),
        |lp AS (
        |  SELECT lang AS cand, g AS lg,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY count(*) DESC, g) AS BIGINT) AS lang_rank
        |  FROM grams WHERE lang IS NOT NULL
        |  GROUP BY lang, g QUALIFY lang_rank <= 100),
        |dp AS (
        |  SELECT doc_id, lang, g,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY count(*) DESC, g) AS BIGINT) AS doc_rank
        |  FROM grams GROUP BY doc_id, lang, g QUALIFY doc_rank <= 40),
        |langs AS (SELECT DISTINCT lang AS cand FROM documents
        |          WHERE lang IS NOT NULL),
        |d AS (
        |  SELECT dp.doc_id, dp.lang, langs.cand,
        |    CAST(sum(coalesce(abs(dp.doc_rank - lp.lang_rank), 100))
        |      AS BIGINT) AS dist
        |  FROM dp CROSS JOIN langs
        |  LEFT JOIN lp ON lp.cand = langs.cand AND lp.lg = dp.g
        |  GROUP BY 1, 2, 3)
        |SELECT doc_id, lang, cand AS pred_lang, dist FROM d
        |QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY dist, cand) = 1
        |ORDER BY doc_id""".stripMargin,

    "q248_feature_hashing" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents),
        |h AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(term), 1, 4)) AS BIGINT) % 64 AS bucket,
        |    CASE WHEN CAST(('0x' || substr(md5(term), 5, 1)) AS BIGINT) % 2 = 0
        |         THEN 1 ELSE -1 END AS sgn
        |  FROM toks)
        |SELECT doc_id, bucket, CAST(sum(sgn) AS BIGINT) AS w
        |FROM h GROUP BY 1, 2 HAVING sum(sgn) <> 0
        |ORDER BY doc_id, bucket""".stripMargin,

    "q240_hash_split" ->
      """WITH d AS (
        |  SELECT lang,
        |    CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
        |             || ':split'), 1, 13)) AS BIGINT) < 3602879701896396
        |           THEN 'train'
        |         WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
        |             || ':split'), 1, 13)) AS BIGINT) < 4053239664633446
        |           THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents),
        |g AS (
        |  SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM d GROUP BY 1, 2),
        |t AS (
        |  SELECT split, lang, n_docs,
        |    CAST(sum(n_docs) OVER (PARTITION BY split) AS BIGINT)
        |      AS split_total,
        |    CAST(sum(n_docs) OVER (PARTITION BY lang) AS BIGINT)
        |      AS lang_total,
        |    CAST(sum(n_docs) OVER () AS BIGINT) AS total_docs
        |  FROM g)
        |SELECT split, lang, n_docs, split_total,
        |  CAST((CAST(n_docs AS HUGEINT) * 1000000) // split_total
        |    AS BIGINT) AS share_in_split_micro,
        |  CAST((CAST(lang_total AS HUGEINT) * 1000000) // total_docs
        |    AS BIGINT) AS overall_share_micro,
        |  CAST((CAST(n_docs AS HUGEINT) * 1000000) // split_total
        |    - (CAST(lang_total AS HUGEINT) * 1000000) // total_docs
        |    AS BIGINT) AS skew_micro
        |FROM t ORDER BY split, lang""".stripMargin,

    "q241_vocab_coverage" ->
      """WITH toks AS (
        |  SELECT w FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        |    FROM documents) t
        |  WHERE length(w) > 0),
        |runs AS (
        |  SELECT c, CAST(count(*) AS BIGINT) AS k FROM (
        |    SELECT w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY w) tc
        |  GROUP BY c),
        |cum AS (
        |  SELECT c, k,
        |    CAST(coalesce(sum(k) OVER (ORDER BY c DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS prev_terms,
        |    CAST(coalesce(sum(c * k) OVER (ORDER BY c DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS prev_occ
        |  FROM runs),
        |tot AS (
        |  SELECT CAST(sum(k) AS BIGINT) AS total_terms,
        |    CAST(sum(c * k) AS BIGINT) AS total_occ FROM runs),
        |ks AS (SELECT CAST(k_req AS BIGINT) AS k_req
        |       FROM (VALUES (100), (1000), (10000)) AS v(k_req)),
        |j AS (
        |  SELECT k_req, least(k_req, total_terms) AS kk, total_occ,
        |    prev_occ, prev_terms, c, k
        |  FROM ks CROSS JOIN tot CROSS JOIN cum)
        |SELECT k_req AS k, kk AS n_terms_used,
        |  CAST(min(prev_occ + (kk - prev_terms) * c) AS BIGINT)
        |    AS covered_occ,
        |  total_occ,
        |  CAST((CAST(min(prev_occ + (kk - prev_terms) * c) AS HUGEINT)
        |    * 1000000) // total_occ AS BIGINT) AS coverage_micro
        |FROM j WHERE prev_terms < kk AND kk <= prev_terms + k
        |GROUP BY k_req, kk, total_occ ORDER BY k""".stripMargin,

    "q87_stratified_sample" ->
      """SELECT doc_id, lang, rn FROM (
        |  SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':strat'), doc_id)
        |      AS BIGINT) AS rn
        |  FROM documents) t
        |WHERE rn <= 20
        |ORDER BY lang, rn""".stripMargin,

    "q50_exact_dedup" ->
      """SELECT lang, source, keep_id, n_docs FROM (
        |  SELECT lang, source, doc_id AS keep_id,
        |    row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang, source) AS n_docs
        |  FROM documents) t
        |WHERE rn = 1 ORDER BY lang, source""".stripMargin,

    "q54_token_stats" ->
      """SELECT doc_id, lang, source,
        |  CAST(length(text) AS BIGINT) AS n_chars_actual,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
        |    AS BIGINT) AS n_bpe_pieces,
        |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS n_nonspace,
        |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
        |    / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q102_token_entropy" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws
        |  FROM documents),
        |u AS (SELECT doc_id, ws, list_sort(list_distinct(ws)) AS toks FROM t),
        |f AS (
        |  SELECT doc_id, ws, toks,
        |    list_reduce(
        |      list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(toks,
        |          x -> CAST(len(list_filter(ws, y -> y = x)) AS DOUBLE)
        |               * ln(CAST(len(list_filter(ws, y -> y = x)) AS DOUBLE)))),
        |      (acc, c) -> acc + c) AS fold
        |  FROM u)
        |SELECT doc_id,
        |  CAST(len(ws) AS BIGINT) AS n_tokens,
        |  CAST(len(toks) AS BIGINT) AS n_distinct,
        |  round(ln(CAST(len(ws) AS DOUBLE)) - fold / CAST(len(ws) AS DOUBLE), 6)
        |    AS token_entropy,
        |  CASE WHEN len(toks) > 1 THEN
        |    round((ln(CAST(len(ws) AS DOUBLE)) - fold / CAST(len(ws) AS DOUBLE))
        |      / ln(CAST(len(toks) AS DOUBLE)), 6) END AS norm_entropy
        |FROM f ORDER BY doc_id""".stripMargin,

    "q55_text_quality" ->
      """WITH q AS (
        |  SELECT doc_id, lang, text, ' ' || text || ' ' AS padded,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |    CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) AS digit_ratio
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, lang, n_tokens, digit_ratio,
        |    CAST((length(padded) - length(regexp_replace(padded, ' the ', ' ', 'g'))) / 4 AS BIGINT)
        |    + CAST((length(padded) - length(regexp_replace(padded, ' a ', ' ', 'g'))) / 2 AS BIGINT)
        |    + CAST((length(padded) - length(regexp_replace(padded, ' of ', ' ', 'g'))) / 3 AS BIGINT)
        |      AS stopword_hits
        |  FROM q)
        |SELECT doc_id, lang, n_tokens, stopword_hits, digit_ratio,
        |  least(1.0, CAST(n_tokens AS DOUBLE)/50.0) * (1.0 - digit_ratio) AS quality_score,
        |  CASE WHEN stopword_hits > 0 THEN 'en' ELSE 'unknown' END AS lang_guess
        |FROM h ORDER BY doc_id""".stripMargin,

    "q58_quality_filter" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |c AS (SELECT doc_id, w, count(*) AS cnt FROM t GROUP BY doc_id, w),
        |s AS (SELECT doc_id,
        |    CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |    count(*) AS n_distinct,
        |    max(cnt) AS top_cnt,
        |    CAST(sum(length(w) * cnt) AS BIGINT) AS tok_chars
        |  FROM c GROUP BY doc_id),
        |f AS (SELECT doc_id, n_tokens, n_distinct,
        |    CAST(tok_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS mean_word_len,
        |    1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS dup_tok_frac,
        |    CAST(top_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS top_tok_frac
        |  FROM s)
        |SELECT doc_id, n_tokens, n_distinct, mean_word_len, dup_tok_frac, top_tok_frac,
        |  (n_tokens BETWEEN 20 AND 80) AND mean_word_len >= 4.0 AND mean_word_len <= 5.0
        |    AND dup_tok_frac < 0.6 AND top_tok_frac < 0.15 AS keep
        |FROM f ORDER BY doc_id""".stripMargin,

    "q59_repetition" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(text), '\s+')) AS w,
        |    generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS ord
        |  FROM documents),
        |seq AS (SELECT doc_id, w, ord,
        |    lead(w, 1) OVER (PARTITION BY doc_id ORDER BY ord) AS w1,
        |    lead(w, 2) OVER (PARTITION BY doc_id ORDER BY ord) AS w2
        |  FROM raw),
        |tg AS (SELECT doc_id, w || ' ' || w1 || ' ' || w2 AS g FROM seq WHERE w2 IS NOT NULL),
        |bg AS (SELECT doc_id, w || ' ' || w1 AS g FROM seq WHERE w1 IS NOT NULL),
        |tstat AS (SELECT doc_id, count(*) AS n, count(DISTINCT g) AS d FROM tg GROUP BY doc_id),
        |bcnt AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
        |bstat AS (SELECT doc_id, max(c) AS mc, CAST(sum(c) AS BIGINT) AS nb
        |          FROM bcnt GROUP BY doc_id)
        |SELECT t.doc_id,
        |  CAST(t.n AS BIGINT) AS n_trigrams,
        |  CAST(t.n - t.d AS BIGINT) AS n_dup_trigrams,
        |  CAST(t.n - t.d AS DOUBLE) / CAST(t.n AS DOUBLE) AS dup_trigram_frac,
        |  CAST(b.mc AS DOUBLE) / CAST(b.nb AS DOUBLE) AS top_bigram_frac
        |FROM tstat t JOIN bstat b ON b.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    "q72_pii_scrub" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id
        |         || '@mail.example.com or https://ex.am/p/' || doc_id AS raw
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(raw,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(raw, 'https?://[^\s]+')) AS BIGINT) AS n_urls,
        |  regexp_replace(regexp_replace(raw, 'https?://[^\s]+', '<URL>', 'g'),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS scrubbed
        |FROM r ORDER BY doc_id""".stripMargin,

    "q73_ngram_topk" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(text), '\s+')) AS w,
        |    generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS ord
        |  FROM documents),
        |seq AS (SELECT doc_id, w,
        |    lead(w, 1) OVER (PARTITION BY doc_id ORDER BY ord) AS w1
        |  FROM raw)
        |SELECT w || ' ' || w1 AS bigram, CAST(count(*) AS BIGINT) AS cnt
        |FROM seq WHERE w1 IS NOT NULL
        |GROUP BY w || ' ' || w1
        |ORDER BY cnt DESC, bigram LIMIT 50""".stripMargin,

    "q76_bm25" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |stats AS (SELECT CAST(sum(dl) AS DOUBLE)/CAST(count(*) AS DOUBLE) AS avgdl,
        |                 CAST(count(*) AS DOUBLE) AS nd FROM dl),
        |scored AS (
        |  SELECT t.doc_id, t.term, t.tf, f.df,
        |    round(ln((s.nd - CAST(f.df AS DOUBLE) + 0.5)/(CAST(f.df AS DOUBLE) + 0.5) + 1.0)
        |      * (CAST(t.tf AS DOUBLE) * 2.2)
        |      / (CAST(t.tf AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * CAST(d.dl AS DOUBLE) / s.avgdl)),
        |      6) AS bm25,
        |    round(CAST(t.tf AS DOUBLE) * ln(s.nd / CAST(f.df AS DOUBLE)), 6) AS tfidf
        |  FROM tf t JOIN dl d ON d.doc_id = t.doc_id
        |  JOIN dfreq f ON f.term = t.term CROSS JOIN stats s
        |  WHERE t.doc_id % 50 = 0)
        |SELECT doc_id, term, tf, df, bm25, tfidf, rank FROM (
        |  SELECT scored.*,
        |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY bm25 DESC, term) AS BIGINT) AS rank
        |  FROM scored) r
        |WHERE rank <= 5 ORDER BY doc_id, rank""".stripMargin,

    "q56_fingerprint" ->
      """SELECT doc_id,
        |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint,
        |  substr(md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), 1, 4) AS bucket
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Replays q137's greedy loop exactly: the same vocabulary literals
    // (one Scala source), the same longest-first CASE, one recursion
    // step per consumed piece; the working row carries the remaining
    // suffix and the accumulated piece string per token.
    "q137_wordpiece" -> {
      s"""WITH RECURSIVE
         |toks AS (
         |  SELECT doc_id, ord, w FROM (
         |    SELECT doc_id,
         |      unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w,
         |      generate_subscripts(string_split_regex(lower(trim(text)), '\\s+'), 1) AS ord
         |    FROM documents WHERE len(trim(text)) > 0) raw),
         |seg AS (
         |  SELECT doc_id, ord, w AS rem, CAST('' AS VARCHAR) AS parts,
         |    CAST(0 AS BIGINT) AS np, CAST(0 AS BIGINT) AS nu
         |  FROM toks
         |  UNION ALL
         |  SELECT doc_id, ord, substr(rem, adv + 1),
         |    CASE WHEN parts = '' THEN piece ELSE parts || ' ' || piece END,
         |    np + 1, nu + CASE WHEN piece = '<unk>' THEN 1 ELSE 0 END
         |  FROM (
         |    SELECT doc_id, ord, rem, parts, np, nu,
         |      CASE WHEN substr(rem,1,4) IN (${vocabIn(4)}) THEN 4
         |           WHEN substr(rem,1,3) IN (${vocabIn(3)}) THEN 3
         |           WHEN substr(rem,1,2) IN (${vocabIn(2)}) THEN 2
         |           ELSE 1 END AS adv,
         |      CASE WHEN substr(rem,1,4) IN (${vocabIn(4)}) THEN substr(rem,1,4)
         |           WHEN substr(rem,1,3) IN (${vocabIn(3)}) THEN substr(rem,1,3)
         |           WHEN substr(rem,1,2) IN (${vocabIn(2)}) THEN substr(rem,1,2)
         |           WHEN substr(rem,1,1) IN (${vocabIn(1)}) THEN substr(rem,1,1)
         |           ELSE '<unk>' END AS piece
         |    FROM seg WHERE len(rem) > 0) x),
         |fin AS (SELECT doc_id, ord, parts, np, nu FROM seg WHERE len(rem) = 0)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(np) AS BIGINT) AS n_pieces,
         |  CAST(sum(nu) AS BIGINT) AS n_unk,
         |  string_agg(parts, ' ' ORDER BY ord) AS pieces_str
         |FROM fin GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    // Same candidate enumeration (s capped at 63 chars — fixture words
    // are ≤ ~12), same integer-encoded Viterbi min via an identity-
    // seeded list_reduce whose state is a plain BIGINT LIST (the
    // documented struct_pack-sequential-evaluation pitfall does not
    // apply to lists), and a recursive-CTE backtrack per word.
    "q189_unigram_viterbi" ->
      """WITH RECURSIVE words AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS f FROM (
        |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        |    FROM documents) t
        |  WHERE length(w) > 0 GROUP BY w),
        |cands AS (
        |  SELECT w, f, CAST(s.range AS BIGINT) AS s,
        |    CAST(l.range AS BIGINT) AS l,
        |    substr(w, CAST(s.range AS INT), CAST(l.range AS INT)) AS piece
        |  FROM words, range(1, 64) s, range(1, 5) l
        |  WHERE CAST(s.range AS BIGINT) <= length(w)
        |    AND CAST(l.range AS BIGINT)
        |      <= least(4, length(w) - CAST(s.range AS BIGINT) + 1)),
        |vocab AS (SELECT piece, CAST(sum(f) AS BIGINT) AS cnt
        |          FROM cands GROUP BY piece),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM vocab),
        |costs AS (
        |  SELECT piece, CAST(round(ln(CAST(t AS DOUBLE) / CAST(cnt AS DOUBLE))
        |    * 1000000) AS BIGINT) AS cost
        |  FROM vocab CROSS JOIN tot),
        |packed AS (
        |  SELECT c.w, c.f,
        |    list(struct_pack(s := c.s, l := c.l, cost := k.cost)) AS cands
        |  FROM cands c JOIN costs k USING (piece) GROUP BY c.w, c.f),
        |dp AS (
        |  SELECT w, f, list_reduce(
        |    [[CAST(0 AS BIGINT)]]
        |      || list_transform(range(1, CAST(length(w) + 1 AS BIGINT)),
        |           e -> [e]),
        |    (acc, el) -> list_append(acc, list_min(list_transform(
        |      list_filter(cands, c -> c.s + c.l - 1 = el[1]),
        |      c -> (acc[c.s] // 32 + c.cost) * 32 + (8 - c.l))))) AS best
        |  FROM packed),
        |seg AS (
        |  SELECT w, f, best, CAST(length(w) AS BIGINT) AS e,
        |    CAST('' AS VARCHAR) AS parts, CAST(0 AS BIGINT) AS np
        |  FROM dp
        |  UNION ALL
        |  SELECT w, f, best, e - pl,
        |    CASE WHEN parts = '' THEN piece ELSE piece || ' ' || parts END,
        |    np + 1
        |  FROM (
        |    SELECT w, f, best, e, parts, np, 8 - best[e + 1] % 32 AS pl,
        |      substr(w, CAST(e - (8 - best[e + 1] % 32) + 1 AS INT),
        |        CAST(8 - best[e + 1] % 32 AS INT)) AS piece
        |    FROM seg WHERE e > 0) x)
        |SELECT w, f, np AS n_pieces,
        |  best[length(w) + 1] // 32 AS cost_micro, parts AS pieces_str
        |FROM seg WHERE e = 0 ORDER BY w""".stripMargin,

    // Identical clipped-overlap/length integers, identical micro-nat
    // rounding; bigrams built positionally (the q146 cross-formulation).
    "q186_bleu" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS a
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest(a) AS g, generate_subscripts(a, 1) AS pos
        |  FROM docs),
        |uni AS (SELECT doc_id, g, count(*) AS cnt FROM toks GROUP BY 1, 2),
        |bit AS (
        |  SELECT t1.doc_id, t1.g || ' ' || t2.g AS g
        |  FROM toks t1 JOIN toks t2
        |    ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1),
        |bi AS (SELECT doc_id, g, count(*) AS cnt FROM bit GROUP BY 1, 2),
        |o1 AS (
        |  SELECT c.doc_id AS cand_id, c.doc_id - 1 AS ref_id,
        |    CAST(sum(least(c.cnt, coalesce(r.cnt, 0))) AS BIGINT) AS p1_num,
        |    CAST(sum(c.cnt) AS BIGINT) AS c_len
        |  FROM uni c LEFT JOIN uni r
        |    ON r.doc_id = c.doc_id - 1 AND r.g = c.g
        |  WHERE c.doc_id % 2 = 1 GROUP BY 1, 2),
        |o2 AS (
        |  SELECT c.doc_id AS cand_id, c.doc_id - 1 AS ref_id,
        |    CAST(sum(least(c.cnt, coalesce(r.cnt, 0))) AS BIGINT) AS p2_num,
        |    CAST(sum(c.cnt) AS BIGINT) AS p2_den
        |  FROM bi c LEFT JOIN bi r
        |    ON r.doc_id = c.doc_id - 1 AND r.g = c.g
        |  WHERE c.doc_id % 2 = 1 GROUP BY 1, 2),
        |rlen AS (
        |  SELECT doc_id AS ref_id, CAST(sum(cnt) AS BIGINT) AS r_len
        |  FROM uni GROUP BY 1),
        |m AS (
        |  SELECT o1.cand_id, o1.ref_id, o1.c_len, rlen.r_len,
        |    o1.p1_num, o2.p2_num, o2.p2_den,
        |    CAST(round(ln(CAST(o1.p1_num + 1 AS DOUBLE)
        |      / CAST(o1.c_len + 1 AS DOUBLE)) * 1000000) AS BIGINT)
        |      AS lnp1_micro,
        |    CAST(round(ln(CAST(o2.p2_num + 1 AS DOUBLE)
        |      / CAST(o2.p2_den + 1 AS DOUBLE)) * 1000000) AS BIGINT)
        |      AS lnp2_micro,
        |    CASE WHEN o1.c_len < rlen.r_len THEN
        |      CAST(floor((1.0 - CAST(rlen.r_len AS DOUBLE)
        |        / CAST(o1.c_len AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
        |      ELSE 0 END AS bp_micro
        |  FROM o1
        |  JOIN o2 ON o2.cand_id = o1.cand_id AND o2.ref_id = o1.ref_id
        |  JOIN rlen ON rlen.ref_id = o1.ref_id)
        |SELECT cand_id, ref_id, c_len, r_len, p1_num, p2_num, p2_den,
        |  lnp1_micro, lnp2_micro, bp_micro,
        |  bp_micro + CAST(round(CAST(lnp1_micro + lnp2_micro AS DOUBLE) / 2.0)
        |    AS BIGINT) AS logbleu_micro,
        |  round(CAST(bp_micro + CAST(round(
        |      CAST(lnp1_micro + lnp2_micro AS DOUBLE) / 2.0) AS BIGINT)
        |    AS DOUBLE) / 1000000.0, 6) AS log_bleu2
        |FROM m ORDER BY cand_id""".stripMargin,

    // The oracle is the FULL REBUILD over the whole corpus — hash
    // equality is the proof that stored-plus-delta maintenance loses
    // nothing.
    "q190_postings_incremental" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents),
        |t AS (SELECT DISTINCT doc_id, term FROM tok),
        |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM t GROUP BY term),
        |seg AS (
        |  SELECT term, doc_id // 100 AS segment,
        |    CAST(count(*) AS BIGINT) AS seg_df,
        |    string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        |  FROM t GROUP BY term, doc_id // 100)
        |SELECT s.term, s.segment, d.df, s.seg_df, s.postings
        |FROM seg s JOIN dfreq d ON d.term = s.term
        |WHERE d.df >= 5
        |ORDER BY s.term, s.segment""".stripMargin,

    // Same full-rebuild index: hash equality across the g1→g2 disk
    // round-trip proves the persisted maintenance lossless.
    "q265_postings_disk" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents),
        |t AS (SELECT DISTINCT doc_id, term FROM tok),
        |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM t GROUP BY term),
        |seg AS (
        |  SELECT term, doc_id // 100 AS segment,
        |    CAST(count(*) AS BIGINT) AS seg_df,
        |    string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        |  FROM t GROUP BY term, doc_id // 100)
        |SELECT s.term, s.segment, d.df, s.seg_df, s.postings
        |FROM seg s JOIN dfreq d ON d.term = s.term
        |WHERE d.df >= 5
        |ORDER BY s.term, s.segment""".stripMargin,

    "q132_postings" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents),
        |t AS (SELECT DISTINCT doc_id, term FROM tok),
        |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM t GROUP BY term),
        |seg AS (
        |  SELECT term, doc_id // 100 AS segment,
        |    CAST(count(*) AS BIGINT) AS seg_df,
        |    string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        |  FROM t GROUP BY term, doc_id // 100)
        |SELECT s.term, s.segment, d.df, s.seg_df, s.postings
        |FROM seg s JOIN dfreq d ON d.term = s.term
        |WHERE d.df >= 5
        |ORDER BY s.term, s.segment""".stripMargin)
}
