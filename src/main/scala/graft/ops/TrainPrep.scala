package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-batch preparation operators: sequence packing (concat-and-chunk
  * into fixed context windows) and benchmark-contamination detection — the
  * two corpus-level passes that run after dedup/quality filtering and before
  * a corpus ships to the trainer.
  *
  * Scale design: packing is one window shuffle over (shard, doc_id) — the
  * global-cumsum formulation would serialize the whole corpus through a
  * single partition, so packing is sharded by hash exactly like a real
  * multi-worker packer (each worker packs its shard independently).
  * Contamination is an inverted-index equi-join on the n-gram string with
  * the (small) eval side broadcast — never a doc × doc comparison.
  */
object TrainPrep {
  import Tables._

  /** Context-window length in tokens for `pack_sequences`. */
  val ContextLen = 256

  /** Shard count for the packer: at 100 TB this is the number of
    * independent packing streams (one per writer task), here sized so the
    * fixture exercises multi-row shards at every scale factor.
    */
  val PackShards = 32

  /** N-gram width for the contamination check: 5-grams are the common
    * "verbatim leak" width — short enough to catch partial quotes, long
    * enough that chance collisions are rare.
    */
  val ContamN = 5

  /** Output shard count for `shard_balance` — the writer streams the
    * balanced assignment feeds (small vs PackShards so each rank bucket
    * snakes across every shard several times).
    */
  val BalanceShards = 8

  // corpus(), not a raw scan: the fixture file is one parquet row group,
  // and contamination's gram explode would otherwise run on a single core
  // (the Tables.corpus pitfall). Cached (the Dedup.shingled pattern):
  // contamination evaluates this subtree on both the train and the eval
  // branch, and pack_sequences shares the identical plan — one
  // materialization serves all three.
  private def toks(s: SparkSession, d: String): DataFrame =
    corpus(s, d)
      .withColumn("toks", split(lower(trim(col("text"))), " "))
      .cache()

  /** Distinct word n-grams per doc, as strings (the join key). */
  private def grams(df: DataFrame): DataFrame =
    df.filter(size(col("toks")) >= ContamN)
      .withColumn("gram", explode(array_distinct(expr(
        s"""transform(sequence(0, size(toks) - $ContamN),
           |  i -> concat_ws(' ', slice(toks, i + 1, $ContamN)))"""
          .stripMargin))))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the end-to-end curation yield funnel: raw corpus → exact-dedup
    // keepers → near-dup (connected-component) keepers → quality filter
    // → language gate, with each stage's survivor count, share of raw,
    // and stage-local pass rate — the one-page report a data-curation
    // review reads before a training run is approved (every stage's
    // logic is THE operator that owns it: exactKeepers, connectedLabels,
    // qualityFiltered — the funnel can't drift from the pipeline it
    // summarizes). Stage flags are per-doc booleans computed in one
    // pass over doc-sized side tables (two of them memoized kernels);
    // the funnel itself is ONE conditional aggregate + a 5-struct
    // explode, so nothing here adds a corpus-scale shuffle beyond what
    // the member operators already pay.
    "corpus_pipeline_funnel" -> { (s, d) =>
      val docs = t(s, d, "documents")
      val keepers = Dedup.exactKeepers(docs, "doc_id", "text")
        .select(col("keeper").as("doc_id"), lit(true).as("exact_keep"))
      val cc = Dedup.connectedLabels(s, d)
        .select(col("id").as("doc_id"), col("label"))
      val q = TextOps.qualityFiltered(docs, "doc_id", "text")
        .select(col("doc_id"), lit(true).as("q_keep"))
      val flags = docs.select(col("doc_id"), col("lang"))
        .join(keepers, Seq("doc_id"), "left")
        .join(cc, Seq("doc_id"), "left")
        .join(q, Seq("doc_id"), "left")
        .select(
          coalesce(col("exact_keep"), lit(false)).as("f_exact"),
          (col("label").isNull || col("label") === col("doc_id"))
            .as("f_nd"),
          coalesce(col("q_keep"), lit(false)).as("f_q"),
          (col("lang") === "en").as("f_lang"))
      val agg = flags.agg(
        count(lit(1)).as("n0"),
        sum(when(col("f_exact"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("f_exact") && col("f_nd"), 1L).otherwise(0L))
          .as("n2"),
        sum(when(col("f_exact") && col("f_nd") && col("f_q"), 1L)
          .otherwise(0L)).as("n3"),
        sum(when(col("f_exact") && col("f_nd") && col("f_q")
          && col("f_lang"), 1L).otherwise(0L)).as("n4"))
      def st(i: Int, name: String, n: String, prev: String) =
        struct(lit(i.toLong).as("stage_n"), lit(name).as("stage"),
          col(n).as("n_docs"), col(prev).as("n_prev"))
      agg.select(col("n0"), explode(array(
          st(0, "raw", "n0", "n0"),
          st(1, "exact_dedup", "n1", "n0"),
          st(2, "near_dedup", "n2", "n1"),
          st(3, "quality", "n3", "n2"),
          st(4, "lang_en", "n4", "n3"))).as("s"))
        .select(col("s.stage_n").as("stage_n"), col("s.stage").as("stage"),
          col("s.n_docs").as("n_docs"),
          round(col("s.n_docs").cast("double")
            / col("n0").cast("double"), 6).as("pct_of_raw"),
          round(col("s.n_docs").cast("double")
            / col("s.n_prev").cast("double"), 6).as("pct_of_prev"))
        .orderBy("stage_n")
    },

    // source-to-source n-gram leak matrix: directional 5-gram containment
    // C(a→b) = |grams(a) ∩ grams(b)| / |grams(a)| for every ordered
    // source pair — where contamination_check scores train docs against
    // ONE eval split, this is the all-pairs census that finds which FEEDS
    // are copying from each other (syndication, shared scrapers) before
    // any split is drawn. dedup_source_matrix counts doc-level dup pairs;
    // this measures verbatim n-gram mass. Same gram-keyed equi-join
    // shape as contamination_check (never doc × doc); output O(sources²).
    "contamination_source_matrix" -> { (s, d) =>
      // rides the contamination_grams memo (same materialization the
      // check/apply twins pin) and memoizes the per-source distinct —
      // previously this key re-ran the corpus gram explode + distinct
      // THREE times (the size leg + both self-join legs)
      val g = graft.plans.ScopedMemo(s, s"contamination_src_grams#$d")(
        graft.plans.ScopedMemo(s, s"contamination_grams#$d")(
          grams(toks(s, d)).select(col("doc_id"), col("source"),
            col("gram")))
          .select(col("source"), col("gram")).distinct())
      val sz = g.groupBy("source").agg(count(lit(1)).as("n_grams"))
      g.select(col("source").as("source_a"), col("gram"))
        .join(g.select(col("source").as("source_b"), col("gram")), "gram")
        .filter(col("source_a") =!= col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(count(lit(1)).as("n_shared"))
        .join(broadcast(sz.select(col("source").as("source_a"),
          col("n_grams").as("n_a"))), "source_a")
        .select(col("source_a"), col("source_b"), col("n_shared"),
          col("n_a"),
          round(col("n_shared").cast("double")
            / col("n_a").cast("double"), 6).as("containment"))
        .orderBy("source_a", "source_b")
    },

    // per-shard reproducibility manifest: for each of the 32 writer
    // shards, row/token counts, the doc_id span, and an ORDER-INDEPENDENT
    // content checksum (bit_xor of per-doc 60-bit md5 digests over
    // id:text) — the artifact two training runs diff to prove they read
    // identical data without re-hashing the corpus pairwise. XOR is
    // commutative, associative, and mergeable, so the checksum is exactly
    // as partial-agg-proof as a sum and immune to scan order — the only
    // checksum discipline that survives a 1000-task shard writer.
    "train_shard_checksum_manifest" -> { (s, d) =>
      toks(s, d)
        .select(pmod(col("doc_id"), lit(PackShards)).cast("long")
            .as("shard"),
          col("doc_id"), size(col("toks")).cast("long").as("n_tok"),
          expr("CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), " +
            "':', text)), 1, 15), 16, 10) AS BIGINT)").as("h"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("n_tokens"),
          min(col("doc_id")).as("min_doc_id"),
          max(col("doc_id")).as("max_doc_id"),
          expr("bit_xor(h)").as("checksum"))
        .orderBy("shard")
    },

    // multi-epoch data-mixing schedule: given a token budget of 2× the
    // corpus and a sqrt-scaled target mix (the standard multilingual
    // up-weighting of small sources), how many EPOCHS of each source the
    // loader should draw — capped at 4 repeats, the data-constrained
    // scaling rule of thumb past which repetition stops helping. The
    // corpus collapses to O(#sources) token sums in one keyed agg;
    // sqrt weights are rounded to the 1e-9 grid and decimal-summed so
    // the normalizer is partial-agg-order-proof; shares, epochs, and
    // the drawn-token floor are then plain IEEE on already-exact inputs.
    "sample_epoch_schedule" -> { (s, d) =>
      val perSrc = toks(s, d)
        .groupBy("source")
        .agg(sum(size(col("toks")).cast("long")).as("n_tokens"))
        .withColumn("wt", expr(
          "CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 9) AS DECIMAL(20,9))"))
      val tot = perSrc.agg(sum(col("wt")).as("wtot"),
        (sum(col("n_tokens")) * 2L).as("budget"))
      val share = round(col("wt").cast("double")
        / col("wtot").cast("double"), 6)
      perSrc.crossJoin(broadcast(tot))
        .withColumn("target_share", share)
        .select(col("source"), col("n_tokens"), col("target_share"),
          round(least(lit(4.0), col("target_share")
            * col("budget").cast("double")
            / col("n_tokens").cast("double")), 4).as("epochs"),
          floor(least(col("target_share") * col("budget").cast("double"),
            lit(4.0) * col("n_tokens").cast("double"))).cast("long")
            .as("tokens_drawn"))
        .orderBy("source")
    },

    // concat-and-chunk sequence packing: docs are laid end-to-end in
    // doc_id order within a hash shard; each doc records the context
    // window (bin) and offset where it starts. One window shuffle on
    // (shard), prefix-sum per shard — the plan a 1000-writer packer runs,
    // with each writer owning one shard.
    "pack_sequences" -> { (s, d) =>
      val w = Window.partitionBy("shard").orderBy("doc_id")
      toks(s, d)
        .select(col("doc_id"), pmod(col("doc_id"), lit(PackShards))
          .cast("long").as("shard"), size(col("toks")).cast("long")
          .as("n_tok"))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .select(col("doc_id"), col("shard"), col("n_tok"),
          floor((col("cum") - col("n_tok")) / ContextLen).as("bin_id"),
          ((col("cum") - col("n_tok")) % ContextLen).as("bin_offset"))
        .orderBy("doc_id")
    },

    // data-mixture report: the (source, lang) composition table every
    // training run is configured from — doc counts, token sums, and each
    // cell's share of the total token budget. One shuffle to the tiny
    // (source × lang) aggregate; the share is a window over that
    // aggregate, NOT a second corpus scan for the denominator.
    "corpus_mix" -> { (s, d) =>
      toks(s, d)
        .select(col("source"), col("lang"),
          size(col("toks")).cast("long").as("n_tok"))
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .withColumn("token_share",
          round(col("n_tokens").cast("double")
            / sum(col("n_tokens")).over(Window.partitionBy()), 6))
        .orderBy("source", "lang")
    },

    // per-source corpus capping: keep the 10 longest docs per source —
    // the "cap any one source's contribution" sampling step, routed
    // through the native TopKPerKey operator so the shuffle moves at most
    // K rows per (source, partition) instead of every row + a full
    // per-source sort (the window formulation's cost).
    // class-balanced downsampling: cap every language at the minority
    // class size, selecting deterministically by md5-of-id rank (the
    // seedless uniform draw used by sample_hash). The imbalance fix for
    // classifier training sets — sample_stratified keeps proportions,
    // this one EQUALIZES them. One keyed count, a broadcast 1-row cap,
    // and one per-class rank window over (lang)-partitioned rows.
    "sample_balanced_class" -> { (s, d) =>
      val docs = t(s, d, "documents").select(col("doc_id"), col("lang"))
      val nmin = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        .agg(min(col("n")).as("n_min"))
      val w = Window.partitionBy("lang")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      docs.withColumn("rn", row_number().over(w))
        .crossJoin(broadcast(nmin))
        .filter(col("rn") <= col("n_min"))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    },

    "sample_per_source_topk" -> { (s, d) =>
      graft.plans.TopKPerKey.topK(
          corpus(s, d).select(col("doc_id"), col("source"), col("n_chars")),
          Seq(col("source")),
          Seq(col("n_chars").desc, col("doc_id")), 10)
        .orderBy(col("source"), col("n_chars").desc, col("doc_id"))
    },

    // temperature-scaled source mixing (the multilingual/LLM mixture
    // knob): sampling weight per source ∝ n_tokens^α with α = 0.5, which
    // upweights small sources relative to raw proportion. α = 0.5 is
    // computed as sqrt — IEEE-exact and bit-identical across engines,
    // unlike pow — and the weight denominator sums exact decimals over
    // lossless round(·,6) terms so partial-agg merge order cannot move a
    // share. One tiny per-source aggregate + a window over it; the corpus
    // is scanned once.
    "sample_temperature" -> { (s, d) =>
      val perSrc = toks(s, d)
        .select(col("source"), size(col("toks")).cast("long").as("n_tok"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .withColumn("wgt", expr(
          "CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 6) AS DECIMAL(18,6))"))
      val w = Window.partitionBy()
      perSrc
        .withColumn("raw_share", round(col("n_tokens").cast("double")
          / sum(col("n_tokens")).over(w), 6))
        .withColumn("temp_share", round(col("wgt").cast("double")
          / sum(col("wgt")).over(w).cast("double"), 6))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("raw_share"), col("temp_share"),
          round(col("temp_share") / col("raw_share"), 6).as("boost"))
        .orderBy("source")
    },

    // quality-ranked greedy selection under a token budget (keep the best
    // docs until 20% of the corpus tokens are spent) — the curation pass
    // that turns a scored corpus into a fixed-size training slice. The
    // global prefix sum over the score order is computed WITHOUT a
    // single-partition window: docs bucket by a deterministic score bin
    // (n_chars / 64), the in-bin cumsum is a per-bin window, and the
    // cross-bin offset is a window over the TINY per-bin total table —
    // the pack_sequences sharding discipline applied to an ordered scan.
    "corpus_token_budget" -> { (s, d) =>
      val scored = toks(s, d)
        .select(col("doc_id"), col("n_chars").cast("long").as("score"),
          size(col("toks")).cast("long").as("n_tok"),
          floor(col("n_chars") / 64).cast("long").as("bin"))
      val inBin = Window.partitionBy("bin")
        .orderBy(col("score").desc, col("doc_id"))
      val binTot = scored.groupBy("bin")
        .agg(sum(col("n_tok")).as("bin_tok"))
      val offW = Window.orderBy(col("bin").desc)
      val offsets = binTot
        .withColumn("off", coalesce(sum(col("bin_tok")).over(
          offW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("bin").as("bin2"), col("off"))
      val total = toks(s, d)
        .agg(sum(size(col("toks")).cast("long")).as("total_tok"))
      scored
        .withColumn("cum_in_bin", sum(col("n_tok")).over(inBin))
        .join(broadcast(offsets), col("bin") === col("bin2"))
        .crossJoin(broadcast(total))
        .withColumn("cum_tok", col("off") + col("cum_in_bin"))
        .filter(col("cum_tok") <= (col("total_tok") / 5L))
        .select("doc_id", "score", "n_tok", "cum_tok")
        .orderBy(col("score").desc, col("doc_id"))
    },

    // benchmark-contamination scan: eval set = every 7th doc; a train doc
    // is contaminated if it shares any 5-gram with any eval doc. The eval
    // modulus is 7 (not something sparser) so the fixture's planted
    // near-dup groups straddle the split and the check exercises real
    // hits. The join key is the n-gram itself (inverted index) — candidate
    // work is proportional to shared n-grams, never |train| × |eval|.
    // Deliberately NO broadcast hint: this eval side is ~1/7 of the
    // corpus, i.e. corpus-PROPORTIONAL, and a forced broadcast of a side
    // that grows with the input OOMs executors at 100 TB. Unhinted, the
    // planner shuffles both sides on `gram` (linear, scale-safe), and AQE
    // may still elect a broadcast at runtime when the MEASURED size is
    // small — a bounded decision, unlike the hint. (A production check
    // against a fixed benchmark suite — bounded by construction — is
    // where an explicit broadcast belongs; PlanSpec pins the no-hint
    // invariant here.)
    "contamination_check" -> { (s, d) =>
      // one gram explode over the whole corpus, memoized — the train and
      // eval branches are filters over the same materialization instead
      // of two evaluations of the explode+distinct pipeline (ScopedMemo:
      // decontaminate_apply re-reads the same key, and the bare .cache()
      // was an r11 leak)
      val g = graft.plans.ScopedMemo(s, s"contamination_grams#$d")(
        grams(toks(s, d)).select(col("doc_id"), col("source"), col("gram")))
      val evalGrams = g.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id").as("eval_id"), col("gram"))
      g.filter(col("doc_id") % 7 =!= 0)
        .join(evalGrams, "gram")
        .groupBy("doc_id")
        .agg(countDistinct(col("gram")).as("n_shared_grams"),
          countDistinct(col("eval_id")).as("n_eval_docs"))
        .orderBy("doc_id")
    },

    // decontamination EXECUTION twin of contamination_check (the apply
    // discipline compact_apply/vacuum_apply set for the lakehouse
    // planners): the flagged train docs are actually REMOVED — an
    // anti-join-shaped left join on doc_id against the contaminated-id
    // set — and the output is the per-source release audit a training
    // run reads before ingesting the cleaned corpus: docs before /
    // removed / kept, surviving token mass, and the kept share. Same
    // inverted-index join as the check (gram-keyed, never doc × doc);
    // the contaminated-id table is O(flagged docs) and joins on the
    // doc key, so the removal pass is corpus-linear. OperatorSpec pins
    // the semantic invariant: re-running the check on the survivors
    // finds zero contaminated docs.
    "decontaminate_apply" -> { (s, d) =>
      // same ScopedMemo key as contamination_check: the twin re-reads the
      // identical gram materialization instead of re-running the explode
      val g = graft.plans.ScopedMemo(s, s"contamination_grams#$d")(
        grams(toks(s, d)).select(col("doc_id"), col("source"), col("gram")))
      val evalG = g.filter(col("doc_id") % 7 === 0)
        .select(col("gram")).distinct()
      val contaminated = g.filter(col("doc_id") % 7 =!= 0)
        .join(evalG, "gram")
        .select("doc_id").distinct()
        .withColumn("hit", lit(1L))
      toks(s, d).filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"), col("source"),
          size(col("toks")).cast("long").as("n_tok"))
        .join(contaminated, Seq("doc_id"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_train"),
          sum(coalesce(col("hit"), lit(0L))).as("n_removed"),
          sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("hit").isNull, col("n_tok")).otherwise(0L))
            .as("n_tokens_kept"))
        .select(col("source"), col("n_train"), col("n_removed"),
          col("n_kept"),
          col("n_tokens_kept"),
          round(col("n_kept").cast("double")
            / col("n_train").cast("double"), 6).as("kept_share"))
        .orderBy("source")
    },

    // deterministic train/valid/test assignment by content hash — the
    // reproducible-split contract of every training pipeline: membership
    // depends only on the doc's key bytes (md5 prefix, the sample_hash
    // discipline), never on partitioning, seed state, or row order, so
    // the split survives reruns, engine swaps, and corpus growth
    // (existing docs never migrate when new ones arrive). Pure
    // projection — map-only at any corpus size. Hex-prefix cuts: 'e6' =
    // 230/256 ~ 89.8% train, 'f3' leaves ~5.1% each for valid/test.
    "sample_split" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), col("source"),
          substring(md5(col("doc_id").cast("string")), 1, 2).as("b"))
        .withColumn("split",
          when(col("b") < "e6", "train")
            .when(col("b") < "f3", "valid").otherwise("test"))
        .select("doc_id", "source", "split")
        .orderBy("doc_id")),

    // GROUP-level holdout: every doc of a SOURCE lands in the same split
    // (hash the group key, not the doc key) — the leakage-safe split when
    // documents within a source correlate (same site template, same
    // author, near-dup rewrites): a doc-level split leaks sibling docs
    // across train/eval and inflates eval scores, the GroupKFold lesson.
    // Same determinism contract as sample_split (pure function of key
    // bytes); the audit output is the per-split source/doc/char census a
    // pipeline logs to prove the holdout held. Map-only + one tiny agg.
    "sample_group_holdout" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("source"), col("n_chars"),
          substring(md5(col("source")), 1, 1).as("b"))
        .withColumn("split",
          when(col("b") < "c", "train")
            .when(col("b") < "e", "valid").otherwise("test"))
        .groupBy("split")
        .agg(countDistinct(col("source")).as("n_sources"),
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("n_chars"))
        .orderBy("split")),

    // weight-proportional sampling WITHOUT transcendentals — see
    // [[prioritySample]]; shared with the harness-level SampleJob so the
    // operator and the job cannot drift apart
    "sample_priority" -> ((s, d) =>
      prioritySample(t(s, d, "documents"), "doc_id", "n_chars", 100)
        .select(col("doc_id"), col("source"), col("w"), col("priority"))),

    // quality-vs-quantity tradeoff curve: docs binned by their unigram-LM
    // cross-entropy (fixed 0.1-nat bins — data-independent, so two
    // corpus snapshots chart onto the same axis), cumulated best-first —
    // the table that answers "keep the top X% by quality: how many
    // tokens survive?" before anyone trains. The corpus collapses to
    // O(#bins) in the doc-NLL pass (shared wordCounts memo); the
    // cumulative window runs over those bins only.
    "corpus_quality_tradeoff" -> { (s, d) =>
      val tf = t(s, d, "documents")
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), " ")).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val lm = TextOps.wordCounts(s, d)
      val tot = lm.agg(sum(col("cnt")).as("n_corpus"),
        count(lit(1)).as("vocab"))
      val nll = tf.join(lm, "word")
        .crossJoin(broadcast(tot))
        .withColumn("nll", expr(
          """CAST(round(tf * -ln(CAST(cnt + 1 AS DOUBLE)
            |  / (n_corpus + vocab)), 9) AS DECIMAL(20,9))""".stripMargin))
        .groupBy("doc_id")
        .agg(sum(col("tf")).as("n_toks"),
          round(sum(col("nll")).cast("double") / sum(col("tf")), 6)
            .as("avg_nll"))
      val bins = nll
        .withColumn("bin", floor(col("avg_nll") * 10d).cast("long"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      val w = org.apache.spark.sql.expressions.Window.orderBy("bin")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      val total = bins.agg(sum(col("n_tokens")).as("t_all"))
      bins
        .withColumn("cum_docs", sum(col("n_docs")).over(w))
        .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .crossJoin(broadcast(total))
        .select(col("bin"), col("n_docs"), col("n_tokens"),
          col("cum_docs"), col("cum_tokens"),
          round(col("cum_tokens").cast("double")
            / col("t_all").cast("double"), 6).as("cum_token_share"))
        .orderBy("bin")
    },

    // importance resampling toward a UNIFORM length-bin target (the
    // DSIR shape: reweight the proposal corpus so a feature marginal
    // matches a target, then keep each doc with probability ∝ its bin's
    // importance weight). Weights w_b = N/(B·n_b) come from one
    // O(#bins) aggregate; the keep decision is a per-row deterministic
    // 60-bit md5 draw against α·w_b — reproducible across engines,
    // reruns, and partitionings, the sample_hash discipline. Output is
    // the O(#bins) audit table (weight, kept share, target share) a
    // pipeline logs to prove the resample moved the marginal. Scale:
    // one corpus-linear projection + two bin-keyed aggregates.
    "sample_importance_resample" -> { (s, d) =>
      val alpha = 0.5
      val binned = t(s, d, "documents")
        .select(col("doc_id"),
          floor(col("n_chars") / lit(64)).cast("long").as("bin"),
          (expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, " +
            "15), 16, 10) AS BIGINT)").cast("double")
            / lit(1152921504606846976.0d)).as("u"))
      val bins = binned.groupBy("bin").agg(count(lit(1)).as("n_docs"))
      val tot = bins.agg(sum(col("n_docs")).as("n_total"),
        count(lit(1)).as("n_bins"))
      val weighted = bins.crossJoin(broadcast(tot))
        .withColumn("w", col("n_total").cast("double")
          / (col("n_bins").cast("double") * col("n_docs").cast("double")))
        .withColumn("p_keep", least(lit(1.0), lit(alpha) * col("w")))
      binned.join(broadcast(weighted.select("bin", "w", "p_keep")), "bin")
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("u") < col("p_keep"), 1L).otherwise(0L))
            .as("n_kept"),
          min(col("w")).as("wmin"), min(col("p_keep")).as("pmin"))
        .crossJoin(broadcast(tot.select(col("n_bins"))))
        .select(col("bin"), col("n_docs"), col("n_kept"),
          round(col("wmin"), 6).as("weight"),
          round(col("pmin"), 6).as("p_keep"),
          round(col("n_kept").cast("double")
            / col("n_docs").cast("double"), 6).as("kept_share"),
          round(lit(1.0) / col("n_bins").cast("double"), 6)
            .as("target_share"))
        .orderBy("bin")
    },

    // one BPE training iteration: adjacent-symbol pair counts at the
    // character level, weighted by corpus word frequency — the inner loop
    // of byte-pair-encoding tokenizer training (count pairs, merge the
    // top pair, repeat). Two keyed aggregates: corpus -> (word, freq),
    // where the map-side combine collapses the corpus to its vocabulary
    // before anything shuffles, then word -> adjacent char pairs exploded
    // WITH multiplicity ("aaa" votes "aa" twice) and freq-weighted. The
    // top-50 window runs over the PAIR vocabulary — bounded by alphabet²,
    // never corpus-sized — so the global window is O(1k) rows at any SF.
    "tokenizer_bpe_pairs" -> { (s, d) =>
      val wf = toks(s, d)
        .select(explode(col("toks")).as("w"))
        .filter(length(col("w")) >= 2)
        .groupBy("w").agg(count(lit(1)).as("wf"))
      val w50 = Window.orderBy(col("n_occ").desc, col("pair"))
      wf.select(col("wf"), explode(expr(
            "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
        .groupBy("pair").agg(sum(col("wf")).as("n_occ"))
        .withColumn("rnk", row_number().over(w50).cast("long"))
        .filter(col("rnk") <= 50)
        .select("rnk", "pair", "n_occ")
        .orderBy("rnk")
    },

    // SentencePiece-style unigram seed vocabulary: every substring of
    // length 2..4 of every vocabulary word, scored freq × len (the
    // standard seed heuristic — long, frequent pieces are the ones the
    // unigram-LM EM prune will keep), top-32 with the piece tiebreak.
    // Like tokenizer_bpe_pairs the corpus collapses to the word-
    // frequency table FIRST, so the substring explode runs over the
    // vocabulary (Zipf-small at any corpus size), never the corpus; the
    // rank window is over the piece table (vocab-bounded, allowlisted).
    "tokenizer_unigram_seed" -> { (s, d) =>
      val wf = toks(s, d)
        .select(explode(col("toks")).as("w"))
        .filter(length(col("w")) >= 2)
        .groupBy("w").agg(count(lit(1)).as("wf"))
      val wr = Window.orderBy(col("score").desc, col("piece"))
      wf.select(col("wf"), explode(expr(
          """flatten(transform(sequence(2, 4), l ->
            |  CASE WHEN length(w) >= l THEN
            |    transform(sequence(1, length(w) - l + 1),
            |      i -> substring(w, i, l))
            |  ELSE array() END))""".stripMargin)).as("piece"))
        .groupBy("piece").agg(sum(col("wf")).as("cnt"))
        .withColumn("piece_len", length(col("piece")).cast("long"))
        .withColumn("score", col("cnt") * col("piece_len"))
        .withColumn("rnk", row_number().over(wr).cast("long"))
        .filter(col("rnk") <= 32)
        .select("rnk", "piece", "cnt", "piece_len", "score")
        .orderBy("rnk")
    },

    // the SECOND BPE iteration: apply the winning merge from
    // tokenizer_bpe_pairs and recount adjacent-symbol pairs over the
    // merged sequences — the loop body tokenizer training repeats 30k
    // times. Words become double-spaced symbol strings (" a  b  c "):
    // each merge match consumes one boundary space per side, so BACK-TO-
    // BACK occurrences still match (single-space joining misses every
    // second one — the classic greedy-replace bug) while multi-char
    // symbols can never false-match across boundaries. The merge itself
    // is ONE broadcast of the 1-row winner + a map-only replace; both
    // keyed aggregates collapse to vocabulary size before shuffling.
    "tokenizer_bpe_merge" -> { (s, d) =>
      val wf = graft.plans.ScopedMemo(s, s"bpe_merge_wf#$d")(
        toks(s, d)
          .select(explode(col("toks")).as("w"))
          .filter(length(col("w")) >= 2)
          .groupBy("w").agg(count(lit(1)).as("wf")))
      val top = wf.select(col("wf"), explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("mpair"))
        .groupBy("mpair").agg(sum(col("wf")).as("n_occ"))
        .orderBy(col("n_occ").desc, col("mpair")).limit(1)
        .select(col("mpair"))
      val w20 = Window.orderBy(col("n_occ").desc, col("pair"))
      wf.crossJoin(broadcast(top))
        .withColumn("seq2", expr(
          """replace(
            |  ' ' || array_join(transform(sequence(1, length(w)),
            |    i -> substring(w, i, 1)), '  ') || ' ',
            |  ' ' || substring(mpair, 1, 1) || '  '
            |    || substring(mpair, 2, 1) || ' ',
            |  ' ' || mpair || ' ')""".stripMargin))
        .withColumn("syms", expr("filter(split(seq2, ' '), x -> x != '')"))
        .filter(expr("size(syms) >= 2"))
        .select(col("wf"), explode(expr(
          """transform(sequence(1, size(syms) - 1),
            |  i -> concat(element_at(syms, i), ' ',
            |    element_at(syms, i + 1)))""".stripMargin)).as("pair"))
        .groupBy("pair").agg(sum(col("wf")).as("n_occ"))
        .withColumn("rnk", row_number().over(w20).cast("long"))
        .filter(col("rnk") <= 20)
        .select("rnk", "pair", "n_occ")
        .orderBy("rnk")
    },

    // the BPE training LOOP, four iterations deep: count adjacent-symbol
    // pairs on the current segmentation, pick the top pair (count desc,
    // pair tiebreak), apply the merge, repeat — the body tokenizer
    // training runs 30k times, here unrolled to a fixed N the oracle can
    // mirror CTE-for-CTE (the sql_recursive discipline). State lives in
    // the word-frequency table (vocabulary-sized at any corpus scale —
    // the corpus collapses FIRST, so each iteration's pair count and
    // merge are O(vocab), never O(corpus)); each iteration's segmentation
    // is pinned through ScopedMemo so iteration k's plan reads
    // materialized state instead of replaying iterations 1..k-1 (the
    // sample_kcenter lesson — lazy recursion re-evaluates quadratically).
    // The double-spaced merge trick is tokenizer_bpe_merge's; symbols are
    // multi-char from iteration 2 on, which is why pairs carry an
    // explicit ' ' separator. Output per iteration: the merge learned,
    // its support, and the corpus token count after applying it — the
    // compression trajectory a tokenizer team actually reads. All
    // integers; no FP anywhere.
    "tokenizer_bpe_apply" -> { (s, d) =>
      val s0 = graft.plans.ScopedMemo(s, s"bpe_apply_s0#$d")(
        toks(s, d)
          .select(explode(col("toks")).as("w"))
          .filter(length(col("w")) >= 2)
          .groupBy("w").agg(count(lit(1)).as("wf"))
          .select(col("wf"), expr(
            """' ' || array_join(transform(sequence(1, length(w)),
              |  i -> substring(w, i, 1)), '  ') || ' '""".stripMargin)
            .as("seq")))
      val (_, rows) = (1 to 4).foldLeft((s0, Seq.empty[DataFrame])) {
        case ((seqs, acc), it) =>
          val pairsAgg = seqs
            .withColumn("syms",
              expr("filter(split(seq, ' '), x -> x != '')"))
            .filter(expr("size(syms) >= 2"))
            .select(col("wf"), explode(expr(
              """transform(sequence(1, size(syms) - 1),
                |  i -> concat(element_at(syms, i), ' ',
                |    element_at(syms, i + 1)))""".stripMargin)).as("pair"))
            .groupBy("pair").agg(sum(col("wf")).as("n_occ"))
          val top = pairsAgg
            .orderBy(col("n_occ").desc, col("pair")).limit(1)
          val merged = graft.plans.ScopedMemo(s, s"bpe_apply_s$it#$d")(
            seqs.crossJoin(broadcast(top.select(col("pair").as("mp"))))
              .withColumn("seq", expr(
                """replace(seq,
                  |  ' ' || element_at(split(mp, ' '), 1) || '  '
                  |    || element_at(split(mp, ' '), 2) || ' ',
                  |  ' ' || concat(element_at(split(mp, ' '), 1),
                  |    element_at(split(mp, ' '), 2)) || ' ')"""
                  .stripMargin))
              .select("wf", "seq"))
          val row = top.crossJoin(merged
              .select((col("wf") * expr(
                "size(filter(split(seq, ' '), x -> x != ''))")).as("ns"))
              .agg(sum(col("ns")).cast("long").as("n_symbols_after")))
            .select(lit(it.toLong).as("iter"),
              col("pair").as("merged_pair"), col("n_occ"),
              col("n_symbols_after"))
          (merged, acc :+ row)
      }
      rows.reduce(_ unionByName _).orderBy("iter")
    },

    // soft dedup: instead of deleting near-duplicates, weight each doc
    // 1/cluster_size so every near-dup CLUSTER contributes one unit of
    // training signal (the "count once" alternative when deletion is too
    // aggressive — e.g. templated-but-distinct pages). Rides the
    // memoized connected-component label table; unlabeled docs keep
    // weight 1. One dim-sized join; output is corpus-rows of
    // (id, size, weight).
    "sample_dedup_weight" -> { (s, d) =>
      val labels = Dedup.connectedLabels(s, d)
      val csize = labels.groupBy("label").agg(count(lit(1)).as("csize"))
      t(s, d, "documents").select(col("doc_id"))
        .join(labels.join(csize, "label")
          .select(col("id").as("doc_id"), col("csize")),
          Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("csize"), lit(1L)).as("cluster_size"),
          round(lit(1.0) / coalesce(col("csize"), lit(1L)), 6)
            .as("weight"))
        .orderBy("doc_id")
    },

    // paired-modality training manifest (the CLIP-style caption↔vector
    // set): align documents to their embeddings on id, gate on language,
    // caption length, and embedding normalization (norm² within 2% of
    // 1 — an unnormalized vector poisons cosine training), and assign a
    // deterministic ~87.5/12.5 hash split. The id equi-join is the
    // co-partitionable kind (both sides keyed by the same id space — at
    // 100 TB this is a bucketed join with zero shuffle); the norm² gate
    // is an exact decimal comparison on round-9 per-dim squares, never a
    // float epsilon.
    "train_pair_manifest" -> { (s, d) =>
      val n2 = t(s, d, "embeddings")
        .select(col("vec_id"), explode(expr(
          "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) " +
            "* CAST(x AS DOUBLE), 9) AS DECIMAL(20,9)))")).as("sq"))
        .groupBy("vec_id").agg(sum(col("sq")).as("norm2"))
      t(s, d, "documents")
        .join(n2, col("doc_id") === col("vec_id"))
        .filter(col("lang") === "en"
          && col("n_chars").between(100, 500)
          && col("norm2") >= expr("CAST(0.98 AS DECIMAL(20,9))")
          && col("norm2") <= expr("CAST(1.02 AS DECIMAL(20,9))"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          round(col("norm2").cast("double"), 6).as("norm2"),
          when(substring(md5(col("doc_id").cast("string")), 1, 1) < "e",
            lit("train")).otherwise(lit("val")).as("split"))
        .orderBy("doc_id")
    },

    // m-estimate target encoding: p_brand -> smoothed mean l_quantity —
    // the high-cardinality-categorical feature every tabular model wants
    // in place of a million-column one-hot. The smoothing pulls a rare
    // brand toward the global prior (n=3 of quantity 50 should NOT
    // encode as 50), with m=50 virtual prior rows. One broadcast dim
    // join + one keyed agg collapses the fact table to O(|brands|);
    // sums fold through exact DECIMAL so partial aggregation cannot
    // reorder IEEE adds; the prior and the encode are closed fixed-order
    // formulas over those exact totals, mirrored textually.
    "feature_target_encoding" -> { (s, d) =>
      val per = t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"), sum(money(col("l_quantity"))).as("sy"))
      val g = per.agg(sum(col("n")).as("gn"), sum(col("sy")).as("gsy"))
      per.crossJoin(broadcast(g))
        .select(col("p_brand"), col("n"),
          expr("round(CAST(sy AS DOUBLE) / n, 6)").as("raw_mean"),
          expr("""round((CAST(sy AS DOUBLE)
            |  + 50 * (CAST(gsy AS DOUBLE) / gn)) / (n + 50), 6)"""
            .stripMargin).as("enc"))
        .orderBy("p_brand")
    },

    // K-fold OUT-OF-FOLD target encoding — the leakage-free variant a
    // pipeline must use for the TRAINING rows themselves (encoding a
    // row with statistics that include its own target leaks the label;
    // the sample_group_holdout lesson applied to features). Fold
    // assignment is a pure md5 function of the order key (reproducible,
    // partition-independent); each (brand, fold) cell is encoded from
    // the OTHER folds only: (Σy − Σy_fold + m·prior)/(n − n_fold + m),
    // all from ONE keyed agg plus a brand-partitioned window — the fact
    // table is never re-scanned per fold. Output O(|brands|·K).
    "feature_target_crossfit" -> { (s, d) =>
      val rows = t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .withColumn("fold", expr(
          "CAST(conv(substring(md5(CAST(l_orderkey AS STRING)), 1, 4)," +
            " 16, 10) AS BIGINT) % 5"))
      val pf = rows.groupBy("p_brand", "fold")
        .agg(count(lit(1)).as("n"), sum(money(col("l_quantity"))).as("sy"))
      val g = pf.agg(sum(col("n")).as("gn"), sum(col("sy")).as("gsy"))
      val wB = Window.partitionBy("p_brand")
      pf.withColumn("n_all", sum(col("n")).over(wB))
        .withColumn("sy_all", sum(col("sy")).over(wB))
        .crossJoin(broadcast(g))
        .select(col("p_brand"), col("fold"), col("n").as("n_fold"),
          expr("""round((CAST(sy_all AS DOUBLE) - CAST(sy AS DOUBLE)
            |  + 50 * (CAST(gsy AS DOUBLE) / gn))
            |  / (n_all - n + 50), 6)""".stripMargin).as("enc_oof"))
        .orderBy("p_brand", "fold")
    },

    // weight-of-evidence binning + information value: o_totalprice vs
    // the urgent/high-priority target — the credit-scoring-style
    // monotonic-risk audit for a numeric feature. Ten equal-width bins
    // over [lo, hi] (bounds from one O(1) agg, broadcast — no global
    // sort, no ntile window over the corpus); per-bin (pos, neg) are
    // exact integers from one keyed agg; WOE = ln of the Laplace-
    // smoothed share ratio and the IV term are closed fixed-order IEEE
    // formulas over those integers, mirrored textually. Per-bin rows
    // out, so no cross-bin double summation exists to drift.
    "feature_woe_iv" -> { (s, d) =>
      val o = t(s, d, "orders")
        .select(money(col("o_totalprice")).as("tp"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L).as("pos"))
      val b = o.agg(min(col("tp")).as("lo"), max(col("tp")).as("hi"))
      val per = o.crossJoin(broadcast(b))
        .withColumn("bin", when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(floor(expr(
            "CAST(tp - lo AS DOUBLE) * 10 / CAST(hi - lo AS DOUBLE)"))
            .cast("long"), lit(9L))))
        .groupBy("bin")
        .agg(sum(col("pos")).as("n_pos"),
          sum(lit(1L) - col("pos")).as("n_neg"))
      val tot = per.agg(sum(col("n_pos")).as("tp_tot"),
        sum(col("n_neg")).as("tn_tot"))
      // explicit DOUBLE smoothing arithmetic: a bare `+ 0.5` makes Spark
      // run the whole chain in DECIMAL with quotient-scale rounding while
      // DuckDB computes IEEE doubles — at sf0.01 bin 0's woe lands on the
      // 1e-6 half boundary and the two conventions round apart (the one
      // CORRECTNESS flake of r13a). Identical double inputs feed ln on
      // both sides instead.
      per.crossJoin(broadcast(tot))
        .withColumn("ps",
          expr("(CAST(n_pos AS DOUBLE) + 0.5) / CAST(tp_tot AS DOUBLE)"))
        .withColumn("ns",
          expr("(CAST(n_neg AS DOUBLE) + 0.5) / CAST(tn_tot AS DOUBLE)"))
        .select(col("bin"), col("n_pos"), col("n_neg"),
          expr("round(ln(ps / ns), 6)").as("woe"),
          expr("round((ps - ns) * ln(ps / ns), 6)").as("iv_term"))
        .orderBy("bin")
    },

    // k-anonymity audit over the quasi-identifier tuple (lang, source,
    // n_chars bucket): the re-identification gate run before a corpus
    // with user-adjacent metadata ships — any QI class smaller than k=5
    // means those docs are singled out by attributes alone. The corpus
    // collapses to O(|QI classes|) in one keyed agg; the verdict row is
    // a second O(1) agg. Census-style output: class count, worst class
    // size, violating classes, and docs at risk.
    "privacy_k_anonymity" -> { (s, d) =>
      t(s, d, "documents")
        .groupBy(col("lang"), col("source"),
          expr("CAST(floor(n_chars / 1000.0) AS BIGINT)").as("size_bucket"))
        .agg(count(lit(1)).as("k"))
        .agg(count(lit(1)).as("n_classes"), min(col("k")).as("min_k"),
          sum(when(col("k") < 5, 1L).otherwise(0L)).as("n_violating"),
          sum(when(col("k") < 5, col("k")).otherwise(0L))
            .as("docs_at_risk"))
    },

    // l-diversity audit: within each (source, size-bucket) QI class,
    // how many DISTINCT values of the sensitive attribute (lang)
    // appear — k-anonymity's complement (a class of 1000 docs that are
    // all the same language still discloses the language; diversity
    // < 2 means the sensitive value is fully determined by the QI).
    // One exact count-distinct per class (the agg_distinct expand),
    // then an O(1) verdict agg.
    "privacy_l_diversity" -> { (s, d) =>
      t(s, d, "documents")
        .groupBy(col("source"),
          expr("CAST(floor(n_chars / 1000.0) AS BIGINT)").as("size_bucket"))
        .agg(countDistinct(col("lang")).as("l"), count(lit(1)).as("k"))
        .agg(count(lit(1)).as("n_classes"), min(col("l")).as("min_l"),
          sum(when(col("l") < 2, 1L).otherwise(0L)).as("n_low_diversity"),
          sum(when(col("l") < 2, col("k")).otherwise(0L))
            .as("docs_exposed"))
    },

    // token-balanced shard assignment: docs rank by size (desc) inside
    // PackShards independent hash buckets and snake across BalanceShards
    // output shards (block 0 deals 0..7, block 1 deals 7..0, ...) — the
    // deterministic distributed form of longest-processing-time
    // scheduling. Each bucket is an independent worker (the
    // pack_sequences discipline: no global-order single-partition
    // window ever exists), and snaking cancels the within-block size
    // gradient plain round-robin accumulates. Output is the per-shard
    // audit (docs, tokens, skew vs the perfect-balance mean) a writer
    // fleet is sized from.
    "shard_balance" -> { (s, d) =>
      val w = Window.partitionBy("bucket")
        .orderBy(col("n_tok").desc, col("doc_id"))
      val assigned = toks(s, d)
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_tok"),
          pmod(col("doc_id"), lit(PackShards)).cast("long").as("bucket"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("pos", (col("rn") - 1) % BalanceShards)
        .withColumn("shard",
          when(expr(s"((rn - 1) DIV $BalanceShards) % 2 = 0"), col("pos"))
            .otherwise(lit(BalanceShards.toLong - 1) - col("pos")))
      assigned.groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .withColumn("skew", round(col("n_tokens").cast("double")
          / (sum(col("n_tokens")).over(Window.partitionBy())
              .cast("double") / BalanceShards), 6))
        .orderBy("shard")
    },

    // curriculum schedule: docs order easy-to-hard by type-token ratio
    // (repetitive text first, lexically diverse text last) inside
    // PackShards independent buckets — each data-loader worker orders
    // its own shard, the distributed form of curriculum sampling — and
    // rank maps to 4 phases by explicit integer proration, never NTILE
    // (whose remainder distribution is implementation lore; the
    // (rn-1)*4 DIV n formula is the same integer on every engine).
    // Ranking happens on the ALREADY-rounded score so both engines
    // compare identical doubles, doc_id breaking ties.
    "curriculum_order" -> { (s, d) =>
      val docs = toks(s, d)
        .select(col("doc_id"),
          pmod(col("doc_id"), lit(PackShards)).cast("long").as("bucket"),
          round(expr("size(array_distinct(toks))").cast("double")
            / size(col("toks")), 6).as("score"))
      val w = Window.partitionBy("bucket")
        .orderBy(col("score"), col("doc_id"))
      docs
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n_bucket",
          count(lit(1)).over(Window.partitionBy("bucket")).cast("long"))
        .withColumn("phase",
          (expr("(rn - 1) * 4 DIV n_bucket") + 1).cast("long"))
        .select("doc_id", "bucket", "score", "rn", "phase")
        .orderBy("doc_id")
    },

    // sequence-length planning table: docs bucketed by power-of-two token
    // length, with the token loss a 512-token context truncation would
    // cost per bucket — the histogram batch-assembly reads before picking
    // context/packing strategy (pack_sequences' sibling). ONE hash
    // aggregate with map-side combine; output is O(log max_len) rows.
    "seq_len_histogram" -> { (s, d) =>
      val docs = toks(s, d)
        .select(col("doc_id"), size(col("toks")).cast("long").as("n_tok"))
      // bucket = smallest power of two >= n_tok, as a generated integer
      // CASE chain — log2/pow would round-trip through each engine's
      // libm, whose last-ulp behavior is not cross-engine stable
      val bucket = (0 to 20).foldRight(lit(1L << 21): Column) { (k, rest) =>
        when(col("n_tok") <= (1L << k), lit(1L << k)).otherwise(rest)
      }
      docs
        .withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tokens"),
          sum(greatest(col("n_tok") - 512L, lit(0L)))
            .as("tokens_lost_at_512"))
        .orderBy("bucket")
    },

    // corpus-mix concentration: Gini coefficient over per-source token
    // shares — one number for "how skewed is the mix" next to
    // corpus_mix's weights (0 = perfectly even sources, →1 = one source
    // dominates). The corpus collapses to O(#sources) token counts
    // first; the rank window and the Gini fold run over that tiny table.
    // Σ rank·tokens in exact decimal; only the final ratio is IEEE.
    "corpus_gini" -> { (s, d) =>
      val src = toks(s, d)
        .groupBy("source")
        .agg(sum(size(col("toks")).cast("long")).as("tok"))
      val w = Window.orderBy(col("tok"), col("source"))
      val ranked = src.withColumn("i", row_number().over(w).cast("long"))
      ranked
        .agg(count(lit(1)).as("n_sources"),
          sum(col("tok")).as("total_tokens"),
          sum(expr("CAST(i AS DECIMAL(19,0)) * CAST(tok AS DECIMAL(19,0))"))
            .cast("double").as("iw"))
        .select(col("n_sources"), col("total_tokens"),
          round((lit(2.0) * col("iw"))
            / (col("n_sources").cast("double")
              * col("total_tokens").cast("double"))
            - (col("n_sources") + 1L).cast("double")
              / col("n_sources").cast("double"), 6).as("gini"))
    },

    // proportional stratified allocation: a 100-doc sample where each
    // source's quota is round(K·n_src/N) (floored at 1 so tail sources
    // stay represented — the balancing lever between `sample_stratified`'s
    // fixed-k and raw proportional draws that zero out small strata).
    // Draw order inside a stratum is the content-hash rank (rerun/
    // engine/partitioning-stable, the sample_split discipline). One
    // source-keyed window + two O(#sources) broadcast tables.
    "sample_proportional" -> { (s, d) =>
      val k = 100
      val docs = t(s, d, "documents")
      val counts = docs.groupBy("source").agg(count(lit(1)).as("n_src"))
      val total = docs.agg(count(lit(1)).as("n_total"))
      val alloc = counts.crossJoin(broadcast(total))
        .select(col("source"), col("n_src"),
          greatest(lit(1L),
            round(lit(k) * col("n_src").cast("double") / col("n_total"))
              .cast("long")).as("k_src"))
      val w = Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      docs
        .withColumn("rn", row_number().over(w).cast("long"))
        .join(broadcast(alloc), "source")
        .filter(col("rn") <= col("k_src"))
        .select("source", "rn", "doc_id", "n_src", "k_src")
        .orderBy("source", "rn")
    },

    // systematic (stride) sampling: every 50th row of the corpus in a
    // deterministic hash order — the sampling design that guarantees
    // EXACT even spacing and exact ⌈N/50⌉ size (Bernoulli samplers like
    // sample_hash only hit the rate in expectation). The global index is
    // built the distributed-zipWithIndex way, NOT with a single global
    // row_number window (that plan funnels the corpus through ONE
    // partition): per-bucket ranks run in parallel over 256 hash-prefix
    // buckets, the O(256) bucket-offset table rides one tiny window and
    // broadcasts back, and global position = bucket offset + local rank.
    // The hash order makes bucket order == global order by construction,
    // and the oracle states the SAME result as one global row_number —
    // an independent formulation checking the offset arithmetic.
    "sample_systematic" -> { (s, d) =>
      val stride = 50
      val hashed = t(s, d, "documents")
        .select(col("doc_id"),
          md5(concat(lit("sys:"), col("doc_id").cast("string")))
            .as("hk"))
        .withColumn("bucket", substring(col("hk"), 1, 2))
      val offsets = hashed.groupBy("bucket")
        .agg(count(lit(1)).as("n_bucket"))
        .withColumn("offset",
          coalesce(sum(col("n_bucket")).over(
            Window.orderBy("bucket")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("bucket", "offset")
      val wb = Window.partitionBy("bucket").orderBy("hk", "doc_id")
      hashed
        .withColumn("lrn", row_number().over(wb).cast("long"))
        .join(broadcast(offsets), "bucket")
        .withColumn("pos", col("offset") + col("lrn"))
        .filter((col("pos") - 1) % stride === 0)
        .select(col("pos"), col("doc_id"), col("hk"))
        .orderBy("pos")
    },

    // leakage-safe temporal split: train before the cutoff, test after a
    // 30-day embargo gap, the gap itself quarantined — the time-series
    // holdout design that prevents look-ahead leakage (a gapless split
    // leaks label-window information across the boundary). Reports per
    // split the volume, span, revenue, AND the entity-leakage count
    // (customers also present in train): entity overlap across a
    // temporal split is expected but must be MEASURED before anyone
    // reads the eval as out-of-distribution. The split is a map-side
    // projection; the leakage column is one semi-join against the
    // distinct train-customer dim (broadcast at any corpus scale —
    // customers ≪ orders).
    "sample_time_stratified" -> { (s, d) =>
      val o = t(s, d, "orders")
        .withColumn("day", to_date(col("o_orderdate")))
        .withColumn("split",
          when(col("day") < lit("1997-10-01").cast("date"), "train")
            .when(col("day") >= lit("1997-10-31").cast("date"), "test")
            .otherwise("embargo"))
      val trainCust = o.filter(col("split") === "train")
        .select(col("o_custkey").as("tc")).distinct()
      o.groupBy("split")
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_customers"),
          min(col("day")).as("first_day"),
          max(col("day")).as("last_day"),
          moneySum(col("o_totalprice")).as("revenue"))
        .join(
          o.select("split", "o_custkey").distinct()
            .join(broadcast(trainCust), col("o_custkey") === col("tc"),
              "left_semi")
            .groupBy("split").agg(count(lit(1)).as("n_seen_in_train")),
          Seq("split"), "left")
        .select(col("split"), col("n_orders"), col("n_customers"),
          col("first_day"), col("last_day"), col("revenue"),
          coalesce(col("n_seen_in_train"), lit(0L)).as("n_seen_in_train"))
        .orderBy("split")
    }
  )

  /** Duffield-Lund-Thorup priority sampling: each row draws a
    * deterministic uniform u from the md5 of its id (first 8 hex chars ->
    * 32-bit int; the sample_hash discipline — reproducible across
    * engines, reruns, and partitionings) and gets priority w/u; the k
    * largest priorities are the sample, heavier rows proportionally
    * likelier. Exponential-key reservoir (Efraimidis-Spirakis, u^(1/w))
    * needs pow/ln, which are NOT correctly-rounded and can differ between
    * engines' libm by an ulp — priority sampling's single division IS
    * IEEE-exact on both sides, so the drawn set hash-matches
    * bit-for-bit. Top-k goes through TakeOrderedAndProject (bounded
    * per-partition heaps), never a global sort: at 100 TB this is a
    * map-only score + a k-row-per-partition reduction.
    */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame =
    df
      .withColumn("w", greatest(col(weightCol).cast("long"), lit(1L)))
      .withColumn("u",
        conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
          .cast("long") + 1L)
      // w/u scaled so priorities are O(1). Arithmetic is DOUBLE end-to-end
      // on BOTH engines (the oracle mirrors this order): w -> double is the
      // only rounding (exact for w < 2^53), x * 2^32 is a pure exponent
      // shift (always exact), u * 1000 is an exact integer-valued double
      // (< 2^42), and the single division is IEEE-correctly-rounded — so
      // priorities hash-match for ANY long weight, with no integer-overflow
      // path anywhere (a BIGINT-side product would raise at w >= 2^31).
      .withColumn("priority",
        round(col("w").cast("double") * 4294967296d
          / (col("u").cast("double") * 1000d), 6))
      .drop("u")
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)

  def oracle: Map[String, String] = Map(
    // same doc-NLL kernel as text_perplexity_buckets; fixed 0.1-nat bins
    "corpus_quality_tradeoff" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(string_split(lower(trim(text)), ' ')) AS word
        |  FROM documents),
        |tf AS (SELECT doc_id, word, count(*) AS tf FROM tk GROUP BY 1, 2),
        |lm AS (SELECT word, count(*) AS cnt FROM tk GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_corpus,
        |  count(*) AS vocab FROM lm),
        |terms AS (
        |  SELECT tf.doc_id, tf.tf,
        |    CAST(round(tf.tf * -ln(CAST(lm.cnt + 1 AS DOUBLE)
        |      / (tot.n_corpus + tot.vocab)), 9) AS DECIMAL(20,9)) AS nll
        |  FROM tf JOIN lm USING (word) CROSS JOIN tot),
        |nll AS (
        |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_toks,
        |    round(CAST(sum(nll) AS DOUBLE) / sum(tf), 6) AS avg_nll
        |  FROM terms GROUP BY doc_id),
        |bins AS (
        |  SELECT CAST(floor(avg_nll * 10) AS BIGINT) AS bin,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_toks) AS BIGINT) AS n_tokens
        |  FROM nll GROUP BY 1),
        |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t_all FROM bins)
        |SELECT bin, n_docs, n_tokens,
        |  CAST(sum(n_docs) OVER (ORDER BY bin
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_docs,
        |  CAST(sum(n_tokens) OVER (ORDER BY bin
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_tokens,
        |  round(CAST(sum(n_tokens) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS DOUBLE) / CAST((SELECT t_all FROM t) AS DOUBLE), 6)
        |    AS cum_token_share
        |FROM bins ORDER BY bin""".stripMargin,

    // same bin weights and the same 60-bit md5 draw (u < alpha * w)
    "sample_importance_resample" ->
      """WITH binned AS (
        |  SELECT doc_id,
        |    CAST(floor(n_chars / 64.0) AS BIGINT) AS bin,
        |    CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
        |      1, 15)) AS BIGINT) AS DOUBLE)
        |      / 1152921504606846976.0 AS u
        |  FROM documents),
        |bins AS (
        |  SELECT bin, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM binned GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
        |  CAST(count(*) AS BIGINT) AS n_bins FROM bins),
        |wt AS (
        |  SELECT bin,
        |    CAST(n_total AS DOUBLE)
        |      / (CAST(n_bins AS DOUBLE) * CAST(n_docs AS DOUBLE)) AS w,
        |    least(CAST(1.0 AS DOUBLE),
        |      0.5 * CAST(n_total AS DOUBLE)
        |        / (CAST(n_bins AS DOUBLE) * CAST(n_docs AS DOUBLE)))
        |      AS p_keep
        |  FROM bins CROSS JOIN tot)
        |SELECT b.bin, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN b.u < wt.p_keep THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_kept,
        |  round(min(wt.w), 6) AS weight,
        |  round(min(wt.p_keep), 6) AS p_keep,
        |  round(CAST(sum(CASE WHEN b.u < wt.p_keep THEN 1 ELSE 0 END)
        |      AS DOUBLE) / count(*), 6) AS kept_share,
        |  round(1.0 / CAST((SELECT n_bins FROM tot) AS DOUBLE), 6)
        |    AS target_share
        |FROM binned b JOIN wt ON wt.bin = b.bin
        |GROUP BY b.bin ORDER BY b.bin""".stripMargin,

    // every stage twin is the owning operator's own oracle logic: the
    // exact-dedup fingerprint GROUP BY, the recursive-CTE connected
    // components over the shared jaccard chain, the quality thresholds,
    // and the lang equality — chained as per-doc flags, folded once,
    // unpacked into the 5 funnel rows
    "corpus_pipeline_funnel" ->
      s"""WITH RECURSIVE ${Dedup.jaccardCtes},
         |edges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM jpairs
         |  UNION ALL
         |  SELECT doc_b AS u, doc_a AS v FROM jpairs),
         |reach AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
         |  WHERE e.v <> r.u),
         |labels AS (
         |  SELECT u AS doc_id, least(u, min(v)) AS label
         |  FROM reach GROUP BY u),
         |keep_exact AS (
         |  SELECT min(doc_id) AS doc_id FROM documents
         |  GROUP BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')),
         |keep_q AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, text,
         |      string_split(lower(trim(text)), ' ') AS w
         |    FROM documents)
         |  WHERE CAST(len(w) AS BIGINT) BETWEEN 15 AND 80
         |    AND CAST(len(list_distinct(w)) AS DOUBLE) / len(w) >= 0.3
         |    AND CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(w)
         |      BETWEEN 2.0 AND 12.0),
         |flags AS (
         |  SELECT
         |    ke.doc_id IS NOT NULL AS f_exact,
         |    (l.label IS NULL OR l.label = d.doc_id) AS f_nd,
         |    kq.doc_id IS NOT NULL AS f_q,
         |    d.lang = 'en' AS f_lang
         |  FROM documents d
         |  LEFT JOIN keep_exact ke ON ke.doc_id = d.doc_id
         |  LEFT JOIN labels l ON l.doc_id = d.doc_id
         |  LEFT JOIN keep_q kq ON kq.doc_id = d.doc_id),
         |agg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n0,
         |    CAST(sum(CASE WHEN f_exact THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n1,
         |    CAST(sum(CASE WHEN f_exact AND f_nd THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n2,
         |    CAST(sum(CASE WHEN f_exact AND f_nd AND f_q
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n3,
         |    CAST(sum(CASE WHEN f_exact AND f_nd AND f_q AND f_lang
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n4
         |  FROM flags)
         |SELECT CAST(0 AS BIGINT) AS stage_n, 'raw' AS stage,
         |  n0 AS n_docs,
         |  round(CAST(n0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6)
         |    AS pct_of_raw,
         |  round(CAST(n0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6)
         |    AS pct_of_prev
         |FROM agg
         |UNION ALL SELECT 1, 'exact_dedup', n1,
         |  round(CAST(n1 AS DOUBLE) / CAST(n0 AS DOUBLE), 6),
         |  round(CAST(n1 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) FROM agg
         |UNION ALL SELECT 2, 'near_dedup', n2,
         |  round(CAST(n2 AS DOUBLE) / CAST(n0 AS DOUBLE), 6),
         |  round(CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) FROM agg
         |UNION ALL SELECT 3, 'quality', n3,
         |  round(CAST(n3 AS DOUBLE) / CAST(n0 AS DOUBLE), 6),
         |  round(CAST(n3 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) FROM agg
         |UNION ALL SELECT 4, 'lang_en', n4,
         |  round(CAST(n4 AS DOUBLE) / CAST(n0 AS DOUBLE), 6),
         |  round(CAST(n4 AS DOUBLE) / CAST(n3 AS DOUBLE), 6) FROM agg
         |ORDER BY stage_n""".stripMargin,

    // contamination_check's gram CTE keyed by source instead of doc
    "contamination_source_matrix" ->
      s"""WITH tk AS (
         |  SELECT source, string_split(lower(trim(text)), ' ') AS w
         |  FROM documents),
         |g AS (
         |  SELECT DISTINCT source, gram FROM (
         |    SELECT source, unnest(list_distinct(list_transform(
         |      generate_series(1, len(w) - ${ContamN - 1}),
         |      i -> array_to_string(list_slice(w, i, i + ${ContamN - 1}),
         |             ' ')))) AS gram
         |    FROM tk WHERE len(w) >= $ContamN)),
         |sz AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_grams
         |  FROM g GROUP BY source),
         |sh AS (
         |  SELECT a.source AS source_a, b.source AS source_b,
         |    CAST(count(*) AS BIGINT) AS n_shared
         |  FROM g a JOIN g b ON a.gram = b.gram AND a.source <> b.source
         |  GROUP BY 1, 2)
         |SELECT source_a, source_b, n_shared, sz.n_grams AS n_a,
         |  round(CAST(n_shared AS DOUBLE) / CAST(sz.n_grams AS DOUBLE), 6)
         |    AS containment
         |FROM sh JOIN sz ON sz.source = sh.source_a
         |ORDER BY source_a, source_b""".stripMargin,

    // same 60-bit md5 digest family as the KMV sketches ('0x' cast in
    // DuckDB, conv() in Spark); bit_xor is available in both engines
    "train_shard_checksum_manifest" ->
      s"""WITH h AS (
         |  SELECT doc_id % $PackShards AS shard, doc_id,
         |    CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT)
         |      AS n_tok,
         |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
         |      || ':' || text), 1, 15)) AS BIGINT) AS h
         |  FROM documents)
         |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
         |  bit_xor(h) AS checksum
         |FROM h GROUP BY shard ORDER BY shard""".stripMargin,

    // same sqrt-mix arithmetic; DECIMAL(20,9) weight sums keep the
    // normalizer exact on both engines
    "sample_epoch_schedule" ->
      """WITH t AS (
        |  SELECT source,
        |    CAST(sum(len(string_split(lower(trim(text)), ' ')))
        |      AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |w AS (
        |  SELECT source, n_tokens,
        |    CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 9)
        |      AS DECIMAL(20,9)) AS wt
        |  FROM t),
        |tot AS (
        |  SELECT sum(wt) AS wtot,
        |    CAST(2 * sum(n_tokens) AS BIGINT) AS budget
        |  FROM w),
        |sh AS (
        |  SELECT source, n_tokens, budget,
        |    round(CAST(wt AS DOUBLE) / CAST(wtot AS DOUBLE), 6)
        |      AS target_share
        |  FROM w CROSS JOIN tot)
        |SELECT source, n_tokens, target_share,
        |  round(least(4.0, target_share * CAST(budget AS DOUBLE)
        |    / CAST(n_tokens AS DOUBLE)), 4) AS epochs,
        |  CAST(floor(least(target_share * CAST(budget AS DOUBLE),
        |    4.0 * CAST(n_tokens AS DOUBLE))) AS BIGINT) AS tokens_drawn
        |FROM sh ORDER BY source""".stripMargin,

    "pack_sequences" ->
      s"""WITH tk AS (
         |  SELECT doc_id, doc_id % $PackShards AS shard,
         |    CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT)
         |      AS n_tok
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, shard, n_tok,
         |    sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
         |  FROM tk)
         |SELECT doc_id, shard, n_tok,
         |  CAST(floor((cum - n_tok) / $ContextLen) AS BIGINT) AS bin_id,
         |  CAST((cum - n_tok) % $ContextLen AS BIGINT) AS bin_offset
         |FROM c ORDER BY doc_id""".stripMargin,
    "corpus_mix" ->
      """WITH t AS (
        |  SELECT source, lang,
        |    CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT)
        |      AS n_tok
        |  FROM documents),
        |a AS (
        |  SELECT source, lang, count(*) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |  FROM t GROUP BY 1, 2)
        |SELECT source, lang, n_docs, n_tokens,
        |  round(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER (), 6)
        |    AS token_share
        |FROM a ORDER BY source, lang""".stripMargin,
    // α = 0.5 runs as sqrt (bit-identical IEEE on both engines, unlike
    // pow); the weight denominator is an exact-decimal sum of rounded
    // terms, so both engines divide identical operands
    "sample_temperature" ->
      """WITH t AS (
        |  SELECT source,
        |    CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT)
        |      AS n_tok
        |  FROM documents),
        |a AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |  FROM t GROUP BY 1),
        |b AS (
        |  SELECT source, n_docs, n_tokens,
        |    CAST(round(sqrt(CAST(n_tokens AS DOUBLE)), 6) AS DECIMAL(18,6))
        |      AS wgt
        |  FROM a),
        |c AS (
        |  SELECT source, n_docs, n_tokens,
        |    round(CAST(n_tokens AS DOUBLE)
        |      / CAST(sum(n_tokens) OVER () AS DOUBLE), 6) AS raw_share,
        |    round(CAST(wgt AS DOUBLE)
        |      / CAST(sum(wgt) OVER () AS DOUBLE), 6) AS temp_share
        |  FROM b)
        |SELECT source, n_docs, n_tokens, raw_share, temp_share,
        |  round(temp_share / raw_share, 6) AS boost
        |FROM c ORDER BY source""".stripMargin,
    // the oracle states the SPEC (global cumsum in score order) — the
    // Spark side computes the same prefix sum via deterministic score
    // bins so no single-partition window exists in the engine plan
    "corpus_token_budget" ->
      """WITH tk AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS score,
        |    CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT)
        |      AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, score, n_tok,
        |    CAST(sum(n_tok) OVER (ORDER BY score DESC, doc_id) AS BIGINT)
        |      AS cum_tok
        |  FROM tk),
        |tot AS (SELECT sum(n_tok) AS total FROM tk)
        |SELECT doc_id, score, n_tok, cum_tok
        |FROM c, tot WHERE cum_tok <= total / 5
        |ORDER BY score DESC, doc_id""".stripMargin,
    "sample_balanced_class" ->
      """WITH cap AS (
        |  SELECT min(n) AS n_min
        |  FROM (SELECT lang, count(*) AS n FROM documents GROUP BY lang)),
        |r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, lang FROM r CROSS JOIN cap
        |WHERE rn <= n_min ORDER BY doc_id""".stripMargin,
    "sample_per_source_topk" ->
      """SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents) r
        |WHERE rn <= 10
        |ORDER BY source, n_chars DESC, doc_id""".stripMargin,
    "contamination_check" ->
      s"""WITH tk AS (
         |  SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    generate_series(1, len(w) - ${ContamN - 1}),
         |    i -> array_to_string(list_slice(w, i, i + ${ContamN - 1}),
         |           ' ')))) AS gram
         |  FROM tk WHERE len(w) >= $ContamN)
         |SELECT t.doc_id, count(DISTINCT t.gram) AS n_shared_grams,
         |  count(DISTINCT e.doc_id) AS n_eval_docs
         |FROM g t JOIN g e ON t.gram = e.gram
         |WHERE t.doc_id % 7 <> 0 AND e.doc_id % 7 = 0
         |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    // same gram CTE as the check; the removal is NOT EXISTS on the
    // flagged-id set, aggregated per source
    "decontaminate_apply" ->
      s"""WITH tk AS (
         |  SELECT doc_id, source,
         |    string_split(lower(trim(text)), ' ') AS w
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, unnest(list_distinct(list_transform(
         |    generate_series(1, len(w) - ${ContamN - 1}),
         |    i -> array_to_string(list_slice(w, i, i + ${ContamN - 1}),
         |           ' ')))) AS gram
         |  FROM tk WHERE len(w) >= $ContamN),
         |bad AS (
         |  SELECT DISTINCT t.doc_id
         |  FROM g t JOIN g e ON t.gram = e.gram
         |  WHERE t.doc_id % 7 <> 0 AND e.doc_id % 7 = 0),
         |tr AS (
         |  SELECT doc_id, source, CAST(len(w) AS BIGINT) AS n_tok,
         |    EXISTS (SELECT 1 FROM bad WHERE bad.doc_id = tk.doc_id)
         |      AS hit
         |  FROM tk WHERE doc_id % 7 <> 0)
         |SELECT source, count(*) AS n_train,
         |  CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_removed,
         |  CAST(sum(CASE WHEN hit THEN 0 ELSE 1 END) AS BIGINT)
         |    AS n_kept,
         |  CAST(sum(CASE WHEN hit THEN 0 ELSE n_tok END) AS BIGINT)
         |    AS n_tokens_kept,
         |  round(CAST(sum(CASE WHEN hit THEN 0 ELSE 1 END) AS DOUBLE)
         |    / count(*), 6) AS kept_share
         |FROM tr GROUP BY source ORDER BY source""".stripMargin,
    "sample_split" ->
      """SELECT doc_id, source,
        |  CASE
        |    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
        |      THEN 'train'
        |    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3'
        |      THEN 'valid'
        |    ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "sample_group_holdout" ->
      """WITH d AS (
        |  SELECT source, n_chars,
        |    CASE WHEN substring(md5(source), 1, 1) < 'c' THEN 'train'
        |         WHEN substring(md5(source), 1, 1) < 'e' THEN 'valid'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT split, CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars
        |FROM d GROUP BY split ORDER BY split""".stripMargin,
    // same md5-derived uniform (DuckDB parses the hex via '0x' cast), the
    // same single exact-operand IEEE division — both engines order by the
    // identical rounded priority with the doc_id tiebreak
    "sample_priority" ->
      """WITH p AS (
        |  SELECT doc_id, source, GREATEST(n_chars, 1) AS w,
        |    CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) + 1 AS u
        |  FROM documents)
        |SELECT doc_id, source, w,
        |  round(CAST(w AS DOUBLE) * 4294967296
        |    / (CAST(u AS DOUBLE) * 1000), 6) AS priority
        |FROM p ORDER BY priority DESC, doc_id LIMIT 100""".stripMargin,
    // same freq-weighted multiplicity counting; pairs materialize via
    // list_transform over per-word index series (the contamination-gram
    // pattern), sum cast out of DuckDB's HUGEINT
    "tokenizer_bpe_pairs" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(lower(trim(text)), ' ')) AS w
        |  FROM documents),
        |wf AS (
        |  SELECT w, count(*) AS wf FROM tok WHERE len(w) >= 2 GROUP BY 1),
        |p AS (
        |  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
        |    i -> substring(w, i, 2))) AS pair, wf
        |  FROM wf),
        |a AS (
        |  SELECT pair, CAST(sum(wf) AS BIGINT) AS n_occ FROM p GROUP BY 1),
        |r AS (
        |  SELECT pair, n_occ,
        |    row_number() OVER (ORDER BY n_occ DESC, pair) AS rnk
        |  FROM a)
        |SELECT CAST(rnk AS BIGINT) AS rnk, pair, n_occ
        |FROM r WHERE rnk <= 50 ORDER BY rnk""".stripMargin,

    // same vocab-first collapse; the CASE-guarded substring fan-out
    // avoids the descending-sequence trap on short words
    "tokenizer_unigram_seed" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(lower(trim(text)), ' ')) AS w
        |  FROM documents),
        |wf AS (
        |  SELECT w, count(*) AS wf FROM tok WHERE len(w) >= 2 GROUP BY 1),
        |p AS (
        |  SELECT unnest(flatten(list_transform([2, 3, 4], l ->
        |    CASE WHEN length(w) >= l THEN
        |      list_transform(generate_series(1, length(w) - l + 1),
        |        i -> substring(w, i, l))
        |    ELSE CAST([] AS VARCHAR[]) END))) AS piece, wf
        |  FROM wf),
        |a AS (
        |  SELECT piece, CAST(sum(wf) AS BIGINT) AS cnt FROM p GROUP BY 1),
        |r AS (
        |  SELECT piece, cnt, CAST(length(piece) AS BIGINT) AS piece_len,
        |    cnt * CAST(length(piece) AS BIGINT) AS score,
        |    row_number() OVER (
        |      ORDER BY cnt * CAST(length(piece) AS BIGINT) DESC, piece)
        |      AS rnk
        |  FROM a)
        |SELECT CAST(rnk AS BIGINT) AS rnk, piece, cnt, piece_len, score
        |FROM r WHERE rnk <= 32 ORDER BY rnk""".stripMargin,

    // same double-spaced merge trick, mirrored operation for operation
    "tokenizer_bpe_merge" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(lower(trim(text)), ' ')) AS w
        |  FROM documents),
        |wf AS (
        |  SELECT w, count(*) AS wf FROM tok WHERE len(w) >= 2 GROUP BY 1),
        |p AS (
        |  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
        |    i -> substring(w, i, 2))) AS pair, wf
        |  FROM wf),
        |a AS (SELECT pair, sum(wf) AS n_occ FROM p GROUP BY 1),
        |top AS (SELECT pair AS mpair FROM a
        |  ORDER BY n_occ DESC, pair LIMIT 1),
        |sq AS (
        |  SELECT wf.wf,
        |    replace(
        |      ' ' || array_to_string(list_transform(
        |        generate_series(1, len(w)), i -> substring(w, i, 1)),
        |        '  ') || ' ',
        |      ' ' || substring(t.mpair, 1, 1) || '  '
        |        || substring(t.mpair, 2, 1) || ' ',
        |      ' ' || t.mpair || ' ') AS seq2
        |  FROM wf CROSS JOIN top t),
        |sy AS (
        |  SELECT wf, list_filter(string_split(seq2, ' '), x -> x <> '')
        |    AS syms
        |  FROM sq),
        |p2 AS (
        |  SELECT wf, unnest(list_transform(
        |    generate_series(1, len(syms) - 1),
        |    i -> syms[i] || ' ' || syms[i + 1])) AS pair
        |  FROM sy WHERE len(syms) >= 2),
        |a2 AS (
        |  SELECT pair, CAST(sum(wf) AS BIGINT) AS n_occ
        |  FROM p2 GROUP BY 1),
        |r AS (SELECT pair, n_occ,
        |  row_number() OVER (ORDER BY n_occ DESC, pair) AS rnk FROM a2)
        |SELECT CAST(rnk AS BIGINT) AS rnk, pair, n_occ
        |FROM r WHERE rnk <= 20 ORDER BY rnk""".stripMargin,

    // the four-iteration loop unrolled CTE-for-CTE (the sql_recursive
    // discipline): stage k reads s{k-1}, counts symbol pairs, picks the
    // deterministic top-1, applies the double-spaced replace, and
    // reports the post-merge corpus token count
    "tokenizer_bpe_apply" -> {
      val stages = (1 to 4).map { k =>
        s"""y$k AS (
           |  SELECT wf, list_filter(string_split(seq, ' '), x -> x <> '')
           |    AS syms
           |  FROM s${k - 1}),
           |p$k AS (
           |  SELECT wf, unnest(list_transform(
           |    generate_series(1, len(syms) - 1),
           |    i -> syms[i] || ' ' || syms[i + 1])) AS pair
           |  FROM y$k WHERE len(syms) >= 2),
           |a$k AS (
           |  SELECT pair, CAST(sum(wf) AS BIGINT) AS n_occ
           |  FROM p$k GROUP BY 1),
           |t$k AS (SELECT pair, n_occ FROM a$k
           |  ORDER BY n_occ DESC, pair LIMIT 1),
           |s$k AS (
           |  SELECT s.wf, replace(s.seq,
           |      ' ' || string_split(t.pair, ' ')[1] || '  '
           |        || string_split(t.pair, ' ')[2] || ' ',
           |      ' ' || string_split(t.pair, ' ')[1]
           |        || string_split(t.pair, ' ')[2] || ' ') AS seq
           |  FROM s${k - 1} s CROSS JOIN t$k t),
           |n$k AS (
           |  SELECT CAST(sum(wf * len(list_filter(
           |    string_split(seq, ' '), x -> x <> ''))) AS BIGINT)
           |    AS n_symbols_after
           |  FROM s$k)""".stripMargin
      }.mkString(",\n")
      val selects = (1 to 4).map { k =>
        s"""SELECT CAST($k AS BIGINT) AS iter, t$k.pair AS merged_pair,
           |  t$k.n_occ, n$k.n_symbols_after FROM t$k, n$k"""
          .stripMargin
      }.mkString("\nUNION ALL\n")
      // stages/selects splice in AFTER the shell's stripMargin: their
      // own margins are already stripped, and a second pass would eat
      // the first '|' of any continuation line starting with '||'
      """WITH tok AS (
        |  SELECT unnest(string_split(lower(trim(text)), ' ')) AS w
        |  FROM documents),
        |wf AS (
        |  SELECT w, count(*) AS wf FROM tok WHERE len(w) >= 2 GROUP BY 1),
        |s0 AS (
        |  SELECT wf, ' ' || array_to_string(list_transform(
        |    generate_series(1, len(w)), i -> substring(w, i, 1)),
        |    '  ') || ' ' AS seq
        |  FROM wf),
        |__STAGES__
        |SELECT * FROM (
        |__SELECTS__
        |) ORDER BY iter""".stripMargin
        .replace("__STAGES__", stages)
        .replace("__SELECTS__", selects)
    },

    "sample_dedup_weight" ->
      s"""WITH RECURSIVE ${Dedup.jaccardCtes},
         |edges AS (
         |  SELECT doc_a AS u, doc_b AS v FROM jpairs
         |  UNION ALL
         |  SELECT doc_b AS u, doc_a AS v FROM jpairs),
         |reach AS (
         |  SELECT u, v FROM edges
         |  UNION
         |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
         |  WHERE e.v <> r.u),
         |labels AS (
         |  SELECT u AS id, least(u, min(v)) AS label
         |  FROM reach GROUP BY u),
         |cs AS (SELECT label, count(*) AS csize FROM labels GROUP BY 1),
         |lj AS (
         |  SELECT l.id AS doc_id, cs.csize
         |  FROM labels l JOIN cs ON l.label = cs.label)
         |SELECT d.doc_id,
         |  CAST(COALESCE(lj.csize, 1) AS BIGINT) AS cluster_size,
         |  round(CAST(1.0 AS DOUBLE) / COALESCE(lj.csize, 1), 6)
         |    AS weight
         |FROM documents d LEFT JOIN lj ON d.doc_id = lj.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    "train_pair_manifest" ->
      """WITH n2 AS (
        |  SELECT vec_id,
        |    sum(CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 9)
        |      AS DECIMAL(20,9))) AS norm2
        |  FROM (SELECT vec_id, unnest(embedding) AS x FROM embeddings)
        |  GROUP BY vec_id)
        |SELECT doc_id, lang, n_chars,
        |  round(CAST(norm2 AS DOUBLE), 6) AS norm2,
        |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e'
        |    THEN 'train' ELSE 'val' END AS split
        |FROM documents JOIN n2 ON doc_id = vec_id
        |WHERE lang = 'en' AND n_chars BETWEEN 100 AND 500
        |  AND norm2 >= CAST(0.98 AS DECIMAL(20,9))
        |  AND norm2 <= CAST(1.02 AS DECIMAL(20,9))
        |ORDER BY doc_id""".stripMargin,
    // exact decimal sums per brand, then the identical m-estimate
    // formula text on both engines
    "feature_target_encoding" ->
      """WITH per AS (
        |  SELECT p_brand, count(*) AS n,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sy
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand),
        |g AS (SELECT sum(n) AS gn, sum(sy) AS gsy FROM per)
        |SELECT p_brand, CAST(n AS BIGINT) AS n,
        |  round(CAST(sy AS DOUBLE) / n, 6) AS raw_mean,
        |  round((CAST(sy AS DOUBLE)
        |    + 50 * (CAST(gsy AS DOUBLE) / gn)) / (n + 50), 6) AS enc
        |FROM per CROSS JOIN g ORDER BY p_brand""".stripMargin,
    // the md5 hex prefix parses via '0x' cast (the sample_priority
    // idiom) — same fold values as Spark's conv(.., 16, 10)
    "feature_target_crossfit" ->
      """WITH rows_f AS (
        |  SELECT p_brand,
        |    CAST(('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)),
        |      1, 4)) AS BIGINT) % 5 AS fold,
        |    CAST(l_quantity AS DECIMAL(18,2)) AS y
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |pf AS (
        |  SELECT p_brand, fold, count(*) AS n, sum(y) AS sy
        |  FROM rows_f GROUP BY 1, 2),
        |w AS (
        |  SELECT p_brand, fold, n, sy,
        |    sum(n) OVER (PARTITION BY p_brand) AS n_all,
        |    sum(sy) OVER (PARTITION BY p_brand) AS sy_all
        |  FROM pf),
        |g AS (SELECT sum(n) AS gn, sum(sy) AS gsy FROM pf)
        |SELECT p_brand, fold, CAST(n AS BIGINT) AS n_fold,
        |  round((CAST(sy_all AS DOUBLE) - CAST(sy AS DOUBLE)
        |    + 50 * (CAST(gsy AS DOUBLE) / gn))
        |    / (n_all - n + 50), 6) AS enc_oof
        |FROM w CROSS JOIN g ORDER BY p_brand, fold""".stripMargin,
    // identical DOUBLE bin arithmetic (same IEEE expression -> same
    // floor on both engines) and identical smoothed-share formula text
    "feature_woe_iv" ->
      """WITH o AS (
        |  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS tp,
        |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END AS pos
        |  FROM orders),
        |b AS (SELECT min(tp) AS lo, max(tp) AS hi FROM o),
        |per AS (
        |  SELECT CASE WHEN hi = lo THEN 0 ELSE least(CAST(floor(
        |      CAST(tp - lo AS DOUBLE) * 10 / CAST(hi - lo AS DOUBLE))
        |      AS BIGINT), 9) END AS bin,
        |    sum(pos) AS n_pos, sum(1 - pos) AS n_neg
        |  FROM o CROSS JOIN b GROUP BY 1),
        |tot AS (SELECT sum(n_pos) AS tp_tot, sum(n_neg) AS tn_tot
        |  FROM per),
        |e AS (
        |  SELECT bin, n_pos, n_neg,
        |    (CAST(n_pos AS DOUBLE) + 0.5) / CAST(tp_tot AS DOUBLE) AS ps,
        |    (CAST(n_neg AS DOUBLE) + 0.5) / CAST(tn_tot AS DOUBLE) AS ns
        |  FROM per CROSS JOIN tot)
        |SELECT bin, CAST(n_pos AS BIGINT) AS n_pos,
        |  CAST(n_neg AS BIGINT) AS n_neg,
        |  round(ln(ps / ns), 6) AS woe,
        |  round((ps - ns) * ln(ps / ns), 6) AS iv_term
        |FROM e ORDER BY bin""".stripMargin,
    "privacy_k_anonymity" ->
      """WITH cls AS (
        |  SELECT lang, source,
        |    CAST(floor(n_chars / 1000.0) AS BIGINT) AS size_bucket,
        |    count(*) AS k
        |  FROM documents GROUP BY 1, 2, 3)
        |SELECT CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(min(k) AS BIGINT) AS min_k,
        |  CAST(sum(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violating,
        |  CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
        |    AS docs_at_risk
        |FROM cls""".stripMargin,
    "privacy_l_diversity" ->
      """WITH cls AS (
        |  SELECT source,
        |    CAST(floor(n_chars / 1000.0) AS BIGINT) AS size_bucket,
        |    count(DISTINCT lang) AS l, count(*) AS k
        |  FROM documents GROUP BY 1, 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(min(l) AS BIGINT) AS min_l,
        |  CAST(sum(CASE WHEN l < 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_low_diversity,
        |  CAST(sum(CASE WHEN l < 2 THEN k ELSE 0 END) AS BIGINT)
        |    AS docs_exposed
        |FROM cls""".stripMargin,
    // same two-level snake: per-bucket size rank, explicit block parity
    "shard_balance" ->
      s"""WITH tk AS (
         |  SELECT doc_id, doc_id % $PackShards AS bucket,
         |    CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT)
         |      AS n_tok
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, bucket, n_tok,
         |    row_number() OVER (PARTITION BY bucket
         |      ORDER BY n_tok DESC, doc_id) AS rn
         |  FROM tk),
         |asn AS (
         |  SELECT n_tok,
         |    CASE WHEN ((rn - 1) // $BalanceShards) % 2 = 0
         |      THEN (rn - 1) % $BalanceShards
         |      ELSE $BalanceShards - 1 - (rn - 1) % $BalanceShards
         |    END AS shard
         |  FROM r),
         |a AS (
         |  SELECT shard, count(*) AS n_docs,
         |    CAST(sum(n_tok) AS BIGINT) AS n_tokens
         |  FROM asn GROUP BY 1)
         |SELECT CAST(shard AS BIGINT) AS shard, n_docs, n_tokens,
         |  round(CAST(n_tokens AS DOUBLE)
         |    / (CAST(sum(n_tokens) OVER () AS DOUBLE) / $BalanceShards), 6)
         |    AS skew
         |FROM a ORDER BY shard""".stripMargin,
    // rank on the already-rounded score (identical doubles both sides),
    // explicit integer proration instead of NTILE
    "curriculum_order" ->
      s"""WITH d AS (
         |  SELECT doc_id, string_split(lower(trim(text)), ' ') AS w
         |  FROM documents),
         |sc AS (
         |  SELECT doc_id, doc_id % $PackShards AS bucket,
         |    round(CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 6)
         |      AS score
         |  FROM d),
         |r AS (
         |  SELECT doc_id, bucket, score,
         |    row_number() OVER (PARTITION BY bucket
         |      ORDER BY score, doc_id) AS rn,
         |    count(*) OVER (PARTITION BY bucket) AS n_bucket
         |  FROM sc)
         |SELECT doc_id, CAST(bucket AS BIGINT) AS bucket, score,
         |  CAST(rn AS BIGINT) AS rn,
         |  CAST((rn - 1) * 4 // n_bucket + 1 AS BIGINT) AS phase
         |FROM r ORDER BY doc_id""".stripMargin,
    // same generated power-of-two CASE chain (no libm log2 on either side)
    "seq_len_histogram" -> {
      val cases = (0 to 20)
        .map(k => s"WHEN n_tok <= ${1L << k} THEN ${1L << k}")
        .mkString("\n|      ")
      s"""WITH docs AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT)
         |      AS n_tok
         |  FROM documents)
         |SELECT CAST(CASE
         |      $cases
         |      ELSE ${1L << 21} END AS BIGINT) AS bucket,
         |  count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
         |  CAST(sum(greatest(n_tok - 512, 0)) AS BIGINT)
         |    AS tokens_lost_at_512
         |FROM docs GROUP BY 1 ORDER BY bucket""".stripMargin
    },
    "corpus_gini" ->
      """WITH src AS (
        |  SELECT source,
        |    CAST(sum(len(string_split(lower(trim(text)), ' ')))
        |      AS BIGINT) AS tok
        |  FROM documents GROUP BY source),
        |ranked AS (
        |  SELECT source, tok,
        |    CAST(row_number() OVER (ORDER BY tok, source) AS BIGINT) AS i
        |  FROM src),
        |m AS (
        |  SELECT count(*) AS n_sources,
        |    CAST(sum(tok) AS BIGINT) AS total_tokens,
        |    CAST(sum(CAST(i AS DECIMAL(19,0)) * CAST(tok AS DECIMAL(19,0)))
        |      AS DOUBLE) AS iw
        |  FROM ranked)
        |SELECT n_sources, total_tokens,
        |  round((2.0 * iw)
        |    / (CAST(n_sources AS DOUBLE) * CAST(total_tokens AS DOUBLE))
        |    - CAST(n_sources + 1 AS DOUBLE) / CAST(n_sources AS DOUBLE), 6)
        |    AS gini
        |FROM m""".stripMargin,
    "sample_proportional" ->
      """WITH counts AS (
        |  SELECT source, count(*) AS n_src FROM documents GROUP BY source),
        |total AS (SELECT count(*) AS n_total FROM documents),
        |alloc AS (
        |  SELECT source, n_src,
        |    greatest(CAST(1 AS BIGINT),
        |      CAST(round(100 * CAST(n_src AS DOUBLE) / n_total)
        |        AS BIGINT)) AS k_src
        |  FROM counts CROSS JOIN total),
        |ranked AS (
        |  SELECT source, doc_id,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
        |      AS rn
        |  FROM documents)
        |SELECT r.source, r.rn, r.doc_id, a.n_src, a.k_src
        |FROM ranked r JOIN alloc a ON r.source = a.source
        |WHERE r.rn <= a.k_src
        |ORDER BY r.source, r.rn""".stripMargin,

    // independent formulation: ONE global row_number — must equal the
    // engine's bucket-offset zipWithIndex exactly
    "sample_systematic" ->
      """WITH h AS (
        |  SELECT doc_id, md5('sys:' || CAST(doc_id AS VARCHAR)) AS hk
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, hk,
        |    CAST(row_number() OVER (ORDER BY hk, doc_id) AS BIGINT)
        |      AS pos
        |  FROM h)
        |SELECT pos, doc_id, hk FROM r
        |WHERE (pos - 1) % 50 = 0 ORDER BY pos""".stripMargin,

    "sample_time_stratified" ->
      s"""WITH o AS (
         |  SELECT o_custkey, o_totalprice,
         |    CAST(o_orderdate AS DATE) AS day,
         |    CASE WHEN CAST(o_orderdate AS DATE) < DATE '1997-10-01'
         |           THEN 'train'
         |         WHEN CAST(o_orderdate AS DATE) >= DATE '1997-10-31'
         |           THEN 'test'
         |         ELSE 'embargo' END AS split
         |  FROM orders),
         |tc AS (
         |  SELECT DISTINCT o_custkey FROM o WHERE split = 'train'),
         |base AS (
         |  SELECT split, count(*) AS n_orders,
         |    count(DISTINCT o_custkey) AS n_customers,
         |    min(day) AS first_day, max(day) AS last_day,
         |    ${sql.moneySum("o_totalprice")} AS revenue
         |  FROM o GROUP BY 1),
         |seen AS (
         |  SELECT split, count(*) AS n_seen_in_train FROM (
         |    SELECT DISTINCT split, o_custkey FROM o) z
         |  WHERE o_custkey IN (SELECT o_custkey FROM tc)
         |  GROUP BY 1)
         |SELECT b.split, b.n_orders, b.n_customers, b.first_day,
         |  b.last_day, b.revenue,
         |  COALESCE(s.n_seen_in_train, 0) AS n_seen_in_train
         |FROM base b LEFT JOIN seen s ON s.split = b.split
         |ORDER BY b.split""".stripMargin
  )
}
