package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table (builder-prompt
  * north-star surface): token counting, quality scoring, language-ID
  * heuristic, and document fingerprinting.
  *
  * All four are embarrassingly parallel scans — no shuffle except the final
  * presentation orderBy — so they hold unchanged at 100 TB: each is a
  * single pass of codegen'd string expressions over the parquet scan.
  */
object TextQueries {
  import Tables._

  type Q = (SparkSession, String) => DataFrame

  /** The documents scan spread to core parallelism before CPU-heavy
    * per-row stages (tokenize / n-gram explode / per-row marker scans) —
    * r16, guide §2.5 unsplittable-input case: the bench corpus is one
    * parquet row group, so these stages otherwise serialize on one task.
    * Conditional on the scan's actual parallelism (a many-file corpus
    * skips the shuffle); deterministic doc_id hash partitioning; the
    * spread sites' downstream aggregates are integer-exact or per-row,
    * so values are partitioning-independent. NOT applied to the
    * scan-shaped queries PlanAuditSpec pins to ≤1 Exchange (t33/t69/t70/
    * t72/t73/t74/t113): their contract is "no shuffle before the
    * presentation sort" — one task on a one-row-group bench input is the
    * honest price of that shape, and at scale the scan parallelizes
    * naturally. */
  private def docsSpread(s: SparkSession, d: String): DataFrame =
    graft.Tables.conditionalSpread(s, documents(s, d), "doc_id")

  private def toks(c: Column): Column = split(trim(c), "\\s+")

  /** Language marker token lists. The scoring formula (count of marker
    * tokens per language, argmax with fixed precedence) is mirrored
    * exactly in the DuckDB oracle. */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "et", "est", "les"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  private def markerCount(tokens: Column, markers: Seq[String]): Column =
    size(filter(tokens, t => t.isin(markers.map(lit): _*))).cast("long")

  val queries: Map[String, Q] = Map(
    /** Token counting: whitespace tokens + a BPE-ish subword proxy
      * (alnum runs + punctuation as separate tokens). */
    "t33_token_count" -> ((s, d) =>
      documents(s, d)
        .select(
          col("doc_id"),
          size(toks(col("text"))).cast("long").as("n_tokens"),
          regexp_count(col("text"), lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]")).cast("long")
            .as("n_subtokens"),
          length(col("text")).cast("long").as("n_chars_measured"),
          col("n_chars"))
        .orderBy("doc_id")),

    /** Quality scoring: length, punctuation density, stopword ratio,
      * mean word length — combined into one 0-100 score. Same arithmetic
      * on both engines. Tokens are projected once and reused so the split
      * runs one time per row, not once per derived metric. */
    "t34_quality" -> ((s, d) => {
      val base = documents(s, d).select(
        col("doc_id"), col("n_chars"),
        size(toks(col("text"))).cast("double").as("n_tok"),
        regexp_count(col("text"), lit("[.!?,;:]")).cast("double").as("n_punct"),
        markerCount(toks(col("text")), Seq("the", "a", "of", "and", "is", "to", "in"))
          .cast("double").as("stop_hits"),
        length(regexp_replace(col("text"), "\\s+", "")).cast("double").as("n_nonspace"))
      val meanWordLen = col("n_nonspace") / col("n_tok")
      base.select(
        col("doc_id"),
        col("n_tok").cast("long").as("n_tokens"),
        col("n_punct").cast("long").as("n_punct"),
        col("stop_hits").cast("long").as("stopword_hits"),
        meanWordLen.as("mean_word_len"),
        (least(lit(40.0), col("n_chars").cast("double") / 10.0) +
          least(lit(20.0), col("n_punct") * 4.0) +
          least(lit(20.0), col("stop_hits") / col("n_tok") * 100.0) +
          when(meanWordLen.between(3.0, 8.0), 20.0).otherwise(5.0)).as("quality_score"))
        .orderBy("doc_id")
    }),

    /** Language-ID heuristic: marker-token profile scoring, argmax with
      * fixed precedence order (en,es,de,fr,zh). Compared against the
      * table's `lang` column for an accuracy summary per actual lang. */
    "t35_langid" -> ((s, d) => {
      val t = col("t")
      val scores = langMarkers.map { case (l, ms) =>
        l -> size(filter(t, x => x.isin(ms.map(lit): _*))).cast("long")
      }
      val best = scores.tail.foldLeft(
        struct(scores.head._2.as("score"), lit(scores.head._1).as("lang"))) {
        case (acc, (l, sc)) =>
          when(sc > acc.getField("score"),
            struct(sc.as("score"), lit(l).as("lang"))).otherwise(acc)
      }
      docsSpread(s, d)
        .select(col("doc_id"), col("lang"), toks(col("text")).as("t"))
        .select(col("doc_id"), col("lang"), best.getField("lang").as("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted_lang")
    }),

    /** Document fingerprinting: md5 content hash (oracle-matched) plus a
      * 64-bit xxhash64 fingerprint (Spark-native; verified by spec). */
    "t36_fingerprint" -> ((s, d) =>
      documents(s, d)
        .select(
          col("doc_id"),
          md5(col("text").cast("binary")).as("fingerprint_md5"),
          substring(md5(col("text").cast("binary")), 1, 4).as("bucket"))
        .orderBy("doc_id")),

    /** Rolling-hash document fingerprints (Rabin-Karp / winnowing style):
      * min polynomial hash over 16-byte windows via the codegen'd
      * rolling_min_hash expression, O(n) per doc, plus a bucket for
      * grouping candidates. The DuckDB oracle emulates the JVM's mod-2^64
      * wraparound with HUGEINT (see [[rollingOracle]]); the spec
      * additionally pins collision semantics. */
    "t66_fingerprint_rolling" -> ((s, d) => {
      graft.functions.VectorFunctions.register(s)
      documents(s, d)
        .select(
          col("doc_id"),
          call_function("rolling_min_hash", col("text"), lit(16)).as("rolling_fp"),
          pmod(call_function("rolling_min_hash", col("text"), lit(16)), lit(1024L))
            .as("fp_bucket"))
        .orderBy("doc_id")
    }),

    /** Deterministic train/val/test split assignment — the reproducible-
      * split primitive a training-data pipeline needs: bucket =
      * first-16-bits of md5(doc_id), thresholds at 80/10/10. Hash-bucket
      * (not random) assignment is stable across runs, engines, partition
      * counts, and corpus growth — a doc's split never changes when data
      * is added, which rowwise rand() cannot guarantee. Shuffle-free scan;
      * the md5 prefix is portable so the oracle hash-matches. */
    "t69_split_assign" -> ((s, d) => {
      val bucket = conv(substring(
        md5(col("doc_id").cast("string").cast("binary")), 1, 4), 16, 10)
        .cast("long")
      documents(s, d)
        .select(col("doc_id"), bucket.as("bucket"),
          when(bucket < 52429L, "train")     // 52429/65536 ≈ 80%
            .when(bucket < 58982L, "val")    // +6553/65536 ≈ 10%
            .otherwise("test").as("split"))
        .orderBy("doc_id")
    }),

    /** Weighted source mixture — the corpus-mixing primitive: each source
      * contributes at its own sampling rate (here derived deterministically
      * from md5(source): rate = (first-hex-digit+1)/16, i.e. 6%..100%),
      * membership decided by the doc's own hash bucket. All-integer
      * threshold arithmetic (doc_bucket·16 < (rate16+1)·65536) so the
      * sample is exactly reproducible on any engine, partitioning, or
      * corpus growth. Shuffle-free scan. */
    "t70_source_mixture" -> ((s, d) => {
      val docBucket = conv(substring(
        md5(col("doc_id").cast("string").cast("binary")), 1, 4), 16, 10).cast("long")
      val rate16 = conv(substring(md5(col("source").cast("binary")), 1, 1), 16, 10)
        .cast("long")
      documents(s, d)
        .select(col("doc_id"), col("source"),
          docBucket.as("doc_bucket"), rate16.as("rate_16"))
        .filter(col("doc_bucket") * 16L < (col("rate_16") + 1L) * 65536L)
        .orderBy("doc_id")
    }),

    /** Document chunking into overlapping token windows (size 50, stride
      * 40) — the context-window prep step for LLM training / retrieval
      * corpora. Window starts come from sequence(0, n-1, stride), the
      * chunk is a slice of the token array — generator + higher-order
      * functions inside the scan stage, no shuffle, linear in corpus
      * bytes. Trailing chunks may be shorter than the window. */
    "t72_chunk_windows" -> ((s, d) => {
      val W = 50
      val S = 40
      documents(s, d)
        .select(col("doc_id"), toks(col("text")).as("t"))
        .select(col("doc_id"), col("t"),
          explode(sequence(lit(0), size(col("t")) - 1, lit(S))).as("start"))
        .select(
          col("doc_id"),
          (col("start") / S).cast("long").as("chunk_idx"),
          col("start").cast("long").as("start_token"),
          least(lit(W), size(col("t")) - col("start")).cast("long").as("n_chunk_tokens"),
          concat_ws(" ", slice(col("t"), col("start") + 1, lit(W))).as("chunk_text"))
        .orderBy("doc_id", "chunk_idx")
    }),

    /** Sentence segmentation: split on sentence-final punctuation runs,
      * drop empties, one row per (doc, sentence) with its token count —
      * the unit-of-text operator upstream of chunking/quality filters.
      * The split pattern avoids lookbehind so it means the same thing
      * under Java regex (Spark) and RE2 (DuckDB). Scan-stage generator,
      * no shuffle. */
    "t73_sentences" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          filter(transform(split(col("text"), "[.!?]+"), x => trim(x)),
            x => length(x) > 0).as("sents"))
        .select(col("doc_id"), posexplode(col("sents")))
        .select(
          col("doc_id"),
          col("pos").cast("long").as("sentence_idx"),
          col("col").as("sentence"),
          size(split(col("col"), "\\s+")).cast("long").as("n_sentence_tokens"))
        .orderBy("doc_id", "sentence_idx")),

    /** PII redaction — the scrub step before corpus publication: mask
      * email addresses and long digit runs (ids/phones), and count the
      * redactions per doc so downstream filters can drop PII-heavy
      * documents. Patterns avoid lookbehind (Java regex and RE2 agree).
      * Shuffle-free scan of codegen'd regexp expressions. */
    "t74_redact" -> ((s, d) => {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val longDigits = "[0-9]{6,}"
      documents(s, d)
        .select(
          col("doc_id"),
          regexp_count(col("text"), lit(email)).cast("long").as("n_emails"),
          regexp_count(col("text"), lit(longDigits)).cast("long").as("n_long_numbers"),
          regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
            longDigits, "<NUM>").as("redacted_text"))
        .orderBy("doc_id")
    }),

    /** Corpus-level n-gram statistics: top-20 word bigrams. Explode is a
      * generator inside the scan stage; one shuffle for the count, then
      * TakeOrdered — linear in corpus size. */
    "t51_top_bigrams" -> ((s, d) =>
      documents(s, d)
        .select(toks(col("text")).as("t"))
        .select(explode(when(size(col("t")) >= 2,
          expr("transform(sequence(0, size(t)-2), i -> concat(t[i], ' ', t[i+1]))"))
          .otherwise(array())).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("bigram"))
        .limit(20)),

    /** Repetition-based quality signals (the MassiveText/Gopher-style
      * filters a pretraining pipeline applies before mixing): per doc,
      * the share of the most common bigram among all bigram occurrences,
      * the fraction of trigram occurrences that are repeats of an earlier
      * trigram in the same doc, and the distinct-token ratio — plus a
      * keep/drop verdict at fixed thresholds. All three are ratios of
      * exact integer counts, so the doubles (and the boolean) are
      * bit-identical across engines.
      *
      * Shape at scale: the n-gram stats shuffle on (doc_id, gram) then
      * (doc_id) — two partial+final aggregations, linear in corpus bytes,
      * nothing corpus-sized on one node. (The pure-array formulation
      * `array_max(transform(array_distinct(g), x -> size(filter(g, ...))))`
      * would be shuffle-free but O(distinct·len) per doc — quadratic on a
      * repetitive doc, i.e. worst exactly where this filter matters.) */
    "t85_repetition" -> ((s, d) => {
      val tok = docsSpread(s, d).select(col("doc_id"), toks(col("text")).as("t"))
      val bg = tok.filter(size(col("t")) >= 2)
        .select(col("doc_id"), explode(
          expr("transform(sequence(0, size(t)-2), i -> concat(t[i], ' ', t[i+1]))")).as("g"))
      val bstat = bg.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max("c").as("top_bg"), sum("c").as("tot_bg"))
      val tg = tok.filter(size(col("t")) >= 3)
        .select(col("doc_id"), explode(
          expr("transform(sequence(0, size(t)-3), i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))"))
          .as("g"))
      val tstat = tg.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(
          sum("c").as("tot_tg"),
          sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup_tg"))
      val topBigramFrac = col("top_bg").cast("double") / col("tot_bg")
      val dupTrigramFrac = col("dup_tg").cast("double") / col("tot_tg")
      tok.select(col("doc_id"),
          size(col("t")).cast("long").as("n_tokens"),
          (size(array_distinct(col("t"))).cast("double") / size(col("t")))
            .as("distinct_token_ratio"))
        .join(bstat, "doc_id").join(tstat, "doc_id")
        .select(col("doc_id"), col("n_tokens"), col("distinct_token_ratio"),
          topBigramFrac.as("top_bigram_frac"),
          dupTrigramFrac.as("dup_trigram_frac"),
          (topBigramFrac <= 0.06 && dupTrigramFrac <= 0.2).as("keep"))
        .orderBy("doc_id")
    }),

    /** Stratified sampling with EXACT per-stratum quotas — the balanced
      * subsampling primitive (t70's independent per-doc rates give each
      * source a binomial count; this gives exactly floor(n/5) per
      * source): docs rank within their source by (md5(doc_id), doc_id)
      * — a deterministic hash order independent of layout — and the
      * first fifth of each stratum is in-sample. All-integer quota test
      * (rn·5 ≤ n), so membership is bit-identical on any engine.
      *
      * Shape at scale: one shuffle on source for the window; a skewed
      * giant source is one linear rank partition (same bound SkewSpec
      * pins). */
    "t95_stratified_sample" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source")
      val byHash = w.orderBy("hk", "doc_id")
      documents(s, d)
        .select(col("doc_id"), col("source"),
          md5(col("doc_id").cast("string").cast("binary")).as("hk"))
        .withColumn("rn", row_number().over(byHash))
        .withColumn("n", count(lit(1)).over(w))
        .select(col("doc_id"), col("source"),
          (col("rn") * 5 <= col("n")).as("in_sample"))
        .orderBy("doc_id")
    }),

    /** End-to-end preprocessing pipeline — the whole LLM-data flow
      * composed as ONE query over the corpus: per-doc language-ID (t35's
      * argmax), quality scoring (t34's formula), repetition filtering
      * (t85's fractions), exact dedup keep-first (d37's content-hash
      * window), and train/val/test assignment (t69), conjoined into a
      * final keep verdict with the split materialized only for kept docs.
      * Every stage is individually hash-gated; this gates the COMPOSITION
      * (join alignment, verdict logic, null semantics of the split column).
      *
      * SINGLE-PASS shape (VERDICT r4 #3 — the r4 composition built each
      * stage from its own `documents` scan: 5 corpus scans where 2
      * suffice): lang-argmax, quality score, content hash, and split
      * bucket are all per-row derivable, so ONE projection over ONE scan
      * computes them; the only second scan is the repetition stage, whose
      * n-gram statistics need their own explode→aggregate path (both gram
      * kinds ride one explode, so it is exactly one extra scan —
      * PlanAuditSpec pins ≤2 documents scans in the physical plan).
      *
      * Docs with <3 tokens have no trigram stats; they LEFT-join the
      * repetition stage and fail its keep (rep_keep=false — conservative:
      * no evidence of non-repetition), rather than silently vanishing
      * from the end-to-end verdict surface (ADVICE r4).
      *
      * Scale shape: joins on doc_id (co-partitioned shuffles at one key),
      * the dedup window partitions by content hash, everything else lives
      * in the two scan stages — nothing corpus-sized concentrates. */
    "t92_pipeline_e2e" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val scores = langMarkers.map { case (l, ms) =>
        l -> size(filter(col("t"), x => x.isin(ms.map(lit): _*))).cast("long")
      }
      val best = scores.tail.foldLeft(
        struct(scores.head._2.as("score"), lit(scores.head._1).as("lang"))) {
        case (acc, (l, sc)) =>
          when(sc > acc.getField("score"),
            struct(sc.as("score"), lit(l).as("lang"))).otherwise(acc)
      }
      // scan #1: every per-row signal in one projection (t34's exact
      // arithmetic, t35's argmax, t69's bucket thresholds, d37's hash)
      val nTok = size(col("t")).cast("double")
      val nPunct = regexp_count(col("text"), lit("[.!?,;:]")).cast("double")
      val stopHits = markerCount(col("t"), Seq("the", "a", "of", "and", "is", "to", "in"))
        .cast("double")
      val meanWordLen =
        length(regexp_replace(col("text"), "\\s+", "")).cast("double") / nTok
      val bucket = conv(substring(
        md5(col("doc_id").cast("string").cast("binary")), 1, 4), 16, 10).cast("long")
      val derived = docsSpread(s, d)
        .select(col("doc_id"), col("n_chars"), col("text"), toks(col("text")).as("t"))
        .select(col("doc_id"),
          best.getField("lang").as("predicted_lang"),
          (least(lit(40.0), col("n_chars").cast("double") / 10.0) +
            least(lit(20.0), nPunct * 4.0) +
            least(lit(20.0), stopHits / nTok * 100.0) +
            when(meanWordLen.between(3.0, 8.0), 20.0).otherwise(5.0))
            .as("quality_score"),
          md5(col("text").cast("binary")).as("h"),
          when(bucket < 52429L, "train")
            .when(bucket < 58982L, "val")
            .otherwise("test").as("split"))
        .withColumn("is_canonical",
          col("doc_id") === min("doc_id").over(Window.partitionBy("h")))
      // scan #2: t85's repetition stats — both gram kinds from one
      // explode, counted per (doc, kind, gram) then rolled per doc with
      // conditional aggregates (same integer counts, same fractions)
      val emptyKg = expr("CAST(array() AS array<struct<kind:string,g:string>>)")
      val grams = docsSpread(s, d)
        .select(col("doc_id"), toks(col("text")).as("t"))
        .select(col("doc_id"), explode(concat(
          when(size(col("t")) >= 2, expr(
            "transform(sequence(0, size(t)-2), i -> named_struct('kind', 'bg', 'g', concat(t[i], ' ', t[i+1])))"))
            .otherwise(emptyKg),
          when(size(col("t")) >= 3, expr(
            "transform(sequence(0, size(t)-3), i -> named_struct('kind', 'tg', 'g', concat(t[i], ' ', t[i+1], ' ', t[i+2])))"))
            .otherwise(emptyKg))).as("kg"))
        .select(col("doc_id"), col("kg.kind").as("kind"), col("kg.g").as("g"))
      val rep = grams
        .groupBy("doc_id", "kind", "g").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(
          max(when(col("kind") === "bg", col("c"))).as("top_bg"),
          sum(when(col("kind") === "bg", col("c"))).as("tot_bg"),
          sum(when(col("kind") === "tg", col("c"))).as("tot_tg"),
          sum(when(col("kind") === "tg",
            when(col("c") > 1, col("c")).otherwise(0L))).as("dup_tg"))
        .filter(col("tot_tg").isNotNull) // t85's domain: docs with ≥3 tokens
        .select(col("doc_id"),
          (col("top_bg").cast("double") / col("tot_bg") <= 0.06 &&
            col("dup_tg").cast("double") / col("tot_tg") <= 0.2).as("rep_keep"))
      val keep = col("predicted_lang") === "en" &&
        col("quality_score") >= 40.0 && col("rep_keep") && col("is_canonical")
      derived.join(rep, Seq("doc_id"), "left")
        .withColumn("rep_keep", coalesce(col("rep_keep"), lit(false)))
        .select(col("doc_id"), col("predicted_lang"), col("quality_score"),
          col("rep_keep"), col("is_canonical"), keep.as("keep"),
          when(keep, col("split")).as("split"))
        .orderBy("doc_id")
    }),

    /** Sequence packing — the final layout step before LLM training:
      * documents concatenate (in deterministic doc_id order) into
      * fixed-length training sequences of 512 tokens, each doc reporting
      * the sequences it spans and its offset in the first one. Docs cross
      * sequence boundaries (GPT-style concat packing, no padding waste).
      * Packing is PER SOURCE shard: a global token cumsum would serialize
      * the corpus through one window partition, while per-source packs
      * are independent and shard across executors (the t95 skew bound
      * applies to a giant source: one linear window partition). All
      * arithmetic is integer (token counts, floor division), so sequence
      * assignments are bit-identical on any engine or partitioning. */
    "t97_sequence_pack" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val N = 512
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      documents(s, d)
        .select(col("doc_id"), col("source"),
          size(toks(col("text"))).cast("long").as("n_tokens"))
        .withColumn("cum_before",
          sum("n_tokens").over(w) - col("n_tokens"))
        .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_before"),
          floor(col("cum_before") / N).as("seq_first"),
          floor((col("cum_before") + col("n_tokens") - 1) / N).as("seq_last"),
          (col("cum_before") % N).as("offset_in_seq"))
        .orderBy("doc_id")
    }),

    /** Unigram-LM quality scoring with CCNet-style perplexity buckets (a
      * document whose tokens are improbable under the corpus language
      * model is likely noise; CCNet trains/filters by head/middle/tail
      * thirds of the score distribution): corpus unigram distribution
      * from one aggregation, every token scores ln(count/total), docs
      * report their mean token log-probability (rounded to the 1e-6
      * lattice — the s53 precedent for cross-engine stability of a
      * double mean) and their third of the corpus distribution, cut at
      * the exact interpolating ⅓/⅔ percentiles (the q56-proven
      * primitive).
      *
      * Scale shape: the unigram table is vocabulary-sized and carries NO
      * broadcast hint (the t52 rule — Heaps' law growth; AQE may still
      * broadcast when it fits); tokens join it by shuffle on term, then
      * one shuffle on doc_id for the mean. The two percentile cuts are a
      * 2-value global aggregate (broadcast — bounded by construction);
      * the percentile engine is conf-tiered ([[graft.functions
      * .Percentiles]]): exact under `exactPercentileLimit` docs, the
      * mergeable KLL sketch above — the global cut would otherwise
      * funnel every doc's score into ONE buffer. Linear in corpus
      * tokens. */
    "t98_unigram_logprob" -> ((s, d) => {
      val f1 = 1.0 / 3.0
      val f2 = 2.0 / 3.0
      val tokens = documents(s, d)
        .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      val uni = tokens.groupBy("term").agg(count(lit(1)).as("cnt"))
      val total = uni.agg(sum("cnt").as("total_tokens"))
      val scored = tokens.join(uni, "term")
        .crossJoin(broadcast(total))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          round(avg(log(col("cnt").cast("double") / col("total_tokens"))), 6)
            .as("avg_logprob"))
      val cuts = graft.functions.Percentiles.grouped(s, scored, Nil,
        "avg_logprob", Seq(f2, f1), Seq("t_head", "t_mid"),
        graft.functions.Percentiles.exactTierAt(
          s, s"$d#documents", documents(s, d).count()))
      scored.crossJoin(broadcast(cuts))
        .select(col("doc_id"), col("n_tokens"), col("avg_logprob"),
          when(col("avg_logprob") >= col("t_head"), "head")
            .when(col("avg_logprob") >= col("t_mid"), "middle")
            .otherwise("tail").as("ppl_bucket"))
        .orderBy("doc_id")
    }),

    /** TF-IDF: the highest-scoring term per document (tf = term count /
      * doc tokens; idf = ln(N / df); ties break toward the lexicographically
      * smaller term). Two aggregations; NOTHING corpus-derived carries a
      * broadcast hint: doc_len is one row per DOCUMENT and dfreq is one
      * row per distinct TERM — vocabulary grows with the corpus (Heaps'
      * law; web-scale corpora reach 10⁹+ distinct tokens), so a pinned
      * `broadcast(dfreq)` would override AQE's size check and OOM at
      * scale, the exact failure class the r2 verdict flagged (VERDICT r4
      * #2 removed the hint here). Both travel by shuffle join on their
      * keys; AQE still chooses broadcast at test scale when they fit.
      * Only the 1-row global doc count is hinted. */
    "t52_tfidf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val tokens = documents(s, d)
        .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      val docLen = tokens.groupBy("doc_id").agg(count(lit(1)).as("doc_len"))
      val tf = tokens.groupBy("doc_id", "term").agg(count(lit(1)).as("term_count"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val nDocs = documents(s, d).select(countDistinct("doc_id").as("n_docs"))
      val scored = tf
        .join(docLen, "doc_id")
        .join(dfreq, "term")
        .crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("term"),
          ((col("term_count").cast("double") / col("doc_len")) *
            log(col("n_docs").cast("double") / col("df"))).as("tfidf"))
      val w = Window.partitionBy("doc_id").orderBy(desc("tfidf"), col("term"))
      scored.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("term").as("top_term"), col("tfidf"))
        .orderBy("doc_id")
    }),

    /** DSIR-style importance resampling (Xie et al. 2023, "Data Selection
      * for Language Models via Importance Resampling"): score every
      * document by the log-likelihood ratio of a TARGET-domain unigram LM
      * (here the src0/src1 shards stand in for the high-quality target)
      * over the RAW-corpus unigram LM, add-1 smoothed over the union
      * vocabulary, averaged per token instance; select documents whose
      * ratio clears the exact interpolating 75th percentile.
      *
      * Scale shape: both unigram tables are vocabulary-sized and carry NO
      * broadcast hint (the t52 rule); token instances join them by shuffle
      * on term, then one shuffle on doc_id for the mean. The three scalar
      * totals (vocab size, raw/target token counts) are single-row
      * broadcasts bounded by construction, and the selection cut is a
      * 1-value global aggregate, conf-tiered through
      * [[graft.functions.Percentiles]] (exact under the limit, KLL
      * above), plan otherwise unchanged. Linear in corpus tokens; the
      * ratio is rounded to the 1e-6 lattice (the s53 precedent) so
      * selection is engine-stable. */
    "t101_dsir" -> ((s, d) => {
      val targetSources = Seq("src0", "src1")
      val tokens = documents(s, d)
        .select(col("doc_id"), col("source"), explode(toks(col("text"))).as("term"))
      val raw = tokens.groupBy("term").agg(count(lit(1)).as("raw_cnt"))
      val tgt = tokens.filter(col("source").isin(targetSources.map(lit): _*))
        .groupBy("term").agg(count(lit(1)).as("tgt_cnt"))
      val uni = raw.join(tgt, Seq("term"), "left")
        .select(col("term"), col("raw_cnt"), coalesce(col("tgt_cnt"), lit(0L)).as("tgt_cnt"))
      val totals = uni.agg(
        count(lit(1)).as("vocab"),
        sum("raw_cnt").as("tot_raw"),
        sum("tgt_cnt").as("tot_tgt"))
      val scored = tokens.join(uni, "term")
        .crossJoin(broadcast(totals))
        .groupBy("doc_id", "source")
        .agg(count(lit(1)).as("n_tokens"),
          round(avg(
            log((col("tgt_cnt") + 1).cast("double") / (col("tot_tgt") + col("vocab"))) -
              log((col("raw_cnt") + 1).cast("double") / (col("tot_raw") + col("vocab")))), 6)
            .as("avg_logratio"))
      val cut = graft.functions.Percentiles.grouped(s, scored, Nil,
        "avg_logratio", Seq(0.75), Seq("t_sel"),
        graft.functions.Percentiles.exactTierAt(
          s, s"$d#documents", documents(s, d).count()))
      scored.crossJoin(broadcast(cut))
        .select(col("doc_id"), col("source"), col("n_tokens"), col("avg_logratio"),
          (col("avg_logratio") >= col("t_sel")).as("selected"))
        .orderBy("doc_id")
    }),

    /** Cross-document n-gram novelty (the memorization/duplication lens of
      * Lee et al. 2022, "Deduplicating Training Data Makes Language Models
      * Better"): for each document, the fraction of its DISTINCT 8-grams
      * that no earlier document (smaller doc_id) contains. Low novelty
      * flags near-copies that survive exact dedup. Domain: docs with ≥8
      * tokens (shorter docs have no 8-gram — excluded, like t85's ≥3
      * rule).
      *
      * Scale shape: the gram stream travels ONCE — an explicit
      * co-partition on the gram alone satisfies both the distinct-pair
      * aggregation (clustering on (gram, doc_id) is coarsened by gram)
      * and the first-doc window, so Catalyst inserts no second exchange
      * between them (asserted in PlanAuditSpec). A corpus-hot gram makes
      * a large window partition but the min() scan is linear (the t95
      * skew bound). One final shuffle on doc_id. The ratio is exact
      * integer/integer so it is bit-stable on any engine. */
    "t102_novelty" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val n = 8
      val grams = docsSpread(s, d)
        .select(col("doc_id"), toks(col("text")).as("t"))
        .filter(size(col("t")) >= n)
        .select(col("doc_id"), explode(expr(
          s"transform(sequence(1, size(t) - ${n - 1}), i -> array_join(slice(t, i, $n), ' '))"))
          .as("gram"))
      val pairs = grams.repartition(col("gram"))
        .groupBy("gram", "doc_id").agg(count(lit(1)).as("occ"))
      val w = Window.partitionBy("gram")
      pairs.withColumn("first_doc", min("doc_id").over(w))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_distinct_grams"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"),
          (sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).cast("double") /
            count(lit(1))).as("novelty"))
        .orderBy("doc_id")
    }),

    /** Cross-source 8-gram contamination matrix — for every source pair,
      * the count of shared distinct 8-grams and the Jaccard overlap: the
      * corpus-design signal for "are these two crawls/snapshots secretly
      * the same data?" (complements d88's corpus-vs-eval direction).
      *
      * Scale shape: ONE shuffle on gram. Distinct (gram, source) pairs
      * collapse to a per-gram source-SET (bounded by the source count S,
      * a catalog-sized constant — never corpus-sized), pair expansion is
      * S²-bounded per gram, and everything downstream operates on
      * ≤ S²+S rows. No gram self-join: a hot gram costs |sources| set
      * entries, not candidate² rows. The tiny pair/count aggregate is
      * localCheckpoint'ed because two outputs consume it — without the
      * barrier the whole gram pipeline would execute twice. */
    "t111_source_overlap" -> ((s, d) => {
      val n = 8
      val grams = docsSpread(s, d)
        .select(col("source"), toks(col("text")).as("t"))
        .filter(size(col("t")) >= n)
        .select(col("source"), explode(expr(
          s"transform(sequence(1, size(t) - ${n - 1}), i -> array_join(slice(t, i, $n), ' '))"))
          .as("gram"))
      val perGram = grams.repartition(col("gram"))
        .groupBy("gram").agg(collect_set("source").as("ss"))
      // one explode emits both unordered source pairs (a < b) and
      // singleton (a, null) rows, so pair-overlap counts and per-source
      // gram counts come out of ONE aggregation
      val agg = perGram.select(explode(expr(
          "concat(" +
            "flatten(transform(ss, a -> transform(filter(ss, b -> a < b), " +
            "b -> struct(a AS sa, b AS sb)))), " +
            "transform(ss, a -> struct(a AS sa, CAST(NULL AS STRING) AS sb)))"))
          .as("p"))
        .groupBy(col("p.sa").as("sa"), col("p.sb").as("sb"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true)
      val counts = agg.filter(col("sb").isNull).select(col("sa"), col("cnt"))
      val shared = agg.filter(col("sb").isNotNull)
        .select(col("sa").as("source_a"), col("sb").as("source_b"),
          col("cnt").as("sh"))
      val px = counts.toDF("source_a", "n_grams_a")
        .crossJoin(counts.toDF("source_b", "n_grams_b"))
        .filter(col("source_a") < col("source_b"))
      px.join(shared, Seq("source_a", "source_b"), "left")
        .withColumn("shared_grams", coalesce(col("sh"), lit(0L)))
        .withColumn("jaccard", col("shared_grams").cast("double") /
          (col("n_grams_a") + col("n_grams_b") - col("shared_grams")).cast("double"))
        .select("source_a", "source_b", "shared_grams", "n_grams_a",
          "n_grams_b", "jaccard")
        .orderBy("source_a", "source_b")
    }),

    /** BPE tokenizer training (Sennrich et al. 2016), 3 greedy merge
      * rounds: words become character sequences, each round counts
      * adjacent symbol pairs weighted by word frequency, merges the
      * most frequent pair corpus-wide (ties break lexicographically),
      * and rewrites every word left-to-right non-overlapping. Output is
      * the merge table — the artifact a tokenizer ships.
      *
      * Scale shape: the word-count vocabulary and every per-round pair
      * count are distributed aggregates (vocabulary-sized, no broadcast
      * hint); the ONLY driver materialization is each round's argmax — a
      * single (left, right, count) row per round, the bounded-scalar
      * barrier every iterative trainer has (s90's centroids, the ETL
      * medians). The left-to-right rewrite is a codegen'd `aggregate`
      * fold over each word's symbol array — linear in corpus characters
      * per round, no shuffle beyond the pair count. */
    "t106_bpe_train" -> ((s, d) => {
      val (merges, _) = bpeTrain(s, d)
      import s.implicits._
      merges.toDF("merge_rank", "lhs", "rhs", "merged", "weighted_count")
        .orderBy("merge_rank")
    }),

    /** BPE encoding: apply the trained merge table to the corpus and
      * report per-document token statistics (word count, BPE token
      * count, term characters, chars-per-token compression ratio) — the
      * "tokenize 100 TB for pretraining" pass.
      *
      * Scale shape: the rewrite runs once per DISTINCT term (the
      * vocabulary), not once per occurrence — the standard
      * tokenizer-apply optimization; per-document stats are then one
      * shuffle join on term (vocabulary side carries NO broadcast hint —
      * the t52 rule, Heaps' law growth; AQE may still broadcast when it
      * fits) plus one partial+final aggregate on doc_id. */
    "t107_bpe_encode" -> ((s, d) => {
      val (_, vocab) = bpeTrain(s, d)
      val perTerm = vocab.select(col("term"),
        size(col("syms")).cast("long").as("term_toks"),
        length(col("term")).cast("long").as("term_chars"))
      documents(s, d)
        .select(col("doc_id"), explode(toks(col("text"))).as("term"))
        .join(perTerm, Seq("term"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum("term_toks").as("n_bpe_tokens"),
          sum("term_chars").as("n_term_chars"))
        .withColumn("chars_per_token",
          col("n_term_chars").cast("double") / col("n_bpe_tokens").cast("double"))
        .orderBy("doc_id")
    }),

    /** Hashed linear quality classifier INFERENCE (the fastText shape,
      * Joulin et al. 2016: bag of hashed unigram+bigram features → linear
      * score): each feature hashes into a 2¹⁶ bucket via the first 4 md5
      * hex chars (portable — the t69 trick), the bucket's fixed weight is
      * a deterministic integer mix `(bucket·40503 mod 2¹⁶) − 2¹⁵`, and
      * the doc's score is the mean feature weight. Stands in for a
      * trained quality model at identical plan shape: model application
      * at 100 TB is THIS — a shuffle-free codegen'd fold per document
      * (feature array built once per row, `aggregate` accumulates the
      * integer score; no explode, no join, no vocabulary table at all —
      * the hashing trick replaces the embedding lookup). Integer-exact
      * until the final mean, so it hash-gates cleanly. */
    "t113_quality_classifier" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), toks(col("text")).as("t"))
        .withColumn("feats", expr(
          "concat(t, zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1), " +
            "(a, b) -> concat(a, ' ', b)))"))
        .select(
          col("doc_id"),
          size(col("feats")).cast("long").as("n_feats"),
          expr("aggregate(feats, 0L, (acc, f) -> acc + " +
            "(cast(conv(substring(md5(cast(f as binary)), 1, 4), 16, 10) as bigint) " +
            "* 40503) % 65536 - 32768)").as("score_sum"))
        .withColumn("score",
          col("score_sum").cast("double") / (col("n_feats").cast("double") * 32768.0))
        .withColumn("keep", col("score_sum") > 0L)
        .orderBy("doc_id")),

    /** Bigram-LM perplexity scoring (the CCNet/KenLM direction, Wenzek
      * et al. 2020, at n=2): P(w₂|w₁) = (c(w₁w₂)+1) / (c(w₁)+V) with
      * add-1 smoothing over the corpus vocabulary, per-document mean log
      * probability over bigram instances, tertile-bucketed head/middle/
      * tail exactly like t98's unigram variant — the conditional model
      * separates formulaic from surprising text far better than raw
      * unigram frequency.
      *
      * Scale shape: bigram instances are built per-row (zip_with over
      * offset slices — no self-join); the unigram and bigram count
      * tables are vocabulary-sized and travel by shuffle join on their
      * keys with NO broadcast hint (the t52 rule — bigram vocabulary
      * grows faster than Heaps' law); the only broadcasts are the 1-row
      * vocabulary size and the 2-value tertile cut, conf-tiered through
      * [[graft.functions.Percentiles]] (exact under the limit, KLL
      * above). */
    "t114_bigram_logprob" -> ((s, d) => {
      val f1 = 1.0 / 3.0
      val f2 = 2.0 / 3.0
      val bg = documents(s, d)
        .select(col("doc_id"), toks(col("text")).as("t"))
        .filter(size(col("t")) >= 2)
        .select(col("doc_id"), explode(expr(
          "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1), " +
            "(a, b) -> struct(a AS w1, b AS w2))")).as("p"))
        .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      val tokens = documents(s, d)
        .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      val uni = tokens.groupBy(col("term").as("w1")).agg(count(lit(1)).as("c1"))
      val vocab = uni.agg(count(lit(1)).as("v"))
      val big = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      val scored = bg
        .join(big, Seq("w1", "w2"))
        .join(uni, Seq("w1"))
        .crossJoin(broadcast(vocab))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(log((col("c2") + 1L).cast("double") / (col("c1") + col("v")))), 6)
            .as("avg_logprob"))
      val cuts = graft.functions.Percentiles.grouped(s, scored, Nil,
        "avg_logprob", Seq(f2, f1), Seq("t_head", "t_mid"),
        graft.functions.Percentiles.exactTierAt(
          s, s"$d#documents", documents(s, d).count()))
      scored.crossJoin(broadcast(cuts))
        .select(col("doc_id"), col("n_bigrams"), col("avg_logprob"),
          when(col("avg_logprob") >= col("t_head"), "head")
            .when(col("avg_logprob") >= col("t_mid"), "middle")
            .otherwise("tail").as("ppl_bucket"))
        .orderBy("doc_id")
    }),

    /** Temperature-based source mixture plan (the multilingual-sampling
      * rule of Conneau & Lample 2019, α = 0.5): per-source sampling
      * weight ∝ n_tokens^α flattens the size distribution so small
      * sources are not drowned out; the plan allocates a token budget of
      * half the corpus across sources by normalized weight and reports
      * the implied epochs (>1 = source is repeated, the up-sampling
      * signal). The weight lives on an integer MILLI-lattice
      * (⌊√n_tokens·1000⌋) before any summation — a float sum's value
      * depends on accumulation order, which differs between engines and
      * between partition counts, while integer sums are exact in any
      * order (the s103 decimal-lattice rule); the divisions after the
      * sums are single correctly-rounded IEEE ops, deterministic
      * everywhere.
      *
      * Scale shape: one partial+final aggregate on source (catalog-sized,
      * like t111); the totals row is a legitimate 1-row broadcast. The
      * per-source table this emits is exactly the sampler config a
      * training-data loader consumes. */
    "t115_mixture_temperature" -> ((s, d) => {
      val perSource = documents(s, d)
        .select(col("source"), size(toks(col("text"))).cast("long").as("n_tok"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
        .withColumn("weight_milli",
          floor(sqrt(col("n_tokens").cast("double")) * 1000.0).cast("long"))
      val totals = perSource.agg(
        sum("n_tokens").as("tot_tokens"), sum("weight_milli").as("tot_weight_milli"))
      perSource.crossJoin(broadcast(totals))
        .withColumn("sample_prob",
          col("weight_milli").cast("double") / col("tot_weight_milli").cast("double"))
        .withColumn("target_tokens",
          floor(col("sample_prob") * expr("cast(tot_tokens div 2 as double)"))
            .cast("long"))
        .withColumn("epochs",
          round(col("target_tokens").cast("double") / col("n_tokens").cast("double"), 6))
        .select(col("source"), col("n_docs"), col("n_tokens"), col("weight_milli"),
          round(col("sample_prob"), 6).as("sample_prob"),
          col("target_tokens"), col("epochs"))
        .orderBy("source")
    }),

    /** Per-document token entropy — the information-theoretic quality
      * signal (low entropy = keyword-stuffed/templated text even when
      * t85's ratio filters pass): Shannon entropy of the doc's own token
      * distribution, its ceiling-normalized variant (÷ ln n_types), and
      * the type-token ratio. Identity used: −Σ (c/n)·ln(c/n) =
      * −(1/n)·Σ c·ln(c/n), all from one (doc, term, count) aggregate.
      *
      * Scale shape: two key-local aggregations (doc×term, then doc) and
      * one join on doc_id — per-doc state only, nothing corpus-global at
      * all (unlike t98/t114 there is no vocabulary table); rounds to the
      * 1e-6 lattice per the t98 precedent. */
    "t121_token_entropy" -> ((s, d) => {
      val tf = documents(s, d)
        .select(col("doc_id"), explode(toks(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      val dl = tf.groupBy("doc_id")
        .agg(sum("c").as("n"), count(lit(1)).as("n_types"))
      tf.join(dl, "doc_id")
        .groupBy("doc_id")
        .agg(max("n").as("n_tokens"), max("n_types").as("n_types"),
          (-sum(col("c").cast("double") * log(col("c").cast("double") / col("n")))
            / max("n")).as("h"))
        .select(col("doc_id"), col("n_tokens"), col("n_types"),
          (col("n_types").cast("double") / col("n_tokens")).as("ttr"),
          round(col("h"), 6).as("entropy"),
          when(col("n_types") > 1L, round(col("h") / log(col("n_types").cast("double")), 6))
            .otherwise(0.0).as("norm_entropy"))
        .orderBy("doc_id")
    }),

    /** Out-of-vocabulary rate — per document, the fraction of token
      * instances whose corpus frequency is below a min-count threshold
      * (5, the classic word2vec/fastText vocabulary cut): high OOV =
      * noisy/garbled text, and the aggregate OOV mass is exactly what a
      * tokenizer's <unk> budget must absorb. All-integer counts until
      * the final rate.
      *
      * Scale shape: one vocabulary-sized unigram aggregate joined back
      * to token instances by shuffle on term (NO broadcast hint — the
      * t52 rule), then one partial+final aggregate on doc_id. */
    "t124_oov_rate" -> ((s, d) => {
      val tokens = documents(s, d)
        .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      val uni = tokens.groupBy("term").agg(count(lit(1)).as("cnt"))
      tokens.join(uni, "term")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("cnt") < 5L, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_rate",
          col("n_oov").cast("double") / col("n_tokens").cast("double"))
        .withColumn("high_oov", col("oov_rate") > 0.2)
        .orderBy("doc_id")
    }),

    /** Deterministic corpus shuffle into training shards — the "global
      * shuffle before sharding" step every pretraining pipeline runs so
      * no shard is biased by ingestion order: shuffle key = md5 of the
      * doc id with a version salt (reshuffling = bump the salt, exactly
      * like t69's stable splits), shard = hash-bucket of the key,
      * position within the shard = rank by the key. Every assignment is
      * a pure function of (doc_id, salt) — reproducible across runs,
      * engines, and partition counts, which rand() shuffles cannot
      * promise.
      *
      * Scale shape: hash-assigning shards directly (instead of a global
      * rank mod-ed into shards) means there is NO total order anywhere —
      * a global row_number would funnel the corpus through one window
      * partition; here each shard sorts independently under a
      * shard-partitioned window, and real deployments use thousands of
      * shards, so parallelism scales with the output. */
    "t127_shuffle_shards" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val shards = 16
      val key = md5(concat(col("doc_id").cast("string"), lit(":shuffle-v1"))
        .cast("binary"))
      val w = Window.partitionBy("shard").orderBy(col("shuffle_key"), col("doc_id"))
      documents(s, d)
        .select(col("doc_id"), key.as("shuffle_key"))
        .withColumn("shard",
          pmod(conv(substring(col("shuffle_key"), 1, 4), 16, 10).cast("long"),
            lit(shards.toLong)))
        .withColumn("pos_in_shard", (row_number().over(w) - 1).cast("long"))
        .select("doc_id", "shuffle_key", "shard", "pos_in_shard")
        .orderBy("doc_id")
    }),

    /** Per-source equi-depth length bands (quartile bucketing) — the
      * "assign every doc a length band within its source" primitive
      * behind curriculum mixes and per-band sampling rates. The SCALABLE
      * shape for exact quantile bucketing: compute each source's three
      * exact interpolating quartile boundaries with ONE aggregation
      * (3 doubles per source — bounded metadata, the same barrier q14's
      * median pays), join the boundary row back on source, and band by
      * three codegen comparisons. No global sort, no per-source window
      * rank over the corpus — the corpus-sized side only ever scans and
      * joins against a source-count-sized frame (no broadcast hint; AQE
      * picks broadcast at any realistic source count, per the t52 rule). */
    "t137_length_bands" -> ((s, d) => {
      val docs = documents(s, d)
      val bounds = graft.functions.Percentiles.grouped(s, docs,
        Seq("source"), "n_chars", Seq(0.25, 0.5, 0.75),
        Seq("q1", "q2", "q3"),
        graft.functions.Percentiles.exactTierAt(s, s"$d#documents", docs.count()))
      docs.select(col("doc_id"), col("source"), col("n_chars"))
        .join(bounds, "source")
        .select(col("doc_id"), col("source"), col("n_chars"),
          (lit(1L) + (col("n_chars") > col("q1")).cast("long") +
            (col("n_chars") > col("q2")).cast("long") +
            (col("n_chars") > col("q3")).cast("long")).as("band"))
        .orderBy("doc_id")
    }),

    /** C4-style corpus-level LINE dedup with document reconstruction
      * (Raffel et al. §2.2 keep-one-occurrence rule, at t73's sentence
      * grain): every sentence keeps only its globally-FIRST occurrence
      * (lowest doc_id, then position); each document is re-emitted with
      * its surviving sentences in original order plus kept/total counts
      * — the preprocessing step that removes boilerplate lines repeated
      * across a crawl.
      *
      * Scale shape: one shuffle keyed on the sentence (the min-occurrence
      * agg), one join back, one per-doc agg — no window over the corpus,
      * no driver state. Reconstruction sorts WITHIN each doc's collected
      * array (bounded by doc length), not across the corpus. */
    "t144_line_dedup" -> ((s, d) => {
      val sents = documents(s, d)
        .select(col("doc_id"),
          filter(transform(split(col("text"), "[.!?]+"), x => trim(x)),
            x => length(x) > 0).as("sents"))
        .select(col("doc_id"), posexplode(col("sents")))
        .toDF("doc_id", "pos", "sentence")
      val keeper = sents.groupBy("sentence")
        .agg(min(struct(col("doc_id"), col("pos"))).as("k"))
        .select(col("sentence"), col("k.doc_id").as("kdoc"), col("k.pos").as("kpos"))
      sents.join(keeper, "sentence")
        .withColumn("kept", col("doc_id") === col("kdoc") && col("pos") === col("kpos"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_sentences"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          array_join(transform(
            array_sort(collect_list(when(col("kept"),
              struct(col("pos"), col("sentence"))))),
            x => x.getField("sentence")), " ").as("cleaned_text"))
        .orderBy("doc_id")
    }),

    "t146_weighted_sample" -> ((s, d) => {
      /* Weighted sampling WITHOUT replacement, k = 100, weight ∝ n_chars —
       * the mixture-materialization primitive (t70/t115 PLAN per-source
       * token budgets; this op actually DRAWS the documents): one pass,
       * Efraimidis & Spirakis A-ES (IPL 2006, public): per-record key
       * u^(1/w) with u uniform(0,1), top-k by key — provably equivalent
       * to sequential weighted draws without replacement.
       *
       * u is DETERMINISTIC: the md5(doc_id‖salt) 13-hex-digit prefix h
       * gives u = (h + 0.5) / 2^52, exact in binary double (numerator
       * and the power-of-two divisor are both exact), so both engines
       * start from bit-identical uniforms and the 1e-9 comparator
       * tolerance only has to absorb pow's last-ulp.
       *
       * Scale shape: per-record arithmetic + ONE top-k — orderBy.limit
       * compiles to TakeOrderedAndProject (per-partition bounded heaps,
       * k-row driver merge; PlanAuditSpec-style shape, no global sort).
       * The rank window runs AFTER the limit, over k rows only. */
      import org.apache.spark.sql.expressions.Window
      val k = 100
      val h = conv(substring(md5(
        concat(col("doc_id").cast("string"), lit("|es")).cast("binary")), 1, 13),
        16, 10).cast("long")
      val u = (h.cast("double") + lit(0.5)) / lit(4503599627370496.0) // 2^52
      documents(s, d)
        .select(col("doc_id"), col("n_chars").cast("long").as("weight"),
          pow(u, lit(1.0) / col("n_chars").cast("double")).as("sample_key"))
        .orderBy(col("sample_key").desc, col("doc_id")).limit(k)
        .withColumn("sample_rank",
          row_number().over(Window.orderBy(col("sample_key").desc, col("doc_id")))
            .cast("long"))
        .orderBy("sample_rank")
    }),

    "t147_compression_ratio" -> ((s, d) => {
      /* Per-source deflate-compression-ratio quality signal — the
       * low-cost repetition/boilerplate detector production corpus
       * filters run alongside t85's n-gram fractions (highly repetitive
       * text compresses far below prose; near-random text barely
       * compresses at all). Ratio = raw DEFLATE (level 6, nowrap) size /
       * UTF-8 byte size, computed partition-locally with one reused
       * native Deflater per task — a pure scan shape, no shuffle before
       * the per-source aggregate.
       *
       * Gate style: the compressed byte count is engine-internal (zlib
       * build specific), so — exactly the q65/q91 sketch pattern — the
       * query emits exact-recomputable columns (n_docs, total UTF-8
       * bytes) plus CLAIM booleans (every ratio in (0.02, 1.05], source
       * mean in (0.1, 1.0)) that DuckDB asserts true; CompressionSpec
       * carries the behavioral checks (known-content ratios, determinism,
       * repetitive ≪ high-entropy). */
      import s.implicits._
      val per = documents(s, d)
        .select(col("doc_id"), col("source"), col("text"))
        .as[(Long, String, String)]
        .mapPartitions { it =>
          val defl = new java.util.zip.Deflater(6, true)
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ => defl.end()))
          val buf = new Array[Byte](64 * 1024)
          it.map { case (id, src, text) =>
            val raw = text.getBytes("UTF-8")
            defl.reset(); defl.setInput(raw); defl.finish()
            var n = 0L
            while (!defl.finished()) n += defl.deflate(buf)
            (id, src, raw.length.toLong, n)
          }
        }
        .toDF("doc_id", "source", "raw_bytes", "comp_bytes")
        .withColumn("ratio", col("comp_bytes").cast("double") / col("raw_bytes"))
      per.groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("raw_bytes").as("total_raw_bytes"),
          max("ratio").as("maxr"), min("ratio").as("minr"),
          avg("ratio").as("meanr"))
        .select(col("source"), col("n_docs"), col("total_raw_bytes"),
          (col("maxr") <= 1.05).as("every_ratio_le_105"),
          (col("minr") > 0.02).as("every_ratio_gt_002"),
          (col("meanr") > 0.1 && col("meanr") < 1.0).as("mean_ratio_in_band"))
        .orderBy("source")
    }),

    "t155_vocab_growth" -> ((s, d) => {
      /* Vocabulary-growth curve (Heaps'-law measurement — the
       * tokenizer-budget planning signal: how fast does distinct
       * vocabulary grow as corpus coverage grows?). Docs land in ten
       * DETERMINISTIC md5 buckets — a hash split, NOT a global
       * row_number, so the "corpus prefix" ordering needs no global
       * sort and the same plan runs at any corpus size (the t127
       * lesson). Per token the MIN bucket is its first appearance;
       * cumulative distinct vocabulary at bucket k = tokens whose min
       * bucket ≤ k.
       *
       * Scale shape: one (token)-keyed shuffle for the min-bucket
       * aggregate, one token-instance count per bucket, then windows
       * over TEN rows. */
      import org.apache.spark.sql.expressions.Window
      val bucket = (pmod(conv(substring(md5(col("doc_id").cast("string")
        .cast("binary")), 1, 13), 16, 10).cast("long"), lit(10L)) + 1L).as("bucket")
      val tok = documents(s, d)
        .select(bucket, explode(toks(col("text"))).as("token"))
      val firstSeen = tok.groupBy("token").agg(min("bucket").as("first_bucket"))
        .groupBy("first_bucket").agg(count(lit(1)).as("new_tokens"))
      val instances = tok.groupBy("bucket").agg(count(lit(1)).as("bucket_tokens"))
      val w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
      instances
        .join(firstSeen.withColumnRenamed("first_bucket", "bucket"),
          Seq("bucket"), "left")
        .select(col("bucket"), col("bucket_tokens"),
          coalesce(col("new_tokens"), lit(0L)).as("new_tokens"))
        .withColumn("cum_tokens", sum("bucket_tokens").over(w))
        .withColumn("cum_vocab", sum("new_tokens").over(w))
        .orderBy("bucket")
    }),

    /** PMI collocation mining — statistically-bound word pairs (t51
      * ranks bigrams by raw frequency, which surfaces stopword pairs;
      * PMI log[ P(xy) / (P(x)·P(y)) ] surfaces pairs that co-occur far
      * above chance — the classic collocation / phrase-detection signal
      * feeding tokenizer merges and phrase vocabularies). Unigram
      * probabilities come from the token stream, bigram probabilities
      * from the adjacent-pair stream; a min-count floor (≥5) kills the
      * unstable low-frequency tail. PMI is computed in log space
      * (ln c_xy + 2·ln N_tok − ln N_big − ln c_x − ln c_y) and ROUNDED
      * to 6 places before the rank-order, so the top-50 cut and the
      * (pmi, bigram) output order are deterministic across engines.
      *
      * Scale shape: two token-keyed partial+final aggregates (unigram,
      * bigram counts) over one corpus scan each; the two scalar totals
      * attach via the F15 lazy-broadcast pattern (1-row cross join); the
      * unigram side joins back onto the SURVIVING (floored) bigram rows
      * — vocabulary-sized, not corpus-sized — and the top-50 is
      * TakeOrdered, no global sort. */
    "t160_pmi_collocations" -> ((s, d) => {
      val t = documents(s, d).select(toks(col("text")).as("t"))
      val uni = t.select(explode(col("t")).as("term"))
        .groupBy("term").agg(count(lit(1)).as("c"))
      val nTok = uni.agg(sum("c").as("n_tok"))
      val bg = t.select(explode(when(size(col("t")) >= 2,
          expr("transform(sequence(0, size(t)-2), i -> struct(t[i] AS w1, t[i+1] AS w2))"))
          .otherwise(array())).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      val nBig = bg.agg(sum("c_xy").as("n_big"))
      bg.filter(col("c_xy") >= 5)
        .join(uni.select(col("term").as("w1"), col("c").as("c_x")), "w1")
        .join(uni.select(col("term").as("w2"), col("c").as("c_y")), "w2")
        .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBig))
        .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"),
          round(log(col("c_xy")) + lit(2.0) * log(col("n_tok")) -
            log(col("n_big")) - log(col("c_x")) - log(col("c_y")), 6)
            .as("pmi"))
        .orderBy(desc("pmi"), col("w1"), col("w2"))
        .limit(50)
    }),

    /** Per-language tokenizer fertility (the multilingual budget metric
      * tokenizer papers report: subword tokens per whitespace word, and
      * bytes per token — high-fertility languages burn context budget
      * faster and need vocabulary re-balancing): t33's two tokenizers
      * (whitespace, BPE-ish regex) + UTF-8 byte lengths, rolled up per
      * ground-truth `lang`. All-integer sums; three exact divisions at
      * the end — deterministic doubles cross-engine.
      *
      * Scale shape: pure scan (regex counts are per-row, no token
      * explode) into one partial+final aggregate over |languages| groups. */
    "t179_fertility" -> ((s, d) =>
      documents(s, d)
        .select(col("lang"),
          size(toks(col("text"))).cast("long").as("ws"),
          regexp_count(col("text"), lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"))
            .cast("long").as("sub"),
          octet_length(col("text")).cast("long").as("bytes"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("ws").as("n_words"), sum("sub").as("n_subtokens"),
          sum("bytes").as("n_bytes"))
        .select(col("lang"), col("n_docs"), col("n_words"),
          col("n_subtokens"), col("n_bytes"),
          round(col("n_subtokens") / col("n_words"), 9).as("fertility"),
          round(col("n_bytes") / col("n_subtokens"), 9).as("bytes_per_subtoken"),
          round(col("n_bytes") / col("n_words"), 9).as("bytes_per_word"))
        .orderBy("lang")),

    /** Per-document language-mixture detection (the code-switching flag
      * single-label langid (t35) structurally misses — a half-English
      * half-Spanish doc gets ONE label there and silently pollutes both
      * language buckets downstream): per doc the marker hits for every
      * language, languages hit, the top language's hit share, and a
      * mixed verdict (≥4 total hits, ≥2 languages, top share < 3/4 —
      * evaluated as 4·top < 3·total so the boundary is INTEGER-exact,
      * never a double comparison). Shuffle-free scan; the share is the
      * only double and rounds on an exact small-integer ratio. */
    "t187_language_mixture" -> ((s, d) => {
      val t = toks(col("text"))
      val scores = langMarkers.map { case (l, ms) => l -> markerCount(t, ms) }
      val total = scores.map(_._2).reduce(_ + _)
      val top = greatest(scores.map(_._2): _*)
      val nhit = scores.map(_._2 > 0L).map(_.cast("long")).reduce(_ + _)
      documents(s, d)
        .select(Seq(col("doc_id")) ++
          scores.map { case (l, c) => c.as(s"hits_$l") } ++ Seq(
          total.as("total_hits"),
          nhit.as("n_langs_hit"),
          when(total > 0L, round(top / total, 9)).otherwise(lit(null))
            .as("top_share"),
          (total >= 4L && nhit >= 2L && top * 4L < total * 3L)
            .as("is_mixed")): _*)
        .orderBy("doc_id")
    }),

    /** Zipf rank–frequency fit (the corpus-statistics classic: natural
      * text follows freq ∝ rank^(−s), s ≈ 1 — a slope far from −1 flags
      * synthetic/templated corpora): token counts → top-200 terms by
      * frequency (TakeOrdered bounded heap, NOT a vocabulary-wide sort)
      * → OLS of ln(freq) on ln(rank) via the regr_* aggregates over the
      * 200-row fit set. Corpus totals ride along.
      *
      * Scale shape: one partial+final term count (the only corpus-sized
      * work), a 200-row bounded heap, and window+regression over 200
      * rows — vocabulary size never sorts globally. Tie-break (count
      * desc, term) makes the fit set deterministic; ln() on exact
      * integer counts is bit-identical cross-engine. */
    /** Dedup-strategy impact report (the curation question "which dedup
      * grain buys how much"): for each of the three exact grains — whole
      * document (d37), sentence (t144), aligned 30-token chunk (d86) —
      * keep-first dedup's unit and TOKEN reduction, side by side in one
      * long-form table. Token accounting is per-strategy (the sentence
      * split drops punctuation-only segments, so totals legitimately
      * differ); everything is integer except the final ratio, rounded
      * to 9.
      *
      * Scale shape: three independent scan → keyed-window/first-keeper →
      * aggregate pipelines, each the shape of the operator it audits;
      * the union is 3 rows. */
    /** Gopher quality-rule battery (Rae et al. 2021, MassiveText filters,
      * Appendix A.1.1): word-count bounds, mean-word-length band,
      * symbol-to-word ratio (# / ellipsis), alphabetic-word ratio, and
      * the ≥2-stopword requirement — each rule emitted as its own flag
      * plus the conjunction. Distinct from t34's blended score: the rule
      * battery is what curation pipelines actually gate and tune on.
      *
      * Determinism: every ratio is ONE IEEE division of two exact longs
      * (identical bits on both engines); flags compare those exact
      * quotients. Scale shape: pure per-row scan — the tokens array is
      * projected once and every rule folds over it; no shuffle except
      * the presentation sort. */
    "t217_gopher_filters" -> ((s, d) => {
      val base = documents(s, d).select(
        col("doc_id"),
        size(toks(col("text"))).cast("long").as("n_words"),
        length(regexp_replace(col("text"), "\\s+", "")).cast("long").as("n_nonspace"),
        size(filter(toks(col("text")), w => w.rlike("[A-Za-z]"))).cast("long")
          .as("n_alpha_words"),
        regexp_count(col("text"), lit("#|\\.\\.\\.")).cast("long").as("n_symbols"),
        markerCount(toks(col("text")), gopherStops).as("stop_hits"))
      val meanWl = col("n_nonspace").cast("double") / col("n_words").cast("double")
      val symbolRatio = col("n_symbols").cast("double") / col("n_words").cast("double")
      val alphaRatio = col("n_alpha_words").cast("double") / col("n_words").cast("double")
      base.select(
        col("doc_id"), col("n_words"), col("n_alpha_words"), col("n_symbols"),
        col("stop_hits"),
        meanWl.as("mean_word_len"),
        col("n_words").between(50L, 100000L).as("pass_word_count"),
        (meanWl >= 3.0 && meanWl <= 10.0).as("pass_mean_word_len"),
        (symbolRatio < 0.1).as("pass_symbol_ratio"),
        (alphaRatio > 0.8).as("pass_alpha_ratio"),
        (col("stop_hits") >= 2L).as("pass_stopwords"))
        .withColumn("gopher_keep",
          col("pass_word_count") && col("pass_mean_word_len") &&
            col("pass_symbol_ratio") && col("pass_alpha_ratio") &&
            col("pass_stopwords"))
        .orderBy("doc_id")
    }),

    /** C4 heuristic filter battery (Raffel et al. 2020 §2.2): the
      * lorem-ipsum / curly-brace / "javascript" content screens, the
      * ≥3-sentence minimum, and the terminal-punctuation rule, per doc
      * with the conjunction. On this corpus the sentence rule fails
      * everywhere (the synthetic docs carry no punctuation) — the audit
      * reports what the data shows, q202's rule.
      *
      * Scale shape: per-row boolean scans over codegen'd string
      * predicates; no shuffle except the presentation sort. */
    "t218_c4_filters" -> ((s, d) => {
      val lowered = lower(col("text"))
      documents(s, d).select(
        col("doc_id"),
        size(toks(col("text"))).cast("long").as("n_words"),
        regexp_count(col("text"), lit("[.!?]+")).cast("long").as("n_sentences"),
        col("text").contains("{").as("has_brace"),
        lowered.contains("lorem ipsum").as("has_lorem"),
        lowered.contains("javascript").as("has_javascript"),
        col("text").rlike("[.!?\"]$").as("ends_terminal"))
        .withColumn("c4_keep",
          col("n_sentences") >= 3L && col("n_words") >= 5L &&
            !col("has_brace") && !col("has_lorem") && !col("has_javascript"))
        .orderBy("doc_id")
    }),

    "t215_dedup_impact" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      def summarize(units: DataFrame, name: String): DataFrame =
        // units: (kept boolean, nt long)
        units.agg(count(lit(1)).as("n_units"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum("nt").as("tokens_total"),
          sum(when(col("kept"), col("nt")).otherwise(0L)).as("tokens_kept"))
          .select(lit(name).as("strategy"), col("n_units"), col("n_kept"),
            col("tokens_total"), col("tokens_kept"),
            round(lit(1.0) - col("tokens_kept").cast("double") /
              col("tokens_total"), 9).as("token_reduction"))
      val docs = documents(s, d)
        .select(col("doc_id"), size(toks(col("text"))).cast("long").as("nt"),
          md5(col("text").cast("binary")).as("h"))
        .withColumn("kept", row_number().over(
          Window.partitionBy("h").orderBy("doc_id")) === 1)
      val sents = documents(s, d)
        .select(col("doc_id"),
          filter(transform(split(col("text"), "[.!?]+"), x => trim(x)),
            x => length(x) > 0).as("sents"))
        .select(col("doc_id"), posexplode(col("sents")))
        .toDF("doc_id", "pos", "sentence")
        .withColumn("nt", size(toks(col("sentence"))).cast("long"))
        .withColumn("kept", row_number().over(
          Window.partitionBy("sentence").orderBy("doc_id", "pos")) === 1)
      val chunks = documents(s, d)
        .select(col("doc_id"), toks(col("text")).as("t"))
        .select(col("doc_id"),
          explode(sequence(lit(0), size(col("t")) - 1, lit(30))).as("start"),
          col("t"))
        .select(col("doc_id"), (col("start") / 30).cast("long").as("chunk_idx"),
          least(lit(30L), size(col("t")).cast("long") - col("start")).as("nt"),
          md5(concat_ws(" ", slice(col("t"), col("start") + 1, lit(30)))
            .cast("binary")).as("chunk_key"))
        .withColumn("kept", row_number().over(
          Window.partitionBy("chunk_key").orderBy("doc_id", "chunk_idx")) === 1)
      summarize(docs, "doc")
        .unionByName(summarize(sents, "sentence"))
        .unionByName(summarize(chunks, "chunk"))
        .orderBy("strategy")
    }),

    /** Corpus card (the dataset-card summary every training-data release
      * ships — HuggingFace dataset cards, Datasheets for Datasets): one
      * long-form (metric, value) table profiling the corpus in a single
      * query — sizes, token/vocab counts, length distribution (mean +
      * exact p50), exact-duplicate rate, English share. Counts are exact
      * doubles (< 2^53); ratios round to 9, means to 6 — every value on
      * a lattice BEFORE the union, so the card is hash-stable.
      *
      * Scale shape: each metric is one scan → partial+final aggregate
      * (the token metrics share one explode); the union is 9 rows. The
      * p50 is conf-tiered through [[graft.functions.Percentiles]]
      * (exact under the limit, KLL above — same card schema). */
    "t209_corpus_card" -> ((s, d) => {
      val doc = documents(s, d)
      val counts = doc.select(col("doc_id"), col("lang"), col("n_chars"),
        size(toks(col("text"))).cast("long").as("n_toks"),
        md5(col("text").cast("binary")).as("h"))
      def row(name: String, value: Column): DataFrame =
        counts.agg(value.as("value")).select(lit(name).as("metric"), col("value"))
      val vocab = documents(s, d)
        .select(explode(toks(col("text"))).as("term"))
        .agg(countDistinct("term").cast("double").as("value"))
        .select(lit("vocab_size").as("metric"), col("value"))
      row("n_docs", count(lit(1)).cast("double"))
        .unionByName(row("n_tokens", sum("n_toks").cast("double")))
        .unionByName(vocab)
        .unionByName(row("mean_doc_tokens",
          round(sum("n_toks").cast("double") / count(lit(1)), 6)))
        .unionByName(graft.functions.Percentiles.grouped(s, counts, Nil,
          "n_toks", Seq(0.5), Seq("value"),
          graft.functions.Percentiles.exactTierAt(s, s"$d#documents", doc.count()))
          .select(lit("p50_doc_tokens").as("metric"), col("value")))
        .unionByName(row("mean_doc_chars",
          round(sum("n_chars").cast("double") / count(lit(1)), 6)))
        .unionByName(row("exact_dup_rate",
          round(lit(1.0) - countDistinct("h").cast("double") / count(lit(1)), 9)))
        .unionByName(row("share_en",
          round(sum(when(col("lang") === "en", 1L).otherwise(0L)).cast("double") /
            count(lit(1)), 9)))
        .unionByName(documents(s, d)
          .agg(countDistinct("source").cast("double").as("value"))
          .select(lit("n_sources").as("metric"), col("value")))
        .orderBy("metric")
    }),

    /** Moore–Lewis cross-entropy difference selection (Moore & Lewis
      * 2010 — the classic domain-data selector, and the counterpart to
      * t101's DSIR: DSIR reweights by hashed-n-gram importance ratios,
      * Moore–Lewis RANKS each candidate document by how much better an
      * in-domain LM explains it than an out-domain LM). In-domain =
      * source `src0`; both sides are add-1-smoothed unigram LMs over
      * the shared corpus vocabulary; a doc's score is the mean per-token
      * ln P_in(w) − ln P_out(w), rounded to 6 before the `selected`
      * cut at 0 (the t114 lattice discipline, so libm ulps and
      * summation order cannot flip a flag).
      *
      * Scale shape: two vocab-sized count tables built by one token-keyed
      * partial+final aggregate each; the scoring join co-partitions the
      * token stream with both count tables on `term` (vocab tables are
      * NOT broadcast — at web scale vocabulary outgrows an executor);
      * three scalar totals attach via the F15 lazy-broadcast pattern;
      * the per-doc roll-up is one doc_id-keyed aggregate. Nothing is
      * ever corpus × vocab. */
    "t196_moore_lewis" -> ((s, d) => {
      val tok = documents(s, d)
        .select(col("doc_id"), col("source"), explode(toks(col("text"))).as("term"))
      val cin = tok.filter(col("source") === "src0")
        .groupBy("term").agg(count(lit(1)).as("c_in"))
      val cout = tok.filter(col("source") =!= "src0")
        .groupBy("term").agg(count(lit(1)).as("c_out"))
      val vocab = tok.select("term").distinct().agg(count(lit(1)).as("v"))
      val nIn = tok.filter(col("source") === "src0").agg(count(lit(1)).as("n_in"))
      val nOut = tok.filter(col("source") =!= "src0").agg(count(lit(1)).as("n_out"))
      val lp =
        log((coalesce(col("c_in"), lit(0L)) + lit(1L)).cast("double") /
          (col("n_in") + col("v"))) -
        log((coalesce(col("c_out"), lit(0L)) + lit(1L)).cast("double") /
          (col("n_out") + col("v")))
      tok
        .join(cin, Seq("term"), "left")
        .join(cout, Seq("term"), "left")
        .crossJoin(broadcast(vocab)).crossJoin(broadcast(nIn)).crossJoin(broadcast(nOut))
        .groupBy("doc_id", "source")
        .agg(count(lit(1)).as("n_tokens"), round(avg(lp), 6).as("ce_diff"))
        .select(col("doc_id"), col("source"), col("n_tokens"), col("ce_diff"),
          (col("ce_diff") > 0.0).as("selected"))
        .orderBy("doc_id")
    }),

    "t193_zipf_slope" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val counts = documents(s, d)
        .select(explode(toks(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("cnt"))
      val totals = counts.agg(count(lit(1)).as("n_vocab"),
        sum("cnt").as("n_tokens"))
      val top = counts.orderBy(desc("cnt"), col("term")).limit(200)
        .withColumn("rank",
          row_number().over(Window.orderBy(desc("cnt"), col("term")))
            .cast("long"))
      top.agg(
        count(lit(1)).as("n_fit"),
        round(expr("regr_slope(ln(cnt), ln(rank))"), 6).as("zipf_slope"),
        round(expr("regr_intercept(ln(cnt), ln(rank))"), 6).as("intercept"),
        round(expr("regr_r2(ln(cnt), ln(rank))"), 9).as("r2"))
        .crossJoin(broadcast(totals))
        .select(col("n_fit"), col("zipf_slope"), col("intercept"),
          col("r2"), col("n_vocab"), col("n_tokens"))
    })
  )

  /** Shared BPE trainer behind t106/t107: `rounds` greedy merge rounds
    * over the whitespace-token vocabulary. Returns the merge table
    * (rank, lhs, rhs, merged, weighted count) and the final vocabulary
    * frame `(term, cnt, syms)` with each term's post-merge symbol
    * sequence. Only driver materialization: one (l, r, count) argmax row
    * per round. */
  private def bpeTrain(s: SparkSession, d: String, rounds: Int = 3)
      : (Seq[(Long, String, String, String, Long)], DataFrame) = {
    def esc(x: String) = x.replace("\\", "\\\\").replace("'", "\\'")
    var words = documents(s, d)
      .select(explode(toks(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .withColumn("syms",
        expr("transform(sequence(1, length(term)), i -> substring(term, i, 1))"))
    val merges = (1 to rounds).map { rank =>
      // zip_with over offset slices, not sequence(1, size-1): Spark's
      // sequence DESCENDS for start > stop, so a single-char word would
      // yield [1, 0] and an element_at(0) error instead of no pairs
      val top = words
        .select(col("cnt"), explode(expr(
          "zip_with(slice(syms, 1, size(syms) - 1), " +
            "slice(syms, 2, size(syms) - 1), " +
            "(a, b) -> struct(a AS l, b AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("wcnt"))
        .orderBy(desc("wcnt"), col("l"), col("r"))
        .limit(1).collect()(0)
      val (l, r, wc) = (top.getString(0), top.getString(1), top.getLong(2))
      words = words.withColumn("syms", expr(
        s"aggregate(syms, cast(array() as array<string>), (acc, x) -> " +
          s"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '${esc(l)}' " +
          s"AND x = '${esc(r)}' " +
          s"THEN concat(slice(acc, 1, size(acc) - 1), array('${esc(l + r)}')) " +
          s"ELSE concat(acc, array(x)) END)"))
      (rank.toLong, l, r, l + r, wc)
    }
    (merges, words)
  }

  /** DuckDB replica of t106: each merge round unrolls to (a) a weighted
    * adjacent-pair count + argmax CTE and (b) a RECURSIVE left-to-right
    * non-overlapping rewrite of every word's symbol list (cursor + output
    * accumulator per word; final state at pos = n + 1) — the s90 unrolled-
    * rounds playbook applied to a recursive rewrite. */
  private val bpeRounds = 3

  /** The shared CTE chain both BPE oracles build on: tok/w0 (vocabulary
    * with per-character symbol lists) then, per round r, the pair-count
    * argmax (t_r) and the recursive rewrite producing w_r. */
  private def bpeCtes: String = {
    val rounds = bpeRounds
    val roundCtes = (1 to rounds).map { r =>
      val prev = s"w${r - 1}"
      s"""p$r AS (
         |  SELECT syms[CAST(g.i AS INTEGER)] AS l,
         |         syms[CAST(g.i + 1 AS INTEGER)] AS r,
         |         sum(cnt) AS wcnt
         |  FROM $prev CROSS JOIN unnest(generate_series(1, len(syms) - 1)) AS g(i)
         |  GROUP BY 1, 2),
         |t$r AS (SELECT l, r, wcnt FROM p$r ORDER BY wcnt DESC, l, r LIMIT 1),
         |m$r(term, cnt, n, pos, out) AS (
         |  SELECT term, cnt, len(syms), CAST(1 AS BIGINT), CAST([] AS VARCHAR[])
         |  FROM $prev
         |  UNION ALL
         |  SELECT m.term, m.cnt, m.n,
         |    CASE WHEN m.pos < m.n AND w.syms[CAST(m.pos AS INTEGER)] = t.l
         |              AND w.syms[CAST(m.pos + 1 AS INTEGER)] = t.r
         |         THEN m.pos + 2 ELSE m.pos + 1 END,
         |    CASE WHEN m.pos < m.n AND w.syms[CAST(m.pos AS INTEGER)] = t.l
         |              AND w.syms[CAST(m.pos + 1 AS INTEGER)] = t.r
         |         THEN m.out || [t.l || t.r]
         |         ELSE m.out || [w.syms[CAST(m.pos AS INTEGER)]] END
         |  FROM m$r m JOIN $prev w USING (term) CROSS JOIN t$r t
         |  WHERE m.pos <= m.n),
         |w$r AS (SELECT term, cnt, out AS syms FROM m$r WHERE pos = n + 1)"""
    }.mkString(",\n")
    s"""WITH RECURSIVE tok AS (
       |  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
       |  FROM documents),
       |w0 AS (
       |  SELECT term, count(*) AS cnt,
       |    list_transform(generate_series(1, length(term)),
       |      i -> substr(term, CAST(i AS INTEGER), 1)) AS syms
       |  FROM tok GROUP BY term),
       |$roundCtes""".stripMargin
  }

  private def bpeOracle: String = {
    val finalRows = (1 to bpeRounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS merge_rank, l AS lhs, r AS rhs,
         |  l || r AS merged, CAST(wcnt AS BIGINT) AS weighted_count FROM t$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""$bpeCtes
       |SELECT * FROM (
       |$finalRows)
       |ORDER BY merge_rank""".stripMargin
  }

  /** DuckDB replica of t107: the final vocabulary w_R from the shared
    * CTE chain joined back to per-document term instances. */
  private def bpeEncodeOracle: String =
    s"""$bpeCtes,
       |doc_tok AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(len(w.syms)) AS BIGINT) AS n_bpe_tokens,
       |  CAST(sum(length(term)) AS BIGINT) AS n_term_chars,
       |  CAST(sum(length(term)) AS DOUBLE) / CAST(sum(len(w.syms)) AS DOUBLE)
       |    AS chars_per_token
       |FROM doc_tok JOIN w$bpeRounds w USING (term)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** DuckDB replica of [[graft.functions.RollingMinHash]]: min over all
    * 16-byte windows of the polynomial hash Σ byte·Base^(w-1-j) mod 2^64,
    * signed-Long min. JVM wraparound is emulated with HUGEINT (% 2^64 then
    * re-signed); bytes come from hex(encode(text)) so multi-byte UTF-8
    * matches the expression's byte-level view. Wrapped powers Base^t are
    * precomputed here and inlined as unsigned literals. */
  private def rollingOracle: String = {
    val base = 1000003L
    val pows = Iterator.iterate(1L)(_ * base).take(16).toSeq // Base^0..Base^15, JVM-wrapped
    val powList = pows.map(java.lang.Long.toUnsignedString).map(p => s"CAST('$p' AS HUGEINT)")
      .mkString("[", ", ", "]")
    val two64 = "CAST('18446744073709551616' AS HUGEINT)"
    s"""WITH raw AS (
       |  SELECT doc_id, upper(hex(encode(text))) AS hx,
       |         octet_length(encode(text)) AS n
       |  FROM documents),
       |bts AS (
       |  SELECT doc_id, n,
       |    CAST(least(16, greatest(n, 1)) AS INTEGER) AS w,
       |    list_transform(range(0, n), p ->
       |      (strpos('0123456789ABCDEF', substr(hx, CAST(2 * p + 1 AS INTEGER), 1)) - 1) * 16 +
       |      (strpos('0123456789ABCDEF', substr(hx, CAST(2 * p + 2 AS INTEGER), 1)) - 1)) AS bl
       |  FROM raw),
       |wins AS (
       |  SELECT doc_id,
       |    list_sum(list_transform(range(0, w), j ->
       |      CAST(bl[CAST(i + j + 1 AS INTEGER)] AS HUGEINT) *
       |        ($powList)[CAST(w - j AS INTEGER)])) % $two64 AS hv
       |  FROM bts CROSS JOIN unnest(generate_series(0, n - w)) AS g(i)
       |  WHERE n > 0),
       |fp AS (
       |  SELECT doc_id,
       |    min(CAST(CASE WHEN hv >= CAST('9223372036854775808' AS HUGEINT)
       |             THEN hv - $two64 ELSE hv END AS BIGINT)) AS rolling_fp
       |  FROM wins GROUP BY doc_id
       |  UNION ALL
       |  SELECT doc_id, 0 AS rolling_fp FROM raw WHERE n = 0)
       |SELECT doc_id, rolling_fp,
       |  ((rolling_fp % 1024) + 1024) % 1024 AS fp_bucket
       |FROM fp ORDER BY doc_id""".stripMargin
  }

  /** Gopher's "must contain ≥2 of" stopword list (Rae et al. 2021 A.1.1). */
  private val gopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def duckMarkerCount(markers: Seq[String]): String = {
    val lst = markers.map(m => s"'$m'").mkString("[", ", ", "]")
    s"len(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> list_contains($lst, t)))"
  }

  // shared by their own map entries AND the t92 end-to-end composition
  // (a map literal cannot reference itself during construction)
  private lazy val qualityOracle: String = {
    val stop = duckMarkerCount(Seq("the", "a", "of", "and", "is", "to", "in"))
    s"""WITH base AS (
       |  SELECT doc_id, n_chars,
       |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS n_tok,
       |    CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS DOUBLE) AS n_punct,
       |    CAST($stop AS DOUBLE) AS stop_hits,
       |    CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) AS n_nonspace
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(n_tok AS BIGINT) AS n_tokens,
       |  CAST(n_punct AS BIGINT) AS n_punct,
       |  CAST(stop_hits AS BIGINT) AS stopword_hits,
       |  n_nonspace / n_tok AS mean_word_len,
       |  least(40.0, CAST(n_chars AS DOUBLE) / 10.0)
       |    + least(20.0, n_punct * 4.0)
       |    + least(20.0, stop_hits / n_tok * 100.0)
       |    + CASE WHEN n_nonspace / n_tok BETWEEN 3.0 AND 8.0 THEN 20.0 ELSE 5.0 END
       |    AS quality_score
       |FROM base ORDER BY doc_id""".stripMargin
  }

  private lazy val repetitionOracle: String =
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |bg AS (
        |  SELECT doc_id, t[i] || ' ' || t[i+1] AS g
        |  FROM tok CROSS JOIN unnest(generate_series(1, greatest(len(t)-1, 0))) AS gs(i)
        |  WHERE len(t) >= 2),
        |bstat AS (
        |  SELECT doc_id, max(c) AS top_bg, sum(c) AS tot_bg
        |  FROM (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2) GROUP BY 1),
        |tg AS (
        |  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
        |  FROM tok CROSS JOIN unnest(generate_series(1, greatest(len(t)-2, 0))) AS gs(i)
        |  WHERE len(t) >= 3),
        |tstat AS (
        |  SELECT doc_id, sum(c) AS tot_tg,
        |    sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_tg
        |  FROM (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY 1, 2) GROUP BY 1)
        |SELECT tok.doc_id,
        |  CAST(len(t) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS distinct_token_ratio,
        |  CAST(top_bg AS DOUBLE) / tot_bg AS top_bigram_frac,
        |  CAST(dup_tg AS DOUBLE) / tot_tg AS dup_trigram_frac,
        |  CAST(top_bg AS DOUBLE) / tot_bg <= 0.06
        |    AND CAST(dup_tg AS DOUBLE) / tot_tg <= 0.2 AS keep
        |FROM tok JOIN bstat USING (doc_id) JOIN tstat USING (doc_id)
        |ORDER BY doc_id""".stripMargin

  private lazy val splitOracle: String =
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(list_sum(list_transform(range(0, 4), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substr(md5(CAST(doc_id AS VARCHAR)), CAST(i + 1 AS INTEGER), 1)) - 1 AS BIGINT)
        |        << CAST(4 * (3 - i) AS INTEGER))) AS BIGINT) AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 52429 THEN 'train'
        |       WHEN bucket < 58982 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "t69_split_assign" -> splitOracle,
    "t70_source_mixture" ->
      """WITH b AS (
        |  SELECT doc_id, source,
        |    CAST(list_sum(list_transform(range(0, 4), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substr(md5(CAST(doc_id AS VARCHAR)), CAST(i + 1 AS INTEGER), 1)) - 1 AS BIGINT)
        |        << CAST(4 * (3 - i) AS INTEGER))) AS BIGINT) AS doc_bucket,
        |    CAST(strpos('0123456789abcdef', substr(md5(source), 1, 1)) - 1 AS BIGINT) AS rate_16
        |  FROM documents)
        |SELECT doc_id, source, doc_bucket, rate_16
        |FROM b WHERE doc_bucket * 16 < (rate_16 + 1) * 65536
        |ORDER BY doc_id""".stripMargin,
    "t72_chunk_windows" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |win AS (
        |  SELECT doc_id, t, CAST(g.s AS INTEGER) AS s1
        |  FROM tok CROSS JOIN unnest(generate_series(1, len(t), 40)) AS g(s))
        |SELECT doc_id,
        |  CAST((s1 - 1) / 40 AS BIGINT) AS chunk_idx,
        |  CAST(s1 - 1 AS BIGINT) AS start_token,
        |  CAST(least(50, len(t) - s1 + 1) AS BIGINT) AS n_chunk_tokens,
        |  array_to_string(t[s1:s1 + 49], ' ') AS chunk_text
        |FROM win ORDER BY doc_id, chunk_idx""".stripMargin,
    "t73_sentences" ->
      """WITH sp AS (
        |  SELECT doc_id,
        |    list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
        |      x -> trim(x)), x -> length(x) > 0) AS sents
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(g.i - 1 AS BIGINT) AS sentence_idx,
        |  sents[CAST(g.i AS INTEGER)] AS sentence,
        |  CAST(len(regexp_split_to_array(sents[CAST(g.i AS INTEGER)], '\s+')) AS BIGINT)
        |    AS n_sentence_tokens
        |FROM sp CROSS JOIN unnest(generate_series(1, len(sents))) AS g(i)
        |ORDER BY doc_id, sentence_idx""".stripMargin,
    "t74_redact" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '[0-9]{6,}')) AS BIGINT) AS n_long_numbers,
        |  regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{6,}', '<NUM>', 'g') AS redacted_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t66_fingerprint_rolling" -> rollingOracle,
    "t33_token_count" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_subtokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_measured,
        |  n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t34_quality" -> qualityOracle,
    "t35_langid" -> {
      val cases = langMarkers.map { case (l, ms) => s"CAST(${duckMarkerCount(ms)} AS BIGINT) AS score_$l" }
        .mkString(",\n    ")
      // argmax with first-wins precedence en,es,de,fr,zh: strictly-greater
      // comparison against the running best, same as the Spark fold.
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    CASES
        |  FROM documents),
        |pred AS (
        |  SELECT doc_id, lang,
        |    CASE
        |      WHEN score_zh > greatest(score_en, score_es, score_de, score_fr) THEN 'zh'
        |      WHEN score_fr > greatest(score_en, score_es, score_de) THEN 'fr'
        |      WHEN score_de > greatest(score_en, score_es) THEN 'de'
        |      WHEN score_es > score_en THEN 'es'
        |      ELSE 'en' END AS predicted_lang
        |  FROM scored)
        |SELECT lang, predicted_lang, count(*) AS n
        |FROM pred GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
        .replace("CASES", cases)
    },
    "t36_fingerprint" ->
      """SELECT doc_id, md5(text) AS fingerprint_md5,
        |  substr(md5(text), 1, 4) AS bucket
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t51_top_bigrams" ->
      """WITH toks AS (
        |  SELECT regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |bg AS (
        |  SELECT t[i] || ' ' || t[i+1] AS bigram
        |  FROM toks CROSS JOIN unnest(generate_series(1, greatest(len(t) - 1, 0))) AS g(i)
        |  WHERE len(t) >= 2)
        |SELECT bigram, count(*) AS n FROM bg
        |GROUP BY 1 ORDER BY n DESC, bigram LIMIT 20""".stripMargin,
    "t85_repetition" -> repetitionOracle,
    "t95_stratified_sample" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM documents)
        |SELECT doc_id, source, rn * 5 <= n AS in_sample
        |FROM r ORDER BY doc_id""".stripMargin,
    // end-to-end pipeline: the per-stage oracles composed verbatim plus
    // the inline per-doc langid argmax (t35's pred CTE) and the
    // content-hash keep-first window
    "t92_pipeline_e2e" -> {
      val cases = langMarkers
        .map { case (l, ms) => s"CAST(${duckMarkerCount(ms)} AS BIGINT) AS score_$l" }
        .mkString(",\n    ")
      s"""WITH scored AS (
         |  SELECT doc_id,
         |    $cases
         |  FROM documents),
         |pred AS (
         |  SELECT doc_id,
         |    CASE
         |      WHEN score_zh > greatest(score_en, score_es, score_de, score_fr) THEN 'zh'
         |      WHEN score_fr > greatest(score_en, score_es, score_de) THEN 'fr'
         |      WHEN score_de > greatest(score_en, score_es) THEN 'de'
         |      WHEN score_es > score_en THEN 'es'
         |      ELSE 'en' END AS predicted_lang
         |  FROM scored),
         |q AS (SELECT doc_id, quality_score FROM ($qualityOracle)),
         |r AS (SELECT doc_id, keep AS rep_keep FROM ($repetitionOracle)),
         |c AS (
         |  SELECT doc_id,
         |    doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical
         |  FROM documents),
         |sp AS (SELECT doc_id, split FROM ($splitOracle)),
         |j AS (
         |  SELECT pred.doc_id, predicted_lang, quality_score,
         |    coalesce(rep_keep, false) AS rep_keep, is_canonical,
         |    predicted_lang = 'en' AND quality_score >= 40.0
         |      AND coalesce(rep_keep, false) AND is_canonical AS keep,
         |    split
         |  FROM pred JOIN q USING (doc_id) LEFT JOIN r USING (doc_id)
         |    JOIN c USING (doc_id) JOIN sp USING (doc_id))
         |SELECT doc_id, predicted_lang, quality_score, rep_keep, is_canonical, keep,
         |  CASE WHEN keep THEN split END AS split
         |FROM j ORDER BY doc_id""".stripMargin
    },
    "t97_sequence_pack" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tokens AS cum_before
        |  FROM t)
        |SELECT doc_id, source, n_tokens, CAST(cum_before AS BIGINT) AS cum_before,
        |  CAST(floor(cum_before / 512) AS BIGINT) AS seq_first,
        |  CAST(floor((cum_before + n_tokens - 1) / 512) AS BIGINT) AS seq_last,
        |  CAST(cum_before % 512 AS BIGINT) AS offset_in_seq
        |FROM c ORDER BY doc_id""".stripMargin,
    "t98_unigram_logprob" ->
      s"""WITH tokens AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
         |  FROM documents),
         |uni AS (SELECT term, count(*) AS cnt FROM tokens GROUP BY 1),
         |tot AS (SELECT sum(cnt) AS total_tokens FROM uni),
         |scored AS (
         |  SELECT doc_id, count(*) AS n_tokens,
         |    round(avg(ln(CAST(cnt AS DOUBLE) / total_tokens)), 6) AS avg_logprob
         |  FROM tokens JOIN uni USING (term) CROSS JOIN tot
         |  GROUP BY doc_id),
         |cuts AS (
         |  SELECT quantile_cont(avg_logprob, ${2.0 / 3.0}) AS t_head,
         |    quantile_cont(avg_logprob, ${1.0 / 3.0}) AS t_mid
         |  FROM scored)
         |SELECT doc_id, n_tokens, avg_logprob,
         |  CASE WHEN avg_logprob >= t_head THEN 'head'
         |       WHEN avg_logprob >= t_mid THEN 'middle'
         |       ELSE 'tail' END AS ppl_bucket
         |FROM scored CROSS JOIN cuts ORDER BY doc_id""".stripMargin,
    "t52_tfidf" ->
      """WITH tokens AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS term_count FROM tokens GROUP BY 1, 2),
        |doclen AS (SELECT doc_id, count(*) AS doc_len FROM tokens GROUP BY 1),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |    (CAST(term_count AS DOUBLE) / doc_len) *
        |      ln(CAST(n_docs AS DOUBLE) / df) AS tfidf,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY (CAST(term_count AS DOUBLE) / doc_len) *
        |        ln(CAST(n_docs AS DOUBLE) / df) DESC, tf.term) AS rk
        |  FROM tf JOIN doclen USING (doc_id) JOIN dfreq USING (term) CROSS JOIN n)
        |SELECT doc_id, term AS top_term, tfidf FROM scored
        |WHERE rk = 1 ORDER BY doc_id""".stripMargin,
    "t101_dsir" ->
      """WITH tokens AS (
        |  SELECT doc_id, source,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |raw AS (SELECT term, count(*) AS raw_cnt FROM tokens GROUP BY 1),
        |tgt AS (SELECT term, count(*) AS tgt_cnt FROM tokens
        |        WHERE source IN ('src0', 'src1') GROUP BY 1),
        |uni AS (
        |  SELECT raw.term, raw_cnt, coalesce(tgt_cnt, 0) AS tgt_cnt
        |  FROM raw LEFT JOIN tgt USING (term)),
        |tot AS (
        |  SELECT count(*) AS vocab, sum(raw_cnt) AS tot_raw, sum(tgt_cnt) AS tot_tgt
        |  FROM uni),
        |scored AS (
        |  SELECT doc_id, source, count(*) AS n_tokens,
        |    round(avg(
        |      ln(CAST(tgt_cnt + 1 AS DOUBLE) / (tot_tgt + vocab)) -
        |      ln(CAST(raw_cnt + 1 AS DOUBLE) / (tot_raw + vocab))), 6) AS avg_logratio
        |  FROM tokens JOIN uni USING (term) CROSS JOIN tot
        |  GROUP BY 1, 2),
        |cut AS (SELECT quantile_cont(avg_logratio, 0.75) AS t_sel FROM scored)
        |SELECT doc_id, source, n_tokens, avg_logratio,
        |  avg_logratio >= t_sel AS selected
        |FROM scored CROSS JOIN cut ORDER BY doc_id""".stripMargin,
    "t102_novelty" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |grams AS (
        |  SELECT doc_id, array_to_string(t[i:i + 7], ' ') AS gram
        |  FROM tok CROSS JOIN unnest(generate_series(1, len(t) - 7)) AS g(i)
        |  WHERE len(t) >= 8),
        |pairs AS (SELECT DISTINCT gram, doc_id FROM grams),
        |fd AS (
        |  SELECT gram, doc_id, min(doc_id) OVER (PARTITION BY gram) AS first_doc
        |  FROM pairs)
        |SELECT doc_id,
        |  count(*) AS n_distinct_grams,
        |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
        |    AS novelty
        |FROM fd GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t106_bpe_train" -> bpeOracle,
    "t107_bpe_encode" -> bpeEncodeOracle,
    // replica of the hashed-feature fold: same md5-prefix bucket (the
    // splitOracle hex parse, nested in the per-feature lambda), same
    // integer weight mix, same mean
    "t113_quality_classifier" ->
      """WITH tok AS (
        |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |feats AS (
        |  SELECT doc_id,
        |    t || list_transform(generate_series(1, len(t) - 1),
        |      i -> t[CAST(i AS INTEGER)] || ' ' || t[CAST(i AS INTEGER) + 1]) AS fs
        |  FROM tok),
        |w AS (
        |  SELECT doc_id, CAST(len(fs) AS BIGINT) AS n_feats,
        |    CAST(list_sum(list_transform(fs, x ->
        |      (CAST(list_sum(list_transform(range(0, 4), i ->
        |        CAST(strpos('0123456789abcdef',
        |          substr(md5(x), CAST(i + 1 AS INTEGER), 1)) - 1 AS BIGINT)
        |          << CAST(4 * (3 - i) AS INTEGER))) AS BIGINT)
        |        * 40503) % 65536 - 32768)) AS BIGINT) AS score_sum
        |  FROM feats)
        |SELECT doc_id, n_feats, score_sum,
        |  CAST(score_sum AS DOUBLE) / (n_feats * 32768.0) AS score,
        |  score_sum > 0 AS keep
        |FROM w ORDER BY doc_id""".stripMargin,
    "t114_bigram_logprob" ->
      s"""WITH tok AS (
         |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents),
         |bg AS (
         |  SELECT doc_id, t[CAST(i AS INTEGER)] AS w1, t[CAST(i AS INTEGER) + 1] AS w2
         |  FROM tok CROSS JOIN unnest(generate_series(1, len(t) - 1)) AS g(i)
         |  WHERE len(t) >= 2),
         |tokens AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
         |  FROM documents),
         |uni AS (SELECT term AS w1, count(*) AS c1 FROM tokens GROUP BY 1),
         |vc AS (SELECT count(*) AS vsz FROM uni),
         |big AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
         |scored AS (
         |  SELECT doc_id, count(*) AS n_bigrams,
         |    round(avg(ln(CAST(c2 + 1 AS DOUBLE) / (c1 + vsz))), 6) AS avg_logprob
         |  FROM bg JOIN big USING (w1, w2) JOIN uni USING (w1) CROSS JOIN vc
         |  GROUP BY doc_id),
         |cuts AS (
         |  SELECT quantile_cont(avg_logprob, ${2.0 / 3.0}) AS t_head,
         |    quantile_cont(avg_logprob, ${1.0 / 3.0}) AS t_mid
         |  FROM scored)
         |SELECT doc_id, n_bigrams, avg_logprob,
         |  CASE WHEN avg_logprob >= t_head THEN 'head'
         |       WHEN avg_logprob >= t_mid THEN 'middle'
         |       ELSE 'tail' END AS ppl_bucket
         |FROM scored CROSS JOIN cuts ORDER BY doc_id""".stripMargin,
    "t115_mixture_temperature" ->
      """WITH per AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |w AS (
        |  SELECT source, n_docs, n_tokens,
        |    CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000.0) AS BIGINT) AS weight_milli
        |  FROM per),
        |tot AS (
        |  SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens,
        |    CAST(sum(weight_milli) AS BIGINT) AS tot_weight_milli
        |  FROM w),
        |s AS (
        |  SELECT source, n_docs, n_tokens, weight_milli,
        |    CAST(weight_milli AS DOUBLE) / CAST(tot_weight_milli AS DOUBLE) AS p,
        |    CAST(floor((CAST(weight_milli AS DOUBLE) / CAST(tot_weight_milli AS DOUBLE))
        |      * CAST(tot_tokens // 2 AS DOUBLE)) AS BIGINT) AS target_tokens
        |  FROM w CROSS JOIN tot)
        |SELECT source, n_docs, n_tokens, weight_milli,
        |  round(p, 6) AS sample_prob, target_tokens,
        |  round(CAST(target_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS epochs
        |FROM s ORDER BY source""".stripMargin,
    "t121_token_entropy" ->
      """WITH tokens AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS c FROM tokens GROUP BY 1, 2),
        |dl AS (SELECT doc_id, sum(c) AS n, count(*) AS n_types FROM tf GROUP BY 1)
        |SELECT doc_id,
        |  CAST(n AS BIGINT) AS n_tokens,
        |  CAST(n_types AS BIGINT) AS n_types,
        |  CAST(n_types AS DOUBLE) / n AS ttr,
        |  round(-sum(c * ln(CAST(c AS DOUBLE) / n)) / n, 6) AS entropy,
        |  CASE WHEN n_types > 1
        |       THEN round(-sum(c * ln(CAST(c AS DOUBLE) / n)) / n / ln(n_types), 6)
        |       ELSE 0.0 END AS norm_entropy
        |FROM tf JOIN dl USING (doc_id)
        |GROUP BY doc_id, n, n_types ORDER BY doc_id""".stripMargin,
    "t124_oov_rate" ->
      """WITH tokens AS (
        |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |uni AS (SELECT term, count(*) AS cnt FROM tokens GROUP BY 1),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_tokens,
        |    sum(CASE WHEN cnt < 5 THEN 1 ELSE 0 END) AS n_oov
        |  FROM tokens JOIN uni USING (term) GROUP BY doc_id)
        |SELECT doc_id,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(n_oov AS BIGINT) AS n_oov,
        |  CAST(n_oov AS DOUBLE) / n_tokens AS oov_rate,
        |  CAST(n_oov AS DOUBLE) / n_tokens > 0.2 AS high_oov
        |FROM agg ORDER BY doc_id""".stripMargin,
    "t127_shuffle_shards" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    md5(CAST(doc_id AS VARCHAR) || ':shuffle-v1') AS shuffle_key
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, shuffle_key,
        |    CAST(list_sum(list_transform(range(0, 4), i ->
        |      CAST(strpos('0123456789abcdef',
        |        substr(shuffle_key, CAST(i + 1 AS INTEGER), 1)) - 1 AS BIGINT)
        |        << CAST(4 * (3 - i) AS INTEGER))) AS BIGINT) % 16 AS shard
        |  FROM k)
        |SELECT doc_id, shuffle_key, shard,
        |  CAST(row_number() OVER (PARTITION BY shard
        |    ORDER BY shuffle_key, doc_id) - 1 AS BIGINT) AS pos_in_shard
        |FROM s ORDER BY doc_id""".stripMargin,
    "t111_source_overlap" ->
      """WITH tok AS (
        |  SELECT source, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |g AS (
        |  SELECT DISTINCT source, array_to_string(t[i:i + 7], ' ') AS gram
        |  FROM tok CROSS JOIN unnest(generate_series(1, len(t) - 7)) AS gi(i)
        |  WHERE len(t) >= 8),
        |cnt AS (SELECT source, count(*) AS n FROM g GROUP BY source),
        |sh AS (
        |  SELECT a.source AS source_a, b.source AS source_b, count(*) AS shared
        |  FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
        |  GROUP BY 1, 2),
        |px AS (
        |  SELECT ca.source AS source_a, cb.source AS source_b,
        |    ca.n AS n_grams_a, cb.n AS n_grams_b
        |  FROM cnt ca JOIN cnt cb ON ca.source < cb.source)
        |SELECT px.source_a, px.source_b,
        |  CAST(coalesce(sh.shared, 0) AS BIGINT) AS shared_grams,
        |  CAST(n_grams_a AS BIGINT) AS n_grams_a,
        |  CAST(n_grams_b AS BIGINT) AS n_grams_b,
        |  CAST(coalesce(sh.shared, 0) AS DOUBLE)
        |    / (n_grams_a + n_grams_b - coalesce(sh.shared, 0)) AS jaccard
        |FROM px LEFT JOIN sh USING (source_a, source_b)
        |ORDER BY source_a, source_b""".stripMargin,
    // quantile_cont = Spark's exact interpolating percentile (the q14
    // median parity, at 3 cut points); band compares promote long vs
    // the same double on both engines
    "t137_length_bands" ->
      """WITH b AS (
        |  SELECT source,
        |    quantile_cont(n_chars, 0.25) AS q1,
        |    quantile_cont(n_chars, 0.5) AS q2,
        |    quantile_cont(n_chars, 0.75) AS q3
        |  FROM documents GROUP BY 1)
        |SELECT d.doc_id, d.source, d.n_chars,
        |  CAST(1 + CAST(d.n_chars > b.q1 AS INTEGER)
        |    + CAST(d.n_chars > b.q2 AS INTEGER)
        |    + CAST(d.n_chars > b.q3 AS INTEGER) AS BIGINT) AS band
        |FROM documents d JOIN b ON d.source = b.source
        |ORDER BY d.doc_id""".stripMargin,
    // t73's sentence split; keeper = row_number 1 over (doc_id, pos);
    // string_agg ORDER BY pos skips the non-kept NULLs, coalesced to ''
    // for docs whose every sentence occurred earlier (Spark's
    // array_join of an empty array is '')
    "t144_line_dedup" ->
      """WITH sp AS (
        |  SELECT doc_id,
        |    list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
        |      x -> trim(x)), x -> length(x) > 0) AS sents
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, CAST(g.i - 1 AS BIGINT) AS pos, sents[g.i] AS sentence
        |  FROM sp CROSS JOIN unnest(generate_series(1, len(sents))) AS g(i)),
        |k AS (
        |  SELECT doc_id, pos, sentence,
        |    row_number() OVER (PARTITION BY sentence ORDER BY doc_id, pos) = 1
        |      AS kept
        |  FROM s)
        |SELECT doc_id, count(*) AS n_sentences,
        |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  coalesce(string_agg(CASE WHEN kept THEN sentence END, ' '
        |    ORDER BY pos), '') AS cleaned_text
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // same A-ES keys from the same exact uniforms; DuckDB recomputes the
    // full ranking so the top-k heap's cut line is cross-checked
    "t146_weighted_sample" ->
      """WITH s AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
        |    pow((CAST(list_sum(list_transform(range(0, 13), i ->
        |        CAST(strpos('0123456789abcdef',
        |          substr(md5(CAST(doc_id AS VARCHAR) || '|es'),
        |            CAST(i + 1 AS INTEGER), 1)) - 1 AS BIGINT)
        |          << CAST(4 * (12 - i) AS INTEGER))) AS DOUBLE) + 0.5)
        |        / 4503599627370496.0,
        |      1.0 / n_chars) AS sample_key
        |  FROM documents),
        |t AS (
        |  SELECT doc_id, weight, sample_key,
        |    row_number() OVER (ORDER BY sample_key DESC, doc_id) AS rnk
        |  FROM s)
        |SELECT doc_id, weight, sample_key, CAST(rnk AS BIGINT) AS sample_rank
        |FROM t WHERE rnk <= 100 ORDER BY sample_rank""".stripMargin,

    // deflate byte counts are engine-internal (q65 pattern): the oracle
    // recomputes the exact columns and asserts the claim booleans true
    "t147_compression_ratio" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_raw_bytes,
        |  TRUE AS every_ratio_le_105,
        |  TRUE AS every_ratio_gt_002,
        |  TRUE AS mean_ratio_in_band
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // same md5 bucket split, same min-bucket first-appearance derivation
    "t155_vocab_growth" ->
      """WITH tok AS (
        |  SELECT
        |    (CAST(list_sum(list_transform(range(0, 13), i ->
        |        CAST(strpos('0123456789abcdef',
        |          substr(md5(CAST(doc_id AS VARCHAR)),
        |            CAST(i + 1 AS INTEGER), 1)) - 1 AS BIGINT)
        |          << CAST(4 * (12 - i) AS INTEGER))) AS BIGINT) % 10 + 1)
        |      AS bucket,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        |  FROM documents),
        |fs AS (
        |  SELECT first_bucket, count(*) AS new_tokens FROM (
        |    SELECT token, min(bucket) AS first_bucket FROM tok GROUP BY 1)
        |  GROUP BY 1),
        |inst AS (SELECT bucket, count(*) AS bucket_tokens FROM tok GROUP BY 1)
        |SELECT i.bucket, i.bucket_tokens,
        |  coalesce(fs.new_tokens, 0) AS new_tokens,
        |  CAST(sum(i.bucket_tokens) OVER (ORDER BY i.bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
        |  CAST(sum(coalesce(fs.new_tokens, 0)) OVER (ORDER BY i.bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_vocab
        |FROM inst i LEFT JOIN fs ON i.bucket = fs.first_bucket
        |ORDER BY i.bucket""".stripMargin,
    // pmi rounded to 6 BEFORE the rank-order on both engines, so the
    // top-50 boundary and the output order cannot flip on ln() ulps
    "t160_pmi_collocations" ->
      """WITH t AS (
        |  SELECT regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
        |uni AS (
        |  SELECT unnest(t) AS term FROM t),
        |uc AS (SELECT term, count(*) AS c FROM uni GROUP BY 1),
        |ntok AS (SELECT sum(c) AS n_tok FROM uc),
        |bg AS (
        |  SELECT t[i] AS w1, t[i+1] AS w2
        |  FROM t CROSS JOIN unnest(generate_series(1, greatest(len(t) - 1, 0))) AS g(i)
        |  WHERE len(t) >= 2),
        |bc AS (SELECT w1, w2, count(*) AS c_xy FROM bg GROUP BY 1, 2),
        |nbig AS (SELECT sum(c_xy) AS n_big FROM bc)
        |SELECT bc.w1, bc.w2, bc.c_xy, ux.c AS c_x, uy.c AS c_y,
        |  round(ln(bc.c_xy) + 2.0 * ln(ntok.n_tok) - ln(nbig.n_big)
        |    - ln(ux.c) - ln(uy.c), 6) AS pmi
        |FROM bc
        |JOIN uc ux ON ux.term = bc.w1
        |JOIN uc uy ON uy.term = bc.w2
        |CROSS JOIN ntok CROSS JOIN nbig
        |WHERE bc.c_xy >= 5
        |ORDER BY pmi DESC, bc.w1, bc.w2 LIMIT 50""".stripMargin,
    "t179_fertility" ->
      """WITH t AS (
        |  SELECT lang,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ws,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS sub,
        |    CAST(strlen(text) AS BIGINT) AS bytes
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(ws) AS BIGINT) AS n_words,
        |  CAST(sum(sub) AS BIGINT) AS n_subtokens,
        |  CAST(sum(bytes) AS BIGINT) AS n_bytes,
        |  round(sum(sub) / sum(ws), 9) AS fertility,
        |  round(sum(bytes) / sum(sub), 9) AS bytes_per_subtoken,
        |  round(sum(bytes) / sum(ws), 9) AS bytes_per_word
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
    "t187_language_mixture" -> {
      val hitCols = langMarkers.map { case (l, ms) =>
        s"CAST(${duckMarkerCount(ms)} AS BIGINT) AS hits_$l"
      }.mkString(",\n        |    ")
      val hs = langMarkers.map { case (l, _) => s"hits_$l" }
      s"""WITH h AS (
         |  SELECT doc_id,
         |    $hitCols
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, ${hs.mkString(", ")},
         |    ${hs.mkString(" + ")} AS total_hits,
         |    greatest(${hs.mkString(", ")}) AS top,
         |    ${hs.map(h => s"CAST($h > 0 AS BIGINT)").mkString(" + ")} AS n_langs_hit
         |  FROM h)
         |SELECT doc_id, ${hs.mkString(", ")}, total_hits, n_langs_hit,
         |  CASE WHEN total_hits > 0
         |    THEN round(top / total_hits, 9) ELSE NULL END AS top_share,
         |  total_hits >= 4 AND n_langs_hit >= 2 AND top * 4 < total_hits * 3
         |    AS is_mixed
         |FROM m ORDER BY doc_id""".stripMargin
    },
    // same one-division-per-ratio arithmetic as the Spark side; the
    // stopword fold reuses the t35 marker-count helper shape
    "t217_gopher_filters" -> {
      val stops = gopherStops.map(m => s"'$m'").mkString("[", ", ", "]")
      s"""WITH b AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_words,
         |    CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT) AS n_nonspace,
         |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
         |      w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words,
         |    CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS BIGINT) AS n_symbols,
         |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
         |      w -> list_contains($stops, w))) AS BIGINT) AS stop_hits
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, n_words, n_alpha_words, n_symbols, stop_hits,
         |    CAST(n_nonspace AS DOUBLE) / n_words AS mean_word_len,
         |    CAST(n_symbols AS DOUBLE) / n_words AS symbol_ratio,
         |    CAST(n_alpha_words AS DOUBLE) / n_words AS alpha_ratio
         |  FROM b)
         |SELECT doc_id, n_words, n_alpha_words, n_symbols, stop_hits, mean_word_len,
         |  n_words BETWEEN 50 AND 100000 AS pass_word_count,
         |  mean_word_len >= 3.0 AND mean_word_len <= 10.0 AS pass_mean_word_len,
         |  symbol_ratio < 0.1 AS pass_symbol_ratio,
         |  alpha_ratio > 0.8 AS pass_alpha_ratio,
         |  stop_hits >= 2 AS pass_stopwords,
         |  (n_words BETWEEN 50 AND 100000)
         |    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
         |    AND symbol_ratio < 0.1 AND alpha_ratio > 0.8
         |    AND stop_hits >= 2 AS gopher_keep
         |FROM r ORDER BY doc_id""".stripMargin
    },
    "t218_c4_filters" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_words,
        |  CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS n_sentences,
        |  contains(text, '{') AS has_brace,
        |  contains(lower(text), 'lorem ipsum') AS has_lorem,
        |  contains(lower(text), 'javascript') AS has_javascript,
        |  regexp_matches(text, '[.!?"]$') AS ends_terminal,
        |  len(regexp_extract_all(text, '[.!?]+')) >= 3
        |    AND len(regexp_split_to_array(trim(text), '\s+')) >= 5
        |    AND NOT contains(text, '{')
        |    AND NOT contains(lower(text), 'lorem ipsum')
        |    AND NOT contains(lower(text), 'javascript') AS c4_keep
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the three grains replicated at their own operators' oracle
    // conventions (doc md5 / [.!?]+ sentences / 30-token chunk text)
    "t215_dedup_impact" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS nt,
        |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1 AS kept
        |  FROM documents),
        |sent AS (
        |  SELECT doc_id, CAST(g.i AS BIGINT) AS pos,
        |    trim(parts[CAST(g.i AS INTEGER)]) AS sentence,
        |    CAST(len(regexp_split_to_array(trim(parts[CAST(g.i AS INTEGER)]), '\s+'))
        |      AS BIGINT) AS nt
        |  FROM (SELECT doc_id, regexp_split_to_array(text, '[.!?]+') AS parts
        |        FROM documents)
        |  CROSS JOIN unnest(generate_series(1, len(parts))) AS g(i)
        |  WHERE length(trim(parts[CAST(g.i AS INTEGER)])) > 0),
        |s2 AS (
        |  SELECT nt,
        |    row_number() OVER (PARTITION BY sentence ORDER BY doc_id, pos) = 1 AS kept
        |  FROM sent),
        |tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
        |        FROM documents),
        |ch AS (
        |  SELECT doc_id, CAST((gs.s - 1) / 30 AS BIGINT) AS chunk_idx,
        |    CAST(least(30, len(t) - gs.s + 1) AS BIGINT) AS nt,
        |    md5(array_to_string(t[gs.s:gs.s + 29], ' ')) AS chunk_key
        |  FROM tok CROSS JOIN unnest(generate_series(1, len(t), 30)) AS gs(s)),
        |c2 AS (
        |  SELECT nt,
        |    row_number() OVER (PARTITION BY chunk_key ORDER BY doc_id, chunk_idx) = 1 AS kept
        |  FROM ch),
        |u AS (
        |  SELECT 'doc' AS strategy, count(*) AS n_units,
        |    CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |    CAST(sum(nt) AS BIGINT) AS tokens_total,
        |    CAST(sum(CASE WHEN kept THEN nt ELSE 0 END) AS BIGINT) AS tokens_kept
        |  FROM d
        |  UNION ALL
        |  SELECT 'sentence', count(*),
        |    CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(sum(nt) AS BIGINT),
        |    CAST(sum(CASE WHEN kept THEN nt ELSE 0 END) AS BIGINT)
        |  FROM s2
        |  UNION ALL
        |  SELECT 'chunk', count(*),
        |    CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(sum(nt) AS BIGINT),
        |    CAST(sum(CASE WHEN kept THEN nt ELSE 0 END) AS BIGINT)
        |  FROM c2)
        |SELECT strategy, n_units, n_kept, tokens_total, tokens_kept,
        |  round(1.0 - CAST(tokens_kept AS DOUBLE) / tokens_total, 9)
        |    AS token_reduction
        |FROM u ORDER BY strategy""".stripMargin,
    // every value on a lattice before the union; p50 = quantile_cont
    // (the q56 exact-percentile equivalence)
    "t209_corpus_card" ->
      """WITH c AS (
        |  SELECT doc_id, lang, source, n_chars,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_toks,
        |    md5(text) AS h
        |  FROM documents),
        |v AS (
        |  SELECT count(DISTINCT term) AS vocab FROM (
        |    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |    FROM documents))
        |SELECT metric, value FROM (
        |  SELECT 'n_docs' AS metric, CAST(count(*) AS DOUBLE) AS value FROM c
        |  UNION ALL
        |  SELECT 'n_tokens', CAST(sum(n_toks) AS DOUBLE) FROM c
        |  UNION ALL
        |  SELECT 'vocab_size', CAST(vocab AS DOUBLE) FROM v
        |  UNION ALL
        |  SELECT 'mean_doc_tokens',
        |    round(CAST(sum(n_toks) AS DOUBLE) / count(*), 6) FROM c
        |  UNION ALL
        |  SELECT 'p50_doc_tokens', quantile_cont(n_toks, 0.5) FROM c
        |  UNION ALL
        |  SELECT 'mean_doc_chars',
        |    round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) FROM c
        |  UNION ALL
        |  SELECT 'exact_dup_rate',
        |    round(1.0 - CAST(count(DISTINCT h) AS DOUBLE) / count(*), 9) FROM c
        |  UNION ALL
        |  SELECT 'share_en',
        |    round(CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
        |      / count(*), 9) FROM c
        |  UNION ALL
        |  SELECT 'n_sources', CAST(count(DISTINCT source) AS DOUBLE) FROM c)
        |ORDER BY metric""".stripMargin,
    // same add-1 LMs, same ln-ratio; mean rounded to 6 BEFORE the
    // selected cut on both engines
    "t196_moore_lewis" ->
      """WITH tok AS (
        |  SELECT doc_id, source,
        |    unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |ci AS (SELECT term, count(*) AS c_in FROM tok WHERE source = 'src0' GROUP BY 1),
        |co AS (SELECT term, count(*) AS c_out FROM tok WHERE source <> 'src0' GROUP BY 1),
        |vv AS (SELECT count(DISTINCT term) AS v FROM tok),
        |ni AS (SELECT count(*) AS n_in FROM tok WHERE source = 'src0'),
        |nx AS (SELECT count(*) AS n_out FROM tok WHERE source <> 'src0'),
        |sc AS (
        |  SELECT t.doc_id, t.source, count(*) AS n_tokens,
        |    round(avg(
        |      ln(CAST(coalesce(ci.c_in, 0) + 1 AS DOUBLE) / (ni.n_in + vv.v)) -
        |      ln(CAST(coalesce(co.c_out, 0) + 1 AS DOUBLE) / (nx.n_out + vv.v))), 6)
        |      AS ce_diff
        |  FROM tok t
        |  LEFT JOIN ci USING (term) LEFT JOIN co USING (term)
        |  CROSS JOIN vv CROSS JOIN ni CROSS JOIN nx
        |  GROUP BY 1, 2)
        |SELECT doc_id, source, n_tokens, ce_diff, ce_diff > 0 AS selected
        |FROM sc ORDER BY doc_id""".stripMargin,
    "t193_zipf_slope" ->
      """WITH c AS (
        |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS term
        |  FROM documents),
        |counts AS (SELECT term, count(*) AS cnt FROM c GROUP BY 1),
        |totals AS (SELECT count(*) AS n_vocab,
        |  CAST(sum(cnt) AS BIGINT) AS n_tokens FROM counts),
        |top AS (
        |  SELECT cnt,
        |    row_number() OVER (ORDER BY cnt DESC, term) AS rank
        |  FROM counts ORDER BY cnt DESC, term LIMIT 200)
        |SELECT count(*) AS n_fit,
        |  round(regr_slope(ln(cnt), ln(rank)), 6) AS zipf_slope,
        |  round(regr_intercept(ln(cnt), ln(rank)), 6) AS intercept,
        |  round(regr_r2(ln(cnt), ln(rank)), 9) AS r2,
        |  t.n_vocab, t.n_tokens
        |FROM top CROSS JOIN totals t
        |GROUP BY t.n_vocab, t.n_tokens""".stripMargin
  )
}
