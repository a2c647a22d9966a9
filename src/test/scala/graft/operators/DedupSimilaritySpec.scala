package graft

import org.apache.spark.sql.functions._

/** Behavior tests for the dedup / similarity operators whose outputs are
  * not SQL-replicable (MinHash-LSH, SimHash, LSH/IVF ANN): recall against
  * the exact baselines, plus crafted-input sanity checks.
  */
class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("d37: exact dedup keeps one id per distinct text") {
    val out = SparkEntry.queries("d37_dedup_exact")(spark, sf)
    val docs = Tables.documents(spark, sf)
    assert(out.count() == docs.select("text").distinct().count())
    assert(out.agg(sum("n_copies")).first().getLong(0) == docs.count())
  }

  test("d39: MinHash-LSH recall >= 0.9 vs exact Jaccard pairs at 0.5") {
    val exact = SparkEntry.queries("d38_dedup_jaccard")(spark, sf)
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("d39_dedup_minhash_lsh")(spark, sf)
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "exact near-dup pairs should exist in testdata")
    // precision is 1.0 by construction (candidates are verified exactly)
    assert(lsh.subsetOf(exact), s"LSH emitted non-dup pairs: ${lsh -- exact}")
    val recall = (lsh & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall below 0.9 (missed ${exact -- lsh})")
  }

  test("d40: SimHash flags crafted near-duplicates and not unrelated docs") {
    // dominant repeated token pins every simhash bit's margin far from
    // zero, so a single-token edit provably flips no bits (hamming 0)
    val base = ("spark " * 30) + "catalyst optimizer codegen adaptive execution plans"
    val nearDup = base.replace("optimizer", "rewriter") // one token changed
    val unrelated = ("tomato " * 30) + "cooking pasta with basil sauce garlic"
    val docs = Seq((0L, base), (1L, nearDup), (2L, unrelated)).toDF("doc_id", "text")
    docs.createOrReplaceTempView("crafted_docs")
    // run the simhash pipeline over the crafted docs by writing them to parquet
    val tmp = java.nio.file.Files.createTempDirectory("simhash").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = SparkEntry.queries("d40_dedup_simhash")(spark, tmp)
      .select("doc1", "doc2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "near-dup pair should be within hamming 3")
    assert(!pairs.exists(p => p._2 == 2L || p._1 == 2L), "unrelated doc must not pair")
  }

  test("d38: hot-shingle guard salts frequent shingles without changing output") {
    // 120 docs share one 3-gram ("alpha beta gamma"); each doc also has
    // unique shingles so sizes differ and real pairs exist among clones
    val docs = (0L until 120L).map { i =>
      val uniq = if (i < 60) s"clone body text shared tail run $i" // near-dups in pairs
      else s"totally distinct payload ${i}a ${i}b ${i}c ${i}d"
      (i, s"alpha beta gamma $uniq")
    }.toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("hotshingle").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def run() = SparkEntry.queries("d38_dedup_jaccard")(spark, tmp)
    // baseline: guard disabled (threshold above any df)
    spark.conf.set("spark.graft.dedup.jaccard.hotShingleDf", "1000000")
    val plain = run().collect().map(_.toSeq).toSet
    // guard active: the shared shingle (df=120) is salted across 4 tasks
    spark.conf.set("spark.graft.dedup.jaccard.hotShingleDf", "50")
    spark.conf.set("spark.graft.dedup.jaccard.salts", "4")
    try {
      val guarded = run()
      val got = guarded.collect().map(_.toSeq).toSet
      assert(got == plain, "salting changed the Jaccard output")
      assert(got.nonEmpty, "crafted corpus should contain near-dup pairs")
      val plan = guarded.queryExecution.executedPlan.toString
      assert(plan.contains("__salt"), "hot branch did not take the salted join:\n" + plan)
      // routing bound: hash(id1) spreads the hot shingle's 120 index rows
      // over the 4 salt buckets — no bucket may hoard the quadratic work
      val perSalt = docs.select(pmod(xxhash64(col("doc_id")), lit(4L)).as("s"))
        .groupBy("s").count().collect().map(_.getLong(1))
      assert(perSalt.length == 4 && perSalt.max <= (120 * 0.6).toLong,
        s"salt routing degenerate: ${perSalt.mkString(",")}")
    } finally {
      spark.conf.unset("spark.graft.dedup.jaccard.hotShingleDf")
      spark.conf.unset("spark.graft.dedup.jaccard.salts")
    }
  }

  test("d38: prefix strategy is output-identical to count; auto selects by corpus statistics") {
    import DedupQueries.{JaccardStrategyConf, JaccardChosenConf}
    def run() = SparkEntry.queries("d38_dedup_jaccard")(spark, sf)
    try {
      spark.conf.set(JaccardStrategyConf, "count")
      val viaCount = run().collect().map(_.toSeq).toSet
      spark.conf.set(JaccardStrategyConf, "prefix")
      val viaPrefix = run().collect().map(_.toSeq).toSet
      assert(viaCount.nonEmpty)
      assert(viaPrefix == viaCount,
        s"prefix filter changed the output: only-count=${viaCount -- viaPrefix} " +
          s"only-prefix=${viaPrefix -- viaCount}")
      // auto picks per measured ratio (scale-dependent on the testdata:
      // 0.62 at sf0.01, 0.10 at sf0.1 — vocabulary saturates with corpus
      // growth); either branch must reproduce the count output exactly
      spark.conf.set(JaccardStrategyConf, "auto")
      assert(run().collect().map(_.toSeq).toSet == viaCount)
      assert(Set("count", "prefix").contains(spark.conf.get(JaccardChosenConf)))

      import spark.implicits._
      // dense corpus: every doc is a cyclic shift over a 10-token
      // vocabulary → ~10 distinct shingles across 1120 shingle rows →
      // ratio ≈ 0.01 → auto must pick count
      val vocab = (0 until 10).map(j => s"tok$j")
      val dense = (0 until 40).map { i =>
        (i.toLong, (0 until 30).map(j => vocab((i + j) % 10)).mkString(" "))
      }.toDF("doc_id", "text")
      val tmpD = java.nio.file.Files.createTempDirectory("dense").toString
      dense.withColumn("lang", lit("en")).withColumn("source", lit("t"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$tmpD/documents.parquet")
      spark.conf.set(JaccardStrategyConf, "auto")
      val dAuto = SparkEntry.queries("d38_dedup_jaccard")(spark, tmpD)
        .collect().map(_.toSeq).toSet
      assert(spark.conf.get(JaccardChosenConf) == "count",
        "auto should pick count aggregation on a dense-vocabulary corpus")
      spark.conf.set(JaccardStrategyConf, "prefix")
      assert(SparkEntry.queries("d38_dedup_jaccard")(spark, tmpD)
        .collect().map(_.toSeq).toSet == dAuto && dAuto.nonEmpty)

      // zipfian-ish corpus: per-pair-unique tokens → most shingles rare →
      // auto must pick prefix, with output identical to count
      val docs = (0 until 20).flatMap { i =>
        val base = (0 until 30).map(j => s"u${i}_$j")
        Seq((2L * i, base.mkString(" ")),
          (2L * i + 1, (base.dropRight(1) :+ s"alt$i").mkString(" ")))
      }.toDF("doc_id", "text")
      val tmp = java.nio.file.Files.createTempDirectory("zipf").toString
      docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      def runZ() = SparkEntry.queries("d38_dedup_jaccard")(spark, tmp)
      spark.conf.set(JaccardStrategyConf, "count")
      val zCount = runZ().collect().map(_.toSeq).toSet
      spark.conf.set(JaccardStrategyConf, "auto")
      val zAuto = runZ().collect().map(_.toSeq).toSet
      assert(spark.conf.get(JaccardChosenConf) == "prefix",
        "auto should pick the prefix filter on a rare-shingle corpus")
      assert(zAuto == zCount && zCount.nonEmpty,
        s"strategy mismatch on zipfian corpus: only-count=${zCount -- zAuto} " +
          s"only-prefix=${zAuto -- zCount}")
    } finally spark.conf.unset(JaccardStrategyConf)
  }

  test("d41: above the exact-pair gate the LSH path runs quadratic-free with precision 1.0") {
    // exact tier (default gate: corpus ≤ 10k vectors uses all-pairs)
    val exact = SparkEntry.queries("d41_dedup_embedding")(spark, sf)
      .select("id1", "id2", "cosine").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // force the scale tier by dropping the gate below the corpus size
    spark.conf.set("spark.graft.dedup.embedding.exactLimit", "1")
    try {
      val df = SparkEntry.queries("d41_dedup_embedding")(spark, sf)
      df.collect() // materialize so the executed plan is final
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"LSH tier must not contain an O(n^2) join:\n$plan")
      val lsh = df.select("id1", "id2", "cosine").collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
      // precision 1.0 with identical exact cosines: every LSH pair is a true pair
      lsh.foreach { case (k, c) =>
        assert(exact.contains(k), s"LSH emitted non-pair $k")
        assert(math.abs(exact(k) - c) < 1e-12)
      }
      // identical vectors share every band deterministically → any exact
      // duplicate pair in the corpus must be recalled; also demand nonzero
      // overall recall so the tier isn't vacuously precise
      assert(lsh.nonEmpty && exact.nonEmpty)
      val recall = lsh.size.toDouble / exact.size
      assert(recall >= 0.5, s"LSH recall $recall collapsed (missed ${exact.keySet -- lsh.keySet})")
    } finally spark.conf.unset("spark.graft.dedup.embedding.exactLimit")
  }

  test("s94: kNN graph gates to the LSH tier above the exact limit; recall pinned") {
    // default gate: this corpus (≤10k vectors) runs the exact block-grid
    // tier — the all-pairs truth
    val exact = SparkEntry.queries("s94_knn_graph")(spark, sf)
      .select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // force the scale tier via the gate conf (VERDICT r4 #1)
    spark.conf.set("spark.graft.knn.exactLimit", "1")
    try {
      val df = SparkEntry.queries("s94_knn_graph")(spark, sf)
      df.collect() // materialize so the executed plan is final
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
        s"kNN LSH tier must not contain an O(n^2) join:\n$plan")
      val lsh = df.select("vec_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // the forced-tier query (the hash-gated s96) IS the gated scale path
      val s96 = SparkEntry.queries("s96_knn_graph_lsh")(spark, sf)
        .select("vec_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(s96 == lsh, "s96 must equal s94's forced LSH tier")
      // top-k edges point at NEAR neighbors, which sign-LSH recalls far
      // better than low-threshold pairs; pin a conservative floor and
      // report the measured value
      assert(exact.nonEmpty && lsh.nonEmpty)
      val recall = (lsh & exact).size.toDouble / exact.size
      info(f"kNN LSH tier edge recall vs exact top-5: $recall%.3f")
      assert(recall >= 0.5, s"kNN LSH recall $recall collapsed")
    } finally spark.conf.unset("spark.graft.knn.exactLimit")
  }

  test("s119: IVF-tier kNN graph has no O(n^2) join and sane recall vs exact") {
    val exact = SparkEntry.queries("s94_knn_graph")(spark, sf)
      .select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val df = SparkEntry.queries("s119_knn_graph_ivf")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"IVF tier must not contain an O(n^2) join:\n$plan")
    val ivf = df.select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty && ivf.nonEmpty)
    // nprobe=2 of 8 coarse lists: probing a quarter of the space must
    // still recover a solid share of true top-5 edges on this corpus
    val recall = (ivf & exact).size.toDouble / exact.size
    info(f"kNN IVF tier edge recall vs exact top-5: $recall%.3f")
    assert(recall >= 0.5, s"kNN IVF recall $recall collapsed")
  }

  test("d62: distributed label propagation agrees with driver union-find") {
    // same corpus, both tiers: the default gate picks driver union-find at
    // this scale; forcing the limit to 0 exercises the distributed
    // min-label propagation loop, whose output must be identical
    val viaUnionFind = SparkEntry.queries("d62_dedup_clusters")(spark, sf)
      .collect().map(_.toSeq).toSet
    spark.conf.set("spark.graft.dedup.clusters.unionFindLimit", "0")
    try {
      val viaPropagation = SparkEntry.queries("d62_dedup_clusters")(spark, sf)
        .collect().map(_.toSeq).toSet
      assert(viaUnionFind.nonEmpty)
      assert(viaPropagation == viaUnionFind,
        s"tier mismatch: only-uf=${viaUnionFind -- viaPropagation} " +
          s"only-prop=${viaPropagation -- viaUnionFind}")
    } finally spark.conf.unset("spark.graft.dedup.clusters.unionFindLimit")
  }

  test("d62: distributed tier converges on a diameter-16 chain (lineage checkpointing)") {
    // 17 docs in a token-window chain: doc i covers tokens [10i, 10i+40),
    // so consecutive docs share 30 tokens → 28 of 38 shingles → jaccard
    // 28/48 ≈ 0.58 ≥ 0.5, while distance-2 docs share only 20 tokens →
    // 18/58 ≈ 0.31 < 0.5. The pair graph is a pure path of diameter 16:
    // min-label propagation needs 16 join rounds, which without the
    // every-5-rounds localCheckpoint() nests 16 joins in one logical plan
    // (the analyzer blowup this spec pins the fix for).
    val docs = (0 until 17).map { i =>
      (i.toLong, (10 * i until 10 * i + 40).map(j => s"w$j").mkString(" "))
    }.toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("chain").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    spark.conf.set("spark.graft.dedup.clusters.unionFindLimit", "0") // force distributed tier
    try {
      val out = SparkEntry.queries("d62_dedup_clusters")(spark, tmp).collect()
      assert(out.length == 17, s"expected all 17 chain docs labeled, got ${out.length}")
      out.foreach { r =>
        assert(r.getLong(1) == 0L, s"doc ${r.getLong(0)} labeled ${r.getLong(1)}, not the chain min")
        assert(r.getLong(2) == 17L, s"cluster_size ${r.getLong(2)}")
      }
    } finally spark.conf.unset("spark.graft.dedup.clusters.unionFindLimit")
  }

  test("d194: starComponents labels chains, stars, cycles, and parallel edges like union-find") {
    // adversarial little graph: a 9-node path (worst case for per-round
    // contraction), a star NOT rooted at its min, a 4-cycle, duplicate
    // and reversed edges, and a self-loop-adjacent pair
    val pairs = Seq(
      (0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L), (7L, 8L),
      (21L, 20L), (21L, 22L), (21L, 23L), // star rooted at 21, min is 20
      (30L, 31L), (31L, 32L), (32L, 33L), (33L, 30L), // cycle
      (40L, 41L), (41L, 40L), (40L, 41L) // parallel + reversed
    ).toDF("doc1", "doc2")
    val got = DedupQueries.starComponents(spark, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect =
      (0L to 8L).map(_ -> 0L).toMap ++
        Seq(20L, 21L, 22L, 23L).map(_ -> 20L) ++
        Seq(30L, 31L, 32L, 33L).map(_ -> 30L) ++
        Seq(40L, 41L).map(_ -> 40L)
    assert(got == expect, s"only-got=${got.toSet -- expect.toSet} only-exp=${expect.toSet -- got.toSet}")
  }

  test("d194: big-star tier reproduces d62's clustering byte-for-byte at this sf") {
    val star = SparkEntry.queries("d194_clusters_bigstar")(spark, sf)
      .collect().map(_.toSeq).toSet
    val uf = SparkEntry.queries("d62_dedup_clusters")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(star.nonEmpty && star == uf,
      s"only-star=${star -- uf} only-uf=${uf -- star}")
  }

  test("cosine_sim expression matches manual computation and handles zero vectors") {
    graft.functions.VectorFunctions.register(spark)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)),
      (Array(1.0f, 1.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)))
      .toDF("a", "b")
      .select(call_function("cosine_sim", col("a"), col("b")).as("c"))
    val got = df.collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(got(1) == 0.0)
    assert(got(2) == 0.0) // zero-norm convention
    assert(math.abs(got(3) - 1.0 / math.sqrt(2)) < 1e-12)
    // malformed input: length mismatch and null slots yield NULL, not a
    // silently-truncated score (DuckDB's list_cosine_similarity errors)
    val bad = Seq(
      (Seq(Some(1.0f), Some(2.0f)), Seq(Some(1.0f), Some(2.0f), Some(3.0f))),
      (Seq(Some(1.0f), None), Seq(Some(1.0f), Some(2.0f))))
      .toDF("a", "b")
      .select(
        call_function("cosine_sim", col("a"), col("b")).as("c"),
        call_function("dot_product", col("a"), col("b")).as("d"))
      .collect()
    bad.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1), s"expected nulls, got $r") }
  }

  test("saltedJoin rejects right/full outer join types") {
    val df = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      graft.sources.Layouts.saltedJoin(df, df, "k", "k", 4, "right")
    }
    intercept[IllegalArgumentException] {
      graft.sources.Layouts.saltedJoin(df, df, "k", "k", 4, "full_outer")
    }
  }

  test("s43/s44: approximate ANN neighbors are a subset of the corpus with exact scores") {
    val brute = SparkEntry.queries("s42_ann_brute")(spark, sf)
      .select("query_id", "neighbor_id", "cosine").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    for (q <- Seq("s43_ann_lsh", "s44_ann_ivf")) {
      val approx = SparkEntry.queries(q)(spark, sf)
        .select("query_id", "neighbor_id", "rank", "cosine").collect()
      assert(approx.nonEmpty, s"$q returned no rows")
      // any (query, neighbor) the approx index returns that brute-force also
      // ranked must carry the identical cosine (same scoring kernel)
      approx.foreach { r =>
        val k = (r.getLong(0), r.getLong(1))
        brute.get(k).foreach(exp => assert(math.abs(exp - r.getDouble(3)) < 1e-12))
      }
      // per query at most K results, ranked 1..n without gaps
      val byQuery = approx.groupBy(_.getLong(0))
      byQuery.values.foreach { rows =>
        val ranks = rows.map(_.getLong(2)).sorted.toSeq
        assert(ranks == (1L to ranks.length).toSeq)
      }
    }
  }

  test("t66: rolling-hash fingerprints — equal texts collide, shared runs likely collide") {
    graft.functions.VectorFunctions.register(spark)
    import graft.functions.RollingMinHash
    val a = "the quick brown fox jumps over the lazy dog and keeps running far away"
    val b = "a different prefix here but jumps over the lazy dog and keeps running far away"
    val c = "zqx wvu tsr qpo nml kji hgf edc ba nothing shared with the others at all!!"
    def fp(s: String) = RollingMinHash.minHash(s.getBytes("UTF-8"), 16, 1000003L)
    assert(fp(a) == fp(a)) // deterministic
    // a and b share a long byte run → the min over windows is very likely shared
    assert(fp(a) == fp(b) || {
      // if the min window fell outside the shared run, at least SOME window hash is shared
      val wins = (s: String) => (0 to s.length - 16)
        .map(i => RollingMinHash.minHash(s.substring(i, i + 16).getBytes("UTF-8"), 16, 1000003L)).toSet
      (wins(a) & wins(b)).nonEmpty
    })
    assert(fp(a) != fp(c))
    // the query runs end-to-end with one row per doc
    val out = SparkEntry.queries("t66_fingerprint_rolling")(spark, sf)
    assert(out.count() == Tables.documents(spark, sf).count())
  }

  test("m47: frame sampling emits every-4th-frame ranges for video payloads only") {
    val frames = SparkEntry.queries("m47_frame_sample")(spark, sf).collect()
    assert(frames.nonEmpty)
    frames.foreach { r =>
      assert(r.getLong(0) % 3 == 2, "non-video doc sampled") // fake modality rule
      assert(r.getLong(1) % 4 == 0, "frame index not on the sample grid")
      assert(r.getLong(2) < r.getLong(3), "empty byte range")
    }
  }

  test("m76: batch resize is deterministic, bounded, and image-only") {
    val a = SparkEntry.queries("m76_resize_batch")(spark, sf).collect()
    val b = SparkEntry.queries("m76_resize_batch")(spark, sf).collect()
    assert(a.nonEmpty)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "resize not deterministic")
    a.foreach { r =>
      assert(r.getLong(0) % 3 == 0, "non-image doc resized")
      assert(r.getLong(3) == 32L && r.getLong(4) == 32L)
      assert(r.getLong(5) > 0 && r.getLong(5) <= 1024, s"resized_len ${r.getLong(5)}")
      assert(r.getString(6).length == 64) // sha256 hex
    }
  }

  test("q65: approx percentiles within 1% relative error of exact (hash-gated booleans)") {
    // q65 now emits the error-bound CLAIM itself (p50_ok/p99_ok) plus the
    // exact p50, so the driver's DuckDB oracle hash-gates the sketch's
    // accuracy contract; this spec pins the same booleans in-process and
    // cross-checks the exact side against q56
    val exact = SparkEntry.queries("q56_percentiles")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    SparkEntry.queries("q65_percentile_approx")(spark, sf).collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - exact(r.getString(0))) <= 1e-6,
        s"p50_exact ${r.getDouble(1)} disagrees with q56 ${exact(r.getString(0))}")
      assert(r.getBoolean(2), s"${r.getString(0)}: p50 approx outside 1% of exact")
      assert(r.getBoolean(3), s"${r.getString(0)}: p99 approx outside 1% of exact")
    }
  }

  test("m46: media feature extraction is deterministic and schema-complete") {
    val out = SparkEntry.queries("m46_media_features")(spark, sf)
    assert(out.columns.toSeq == Seq("doc_id", "media_type", "byte_len", "width",
      "height", "n_frames", "mean_byte"))
    val rows = out.limit(5).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= 64 && r.getLong(3) < 192) // width from fake header
      assert(r.getDouble(6) > 0.0 && r.getDouble(6) < 256.0)
    }
    // videos get frame counts, images/audio exactly 1
    val byType = out.groupBy("media_type").agg(max("n_frames").as("mx")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType("image") == 1L && byType("audio") == 1L && byType("video") >= 1L)
  }

  test("s139: cross-modal retrieval invariants + crafted featurization") {
    // invariants on real testdata: 5 queries x 10 ranks, contiguous ranks,
    // non-increasing cosine per query, media ids drawn from documents
    val out = SparkEntry.queries("s139_cross_modal")(spark, sf).collect()
    assert(out.length == 50, s"expected 5x10 rows, got ${out.length}")
    val docIds = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq == (1L to 10L))
      val cosines = sorted.map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
      assert(rows.forall(r => docIds.contains(r.getLong(1))))
    }
    // crafted fixture: a 128-byte ASCII doc, first half 'a' (97), second
    // half 'b' (98) -> segment means [97 x32, 98 x32]; a query embedding
    // equal to that vector must retrieve the doc at rank 1 with cosine ~1
    val tmp = java.nio.file.Files.createTempDirectory("xmodal").toString
    val docs = Seq((0L, "a" * 64 + "b" * 64), (1L, "z" * 40)).toDF("doc_id", "text")
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val qv = (Array.fill(32)(97.0f) ++ Array.fill(32)(98.0f)).toSeq
    Seq((0L, qv, 0)).toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"),
        col("label").cast("int").as("label"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val crafted = SparkEntry.queries("s139_cross_modal")(spark, tmp)
      .filter(col("rank") === 1).collect()
    assert(crafted.length == 1)
    assert(crafted.head.getLong(1) == 0L, "aligned media doc should rank first")
    assert(crafted.head.getDouble(3) > 0.999999, s"cosine ${crafted.head.getDouble(3)}")
  }

  test("d143: containment catches a quote-in-page pair that Jaccard misses") {
    // 20-token quote fully embedded in a 400-token page: containment 1.0
    // from quote -> page, jaccard ~ 0.05 (far below d38's 0.5 gate)
    val quote = (1 to 20).map(i => s"q$i").mkString(" ")
    val page = (1 to 380).map(i => s"w$i").mkString(" ") + " " + quote
    val other = (1 to 50).map(i => s"z$i").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("contain").toString
    Seq((0L, quote), (1L, page), (2L, other)).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = SparkEntry.queries("d143_containment")(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists { case (c, p, v) => c == 0L && p == 1L && v == 1.0 },
      s"quote->page containment missing: ${pairs.mkString(",")}")
    assert(!pairs.exists { case (c, _, _) => c == 1L },
      "page must not be 'contained' in the quote")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), "unrelated doc paired")
    val jac = SparkEntry.queries("d38_dedup_jaccard")(spark, tmp).count()
    assert(jac == 0L, "the symmetric gate should miss the quote-in-page pair")
    // directionality on the real corpus: containment only ever divides by
    // the contained side's shingle count, so values stay in (0, 1]
    val real = SparkEntry.queries("d143_containment")(spark, sf).collect()
    assert(real.forall(r => r.getDouble(2) >= 0.8 && r.getDouble(2) <= 1.0))
  }

  test("s140: PQ-ANN invariants + recall vs exact L2 top-10") {
    val out = SparkEntry.queries("s140_pq_ann")(spark, sf).collect()
    assert(out.length == 50, s"expected 5x10 rows, got ${out.length}")
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq == (1L to 10L))
      val exact = sorted.map(_.getLong(4))
      assert(exact.zip(exact.tail).forall { case (a, b) => a <= b },
        "exact rerank distance must be non-decreasing down the ranking")
      assert(sorted.map(_.getLong(3)).forall(_ >= 0L) &&
        exact.forall(_ >= 0L), "squared distances are non-negative")
    }
    // recall vs EXACT L2 top-10, computed independently from raw vectors
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as e").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def l2sq(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val recalls = (0L until 5L).map { q =>
      val exact = vecs.keys.filter(_ != q).toSeq
        .sortBy(n => (l2sq(vecs(q), vecs(n)), n)).take(10).toSet
      val pq = out.filter(_.getLong(0) == q).map(_.getLong(1)).toSet
      (pq & exact).size.toDouble / 10.0
    }
    val mean = recalls.sum / recalls.size
    // 8-bit codes over 8 subspaces + 5x-shortlist exact rerank: measured
    // mean recall@10 is 1.0 here (sf0.001) and 0.88 at sf0.01; the
    // UNreranked ADC ranking measures 0.36 — distance concentration on
    // near-random 64-dim vectors is what the rerank stage exists for
    assert(mean >= 0.8, s"PQ mean recall $mean below 0.8 (per-query: $recalls)")
  }

  test("s210: trained-PQ invariants + recall vs exact L2 top-10") {
    val out = SparkEntry.queries("s210_pq_trained")(spark, sf).collect()
    assert(out.length == 50, s"expected 5x10 rows, got ${out.length}")
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq == (1L to 10L))
      assert(sorted.map(_.getLong(3)).forall(_ >= 0L) &&
        sorted.map(_.getLong(4)).forall(_ >= 0L))
    }
    val vecs = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "cast(embedding as array<double>) as e").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def l2sq(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val recalls = (0L until 5L).map { q =>
      val exact = vecs.keys.filter(_ != q).toSeq
        .sortBy(n => (l2sq(vecs(q), vecs(n)), n)).take(10).toSet
      val pq = out.filter(_.getLong(0) == q).map(_.getLong(1)).toSet
      (pq & exact).size.toDouble / 10.0
    }
    val mean = recalls.sum / recalls.size
    // K=16 4-bit codes (vs s140's 256) + the same 5x rerank: the coarser
    // codebook costs recall on near-random vectors; the trained centroids
    // must still clear a usable floor (measured 0.92 at sf0.001)
    assert(mean >= 0.5, s"trained-PQ mean recall $mean below 0.5 (per-query: $recalls)")
  }

  test("s144: IVF-PQ results come only from probed lists and agree with s140 on shared candidates") {
    val ivfpq = SparkEntry.queries("s144_ivf_pq")(spark, sf).collect()
    assert(ivfpq.nonEmpty)
    ivfpq.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(2))
      assert(sorted.map(_.getLong(2)).toSeq == (1L to sorted.length).toSeq)
      val exact = sorted.map(_.getLong(4))
      assert(exact.zip(exact.tail).forall { case (a, b) => a <= b })
    }
    // the full-corpus PQ is the upper bound: every IVF-PQ result that the
    // unpruned s140 also surfaces must carry identical ADC + exact
    // distances (same codes, same tables — pruning changes the candidate
    // set, never a surviving candidate's scores)
    val full = SparkEntry.queries("s140_pq_ann")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(3), r.getLong(4)))
      .toMap
    var shared = 0
    ivfpq.foreach { r =>
      full.get((r.getLong(0), r.getLong(1))).foreach { case (ad, ed) =>
        shared += 1
        assert(r.getLong(3) == ad && r.getLong(4) == ed,
          s"scores diverge for shared candidate ${(r.getLong(0), r.getLong(1))}")
      }
    }
    assert(shared > 0, "probe-2 of 8 lists should recover some full-PQ results")
  }

  test("s156: clusters are exactly the components of the s117 mutual edges") {
    val edges = SparkEntry.queries("s117_mutual_knn")(spark, sf)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = SparkEntry.queries("s156_semantic_clusters")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = clusters.map(c => c._1 -> c._2).toMap
    // every mutual edge's endpoints must share a cluster
    edges.foreach { case (a, b) =>
      assert(byId(a) == byId(b), s"edge ($a,$b) spans clusters ${byId(a)}/${byId(b)}")
    }
    // driver recompute: union-find over the edges gives identical labels
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    clusters.foreach { case (id, cl, _) =>
      assert(cl == find(id), s"vector $id: cluster $cl != recomputed ${find(id)}")
    }
    // cluster_size accounting: sizes sum to the table size, singleton = self
    val n = Tables.embeddings(spark, sf).count()
    assert(clusters.length.toLong == n, "one row per vector")
    clusters.groupBy(_._2).foreach { case (cl, g) =>
      assert(g.forall(_._3 == g.length.toLong), s"cluster $cl size mismatch")
    }
  }

  private def embFixture(vecs: Seq[(Long, Seq[Float])]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("embfix").toString
    vecs.map { case (id, v) => (id, v, 0) }.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"),
        col("label").cast("int").as("label"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    tmp
  }

  test("s159: MMR demotes a near-duplicate that pure relevance would pick second") {
    // query 0 = e1; candidate 10 most relevant (0.8); 11 a near-copy of 10
    // (rel 0.79, sim≈0.9998 to 10); 12 less relevant (0.70) but diverse
    // (sim≈0.13 to 10). Relevance order is 10,11,12 — MMR must produce
    // 10,12,11 because pick 2 pays 0.3·sim to the already-picked 10.
    val dir = embFixture(Seq(
      0L -> Seq(1f, 0f, 0f), 1L -> Seq(0f, 0f, 1f), 2L -> Seq(0f, 0f, -1f),
      3L -> Seq(0f, -1f, 0f), 4L -> Seq(-1f, 0f, 0f),
      10L -> Seq(0.8f, 0.6f, 0f), 11L -> Seq(0.79f, 0.613f, 0f),
      12L -> Seq(0.7f, -0.714f, 0f)))
    val picks = SparkEntry.queries("s159_mmr_diversify")(spark, dir)
      .filter(col("query_id") === 0L).orderBy("pick_rank")
      .collect().map(r => r.getLong(2))
    assert(picks.toSeq == Seq(10L, 12L, 11L),
      s"MMR picks ${picks.toSeq}, want diverse 12 before redundant 11")
  }

  test("s161: 2-hop reach equals a driver BFS over the s117 mutual edges") {
    val edges = SparkEntry.queries("s117_mutual_knn")(spark, sf)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set())
    edges.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val out = SparkEntry.queries("s161_khop_reach")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = Tables.embeddings(spark, sf).count()
    assert(out.length.toLong == n, "one row per vector")
    out.foreach { case (id, deg, reach2) =>
      val nbrs = adj(id)
      assert(deg.toInt == nbrs.size, s"vertex $id degree $deg != ${nbrs.size}")
      val two = nbrs.flatMap(adj) ++ nbrs - id
      assert(reach2.toInt == two.size, s"vertex $id reach $reach2 != ${two.size}")
      assert(reach2 >= deg, s"vertex $id: reach below degree")
    }
  }

  test("s163: MaxSim separates a multi-aspect match that mean-pooling cannot") {
    // query doc 0 = the 4 basis vectors; corpus doc 2 matches every query
    // token exactly (maxsim 4.0), doc 3 is 4 copies of the centroid
    // direction (each query token caps at cos 0.5 -> maxsim 2.0). The
    // mean-pooled single vectors of docs 2 and 3 are IDENTICAL directions
    // (cosine 1.0 to the query mean) — the late-interaction score is the
    // only one of the two that separates them.
    val e = (i: Int) => Seq.tabulate(4)(j => if (j == i) 1f else 0f)
    val c = Seq(0.5f, 0.5f, 0.5f, 0.5f)
    val dir = embFixture(
      (0 until 4).map(i => i.toLong -> e(i)) ++        // query doc 0
      (4 until 8).map(i => i.toLong -> c) ++           // query doc 1
      (8 until 12).map(i => i.toLong -> e(i - 8)) ++   // corpus doc 2
      (12 until 16).map(i => i.toLong -> c))           // corpus doc 3
    val rows = SparkEntry.queries("s163_maxsim")(spark, dir)
      .filter(col("q_doc") === 0L).orderBy("rank")
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    assert(rows.head._1 == 2L && math.abs(rows.head._2 - 4.0) < 1e-6,
      s"doc 2 should win with maxsim 4.0: ${rows.toSeq}")
    val d3 = rows.find(_._1 == 3L).get
    assert(math.abs(d3._2 - 2.0) < 1e-6, s"doc 3 maxsim ${d3._2}, want 2.0")
    // the mean-pooled control: both corpus docs collapse to the same
    // direction, cosine 1.0 to the query mean — no separation
    def mean(vs: Seq[Seq[Float]]) = vs.transpose.map(_.sum / vs.length)
    def cos(a: Seq[Float], b: Seq[Float]) = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val qMean = mean((0 until 4).map(e))
    assert(math.abs(cos(qMean, mean((0 until 4).map(e))) -
      cos(qMean, mean(Seq.fill(4)(c)))) < 1e-9,
      "mean-pooled cosine must NOT separate docs 2 and 3")
  }
}
