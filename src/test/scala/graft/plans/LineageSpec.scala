package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Column-level lineage contracts: computed columns carry every source
  * column they reference, joins attribute columns to the right tables,
  * unions merge positionally, aggregates/windows/explodes propagate
  * through, and lineage never touches the data (plan-only).
  */
class LineageSpec extends SparkSpec {

  test("join + computed column: provenance crosses expressions and tables") {
    val df = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net"),
        col("p_brand"))
    val lin = Lineage.columnLineage(df).groupBy(_._1)
      .map { case (k, v) => k -> v.map(t => (t._2, t._3)).toSet }
    assert(lin("l_orderkey") == Set("lineitem" -> "l_orderkey"))
    assert(lin("net") == Set("lineitem" -> "l_extendedprice",
      "lineitem" -> "l_discount"))
    assert(lin("p_brand") == Set("part" -> "p_brand"))
  }

  test("aggregate + window + explode propagate provenance") {
    val agg = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(sum("l_quantity").as("sum_qty"))
    val aLin = Lineage.columnLineage(agg).groupBy(_._1)
      .map { case (k, v) => k -> v.map(t => (t._2, t._3)).toSet }
    assert(aLin("sum_qty") == Set("lineitem" -> "l_quantity"))
    assert(aLin("l_returnflag") == Set("lineitem" -> "l_returnflag"))

    val win = Tables.orders(spark, sf)
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("o_orderstatus").orderBy("o_totalprice")))
    val wLin = Lineage.columnLineage(win).groupBy(_._1)
      .map { case (k, v) => k -> v.map(t => (t._2, t._3)).toSet }
    assert(wLin("rank") == Set("orders" -> "o_orderstatus",
      "orders" -> "o_totalprice"))

    val ex = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val eLin = Lineage.columnLineage(ex).groupBy(_._1)
      .map { case (k, v) => k -> v.map(t => (t._2, t._3)).toSet }
    assert(eLin("tok") == Set("documents" -> "text"))
  }

  test("union merges positionally across different source tables") {
    val u = Tables.lineitem(spark, sf).select(col("l_orderkey").as("id"))
      .unionByName(Tables.orders(spark, sf).select(col("o_orderkey").as("id")))
    val lin = Lineage.columnLineage(u).groupBy(_._1)
      .map { case (k, v) => k -> v.map(t => (t._2, t._3)).toSet }
    assert(lin("id") == Set("lineitem" -> "l_orderkey", "orders" -> "o_orderkey"))
  }

  test("whole-surface sweep: every gated query's lineage resolves cleanly") {
    // plan-only analysis over every registered query — 180+ distinct plan
    // shapes (windows, expands, generates, unions, typed mapPartitions,
    // self-joins, sketch aggregates) exercise every propagation rule; a
    // crash or an unknown leaf here means a plan shape Lineage mishandles
    val known = Set("lineitem", "orders", "customer", "supplier", "part",
      "nation", "region", "events", "documents", "embeddings")
    // non-table leaves that legitimately appear inside plans
    val synthetic = Set("range", "inline", "onerowrelation",
      "localrelation", "externalrds", "logicalrdd", "memoryplan")
    // q79/q80 RUN a streaming pipeline and read back its sink, q204
    // writes then re-reads its own csv/json/orc copies, and the
    // lakehouse gates (q238/q239 SnapshotTable versions, q240 bucketed
    // tables, q259's month-partitioned staged fact) read back the tables
    // they just built — their lineage legitimately roots at the staged
    // run output, not a source table
    val streamStaged = Set("q79_stream_dedup", "q80_stream_hourly_sink",
      "q204_format_roundtrip", "q238_time_travel", "q239_merge_upsert",
      "q240_bucketed_join", "q259_dynamic_pruning", "q262_schema_evolution",
      "q263_corrupt_records", "q264_mv_refresh", "q265_stream_mv",
      // round-12 composition gates: q277 reads back the SnapshotTable it
      // compacted/vacuumed, q278 reads back its streaming sink, q280 the
      // Z-ordered layout it wrote — all legitimately root at staged output
      "q277_compact_vacuum", "q278_late_data", "q280_zorder_pruning",
      "q281_compact_inplace",
      // round-13: q284/q286 read back their streaming join sinks;
      // q287/q288/q289 read back the SnapshotTables they built (DV
      // deletes, streaming CDC merge, snapshot-layer schema evolution)
      "q284_join_late", "q286_join_outer", "q287_delete_vectors",
      "q288_stream_merge", "q289_schema_evolution", "q290_file_skipping",
      "q291_erasure_proof",
      // round-14: q293 reads back the 50-batch replay-ladder table it
      // committed, q294 the change-feed-refreshed materialized view,
      // q295-q297 the snapshot tables they updated/analyzed/reclustered
      // — all legitimately root at staged snapshot output
      "q293_replay_ladder", "q294_mv_change_feed", "q295_update_mor",
      "q296_analyze_skipping", "q297_optimize_cluster",
      "q298_table_changes", "q299_constraints", "q300_hidden_partitioning", "q301_bloom_pointlookup",
      "q302_cdc_replica",
      // round-15: q303/q305 read back the replicas they converged, q304
      // the min/max materialized view it refreshed, q306 the table its
      // branch published into, q307 the evolved transform table —
      // staged snapshots
      "q303_reorg_feed", "q304_mv_minmax", "q305_replica_reseed",
      "q306_wap", "q307_partition_evolution",
      // round-15 (cont.): q308 reads back the table it Z-ordered, q309
      // the relation it restored, q310/q311 the ingest-statted tables
      // they window-read, q312 the MoR-merged + folded table — all
      // legitimately root at staged snapshot output
      "q308_zorder_optimize", "q309_restore", "q310_ingest_stats",
      "q311_string_skipping", "q312_merge_mor",
      // round-16: q313 reads back the table whose lost-CAS OPTIMIZE it
      // reconciled, q314 the partition-scoped recluster target — staged
      // snapshots like their q297/q308 siblings
      "q313_optimize_reconcile", "q314_scoped_optimize")
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val sources = Lineage.columnLineage(fn(spark, sf)).map(_._2).toSet
        val unknown = sources.filterNot(s =>
          known.contains(s) || synthetic.contains(s))
        if (unknown.nonEmpty && !streamStaged.contains(name))
          bad += s"$name -> unknown sources $unknown"
      } catch {
        case scala.util.control.NonFatal(e) =>
          bad += s"$name -> ${e.getClass.getSimpleName}: ${e.getMessage}"
      }
    }
    assert(bad.isEmpty, s"lineage sweep failures:\n${bad.mkString("\n")}")
  }

  test("lineage of a real gated query names only true sources; plan-only") {
    // q7's star join: revenue must trace to lineitem's two price columns,
    // and the region name to region — across four join hops
    val df = graft.SparkEntry.queries("q7_join_star")(spark, sf)
    val lin = Lineage.columnLineage(df)
    val byCol = lin.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    assert(byCol.keySet.nonEmpty)
    val tables = lin.map(_._2).toSet
    assert(tables.subsetOf(Set("lineitem", "orders", "customer", "nation", "region")),
      s"unexpected source tables: $tables")
    // the lineage DataFrame shape a catalog ingests
    val ldf = Lineage.lineageDf(df)
    assert(ldf.columns.toSeq ==
      Seq("output_column", "source_table", "source_column"))
    assert(ldf.count() == lin.length.toLong)
  }
}
