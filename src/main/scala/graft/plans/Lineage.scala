package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Attribute, ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage by walking the ANALYZED Catalyst plan (the
  * governance question "which physical source columns feed this output
  * column" — what a catalog/audit integration needs before any result
  * is published). Works on any DataFrame the engine builds because the
  * provenance graph is derived from the same attribute graph Catalyst
  * resolves — no query-author cooperation, annotations, or string
  * parsing involved.
  *
  * Propagation rules: leaf scans map each output attribute to
  * (table, column), where table is the parquet directory/file basename;
  * Project/Aggregate/Window map each named expression to the union of
  * its referenced attributes' provenance (so `price * (1 - discount)`
  * carries both source columns); Union merges children POSITIONALLY
  * (its output is positional); Expand (cube/rollup/pivot) unions each
  * output position across its projections; Generate (explode) maps
  * generator outputs to the generator's references; every other node
  * passes its children's map through unchanged.
  *
  * Scale note: this runs on the PLAN, not the data — cost is plan-sized
  * and identical on a laptop and a 1000-executor cluster.
  */
object Lineage {

  /** (output column, source table, source column) triples, sorted. */
  def columnLineage(df: DataFrame): Seq[(String, String, String)] = {
    val plan = df.queryExecution.analyzed
    val prov = provenance(plan)
    plan.output.flatMap { a =>
      prov.getOrElse(a.exprId, Set.empty).toSeq.map { case (t, c) =>
        (a.name, t, c)
      }
    }.distinct.sortBy(identity)
  }

  private def tableName(leaf: LeafNode): String = leaf match {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      val p = fs.location.rootPaths.headOption.map(_.getName).getOrElse("unknown")
      p.stripSuffix(".parquet").stripSuffix(".csv").stripSuffix(".json")
    case _: LocalRelation => "inline"
    case other => other.nodeName.toLowerCase
  }

  private def fromRefs(
      ne: NamedExpression,
      child: Map[ExprId, Set[(String, String)]]): (ExprId, Set[(String, String)]) =
    ne.toAttribute.exprId ->
      ne.references.toSeq.flatMap(r => child.getOrElse(r.exprId, Set.empty)).toSet

  private def provenance(p: LogicalPlan): Map[ExprId, Set[(String, String)]] =
    p match {
      case leaf: LeafNode =>
        val t = tableName(leaf)
        leaf.output.map(a => a.exprId -> Set(t -> a.name)).toMap
      case Project(list, child) =>
        val c = provenance(child)
        c ++ list.map(fromRefs(_, c))
      case Aggregate(_, aggs, child, _) =>
        val c = provenance(child)
        c ++ aggs.map(fromRefs(_, c))
      case w: Window =>
        val c = provenance(w.child)
        c ++ w.windowExpressions.map(fromRefs(_, c))
      case u: Union =>
        val cs = u.children.map(provenance)
        val byPos = u.children.map(_.output).transpose
        cs.reduce(_ ++ _) ++ u.output.zip(byPos).map { case (out, ins) =>
          out.exprId -> ins.zip(cs).flatMap { case (a, c) =>
            c.getOrElse(a.exprId, Set.empty)
          }.toSet
        }
      case e: Expand =>
        val c = provenance(e.child)
        c ++ e.output.zipWithIndex.map { case (out, i) =>
          out.exprId -> e.projections.flatMap(row =>
            row(i).references.toSeq.flatMap(r => c.getOrElse(r.exprId, Set.empty)))
            .toSet
        }
      case g: Generate =>
        val c = provenance(g.child)
        val src = g.generator.references.toSeq
          .flatMap(r => c.getOrElse(r.exprId, Set.empty)).toSet
        c ++ g.generatorOutput.map(_.exprId -> src)
      case other =>
        // Filter/Sort/Limit/Join/SubqueryAlias/Distinct/…: outputs are
        // child attributes, provenance passes through
        other.children.map(provenance)
          .foldLeft(Map.empty[ExprId, Set[(String, String)]])(_ ++ _)
    }

  /** The lineage table as a DataFrame — the shape a catalog ingests. */
  def lineageDf(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    columnLineage(df).toDF("output_column", "source_table", "source_column")
  }
}
