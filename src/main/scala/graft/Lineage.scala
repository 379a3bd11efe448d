package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-level lineage extraction from the ANALYZED logical plan — the
  * governance/impact-analysis read ("which source columns feed this output
  * column?") a warehouse catalog needs for every materialized table. Works
  * on any DataFrame the engine can build: walks the plan bottom-up,
  * seeding each leaf-relation attribute with `table.column` (table from
  * the scan's file path) and propagating reference sets through every
  * Project/Aggregate/Window/Join/Generate on the way up.
  *
  * Deliberately coarse in the standard ways: a column referenced only in
  * a Filter/Join condition is CONTROL lineage, not data lineage, and is
  * not attributed to outputs (the usual Atlas/OpenLineage distinction);
  * literals contribute nothing.
  */
object Lineage {

  /** For each output column name of `df`: the set of `table.column`
    * source references that can flow into its values.
    */
  def columnLineage(df: DataFrame): Map[String, Set[String]] = {
    val plan = df.queryExecution.analyzed
    val sources = build(plan)
    plan.output.map { a =>
      a.name -> sources.getOrElse(a.exprId, Set.empty)
    }.toMap
  }

  private def leafTable(l: LeafNode): String = l match {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      val p = fs.location.rootPaths.headOption.map(_.getName).getOrElse("src")
      p.stripSuffix(".parquet").stripSuffix(".json").stripSuffix(".csv")
        .stripSuffix(".orc")
    case other => other.nodeName.toLowerCase
  }

  /** exprId → source-column set, computed bottom-up over the whole plan. */
  private def build(plan: LogicalPlan)
      : Map[org.apache.spark.sql.catalyst.expressions.ExprId, Set[String]] = {
    val childMaps = plan.children.map(build)
    val below = childMaps.foldLeft(
      Map.empty[org.apache.spark.sql.catalyst.expressions.ExprId, Set[String]])(_ ++ _)
    plan match {
      case l: LeafNode =>
        val t = leafTable(l)
        l.output.map(a => a.exprId -> Set(s"$t.${a.name}")).toMap
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate =>
        // generator outputs (explode/posexplode/inline attributes) are
        // fresh non-Alias ExprIds — each inherits the sources of the
        // generator's input expression (r9 ADVICE: these resolved to
        // empty sets and broke the "propagates through Generate" claim)
        val genSources = refSources(g.generator, below)
        below ++ g.generatorOutput.map(a => a.exprId -> genSources)
      case u: org.apache.spark.sql.catalyst.plans.logical.Union =>
        // Union outputs are fresh ExprIds too: column i's sources are
        // the union of every child's column-i sources
        val unionCols = u.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> u.children.flatMap(c =>
            below.getOrElse(c.output(i).exprId, Set.empty)).toSet
        }
        below ++ unionCols
      case _ =>
        // every Alias anywhere in this node's expressions defines a new
        // attribute whose sources are the union of its referenced
        // attributes' sources (transitively through `below`)
        val defined = plan.expressions.flatMap { e =>
          e.collect { case al: Alias =>
            al.exprId -> refSources(al.child, below)
          }
        }.toMap
        // attributes that pass through unchanged keep their sets
        below ++ defined
    }
  }

  private def refSources(
      e: Expression,
      m: Map[org.apache.spark.sql.catalyst.expressions.ExprId, Set[String]])
      : Set[String] =
    e.collect { case a: Attribute => m.getOrElse(a.exprId, Set.empty) }
      .foldLeft(Set.empty[String])(_ ++ _)
}
