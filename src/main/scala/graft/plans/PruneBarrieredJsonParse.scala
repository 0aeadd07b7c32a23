package graft.plans

import graft.functions.OptimizationBarrier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StructType

/** Restores `from_json` schema pruning through the [[OptimizationBarrier]].
  *
  * The barrier exists to stop join pushdown from multiplying the pass-2
  * payload parse (one `IsNotNull` guard per output column used to re-parse
  * the payload up to 10x per row), but it also hides the parse from Spark's
  * own `OptimizeCsvJsonExprs`, so a narrow select over a wide relationalized
  * table parsed the FULL payload — the profile every BI-style consumer of a
  * wide table hits.
  *
  * This rule reimplements the pruning across the barrier: for a consumer
  * node (Project / Aggregate, optionally separated from the parse by
  * Filters) over a Project that defines `r = barrier(from_json(payload))`,
  * it collects the struct fields the consumer chain actually extracts and
  * shrinks the parse schema to exactly those fields, remapping the
  * `GetStructField` ordinals above. The barrier itself is preserved — still
  * exactly one parse per payload — and the rule is idempotent (a second pass
  * finds every field referenced). Guard fields referenced by the routing
  * projection's raise-on-bad-tag checks count as referenced, so frozen-schema
  * error semantics survive pruning.
  *
  * Window is deliberately NOT a consumer: `Window.output` is
  * `child.output ++ windowExprs`, so the parse alias would flow through to
  * ancestor nodes whose `GetStructField` ordinals this local rewrite cannot
  * see — pruning to the window's own uses would silently retype the struct
  * under them. Project and Aggregate are safe because their output IS their
  * expression list (a bare pass-through of the alias sets `whole` and bails).
  * The exclusion costs nothing: Spark's `ExtractWindowExpressions` always
  * materializes a window's inputs (partition/order keys, function args) in a
  * Project BELOW the Window, and after ColumnPruning that projection is a
  * narrow consumer directly over the defining project — window queries get
  * pruning transitively. PlanSpec pins a window over 2 of 50 columns parsing
  * an 8-field struct.
  *
  * Runs via `spark.experimental.extraOptimizations` (registered by
  * [[graft.functions.GraftFunctions.registerAll]]), i.e. after the main
  * operator-optimization batch: by then ColumnPruning + CollapseProject have
  * already narrowed the consumer projection to the user's selected columns,
  * so "fields the consumer extracts" is exactly the narrow set.
  *
  * Scale: on a 50-column table a 2-column select now parses 8 tag fields
  * instead of 200 — Jackson still tokenizes the payload text once, but
  * skips conversion and row materialization for everything unreferenced.
  */
object PruneBarrieredJsonParse extends Rule[LogicalPlan] {

  private final case class ParseAlias(alias: Alias, barrier: OptimizationBarrier,
                                      parse: JsonToStructs, schema: StructType)

  private def parseAliasOf(e: NamedExpression): Option[ParseAlias] = e match {
    case a @ Alias(b @ OptimizationBarrier(j: JsonToStructs), _) =>
      j.schema match {
        case st: StructType => Some(ParseAlias(a, b, j, st))
        case _ => None
      }
    case _ => None
  }

  /** Walk down through Filters to the Project defining parse aliases.
    * Returns (filters outermost-last, defining project).
    */
  private def unwrap(n: LogicalPlan, acc: List[Filter]): Option[(List[Filter], Project)] = n match {
    case f: Filter => unwrap(f.child, f :: acc)
    case p: Project if p.projectList.exists(parseAliasOf(_).isDefined) => Some((acc, p))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case consumer: UnaryNode if consumer.isInstanceOf[Project] ||
        consumer.isInstanceOf[Aggregate] =>
      unwrap(consumer.child, Nil) match {
        case None => consumer
        case Some((filters, defining)) =>
          val consumerExprs: Seq[Expression] =
            consumer.expressions ++ filters.map(_.condition)
          // alias exprId -> (old schema, pruned schema, retyped attribute)
          val rewrites: Map[ExprId, (StructType, StructType, AttributeReference, Alias)] =
            defining.projectList.flatMap(parseAliasOf).flatMap { pa =>
              val id = pa.alias.exprId
              var whole = false
              val needed = scala.collection.mutable.LinkedHashSet.empty[String]
              def scanUses(e: Expression): Unit = e match {
                case GetStructField(ar: AttributeReference, ord, _) if ar.exprId == id =>
                  needed += pa.schema(ord).name
                case ar: AttributeReference if ar.exprId == id => whole = true
                case other => other.children.foreach(scanUses)
              }
              consumerExprs.foreach(scanUses)
              if (whole || needed.isEmpty || needed.size >= pa.schema.length) None
              else {
                val pruned = StructType(pa.schema.fields.filter(f => needed.contains(f.name)))
                val newAlias = Alias(
                  pa.barrier.copy(child = pa.parse.copy(schema = pruned)),
                  pa.alias.name)(pa.alias.exprId, pa.alias.qualifier)
                Some(id -> (pa.schema, pruned,
                  newAlias.toAttribute.asInstanceOf[AttributeReference], newAlias))
              }
            }.toMap
          if (rewrites.isEmpty) consumer
          else {
            val pf: PartialFunction[Expression, Expression] = {
              case GetStructField(ar: AttributeReference, ord, nameOpt)
                  if rewrites.contains(ar.exprId) =>
                val (old, pruned, attr, _) = rewrites(ar.exprId)
                GetStructField(attr, pruned.fieldIndex(old(ord).name), nameOpt)
            }
            def rewrite(e: Expression): Expression = e.transformDown(pf)
            val newDefining = Project(
              defining.projectList.map(ne => parseAliasOf(ne) match {
                case Some(pa) if rewrites.contains(pa.alias.exprId) =>
                  rewrites(pa.alias.exprId)._4
                case _ => ne
              }),
              defining.child)
            // filters were collected innermost-first; fold re-nests them so
            // the outermost filter ends up on top
            val rebuilt = filters.foldLeft(newDefining: LogicalPlan)(
              (child, f) => Filter(rewrite(f.condition), child))
            consumer.withNewChildren(Seq(rebuilt)).transformExpressions(pf)
          }
      }
  }
}
