package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, Alias, Attribute, AttributeSet, AttributeReference, Descending, Expression, GetStructField, LessThan, LessThanOrEqual, Literal, NamedExpression, NullsLast, PosExplode, RowNumber, SortOrder, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, GlobalLimit, LocalLimit, LogicalPlan, Project, Sort, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Rewrite the ad-hoc SQL knn shape
  * {{{
  *   SELECT <id>, vec_cosine(<emb>, <query>) AS score
  *   FROM t ORDER BY score DESC LIMIT k
  * }}}
  * into the bounded-heap [[TopKScoreId]] aggregate — the §7.3 ledger's
  * last optional item: a `spark.sql` user writing the natural ORDER BY
  * form gets the same scale plan [[graft.operators.KnnOps.topK]] builds
  * explicitly, without knowing the aggregate exists.
  *
  * WHY rewrite at all, when Spark already plans Sort+Limit as
  * `TakeOrderedAndProject`: that operator keeps k rows per partition and
  * then merges ALL partitions' candidates ON THE DRIVER — k×partitions
  * rows of driver memory (100k rows at k=100 over 1000 partitions, per
  * query). The aggregate form partial-aggregates the same per-partition
  * heaps through a normal exchange, so the merge is distributed and the
  * driver sees k rows. Same result, executor-side merge — the shape that
  * survives a 1000-executor corpus.
  *
  * Matches ONLY the exact two-column knn projection (a bigint id and the
  * cosine alias being sorted on, both directions of column order) under a
  * global `Sort` on that alias DESC NULLS LAST (the DESC default; a
  * NULLS FIRST sort is never rewritten — its answer leads with the null
  * rows the aggregate skips) with a literal limit — anything else is left
  * to Catalyst untouched. Null cosine scores (dim-mismatched vectors) and
  * null ids are EXCLUDED from the aggregate's heap, matching KnnOps
  * semantics; the ORDER BY form would surface them only when the corpus
  * has fewer than k valid candidates.
  *
  * Ordering contract: the aggregate's single output row carries the array
  * already sorted (score DESC, id ASC) and posexplode preserves element
  * order, so the rewritten plan's row order equals the Sort's (with the
  * id tiebreak KnnOps pins and plain ORDER BY score leaves unspecified).
  */
object CosineTopKRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // NullsLast only (the DESC default): under NULLS FIRST the null-scored
    // rows lead the stock result, and the aggregate — which skips nulls —
    // would return different rows; that shape is left untouched.
    case gl @ GlobalLimit(Literal(k: Int, IntegerType),
        LocalLimit(Literal(k2: Int, IntegerType),
          Sort(Seq(SortOrder(scoreAttr: Attribute, Descending, NullsLast, _)), true,
            Project(projectList, child), _)))
        if k == k2 && k > 0 && projectList.size == 2 =>
      rewrite(k, scoreAttr, projectList, child).getOrElse(gl)

    // The BATCHED shape: `row_number() OVER (PARTITION BY q ORDER BY
    // vec_cosine(...) DESC) <= k` — the natural SQL spelling of grouped
    // knn. InferWindowGroupLimit bounds this to a WindowGroupLimit +
    // full rank window (every surviving candidate row still shuffles to
    // its partition and sorts); the bounded-heap aggregate carries k
    // rows per (group × map task) through a partial-capable exchange —
    // measured 1.60 vs 1.92 s at 100k groups (TopKScale r13), and the
    // gap widens with group cardinality, so the rewrite fires whenever
    // the shape matches (it is never worse than the window-group-limit
    // bound). Same null contract as the global form: null cosines /
    // ids are excluded from the heap, visible only when a group has
    // fewer than k valid candidates (and, with the cosine guard, only
    // for dim-mismatched vectors).
    case f @ Filter(cond,
        Window(Seq(rnAlias @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(_, Seq(SortOrder(orderAttr: Attribute,
              Descending, NullsLast, _)), _)), _)),
          parts, _, child, _))
        if parts.nonEmpty && parts.forall(_.isInstanceOf[Attribute]) =>
      val k = cond match {
        case LessThanOrEqual(a: Attribute, Literal(n: Int, IntegerType))
            if a.exprId == rnAlias.exprId => n
        case LessThan(a: Attribute, Literal(n: Int, IntegerType))
            if a.exprId == rnAlias.exprId => n - 1
        case _ => 0
      }
      if (k <= 0) f
      else rewriteGrouped(k, parts.map(_.asInstanceOf[Attribute]),
        orderAttr, rnAlias, child).getOrElse(f)
  }

  /** Rewrite the grouped rank-filter into per-group [[TopKScoreId]] heaps.
    * Fires only when the window child is the pruned knn projection —
    * partition keys + one bigint id + cosine alias(es), all cosines
    * semantically equal — so arbitrary grouped-top-k queries (different
    * score expressions, extra carried columns) keep their stock plan.
    */
  private def rewriteGrouped(k: Int, parts: Seq[Attribute], orderAttr: Attribute,
      rnAlias: Alias, child: LogicalPlan): Option[LogicalPlan] = {
    val proj = child match {
      case p: Project => p
      case _ => return None
    }
    val partSet = AttributeSet(parts)
    val cosAliases = proj.projectList.collect {
      case a @ Alias(c: CosineSimilarity, _) if c.dataType == DoubleType => a
    }
    val cosIds = cosAliases.map(_.exprId).toSet
    val orderCos = cosAliases.find(_.exprId == orderAttr.exprId)
      .getOrElse(return None).child
    if (!cosAliases.forall(_.child.semanticEquals(orderCos))) return None
    val others = proj.output.filterNot(a =>
      partSet.contains(a) || cosIds.contains(a.exprId))
    val idAttr = others match {
      case Seq(one) if one.dataType == LongType => one
      case _ => return None
    }
    val topk = Alias(
      TopKScoreId(orderAttr, idAttr, k).toAggregateExpression(), "__topk")()
    val agg = Aggregate(parts, parts.map(a => a: NamedExpression) :+ topk, proj)
    val gen = PosExplode(topk.toAttribute)
    val genOut = gen.elementSchema.map(fld =>
      AttributeReference(fld.name, fld.dataType, fld.nullable)())
    val generate = Generate(gen, unrequiredChildIndex = Seq(parts.size),
      outer = false, qualifier = None, generatorOutput = genOut, child = agg)
    val posCol = genOut(0)  // 0-based rank within the group
    val pairCol = genOut(1) // struct<vec_id: bigint, score: double>
    // restore the Filter's full output (child.output :+ rn), same exprIds
    val restored: Seq[NamedExpression] = proj.output.map { a =>
      if (partSet.contains(a)) a
      else if (cosIds.contains(a.exprId))
        Alias(GetStructField(pairCol, 1, Some("score")), a.name)(exprId = a.exprId)
      else Alias(GetStructField(pairCol, 0, Some("vec_id")), a.name)(exprId = a.exprId)
    } :+ Alias(Add(posCol, Literal(1)), rnAlias.name)(exprId = rnAlias.exprId)
    Some(Project(restored, generate))
  }

  private def rewrite(k: Int, scoreAttr: Attribute,
      projectList: Seq[NamedExpression], child: LogicalPlan): Option[LogicalPlan] = {
    // the sorted-on column must be an alias of the native cosine …
    val scoreAlias = projectList.collectFirst {
      case a @ Alias(c: CosineSimilarity, _)
          if a.exprId == scoreAttr.exprId && c.dataType == DoubleType => a
    }
    // … and the other output a bigint id
    val idNamed = projectList.collectFirst {
      case n: NamedExpression
          if n.exprId != scoreAttr.exprId && n.dataType == LongType => n
    }
    (scoreAlias, idNamed) match {
      case (Some(sa), Some(idn)) =>
        val idExpr: Expression = idn match {
          case Alias(e, _) => e
          case attr => attr
        }
        val topk = Alias(
          TopKScoreId(sa.child, idExpr, k).toAggregateExpression(), "__topk")()
        val agg = Aggregate(Nil, Seq(topk), child)
        val gen = PosExplode(topk.toAttribute)
        val genOut = gen.elementSchema.map(f =>
          AttributeReference(f.name, f.dataType, f.nullable)())
        val generate = Generate(gen, unrequiredChildIndex = Seq(0),
          outer = false, qualifier = None,
          generatorOutput = genOut, child = agg)
        val pairCol = genOut(1) // struct<vec_id: bigint, score: double>
        // rebuild the ORIGINAL output attributes (names, order, exprIds)
        val restored = projectList.map { n =>
          if (n.exprId == scoreAttr.exprId)
            Alias(GetStructField(pairCol, 1, Some("score")), n.name)(exprId = n.exprId)
          else
            Alias(GetStructField(pairCol, 0, Some("vec_id")), n.name)(exprId = n.exprId)
        }
        Some(Project(restored, generate))
      case _ => None
    }
  }
}
