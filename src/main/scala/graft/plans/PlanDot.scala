package graft.plans

import org.apache.spark.sql.catalyst.trees.TreeNode
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Graphviz rendering of a plan tree (reference pigpen-viz,
  * viz.clj:28-60: `script->graph` renders the op DAG with one labeled
  * box per command). Works on any Catalyst `TreeNode` — logical plan,
  * executed SparkPlan, expression tree.
  */
object PlanDot {

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def label(n: TreeNode[_]): String = {
    // nodeName headline + a clipped detail line (viz.clj:34-40 shows the
    // command type plus its description)
    val detail = n.simpleString(60).stripPrefix(n.nodeName).trim
    if (detail.isEmpty) n.nodeName else n.nodeName + "\\n" + esc(detail)
  }

  /** AQE wrappers report no `children` — their live subtree hangs off a
    * field instead. Follow it so the rendered graph shows the real
    * operators, not one opaque box.
    */
  private def childrenOf[T <: TreeNode[T]](n: TreeNode[T]): Seq[TreeNode[T]] = n match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan.asInstanceOf[TreeNode[T]])
    case q: QueryStageExec => Seq(q.plan.asInstanceOf[TreeNode[T]])
    case r: ReusedExchangeExec => Seq(r.child.asInstanceOf[TreeNode[T]])
    case _ => n.children
  }

  /** DOT digraph of the plan, edges child → parent (dataflow order).
    * Nodes memoize by object identity, so shared subtrees (reused
    * exchanges, cached branches) render as ONE node with fan-out — the
    * actual executed DAG, not an exponentially-unrolled tree (the
    * reference's viz renders the op DAG the same way, viz.clj:28-60).
    */
  def toDot[T <: TreeNode[T]](root: TreeNode[T], graphName: String = "plan"): String = {
    val sb = new StringBuilder
    sb.append("digraph \"").append(esc(graphName)).append("\" {\n")
    sb.append("  rankdir=BT;\n  node [shape=box, fontname=\"monospace\", fontsize=10];\n")
    val seen = new java.util.IdentityHashMap[AnyRef, Integer]()
    var nextId = 0
    def walk(n: TreeNode[T]): Int = {
      val prior = seen.get(n)
      if (prior != null) return prior.intValue()
      val id = nextId
      nextId += 1
      seen.put(n, Integer.valueOf(id))
      sb.append(s"""  n$id [label="${label(n)}"];\n""")
      childrenOf(n).foreach { c =>
        val cid = walk(c.asInstanceOf[TreeNode[T]])
        sb.append(s"  n$cid -> n$id;\n")
      }
      id
    }
    walk(root.asInstanceOf[TreeNode[T]])
    sb.append("}\n")
    sb.toString
  }
}
