package graft.detect

/** plain-table detector parity
  * (/root/reference/webspot/detect/detectors/plain_table.py:7-30): the
  * reference detector pre-processes by selecting the page's `<table>` nodes
  * (get_nodes_by_feature tag=table) and then its `_train()` body is `pass` —
  * it NEVER produces extraction results and is not registered in the request
  * pipeline. Surface kept for completeness (SURVEY §1.1): [[tableNodes]] is
  * the pre-process step, [[run]] the (intentionally empty) result.
  */
object PlainTable {

  /** graph indices of kept `<table>` nodes, document order. */
  def tableNodes(g: PageGraph): Vector[Int] =
    (0 until g.n).iterator.filter(i => g.node(i).tag == "table").toVector

  /** Bug-compatible run: pre-process happens, no results are ever emitted. */
  def run(g: PageGraph): Vector[ListResultOut] = {
    val _ = tableNodes(g)
    Vector.empty
  }
}
