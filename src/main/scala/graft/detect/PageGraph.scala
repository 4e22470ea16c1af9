package graft.detect

import scala.collection.mutable
import graft.dom.{DomDocument, DomNode}
import graft.css.CssSelector

/** Per-page node graph + selector machinery — the Spark-side analog of the
  * reference's GraphLoader (/root/reference/webspot/graph/graph_loader.py).
  * Everything here runs in-row inside the fused detect map (SURVEY.md §1.2:
  * pages are embarrassingly parallel, graphs never span pages).
  */
object PageGraph {
  /** script/link/meta + SVG tags excluded from the node table
    * (graph_loader.py:22-30).
    */
  val EscapedTags: Set[String] = Set(
    "script", "link", "meta",
    "circle", "clippath", "defs", "ellipse", "g", "image", "line",
    "lineargradient", "mask", "path", "pattern", "polygon", "polyline",
    "radialgradient", "rect", "stop", "svg", "text", "tspan")

  val AvailableFeatureKeys: Set[String] = Set("tag", "id", "class", "style")

  def apply(doc: DomDocument, bodyOnly: Boolean = true): Option[PageGraph] = {
    val rootId =
      if (bodyOnly) doc.findFirst("body") match {
        case Some(b) => b
        case None    => return None // reference raises 'No body tag found'
      }
      else 0
    Some(new PageGraph(doc, rootId))
  }
}

final class PageGraph(val doc: DomDocument, val rootId: Int,
    val embedWalkLength: Int = 8, val dfsDepth: Int = 8) {
  import PageGraph._

  /** Node ids of the root subtree (root included), document order, escaped
    * tags dropped (graph_loader.py:126-150). Note: descendants of an escaped
    * tag are kept (the reference skips only the escaped node itself).
    */
  val nodeIds: Array[Int] = {
    val buf = mutable.ArrayBuffer.empty[Int]
    def rec(id: Int): Unit = {
      if (!EscapedTags.contains(doc(id).tag)) buf += id
      doc.children(id).foreach(rec)
    }
    rec(rootId)
    buf.toArray
  }

  val n: Int = nodeIds.length

  /** dense index of a node id within nodeIds; -1 when absent (= the
    * reference's LabelEncoder + nodes_dict miss). Node ids are already
    * dense document-order ints, so a flat array beats a boxed map.
    */
  private val idToIdx: Array[Int] = {
    val m = new Array[Int](doc.size)
    java.util.Arrays.fill(m, -1)
    var i = 0
    while (i < n) { m(nodeIds(i)) = i; i += 1 }
    m
  }
  def indexOfId(id: Int): Int =
    if (id >= 0 && id < idToIdx.length) idToIdx(id) else -1
  def node(idx: Int): DomNode = doc(nodeIds(idx))
  def containsId(id: Int): Boolean = indexOfId(id) >= 0

  /** Per node: one-hot feature names restricted to tag/id/class/style
    * (graph_loader.py:148-150 + node.py pseudo-class filter). Single fused
    * pass over the attrs — semantically `featureNames.filter(available)`
    * (tag first, attrs in source order, class exploded per token,
    * pseudo-class-looking class values dropped, first-occurrence distinct)
    * without the intermediate rawFeatures/features/featureNames vectors;
    * this runs per node inside the detect map and the chain of throwaway
    * vectors was measurable memory traffic at 16 threads.
    */
  val nodeFeatureNames: Array[Array[String]] = {
    // per-page intern of "prefix=value" feature names: a page has few
    // distinct tags/classes but repeats them across hundreds of nodes —
    // interning turns ~3 string concats per node into a no-alloc map hit
    // (keyed by the raw value, so the lookup itself allocates nothing)
    val tagIntern = new java.util.HashMap[String, String]()
    val classIntern = new java.util.HashMap[String, String]()
    val idIntern = new java.util.HashMap[String, String]()
    val styleIntern = new java.util.HashMap[String, String]()
    def interned(m: java.util.HashMap[String, String], prefix: String,
        v: String): String = {
      val hit = m.get(v)
      if (hit != null) hit
      else { val s = prefix + v; m.put(v, s); s }
    }
    // scratch reused across nodes (graph construction is single-threaded);
    // first-occurrence dedup by linear scan — nodes have ≤ a handful of
    // features, and interning makes the equality checks reference-fast
    var scratch = new Array[String](16)
    var cnt = 0
    def add(f: String): Unit = {
      var i = 0
      while (i < cnt) {
        if (scratch(i) == f) return
        i += 1
      }
      if (cnt == scratch.length) scratch = java.util.Arrays.copyOf(scratch, cnt * 2)
      scratch(cnt) = f
      cnt += 1
    }
    nodeIds.map { id =>
      val nd = doc(id)
      cnt = 0
      add(interned(tagIntern, "tag=", nd.tag))
      val fa = nd.attrsFlat
      var ai = 0
      while (ai < fa.length) {
        val k = fa(ai); val v = fa(ai + 1)
        if (k == "class") graft.dom.Ws.tokens(v).foreach { t =>
          if (!t.contains(":")) add(interned(classIntern, "class=", t))
        }
        else if (k == "id") add(interned(idIntern, "id=", v))
        else if (k == "style") add(interned(styleIntern, "style=", v))
        ai += 2
      }
      java.util.Arrays.copyOf(scratch, cnt)
    }
  }

  /** DictVectorizer analog: sorted distinct feature names → column index
    * (sklearn DictVectorizer sorts feature names; graph_loader.py:213).
    */
  val featureNames: Array[String] = {
    val set = mutable.TreeSet.empty[String]
    nodeFeatureNames.foreach(_.foreach(set += _))
    set.toArray
  }
  /** Sparse rows: sorted column indices per node (all values 1.0).
    * featureNames is sorted (TreeSet), so the column of a feature is its
    * binarySearch position — no boxed map, no intermediate vectors.
    */
  val rows: Array[Array[Int]] = {
    val names = featureNames.asInstanceOf[Array[AnyRef]]
    nodeFeatureNames.map { fs =>
      val a = new Array[Int](fs.length)
      var j = 0
      while (j < fs.length) {
        a(j) = java.util.Arrays.binarySearch(names, fs(j))
        j += 1
      }
      java.util.Arrays.sort(a)
      a
    }
  }

  /** column sums over the page (A-1). */
  val featureCounts: Array[Int] = {
    val c = new Array[Int](featureNames.length)
    rows.foreach(_.foreach(j => c(j) += 1))
    c
  }

  /** children adjacency in dense index space — only edges whose parent is a
    * kept node (graph_loader.py:217-223 edge_nodes filter).
    */
  val childrenIdx: Array[Array[Int]] = {
    // two-pass count + fill: no per-node growable buffers
    val counts = new Array[Int](n)
    var i = 0
    while (i < n) {
      val pIdx = indexOfId(node(i).parentId)
      if (pIdx >= 0) counts(pIdx) += 1
      i += 1
    }
    val out = Array.tabulate(n)(j => new Array[Int](counts(j)))
    val fill = new Array[Int](n)
    i = 0
    while (i < n) {
      val pIdx = indexOfId(node(i).parentId)
      if (pIdx >= 0) { out(pIdx)(fill(pIdx)) = i; fill(pIdx) += 1 }
      i += 1
    }
    out
  }

  /** node text per reference semantics (graph_loader.py:241-243). */
  val texts: Array[String] = nodeIds.map(doc(_).nodeText)
  val textLengths: Array[Int] = texts.map(t => if (t == null) 0 else t.length)

  /** nodes (kept) with a given parent id, document order
    * (graph_loader.py:285-286) — note escaped-tag children are invisible here,
    * matching the reference's nodes_ scan.
    */
  def childrenOfId(parentId: Int): Array[Int] = {
    val pIdx = indexOfId(parentId)
    if (pIdx >= 0) childrenIdx(pIdx).map(nodeIds)
    else nodeIds.filter(id => doc(id).parentId == parentId)
  }

  /** DFS descendants of a node, depth ≤ dfsDepth, grouped-by-parent in
    * preorder-of-first-visit — mirrors networkx dfs_successors flattening
    * (graph_loader.py:263-276): dict parent → discovered children, flattened.
    */
  def descendantsIdx(idx: Int): Array[Int] = {
    // networkx dfs_successors flattens dict[parent -> discovered children]
    // in parent-first-insertion order; over a tree (each node has one
    // parent, parents precede children in index space) that is exactly:
    // for each expanded node u in preorder, u's children as one group.
    // Recursion depth is capped at dfsDepth (8); the former
    // LinkedHashMap/BitSet/flatten chain was per-sampled-item allocation
    // in candidate scoring and field mining.
    var out = new Array[Int](16)
    var len = 0
    def rec(u: Int, depth: Int): Unit = {
      if (depth >= dfsDepth) return
      val kids = childrenIdx(u)
      if (kids.length > 0) {
        if (len + kids.length > out.length)
          out = java.util.Arrays.copyOf(out, math.max(out.length * 2, len + kids.length))
        System.arraycopy(kids, 0, out, len, kids.length)
        len += kids.length
        var i = 0
        while (i < kids.length) { rec(kids(i), depth + 1); i += 1 }
      }
    }
    rec(idx, 0)
    java.util.Arrays.copyOf(out, len)
  }

  def descendantsOfId(id: Int): Array[Int] = {
    val idx = indexOfId(id)
    if (idx < 0) Array.empty else descendantsIdx(idx)
  }

  // ---- unique-feature machinery (graph_loader.py:288-333) ----
  // All vectorized features already have available keys, so
  // unique_available == unique (count == 1 columns).
  /** node id → has a page-unique feature (membership is all the reference
    * uses; graph_loader.py:421).
    */
  lazy val uniqueFeatureNodeIds: java.util.BitSet = {
    val out = new java.util.BitSet(doc.size)
    var i = 0
    while (i < n) {
      val r = rows(i)
      var j = 0
      var hit = false
      while (!hit && j < r.length) { hit = featureCounts(r(j)) == 1; j += 1 }
      if (hit) out.set(nodeIds(i))
      i += 1
    }
    out
  }

  // ---- selector repr + path (graph_loader.py:335-433) ----

  private def previousSiblings(nd: DomNode): Int = {
    // kept nodes with same parent, same tag, smaller id (graph_loader.py:335-338)
    var c = 0
    var i = 0
    while (i < n) {
      val m = node(i)
      if (m.parentId == nd.parentId && m.id < nd.id && m.tag == nd.tag) c += 1
      i += 1
    }
    c
  }

  private def previousSiblingsWithClasses(nd: DomNode): Int = {
    // subset check directly on the (small) class vectors — the per-node
    // toSet in this O(n) scan was measurable allocation at 16 threads
    val classes = nd.featureClasses
    var c = 0
    var i = 0
    while (i < n) {
      val m = node(i)
      if (m.parentId == nd.parentId && m.id < nd.id && m.tag == nd.tag &&
        classes.forall(m.featureClasses.contains)) c += 1
      i += 1
    }
    c
  }

  /** node is last among its parent's *kept* children (graph_loader.py:347-350). */
  private def isLastChild(nd: DomNode): Boolean = {
    val siblings = childrenOfId(nd.parentId)
    siblings.nonEmpty && siblings.last == nd.id
  }

  // repr cache: one dense String array per (numbered, noId) combo — every
  // repr'd node is a kept node (selectorPath guards with containsId), and
  // the former tuple-keyed map boxed a key per lookup on the extract path
  private val reprCache = new Array[Array[String]](4)

  def selectorRepr(nd: DomNode, numbered: Boolean = true, noId: Boolean = false): String = {
    val idx = indexOfId(nd.id)
    if (idx < 0) return selectorReprUncached(nd, numbered, noId)
    val slot = (if (numbered) 1 else 0) | (if (noId) 2 else 0)
    var arr = reprCache(slot)
    if (arr == null) { arr = new Array[String](n); reprCache(slot) = arr }
    val hit = arr(idx)
    if (hit != null) hit
    else {
      val s = selectorReprUncached(nd, numbered, noId)
      arr(idx) = s
      s
    }
  }

  private def selectorReprUncached(nd: DomNode, numbered: Boolean, noId: Boolean): String = {
    val fid = nd.featureId.orNull
    val classes = nd.featureClasses
    if (fid != null && !noId && CssSelector.isValidIdent(fid)) {
      s"${nd.tag}#$fid"
    } else if (classes.nonEmpty && classes.forall(CssSelector.isValidIdent)) {
      if (numbered) {
        val length = previousSiblingsWithClasses(nd) + 1
        if (length > 1) {
          if (isLastChild(nd)) return s"${nd.tag}.${classes.mkString(".")}:last-child"
          return s"${nd.tag}.${classes.mkString(".")}:nth-of-type($length)"
        }
      }
      s"${nd.tag}.${classes.mkString(".")}"
    } else {
      if (numbered) {
        val length = previousSiblings(nd) + 1
        if (length > 1) {
          if (isLastChild(nd)) return s"${nd.tag}:last-child"
          return s"${nd.tag}:nth-of-type($length)"
        }
      }
      nd.tag
    }
  }

  /** `>`-joined ancestor path with unique-feature and root-id stop conditions
    * (graph_loader.py:398-433) — the correctness-critical function (F10).
    */
  def selectorPath(startNode: DomNode, rootIdOpt: Option[Int] = None,
      numbered: Boolean = true, noId: Boolean = false): String = {
    var nd = startNode
    if (nd.parentId < 0) return selectorRepr(nd, numbered, noId)
    // collected leaf→root, joined in reverse (the former prepend-to-buffer)
    var parts = new Array[String](8)
    var cnt = 0
    var total = 0
    def push(s: String): Unit = {
      if (cnt == parts.length) parts = java.util.Arrays.copyOf(parts, cnt * 2)
      parts(cnt) = s
      total += s.length
      cnt += 1
    }
    push(selectorRepr(nd, numbered, noId))
    val rootId = rootIdOpt.getOrElse(-1)
    var loop = true
    while (loop && nd.parentId >= 0) {
      val pid = nd.parentId
      if (!containsId(pid)) loop = false
      else {
        val p = doc(pid)
        if (rootIdOpt.isDefined && p.id == rootId) loop = false
        else if (!noId && uniqueFeatureNodeIds.get(p.id)) {
          push(selectorRepr(p, numbered, noId))
          loop = false
        } else {
          push(selectorRepr(p, numbered, noId))
          nd = p
        }
      }
    }
    if (cnt == 1) return parts(0)
    val sb = new java.lang.StringBuilder(total + 3 * (cnt - 1))
    var i = cnt - 1
    while (i >= 0) {
      sb.append(parts(i))
      if (i > 0) sb.append(" > ")
      i -= 1
    }
    sb.toString
  }
}
