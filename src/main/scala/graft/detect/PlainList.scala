package graft.detect

import scala.collection.mutable
import graft.dom.DomDocument
import graft.css.CssSelector
import graft.urls.UrlOps

/** Spark-encodable detection result tree — the analog of the reference's
  * Result/ListResult/Selector pydantic models
  * (/root/reference/webspot/detect/models/).
  */
final case class FieldRule(name: String, selector: String, fieldType: String, attribute: String)
final case class ExtractedRow(values: Map[String, String])
final case class ListResultOut(
    name: String,
    listSelector: String,
    itemsSelector: String,
    fullItemsSelector: String,
    listNodeId: Int,
    score: Double,
    scoreTextRichness: Double,
    scoreComplexity: Double,
    scoreItemCount: Double,
    fields: Seq[FieldRule],
    data: Seq[ExtractedRow])
final case class PaginationOut(selector: String, nodeId: Int, nextUrl: String)
final case class DetectOutput(
    url: String,
    nNodes: Int,
    lists: Seq[ListResultOut],
    pagination: Option[PaginationOut])

/** Unsupervised repeating-list detector — semantics of the reference's
  * PlainListDetector (/root/reference/webspot/detect/detectors/plain_list.py)
  * re-expressed as one deterministic in-row function. All randomness is
  * seeded from the page url (SURVEY.md §7.5 determinism policy).
  */
object PlainList {
  val FieldTypeText = "text"
  val FieldTypeLinkUrl = "link_url"
  val FieldTypeImageUrl = "image_url"

  // plain_list.py:36-54 defaults
  val DbscanEps = 0.01
  val DbscanMinSamples = 5
  val PcaNComponents = 50
  val ScoreThreshold = 1.0
  val SampleItemNodes = 10
  val MinItemNodes = 5
  val Node2vecRatio = 10.0
  val TextLengthDiscount = 0.1
  val MaxTextLength = 2048.0
  val MaxItemCount = 10
  val MinItemNodesRatio = 0.5
  val MaxFeatureCount = 10
  val MaxResultCount = 10
  val EmbedWalkLength = 8

  /** Node feature matrix: pruned one-hots ++ node2vec-neighborhood sums
    * (plain_list.py:136-200).
    */
  def buildFeatureMatrix(g: PageGraph): Array[Array[Double]] = {
    val n = g.n
    // pruned columns: page-wide count > 1 (plain_list.py:136-141, P5)
    val prunedCols = (0 until g.featureNames.length).filter(g.featureCounts(_) > 1).toArray
    val colMap = new Array[Int](g.featureNames.length)
    java.util.Arrays.fill(colMap, -1)
    prunedCols.zipWithIndex.foreach { case (old, nw) => colMap(old) = nw }
    val d = prunedCols.length
    if (d == 0 || n == 0) return Array.fill(n)(Array.empty[Double])

    // The page's full matrix x = concat(x1, x2 * ratio) is built in ONE
    // n×2d buffer: x1 (L1-normalized own features) occupies cols [0,d) and
    // the walk accumulates x2 directly into cols [d,2d). The per-node raw
    // count row is never materialized — every node's features are 1.0 at
    // its pruned columns (nodeFeatureNames is per-node distinct), so the
    // walk reads them sparsely via g.rows/colMap. Values are bit-identical
    // to the former base/x2/x chain (same additions per slot in the same
    // order); the two intermediate n×d matrices were the detect kernel's
    // largest allocation after the parser.
    val x = Array.ofDim[Double](n, 2 * d)

    // Node2vec neighborhood (plain_list.py:158-173): the reference samples ONE
    // unseeded 8-step uniform walk per node over the child graph (p=q=1 =>
    // DeepWalk) and sums visited features; dgl pads dead ends with -1 and the
    // numpy gather maps -1 to the LAST node's row. That sampling is the main
    // nondeterminism of the whole detector (their own tests tolerate it —
    // SURVEY.md §7.5). We compute the EXPECTED visit distribution instead:
    // x2_i = sum_{t=0..8} (P^t)_i . F with P uniform over children and dead
    // ends absorbing into a PAD state carrying the last node's features (the
    // -1 quirk, preserved). Deterministic, and feature-isomorphic subtrees get
    // exactly identical vectors — the signal DBSCAN (eps=0.01) needs.
    // scratch probability vectors reused across all start nodes (index n =
    // the PAD absorbing state); zero-allocation inner loop
    val PAD = n
    val cur = new Array[Double](n + 1)
    val nxt = new Array[Double](n + 1)
    var curTouched = new scala.collection.mutable.ArrayBuffer[Int](64)
    var nxtTouched = new scala.collection.mutable.ArrayBuffer[Int](64)
    // sparse add of `p * features(node)` into acc cols [d,2d)
    def accAdd(acc: Array[Double], node: Int, p: Double): Unit = {
      val fs = g.rows(node)
      var k = 0
      while (k < fs.length) {
        val m = colMap(fs(k))
        if (m >= 0) acc(d + m) += p
        k += 1
      }
    }
    var i = 0
    while (i < n) {
      val acc = x(i)
      curTouched.clear()
      cur(i) = 1.0
      curTouched += i
      var step = 0
      while (step <= EmbedWalkLength) {
        var t = 0
        while (t < curTouched.length) {
          val node = curTouched(t)
          val p = cur(node)
          accAdd(acc, if (node == PAD) n - 1 else node, p)
          t += 1
        }
        if (step < EmbedWalkLength) {
          nxtTouched.clear()
          t = 0
          while (t < curTouched.length) {
            val node = curTouched(t)
            val p = cur(node)
            if (node == PAD || g.childrenIdx(node).isEmpty) {
              if (nxt(PAD) == 0.0) nxtTouched += PAD
              nxt(PAD) += p
            } else {
              val kids = g.childrenIdx(node)
              val pc = p / kids.length
              var k = 0
              while (k < kids.length) {
                val c = kids(k)
                if (nxt(c) == 0.0) nxtTouched += c
                nxt(c) += pc
                k += 1
              }
            }
            cur(node) = 0.0 // reset scratch as we go
            t += 1
          }
          // swap
          val tmpT = curTouched; curTouched = nxtTouched; nxtTouched = tmpT
          var s = 0
          while (s < curTouched.length) {
            val node = curTouched(s)
            val tmp = nxt(node); nxt(node) = 0.0; cur(node) = tmp
            s += 1
          }
        } else {
          // clear remaining scratch
          t = 0
          while (t < curTouched.length) { cur(curTouched(t)) = 0.0; t += 1 }
        }
        step += 1
      }
      i += 1
    }
    // finish each row in place: L1-normalize the x2 slice then apply the
    // ratio (divide-then-multiply, the former l1NormalizeRows + concat-scale
    // op order), and write x1 = L1-normalized one-hots (each pruned feature
    // contributes exactly 1.0, so the L1 norm is the pruned-feature count)
    i = 0
    while (i < n) {
      val row = x(i)
      var s = 0.0
      var j = d
      while (j < 2 * d) { s += math.abs(row(j)); j += 1 }
      if (s > 0) {
        j = d
        while (j < 2 * d) { row(j) = (row(j) / s) * Node2vecRatio; j += 1 }
      }
      val fs = g.rows(i)
      var k = 0
      var cnt = 0
      while (k < fs.length) { if (colMap(fs(k)) >= 0) cnt += 1; k += 1 }
      if (cnt > 0) {
        val v = 1.0 / cnt.toDouble
        k = 0
        while (k < fs.length) {
          val m = colMap(fs(k))
          if (m >= 0) row(m) = v
          k += 1
        }
      }
      i += 1
    }
    Numeric.l2NormalizeRows(x)

    if (x(0).length > PcaNComponents) Numeric.pcaProject(x, PcaNComponents) else x
  }

  final case class Candidate(listNodeId: Int, itemIdxs: Array[Int])

  /** entropy grouping + (label, parent) candidate enumeration
    * (plain_list.py:284-330).
    */
  def preFilter(g: PageGraph, labels: Array[Int]): Vector[Candidate] = {
    val n = g.n
    // per label: member node indices in order
    val byLabel = mutable.LinkedHashMap.empty[Int, mutable.ArrayBuffer[Int]]
    var i = 0
    while (i < n) {
      if (labels(i) != -1) byLabel.getOrElseUpdate(labels(i), mutable.ArrayBuffer.empty) += i
      i += 1
    }
    // entropy of parent-id histogram per label; order: entropy asc, label asc
    // (pandas groupby sorts labels, stable sort by entropy — plain_list.py:294-298)
    val ordered = byLabel.toVector
      .sortBy(_._1)
      .map { case (label, members) =>
        val counts = mutable.LinkedHashMap.empty[Int, Long]
        members.foreach { m =>
          val p = g.node(m).parentId
          counts.update(p, counts.getOrElse(p, 0L) + 1)
        }
        (label, members, Numeric.entropyOfCounts(counts.values))
      }
      .sortBy(_._3) // stable — ties stay in ascending-label order
    val out = Vector.newBuilder[Candidate]
    ordered.foreach { case (_, members, _) =>
      // parents in first-appearance order (plain_list.py:310)
      val seen = mutable.LinkedHashSet.empty[Int]
      members.foreach(m => seen += g.node(m).parentId)
      seen.foreach { parentId =>
        val itemIdxs = members.filter(m => g.node(m).parentId == parentId).toArray
        if (itemIdxs.length >= MinItemNodes)
          out += Candidate(parentId, itemIdxs)
      }
    }
    out.result()
  }

  final case class Scored(cand: Candidate, score: Double,
      richness: Double, complexity: Double, itemCount: Double)

  /** candidate scoring + threshold filter (plain_list.py:332-397, M7).
    * Deterministic sampling policy: the reference draws 10 item ids with
    * replacement from an unseeded RNG (plain_list.py:341); we take the first
    * 10 items in document order — same work cap, max over sub-scores, no
    * nondeterminism.
    */
  def scoreCandidates(g: PageGraph, cands: Vector[Candidate]): Vector[Scored] = {
    cands.flatMap { cand =>
      val ids = cand.itemIdxs
      val sampled = ids.take(SampleItemNodes)
      var richness = 0.0
      var complexity = 0.0
      sampled.foreach { idx =>
        val desc = g.descendantsIdx(idx)
        if (desc.nonEmpty) {
          var sum = 0L
          var nonZero = 0
          desc.foreach { c =>
            val tl = g.textLengths(c)
            if (tl > 0) { sum += tl; nonZero += 1 }
          }
          val r = Numeric.logPositive(math.min(sum.toDouble, MaxTextLength) * TextLengthDiscount)
          val cx = Numeric.logPositive(math.min(nonZero, MaxFeatureCount).toDouble)
          if (r > richness) richness = r
          if (cx > complexity) complexity = cx
        }
      }
      val itemCount = Numeric.logPositive(math.min(ids.length, MaxItemCount).toDouble)
      val score = richness + itemCount // complexity computed but excluded (plain_list.py:365-366)
      if (score < ScoreThreshold || richness == 0 || complexity == 0 || itemCount == 0) None
      else Some(Scored(cand, score, richness, complexity, itemCount))
    }
  }

  /** field-rule mining over sampled items (plain_list.py:202-258, A-4/P10).
    * Deterministic sampling policy: the reference draws 10 list children with
    * replacement and processes the first 5 with the item tag
    * (plain_list.py:214-219); we process the first 5 matching children in
    * document order.
    */
  def extractFields(g: PageGraph, listId: Int, itemIdxs: Array[Int]): Vector[FieldRule] = {
    val itemTag = g.node(itemIdxs(0)).tag
    val listChildren = g.childrenOfId(listId) // node ids
    val rules = mutable.LinkedHashMap.empty[(String, String, String), Int]
    if (listChildren.nonEmpty) {
      var processed = 0
      var di = 0
      while (di < listChildren.length && processed < MinItemNodes) {
        val cid = listChildren(di)
        if (g.doc(cid).tag == itemTag) {
          val childIdxs = g.descendantsOfId(cid)
          childIdxs.foreach { ci =>
            val nd = g.node(ci)
            val text = g.texts(ci)
            if (text != null && text.strip().nonEmpty) {
              val css = g.selectorPath(nd, Some(listId), numbered = false, noId = true)
              val k = (css, FieldTypeText, "")
              rules.update(k, rules.getOrElse(k, 0) + 1)
            }
            if (nd.tag == "a") {
              val href = nd.attr("href")
              if (href.exists(_.strip().nonEmpty)) {
                val css = g.selectorPath(nd, Some(listId), numbered = false, noId = true)
                val k = (css, FieldTypeLinkUrl, "href")
                rules.update(k, rules.getOrElse(k, 0) + 1)
              }
            }
            if (nd.tag == "img") {
              val src = nd.attr("src")
              if (src.exists(_.strip().nonEmpty)) {
                val css = g.selectorPath(nd, Some(listId), numbered = false, noId = true)
                val k = (css, FieldTypeImageUrl, "src")
                rules.update(k, rules.getOrElse(k, 0) + 1)
              }
            }
          }
          processed += 1
        }
        di += 1
      }
    }
    val out = Vector.newBuilder[FieldRule]
    rules.zipWithIndex.foreach { case (((css, tpe, attr), count), i) =>
      if (count.toDouble / MinItemNodes >= MinItemNodesRatio)
        out += FieldRule(s"Field_${tpe}_${i + 1}", css, tpe, attr)
    }
    out.result()
  }

  /** run extraction rules over the page (plain_list.py:260-279).
    * Hot path: field selectors are parsed ONCE and each item's descendant
    * scan is shared across all field rules (same matches as per-rule
    * soupsieve selects, document order preserved).
    */
  def extractData(doc: DomDocument, url: String, fullItemsSelector: String,
      fields: Seq[FieldRule]): Vector[ExtractedRow] = {
    val parsedFields = fields.map(f => (f, CssSelector.parse(f.selector)))
    CssSelector.selectAll(doc, fullItemsSelector).map { itemId =>
      val candidates = CssSelector.descendants(doc, itemId)
      val row = Map.newBuilder[String, String]
      parsedFields.foreach { case (f, sel) =>
        CssSelector.selectOneAmong(doc, sel, candidates).foreach { fid =>
          f.fieldType match {
            case FieldTypeText =>
              row += (f.name -> doc.subtreeText(fid).strip())
            case FieldTypeLinkUrl | FieldTypeImageUrl =>
              doc(fid).attr(f.attribute).foreach { v =>
                row += (f.name -> UrlOps.resolve(url, v))
              }
            case _ =>
          }
        }
      }
      ExtractedRow(row.result())
    }
  }

  /** Full detector: train → pre-filter → filter → extract → post-filter →
    * sort (plain_list.py:497-521).
    */
  def run(doc: DomDocument, g: PageGraph, url: String): Vector[ListResultOut] = {
    val x = buildFeatureMatrix(g)
    if (x.isEmpty || x(0).isEmpty) return Vector.empty
    val labels = Numeric.dbscan(x, DbscanEps, DbscanMinSamples)
    val cands = preFilter(g, labels)
    val scored = scoreCandidates(g, cands)

    val results = mutable.ArrayBuffer.empty[ListResultOut]
    var i = 0
    while (i < scored.length && i != MaxResultCount) {
      val s = scored(i)
      if (g.containsId(s.cand.listNodeId)) {
        val listNode = g.doc(s.cand.listNodeId)
        val listSelector = g.selectorPath(listNode)
        val itemsSelector = g.selectorRepr(g.node(s.cand.itemIdxs(0)), numbered = false, noId = true)
        val fullItems = s"$listSelector > $itemsSelector"
        val fields = extractFields(g, s.cand.listNodeId, s.cand.itemIdxs)
        if (fields.nonEmpty) {
          val data = extractData(doc, url, fullItems, fields)
          if (data.nonEmpty) {
            results += ListResultOut(
              name = "", // assigned after sort
              listSelector = listSelector,
              itemsSelector = itemsSelector,
              fullItemsSelector = fullItems,
              listNodeId = s.cand.listNodeId,
              score = s.score,
              scoreTextRichness = s.richness,
              scoreComplexity = s.complexity,
              scoreItemCount = s.itemCount,
              fields = fields,
              data = data)
          }
        }
      }
      i += 1
    }

    // post-extract filter replicating the reference's del-while-enumerate
    // skip quirk (plain_list.py:479-486)
    val buf = results
    var j = 0
    while (j < buf.length) {
      if (buf(j).data.length < MinItemNodes) buf.remove(j)
      j += 1
    }

    // stable sort by score desc + "List i" names (plain_list.py:488-495, W1)
    buf.toVector.sortBy(r => -r.score).zipWithIndex.map { case (r, k) =>
      r.copy(name = s"List ${k + 1}")
    }
  }
}
