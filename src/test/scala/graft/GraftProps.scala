package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.dom.{DomNode, HtmlParser}
import graft.detect.{Highlight, Numeric}
import graft.urls.UrlOps

/** Property tests (SURVEY.md §5.2 item 3). */
object GraftProps extends Properties("graft") {

  // ---- generators ----

  private val tagGen = Gen.oneOf("div", "span", "p", "ul", "li", "a", "section", "em")
  private val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "x1", "y-2")
  private val classGen = Gen.oneOf("row", "col", "item", "quote", "tag", "box")

  private def htmlGen(depth: Int): Gen[String] =
    if (depth <= 0) wordGen
    else Gen.frequency(
      3 -> wordGen,
      2 -> (for {
        tag <- tagGen
        cls <- Gen.option(Gen.listOfN(2, classGen).map(_.distinct.mkString(" ")))
        id <- Gen.option(Gen.identifier.map(_.take(6)))
        n <- Gen.choose(0, 3)
        kids <- Gen.listOfN(n, htmlGen(depth - 1))
      } yield {
        val attrs = cls.map(c => s""" class="$c"""").getOrElse("") +
          id.map(i => s""" id="a$i"""").getOrElse("")
        s"<$tag$attrs>${kids.mkString(" ")}</$tag>"
      }))

  private val pageGen: Gen[String] =
    Gen.listOfN(4, htmlGen(4)).map(b => s"<html><body>${b.mkString}</body></html>")

  // ---- parser round-trip: parse -> serialize -> parse is a fixpoint ----

  private def shape(nodes: Array[DomNode]): Seq[(Int, Int, String, Vector[(String, String)], Vector[String])] =
    nodes.map(n => (n.id, n.parentId, n.tag, n.attrs, n.directTexts)).toSeq

  property("parse/serialize/parse fixpoint") = forAll(pageGen) { html =>
    val d1 = HtmlParser.parse(html)
    val ser = Highlight.serialize(d1)
    val d2 = HtmlParser.parse(ser)
    shape(d1.nodes) == shape(d2.nodes)
  }

  // Hostile inputs: arbitrary tag soup (stray '<', unterminated tags,
  // entities, quotes, rawtext elements). Comments/PIs are excluded by
  // construction — serialization intentionally drops them, which merges the
  // text nodes they separated, so the fixpoint can't hold across them.
  private val hostileGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.oneOf("<", ">", "/", "&", ";", "=", "\"", "'", " ", "#"),
      1 -> Gen.oneOf("<div", "</div>", "<span class=\"a b\"", "&amp;", "&#60;",
        "<br/>", "<li>", "<p>", "</p>", "<script>", "</script>", "<title>",
        "<a href=x>", "<a href>", "<img src='u'>")
    )).map(_.mkString)

  property("parse/serialize/parse fixpoint (hostile tag soup)") =
    forAll(hostileGen) { s =>
      val d1 = HtmlParser.parse(s)
      val d2 = HtmlParser.parse(Highlight.serialize(d1))
      shape(d1.nodes) == shape(d2.nodes)
    }

  // ---- url canonicalization ----

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTP")
    host <- Gen.oneOf("a.example", "B.Example", "x.y.example")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    path <- Gen.oneOf("", "/", "/a/b", "/a/../c", "/a/./b/")
    query <- Gen.oneOf("", "?b=2&a=1", "?z")
    frag <- Gen.oneOf("", "#f")
  } yield s"$scheme://$host$port$path$query$frag"

  property("canonicalize idempotent") = forAll(urlGen) { u =>
    val c = UrlOps.canonicalize(u)
    UrlOps.canonicalize(c) == c
  }

  property("urlHash64 invariant under canonicalization") = forAll(urlGen) { u =>
    UrlOps.urlHash64(u) == UrlOps.urlHash64(UrlOps.canonicalize(u))
  }

  property("resolve with absolute ref returns the ref (normalized)") =
    forAll(urlGen, urlGen) { (base, ref) =>
      val r = UrlOps.resolve(base, ref)
      UrlOps.parse(r).netloc == UrlOps.parse(ref).netloc
    }

  // ---- weighted-dedup DBSCAN == naive DBSCAN ----

  private val matrixGen: Gen[Array[Array[Double]]] = for {
    n <- Gen.choose(0, 40)
    nClusters <- Gen.choose(1, 4)
    // rows drawn from a few distinct prototype vectors (exact duplicates,
    // like repeated list items) plus noise rows
    protos <- Gen.listOfN(nClusters, Gen.listOfN(3, Gen.choose(-1.0, 1.0)).map(_.toArray))
    rows <- Gen.listOfN(n, Gen.frequency(
      3 -> Gen.choose(0, nClusters - 1).map(protos(_)),
      1 -> Gen.listOfN(3, Gen.choose(-1.0, 1.0)).map(_.toArray)))
  } yield rows.toArray

  /** direct transliteration of the sklearn scan — no dedup. */
  private def naiveDbscan(x: Array[Array[Double]], eps: Double, minSamples: Int): Array[Int] = {
    val n = x.length
    val labels = Array.fill(n)(-1)
    val eps2 = eps * eps
    def neigh(i: Int): Seq[Int] = (0 until n).filter { j =>
      var d2 = 0.0
      var k = 0
      while (k < x(i).length) { val d = x(i)(k) - x(j)(k); d2 += d * d; k += 1 }
      d2 <= eps2
    }
    val core = Array.tabulate(n)(i => neigh(i).size >= minSamples)
    var cluster = 0
    for (i <- 0 until n if labels(i) == -1 && core(i)) {
      labels(i) = cluster
      val stack = scala.collection.mutable.ArrayDeque[Int](neigh(i): _*)
      while (stack.nonEmpty) {
        val q = stack.removeLast()
        if (labels(q) == -1) {
          labels(q) = cluster
          if (core(q)) neigh(q).foreach(stack.append)
        }
      }
      cluster += 1
    }
    labels
  }

  property("dedup DBSCAN cluster PARTITION equals naive") = forAll(matrixGen) { x =>
    val a = Numeric.dbscan(x, eps = 0.15, minSamples = 3)
    val b = naiveDbscan(x, eps = 0.15, minSamples = 3)
    // labels must induce the same partition incl. noise assignment
    val sameNoise = a.zip(b).forall { case (l1, l2) => (l1 == -1) == (l2 == -1) }
    val mapAB = scala.collection.mutable.Map.empty[Int, Int]
    val consistent = a.indices.forall { i =>
      if (a(i) == -1) true
      else mapAB.getOrElseUpdate(a(i), b(i)) == b(i)
    }
    Prop(sameNoise && consistent &&
      a.toSet.filter(_ >= 0).size == b.toSet.filter(_ >= 0).size)
  }

  // ---- cuckoo never lies about inserted keys ----

  property("sigmoid symmetry + range (F4)") =
    forAll(Gen.choose(-50.0, 50.0)) { x =>
      val s = Numeric.sigmoid(x)
      s >= 0.0 && s <= 1.0 &&
        math.abs(Numeric.sigmoid(-x) - (1.0 - s)) < 1e-12 &&
        Numeric.sigmoid(0.0) == 0.5
    }

  property("cuckoo membership sound") = forAll(Gen.listOf(Gen.long)) { keys =>
    val f = graft.frontier.CuckooFilter.create(math.max(16, keys.size))
    keys.foreach(f.add)
    keys.forall(f.contains)
  }
}
