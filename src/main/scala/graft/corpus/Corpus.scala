package graft.corpus

import graft.core.{Doc, Span, SpanKinds}
import org.apache.spark.sql.{Dataset, SparkSession}

import scala.collection.mutable.ArrayBuffer

/** Deterministic synthetic corpus (FIXTURES.md §5): no Random, no wall
  * clock — everything is a function of splitmix64(doc index). Docs are
  * assembled from the reference-fixture vocabulary (title/meta/anchors/
  * forms/collections), sized ~2-8 KB, split into 64-512 char spans with
  * ~5% interleaved media spans; every `megaEvery`-th doc is a mega-doc
  * (deep repetition of the collections block) to exercise skew handling.
  */
object Corpus {

  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** stateless n-th draw for a doc */
  private def rnd(docIdx: Long, n: Int): Long = splitmix64(docIdx * 1000003L + n)
  private def rndIn(docIdx: Long, n: Int, lo: Int, hi: Int): Int =
    lo + (Math.floorMod(rnd(docIdx, n), (hi - lo).toLong)).toInt

  def docId(i: Long): String = f"$i%012d"

  /** Build one document's HTML (deterministic in i). */
  def html(i: Long, megaEvery: Int = 1000): String = {
    val sb = new java.lang.StringBuilder(4096)
    val nItems = rndIn(i, 1, 2, 9)
    val mega = megaEvery > 0 && i % megaEvery == 0 && i > 0
    val collReps = if (mega) 4000 else rndIn(i, 2, 2, 12)
    sb.append("<html>\n<head>\n  <title>Doc ").append(docId(i)).append("</title>\n")
    sb.append("  <meta name=\"m1\" content=\"v").append(rnd(i, 3) & 0xffff).append(" content\">\n")
    sb.append("</head>\n<body>\n")
    sb.append("  <div name=\"match_test\">Alpha").append(rnd(i, 4) & 0xff)
      .append(" Beta").append(rnd(i, 5) & 0xff).append("</div>\n")
    sb.append("  <a class=\"top_link\" href=\"https://site.example/")
      .append(docId(i)).append("\" style=\"display:none\">Link").append(i).append("</a>\n")
    var k = 0
    while (k < nItems) {
      sb.append("  <div class=\"to_delete\">item ").append(i).append('_').append(k).append("</div>\n")
      k += 1
    }
    sb.append("  <div id=\"first\">\n    <form>\n")
    sb.append("      <input type=\"text\" name=\"text_key\" value=\"t").append(rnd(i, 6) & 0xffffff).append("\" />\n")
    sb.append("      <input type=\"checkbox\" name=\"cb\" value=\"1\"").append(if ((rnd(i, 7) & 1) == 0) " checked" else "").append(" />\n")
    sb.append("      <input type=\"checkbox\" name=\"cb\" value=\"2\"").append(if ((rnd(i, 8) & 1) == 0) " checked" else "").append(" />\n")
    sb.append("    </form>\n  </div>\n")
    sb.append("  <div id=\"collections\">\n")
    k = 0
    while (k < collReps) {
      sb.append("    <div class=\"coll1\">\n        <a href=\"link_").append(i).append('_').append(k)
        .append("\">Title ").append(i).append(' ').append(k).append("</a>\n    </div>\n")
      k += 1
    }
    sb.append("  </div>\n</body>\n</html>")
    sb.toString
  }

  /** Split a doc's HTML into spans (64-512 chars) with ~5% media spans. */
  def toSpans(i: Long, htmlStr: String, withMedia: Boolean = true): Seq[Span] = {
    val spans = new ArrayBuffer[Span]
    var pos = 0
    var n = 0
    var off = 0
    while (pos < htmlStr.length) {
      val len = math.min(rndIn(i, 100 + n, 64, 512), htmlStr.length - pos)
      spans += Span(SpanKinds.Html, htmlStr.substring(pos, pos + len), "", off)
      pos += len; off += 1; n += 1
      if (withMedia && pos < htmlStr.length && (rnd(i, 200 + n) & 31) < 2) { // ~6%
        spans += Span(SpanKinds.Media, "", s"media://${docId(i)}/$n", off)
        off += 1
      }
    }
    spans.toSeq
  }

  def makeDoc(i: Long, megaEvery: Int = 1000, withMedia: Boolean = true): Doc =
    Doc(docId(i), toSpans(i, html(i, megaEvery), withMedia))

  /** Distributed deterministic corpus: spark.range drives generation inside
    * the tasks (nothing is collected or shipped from the driver). */
  def generate(spark: SparkSession, n: Long, partitions: Int,
               megaEvery: Int = 1000, withMedia: Boolean = true): Dataset[Doc] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(i => makeDoc(i, megaEvery, withMedia))
  }

  /** The rules used for corpus processing: an extraction+mutation program
    * exercising every operator family (mirrors the reference fixture mix). */
  val corpusRules: String =
    """
    {
        "s": "body",
        "sub": [
            {
                "s": "div[name=\"match_test\"]",
                "edit": { "content": { "op": "match_replace", "match": "(\\S+) (\\S+)", "val": "$2 $1" } }
            },
            {
                "s": "a.top_link",
                "edit": {
                    "attrs": { "style": { "op": "delete" }, "id": { "op": "upsert", "val": "x" } },
                    "content": { "op": "upsert", "val": "New Link" }
                },
                "data": { "path": "top_link", "values": { "url": {"source": "Attribute", "name": "href"}, "name": {"source": "Contents"} } },
                "hide": true
            },
            {
                "s": ".to_delete",
                "data": { "path": "to_delete.", "values": { "contents": {"source": "Contents"} } },
                "delete": true
            },
            {
                "s": "#first form",
                "data": { "path": "formdata" },
                "sub": [
                    { "s": "input[name=\"text_key\"]", "data": { "values": { "text_key": {"source": "Value"} } } },
                    { "s": "input[name=\"cb\"][checked]", "data": { "values": { "cb": {"source": "Value"} } } }
                ]
            },
            {
                "s": ".coll1",
                "data": { "path": "coll1." },
                "sub": [
                    { "s": "a", "data": { "values": { "href": {"source": "Attribute", "name": "href"}, "name": {"source": "Contents"} } } }
                ]
            }
        ]
    }
    """

  val headRules: String =
    """
    {
        "s": "head",
        "sub": [
            { "s": "title", "edit": { "content": { "op": "upsert", "val": "New Title" } } },
            { "s": "meta", "edit": { "attrs": { "content": { "op": "match_replace", "match": "^(.*) content$", "val": "just $1" } } } }
        ]
    }
    """
}
