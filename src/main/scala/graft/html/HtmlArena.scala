package graft.html

import scala.collection.mutable.ArrayBuffer

/** Flat, array-backed arena DOM (north-star requirement: node table with
  * parent/child int links, no object graph).
  *
  * Built by a single-pass HTML5-style tokenizer (states: data / tag-open /
  * tag-name / attrs quoted-unquoted-valueless / self-closing / comment /
  * doctype / bogus-comment / RAWTEXT-RCDATA) plus a minimal tree-builder
  * simulator for implied end tags. The reference delegates this to the
  * lol_html crate (Cargo.toml:15); we re-implement the subset its fixtures
  * exercise from the public HTML5 spec.
  *
  * Fidelity rules carried over from the reference's engine:
  *  - NO entity decoding anywhere (text and attribute values verbatim);
  *  - original bytes preserved exactly for untouched markup;
  *  - text of one DOM text node may be split into multiple TextChunk nodes
  *    (at media-marker boundaries), mirroring lol_html's chunked TextChunk
  *    with last_in_text_node (shadow_api.rs:610-688 buffers per selector);
  *  - elements closed implicitly (no end-tag token) never fire end-tag
  *    actions (lol_html end_tag_handlers only run on a real end tag).
  */
final class Arena {
  // node kinds
  final val nRoot = 0; final val nElem = 1; final val nText = 2
  final val nRaw = 3 /* comment/doctype/bogus/stray-end-tag passthrough */
  final val nMedia = 4

  var size = 0
  var kind: Array[Int] = new Array[Int](64)
  var parent: Array[Int] = new Array[Int](64)
  var firstChild: Array[Int] = new Array[Int](64)
  var lastChild: Array[Int] = new Array[Int](64)
  var nextSibling: Array[Int] = new Array[Int](64)
  /** element: lowercase tag; media: media_ref */
  val name = new ArrayBuffer[String](64)
  /** element: raw start tag; text/raw: raw source; media: span text */
  val raw = new ArrayBuffer[String](64)
  /** element: raw end tag or null */
  val rawEnd = new ArrayBuffer[String](64)
  var flags: Array[Int] = new Array[Int](64)
  final val fHasEndTag = 1
  final val fVoid = 2
  final val fLastInTextNode = 4
  /** element: slice [attrStart, attrEnd) into the attr table */
  var attrStart: Array[Int] = new Array[Int](64)
  var attrEnd: Array[Int] = new Array[Int](64)
  /** element raw-name (original case) and trailing raw (e.g. ">", " />") */
  val tagRawName = new ArrayBuffer[String](64)
  val tagTrailing = new ArrayBuffer[String](64)

  // attr table (columnar)
  var nAttrs = 0
  val attrPreRaw = new ArrayBuffer[String](64)  // whitespace before attr
  val attrRaw = new ArrayBuffer[String](64)     // full original name[=value] slice
  val attrNameRaw = new ArrayBuffer[String](64) // original-case name
  val attrName = new ArrayBuffer[String](64)    // lowercase name
  val attrValue = new ArrayBuffer[String](64)   // raw value, quotes stripped, NOT decoded
  var attrDup: Array[Boolean] = new Array[Boolean](64) // HTML5 duplicate -> logically ignored

  private def grow(): Unit = {
    val n = kind.length * 2
    kind = java.util.Arrays.copyOf(kind, n)
    parent = java.util.Arrays.copyOf(parent, n)
    firstChild = java.util.Arrays.copyOf(firstChild, n)
    lastChild = java.util.Arrays.copyOf(lastChild, n)
    nextSibling = java.util.Arrays.copyOf(nextSibling, n)
    flags = java.util.Arrays.copyOf(flags, n)
    attrStart = java.util.Arrays.copyOf(attrStart, n)
    attrEnd = java.util.Arrays.copyOf(attrEnd, n)
  }

  def newNode(k: Int): Int = {
    if (size == kind.length) grow()
    val id = size; size += 1
    kind(id) = k; parent(id) = -1; firstChild(id) = -1; lastChild(id) = -1
    nextSibling(id) = -1; flags(id) = 0; attrStart(id) = 0; attrEnd(id) = 0
    name += null; raw += null; rawEnd += null; tagRawName += null; tagTrailing += null
    id
  }

  def addAttr(preRaw: String, rawS: String, nameR: String, nameL: String, v: String): Int = {
    if (nAttrs == attrDup.length) attrDup = java.util.Arrays.copyOf(attrDup, nAttrs * 2)
    attrPreRaw += preRaw; attrRaw += rawS; attrNameRaw += nameR; attrName += nameL
    attrValue += v; attrDup(nAttrs) = false
    nAttrs += 1; nAttrs - 1
  }

  def appendChild(p: Int, c: Int): Unit = {
    parent(c) = p
    if (firstChild(p) == -1) firstChild(p) = c
    else nextSibling(lastChild(p)) = c
    lastChild(p) = c
  }

  /** First logical (non-duplicate) attr index with this lowercase name, or -1. */
  def findAttr(el: Int, nameLower: String): Int = {
    var i = attrStart(el)
    while (i < attrEnd(el)) {
      if (!attrDup(i) && attrName(i) == nameLower) return i
      i += 1
    }
    -1
  }

  def hasEndTag(id: Int): Boolean = (flags(id) & fHasEndTag) != 0
  def isVoid(id: Int): Boolean = (flags(id) & fVoid) != 0
  /** lol_html can_have_content: false for void elements. */
  def canHaveContent(id: Int): Boolean = kind(id) == nElem && !isVoid(id)
  def lastInTextNode(id: Int): Boolean = (flags(id) & fLastInTextNode) != 0
}

object HtmlParser {
  val voidElements: Set[String] = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr")

  /** RAWTEXT / RCDATA / script-data elements: content is pure text until the
    * matching case-insensitive end tag. */
  private val rawtextElements: Set[String] = Set(
    "script", "style", "textarea", "title", "xmp", "iframe", "noembed", "noframes")

  /** HTML5 implied-end-tag table: `open` auto-closes when `incoming` starts. */
  private val pClosers: Set[String] = Set(
    "address", "article", "aside", "blockquote", "details", "div", "dl",
    "fieldset", "figcaption", "figure", "footer", "form", "h1", "h2", "h3",
    "h4", "h5", "h6", "header", "hgroup", "hr", "main", "menu", "nav", "ol",
    "p", "pre", "section", "table", "ul")

  private def autoCloses(open: String, incoming: String): Boolean = open match {
    case "option"     => incoming == "option" || incoming == "optgroup"
    case "optgroup"   => incoming == "optgroup"
    case "li"         => incoming == "li"
    case "dt" | "dd"  => incoming == "dt" || incoming == "dd"
    case "p"          => pClosers.contains(incoming)
    case "td" | "th"  => incoming == "td" || incoming == "th" || incoming == "tr" ||
                         incoming == "tbody" || incoming == "thead" || incoming == "tfoot"
    case "tr"         => incoming == "tr" || incoming == "tbody" || incoming == "thead" ||
                         incoming == "tfoot"
    case _            => false
  }

  /** A media span interleaved in the doc stream at char position `pos` of the
    * concatenated non-media text. */
  final case class MediaMarker(pos: Int, mediaRef: String, text: String)

  private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  private def lower(s: String): String = {
    var i = 0; var needs = false
    while (i < s.length && !needs) { val c = s.charAt(i); if (c >= 'A' && c <= 'Z') needs = true; i += 1 }
    if (needs) s.toLowerCase(java.util.Locale.ROOT) else s
  }

  /** Parse the full document stream into an arena. `markers` must be sorted
    * by pos; markers falling inside a token are emitted right after it. */
  def parse(s: String, markers: Seq[MediaMarker] = Nil): Arena = {
    val a = new Arena
    val root = a.newNode(a.nRoot)
    // open-element stack
    var stack = new Array[Int](16); var stackTags = new Array[String](16); var sp = 0
    def push(id: Int, tag: String): Unit = {
      if (sp == stack.length) {
        stack = java.util.Arrays.copyOf(stack, sp * 2)
        stackTags = java.util.Arrays.copyOf(stackTags, sp * 2)
      }
      stack(sp) = id; stackTags(sp) = tag; sp += 1
    }
    def cur: Int = if (sp == 0) root else stack(sp - 1)

    val n = s.length
    var pos = 0
    var mIdx = 0
    // pending text run start (-1 = none); text runs are flushed as TextChunk
    // nodes, split at media markers within the run
    var textStart = -1

    def flushTextRun(endPos: Int): Unit = {
      if (textStart < 0) return
      // split run at any marker positions strictly inside (textStart, endPos]
      var st = textStart
      val parts = new ArrayBuffer[String]
      val partMarkers = new ArrayBuffer[Int]
      while (mIdx < markers.length && markers(mIdx).pos <= endPos) {
        val mp = math.max(markers(mIdx).pos, st)
        parts += s.substring(st, mp)
        partMarkers += mIdx
        st = mp
        mIdx += 1
      }
      parts += s.substring(st, endPos)
      partMarkers += -1
      // emit chunks; lastInTextNode on the final non-empty-possible chunk
      var i = 0
      while (i < parts.length) {
        val isLast = i == parts.length - 1
        if (parts(i).nonEmpty || isLast) {
          val t = a.newNode(a.nText)
          a.raw(t) = parts(i)
          if (isLast) a.flags(t) |= a.fLastInTextNode
          a.appendChild(cur, t)
        }
        if (partMarkers(i) >= 0) {
          val m = markers(partMarkers(i))
          val mn = a.newNode(a.nMedia)
          a.name(mn) = m.mediaRef; a.raw(mn) = m.text
          a.appendChild(cur, mn)
        }
        i += 1
      }
      textStart = -1
    }

    def emitMarkersBefore(tokenStart: Int): Unit = {
      while (mIdx < markers.length && markers(mIdx).pos <= tokenStart) {
        val m = markers(mIdx)
        val mn = a.newNode(a.nMedia)
        a.name(mn) = m.mediaRef; a.raw(mn) = m.text
        a.appendChild(cur, mn)
        mIdx += 1
      }
    }
    def emitMarkersAfterToken(tokenEnd: Int): Unit = emitMarkersBefore(tokenEnd)

    def rawNode(from: Int, to: Int): Unit = {
      val r = a.newNode(a.nRaw); a.raw(r) = s.substring(from, to); a.appendChild(cur, r)
    }

    def findGt(from: Int): Int = { val i = s.indexOf('>', from); if (i < 0) n - 1 else i }

    while (pos < n) {
      val c = s.charAt(pos)
      if (c == '<' && pos + 1 < n) {
        val c1 = s.charAt(pos + 1)
        if (isAsciiLetter(c1)) {
          // ---- start tag ----
          flushTextRun(pos); emitMarkersBefore(pos)
          var i = pos + 1
          while (i < n && { val ch = s.charAt(i); ch != '>' && ch != '/' && !isWs(ch) }) i += 1
          val nameRaw = s.substring(pos + 1, i)
          val tag = lower(nameRaw)
          // attrs
          val aStart = a.nAttrs
          var selfClosing = false
          var trailingStart = i
          var done = false
          var incomplete = false
          while (!done) {
            val wsStart = i
            while (i < n && isWs(s.charAt(i))) i += 1
            if (i >= n) { incomplete = true; done = true }
            else s.charAt(i) match {
              case '>' => trailingStart = wsStart; done = true
              case '/' =>
                if (i + 1 < n && s.charAt(i + 1) == '>') { selfClosing = true; trailingStart = wsStart; done = true }
                else if (i + 1 >= n) { incomplete = true; done = true }
                else i += 1 // stray solidus: ignore, continue attrs
              case _ =>
                // attr name
                val preRaw = s.substring(wsStart, i)
                val nStart = i
                while (i < n && { val ch = s.charAt(i); ch != '=' && ch != '>' && ch != '/' && !isWs(ch) }) i += 1
                if (i >= n) { incomplete = true; done = true }
                else {
                  val anRaw = s.substring(nStart, i)
                  // skip ws before '='
                  var j = i
                  while (j < n && isWs(s.charAt(j))) j += 1
                  var value = ""
                  if (j < n && s.charAt(j) == '=') {
                    j += 1
                    while (j < n && isWs(s.charAt(j))) j += 1
                    if (j < n) {
                      val q = s.charAt(j)
                      if (q == '"' || q == '\'') {
                        val vEnd = s.indexOf(q, j + 1)
                        if (vEnd < 0) { incomplete = true; done = true }
                        else { value = s.substring(j + 1, vEnd); i = vEnd + 1 }
                      } else {
                        var k = j
                        while (k < n && !isWs(s.charAt(k)) && s.charAt(k) != '>') k += 1
                        value = s.substring(j, k); i = k
                      }
                    } else { incomplete = true; done = true }
                  } else {
                    i = i // valueless; ws before '=' absent means i stays at name end
                  }
                  if (!incomplete) {
                    val idx = a.addAttr(preRaw, s.substring(nStart, i), anRaw, lower(anRaw), value)
                    // HTML5: later duplicates ignored (bytes still preserved)
                    var k = aStart
                    var dup = false
                    while (k < idx && !dup) { if (a.attrName(k) == a.attrName(idx)) dup = true; k += 1 }
                    if (dup) a.attrDup(idx) = true
                  }
                }
            }
          }
          if (incomplete) {
            // EOF inside tag: emit the rest verbatim as raw passthrough
            rawNode(pos, n); pos = n
          } else {
            val gt = s.indexOf('>', trailingStart)
            val tokEnd = gt + 1
            val el = a.newNode(a.nElem)
            a.name(el) = tag
            a.tagRawName(el) = nameRaw
            a.tagTrailing(el) = s.substring(trailingStart, tokEnd)
            a.raw(el) = s.substring(pos, tokEnd)
            a.attrStart(el) = aStart; a.attrEnd(el) = a.nAttrs
            // implied end tags
            while (sp > 0 && autoCloses(stackTags(sp - 1), tag)) sp -= 1
            a.appendChild(cur, el)
            val void = voidElements.contains(tag)
            if (void) a.flags(el) |= a.fVoid
            pos = tokEnd
            if (!void && !rawtextElements.contains(tag)) {
              push(el, tag)
            } else if (rawtextElements.contains(tag)) {
              // RAWTEXT/RCDATA: scan for matching end tag
              val endIdx = findRawtextEnd(s, pos, tag)
              if (endIdx < 0) {
                if (pos < n) {
                  val t = a.newNode(a.nText); a.raw(t) = s.substring(pos, n)
                  a.flags(t) |= a.fLastInTextNode; a.appendChild(el, t)
                }
                pos = n
              } else {
                if (endIdx > pos) {
                  val t = a.newNode(a.nText); a.raw(t) = s.substring(pos, endIdx)
                  a.flags(t) |= a.fLastInTextNode; a.appendChild(el, t)
                }
                val gt2 = findGt(endIdx)
                a.flags(el) |= a.fHasEndTag
                a.rawEnd(el) = s.substring(endIdx, gt2 + 1)
                pos = gt2 + 1
              }
            }
            emitMarkersAfterToken(pos)
          }
        } else if (c1 == '/') {
          if (pos + 2 < n && isAsciiLetter(s.charAt(pos + 2))) {
            // ---- end tag ----
            flushTextRun(pos); emitMarkersBefore(pos)
            val gt = s.indexOf('>', pos + 2)
            if (gt < 0) { rawNode(pos, n); pos = n }
            else {
              var i = pos + 2
              while (i < gt && { val ch = s.charAt(i); ch != '/' && !isWs(ch) }) i += 1
              val tag = lower(s.substring(pos + 2, i))
              val rawT = s.substring(pos, gt + 1)
              // find match in open stack
              var k = sp - 1
              while (k >= 0 && stackTags(k) != tag) k -= 1
              if (k >= 0) {
                val el = stack(k)
                a.flags(el) |= a.fHasEndTag
                a.rawEnd(el) = rawT
                sp = k // elements above popped implicitly (no end tag recorded)
              } else {
                // stray end tag: bytes pass through
                val r = a.newNode(a.nRaw); a.raw(r) = rawT; a.appendChild(cur, r)
              }
              pos = gt + 1
              emitMarkersAfterToken(pos)
            }
          } else {
            // "</" + non-letter: bogus comment per HTML5
            flushTextRun(pos); emitMarkersBefore(pos)
            val gt = s.indexOf('>', pos)
            val end = if (gt < 0) n else gt + 1
            rawNode(pos, end); pos = end; emitMarkersAfterToken(pos)
          }
        } else if (c1 == '!') {
          flushTextRun(pos); emitMarkersBefore(pos)
          if (s.regionMatches(pos + 2, "--", 0, 2)) {
            val close = s.indexOf("-->", pos + 4)
            val end = if (close < 0) n else close + 3
            rawNode(pos, end); pos = end
          } else if (s.regionMatches(true, pos + 2, "doctype", 0, 7)) {
            val gt = s.indexOf('>', pos)
            val end = if (gt < 0) n else gt + 1
            rawNode(pos, end); pos = end
          } else {
            val gt = s.indexOf('>', pos)
            val end = if (gt < 0) n else gt + 1
            rawNode(pos, end); pos = end
          }
          emitMarkersAfterToken(pos)
        } else if (c1 == '?') {
          flushTextRun(pos); emitMarkersBefore(pos)
          val gt = s.indexOf('>', pos)
          val end = if (gt < 0) n else gt + 1
          rawNode(pos, end); pos = end; emitMarkersAfterToken(pos)
        } else {
          if (textStart < 0) textStart = pos
          pos += 1
        }
      } else {
        if (textStart < 0) textStart = pos
        pos += 1
      }
    }
    flushTextRun(n)
    emitMarkersBefore(n)
    a
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** Find the index of "</tag" (case-insensitive, followed by ws / '/' / '>')
    * at or after `from`, or -1. */
  private def findRawtextEnd(s: String, from: Int, tag: String): Int = {
    var i = from
    val n = s.length
    while (true) {
      i = s.indexOf("</", i)
      if (i < 0) return -1
      if (s.regionMatches(true, i + 2, tag, 0, tag.length)) {
        val after = i + 2 + tag.length
        if (after >= n || isWs(s.charAt(after)) || s.charAt(after) == '>' || s.charAt(after) == '/')
          return i
      }
      i += 2
    }
    -1
  }
}
