package graft

import graft.pipeline.WarcCodec
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

/** WarcCodec pairs a builder with a strict parser; these tests
  * cross-validate against the JDK's INDEPENDENT gzip codec in both
  * directions (same discipline as MediaSpec vs javax.imageio) and pin
  * the integrity rejections a crawl pipeline depends on. */
class WarcSpec extends AnyFunSuite {

  private def jdkGzip(payload: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(payload); g.close()
    bos.toByteArray
  }

  private def jdkGunzip(bytes: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    var n = in.read(buf)
    while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  // ---- gzip member codec vs the JDK, both directions ----

  test("gzip: our member decodes through the JDK's GZIPInputStream") {
    val payload = ("warc record payload " * 50).getBytes(UTF_8)
    assert(jdkGunzip(WarcCodec.gzipMember(payload)).sameElements(payload))
  }

  test("gzip: the JDK's output decodes through our member walk") {
    val payload = ("jdk written " * 80).getBytes(UTF_8)
    val members = WarcCodec.gunzipMembers(jdkGzip(payload))
    assert(members.exists(ms => ms.length == 1 && ms.head.sameElements(payload)))
  }

  test("gzip: concatenated members walk in order (incl. JDK-written ones)") {
    val a = "first record".getBytes(UTF_8)
    val b = ("second, bigger " * 100).getBytes(UTF_8)
    val c = "third".getBytes(UTF_8)
    val file = WarcCodec.gzipMember(a) ++ jdkGzip(b) ++
      WarcCodec.gzipMember(c, fname = Some("rec-3.warc"))
    val ms = WarcCodec.gunzipMembers(file).get
    assert(ms.length == 3)
    assert(ms(0).sameElements(a) && ms(1).sameElements(b) && ms(2).sameElements(c))
  }

  test("gzip: FEXTRA + FCOMMENT + FHCRC header fields are skipped") {
    // hand-assemble a header with FEXTRA(4)|FNAME(8)|FCOMMENT(16)|FHCRC(2)
    val payload = "flags everywhere".getBytes(UTF_8)
    val base = WarcCodec.gzipMember(payload)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x1f.toByte, 0x8b.toByte, 8, (4 | 8 | 16 | 2).toByte,
      0, 0, 0, 0, 0, 255.toByte), 0, 10)
    out.write(Array[Byte](3, 0, 'x', 'y', 'z')) // FEXTRA: xlen=3
    out.write("name.warc".getBytes(ISO_8859_1)); out.write(0) // FNAME
    out.write("a comment".getBytes(ISO_8859_1)); out.write(0) // FCOMMENT
    out.write(Array[Byte](0x12, 0x34)) // FHCRC (value not verified)
    out.write(base, 10, base.length - 10) // deflate body + trailer
    val ms = WarcCodec.gunzipMembers(out.toByteArray)
    assert(ms.exists(_.head.sameElements(payload)))
  }

  test("gzip: forged CRC32, forged ISIZE, truncation, garbage all reject") {
    val good = WarcCodec.gzipMember("integrity matters".getBytes(UTF_8))
    val badCrc = good.clone(); badCrc(badCrc.length - 5) = (badCrc(badCrc.length - 5) ^ 0x01).toByte
    assert(WarcCodec.gunzipMembers(badCrc).isEmpty)
    val badIsize = good.clone(); badIsize(badIsize.length - 1) = (badIsize(badIsize.length - 1) ^ 0x01).toByte
    assert(WarcCodec.gunzipMembers(badIsize).isEmpty)
    assert(WarcCodec.gunzipMembers(good.dropRight(3)).isEmpty)
    assert(WarcCodec.gunzipMembers(good ++ Array[Byte](1, 2, 3)).isEmpty)
    assert(WarcCodec.gunzipMembers("not gzip at all".getBytes(UTF_8)).isEmpty)
  }

  test("gzip: decompressed-size cap rejects a bomb without inflating it all") {
    val bomb = WarcCodec.gzipMember(new Array[Byte](1 << 20)) // 1 MiB of zeros
    assert(WarcCodec.gunzipMembers(bomb, maxTotal = 1 << 16).isEmpty)
    assert(WarcCodec.gunzipMembers(bomb, maxTotal = 1 << 21).nonEmpty)
  }

  // ---- WARC record codec ----

  test("WARC: record round-trips; headers are case-insensitive; block exact") {
    val block = "block with\r\n\r\ninternal terminator bytes".getBytes(UTF_8)
    val rec = WarcCodec.buildWarcRecord("response",
      Seq("WARC-Target-URI" -> "http://example.com/x", "WARC-Date" -> "2026-01-01T00:00:00Z"),
      block)
    val parsed = WarcCodec.parseWarcRecords(rec).get
    assert(parsed.length == 1)
    assert(parsed.head.warcType == "response")
    assert(parsed.head.header("warc-target-uri").contains("http://example.com/x"))
    assert(parsed.head.block.sameElements(block))
  }

  test("WARC: multiple records in one buffer walk in order; strict on damage") {
    val r1 = WarcCodec.buildWarcRecord("warcinfo", Seq(), "software: graft\r\n".getBytes(UTF_8))
    val r2 = WarcCodec.buildWarcRecord("response", Seq("WARC-Target-URI" -> "http://e.com/"),
      "HTTP/1.1 200 OK\r\n\r\nhi".getBytes(UTF_8))
    val both = r1 ++ r2
    val parsed = WarcCodec.parseWarcRecords(both).get
    assert(parsed.map(_.warcType) == Vector("warcinfo", "response"))
    // Content-Length over-running the buffer must reject, not mis-slice
    val damaged = both.dropRight(5)
    assert(WarcCodec.parseWarcRecords(damaged).isEmpty)
    assert(WarcCodec.parseWarcRecords("WARC/2.9\r\n\r\n\r\n\r\n".getBytes(UTF_8)).isEmpty)
  }

  // ---- HTTP response codec ----

  test("HTTP: response round-trips; Content-Length truncates trailing padding") {
    val body = "body bytes é".getBytes(UTF_8)
    val resp = WarcCodec.buildHttpResponse(404,
      Seq("Content-Type" -> "text/plain", "Content-Length" -> body.length.toString), body)
    val p = WarcCodec.parseHttpResponse(resp ++ "PADDING".getBytes(UTF_8)).get
    assert(p.status == 404 && p.reason == "Not Found")
    assert(p.header("content-type").contains("text/plain"))
    assert(p.body.sameElements(body))
    assert(WarcCodec.parseHttpResponse("not http".getBytes(UTF_8)).isEmpty)
  }

  // ---- transfer / content codings ----

  test("chunked: round-trip, extensions + trailers tolerated, damage rejected") {
    val body = ("chunk me " * 40).getBytes(UTF_8)
    val wire = WarcCodec.buildChunked(body, 17)
    assert(WarcCodec.decodeChunked(wire).get.sameElements(body))
    // chunk extension after ';' and a trailer field
    val fancy = ("5;ext=1\r\nhello\r\n0\r\nX-Trailer: v\r\n\r\n").getBytes(UTF_8)
    assert(WarcCodec.decodeChunked(fancy).get.sameElements("hello".getBytes(UTF_8)))
    assert(WarcCodec.decodeChunked("zz\r\nhello\r\n0\r\n\r\n".getBytes(UTF_8)).isEmpty)
    assert(WarcCodec.decodeChunked("ff\r\nshort\r\n0\r\n\r\n".getBytes(UTF_8)).isEmpty)
    assert(WarcCodec.decodeChunked(wire.dropRight(4)).isEmpty)
    assert(WarcCodec.decodeChunked("5\r\nhelloXX0\r\n\r\n".getBytes(UTF_8)).isEmpty)
  }

  test("deflate: zlib-wrapped and raw both inflate; garbage rejects") {
    val payload = ("deflate me " * 30).getBytes(UTF_8)
    assert(WarcCodec.inflateDeflate(WarcCodec.zlibDeflate(payload)).get.sameElements(payload))
    val raw = { // raw deflate (the interop quirk)
      val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(payload); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) { val n = d.deflate(buf); out.write(buf, 0, n) }
      d.end(); out.toByteArray
    }
    assert(WarcCodec.inflateDeflate(raw).get.sameElements(payload))
    assert(WarcCodec.inflateDeflate("not deflate data at all".getBytes(UTF_8)).isEmpty)
  }

  test("httpEntityBody: chunked + gzip stack reverses in wire order") {
    val plain = "the actual page".getBytes(UTF_8)
    val resp = WarcCodec.parseHttpResponse(WarcCodec.buildHttpResponse(200,
      Seq("Transfer-Encoding" -> "chunked", "Content-Encoding" -> "gzip"),
      WarcCodec.buildChunked(WarcCodec.gzipMember(plain), 9))).get
    assert(WarcCodec.httpEntityBody(resp).get.sameElements(plain))
    // unknown content coding -> None (drop, never mojibake)
    val bad = WarcCodec.parseHttpResponse(WarcCodec.buildHttpResponse(200,
      Seq("Content-Encoding" -> "br"), plain)).get
    assert(WarcCodec.httpEntityBody(bad).isEmpty)
    // identity passthrough
    val id = WarcCodec.parseHttpResponse(WarcCodec.buildHttpResponse(200,
      Seq("Content-Type" -> "text/plain"), plain)).get
    assert(WarcCodec.httpEntityBody(id).get.sameElements(plain))
  }

  // ---- charset sniff + decode ----

  test("charset: BOM > header > meta > default precedence") {
    val bomBody = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ "x".getBytes(UTF_8)
    assert(WarcCodec.sniffCharset(Some("text/html; charset=iso-8859-1"), bomBody) ==
      WarcCodec.CharsetSniff("utf-8", "bom"))
    assert(WarcCodec.sniffCharset(Some("text/html; charset=\"Windows-1252\""), "plain".getBytes(UTF_8)) ==
      WarcCodec.CharsetSniff("windows-1252", "header"))
    val meta = "<html><META HTTP-EQUIV='Content-Type' CONTENT='text/html; charset=ISO-8859-1'><body>".getBytes(UTF_8)
    assert(WarcCodec.sniffCharset(Some("text/html"), meta) ==
      WarcCodec.CharsetSniff("iso-8859-1", "meta"))
    val metaShort = "<!doctype html><meta charset=utf-8><p>".getBytes(UTF_8)
    assert(WarcCodec.sniffCharset(None, metaShort) == WarcCodec.CharsetSniff("utf-8", "meta"))
    assert(WarcCodec.sniffCharset(None, "nothing declared".getBytes(UTF_8)) ==
      WarcCodec.CharsetSniff("utf-8", "default"))
    // meta only counts inside the first 1024 bytes (prescan window)
    val late = (" " * 1100 + "<meta charset=iso-8859-1>").getBytes(UTF_8)
    assert(WarcCodec.sniffCharset(None, late).source == "default")
  }

  test("charset: windows-1252 C1 range decodes per the public table; latin-1 label uses it too") {
    val bytes = Array[Byte](0x80.toByte, 0x93.toByte, 0x94.toByte, 0x97.toByte, 0xe9.toByte)
    assert(WarcCodec.decodeText(bytes, "windows-1252") == "€“”—é")
    // WHATWG: the iso-8859-1 label resolves to the windows-1252 decoder
    assert(WarcCodec.decodeText(bytes, "iso-8859-1") == "€“”—é")
  }

  test("charset: BOMs are stripped; malformed bytes replace, never throw") {
    val bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ "après".getBytes(UTF_8)
    assert(WarcCodec.decodeText(bom, "utf-8") == "après")
    val utf16 = Array[Byte](0xff.toByte, 0xfe.toByte, 'h', 0, 'i', 0)
    assert(WarcCodec.decodeText(utf16, "utf-16le") == "hi")
    val broken = Array[Byte](0xc3.toByte) // dangling UTF-8 lead byte
    assert(WarcCodec.decodeText(broken, "utf-8") == "�")
    assert(WarcCodec.decodeText("ok".getBytes(UTF_8), "no-such-charset") == "ok")
  }

  // ---- end-to-end: warc.gz file through the full stack ----

  test("end-to-end: two-record warc.gz decodes to typed records") {
    val http = WarcCodec.buildHttpResponse(200,
      Seq("Content-Type" -> "text/html; charset=windows-1252"),
      Array[Byte](0x93.toByte) ++ "quoted".getBytes(UTF_8) ++ Array[Byte](0x94.toByte))
    val file = WarcCodec.buildWarcGz(Seq(
      WarcCodec.buildWarcRecord("warcinfo", Seq(), "software: graft\r\n".getBytes(UTF_8)),
      WarcCodec.buildWarcRecord("response",
        Seq("WARC-Target-URI" -> "http://example.com/1"), http)))
    val members = WarcCodec.gunzipMembers(file).get
    val recs = members.flatMap(m => WarcCodec.parseWarcRecords(m).get)
    assert(recs.map(_.warcType) == Vector("warcinfo", "response"))
    val resp = WarcCodec.parseHttpResponse(recs(1).block).get
    val sniff = WarcCodec.sniffCharset(resp.header("Content-Type"), resp.body)
    assert(sniff == WarcCodec.CharsetSniff("windows-1252", "header"))
    assert(WarcCodec.decodeText(resp.body, sniff.charset) == "“quoted”")
  }
}
