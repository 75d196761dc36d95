package graft.pipeline

import org.apache.spark.sql.DataFrame

import java.nio.charset.StandardCharsets.UTF_8

/** Web-archive ingestion operators: `.warc.gz` files (binary column) →
  * one row per WARC record, with the captured HTTP response parsed and
  * the body decoded under the sniffed charset. This is the step a
  * 100 TB crawl pipeline runs FIRST — everything downstream (extraction,
  * quality, dedup) consumes its output.
  *
  * Plan shape: one `mapPartitions` flatMap — scan-local explode, no
  * shuffle, no driver round-trip; a 1000-executor job distributes it by
  * input split exactly like the media decodes. Integrity discipline is
  * strict per file (WarcCodec.gunzipMembers verifies every member's
  * CRC32/ISIZE): a corrupt archive yields zero rows rather than
  * half-truths — the lineage side channel is where a production job
  * would count quarantined files.
  */
object WebArchive {

  final case class SitemapRow(
      doc_id: Long,
      entry_idx: Int,
      kind: String, // "url" (urlset entry) | "sitemap" (index entry)
      loc: String,
      lastmod: String,
      priority: Double)

  /** Sitemap XML (sitemaps.org protocol) → one row per entry: both
    * <urlset> and <sitemapindex> documents, loc/lastmod/priority
    * fields, character references in <loc> resolved (ampersands in
    * query strings are the norm). Tag-scan parser — no DTD/namespace
    * machinery, which the protocol doesn't use; malformed blocks are
    * skipped, never thrown. Scan-local explode like records(). */
  def sitemapEntries(xml: String): Vector[SitemapRow] = {
    val entries = Vector.newBuilder[SitemapRow]
    def field(block: String, tag: String): String = {
      val open = block.indexOf(s"<$tag>")
      val close = block.indexOf(s"</$tag>")
      if (open < 0 || close < open) ""
      else graft.functions.HtmlText.unescape(
        block.substring(open + tag.length + 2, close).trim)
    }
    def walk(container: String, kind: String): Unit = {
      var from = 0
      var idx = 0
      var open = xml.indexOf(s"<$container>", from)
      while (open >= 0) {
        val close = xml.indexOf(s"</$container>", open)
        if (close < 0) return
        val block = xml.substring(open, close)
        val loc = field(block, "loc")
        if (loc.nonEmpty) {
          val pr = field(block, "priority")
          entries += SitemapRow(0L, idx, kind, loc, field(block, "lastmod"),
            pr.toDoubleOption.getOrElse(0.5)) // 0.5 = the protocol default
          idx += 1
        }
        from = close + container.length + 3
        open = xml.indexOf(s"<$container>", from)
      }
    }
    if (xml.contains("<sitemapindex")) walk("sitemap", "sitemap")
    else walk("url", "url")
    entries.result()
  }

  /** (doc_id, xml) column pair → exploded sitemap entries. */
  def sitemaps(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select("doc_id", "xml").as[(Long, String)].mapPartitions { it =>
      it.flatMap { case (id, xml) =>
        sitemapEntries(xml).map(_.copy(doc_id = id))
      }
    }.toDF()
  }

  final case class WarcRecRow(
      doc_id: Long,
      warc_ref: String,
      rec_idx: Int,
      warc_type: String,
      target_uri: String,
      http_status: Int,
      mime: String,
      charset: String,
      charset_src: String,
      content_length: Long,
      body_text: String)

  /** `.warc.gz` binary column → one row per record. Expects columns
    * (doc_id, media_ref, content) — the same synth-table shape the
    * media operators use. Response records get the full HTTP parse +
    * charset-sniffed body decode; other record types (warcinfo,
    * request, metadata) carry their block as UTF-8 warc-fields text
    * with status 0. Records whose HTTP payload fails to parse are
    * dropped (block-level corruption), while a corrupt gzip member
    * quarantines the whole file (file-level corruption). */
  def records(warcs: DataFrame): DataFrame = {
    val spark = warcs.sparkSession
    import spark.implicits._
    warcs.select("doc_id", "media_ref", "content")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (docId, ref, content) =>
          WarcCodec.gunzipMembers(content) match {
            case None => Iterator.empty
            case Some(members) =>
              val recs = members.iterator
                .flatMap(m => WarcCodec.parseWarcRecords(m).getOrElse(Vector.empty))
                .toVector
              recs.iterator.zipWithIndex.flatMap { case (rec, idx) =>
                if (rec.warcType == "response")
                  for {
                    http <- WarcCodec.parseHttpResponse(rec.block)
                    // reverse chunked framing + gzip/deflate content
                    // coding BEFORE the charset sniff — the meta-tag
                    // prescan must see plaintext, not deflate bytes
                    body <- WarcCodec.httpEntityBody(http)
                  } yield {
                    val ct = http.header("Content-Type")
                    val sniff = WarcCodec.sniffCharset(ct, body)
                    val mime = ct.map(_.split(';')(0).trim.toLowerCase).getOrElse("")
                    WarcRecRow(docId, ref, idx, rec.warcType, rec.targetUri,
                      http.status, mime, sniff.charset, sniff.source,
                      rec.block.length.toLong,
                      WarcCodec.decodeText(body, sniff.charset))
                  }
                else
                  Some(WarcRecRow(docId, ref, idx, rec.warcType, rec.targetUri,
                    0, "", "", "", rec.block.length.toLong,
                    new String(rec.block, UTF_8)))
              }
          }
        }
      }.toDF()
  }
}
