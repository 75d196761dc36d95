package graft.core

/** Input/output data model per BASELINE.json `input_hint`.
  *
  * A document is one row: its byte stream is the concatenation of the
  * non-media spans' `text` in `offset` order (reference processes one
  * document as a chunked byte stream, /root/reference/src/shadow_api.rs:822-900).
  * `media` spans are opaque pass-through payloads identified by `media_ref`.
  */
case class Span(kind: String, text: String, media_ref: String, offset: Int)

case class Doc(doc_id: String, spans: Seq[Span])

/** Engine output row: rewritten spans + insertion-ordered extraction JSON +
  * accumulated (never-aborting) error channel
  * (reference: /root/reference/src/shadow_api.rs:132 errors vec).
  */
case class DocOut(
    doc_id: String,
    spans: Seq[Span],
    data_json: String,
    errors: Seq[String])

object SpanKinds {
  val Html  = "html"
  val Text  = "text"
  val Media = "media"
  /** Output-only: the JSON payload injected before </body>
    * (reference: shadow_api.rs:690-712 data_content_handler). */
  val Data  = "data"
}
