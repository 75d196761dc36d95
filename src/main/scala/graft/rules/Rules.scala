package graft.rules

/** Rule-tree ADT mirroring the reference's ShadowJson
  * (/root/reference/src/shadow_api/shadow_json.rs:36-67 and
  * shadow_json_schema.json). Field/attr maps must preserve JSON insertion
  * order (reference uses indexmap::IndexMap) — we use Vector[(K,V)] pairs
  * (order-preserving AND java-serializable, which VectorMap is not — the
  * rule program is broadcast to executors).
  */
sealed trait ValueSource
object ValueSource {
  /** Current node's (post-edit) text contents. */
  case object Contents extends ValueSource
  /** Current node's named attribute (post-edit). */
  final case class Attribute(name: String) extends ValueSource
  /** Form-value shortcut (input/option tag dispatch,
    * reference shadow_api.rs:477-544). */
  case object Value extends ValueSource
}

/** One edit op: op in {delete, upsert, match_replace}
  * (reference shadow_json.rs:60-65). */
final case class EditOp(op: String, value: Option[String], matchPat: Option[String])

final case class Edit(
    attrs: Vector[(String, EditOp)],
    content: Option[EditOp])

final case class DataDef(
    path: Option[String],
    values: Option[Vector[(String, ValueSource)]])

final case class RuleNode(
    s: String,
    hide: Boolean,
    delete: Boolean,
    edit: Option[Edit],
    data: Option[DataDef],
    append: Vector[String],
    prepend: Vector[String],
    insertBefore: Vector[String],
    insertAfter: Vector[String],
    sub: Vector[RuleNode]) {

  /** Pre-compile string-templating hook, mirroring
    * ShadowJson::transform_strings (reference shadow_json.rs:87-132):
    * applies f to the selector, edit attr `val`s, edit content `val`,
    * the four injection arrays, and recursively to `sub`. It does NOT
    * touch `match` patterns, data paths, or data value keys.
    */
  def transformStrings(f: String => String): RuleNode = {
    def eo(e: EditOp): EditOp = e.copy(value = e.value.map(f))
    RuleNode(
      s = f(s),
      hide = hide,
      delete = delete,
      edit = edit.map(e => Edit(
        attrs = e.attrs.map { case (k, v) => (k, eo(v)) },
        content = e.content.map(eo))),
      data = data,
      append = append.map(f),
      prepend = prepend.map(f),
      insertBefore = insertBefore.map(f),
      insertAfter = insertAfter.map(f),
      sub = sub.map(_.transformStrings(f)))
  }
}
