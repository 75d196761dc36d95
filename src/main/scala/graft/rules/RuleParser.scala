package graft.rules

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Rule-JSON parser mirroring ShadowJson::parse_str
  * (/root/reference/src/shadow_api/shadow_json.rs:70-84), including the
  * whitespace-preprocessing quirk: ALL newlines removed, then one
  * left-to-right pass collapsing "  " -> " " — this is observable in rule
  * `val` strings that contain newlines or runs of spaces.
  *
  * Uses Jackson (ships with Spark). ObjectNode preserves field insertion
  * order, which we carry into ordered Vector pairs (the reference uses IndexMap).
  * On parse failure: pushes "Invalid json : <path-aware msg>" and returns
  * the default (empty) rule, exactly like the reference.
  */
object RuleParser {
  private val mapper = new ObjectMapper()

  val emptyRule: RuleNode =
    RuleNode("", hide = false, delete = false, None, None,
      Vector.empty, Vector.empty, Vector.empty, Vector.empty, Vector.empty)

  /** The reference's pre-parse whitespace strip (shadow_json.rs:72). */
  def preprocess(json: String): String =
    json.replace("\n", "").replace("  ", " ")

  def parseStr(json: String, errors: ArrayBuffer[String]): RuleNode = {
    val processed = preprocess(json)
    try {
      val node = mapper.readTree(processed)
      parseNode(node, "")
    } catch {
      case e: ParseError =>
        errors += s"Invalid json : ${e.getMessage}"
        emptyRule
      case e: Exception =>
        errors += s"Invalid json : ${e.getMessage}"
        emptyRule
    }
  }

  private final class ParseError(msg: String) extends RuntimeException(msg)
  private def fail(path: String, msg: String): Nothing =
    throw new ParseError(if (path.isEmpty) msg else s"$path: $msg")

  private def optText(n: JsonNode, field: String, path: String): Option[String] = {
    val v = n.get(field)
    if (v == null || v.isNull) None
    else if (v.isTextual) Some(v.asText())
    else fail(s"$path.$field", "expected a string")
  }

  private def optBool(n: JsonNode, field: String, path: String): Option[Boolean] = {
    val v = n.get(field)
    if (v == null || v.isNull) None
    else if (v.isBoolean) Some(v.asBoolean())
    else fail(s"$path.$field", "expected a boolean")
  }

  private def strArray(n: JsonNode, field: String, path: String): Vector[String] = {
    val v = n.get(field)
    if (v == null || v.isNull) Vector.empty
    else if (v.isArray)
      v.elements().asScala.map { e =>
        if (e.isTextual) e.asText() else fail(s"$path.$field", "expected string array")
      }.toVector
    else fail(s"$path.$field", "expected an array")
  }

  private def parseEditOp(n: JsonNode, path: String): EditOp = {
    if (!n.isObject) fail(path, "expected an object")
    val op = optText(n, "op", path).getOrElse(fail(s"$path.op", "missing field `op`"))
    EditOp(op, optText(n, "val", path), optText(n, "match", path))
  }

  private def parseNode(n: JsonNode, path: String): RuleNode = {
    if (n == null || !n.isObject) fail(path, "expected an object")

    val edit = Option(n.get("edit")).filterNot(_.isNull).map { e =>
      if (!e.isObject) fail(s"$path.edit", "expected an object")
      val attrs = Option(e.get("attrs")).filterNot(_.isNull).map { a =>
        if (!a.isObject) fail(s"$path.edit.attrs", "expected an object")
        a.fields().asScala.map { ent =>
          (ent.getKey, parseEditOp(ent.getValue, s"$path.edit.attrs.${ent.getKey}"))
        }.toVector
      }.getOrElse(Vector.empty[(String, EditOp)])
      val content = Option(e.get("content")).filterNot(_.isNull)
        .map(c => parseEditOp(c, s"$path.edit.content"))
      Edit(attrs, content)
    }

    val data = Option(n.get("data")).filterNot(_.isNull).map { d =>
      if (!d.isObject) fail(s"$path.data", "expected an object")
      val values = Option(d.get("values")).filterNot(_.isNull).map { v =>
        if (!v.isObject) fail(s"$path.data.values", "expected an object")
        v.fields().asScala.map { ent =>
          (ent.getKey, parseValueSource(ent.getValue, s"$path.data.values.${ent.getKey}"))
        }.toVector
      }
      DataDef(optText(d, "path", s"$path.data"), values)
    }

    val sub = Option(n.get("sub")).filterNot(_.isNull).map { s =>
      if (!s.isArray) fail(s"$path.sub", "expected an array")
      s.elements().asScala.zipWithIndex
        .map { case (e, i) => parseNode(e, s"$path.sub[$i]") }.toVector
    }.getOrElse(Vector.empty)

    RuleNode(
      s = optText(n, "s", path).getOrElse(""),
      hide = optBool(n, "hide", path).getOrElse(false),
      delete = optBool(n, "delete", path).getOrElse(false),
      edit = edit,
      data = data,
      append = strArray(n, "append", path),
      prepend = strArray(n, "prepend", path),
      insertBefore = strArray(n, "insert_before", path),
      insertAfter = strArray(n, "insert_after", path),
      sub = sub)
  }

  /** Adjacently-tagged enum {"source": ..., "name": ...}
    * (reference shadow_json.rs:8-15). */
  private def parseValueSource(n: JsonNode, path: String): ValueSource = {
    if (!n.isObject) fail(path, "expected an object")
    optText(n, "source", path) match {
      case Some("Contents")  => ValueSource.Contents
      case Some("Attribute") =>
        ValueSource.Attribute(optText(n, "name", path)
          .getOrElse(fail(s"$path.name", "Attribute source requires `name`")))
      case Some("Value")     => ValueSource.Value
      case Some(other)       => fail(s"$path.source", s"unknown variant `$other`")
      case None              => fail(s"$path.source", "missing field `source`")
    }
  }
}
