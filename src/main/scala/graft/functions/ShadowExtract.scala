package graft.functions

import graft.core.{Doc, Span, SpanKinds}
import graft.engine.{RuleCompiler, ShadowEngine}
import graft.rules.RuleParser
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable.ArrayBuffer

/** SQL surface for the extraction engine (SURVEY.md §4.3):
  * `shadow_extract(spans, rules_json)` over the canonical
  * `array<struct<kind,text,media_ref,offset>>` column, returning
  * `struct<html, data_json, errors>`. The rules argument must be foldable
  * (a literal): the program is compiled once per task, exactly like the
  * broadcast program on the `mapPartitions` path — reference analog:
  * ShadowApiInit::init compiles once, then streams documents
  * (shadow_api.rs:70-98).
  *
  * Not codegen'd (CodegenFallback): the engine call dominates by orders of
  * magnitude, so the per-row boxing of a generated wrapper is noise; the
  * high-throughput path remains ShadowSpark.processColumnar.
  */
case class ShadowExtractExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ShadowExtractExpr.outType
  override def prettyName: String = "shadow_extract"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!right.foldable)
      TypeCheckResult.TypeCheckFailure("shadow_extract: rules_json must be a literal")
    else if (!right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure("shadow_extract: rules_json must be a string")
    else left.dataType match {
      case ArrayType(_: StructType, _) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "shadow_extract: spans must be array<struct<kind,text,media_ref,offset>>")
    }
  }

  @transient private lazy val engine: ShadowEngine = {
    val errs = new ArrayBuffer[String]
    val rules = right.eval(null).asInstanceOf[UTF8String].toString
    val p = RuleCompiler.compile(Seq(RuleParser.parseStr(rules, errs)))
    new ShadowEngine(p.copy(compileErrors = errs.toVector ++ p.compileErrors))
  }

  override def nullSafeEval(spansVal: Any, rulesVal: Any): Any = {
    val arr = spansVal.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val spans = new ArrayBuffer[Span](n)
    var i = 0
    while (i < n) {
      val st = arr.getStruct(i, 4)
      spans += Span(st.getUTF8String(0).toString, st.getUTF8String(1).toString,
        st.getUTF8String(2).toString, st.getInt(3))
      i += 1
    }
    val out = engine.process(Doc("", spans.toSeq))
    val html = new java.lang.StringBuilder
    out.spans.foreach(s => if (s.kind == SpanKinds.Html || s.kind == SpanKinds.Data) html.append(s.text))
    InternalRow(
      UTF8String.fromString(html.toString),
      UTF8String.fromString(out.data_json),
      new GenericArrayData(out.errors.map(UTF8String.fromString).toArray[Any]))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ShadowExtractExpr =
    copy(left = l, right = r)
}

object ShadowExtractExpr {
  val outType: StructType = StructType(Seq(
    StructField("html", StringType, nullable = false),
    StructField("data_json", StringType, nullable = false),
    StructField("errors", ArrayType(StringType, containsNull = false), nullable = false)))
}
