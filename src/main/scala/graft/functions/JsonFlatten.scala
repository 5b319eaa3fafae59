package graft.functions

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable.ArrayBuffer

/** `json_flatten(json)` — json-parser()'s NV-pair view of a JSON
  * document (`/root/reference/modules/json/json-parser.c:41-62`,
  * dot-notation flattening `modules/json/dot-notation.c`): nested
  * objects flatten to `a.b.c` keys, arrays index as `a[0]`, scalars
  * render as their string forms (string-first data model, SURVEY §1.3).
  *
  * Options mirror the reference:
  *  - `prefix`: prepended to every produced key (`json-parser.c:44`);
  *  - `extractPrefix`: a dot-path selecting the subtree to flatten
  *    (`json-parser.c:58` extract-prefix()).
  *
  * A single streaming Jackson pass per row (the parser Spark itself
  * ships), emitted via `addReferenceObj`-free static codegen — stays
  * inside whole-stage codegen like the builtin `from_json`.
  */
case class JsonFlatten(child: Expression, prefix: String = "",
    extractPrefix: String = "") extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "json_flatten"

  override protected def nullSafeEval(v: Any): Any =
    JsonFlatten.flatten(v.asInstanceOf[UTF8String], prefix, extractPrefix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("jfPrefix", prefix, "java.lang.String")
    val xp = ctx.addReferenceObj("jfXPrefix", extractPrefix, "java.lang.String")
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = graft.functions.JsonFlatten.flatten($v, $p, $xp);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }

  override protected def withNewChildInternal(c: Expression): JsonFlatten =
    copy(child = c)
}

object JsonFlatten {
  // json-c (the reference's parser) accepts single-quoted strings —
  // its own tests feed "{'foo': 'bar'}" (test_json_parser.c:84)
  private val factory: JsonFactory = {
    val f = new JsonFactory()
    f.enable(JsonParser.Feature.ALLOW_SINGLE_QUOTES)
    f
  }

  private val notationCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[JsonDotNotation.Elem]]()

  /** Null on malformed JSON (json-parser drops the message; callers
    * filter on isNull for drop-invalid semantics). extract-prefix goes
    * through the real dot-notation engine ([[JsonDotNotation]]) — an
    * extraction miss or non-object/array result also fails the parse. */
  def flatten(json: UTF8String, prefix: String, extractPrefix: String): ArrayBasedMapData = {
    if (extractPrefix.nonEmpty) return flattenExtracted(json, prefix, extractPrefix)
    val keys = new ArrayBuffer[Any]
    val vals = new ArrayBuffer[Any]
    try {
      val p = factory.createParser(json.toString)
      try {
        p.nextToken() match {
          case JsonToken.START_OBJECT =>
            walkObject(p, "", keys, vals, prefix, "")
          case _ => return null
        }
      } finally p.close()
    } catch { case _: Exception => return null }
    ArrayBasedMapData(keys.toArray, vals.toArray)
  }

  private def flattenExtracted(json: UTF8String, prefix: String,
      extractPrefix: String): ArrayBasedMapData = {
    val elems = notationCache.computeIfAbsent(extractPrefix, n =>
      JsonDotNotation.compile(n).getOrElse(
        throw new IllegalArgumentException(s"bad extract-prefix: $n")))
    try {
      val root = JsonDotNotation.parse(json.toString)
      val node = JsonDotNotation.eval(root, elems)
      if (node == null || !(node.isObject || node.isArray)) return null
      val keys = new ArrayBuffer[Any]
      val vals = new ArrayBuffer[Any]
      walkNode(node, "", keys, vals, prefix)
      ArrayBasedMapData(keys.toArray, vals.toArray)
    } catch { case _: Exception => null }
  }

  private def walkNode(node: com.fasterxml.jackson.databind.JsonNode,
      base: String, keys: ArrayBuffer[Any], vals: ArrayBuffer[Any],
      prefix: String): Unit = {
    def emitV(path: String, v: String): Unit = {
      keys += UTF8String.fromString(prefix + path)
      vals += UTF8String.fromString(v)
    }
    if (node.isObject) {
      val it = node.fields()
      while (it.hasNext) {
        val e = it.next()
        val path = if (base.isEmpty) e.getKey else base + "." + e.getKey
        walkNode(e.getValue, path, keys, vals, prefix)
      }
    } else if (node.isArray) {
      var i = 0
      while (i < node.size()) {
        walkNode(node.get(i), s"$base[$i]", keys, vals, prefix)
        i += 1
      }
    } else if (node.isNull) emitV(base, "")
    else if (node.isBoolean) emitV(base, if (node.asBoolean()) "true" else "false")
    else if (node.isFloatingPointNumber)
      emitV(base, String.format(java.util.Locale.ROOT, "%f",
        java.lang.Double.valueOf(node.asDouble())))
    else emitV(base, node.asText())
  }

  private def emit(path: String, value: String, keys: ArrayBuffer[Any],
      vals: ArrayBuffer[Any], prefix: String, extractPrefix: String): Unit = {
    val selected =
      if (extractPrefix.isEmpty) Some(path)
      else if (path == extractPrefix) Some(path.substring(path.lastIndexOf('.') + 1))
      else if (path.startsWith(extractPrefix + ".")) Some(path.substring(extractPrefix.length + 1))
      else None
    selected.foreach { k =>
      keys += UTF8String.fromString(prefix + k)
      vals += UTF8String.fromString(value)
    }
  }

  private def walkObject(p: JsonParser, base: String, keys: ArrayBuffer[Any],
      vals: ArrayBuffer[Any], prefix: String, extractPrefix: String): Unit = {
    while (p.nextToken() == JsonToken.FIELD_NAME) {
      val name = p.currentName()
      val path = if (base.isEmpty) name else base + "." + name
      walkValue(p, path, keys, vals, prefix, extractPrefix)
    }
  }

  private def walkArray(p: JsonParser, base: String, keys: ArrayBuffer[Any],
      vals: ArrayBuffer[Any], prefix: String, extractPrefix: String): Unit = {
    var i = 0
    while (p.nextToken() != JsonToken.END_ARRAY) {
      walkCurrent(p, s"$base[$i]", keys, vals, prefix, extractPrefix)
      i += 1
    }
  }

  private def walkValue(p: JsonParser, path: String, keys: ArrayBuffer[Any],
      vals: ArrayBuffer[Any], prefix: String, extractPrefix: String): Unit = {
    p.nextToken()
    walkCurrent(p, path, keys, vals, prefix, extractPrefix)
  }

  private def walkCurrent(p: JsonParser, path: String, keys: ArrayBuffer[Any],
      vals: ArrayBuffer[Any], prefix: String, extractPrefix: String): Unit =
    p.currentToken() match {
      case JsonToken.START_OBJECT =>
        walkObject(p, path, keys, vals, prefix, extractPrefix)
      case JsonToken.START_ARRAY =>
        walkArray(p, path, keys, vals, prefix, extractPrefix)
      case JsonToken.VALUE_NULL =>
        emit(path, "", keys, vals, prefix, extractPrefix)
      case JsonToken.VALUE_TRUE =>
        emit(path, "true", keys, vals, prefix, extractPrefix)
      case JsonToken.VALUE_FALSE =>
        emit(path, "false", keys, vals, prefix, extractPrefix)
      case JsonToken.VALUE_NUMBER_FLOAT =>
        // json-parser.c:105-108: doubles render with %f (6 decimals)
        emit(path, String.format(java.util.Locale.ROOT, "%f",
          java.lang.Double.valueOf(p.getDoubleValue)), keys, vals, prefix, extractPrefix)
      case _ =>
        emit(path, p.getText, keys, vals, prefix, extractPrefix)
    }

  def apply(json: Column): Column = apply(json, "", "")
  def apply(json: Column, prefix: String, extractPrefix: String): Column =
    ColumnBridge.column(
      new JsonFlatten(ColumnBridge.expression(json), prefix, extractPrefix))
}
