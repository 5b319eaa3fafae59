package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.StringReader
import javax.xml.XMLConstants
import javax.xml.parsers.SAXParserFactory
import org.xml.sax.helpers.DefaultHandler
import org.xml.sax.{Attributes, InputSource, SAXException}

import scala.collection.mutable

/** `xml_flatten(xml)` — xml-parser() (`/root/reference/modules/xml/
  * xml.c:91-192`, options `xml-parser.c:36-37`): tags become dot-path
  * keys under the configured prefix (default `.xml.`), attributes
  * append as `path._attrname`, repeated tags concatenate their text
  * (reference default, `tests/test_xml_parser.c` "firstsecond" case).
  * Malformed XML yields null — the parser drops the message.
  *
  * Options: `prefix`, `excludeTags` (glob list — matching subtrees are
  * skipped), `stripWhitespaces`.
  *
  * JDK SAX, one streaming pass; external entities disabled (the XXE
  * hole a log parser must not have).
  */
case class XmlFlatten(child: Expression, prefix: String = ".xml.",
    excludeTags: Seq[String] = Nil, stripWhitespaces: Boolean = false)
    extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "xml_flatten"

  @transient private lazy val excludeRes =
    excludeTags.map(g => graft.operators.Rewrites.globToRegex(g).r)

  def evalXml(v: UTF8String): ArrayBasedMapData =
    XmlFlatten.flatten(v.toString, prefix, excludeRes.map(_.pattern),
      stripWhitespaces)

  override protected def nullSafeEval(v: Any): Any =
    evalXml(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("xmlFlatten", this, classOf[XmlFlatten].getName)
    nullSafeCodeGen(ctx, ev, v => s"""
      ${ev.value} = $self.evalXml($v);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }

  override protected def withNewChildInternal(c: Expression): XmlFlatten =
    copy(child = c)
}

object XmlFlatten {

  private val threadParser = ThreadLocal.withInitial[javax.xml.parsers.SAXParser] { () =>
    val factory = SAXParserFactory.newInstance()
    factory.setFeature(XMLConstants.FEATURE_SECURE_PROCESSING, true)
    factory.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    factory.newSAXParser()
  }

  def flatten(xml: String, prefix: String,
      exclude: Seq[java.util.regex.Pattern], strip: Boolean): ArrayBasedMapData = {
    // insertion-ordered accumulation; repeated keys concatenate
    val acc = mutable.LinkedHashMap.empty[String, StringBuilder]
    val handler = new DefaultHandler {
      private val path = mutable.Stack.empty[String]
      private var excluded = 0
      private val text = new StringBuilder

      private def flushText(): Unit = {
        if (excluded == 0 && path.nonEmpty && text.nonEmpty) {
          val t = if (strip) text.toString.trim else text.toString
          if (t.nonEmpty)
            acc.getOrElseUpdate(prefix + path.toSeq.reverse.mkString("."),
              new StringBuilder).append(t)
        }
        text.clear()
      }

      override def startElement(uri: String, local: String, qName: String,
          atts: Attributes): Unit = {
        flushText()
        if (excluded > 0 || exclude.exists(_.matcher(qName).matches())) excluded += 1
        path.push(qName)
        if (excluded == 0) {
          val base = prefix + path.toSeq.reverse.mkString(".")
          var i = 0
          while (i < atts.getLength) {
            acc.getOrElseUpdate(s"$base._${atts.getQName(i)}", new StringBuilder)
              .append(atts.getValue(i))
            i += 1
          }
        }
      }

      override def endElement(uri: String, local: String, qName: String): Unit = {
        flushText()
        path.pop()
        if (excluded > 0) excluded -= 1
        ()
      }

      override def characters(ch: Array[Char], start: Int, length: Int): Unit = {
        text.appendAll(ch, start, length)
        ()
      }
    }
    try {
      // SAXParser creation costs ~100µs — reuse one per executor thread
      val parser = threadParser.get()
      parser.reset()
      parser.parse(new InputSource(new StringReader(xml)), handler)
    } catch {
      case _: SAXException => return null
      case _: java.io.IOException => return null
    }
    ArrayBasedMapData(
      acc.keysIterator.map(UTF8String.fromString(_)).toArray[Any],
      acc.valuesIterator.map(v => UTF8String.fromString(v.toString)).toArray[Any])
  }

  def apply(xml: Column): Column = apply(xml, ".xml.", Nil, stripWhitespaces = false)
  def apply(xml: Column, prefix: String, excludeTags: Seq[String],
      stripWhitespaces: Boolean): Column =
    ColumnBridge.column(new XmlFlatten(ColumnBridge.expression(xml), prefix,
      excludeTags, stripWhitespaces))
}
