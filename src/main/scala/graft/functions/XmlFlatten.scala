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
  * xml.c:91-200`, scanner `lib/scanner/xml-scanner/xml-scanner.c`):
  * tags become dot-path keys under the configured prefix (default
  * `.xml`, joined with `.`; a trailing prefix dot is compacted,
  * xml.c:44-47), attributes append as `path._attrname`, and an
  * element pushes ONE value at close — its own text with child-tag
  * gaps joined (`<t>part1<u/>part2</t>` -> "part1part2", the
  * text-buffer stack of xml-scanner.c:163-180).
  *
  * Repeated keys follow `create-lists` (default yes since 3.20,
  * xml.c:194): values str-repr encode and join with `,`
  * (`" value,2 "` quotes, `one,two,three` doesn't); with
  * create-lists(no) they concatenate raw ("firstsecond").
  *
  * Like GMarkup, a SEQUENCE of root elements is accepted; loose
  * non-whitespace text at the top level is invalid. Malformed XML
  * yields null — the operator's forward-invalid option decides
  * pass-through vs drop.
  *
  * Options: `prefix`, `excludeTags` (glob list — matching subtrees are
  * skipped), `stripWhitespaces` (per text run), `createLists`.
  *
  * JDK SAX, one streaming pass; external entities disabled (the XXE
  * hole a log parser must not have).
  */
case class XmlFlatten(child: Expression, prefix: String = ".xml",
    excludeTags: Seq[String] = Nil, stripWhitespaces: Boolean = false,
    createLists: Boolean = true)
    extends UnaryExpression {

  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "xml_flatten"

  @transient private lazy val excludeRes =
    excludeTags.map(g => graft.operators.Rewrites.globToRegex(g).r)

  def evalXml(v: UTF8String): ArrayBasedMapData =
    XmlFlatten.flatten(v.toString, prefix, excludeRes.map(_.pattern),
      stripWhitespaces, createLists)

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

  private val Wrapper = "graft-synthetic-root"

  def flatten(xml: String, prefix: String,
      exclude: Seq[java.util.regex.Pattern], strip: Boolean,
      createLists: Boolean): ArrayBasedMapData = {
    // prefix compaction (xml.c:44-47) + dot join (xml-scanner.c:203)
    val normPrefix = if (prefix.endsWith(".")) prefix.dropRight(1) else prefix
    val acc = mutable.LinkedHashMap.empty[String, java.lang.StringBuilder]

    def pushValue(key: String, value: String): Unit = {
      val sb = acc.getOrElseUpdate(key, new java.lang.StringBuilder)
      if (createLists) {
        if (sb.length > 0) sb.append(',')
        ListRepr.encodeElement(value, sb)
      } else sb.append(value)
    }

    val handler = new DefaultHandler {
      private val path = mutable.Stack.empty[String]
      private var excluded = 0
      // own-text accumulation per open element (xml-scanner's
      // text-buffer stack); `run` is the current contiguous text run
      // (strip-whitespaces applies per run)
      private val textStack = mutable.Stack.empty[StringBuilder]
      private var own = new StringBuilder
      private val run = new StringBuilder

      private def key: String = {
        val p = path.toSeq.reverse.drop(1).mkString(".") // drop wrapper
        if (normPrefix.isEmpty) p else s"$normPrefix.$p"
      }

      private def flushRun(): Unit = {
        if (run.nonEmpty) {
          if (path.length <= 1 && run.toString.trim.nonEmpty)
            throw new SAXException("text outside of any element")
          val t = if (strip) run.toString.trim else run.toString
          if (excluded == 0 && path.length > 1) own.append(t)
          run.clear()
        }
      }

      override def startElement(uri: String, local: String, qName: String,
          atts: Attributes): Unit = {
        flushRun()
        if (qName != Wrapper) {
          if (excluded > 0 || exclude.exists(_.matcher(qName).matches()))
            excluded += 1
          path.push(qName)
          textStack.push(own)
          own = new StringBuilder
          if (excluded == 0) {
            val base = key
            var i = 0
            while (i < atts.getLength) {
              pushValue(s"$base._${atts.getQName(i)}", atts.getValue(i))
              i += 1
            }
          }
        } else path.push(qName)
      }

      override def endElement(uri: String, local: String, qName: String): Unit = {
        flushRun()
        if (qName != Wrapper) {
          if (excluded == 0 && own.nonEmpty) pushValue(key, own.toString)
          path.pop()
          own = textStack.pop()
          if (excluded > 0) excluded -= 1
        } else path.pop()
        ()
      }

      override def characters(ch: Array[Char], start: Int, length: Int): Unit = {
        run.appendAll(ch, start, length)
        ()
      }
    }
    try {
      // GMarkup accepts root SEQUENCES — wrap in a synthetic root (any
      // XML declaration must stay outside the wrapper)
      val decl = "^\\s*<\\?xml[^?]*\\?>".r
      val body = decl.replaceFirstIn(xml, "")
      val wrapped = s"<$Wrapper>$body</$Wrapper>"
      val parser = threadParser.get()
      parser.reset()
      parser.parse(new InputSource(new StringReader(wrapped)), handler)
    } catch {
      case _: SAXException => return null
      case _: java.io.IOException => return null
    }
    ArrayBasedMapData(
      acc.keysIterator.map(UTF8String.fromString(_)).toArray[Any],
      acc.valuesIterator.map(v => UTF8String.fromString(v.toString)).toArray[Any])
  }

  def apply(xml: Column): Column =
    apply(xml, ".xml", Nil, stripWhitespaces = false)
  def apply(xml: Column, prefix: String, excludeTags: Seq[String],
      stripWhitespaces: Boolean): Column =
    apply(xml, prefix, excludeTags, stripWhitespaces, createLists = true)
  def apply(xml: Column, prefix: String, excludeTags: Seq[String],
      stripWhitespaces: Boolean, createLists: Boolean): Column =
    ColumnBridge.column(new XmlFlatten(ColumnBridge.expression(xml), prefix,
      excludeTags, stripWhitespaces, createLists))
}
