package graft

import graft.operators.Parsers
import org.apache.spark.sql.functions._

/** Extension of the kv-scanner parity battery — the remaining
  * distinctive cases of
  * `/root/reference/lib/scanner/kv-scanner/tests/test_kv_scanner.c`
  * not yet in ParsersSpec: incomplete inputs, key charset edges, empty
  * keys, unclosed quotes, separator-in-key, pair-separator modes
  * (single char, bare space, multi-space), and stray-word capture. */
class KvScannerBatterySpec extends GraftSuite {
  import spark.implicits._

  private def scanned(in: String, vsep: Char = '=', psep: String = ", ") =
    Seq(in).toDF("s")
      .select(Parsers.kvParse(col("s"), vsep, "", psep).as("p"),
        graft.functions.KvScan(col("s"), vsep, "", rawValues = false,
          pairSep = psep).getField("stray").as("w"))
      .head()

  private def pairs(in: String, vsep: Char = '=', psep: String = ", ")
      : Seq[(String, String)] =
    scanned(in, vsep, psep).getMap[String, String](0).toSeq.sortBy(_._1)

  private def stray(in: String): String = scanned(in).getString(1)

  test("incomplete strings return no pairs (:263-269)") {
    for (in <- Seq("", "f", "fo", "foo")) assert(pairs(in) == Nil, in)
  }

  test("name=value basics + key charset (:271-282,711-724)") {
    assert(pairs("foo=") == Seq("foo" -> ""))
    assert(pairs("foo=b") == Seq("foo" -> "b"))
    assert(pairs("FOOfoo123-_._-321oofOOF=value") ==
      Seq("FOOfoo123-_._-321oofOOF" -> "value"))
    assert(pairs("k-j=v") == Seq("k-j" -> "v"))
    assert(pairs("0=v") == Seq("0" -> "v"))
    assert(pairs("_=v") == Seq("_" -> "v"))
    assert(pairs("Z=v") == Seq("Z" -> "v"))
    assert(pairs(":=v") == Nil)
    assert(pairs(":=") == Nil)
    assert(pairs("á=v") == Nil) // non-ASCII key char
    // a non-key char right before the key is a boundary, key survives
    assert(pairs("*k=v") == Seq("k" -> "v"))
    assert(pairs("x *k=v") == Seq("k" -> "v"))
    assert(pairs("a b c=d") == Seq("c" -> "d"))
  }

  test("empty keys never produce pairs (:658-675)") {
    for (in <- Seq("=v", "k*=v", "=", "==", "===", " =", " ==", " ===", " = ="))
      assert(pairs(in) == Nil, in)
    assert(pairs(" ==k=") == Seq("k" -> ""))
    assert(pairs(" = =k=") == Seq("k" -> ""))
    assert(pairs(" =k=") == Seq("k" -> ""))
    assert(pairs(" =k=v") == Seq("k" -> "v"))
    assert(pairs(" ==k=v") == Seq("k" -> "v"))
    assert(pairs(" =k=v=w") == Seq("k" -> "v=w"))
  }

  test("multiple separators stay in the value (:455-465,703-709)") {
    assert(pairs("k==") == Seq("k" -> "="))
    assert(pairs("k===") == Seq("k" -> "=="))
    assert(pairs("k===a") == Seq("k" -> "==a"))
    assert(pairs("k===a=b") == Seq("k" -> "==a=b"))
    assert(pairs("a==b=") == Seq("a" -> "=b="))
    assert(pairs("a=,=b=a") == Seq("a" -> ",=b=a"))
    assert(pairs("a= =a") == Seq("a" -> "=a"))
  }

  test("unclosed quotes are literal (:677-693)") {
    assert(pairs("k=\"a") == Seq("k" -> "\"a"))
    assert(pairs("k=\\") == Seq("k" -> "\\"))
    assert(pairs("k=\"\\") == Seq("k" -> "\"\\"))
    assert(pairs("k='a") == Seq("k" -> "'a"))
    assert(pairs("k='\\") == Seq("k" -> "'\\"))
    assert(pairs("foo=bar\"") == Seq("foo" -> "bar\""))
    assert(pairs("foo='bar") == Seq("foo" -> "'bar"))
  }

  test("comma handling with the default ', ' pair separator (:695-701)") {
    assert(pairs(", k=v") == Seq("k" -> "v"))
    assert(pairs(",k=v") == Seq("k" -> "v"))
    assert(pairs("k=v,") == Seq("k" -> "v,"))
    assert(pairs("k=v, ") == Seq("k" -> "v"))
    assert(pairs("key1=value1,   key2=value2  ,    key3=value3") ==
      Seq("key1" -> "value1", "key2" -> "value2", "key3" -> "value3"))
  }

  test("space trimming around keys, separator and value start (:734-781)") {
    assert(pairs("foo =bar") == Seq("foo" -> "bar"))
    assert(pairs("foo= bar") == Seq("foo" -> "bar"))
    assert(pairs(" foo =bar ggg baz=ez") ==
      Seq("baz" -> "ez", "foo" -> "bar ggg"))
    assert(pairs("foo =  bar ggg baz   =   ez") ==
      Seq("baz" -> "ez", "foo" -> "bar ggg"))
    assert(pairs("k===  a") == Seq("k" -> "==  a"))
    assert(pairs(" k= b") == Seq("k" -> "b"))
    assert(pairs("foo=bar ggg") == Seq("foo" -> "bar ggg"))
  }

  test("tab edge cases (:366-384)") {
    assert(pairs("key1=value1,\tkey2=value2 key3=value3") ==
      Seq("key1" -> "value1,\tkey2=value2", "key3" -> "value3"))
    assert(pairs("key1=value1\t key2=value2 key3=value3") ==
      Seq("key1" -> "value1\t", "key2" -> "value2", "key3" -> "value3"))
    assert(pairs("k=\t") == Seq("k" -> "\t"))
    assert(pairs("k=,\t") == Seq("k" -> ",\t"))
  }

  test("quoted values are one token; stray after quote (:482-508)") {
    assert(pairs("key1=\"value foo embedded_key=emb_value\" key2=marker") ==
      Seq("key1" -> "value foo embedded_key=emb_value", "key2" -> "marker"))
    assert(pairs("key1='value foo\\'' key2=marker") ==
      Seq("key1" -> "value foo'", "key2" -> "marker"))
    assert(pairs("key1=\"value foo, foo2 =@,\\\"\" key2='value foo,  a='") ==
      Seq("key1" -> "value foo, foo2 =@,\"", "key2" -> "value foo,  a="))
    assert(pairs("foo=\"bar\" baz c=d") == Seq("c" -> "d", "foo" -> "bar"))
    assert(pairs("foo=a \"bar baz c=d") ==
      Seq("c" -> "d", "foo" -> "a \"bar baz"))
    assert(pairs("foo=a \"bar baz\"=f c=d a") ==
      Seq("c" -> "d a", "foo" -> "a \"bar baz\"=f"))
  }

  test("separator in key position with kv-separator '-' (:646-656)") {
    assert(pairs("k-v", vsep = '-') == Seq("k" -> "v"))
    assert(pairs("k--v", vsep = '-') == Seq("k" -> "-v"))
    assert(pairs("---", vsep = '-') == Seq("-" -> "-"))
  }

  test("kv-separator ':' with spaces (:599-623)") {
    assert(pairs("key1: \"value1\" key2 : value2 key3 :value3 ", vsep = ':') ==
      Seq("key1" -> "value1", "key2" -> "value2", "key3" -> "value3"))
  }

  test("single-char pair separator ';' (:559-584)") {
    assert(pairs("foo=bar; bar=foo;", psep = ";") ==
      Seq("bar" -> "foo", "foo" -> "bar"))
    assert(pairs("foo=bar;bar=foo;baz=foo", psep = ";") ==
      Seq("bar" -> "foo", "baz" -> "foo", "foo" -> "bar"))
    assert(pairs("foo=bar baz;bar=foo;", psep = ";") ==
      Seq("bar" -> "foo", "foo" -> "bar baz"))
    // trailing spaces before the separator trim
    assert(pairs("foo=bar baz  ;bar=foo;", psep = ";") ==
      Seq("bar" -> "foo", "foo" -> "bar baz"))
  }

  test("pair separator ' ' disables the space heuristics (:534-556)") {
    assert(pairs("foo=v1 v2 bar=v3 v4", psep = " ") ==
      Seq("bar" -> "v3", "foo" -> "v1"))
    // multi-space separator still trims trailing spaces at end of line
    assert(pairs("foo=v1 v2   bar=v3 v4  ", psep = "   ") ==
      Seq("bar" -> "v3 v4", "foo" -> "v1 v2"))
  }

  test("stray words are stored (:783-796)") {
    assert(stray("foo=bar") == "")
    assert(stray("alma foo=bar") == "alma")
    assert(stray("alma foo=bar, korte bar=foo") == "alma,korte")
    assert(stray("alma foo=bar, korte bar=foo, narancs") == "alma,korte,narancs")
  }

  test("parser-level junos shape: prefix, ';' pairs, quoted stray " +
      "(test_kv_parser.c:137-161)") {
    val in = "VSYS=public; Slot=5/1; protocol=17; source-ip=10.116.214.221; " +
      "source-port=50989; destination-ip=172.16.236.16; destination-port=162;" +
      "time=2016/02/18 16:00:07; interzone-emtn_s1_vpn-enodeb_om inbound; " +
      "policy=370;"
    val df = spark.createDataFrame(Seq(Tuple1(in))).toDF("s")
    val row = df.select(
      graft.functions.KvScan(col("s"), '=', ".junos.", rawValues = false,
        pairSep = ";")).collect()(0).getStruct(0)
    val pairs = row.getMap[String, String](0)
    assert(pairs(".junos.VSYS") == "public")
    assert(pairs(".junos.Slot") == "5/1")
    assert(pairs(".junos.protocol") == "17")
    assert(pairs(".junos.source-ip") == "10.116.214.221")
    assert(pairs(".junos.source-port") == "50989")
    assert(pairs(".junos.destination-ip") == "172.16.236.16")
    assert(pairs(".junos.destination-port") == "162")
    assert(pairs(".junos.time") == "2016/02/18 16:00:07")
    assert(pairs(".junos.policy") == "370")
    // the stray chunk keeps its trailing ';' (it is NOT a consumed pair
    // separator — the scanner stops at the start of the NEXT key) and
    // arrives str-repr quoted because it contains a space
    assert(row.getString(1) == "\"interzone-emtn_s1_vpn-enodeb_om inbound;\"")
  }
}
