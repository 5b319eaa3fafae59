package graft.streaming

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.{KeyFactory, KeyStore, PrivateKey}
import java.security.cert.{CertificateFactory, X509Certificate}
import java.security.spec.PKCS8EncodedKeySpec
import java.util.Base64

import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

/** PEM-file TLS setup for the dev-mode socket listeners — the
  * reference's `tls(key-file("...") cert-file("..."))` block
  * (`/root/reference/lib/transport/transport-tls.c`,
  * `modules/afsocket/afsocket-grammar.ym` tls options) takes OpenSSL
  * PEM paths; this maps them onto a JSSE SSLContext (PKCS#8 private
  * key + X.509 cert chain in an in-memory keystore). Supports RSA and
  * EC keys; `ca-file()` on the client/source side builds a trust
  * store from the peer's cert (peer-verify(required-trusted)). */
object PemTls {

  private def pemBlocks(path: String, header: String): Seq[Array[Byte]] = {
    val text = new String(Files.readAllBytes(Paths.get(path)),
      StandardCharsets.US_ASCII)
    val re = ("(?s)-----BEGIN " + header + "-----(.*?)-----END " +
      header + "-----").r
    re.findAllMatchIn(text).map(m =>
      Base64.getMimeDecoder.decode(m.group(1).trim)).toSeq
  }

  private def certs(certFile: String): Seq[X509Certificate] = {
    val cf = CertificateFactory.getInstance("X.509")
    pemBlocks(certFile, "CERTIFICATE").map(der =>
      cf.generateCertificate(new ByteArrayInputStream(der))
        .asInstanceOf[X509Certificate])
  }

  private def privateKey(keyFile: String): PrivateKey = {
    val der = pemBlocks(keyFile, "PRIVATE KEY").headOption.getOrElse(
      throw new IllegalArgumentException(
        s"$keyFile: no PKCS#8 'BEGIN PRIVATE KEY' block (convert " +
          "legacy keys with openssl pkcs8 -topk8 -nocrypt)"))
    val spec = new PKCS8EncodedKeySpec(der)
    Seq("RSA", "EC", "Ed25519").view.flatMap { alg =>
      try Some(KeyFactory.getInstance(alg).generatePrivate(spec))
      catch { case _: Exception => None }
    }.headOption.getOrElse(throw new IllegalArgumentException(
      s"$keyFile: unsupported private key algorithm"))
  }

  /** Server context from the reference's cert-file()/key-file() pair. */
  def serverContext(certFile: String, keyFile: String): SSLContext = {
    val ks = KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    ks.setKeyEntry("server", privateKey(keyFile), Array.emptyCharArray,
      certs(certFile).toArray)
    val kmf = KeyManagerFactory.getInstance(
      KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, Array.emptyCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** Client context trusting exactly the certs in `caFile` — the
    * ca-file()/peer-verify(required-trusted) pair. */
  def clientContext(caFile: String): SSLContext = {
    val ks = KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    certs(caFile).zipWithIndex.foreach { case (c, i) =>
      ks.setCertificateEntry(s"ca$i", c)
    }
    val tmf = TrustManagerFactory.getInstance(
      TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx
  }
}
