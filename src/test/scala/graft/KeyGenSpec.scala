package graft

import graft.pipeline.KeyGen
import org.scalatest.funsuite.AnyFunSuite
import java.security.spec.{PKCS8EncodedKeySpec, X509EncodedKeySpec}
import java.security.{KeyFactory, Signature}
import java.security.interfaces.{RSAPrivateKey, RSAPublicKey}
import java.util.Base64

/** O4 `gen` (reference cmd_gen.go:15-66): the emitted material must be
  * real, loadable key material — not string theater. Every block is
  * decoded back through the JDK's own parsers and the pair is proved
  * functional by an actual sign/verify round trip (the JWT-auth flow
  * the keys exist for). */
class KeyGenSpec extends AnyFunSuite {
  private val kp = KeyGen.generate()
  private val r = KeyGen.render(kp)

  private def pemBody(pem: String, kind: String): Array[Byte] = {
    assert(pem.startsWith(s"-----BEGIN $kind-----\n"), s"missing BEGIN $kind")
    assert(pem.endsWith(s"-----END $kind-----\n"), s"missing END $kind")
    val body = pem.linesIterator.filterNot(_.startsWith("-----")).toSeq
    assert(body.forall(_.length <= 64), "PEM lines must wrap at 64 chars")
    Base64.getDecoder.decode(body.mkString)
  }

  test("private PEM is PKCS#8 loadable RSA-2048") {
    val der = pemBody(r.privatePem, "PRIVATE KEY")
    val key = KeyFactory.getInstance("RSA")
      .generatePrivate(new PKCS8EncodedKeySpec(der))
      .asInstanceOf[RSAPrivateKey]
    assert(key.getModulus.bitLength == 2048)
  }

  test("public PEM is PKIX loadable and matches the private key's modulus") {
    val der = pemBody(r.publicPem, "PUBLIC KEY")
    val pub = KeyFactory.getInstance("RSA")
      .generatePublic(new X509EncodedKeySpec(der))
      .asInstanceOf[RSAPublicKey]
    assert(pub.getModulus ==
      kp.getPrivate.asInstanceOf[RSAPrivateKey].getModulus)
  }

  test("DSN base64url decodes to the same PKCS#8 DER as the PEM") {
    assert(Base64.getUrlDecoder.decode(r.dsnB64)
      .sameElements(pemBody(r.privatePem, "PRIVATE KEY")))
  }

  test("the pair signs and verifies (the JWT flow the keys exist for)") {
    val sig = Signature.getInstance("SHA256withRSA")
    sig.initSign(kp.getPrivate)
    val msg = "graft-jwt-claim".getBytes("UTF-8")
    sig.update(msg)
    val signed = sig.sign()
    val ver = Signature.getInstance("SHA256withRSA")
    ver.initVerify(kp.getPublic)
    ver.update(msg)
    assert(ver.verify(signed))
  }

  test("report carries the ALTER USER registration line and all blocks") {
    val rep = KeyGen.report(kp)
    assert(rep.contains("ALTER USER xxx SET RSA_PUBLIC_KEY="))
    assert(rep.contains(r.dsnB64))
    assert(rep.contains(r.privatePem.trim))
    assert(rep.contains(r.publicPem.trim))
  }

  test("two generations differ (real randomness, not a fixture)") {
    assert(!KeyGen.render(KeyGen.generate()).dsnB64.equals(r.dsnB64))
  }
}
