package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.security.{KeyPair, MessageDigest, Signature}
import java.time.Duration
import java.util.Base64

/** K1's ingestion wire protocol, Spark-first: the published Snowpipe
  * REST API with RSA key-pair JWT auth — the flow the reference's
  * `gen` keypair exists for (cmd_gen.go:15-66 registers the public key
  * with `ALTER USER … SET RSA_PUBLIC_KEY`; the reference then drives
  * ingestion through the Go driver's PUT + `ALTER PIPE … REFRESH`,
  * snowflake.go:114-252). The driver-internal stage PUT is not
  * replicable without the vendor driver; the PUBLIC equivalent a
  * Spark deployment uses is: write parquet/CSV to the pipe's external
  * stage (any `df.write` to S3/ADLS — Spark's own distributed writer
  * IS the upload step), then notify Snowpipe over REST:
  *
  *   POST /v1/data/pipes/{pipe}/insertFiles?requestId=…   (this class)
  *   GET  /v1/data/pipes/{pipe}/insertReport              (ingest audit)
  *
  * authenticated by an RS256 JWT whose issuer carries the SHA-256
  * fingerprint of the registered public key:
  *
  *   iss = ACCOUNT.USER.SHA256:<b64(sha256(publicKeyDER))>
  *   sub = ACCOUNT.USER        iat/exp = now/+lifetime
  *
  * — all published protocol, built here from `java.security` alone (no
  * vendor SDK; the same zero-dependency discipline as the sync
  * client). Zero-egress caveat: spec-verified against an in-JVM HTTP
  * server plus direct RSA signature verification (SnowpipeSpec); a
  * live account run needs network access this environment doesn't
  * have. */
final class SnowpipeClient(
    baseUrl: String, // http(s)://account.snowflakecomputing.com (or mock)
    account: String,
    user: String,
    keyPair: KeyPair,
    timeout: Duration = Duration.ofSeconds(30)) {

  private val client = HttpClient.newBuilder().connectTimeout(timeout).build()

  /** The key-pair JWT (RS256), lifetime bounded — built from raw
    * `java.security` primitives: base64url(header).base64url(payload)
    * signed with SHA256withRSA. */
  def jwt(nowEpochSec: Long = java.time.Instant.now().getEpochSecond,
      lifetimeSec: Long = 3540): String = {
    val qualified = s"${account.toUpperCase}.${user.toUpperCase}"
    val fp = "SHA256:" + Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("SHA-256")
        .digest(keyPair.getPublic.getEncoded))
    def b64url(s: Array[Byte]): String =
      Base64.getUrlEncoder.withoutPadding().encodeToString(s)
    val header = b64url("""{"alg":"RS256","typ":"JWT"}"""
      .getBytes(StandardCharsets.UTF_8))
    val payload = b64url(
      (s"""{"iss":"$qualified.$fp","sub":"$qualified",""" +
        s""""iat":$nowEpochSec,"exp":${nowEpochSec + lifetimeSec}}""")
        .getBytes(StandardCharsets.UTF_8))
    val signer = Signature.getInstance("SHA256withRSA")
    signer.initSign(keyPair.getPrivate)
    signer.update(s"$header.$payload".getBytes(StandardCharsets.UTF_8))
    s"$header.$payload.${b64url(signer.sign())}"
  }

  private def send(req: HttpRequest.Builder): String = {
    val resp = client.send(
      req.header("Authorization", s"Bearer ${jwt()}")
        .header("Accept", "application/json")
        .timeout(timeout).build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new RuntimeException(
        s"snowpipe -> HTTP ${resp.statusCode()}: ${resp.body()}")
    resp.body()
  }

  /** Notify the pipe that staged files are ready to ingest. `files` are
    * stage-relative paths (what a distributed `df.write` just
    * produced). Returns the response body (requestId echo + status). */
  def insertFiles(pipe: String, files: Seq[String],
      requestId: String = java.util.UUID.randomUUID().toString): String = {
    val body = files.map(f => s"""{"path": ${DatabricksSink.jsonStr(f)}}""")
      .mkString("""{"files": [""", ", ", "]}")
    send(HttpRequest.newBuilder(URI.create(
        s"${baseUrl.stripSuffix("/")}/v1/data/pipes/$pipe/insertFiles?requestId=$requestId"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)))
  }

  /** The pipe's recent ingest history — the audit loop an operator
    * polls after insertFiles. */
  def insertReport(pipe: String, beginMark: Option[String] = None): String =
    send(HttpRequest.newBuilder(URI.create(
      s"${baseUrl.stripSuffix("/")}/v1/data/pipes/$pipe/insertReport" +
        beginMark.map(m => s"?beginMark=$m").getOrElse(""))).GET())
}

object SnowpipeClient {
  /** Rebuild the full KeyPair from the DSN-format private key — the
    * base64url PKCS#8 DER `gen` prints (KeyGen.Rendered.dsnB64): the
    * public half is derived from the CRT parameters, so the one DSN
    * string is enough to sign AND to compute the issuer's public-key
    * fingerprint. */
  def keyPairFromDsnB64(b64: String): KeyPair = {
    val der = Base64.getUrlDecoder.decode(b64)
    val kf = java.security.KeyFactory.getInstance("RSA")
    val priv = kf.generatePrivate(
        new java.security.spec.PKCS8EncodedKeySpec(der))
      .asInstanceOf[java.security.interfaces.RSAPrivateCrtKey]
    val pub = kf.generatePublic(new java.security.spec.RSAPublicKeySpec(
      priv.getModulus, priv.getPublicExponent))
    new KeyPair(pub, priv)
  }
}
