package graft.influxql

import java.nio.charset.StandardCharsets

/** Minimal HS256 JWT for InfluxDB 1.x shared-secret authentication — the
  * 1.x server's second auth mode next to u/p ([http] `shared-secret`):
  * clients send `Authorization: Bearer <jwt>` whose payload carries a
  * `username` claim (resolved against the user catalog for privileges)
  * and a REQUIRED `exp` (InfluxDB rejects tokens without an expiry).
  * JDK-only: `javax.crypto.Mac` HmacSHA256 + Base64url + Jackson for the
  * payload, nothing off the offline classpath.
  */
object Jwt {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def b64url(b: Array[Byte]): String =
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(b)
  private def unb64url(s: String): Array[Byte] =
    java.util.Base64.getUrlDecoder.decode(s)

  private def hmac(data: String, secret: String): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(
      secret.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
    mac.doFinal(data.getBytes(StandardCharsets.UTF_8))
  }

  /** Mint a token (test/client side). `expEpochSec` is the standard
    * seconds-since-epoch `exp` claim.
    */
  def sign(username: String, expEpochSec: Long, secret: String): String = {
    val header = b64url("""{"alg":"HS256","typ":"JWT"}""".getBytes(StandardCharsets.UTF_8))
    val payload = b64url(mapper.writeValueAsBytes(
      java.util.Map.of("username", username, "exp", java.lang.Long.valueOf(expEpochSec))))
    val signingInput = s"$header.$payload"
    s"$signingInput.${b64url(hmac(signingInput, secret))}"
  }

  /** Verify signature + expiry; returns the username claim on success.
    * `nowEpochSec` defaults to the wall clock (overridable for tests).
    * Constant-time signature compare; any malformed structure, non-HS256
    * alg, missing claim, or stale `exp` is a clean None — 401 upstream.
    */
  def verify(token: String, secret: String,
      nowEpochSec: Long = System.currentTimeMillis() / 1000L): Option[String] =
    try {
      token.split('.') match {
        case Array(h, p, sig) =>
          val header = mapper.readTree(unb64url(h))
          val sigOk = header.path("alg").asText() == "HS256" &&
            java.security.MessageDigest.isEqual(hmac(s"$h.$p", secret), unb64url(sig))
          if (!sigOk) None
          else {
            val payload = mapper.readTree(unb64url(p))
            val user = payload.path("username").asText("")
            val exp = payload.path("exp")
            if (user.isEmpty || !exp.isNumber || exp.asLong() <= nowEpochSec) None
            else Some(user)
          }
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}
