package graft.io.pgwire

import java.nio.charset.StandardCharsets.UTF_8

/** Pure SCRAM-SHA-256 math (RFC 5802 mechanics, RFC 7677 parameters) —
  * kept free of socket state so the whole exchange is unit-testable
  * against the RFC 7677 §3 worked example (ScramSpec does exactly that).
  *
  * Passwords are used verbatim (no SASLprep): exact for ASCII passwords,
  * which is all the sandbox provisions; non-ASCII needs RFC 4013.
  */
private[pgwire] object Scram {
  private def hmac(key: Array[Byte], msg: Array[Byte]): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(msg)
  }

  private def sha256(b: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)

  /** Hi() = PBKDF2-HMAC-SHA256, dkLen 32 (RFC 5802 §2.2). */
  def saltedPassword(password: String, salt: Array[Byte], iters: Int): Array[Byte] =
    javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(new javax.crypto.spec.PBEKeySpec(
        password.toCharArray, salt, iters, 256)).getEncoded

  /** AuthMessage = client-first-bare , server-first , client-final-no-proof. */
  def authMessage(clientFirstBare: String, serverFirst: String,
                  clientFinalNoProof: String): Array[Byte] =
    (clientFirstBare + "," + serverFirst + "," + clientFinalNoProof)
      .getBytes(UTF_8)

  /** ClientProof = ClientKey XOR HMAC(SHA256(ClientKey), AuthMessage), base64. */
  def clientProofB64(salted: Array[Byte], authMsg: Array[Byte]): String = {
    val clientKey = hmac(salted, "Client Key".getBytes(UTF_8))
    val sig = hmac(sha256(clientKey), authMsg)
    java.util.Base64.getEncoder.encodeToString(
      clientKey.zip(sig).map { case (a, b) => (a ^ b).toByte })
  }

  /** ServerSignature = HMAC(HMAC(salted, "Server Key"), AuthMessage), base64 —
    * the v= value a genuine server must echo (mutual auth). */
  def serverSignatureB64(salted: Array[Byte], authMsg: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(
      hmac(hmac(salted, "Server Key".getBytes(UTF_8)), authMsg))

  /** AuthenticationSASL mechanism list: NUL-terminated cstrings ended by
    * an empty string (PG protocol §AuthenticationSASL) — NOT whitespace
    * separated. */
  def parseMechanisms(payload: Array[Byte]): Seq[String] =
    new String(payload, UTF_8).split('\u0000').filter(_.nonEmpty).toSeq

  /** "r=...,s=...,i=..." SCRAM attribute list → first-char-keyed map.
    * SCRAM attr values may contain '=' (base64 padding) but never ','
    * (the base64 alphabet has no comma and SCRAM forbids it in nonces),
    * so split only on ',' and keep everything after "x=". */
  def parseAttrs(msg: String): Map[Char, String] =
    msg.split(',').filter(_.length >= 2)
      .map(a => a.charAt(0) -> a.drop(2)).toMap

  /** Required-attribute lookup: a malformed server message missing r=/s=/i=
    * must surface as a diagnosable SQLException, not a bare
    * NoSuchElementException from Map.apply. */
  def attr(attrs: Map[Char, String], key: Char, msg: String): String =
    attrs.getOrElse(key, throw new java.sql.SQLException(
      s"malformed SCRAM server message (missing '$key=' attribute): $msg"))

  /** RFC 5929 §4.1 `tls-server-end-point` channel-binding data: the hash
    * of the server certificate's DER encoding, using the hash of the
    * cert's own signature algorithm — except MD5/SHA-1, which upgrade to
    * SHA-256 (the RFC's explicit rule; also the sane default for
    * algorithms that don't name a single hash, e.g. RSASSA-PSS). */
  def tlsServerEndPoint(cert: java.security.cert.X509Certificate): Array[Byte] = {
    val alg = cert.getSigAlgName.toUpperCase.split("WITH")(0) match {
      case "MD5" | "SHA1" | "SHA-1" => "SHA-256"
      case "SHA224"                 => "SHA-224"
      case "SHA256"                 => "SHA-256"
      case "SHA384"                 => "SHA-384"
      case "SHA512"                 => "SHA-512"
      case _                        => "SHA-256"
    }
    java.security.MessageDigest.getInstance(alg).digest(cert.getEncoded)
  }

  /** The client-final `c=` attribute: base64(gs2-header-bytes ‖ cb-data)
    * (RFC 5802 §7 cbind-input). With no channel binding the data is empty
    * and this reduces to the familiar constants — base64("n,,") = "biws",
    * base64("y,,") = "eSws". */
  def channelBindingB64(gs2Header: String, cbData: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(
      gs2Header.getBytes(UTF_8) ++ cbData)
}
