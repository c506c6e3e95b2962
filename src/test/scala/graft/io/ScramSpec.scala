package graft.io.pgwire

import org.scalatest.funsuite.AnyFunSuite

/** SCRAM-SHA-256 math against the RFC 7677 §3 worked example — the
  * published test vector, so the proof/signature path is verified
  * independently of any live server (PgWireSpec covers the wire). */
class ScramSpec extends AnyFunSuite {
  private val clientFirstBare = "n=user,r=rOprNGfwEbeRWgbNEkqO"
  private val serverFirst =
    "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
      "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
  private val clientFinalNoProof =
    "c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0"

  private def salted = Scram.saltedPassword("pencil",
    java.util.Base64.getDecoder.decode("W22ZaJ0SNY7soEsUEjb6gQ=="), 4096)

  test("client proof matches the RFC 7677 vector") {
    val am = Scram.authMessage(clientFirstBare, serverFirst, clientFinalNoProof)
    assert(Scram.clientProofB64(salted, am) ==
      "dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=")
  }

  test("server signature matches the RFC 7677 vector") {
    val am = Scram.authMessage(clientFirstBare, serverFirst, clientFinalNoProof)
    assert(Scram.serverSignatureB64(salted, am) ==
      "6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
  }

  test("mechanism list parses NUL-terminated cstrings, not whitespace") {
    val payload = "SCRAM-SHA-256\u0000SCRAM-SHA-256-PLUS\u0000\u0000"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    assert(Scram.parseMechanisms(payload) ==
      Seq("SCRAM-SHA-256", "SCRAM-SHA-256-PLUS"))
  }

  test("a tampered server-first (MITM salt swap) yields a different server signature") {
    // a man-in-the-middle that alters salt/iterations cannot produce a
    // v= the client will accept: the signature binds the full AuthMessage
    val tampered = serverFirst.replace("i=4096", "i=1024")
    val amGood = Scram.authMessage(clientFirstBare, serverFirst, clientFinalNoProof)
    val amBad = Scram.authMessage(clientFirstBare, tampered, clientFinalNoProof)
    assert(Scram.serverSignatureB64(salted, amGood)
      != Scram.serverSignatureB64(salted, amBad))
  }

  test("attribute parsing keeps base64 '=' padding inside values") {
    val attrs = Scram.parseAttrs(serverFirst)
    assert(attrs('s') == "W22ZaJ0SNY7soEsUEjb6gQ==")
    assert(attrs('i') == "4096")
    assert(attrs('r') == "rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0")
  }

  test("missing required attribute raises a diagnosable SQLException") {
    // a malformed server-first missing s= must not surface as a bare
    // NoSuchElementException from Map.apply deep in the auth loop
    val attrs = Scram.parseAttrs("r=abc,i=4096")
    val e = intercept[java.sql.SQLException] {
      Scram.attr(attrs, 's', "r=abc,i=4096")
    }
    assert(e.getMessage.contains("missing 's='"))
    assert(Scram.attr(attrs, 'i', "r=abc,i=4096") == "4096")
  }

  test("channel-binding c= constants: n,, → biws, y,, → eSws") {
    assert(Scram.channelBindingB64("n,,", Array.emptyByteArray) == "biws")
    assert(Scram.channelBindingB64("y,,", Array.emptyByteArray) == "eSws")
  }

  test("tls-server-end-point: SHA-256 of the DER cert for sha256WithRSA") {
    // a fixed self-signed cert (CN=graft-test, sha256WithRSAEncryption);
    // the expected binding data is sha256 over the DER bytes, computed
    // independently with openssl: `openssl x509 -outform DER | sha256sum`
    val certB64 =
      "MIIDCzCCAfOgAwIBAgIUOHZejTXVeGwFnNbaiYklsRXsK0owDQYJKoZIhvcNAQELBQAwFTETMBEG" +
      "A1UEAwwKZ3JhZnQtdGVzdDAeFw0yNjA4MTUxNjI2NDBaFw0zNjA4MTIxNjI2NDBaMBUxEzARBgNV" +
      "BAMMCmdyYWZ0LXRlc3QwggEiMA0GCSqGSIb3DQEBAQUAA4IBDwAwggEKAoIBAQChYVQbG8PUyDLD" +
      "oGQWk1HMCvca1ZSX+7r0L9ObhcxqHxiK+OBur4cxao7+AxNdZtrS0KDSwA0GEU66Cc5nDhgPnR3k" +
      "cN5v297VEZKSJ6CRDbC3LOcCN0KraE1cJAwQoZCfjG4jAEDd/L28M3tJbMPNeTlbt2P8KxZUiRAN" +
      "OELdeEq9NyVlu+kll4OEJc4t/wCqM+suj0zUfC4pI/1YD2iKaepGSORZE6W4zR29uvYQ5o0LvDzx" +
      "6Vzp8+A8qQ6caHGzgWIy5NajHcpJJ3uuH0Le7pP6pjWGH1gPoydX4qgHa9cePrYYvNjGHBA2SCFT" +
      "cn0Tvs780l/aFIuEHPuxMeoDAgMBAAGjUzBRMB0GA1UdDgQWBBTKU6sMZibq11wsuIcwJis7awXy" +
      "WDAfBgNVHSMEGDAWgBTKU6sMZibq11wsuIcwJis7awXyWDAPBgNVHRMBAf8EBTADAQH/MA0GCSqG" +
      "SIb3DQEBCwUAA4IBAQCR9V9MIo6wIXgUPq8XswTwVaC9EdsbLAsmM+cyXwtRO+caR8BQz7sAied1" +
      "ifSMumOYJC3wP3JI4P+pZ/PcuPBuUFuefsqmBS9T0YuNb5ZVRziOb7w/phcbXGbLqd0LhZZIYd5G" +
      "DvJB/uDKRHpYjEGOHeebZVIxvUYLUYDf2gJhHfDZdUSFy+FbOUA+Qv2uCuWWrB9k0Dh2I+VJXdon" +
      "qg7leHe5GFmUwNUJv9A1gWEbEnltWH78woW+DlQgzFiKkW63o3Bet0y9Zsj2MBbTMk3JP8ETU4gW" +
      "dcnrLk3zDzwG0UG5tgxFP+jDTBrvNjWZri5V/DbkuSBJ9x/CmZYKNu14"
    val der = java.util.Base64.getDecoder.decode(certB64)
    val cert = java.security.cert.CertificateFactory.getInstance("X.509")
      .generateCertificate(new java.io.ByteArrayInputStream(der))
      .asInstanceOf[java.security.cert.X509Certificate]
    assert(cert.getSigAlgName.toUpperCase.startsWith("SHA256"))
    val cb = Scram.tlsServerEndPoint(cert)
    val expectHex =
      "6efa59f025fa72ee667e8e9d0058986ad23ff910f8ee7dc9ae9f95c21fd2adb6"
    assert(cb.map("%02x".format(_)).mkString == expectHex)
    // and the full -PLUS c= attribute over this cert
    assert(Scram.channelBindingB64("p=tls-server-end-point,,", cb) ==
      "cD10bHMtc2VydmVyLWVuZC1wb2ludCwsbvpZ8CX6cu5mfo6dAFiYatI/+RD47n3Jrp+Vwh/SrbY=")
  }

  test("a MITM's different cert yields different channel-binding data") {
    // the defense trust-all TLS leans on: two certs → two cb hashes →
    // the server-side proof check fails for the interceptor
    val a = "fake-cert-der-A".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = "fake-cert-der-B".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    assert(Scram.channelBindingB64("p=tls-server-end-point,,", a) !=
      Scram.channelBindingB64("p=tls-server-end-point,,", b))
  }

  test("RFC 5802 §5.1: combined nonce must extend the client nonce") {
    // the check lives in the auth loop; verify the property it enforces —
    // a replayed server-first carries a combined nonce that does NOT
    // start with THIS session's fresh client nonce
    val clientNonce = "rOprNGfwEbeRWgbNEkqO"
    val genuine = Scram.parseAttrs(serverFirst)('r')
    assert(genuine.startsWith(clientNonce))
    val replayed = "XXXdifferentPrefix%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0"
    assert(!replayed.startsWith(clientNonce))
  }
}
