package graft.conf

import org.scalatest.funsuite.AnyFunSuite

/** Transliteration of the reference's own test suite
  * (tests/test_s3_endpoint_normalization.py:13-45 — all 14 parametrized
  * cases) plus the credential/path-style selection matrix of
  * initialize_spark_session (spark_processing.py:68-110).
  */
class S3ConfSpec extends AnyFunSuite {

  // -- the 5 valid cases --
  test("https endpoint → host + SSL on") {
    assert(S3Conf.normalizeEndpoint("https://s3.us-east-1.amazonaws.com") ==
      ("s3.us-east-1.amazonaws.com", Some(true)))
  }
  test("http endpoint → host + SSL off") {
    assert(S3Conf.normalizeEndpoint("http://s3.us-west-2.amazonaws.com") ==
      ("s3.us-west-2.amazonaws.com", Some(false)))
  }
  test("scheme-less endpoint passes through with no SSL opinion") {
    assert(S3Conf.normalizeEndpoint("s3.eu-west-2.amazonaws.com") ==
      ("s3.eu-west-2.amazonaws.com", None))
  }
  test("scheme-less endpoint preserves case") {
    assert(S3Conf.normalizeEndpoint("S3.CUSTOM-ENDPOINT.EXAMPLE.COM") ==
      ("S3.CUSTOM-ENDPOINT.EXAMPLE.COM", None))
  }
  test("custom port is kept in the host") {
    assert(S3Conf.normalizeEndpoint("https://objects.example.com:8443") ==
      ("objects.example.com:8443", Some(true)))
  }

  // -- the 9 invalid cases --
  private def rejects(raw: String): Unit =
    assertThrows[IllegalArgumentException](S3Conf.normalizeEndpoint(raw))

  test("empty string rejected") { rejects("") }
  test("whitespace-only rejected") { rejects("   ") }
  test("null rejected") { rejects(null) }
  test("missing host rejected") { rejects("http://") }
  test("path component rejected") { rejects("https://s3.us-east-1.amazonaws.com/bucket") }
  test("trailing slash rejected") { rejects("http://s3.us-east-1.amazonaws.com/") }
  test("trailing slash without scheme rejected") { rejects("s3.us-east-1.amazonaws.com/") }
  test("path without scheme rejected") { rejects("s3.us-east-1.amazonaws.com/extra") }
  test("query parameters rejected") { rejects("http://s3.us-east-1.amazonaws.com?foo=bar") }

  // -- credential/path-style selection (spark_processing.py:68-110) --
  test("static keys select SimpleAWSCredentialsProvider") {
    val m = S3Conf.sessionConfigs("eu-west-2", Some("AK"), Some("SK"))
    assert(m("spark.hadoop.fs.s3a.aws.credentials.provider")
      == "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider")
    assert(m("spark.hadoop.fs.s3a.access.key") == "AK")
    assert(!m.contains("spark.hadoop.fs.s3a.session.token"))
  }
  test("session token upgrades to TemporaryAWSCredentialsProvider") {
    val m = S3Conf.sessionConfigs("eu-west-2", Some("AK"), Some("SK"), Some("TOK"))
    assert(m("spark.hadoop.fs.s3a.aws.credentials.provider")
      == "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider")
    assert(m("spark.hadoop.fs.s3a.session.token") == "TOK")
  }
  test("no keys fall back to DefaultAWSCredentialsProviderChain") {
    val m = S3Conf.sessionConfigs("eu-west-2")
    assert(m("spark.hadoop.fs.s3a.aws.credentials.provider")
      == "com.amazonaws.auth.DefaultAWSCredentialsProviderChain")
    assert(m("spark.hadoop.fs.s3a.region") == "eu-west-2")
  }
  test("path-style inferred true for non-AWS endpoints, absent without endpoint") {
    val m1 = S3Conf.sessionConfigs("r", endpoint = Some("minio.local:9000"))
    assert(m1("spark.hadoop.fs.s3a.path.style.access") == "true")
    val m2 = S3Conf.sessionConfigs("r", endpoint = Some("s3.eu-west-2.AMAZONAWS.com"))
    assert(m2("spark.hadoop.fs.s3a.path.style.access") == "false")
    val m3 = S3Conf.sessionConfigs("r")
    assert(!m3.contains("spark.hadoop.fs.s3a.path.style.access"))
  }
  test("explicit path-style overrides inference; ssl flag maps through") {
    val m = S3Conf.sessionConfigs("r", endpoint = Some("minio.local:9000"),
      pathStyle = Some(false), sslEnabled = Some(false))
    assert(m("spark.hadoop.fs.s3a.path.style.access") == "false")
    assert(m("spark.hadoop.fs.s3a.connection.ssl.enabled") == "false")
  }
}
