package graft.conf

import java.net.URI

/** S6: the S3A filesystem configuration surface — a pure-function port of
  * the reference's most-tested code (`_normalize_s3_endpoint` +
  * `initialize_spark_session`, spark/app/spark_processing.py:17-114).
  *
  * Pure functions over strings → config maps, so the whole surface is unit
  * testable with no hadoop-aws jar and no network; a builder applies the
  * returned map via `SparkSession.builder.config(k, v)` on a real cluster.
  */
object S3Conf {

  /** Split an S3 endpoint into host[:port] and SSL preference.
    * Parity with `_normalize_s3_endpoint` (spark_processing.py:55-82),
    * including every rejection case its 14 pytest cases pin down:
    * scheme-less values pass through with no SSL opinion; http/https map
    * to an SSL preference; anything with a path/query/fragment or a
    * missing host is rejected. */
  def normalizeEndpoint(raw: String): (String, Option[Boolean]) = {
    if (raw == null)
      throw new IllegalArgumentException("S3 endpoint is required when normalization is requested")
    val value = raw.trim
    if (value.isEmpty)
      throw new IllegalArgumentException("S3 endpoint cannot be empty or whitespace")

    if (!value.contains("://")) {
      if (value.exists(ch => ch == '/' || ch == '?' || ch == '#'))
        throw new IllegalArgumentException(
          "S3 endpoint without scheme must not contain paths or queries")
      (value, None)
    } else {
      val parsed =
        try new URI(value)
        catch {
          case e: java.net.URISyntaxException =>
            throw new IllegalArgumentException(s"Invalid S3 endpoint: ${e.getMessage}")
        }
      val scheme = Option(parsed.getScheme).getOrElse("")
      if (scheme != "http" && scheme != "https")
        throw new IllegalArgumentException(s"Unsupported S3 endpoint scheme: $scheme")
      if (parsed.getHost == null)
        throw new IllegalArgumentException("S3 endpoint must include a hostname")
      if (parsed.getPath != null && parsed.getPath.nonEmpty)
        throw new IllegalArgumentException("S3 endpoint must not include a path component")
      if (parsed.getQuery != null || parsed.getFragment != null)
        throw new IllegalArgumentException(
          "S3 endpoint must not include params, query or fragment")
      (parsed.getAuthority, Some(scheme == "https"))
    }
  }

  /** The `spark.hadoop.fs.s3a.*` config map `initialize_spark_session`
    * (spark_processing.py:68-110) would apply: credential-provider
    * selection (static / temporary / default chain), region, endpoint,
    * path-style access (inferred non-AWS ⇒ true when unset), SSL. */
  def sessionConfigs(
      region: String,
      accessKey: Option[String] = None,
      secretKey: Option[String] = None,
      sessionToken: Option[String] = None,
      endpoint: Option[String] = None,
      pathStyle: Option[Boolean] = None,
      sslEnabled: Option[Boolean] = None): Map[String, String] = {

    val creds: Map[String, String] = (accessKey, secretKey) match {
      case (Some(ak), Some(sk)) =>
        val provider =
          if (sessionToken.isDefined)
            "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
          else
            "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider"
        Map(
          "spark.hadoop.fs.s3a.aws.credentials.provider" -> provider,
          "spark.hadoop.fs.s3a.access.key" -> ak,
          "spark.hadoop.fs.s3a.secret.key" -> sk,
        ) ++ sessionToken.map("spark.hadoop.fs.s3a.session.token" -> _)
      case _ =>
        Map("spark.hadoop.fs.s3a.aws.credentials.provider" ->
          "com.amazonaws.auth.DefaultAWSCredentialsProviderChain")
    }

    val effectivePathStyle: Option[Boolean] =
      pathStyle.orElse(endpoint.map(e => !e.toLowerCase.contains("amazonaws.com")))

    creds ++
      Map("spark.hadoop.fs.s3a.region" -> region) ++
      endpoint.map("spark.hadoop.fs.s3a.endpoint" -> _) ++
      effectivePathStyle.map(p => "spark.hadoop.fs.s3a.path.style.access" -> p.toString) ++
      sslEnabled.map(s => "spark.hadoop.fs.s3a.connection.ssl.enabled" -> s.toString)
  }
}
