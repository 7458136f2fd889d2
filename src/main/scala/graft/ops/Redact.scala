package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** PII redaction — the scrubbing pass a training-data pipeline runs before
  * anything else ships: replace emails / phone numbers / IPv4 addresses
  * with typed placeholder tokens and count what was removed (the counts
  * feed the pipeline's audit metrics). Reference analog: the cleaning
  * family's column scrubs (clean_flight_data's normalization passes,
  * src/data_processing.py) generalized to free text.
  *
  * Pure Catalyst `regexp_replace`/`regexp_count` — codegen'd, one narrow
  * projection, no shuffle, embarrassingly parallel at 100 TB. The regexes
  * are ASCII-conservative on purpose: identical semantics in Java regex
  * and RE2 (DuckDB), so the operator is oracle-verifiable end-to-end.
  */
object Redact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** Replace every email, then IPv4, then phone match with its placeholder.
    * Email runs first (its local part may contain digits a later pattern
    * would bite into); IP before phone so dotted quads never half-match
    * the phone pattern. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, lit(EmailRe), lit("[EMAIL]")),
        lit(Ipv4Re), lit("[IP]")),
      lit(PhoneRe), lit("[PHONE]"))

  /** Per-doc redaction audit: counts per PII class (pre-redaction) plus
    * the scrubbed text. */
  def redactionAudit(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(
      col(idCol),
      regexp_count(col(textCol), lit(EmailRe)).cast("long").as("n_email"),
      regexp_count(col(textCol), lit(Ipv4Re)).cast("long").as("n_ip"),
      regexp_count(col(textCol), lit(PhoneRe)).cast("long").as("n_phone"),
      redactPii(col(textCol)).as("redacted"))

  // ── q68: redaction over the corpus with DETERMINISTIC synthetic PII —
  //        the fixture corpus contains no digits or @-signs (probed), so
  //        the query first enriches each doc with an email, a phone, and
  //        an IP derived from doc_id, mirrored token-for-token in the
  //        oracle SQL (same move as the sha-twin queries: fabricate the
  //        input deterministically IN the query, then oracle the whole
  //        pipeline).
  def q68(s: SparkSession, dir: String): DataFrame = {
    val enriched = documents(s, dir).select(
      col("doc_id"),
      concat(
        col("text"), lit(" contact user"), col("doc_id"),
        lit("@mail.example tel 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" from 10."), (col("doc_id") % 256).cast("string"),
        lit(".0."), (col("doc_id") % 100).cast("string")).as("text"))
    redactionAudit(enriched, "text", "doc_id")
      .orderBy(col("doc_id"))
  }

  val q68Sql: String =
    """WITH e AS (
      |  SELECT doc_id,
      |    text || ' contact user' || doc_id || '@mail.example tel 555-' ||
      |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' from 10.' ||
      |    (doc_id % 256) || '.0.' || (doc_id % 100) AS text
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
      |  CAST(len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
      |  CAST(len(regexp_extract_all(text, '\b\d{3}-\d{4}\b')) AS BIGINT) AS n_phone,
      |  regexp_replace(
      |    regexp_replace(
      |      regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
      |    '\b\d{3}-\d{4}\b', '[PHONE]', 'g') AS redacted
      |FROM e ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_pii_redaction" -> q68)

  val oracle: Map[String, String] = Map(
    "q68_pii_redaction" -> q68Sql)
}
