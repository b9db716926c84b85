package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text / string column algebra from the reference surface (SURVEY.md §2.9).
  *
  * Everything here is built-in-function composition (whole-stage codegen
  * friendly); none of it needs a UDF.
  */
object TextOps {

  /** Ordered applicant-name abbreviation map. Order matters: the reference
    * applies these sequentially with `replace(..., regex=True)`
    * (chicago/permit_cleaning.py:668-689) so e.g. APARTMENT fires inside
    * APARTMENTS before APARTMENTS is ever consulted.
    */
  val Abbreviations: Seq[(String, String)] = Seq(
    "ASSOCIATION" -> "ASSN",
    "COMPANY" -> "CO",
    "BUILDING" -> "BLDG",
    "FOUNDATION" -> "FNDN",
    "ILLINOIS" -> "IL",
    "STREET" -> "ST",
    "BOULEVARD" -> "BLVD",
    "AVENUE" -> "AVE",
    "APARTMENT" -> "APT",
    "APARTMENTS" -> "APTS",
    "MANAGEMENT" -> "MGMT",
    "CORPORATION" -> "CORP",
    "INCORPORATED" -> "INC",
    "LIMITED" -> "LTD",
    "PLAZA" -> "PLZ"
  )

  /** Sequential literal-substring rewrite in `Abbreviations` order
    * (chicago/permit_cleaning.py:668-689).
    */
  def abbreviationFold(c: Column): Column =
    Abbreviations.foldLeft(c) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to))
    }

  /** The reference's 38-term assessability lexicon, in document order
    * (chicago/permit_cleaning.py:707-746).
    */
  val Keywords: Seq[String] = Seq(
    "Addition", "Elevator", "Window", "Construction", "Garage", "Roof",
    "Demolition", "HVAC", "Flatwork", "Expand", "Basement", "Alarm", "Fire",
    "Bathroom", "Solar", "New", "Attic", "Vacant", "Conversion", "Rehab",
    "Enclosed porch", "Alteration", "EFP", "ADU", "A.D.U.", "Coach",
    "Accessory", "Extension", "Dormer", "Erect", "Proposed", "Wreck",
    "Finish", "Rec Room", "Convert", "Recreation room", "Sun Room", "Season"
  )

  /** Case-insensitive substring keyword tagging: comma-joined matched terms
    * in lexicon order (chicago/permit_cleaning.py:810-816). `concat_ws` over
    * per-term `when(contains)` slots (unfired slots are null, which concat_ws
    * skips) — stays inside whole-stage codegen, unlike an `array`+`filter`
    * HOF formulation whose lambda is interpreted per element.
    */
  def keywordTag(textCol: Column, lexicon: Seq[String] = Keywords): Column = {
    val lowered = lower(coalesce(textCol, lit("")))
    concat_ws(", ", lexicon.map(k => when(lowered.contains(k.toLowerCase), lit(k))): _*)
  }

  /** Staged [[keywordTag]]: the lowered text is materialized as an attribute
    * first so the per-keyword `contains` probes it instead of re-lowering the
    * text once per lexicon term (38× on the default lexicon — decisive on
    * long descriptions).
    */
  def withKeywordTag(
      df: org.apache.spark.sql.DataFrame,
      textCol: Column,
      outName: String,
      lexicon: Seq[String] = Keywords
  ): org.apache.spark.sql.DataFrame =
    df.withColumn("__kw_lowered", lower(coalesce(textCol, lit(""))))
      .withColumn(
        outName,
        concat_ws(", ", lexicon.map(k => when(col("__kw_lowered").contains(k.toLowerCase), lit(k))): _*)
      )
      .drop("__kw_lowered")

  /** pandas `" ".join` address concat after fillna("") — KEEPS empty slots
    * (double spaces possible), unlike concat_ws
    * (chicago/permit_cleaning.py:635-637; SURVEY.md §1.3 NA semantics).
    */
  def addressConcat(parts: Column*): Column =
    parts.map(p => coalesce(p, lit(""))).reduceLeft((a, b) => concat(a, lit(" "), b))

  /** SmartFile description canonicalization: strip the special-char set then
    * truncate to 259 chars (chicago/permit_cleaning.py:865-871).
    */
  def smartfileCanon(c: Column): Column =
    substring(regexp_replace(c, """[():;+#*&'"@½]""", ""), 1, 259)

  /** `note2 + ",,CHICAGO, IL"` literal suffix (chicago/permit_cleaning.py:864). */
  def addrDedupeKey(c: Column): Column = concat(c, lit(",,CHICAGO, IL"))

  /** F12: reviewer-facing PIN hyperlink formula synthesis — exact twin of
    * make_pin_hyperlink (chicago/permit_cleaning.py:796-806): null ->
    * "NO PIN FOUND"; strip non-digits and if exactly 14 remain, an
    * =HYPERLINK() to the assessor PIN page displaying the ORIGINAL string;
    * anything else (comma-separated multi-PIN lists, empties) passes
    * through unchanged.
    */
  def pinHyperlink(pin: Column): Column = {
    val digits = regexp_replace(pin, "\\D", "")
    when(pin.isNull, lit("NO PIN FOUND"))
      .when(
        length(digits) === 14,
        concat(
          lit("=HYPERLINK(\"https://www.cookcountyassessoril.gov/pin/"),
          digits,
          lit("\", \""),
          pin,
          lit("\")")
        )
      )
      .otherwise(pin)
  }

  /** CookViewer address search link (chicago/permit_cleaning.py:783-790):
    * ", Chicago, IL" appended to the search; null address -> empty string.
    */
  def addressHyperlink(addr: Column): Column =
    when(addr.isNull, lit(""))
      .otherwise(
        concat(
          lit("=HYPERLINK(\"https://maps.cookcountyil.gov/cookviewer/?search="),
          addr,
          lit(", Chicago, IL\", \"Click here to open CookViewer\")")
        )
      )
}
