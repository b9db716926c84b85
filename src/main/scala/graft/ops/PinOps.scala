package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Parcel-identifier (PIN) normalization column algebra.
  *
  * Re-expresses the reference's PIN string munging as pure Catalyst column
  * expressions (codegen'd, no UDFs):
  *   - strip hyphens / non-digits   (reference: chicago/permit_cleaning.py:617,
  *     chicago/legacy_permits/helper.py:43-44)
  *   - pad 10-digit PINs to 14      (chicago/permit_cleaning.py:620-629)
  *   - normalize 9/10/13-digit PINs (chicago/legacy_permits/helper.py:42-58,
  *     helper.R:66-83)
  *   - zero-fill to 14              (chicago/permit_cleaning.py:438,:446,:1007)
  *   - hyphenate XX-XX-XXX-XXX-XXXX (chicago/permit_cleaning.py:1129)
  *
  * All functions are null-aware where the reference is (padPin maps null to
  * the empty string, matching pandas' `pad_pin`); everything else propagates
  * null like the source columns do.
  */
object PinOps {

  /** Remove literal hyphens (pandas `str.replace("-", "")`, literal mode). */
  def stripHyphens(c: Column): Column = replace(c, lit("-"), lit(""))

  /** Keep digit characters only (reference `filter(str.isdigit)`). */
  def stripNonDigits(c: Column): Column = regexp_replace(c, "[^0-9]", "")

  /** 10-digit PIN -> append "0000"; null -> ""; anything else unchanged.
    * Twin of `pad_pin` (chicago/permit_cleaning.py:620-629).
    */
  def padPin(c: Column): Column =
    when(c.isNull, lit(""))
      .when(length(c) === 10, concat(c, lit("0000")))
      .otherwise(c)

  /** Normalize common short PIN shapes to canonical 14 digits:
    * 13 -> prepend "0"; 10 -> append "0000"; 9 -> both.
    * R twin (helper.R:66-83): strips HYPHENS only, NA propagates — the
    * variant the R legacy backfill scripts run. Unrecognized lengths pass
    * through unchanged (the validators catch them downstream).
    */
  def normalizePin(c: Column): Column = {
    val d = stripHyphens(c)
    when(c.isNull, lit(null))
      .when(length(d) === 13, concat(lit("0"), d))
      .when(length(d) === 10, concat(d, lit("0000")))
      .when(length(d) === 9, concat(lit("0"), d, lit("0000")))
      .otherwise(d)
  }

  /** py twin (helper.py:42-58), the variant the review-ingestion flow runs:
    * strips ALL non-digit characters, and `str(nan)` means null normalizes
    * to the empty string rather than propagating.
    */
  def normalizePinPy(c: Column): Column = {
    val d = stripNonDigits(coalesce(c, lit("")))
    when(length(d) === 13, concat(lit("0"), d))
      .when(length(d) === 10, concat(d, lit("0000")))
      .when(length(d) === 9, concat(lit("0"), d, lit("0000")))
      .otherwise(d)
  }

  /** Left-pad with zeros to 14 (pandas `zfill(14)`). */
  def zfill14(c: Column): Column = lpad(c, 14, "0")

  /** Canonical membership key: strip hyphens then zfill(14)
    * (chicago/permit_cleaning.py:438,:446).
    */
  def membershipKey(c: Column): Column = zfill14(stripHyphens(coalesce(c, lit(""))))

  /** 14-digit PIN -> XX-XX-XXX-XXX-XXXX (chicago/permit_cleaning.py:1129). */
  def hyphenate(c: Column): Column =
    concat_ws(
      "-",
      substring(c, 1, 2),
      substring(c, 3, 2),
      substring(c, 5, 3),
      substring(c, 8, 3),
      substring(c, 11, 4)
    )
}
