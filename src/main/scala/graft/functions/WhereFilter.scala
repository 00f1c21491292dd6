package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Chroma `where`-filter DSL → Catalyst [[Column]] translation (SURVEY
  * §2.A7 API parity). The reference threads these dicts verbatim from
  * the HTTP layer into Chroma (`README.md:186-193` `{"doc_name":
  * {"$eq": "specific.pdf"}}`, `vector_store.py:60-62` bare-equality
  * `{"doc_name": doc_name}`); here the same JSON becomes an ordinary
  * pushdown-able predicate, so a metadata filter prunes parquet row
  * groups instead of post-filtering candidates.
  *
  * Supported grammar (Chroma's public operator set):
  *   - bare equality   `{"field": value}`
  *   - comparison      `{"field": {"$eq"|"$ne"|"$gt"|"$gte"|"$lt"|"$lte": value}}`
  *   - membership      `{"field": {"$in": [v...]}}`, `{"$nin": [v...]}`
  *   - substring       `{"field": {"$contains"|"$not_contains": "str"}}`
  *   - logical         `{"$and": [f...]}`, `{"$or": [f...]}`
  *   - several top-level keys combine as AND.
  *
  * Chroma exposes `$contains`/`$not_contains` through the separate
  * `where_document` parameter whose operators are TOP-LEVEL (no field —
  * they always target the document text): [[parseDocument]] accepts that
  * exact wire shape and binds the operators to a caller-chosen text
  * column.
  *
  * Unknown operators and malformed shapes throw IllegalArgumentException
  * (the reference surfaces Chroma's error the same way). */
object WhereFilter {

  /** Parse a where-dict JSON string to a filter Column. */
  def parse(json: String): Column =
    try toColumn(JsonMethods.parse(json))
    catch {
      case e: IllegalArgumentException => throw e
      case e: Exception =>
        throw new IllegalArgumentException(s"Malformed where filter: ${e.getMessage}", e)
    }

  /** Parse a Chroma `where_document` dict — `{"$contains": "str"}`,
    * `{"$not_contains": "str"}`, `{"$and"|"$or": [...]}` — against the
    * given document-text column. */
  def parseDocument(json: String, textCol: String): Column =
    try docColumn(JsonMethods.parse(json), textCol)
    catch {
      case e: IllegalArgumentException => throw e
      case e: Exception =>
        throw new IllegalArgumentException(s"Malformed where_document filter: ${e.getMessage}", e)
    }

  private def docColumn(j: JValue, textCol: String): Column = j match {
    // Chroma requires exactly ONE operator per where_document dict (it
    // rejects {"$contains": ..., "$not_contains": ...}); match that so
    // malformed wire filters fail here the same way they fail there
    case JObject(field :: Nil) =>
      field match {
        case ("$and", JArray(fs)) if fs.nonEmpty => fs.map(docColumn(_, textCol)).reduce(_ && _)
        case ("$or", JArray(fs)) if fs.nonEmpty  => fs.map(docColumn(_, textCol)).reduce(_ || _)
        case (op @ ("$and" | "$or"), _) =>
          throw new IllegalArgumentException(s"$op expects a non-empty array of filters")
        case (op @ ("$contains" | "$not_contains"), v) => opColumn(textCol, op, v)
        case (other, _) =>
          throw new IllegalArgumentException(
            s"Unsupported where_document operator '$other' " +
              "(expected $contains/$not_contains/$and/$or)")
      }
    case other =>
      throw new IllegalArgumentException(
        "where_document filter must be an object with exactly one " +
          s"operator, got: $other")
  }

  def toColumn(j: JValue): Column = j match {
    case JObject(fields) if fields.nonEmpty =>
      fields.map {
        case ("$and", JArray(fs)) if fs.nonEmpty => fs.map(toColumn).reduce(_ && _)
        case ("$or", JArray(fs)) if fs.nonEmpty  => fs.map(toColumn).reduce(_ || _)
        case (op @ ("$and" | "$or"), _) =>
          throw new IllegalArgumentException(s"$op expects a non-empty array of filters")
        case (field, JObject(ops)) if ops.nonEmpty && ops.forall(_._1.startsWith("$")) =>
          ops.map { case (op, v) => opColumn(field, op, v) }.reduce(_ && _)
        case (field, v) => col(field) === lit(scalar(v))
      }.reduce(_ && _)
    case other =>
      throw new IllegalArgumentException(s"Where filter must be a non-empty object, got: $other")
  }

  private def opColumn(field: String, op: String, v: JValue): Column = op match {
    case "$eq"  => col(field) === lit(scalar(v))
    case "$ne"  => col(field) =!= lit(scalar(v))
    case "$gt"  => col(field) > lit(scalar(v))
    case "$gte" => col(field) >= lit(scalar(v))
    case "$lt"  => col(field) < lit(scalar(v))
    case "$lte" => col(field) <= lit(scalar(v))
    case "$in"  => col(field).isin(values(v): _*)
    case "$nin" => !col(field).isin(values(v): _*)
    case "$contains"     => col(field).contains(lit(string(v, op)))
    case "$not_contains" => !col(field).contains(lit(string(v, op)))
    case other =>
      throw new IllegalArgumentException(
        s"Unsupported where operator '$other' on field '$field' " +
          "(expected $eq/$ne/$gt/$gte/$lt/$lte/$in/$nin/$contains/$not_contains)")
  }

  private def string(v: JValue, op: String): String = v match {
    case JString(s) => s
    case other =>
      throw new IllegalArgumentException(s"$op expects a string, got: $other")
  }

  private def values(v: JValue): Seq[Any] = v match {
    case JArray(xs) if xs.nonEmpty => xs.map(scalar)
    case other =>
      throw new IllegalArgumentException(s"$$in/$$nin expect a non-empty array, got: $other")
  }

  private def scalar(v: JValue): Any = v match {
    case JString(s)  => s
    case JInt(i)     =>
      if (!i.isValidLong) // BigInt.toLong would silently wrap → wrong filter
        throw new IllegalArgumentException(s"Integer filter value out of range: $i")
      i.toLong
    case JLong(l)    => l
    case JDouble(d)  => d
    case JDecimal(d) => d.toDouble
    case JBool(b)    => b
    case other =>
      throw new IllegalArgumentException(s"Expected a scalar filter value, got: $other")
  }
}
