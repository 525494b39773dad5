package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

import org.json4s._
import org.json4s.jackson.JsonMethods

/** jq-style JSON path expressions over string columns (ref
  * `daft/functions/str.py:56` `.jq(...)` — there backed by the jq crate).
  *
  * Supported subset (the overwhelmingly common forms in data pipelines):
  *  - identity `.`
  *  - field access `.foo`, chained `.foo.bar`
  *  - quoted fields `."Content-Type"` (any characters)
  *  - array index `.foo[2]` (negative from end), iteration `.foo[]`
  *  - pipes `.a | .b` (equivalent to `.a.b`)
  *
  * Output mirrors jq text output: each result rendered as compact JSON
  * (strings stay quoted), multiple results newline-joined, no match →
  * null. Evaluation is a pure scalar function — codegen-adjacent, no
  * shuffle, scales as a map. */
object Jq {

  private[functions] sealed trait Step
  private case class Field(name: String) extends Step
  private case class Index(i: Int) extends Step
  private case object IterateAll extends Step

  /** Parse a jq path expression into steps; throws on unsupported syntax. */
  private[functions] def parse(expr: String): List[Step] = {
    val steps = List.newBuilder[Step]
    var i = 0
    val s = expr.trim
    while (i < s.length) {
      s.charAt(i) match {
        case '|' | ' ' => i += 1 // pipes/whitespace: step chains compose
        case '.' =>
          i += 1
          if (i < s.length && s.charAt(i) == '"') { // ."quoted field"
            val end = s.indexOf('"', i + 1)
            require(end > 0, s"unterminated quoted field in: $expr")
            steps += Field(s.substring(i + 1, end))
            i = end + 1
          } else { // bare field (may be empty for identity / before '[')
            val start = i
            while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
            if (i > start) steps += Field(s.substring(start, i))
          }
        case '[' =>
          val end = s.indexOf(']', i)
          require(end > 0, s"unterminated index in: $expr")
          val body = s.substring(i + 1, end).trim
          if (body.isEmpty) steps += IterateAll
          else steps += Index(body.toInt)
          i = end + 1
        case c => throw new IllegalArgumentException(s"unsupported jq syntax '$c' in: $expr")
      }
    }
    steps.result()
  }

  private def evalSteps(v: JValue, steps: List[Step]): List[JValue] = steps match {
    case Nil => if (v == JNothing) Nil else List(v)
    case step :: rest =>
      val next: List[JValue] = step match {
        case Field(name) => v match {
          case JObject(fields) => fields.collectFirst { case (`name`, fv) => fv }.toList
          case JNull => List(JNull)
          case _ => Nil
        }
        case Index(i) => v match {
          case JArray(arr) =>
            val idx = if (i < 0) arr.length + i else i
            if (idx >= 0 && idx < arr.length) List(arr(idx)) else List(JNull)
          case _ => Nil
        }
        case IterateAll => v match {
          case JArray(arr) => arr
          case JObject(fields) => fields.map(_._2)
          case _ => Nil
        }
      }
      next.flatMap(evalSteps(_, rest))
  }

  /** Evaluate `expr` against a JSON document; jq-style text output. */
  def eval(json: String, expr: String): Option[String] = {
    if (json == null) return None
    val root =
      try JsonMethods.parse(json)
      catch { case _: Exception => return None }
    val results = evalSteps(root, parse(expr))
    if (results.isEmpty) None
    else Some(results.map(r => JsonMethods.compact(JsonMethods.render(r))).mkString("\n"))
  }

  /** Column form: `jq(col, ".meta.tags[0]")`. */
  def jq(json: Column, expr: String): Column = {
    val f = udf((s: String) => eval(s, expr))
    f(json)
  }
}
