package graft.functions

/** UDF error policy + bounded retries (ref `daft/udf/udf_v2.py:84-124`:
  * `udf(max_retries=, on_error=)` applies to any user function).
  *
  * `onError`:
  *  - "raise": propagate the last failure after `maxRetries` re-attempts
  *    (the reference default);
  *  - "log": degrade the row to null, noting the failure on stderr first;
  *  - "ignore": degrade the row to null silently.
  *
  * Retries are per-ROW (the reference re-invokes the function on the same
  * input), so a transient failure inside a 100 TB scan costs one extra
  * call on the affected row, never a task or stage retry. Wrap with
  * `org.apache.spark.sql.functions.udf(ResilientUdf.resilient(f, ...))` —
  * the Option return maps to a nullable column. */
object ResilientUdf {

  def resilient[I, O](f: I => O, maxRetries: Int = 0,
      onError: String = "raise"): I => Option[O] = {
    require(maxRetries >= 0, s"max_retries must be >= 0, got $maxRetries")
    require(Set("raise", "log", "ignore")(onError),
      s"on_error must be raise|log|ignore, got '$onError'")
    (in: I) => {
      var attempt = 0
      var out: Option[O] = None
      var last: Throwable = null
      var done = false
      while (!done && attempt <= maxRetries) {
        try { out = Some(f(in)); done = true }
        catch {
          case scala.util.control.NonFatal(e) => last = e; attempt += 1
        }
      }
      if (done) out
      else onError match {
        case "raise" => throw last
        case "log" =>
          System.err.println(
            s"[graft] udf failed after ${maxRetries + 1} attempts: $last")
          None
        case _ => None
      }
    }
  }

  /** Two-argument variant. */
  def resilient2[A, B, O](f: (A, B) => O, maxRetries: Int = 0,
      onError: String = "raise"): (A, B) => Option[O] = {
    val g = resilient[(A, B), O]({ case (a, b) => f(a, b) }, maxRetries, onError)
    (a: A, b: B) => g((a, b))
  }
}
