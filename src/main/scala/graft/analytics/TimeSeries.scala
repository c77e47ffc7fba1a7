package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time-series scalar helpers shared by the event-stream queries. */
object TimeSeries {

  /** EWMA of an ordered window list: `EWMA_t = αx_t + (1-α)EWMA_{t-1}`
    * seeded with the first element, computed as an explicit left fold
    * (`aggregate`) so the op sequence is the identical IEEE chain in
    * Spark and a `list_reduce` SQL mirror — no pow/exp, so raw doubles
    * hash-match across engines with no quantization. Null for an
    * empty/null list. */
  def ewmaFold(vals: Column, alpha: Double): Column =
    aggregate(
      slice(vals, lit(2), greatest(size(vals) - 1, lit(0))),
      try_element_at(vals, lit(1)),
      (acc, x) => lit(alpha) * x + lit(1.0 - alpha) * acc)
}
