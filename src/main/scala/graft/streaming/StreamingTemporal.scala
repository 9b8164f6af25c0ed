package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** Stream-stream temporal joins.
  *
  * A true streaming as-of (exactly one best match per probe) is not
  * expressible with bounded state in append mode — a later-arriving but
  * closer match can always invalidate an emitted pick. The bounded-state
  * streaming counterpart is the event-time INTERVAL join: emit every
  * right-side event of the same key within a bounded lookback window of
  * the left event. Both sides carry watermarks and the range condition
  * gives Spark the state-retention bound — buffered rows expire once the
  * watermark passes their window, so state is O(events within lookback),
  * not O(stream). Downstream, "best match" semantics (max rightTs per left
  * event) are a batch/update-mode aggregation over the join's output.
  */
object StreamingTemporal {

  /** Left events joined to right events of the same key with
    * `rightTs` in [`leftTs` - lookback, `leftTs`] (backward lookback;
    * equal timestamps match). Column names must be disjoint across the
    * two inputs apart from the join semantics expressed through
    * `leftKey`/`rightKey` — pre-alias on the way in. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      lookback: String, watermarkDelay: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    l.join(r, expr(
      s"$leftKey = $rightKey AND " +
        s"$rightTs BETWEEN $leftTs - INTERVAL $lookback AND $leftTs"))
  }
}
