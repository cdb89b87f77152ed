package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over an event stream: for each user, the
  * earliest time each step completes, where step i counts only strictly
  * after step i-1 completed (the standard product-analytics conversion
  * funnel — view -> click -> purchase).
  *
  * Scale shape: ONE shuffle (groupBy user), then a per-user fold over the
  * time-sorted event list with `array_sort` + `aggregate` — all
  * codegen'd builtins, no UDF, no self-joins (the naive k-step funnel is
  * k-1 self-joins of a 100 TB event table; this is one). State per user is
  * k longs; list size is the user's event count, the same bound
  * sessionization already carries. The fold's first-qualifying-event
  * semantics equal min-after-predecessor semantics regardless of
  * equal-timestamp sort ties, because every event is examined and equal
  * candidates produce the same minimum.
  *
  * `tsCol` resolves through [[TimeCols]]: integral columns pass through
  * in the caller's unit (any monotone unit works — call sites here pass
  * `unix_micros` longs), timestamp columns convert exactly to epoch
  * microseconds. Latencies are reported in that resolved unit.
  */
object Funnel {

  /** Per-user funnel times: `(user, t1..tk)` — `t_i` is null if the user
    * never completed step i (strictly after step i-1). */
  def userFunnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val k = steps.size
    val zero = struct((1 to k).map(i => lit(null).cast("long").as(s"t$i")): _*)
    val seq = array_sort(collect_list(struct(
      TimeCols.epochMicros(events, tsCol).as("ts"), col(s"`$typeCol`").as("tp"))))
    def merge(acc: Column, e: Column): Column = {
      val fields = (1 to k).map { i =>
        val hit =
          if (i == 1) when(e("tp") === steps(0), e("ts"))
          else when(e("tp") === steps(i - 1) && acc(s"t${i - 1}").isNotNull &&
            e("ts") > acc(s"t${i - 1}"), e("ts"))
        coalesce(acc(s"t$i"), hit).as(s"t$i")
      }
      struct(fields: _*)
    }
    events.groupBy(col(s"`$userCol`").as(userCol))
      .agg(aggregate(seq, zero, merge).as("f"))
      .select(col(userCol) +: (1 to k).map(i => col(s"f.t$i").as(s"t$i")): _*)
  }

  /** Funnel conversion report: per-step completion counts plus summed
    * step latencies (in the input's time unit). */
  def report(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    val k = steps.size
    val perUser = userFunnel(events, userCol, tsCol, typeCol, steps)
    val stepCounts = (1 to k).map(i => count(col(s"t$i")).as(s"n_step$i"))
    val latencies = (2 to k).map(i =>
      coalesce(sum(col(s"t$i") - col("t1")), lit(0L)).cast("long").as(s"lat1${i}_sum"))
    val lastUsers = coalesce(sum(when(col(s"t$k").isNotNull, col(s"`$userCol`"))), lit(0L))
      .cast("long").as("converted_user_sum")
    perUser.agg(count(lit(1)).as("n_users"), (stepCounts ++ latencies :+ lastUsers): _*)
  }

  /** Per-user event-transition counts — the first-order Markov matrix of
    * the behavior stream (`prev_type -> next_type`), the data prep for
    * next-event prediction and for spotting broken product flows. Each
    * user's event sequence is ordered by `(tsCol, tieCols...)`; adjacent
    * pairs are counted and each transition gets its integer per-origin
    * share (`n * 10000 div total-from-prev`).
    *
    * Scale shape: ONE shuffle — the per-user sort window (lag over the
    * user partition, the sessionization bound); transition pairs then
    * aggregate map-side into at most |event types|² rows, and the
    * per-origin share is a window over that type-pair frame — metadata-
    * sized at any corpus. No self-join of the event table.
    *
    * `tsCol` may be integral or timestamp (ordering is on the raw column,
    * which sorts identically either way); add `tieCols` (e.g. the event
    * id) to make equal-timestamp ordering — and thus the matrix —
    * deterministic. */
  def transitionCounts(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, tieCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = (col(s"`$tsCol`") +: tieCols.map(c => col(s"`$c`"))).map(_.asc)
    val w = Window.partitionBy(col(s"`$userCol`")).orderBy(order: _*)
    val pairs = events
      .withColumn("__next", lead(col(s"`$typeCol`"), 1).over(w))
      .where(col("__next").isNotNull)
      .groupBy(col(s"`$typeCol`").as("prev_type"), col("__next").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val byPrev = Window.partitionBy(col("prev_type"))
    pairs
      .withColumn("__tot", sum(col("n")).over(byPrev))
      .select(col("prev_type"), col("next_type"), col("n"),
        expr("n * 10000 div __tot").as("share_x1e4"))
  }
}
