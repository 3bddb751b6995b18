package graft.ops

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** The REGISTERED streaming queries (graft.streaming.StreamQueries) are
  * oracle-gated in the driver roster; these pins additionally assert each
  * one equals its in-repo batch twin — stream ≡ batch proven without
  * leaving the JVM, so a DuckDB dialect drift can never mask a streaming
  * semantics drift. */
class StreamQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("ev_stream_tumbling equals the batch tumbling windows") {
    val streamed = run("ev_stream_tumbling")
    val batch = Events.tumbling(spark, TestSpark.sf)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("ev_stream_sessions equals the batch session windows") {
    val streamed = run("ev_stream_sessions")
    val batch = Events.sessions(spark, TestSpark.sf)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("ev_stream_markov pair counts equal the batch lead() transitions") {
    import org.apache.spark.sql.functions._
    val streamed = run("ev_stream_markov")
    val batch = Events.markovTransitions(spark, TestSpark.sf)
      .select(col("cur"), col("nxt"), col("n"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("ev_stream_topk equals the batch per-user top-3 window") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val streamed = run("ev_stream_topk")
    assert(streamed.count() > 0)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("value").desc, col("event_id"))
    val batch = graft.Tables.events(spark, TestSpark.sf)
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("user_id"), col("rk").cast("int").as("rk"),
        col("event_id"), col("value"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("ev_stream_log_commits: log-visible union of epochs equals the input") {
    import org.apache.spark.sql.functions._
    val streamed = run("ev_stream_log_commits")
    val batch = graft.Tables.events(spark, TestSpark.sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_id")).as("n_distinct"),
        sum(floor(col("value") * 100.0 + 0.5).cast("long")).cast("long")
          .as("cents"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("ev_stream_interval_join equals the batch interval self-join") {
    import org.apache.spark.sql.functions._
    val streamed = run("ev_stream_interval_join")
    val ev = graft.Tables.events(spark, TestSpark.sf)
    val batch = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"),
        col("event_id").as("c_id"))
      .join(ev.filter(col("event_type") === "view")
        .select(col("user_id").as("vu"), col("ts").as("vts"),
          col("event_id").as("v_id")),
        col("cu") === col("vu") &&
          col("vts") >= col("cts") - expr("INTERVAL 10 MINUTES") &&
          col("vts") <= col("cts"))
      .select(col("c_id"), col("v_id"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
