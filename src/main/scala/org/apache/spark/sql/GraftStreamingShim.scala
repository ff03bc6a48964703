package org.apache.spark.sql

/** DSv1 streaming `Source` implementations must return micro-batch
  * DataFrames tagged `isStreaming = true`; the only constructor for that
  * tag is `SparkSession.internalCreateDataFrame`, which is
  * `private[sql]` — the same call Spark's own `FileStreamSource` makes
  * when it materializes a file micro-batch. This object is the single,
  * documented crossing of that package boundary for the graft lake
  * streaming source ([[graft.mor.MorStreamSource]]); nothing else in the
  * repo reaches into Spark internals this way. */
object GraftStreamingShim {
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cs.internalCreateDataFrame(df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
