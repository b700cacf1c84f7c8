package graft.model

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Typed `Dataset[T]` surface over the testdata tables — compile-time field
  * checks for pipeline code where schema is static (the brief's
  * "Dataset[T] where type safety helps"; DataFrame stays the default for
  * dynamic-schema paths). Encoders are derived from the case classes.
  */
object Typed {

  case class Event(event_id: Long, ts: java.time.LocalDateTime, user_id: Long,
                   event_type: String, value: Double, props: String)
  case class Doc(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)
  case class UserSpend(user_id: Long, n_events: Long, total: Double, biggest: Double)

  def events(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    Tables.events(spark, dir).as[Event]
  }

  def documents(spark: SparkSession, dir: String): Dataset[Doc] = {
    import spark.implicits._
    Tables.documents(spark, dir).as[Doc]
  }

  /** Typed groupByKey aggregation: spend per user. The lambda-free agg
    * columns keep it inside codegen despite the typed key extraction. */
  def userSpend(spark: SparkSession, dir: String): Dataset[UserSpend] = {
    import spark.implicits._
    events(spark, dir)
      .groupByKey(_.user_id)
      .agg(
        count("*").as[Long],
        sum($"value".cast("decimal(18,6)")).cast("double").as[Double],
        max($"value").as[Double])
      .map { case (uid, n, total, biggest) => UserSpend(uid, n, total, biggest) }
  }
}
