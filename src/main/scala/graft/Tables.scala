package graft

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

/** Typed Dataset facade over the corpus tables (SURVEY.md §1.2): case
  * classes per table so library users get compile-time field checks; the
  * SQL layer (Catalog/Queries) is unaffected. Timestamps surface as
  * java.sql.Timestamp (µs precision — events.ts already normalized by
  * Catalog's ns→µs view). */
object Tables {
  case class Region(r_regionkey: Int, r_name: String)
  case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)
  case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
                      c_acctbal: Double, c_mktsegment: String)
  case class Supplier(s_suppkey: Long, s_name: String, s_nationkey: Int,
                      s_acctbal: Double)
  case class Part(p_partkey: Long, p_name: String, p_brand: String,
                  p_type: String, p_size: Int, p_retailprice: Double)
  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                   o_totalprice: Double, o_orderdate: java.sql.Timestamp,
                   o_orderpriority: String)
  case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
                      l_linenumber: Int, l_quantity: Double,
                      l_extendedprice: Double, l_discount: Double,
                      l_tax: Double, l_returnflag: String,
                      l_linestatus: String, l_shipdate: java.sql.Timestamp)
  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double, props: String)
  case class Document(doc_id: Long, text: String, lang: String,
                      source: String, n_chars: Long)
  case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  def region(spark: SparkSession, dir: String): Dataset[Region] =
    typed(spark, dir, "region")(Encoders.product[Region])
  def nation(spark: SparkSession, dir: String): Dataset[Nation] =
    typed(spark, dir, "nation")(Encoders.product[Nation])
  def customer(spark: SparkSession, dir: String): Dataset[Customer] =
    typed(spark, dir, "customer")(Encoders.product[Customer])
  def supplier(spark: SparkSession, dir: String): Dataset[Supplier] =
    typed(spark, dir, "supplier")(Encoders.product[Supplier])
  def part(spark: SparkSession, dir: String): Dataset[Part] =
    typed(spark, dir, "part")(Encoders.product[Part])
  def orders(spark: SparkSession, dir: String): Dataset[Order] =
    typed(spark, dir, "orders")(Encoders.product[Order])
  def lineitem(spark: SparkSession, dir: String): Dataset[Lineitem] =
    typed(spark, dir, "lineitem")(Encoders.product[Lineitem])
  def events(spark: SparkSession, dir: String): Dataset[Event] =
    typed(spark, dir, "events")(Encoders.product[Event])
  def documents(spark: SparkSession, dir: String): Dataset[Document] =
    typed(spark, dir, "documents")(Encoders.product[Document])
  def embeddings(spark: SparkSession, dir: String): Dataset[Embedding] =
    typed(spark, dir, "embeddings")(Encoders.product[Embedding])

  private def typed[T: org.apache.spark.sql.Encoder](
      spark: SparkSession, dir: String, name: String): Dataset[T] =
    Catalog.load(spark, dir, name).as[T]
}
