package graft.model

import java.sql.Timestamp

/** Typed views over the driver-generated TPC-H-ish test tables
  * (see /root/repo/TESTDATA.md). Field names match parquet columns
  * exactly so `as[T]` binds by name.
  */
case class Order(
    o_orderkey: Long,
    o_custkey: Long,
    o_orderstatus: String,
    o_totalprice: Double,
    o_orderdate: Timestamp,
    o_orderpriority: String)

case class Doc(
    doc_id: Long,
    text: String,
    lang: String,
    source: String,
    n_chars: Long)

case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)
