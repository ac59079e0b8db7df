package graft.schema

import org.apache.spark.sql.types._

/** Declared schemas of the reference's stream hops (see FIXTURES.md).
  *
  * Tx schema = the Flink source DDL's 18 columns
  * (ref: resources/flink/main.py:58-78); envelope = the EventBridge entry
  * shape (ref: resources/services/ingestion-worker/lib.js:100-108,
  * resources/sagemaker/featurestore/source-schema.json:2-42); agg record =
  * the Flink sink DDL + feature-group features
  * (ref: resources/flink/main.py:90-95, agg-fg-schema.json:3-29).
  */
object Schemas {

  /** One blockchain transaction. `inputs`/`out` deliberately stay unparsed
    * strings — the reference types them VARCHAR (resources/flink/main.py:74-75). */
  val tx: StructType = StructType(Seq(
    StructField("hash", StringType, nullable = false),
    StructField("ver", IntegerType),
    StructField("vin_sz", IntegerType),
    StructField("vout_sz", IntegerType),
    StructField("size", IntegerType),
    StructField("weight", IntegerType),
    StructField("fee", IntegerType),
    StructField("relayed_by", StringType),
    StructField("lock_time", IntegerType),
    StructField("tx_index", LongType),
    StructField("double_spend", BooleanType),
    StructField("time", LongType),
    StructField("block_index", LongType),
    StructField("block_height", LongType),
    StructField("inputs", StringType),
    StructField("out", StringType),
    StructField("rbf", BooleanType)))

  /** EventBridge envelope wrapping a batch of txs. */
  val envelope: StructType = StructType(Seq(
    StructField("version", IntegerType),
    StructField("id", StringType),
    StructField("detail-type", StringType),
    StructField("source", StringType),
    StructField("account", LongType),
    StructField("time", StringType),
    StructField("region", StringType),
    StructField("resources", ArrayType(StringType)),
    StructField("detail", StructType(Seq(
      StructField("txs", ArrayType(tx)))))))

  /** Aggregate record / feature-store row. */
  val aggRecord: StructType = StructType(Seq(
    StructField("tx_minute", StringType, nullable = false),
    StructField("total_nb_trx_1min", LongType),
    StructField("total_fee_1min", LongType),
    StructField("avg_fee_1min", DoubleType),
    StructField("event_time", DoubleType)))
}
