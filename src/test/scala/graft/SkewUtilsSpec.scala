package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewUtils

class SkewUtilsSpec extends SparkSpec {
  import spark.implicits._

  test("salted aggregation equals direct aggregation on skewed data") {
    // one hot key with 10k rows, many cold keys
    val hot = (1 to 10000).map(i => ("hot", i.toDouble / 100))
    val cold = (1 to 500).map(i => (s"k$i", i.toDouble))
    val df = spark.createDataset(hot ++ cold).toDF("key", "value").repartition(8)

    val direct = df.groupBy("key")
      .agg(sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_v"),
        count("*").as("cnt"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap

    val salted = SkewUtils.saltedSumCount(df, col("key"), col("value"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap

    assert(salted == direct)
    assert(salted("hot")._2 == 10000L)
  }

  test("stage-1 spread: hot key occupies multiple salt groups") {
    val hot = (1 to 5000).map(i => ("hot", i.toDouble))
    val df = spark.createDataset(hot).toDF("key", "value").repartition(8)
    val groups = df.select(col("key"),
        pmod(hash(col("value"), spark_partition_id()), lit(32)).as("salt"))
      .distinct().count()
    assert(groups > 16, s"expected the hot key spread over many salts, got $groups")
  }
}
