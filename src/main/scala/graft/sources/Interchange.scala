package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's interchange contract (operators K2/S3, SURVEY §2.1-2.2):
  * headerless CSV, 12 positional columns, `id` first — written by pandas
  * `to_csv(header=False)` with the index as column 1
  * (airflow_dags.py:66-69) and consumed by a positional warehouse COPY
  * (`copy_options=["csv"]`, :287). Column ORDER is load-bearing; both
  * directions go through [[Ohlcv.columns]] so a drift is impossible.
  */
object Interchange {

  /** K2+K3: export a day's rows as headerless positional CSV at `path`
    * (overwrite-by-key semantics like S3Hook.load_file(replace=True),
    * airflow_dags.py:72-78).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.select(Ohlcv.columns.map(df.col): _*)
      .write.mode("overwrite").option("header", "false")
      // timestamps serialized in the pandas default shape the reference's
      // COPY consumed: no timezone suffix (values are UTC-naive).
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(path)

  /** S3→warehouse half: read the positional CSV back with the declared
    * schema (names assigned BY POSITION, like Redshift COPY).
    */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Ohlcv.tableSchema)
      .option("header", "false")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(path)
}
