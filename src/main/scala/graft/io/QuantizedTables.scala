package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Quantized-table sinks/sources — the Spark analogue of the reference's
  * vecbin converters (`tools/nvdb_convert_f16.cpp`, `apps/nvdb_quantize_i8
  * .cpp`): storage-format ladder FP32 → FP16 bits → INT8+scale as parquet
  * schemas, with scoring fused against the stored representation (no
  * re-materialization of f32 at scan time).
  */
object QuantizedTables {

  /** (id, vec f32) → (id, bits array<smallint>) parquet. */
  def writeF16(base: DataFrame, path: String, idCol: String = "id",
               vecCol: String = "vec"): Unit =
    base.select(col(idCol), VectorFunctions.halfEncode(col(vecCol)).as("bits"))
      .write.mode("overwrite").parquet(path)

  def readF16(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)

  /** (id, vec f32) → (id, codes array<tinyint>, scale float) parquet. */
  def writeI8(base: DataFrame, path: String, idCol: String = "id",
              vecCol: String = "vec"): Unit =
    base.select(col(idCol), VectorFunctions.quantizeI8(col(vecCol)).as("q"))
      .select(col(idCol), col("q.codes").as("codes"), col("q.scale").as("scale"))
      .write.mode("overwrite").parquet(path)

  def readI8(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
}
