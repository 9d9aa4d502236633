package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Bolt

/** The `cypher` output's Spark layer
  * (internal/impl/cypher/output.go: `query` + `args_mapping` per
  * message batch against any Bolt-speaking graph database) plus a
  * read-back path for verification.
  *
  * Scale shape: one Bolt connection per partition, messages stream
  * through it as parameterized autocommit statements — the
  * executor-side fan-out of the reference's batched writer. The read
  * path is a driver-side RUN/PULL admission (one result stream, like
  * every single-cursor source) distributed after materialization.
  */
object CypherGraph {

  /** Execute `query` once per row; `args` name → column resolves the
    * reference's args_mapping result.
    */
  def write(df: DataFrame, host: String, port: Int, user: String,
            password: String, query: String,
            args: Seq[(String, Column)], db: String = ""): Unit = {
    val prepared = df.select(args.map { case (n, c) => c.as(n) }: _*)
    val names = args.map(_._1)
    prepared.rdd.foreachPartition { it =>
      if (it.hasNext) {
        val conn = Bolt.connect(host, port, user, password)
        try {
          it.foreach { r =>
            val params = names.zipWithIndex.map { case (n, i) =>
              n -> r.get(i)
            }.toMap[String, Any]
            conn.run(query, params, db)
          }
        } finally conn.close()
      }
    }
  }

  /** Config-form variant: `argsJsonCol` carries the args_mapping
    * result as a JSON object per row; fields become Bolt parameters
    * with JSON-native typing (long/double/string/bool/null).
    */
  def writeJsonArgs(df: DataFrame, host: String, port: Int, user: String,
                    password: String, query: String, argsJsonCol: Column,
                    db: String = ""): Unit = {
    val prepared = df.select(argsJsonCol.cast("string").as("a"))
    prepared.rdd.foreachPartition { it =>
      if (it.hasNext) {
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val conn = Bolt.connect(host, port, user, password)
        try {
          it.foreach { r =>
            val node = mapper.readTree(r.getString(0))
            val params = scala.collection.mutable.Map.empty[String, Any]
            node.properties().forEach { e =>
              val v = e.getValue
              params(e.getKey) =
                if (v.isNull) null
                else if (v.isBoolean) v.asBoolean
                else if (v.isIntegralNumber) v.asLong
                else if (v.isNumber) v.asDouble
                else if (v.isTextual) v.asText
                else v.toString
            }
            conn.run(query, params.toMap, db)
          }
        } finally conn.close()
      }
    }
  }

  /** Driver RUN/PULL of a read query → DataFrame (schema from the
    * declared DDL; Bolt longs/doubles/strings/bools map directly).
    */
  def read(spark: SparkSession, host: String, port: Int, user: String,
           password: String, query: String, ddlSchema: String,
           db: String = ""): DataFrame = {
    val conn = Bolt.connect(host, port, user, password)
    val (_, rows) =
      try conn.run(query, Map.empty, db)
      finally conn.close()
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddlSchema)
    val converted = rows.map { r =>
      Row.fromSeq(r.zip(schema.fields).map {
        case (v: Long, f) if f.dataType ==
          org.apache.spark.sql.types.IntegerType => v.toInt
        case (v: Long, f) if f.dataType ==
          org.apache.spark.sql.types.DoubleType => v.toDouble
        case (v, _) => v
      })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(converted,
        math.max(1, math.min(rows.size, 8))), schema)
  }
}
