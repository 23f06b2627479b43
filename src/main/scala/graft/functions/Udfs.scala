package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** UDF / UDAF / UDTF extension surface (SURVEY §2.9) — the Spark
  * counterparts of the reference's lambda/Converter/KSQL-UDF extension
  * points (`AbstractJoinIntegrationTest.java:118-123` lambdas,
  * `Utils.newConverter`, ksql-engine UDF registry).
  *
  * Note the preference order stated in SURVEY §7.3: built-in functions >
  * native Catalyst expressions > Scala UDFs. These registrations exist to
  * provide the *extension surface* (user-defined logic); the engine's own
  * operators never use UDFs in hot paths.
  */
object Udfs {

  /** U2: sum-of-squares UDAF via typed [[Aggregator]] (the KS
    * `Aggregator<K,V,VA>` analogue). Partial-aggregates map-side like any
    * built-in (Catalyst drives merge()).
    */
  val sumSq: Aggregator[Double, Double, Double] = new Aggregator[Double, Double, Double] {
    override def zero: Double = 0.0
    override def reduce(b: Double, a: Double): Double = b + a * a
    override def merge(b1: Double, b2: Double): Double = b1 + b2
    override def finish(r: Double): Double = r
    override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Register the user-function surface on a session:
    *  - U1 scalar UDF `title_case`
    *  - U2 UDAF `sumsq`
    *  - U3 (UDTF) is served by generators (`explode`/`posexplode`/LATERAL
    *    VIEW) over array-returning expressions — registered SQL-side for
    *    free; see `u3_udtf_posexplode` in ExtrasQueries.
    */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("title_case", (s: String) =>
      if (s == null || s.isEmpty) s else s.substring(0, 1).toUpperCase + s.substring(1))
    spark.udf.register("sumsq", udaf(sumSq))
  }
}
