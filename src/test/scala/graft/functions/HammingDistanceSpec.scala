package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Custom codegen'd HammingDistance expression: DataFrame path, SQL
  * registry path, null handling, and codegen-vs-interpreted agreement.
  */
class HammingDistanceSpec extends SparkTestBase {

  test("hamming distance via Column, SQL, codegen and interpreter agree") {
    val session = spark
    import session.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      ("0000", "0000", 0),
      ("1010", "1001", 2),
      ("1111", "0000", 4),
      ("10", "1011", 2),   // length difference counts
      ("", "111", 3)
    ).toDF("a", "b", "want")

    // DataFrame API (codegen'd path).
    val viaColumn = df.select(col("want"),
      GraftFunctions.hamming(col("a"), col("b")).as("got"))
      .collect()
    viaColumn.foreach(r => assert(r.getInt(1) == r.getInt(0), r.toString))

    // SQL registry path.
    df.createOrReplaceTempView("hd")
    val viaSql = spark.sql("SELECT want, hamming(a, b) AS got FROM hd")
      .collect()
    viaSql.foreach(r => assert(r.getInt(1) == r.getInt(0), r.toString))

    // Interpreted eval (no codegen) must agree with the codegen result.
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(col("want"),
        GraftFunctions.hamming(col("a"), col("b")).as("got"))
        .collect()
      interp.foreach(r => assert(r.getInt(1) == r.getInt(0), r.toString))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("null inputs propagate null") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT hamming(CAST(NULL AS STRING), '101') AS d").head()
    assert(r.isNullAt(0))
  }
}
