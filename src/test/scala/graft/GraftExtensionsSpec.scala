package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{SimHash64, VectorFunctions}
import graft.operators.{Dedup, TextOps}

/** SQL-registered engine functions agree with their Column-API forms. */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("registerAll: functions callable from spark.sql and ≡ Column API") {
    GraftFunctions.registerAll(spark)
    Seq(("x y z w a b", 1L)).toDF("text", "id").createOrReplaceTempView("t_ext")

    val viaSql = spark.sql(
      """SELECT simhash64(transform(split(text, ' '), s -> xxhash64(s))) AS sh,
        |       ngram_shingles(split(text, ' '), 3) AS ng
        |FROM t_ext""".stripMargin).collect()(0)
    val viaCol = Seq("x y z w a b").toDF("text").select(
      SimHash64.simhash64(TextOps.tokens(col("text"))).as("sh"),
      Dedup.shingles(col("text"), 3).as("ng")).collect()(0)
    assert(viaSql.getLong(0) == viaCol.getLong(0))
    assert(viaSql.getSeq[String](1) == viaCol.getSeq[String](1))
  }

  test("vec_dot / vec_norm from SQL") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, vec_norm(array(3.0D, 4.0D)) AS n")
      .collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
    val viaCol = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .select(VectorFunctions.dot(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(viaCol == 11.0)
  }

  test("count_in_set from SQL ≡ Column API; rejects non-literal word sets") {
    GraftFunctions.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT count_in_set(array('the','cat','the'), array('the','a')) AS c")
      .collect()(0).getInt(0)
    val viaCol = Seq(Seq("the", "cat", "the")).toDF("t")
      .select(TextOps.countInSet(col("t"), Seq("the", "a")).as("c"))
      .collect()(0).getInt(0)
    assert(viaSql == 2 && viaCol == 2)
    intercept[Exception] {
      spark.sql("SELECT count_in_set(array('x'), array(concat('a', rand()::string)))").collect()
    }
  }

  test("md5_hash48 from SQL ≡ Column API ≡ hex/conv twin") {
    GraftFunctions.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT md5_hash48(cast('hello graft' AS binary)) AS h")
      .collect()(0).getLong(0)
    val viaCol = Seq("hello graft").toDF("t")
      .select(Dedup.md5Hash48(col("t")).as("h"), Dedup.md5Hash48Hex(col("t")).as("hx"))
      .collect()(0)
    assert(viaSql == viaCol.getLong(0) && viaSql == viaCol.getLong(1))
  }

  test("extensions class wires the same builders (session-build path)") {
    // A second in-JVM session with withExtensions would collide with the
    // shared context's session state; instead assert the extension class
    // installs exactly the GraftFunctions.all set.
    val names = GraftFunctions.all.map(_._1).toSet
    assert(names == Set("simhash64", "ngram_shingles", "vec_dot", "vec_norm",
      "count_in_set", "md5_hash48"))
    val ext = new GraftExtensions
    // smoke: applying to a fresh SparkSessionExtensions must not throw
    ext.apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
