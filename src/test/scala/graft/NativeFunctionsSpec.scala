package graft

import org.apache.spark.sql.functions._
import graft.functions.Native

/** Native Catalyst expression surface: Column API, SQL registration, null
  * semantics, and parity with the builtin zip_with+aggregate composition.
  */
class NativeFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val pairs = Seq(
    (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (Seq(0.1, -0.2), Seq(0.3, 0.4)),
    (Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")

  test("graft_dot equals the builtin fold composition bit-for-bit") {
    val both = pairs.select(
      Native.dot($"a", $"b").as("native"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, x) => acc + x).as("builtin"))
    both.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_dot codegen survives non-nullable inputs (no constant-isNull assignment)") {
    // regression (round 8): with both children non-nullable the codegen
    // slot ev.isNull is a constant, and the old unconditional
    // `isNull = true` assignment failed Janino — silently dropping the
    // whole stage to interpreter mode. GenerateUnsafeProjection has no
    // fallback, so a codegen bug THROWS here instead of hiding in a WARN.
    import org.apache.spark.sql.catalyst.expressions.{Alias, BoundReference}
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val dense = BoundReference(0, ArrayType(DoubleType, containsNull = false), nullable = false)
    val dDense = org.apache.spark.sql.graft.DotProduct(dense, dense)
    assert(!dDense.nullable, "no null source anywhere -> non-nullable")
    GenerateUnsafeProjection.generate(Seq(Alias(dDense, "x")()))
    // null ELEMENTS alone must keep the expression nullable even when the
    // array columns are non-nullable — nullability must not reduce to the
    // children's (the BinaryExpression default)
    val sparse = BoundReference(0, ArrayType(DoubleType, containsNull = true), nullable = false)
    val dSparse = org.apache.spark.sql.graft.DotProduct(sparse, sparse)
    assert(dSparse.nullable, "null elements can null the dot")
    GenerateUnsafeProjection.generate(Seq(Alias(dSparse, "y")()))
  }

  test("graft_dot null semantics: null array or null element -> null") {
    val df = Seq(
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(2.0), Some(3.0)))),
      (None, Some(Seq(Some(1.0))))).toDF("a", "b")
    val out = df.select(Native.dot($"a".cast("array<double>"), $"b".cast("array<double>")))
      .collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("graft_dhash / graft_audio_fp: SQL surface, codegen, null tolerance") {
    Native.register(spark)
    // a valid 1×1 24bpp BMP (payload 54 + one padded row of 4 bytes) and
    // garbage — through BOTH the Column facade and the SQL name
    val bmp = java.nio.ByteBuffer.allocate(58)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bmp.put('B'.toByte).put('M'.toByte).putInt(58).putInt(0).putInt(54)
    bmp.putInt(40).putInt(1).putInt(1).putShort(1).putShort(24)
    bmp.position(54); bmp.put(Array[Byte](10, 20, 30, 0))
    val wav = java.nio.ByteBuffer.allocate(48)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    wav.put("RIFF".getBytes).putInt(40).put("WAVE".getBytes)
    wav.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
    wav.putInt(8000).putInt(16000).putShort(2).putShort(16)
    wav.put("data".getBytes).putInt(4).put(Array[Byte](1, 2, 3, 4))
    val df = Seq((1L, bmp.array(), wav.array()),
      (2L, Array[Byte](9), Array[Byte](9))).toDF("id", "img", "aud")
    df.createOrReplaceTempView("media_native")
    val col = df.select(Native.dhash($"img").as("d"), Native.audioFp($"aud").as("a"))
      .collect().map(r => (if (r.isNullAt(0)) null else r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1)))
    val sql = spark.sql(
      "SELECT graft_dhash(img) AS d, graft_audio_fp(aud) AS a FROM media_native")
      .collect().map(r => (if (r.isNullAt(0)) null else r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1)))
    assert(col.toSeq === sql.toSeq)
    assert(col(0)._1 != null && col(0)._2 != null, "valid payloads hash")
    assert(col(1)._1 == null && col(1)._2 == null, "garbage payloads null out")
  }

  test("SQL surface via registration: SELECT graft_dot(...)") {
    Native.register(spark)
    pairs.createOrReplaceTempView("dot_pairs")
    val v = spark.sql("SELECT graft_dot(a, b) AS d FROM dot_pairs ORDER BY d DESC")
      .as[Double].collect()
    assert(v(0) === 32.0)   // 1*4 + 2*5 + 3*6
    assert(v(1) === 0.0)    // empty arrays
    assert(math.abs(v(2) - (0.1 * 0.3 + -0.2 * 0.4)) < 1e-15)
  }

  test("expression participates in whole-stage codegen") {
    // range-backed frame so the plan isn't folded into a LocalTableScan
    val df = spark.range(4).select(
      Native.dot(
        array(col("id").cast("double"), lit(2.0)),
        array(lit(3.0), col("id").cast("double"))).as("d"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_dot"), plan)
    assert(df.as[Double].collect().toSeq === Seq(0.0, 5.0, 10.0, 15.0))
  }

  test("graft_winnow_fps: codegen matches interpreted eval and the SQL surface works") {
    import org.apache.spark.sql.graft.WinnowFps
    val norm = "thequickbrownfoxjumpsoverthelazydog"
    // interpreted reference straight from the shared kernel
    val expected = WinnowFps.fps(norm.getBytes("UTF-8"), 8, 4, WinnowFps.polyPows(8)).toSeq
    val viaColumn = spark.range(1).select(Native.winnow(lit(norm), 8, 4).as("fps"))
      .as[Seq[Long]].head()
    assert(viaColumn === expected)
    // every fp is a 32-bit value
    assert(expected.forall(f => f >= 0 && f <= 4294967295L))
    Native.register(spark)
    val viaSql = spark.sql(s"SELECT graft_winnow_fps('$norm', 8, 4) AS fps")
      .as[Seq[Long]].head()
    assert(viaSql === expected)
    // winnowing guarantee on the native path: shared 11+ char run
    val df = Seq((1L, s"AAA${norm}BBB"), (2L, s"CCC${norm}DDD")).toDF("id", "text")
    val fps = graft.ops.Text.winnowFingerprints(df, "text", "id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert((fps(1L) intersect fps(2L)).nonEmpty)
  }

  test("graft_winnow_fps GENERATED code produces kernel values (non-foldable input)") {
    import org.apache.spark.sql.graft.WinnowFps
    // range-backed frame: the literal-free child defeats ConstantFolding,
    // so doGenCode's emitted Java actually runs and is value-checked
    val df = spark.range(3).select(col("id"),
      Native.winnow(concat(lit("abcdefghij"), col("id").cast("string")), 8, 4).as("fps"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("graft_winnow_fps"), plan)
    val got = df.as[(Long, Seq[Long])].collect().toMap
    (0L until 3L).foreach { i =>
      val expect = WinnowFps.fps(s"abcdefghij$i".getBytes("UTF-8"), 8, 4,
        WinnowFps.polyPows(8)).toSeq
      assert(got(i) === expect, s"row $i")
    }
    // short input on the raw surface: empty array, not an executor crash
    val short = spark.range(1)
      .select(Native.winnow(concat(lit("abc"), col("id").cast("string")), 8, 4).as("fps"))
      .as[Seq[Long]].head()
    assert(short === Seq.empty)
  }

  test("curation SQL pack: every gate equals its DataFrame operator") {
    Native.register(spark)
    val d = Tables.documents(spark, sf())
    d.createOrReplaceTempView("nf_docs")
    // lang: SQL prediction ≡ ops.Text.langId on every doc (same fold, ties)
    val sqlLang = spark.sql(
      "SELECT doc_id, graft_lang_pred(text) AS lp FROM nf_docs")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val opLang = graft.ops.Text.langId(d, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sqlLang === opLang)
    // tokens / count / cleanse / h32 on a hostile fixture
    val row = spark.sql(
      """SELECT graft_tokens('To be, or NOT to be') AS t,
        |       graft_token_count('<b>Hi</b> see https://x.io or a@b.co now') AS n,
        |       graft_cleanse('<b>Hi</b> see https://x.io or a@b.co  now') AS c,
        |       graft_h32('alpha') AS h""".stripMargin).head()
    assert(row.getSeq[String](0) === Seq("to", "be", "or", "not", "to", "be"))
    assert(row.getAs[String]("c") === "Hi see <URL> or <EMAIL> now")
    // tokens of the RAW string: b,hi,b,see,https,x,io,or,a,b,co,now
    assert(row.getLong(1) === 12L)
    // the portable hash: same value the engine derives everywhere
    val expected = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("alpha".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)
    assert(row.getAs[Long]("h") === expected)
    // arity is analyzer-checked, not an IndexOutOfBounds
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_lang_pred('a', 'b')").collect()
    }
  }
}
