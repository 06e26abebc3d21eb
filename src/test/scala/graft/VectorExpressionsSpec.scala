package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** The codegen'd DotProduct must be value-identical to the interpreted
  * higher-order-function fold it replaced (same left-to-right order), and
  * must stay inside whole-stage codegen.
  */
class VectorExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private def hofDot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("digit-for-digit equal to the HOF fold on random vectors") {
    val rnd = new scala.util.Random(99L)
    val rows = (0 until 500).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian()), Array.fill(64)(rnd.nextGaussian()))
    }.toDF("id", "a", "b")
    val out = rows.select(
      VectorFunctions.dot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    // bitwise equality — summation order is identical, not merely close
    assert(out.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("edge semantics match the HOF fold: null array/mismatch/null element -> null") {
    val df = Seq(
      (1L, Some(Seq(Option(1.0), Option(2.0))), None: Option[Seq[Option[Double]]]),
      (2L, Some(Seq.empty[Option[Double]]), Some(Seq.empty[Option[Double]])),
      (3L, Some(Seq(Option(1.0), Option(2.0))), Some(Seq(Option(3.0)))), // length mismatch
      (4L, Some(Seq(Option(1.0), None)), Some(Seq(Option(3.0), Option(4.0)))) // null element
    ).toDF("id", "a", "b")
    val out = df.select(col("id"),
        VectorFunctions.dot(col("a"), col("b")).as("native"),
        hofDot(col("a"), col("b")).as("hof"))
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out(1L) == ((None, None)))
    assert(out(2L) == ((Some(0.0), Some(0.0))))
    assert(out(3L) == ((None, None)), "zip_with pads with null -> null sum")
    assert(out(4L) == ((None, None)), "null element poisons the sum")
  }

  test("stays inside whole-stage codegen") {
    // spark.range keeps the projection a real plan (a literal local table
    // would constant-fold into a LocalTableScan with no codegen stage)
    val df = spark.range(4).select(
      VectorFunctions.dot(
        array(col("id").cast("double"), lit(2.0)),
        array(lit(3.0), lit(4.0))).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage; the
    // projection carrying graft_dot must be starred (no fallback)
    assert(plan.linesIterator.exists(l => l.contains("graft_dot") && l.trim.startsWith("*(")),
      plan)
    assert(df.orderBy("d").head().getDouble(0) == 8.0) // id=0: 0*3 + 2*4
  }

  test("signBuckets equals the composed per-plane dot>0 form, bit for bit") {
    val tables = 24; val bits = 6; val dim = 16
    val hp = graft.sim.Ann.hyperplanes(tables, bits, dim, seed = 7L)
    val rnd = new scala.util.Random(41L)
    val rows = (0 until 300).map { i =>
      // mix in exact zeros so the strict `> 0` sign boundary is exercised
      (i.toLong, Array.fill(dim)(if (rnd.nextInt(10) == 0) 0.0 else rnd.nextGaussian()))
    }.toDF("id", "v")
    val composed = hp.zipWithIndex.map { case (planes, t) =>
      graft.sim.Ann.bucket(col("v"), planes).as(s"t$t")
    }
    val out = rows.select(
      (VectorFunctions.signBuckets(col("v"), hp).as("sb") +: composed): _*).collect()
    out.foreach { r =>
      val sb = r.getSeq[Long](0)
      assert(sb.size == tables)
      (0 until tables).foreach(t => assert(sb(t) == r.getLong(1 + t)))
    }
  }

  test("signBuckets: dim mismatch -> all-zero buckets; NULL vec -> NULL; codegen'd") {
    val hp = graft.sim.Ann.hyperplanes(2, 4, 3, seed = 7L)
    val df = Seq(
      (1L, Some(Seq(1.0, 2.0))), // wrong length (dim = 3)
      (2L, None: Option[Seq[Double]])
    ).toDF("id", "v")
    val out = df.select(col("id"),
        VectorFunctions.signBuckets(col("v"), hp).as("sb"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).get.asInstanceOf[scala.collection.Seq[Long]] == Seq(0L, 0L))
    assert(out(2L).isEmpty)
    // whole-stage codegen holds at strengthened table counts — the reason
    // this expression exists (the composed form fell back to interpreted)
    val wide = graft.sim.Ann.hyperplanes(24, 6, 8, seed = 7L)
    val plan = spark.range(4)
      .select(VectorFunctions.signBuckets(
        array((0 until 8).map(i => col("id").cast("double") + lit(i.toDouble)): _*),
        wide).as("sb"))
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_sign_buckets") && l.trim.startsWith("*(")), plan)
  }

  test("signBuckets instances with equal planes compare equal (canonicalization)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    // planes are a value-equal IndexedSeq, not a reference-equal Array:
    // semantically identical instances must dedupe under Catalyst
    // canonicalization / common-subexpression elimination
    def mk() = org.apache.spark.sql.graftvec.SignBuckets(
      Literal.create(Seq(1.0, 2.0), org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType)),
      IndexedSeq(0.1, 0.2, 0.3, 0.4), tables = 2, bits = 1, dim = 2)
    assert(mk() == mk())
    assert(mk().semanticEquals(mk()))
  }
}
